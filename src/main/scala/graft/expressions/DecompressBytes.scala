package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{BinaryType, DataType}

/** `DecompressBytes(content: binary)` — sniff-and-decompress as a native
  * codegen'd expression: gzip, bzip2, xz, zstd, lz4 by magic number;
  * NULL for anything else (including malformed streams — every codec
  * kernel refuses with null, never throws). Like the other byte kernels
  * it runs inside the scan projection, so `decompress → parse → screen`
  * stays one whole-stage-codegen span with column pruning intact.
  */
case class DecompressBytes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decompress"

  override protected def nullSafeEval(content: Any): Any =
    DecompressBytes.compute(content.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.expressions.DecompressBytes.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })

  override protected def withNewChildInternal(
      newChild: Expression): DecompressBytes = copy(child = newChild)
}

object DecompressBytes {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(content: Array[Byte]): Array[Byte] =
    graft.llmops.Compression.decodeAuto(content)
}

/** Explicit-codec decompression: `graft_decode(content, 'br')` — the
  * front door for codecs that carry NO sniffable magic (brotli is the
  * only one today; HTTP names it out of band via `Content-Encoding: br`
  * and shard files via the `.br` suffix). NULL on decode failure, same
  * degrade contract as [[DecompressBytes]].
  */
case class DecodeBytes(child: Expression, codec: String)
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_decode"

  override protected def nullSafeEval(content: Any): Any =
    graft.llmops.Compression.decode(content.asInstanceOf[Array[Byte]], codec)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val codecRef = ctx.addReferenceObj("codec", codec, "java.lang.String")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.llmops.Compression.decode($c, $codecRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): DecodeBytes = copy(child = newChild)
}

/** Dictionary-zstd decompression in the scan projection:
  * `graft_zstd_dict(content)` with the dictionary riding the expression
  * (broadcast once inside the task binary, the classifier-model
  * convention) — the read path for dictionary-compressed shard corpora,
  * where a shared small dictionary is how 100-TB shard farms keep tiny
  * per-record framing cheap. NULL on decode failure or a wrong
  * dictionary, same degrade contract as the other decode kernels.
  */
case class ZstdDictDecode(child: Expression, dict: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BinaryType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zstd_dict"

  override protected def nullSafeEval(content: Any): Any =
    graft.llmops.Zstd.decode(content.asInstanceOf[Array[Byte]], dict)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val dictRef = ctx.addReferenceObj("dict", dict, "byte[]")
    nullSafeCodeGen(ctx, ev, c => {
      s"""
         |${ev.value} = graft.llmops.Zstd.decode($c, $dictRef);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(
      newChild: Expression): ZstdDictDecode = copy(child = newChild)
}
