package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CdcChunks(content: binary)` — content-defined chunking
  * ([[graft.llmops.Cdc]], FastCDC construction, default 2K/8K/64K
  * sizes) as a scan-projection kernel:
  *
  *   array<struct<offset bigint, size int, hash bigint>>
  *
  * Chunks cover the input contiguously; `hash` is the stable XXH64
  * chunk identity the binary dedup store keys on. NULL input → NULL;
  * empty input → empty array.
  */
case class CdcChunks(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CdcChunks.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdc_chunks"

  override protected def nullSafeEval(input: Any): Any =
    CdcChunks.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cdcOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.CdcChunks.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CdcChunks =
    copy(child = newChild)
}

object CdcChunks {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("offset", LongType, nullable = false),
    StructField("size", IntegerType, nullable = false),
    StructField("hash", LongType, nullable = false))), containsNull = false)

  def compute(content: Array[Byte]): ArrayData = {
    if (content == null) return null
    val cs = graft.llmops.Cdc.chunks(content)
    val rows = new Array[AnyRef](cs.length)
    var i = 0
    while (i < cs.length) {
      val c = cs(i)
      rows(i) = new GenericInternalRow(Array[Any](c.offset, c.size, c.hash))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
