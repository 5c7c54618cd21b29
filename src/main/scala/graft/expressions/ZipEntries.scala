package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `ZipEntries(content: binary)` — bulk-upload archives (a zip of mixed
  * documents, the reference's heterogeneous-upload shape at
  * `aje_libs/documents/helpers/document_processor.py:10-83`) exploded
  * to one struct per file entry:
  *
  *   array<struct<name string, mime string, text string>>
  *
  * Per entry: bytes sniffed ([[graft.llmops.DocumentText.sniffMime]],
  * so nested OOXML/ODF/PDF/eml/compressed members get their real
  * label), text extracted by the sniffed format (NULL when no codec
  * applies). Directories skipped. Caps refuse wholesale: 4096 entries,
  * 64 MB inflated total. NULL for bytes that are not a zip (including
  * OOXML/ODF documents' OWN container use is fine — callers route
  * single documents through `graft_doc_extract`; this expression is
  * the many-documents-in-one-archive path).
  */
case class ZipEntries(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ZipEntries.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_zip_entries"

  override protected def nullSafeEval(input: Any): Any =
    ZipEntries.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("zipOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.ZipEntries.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): ZipEntries =
    copy(child = newChild)
}

object ZipEntries {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("name", StringType, nullable = false),
    StructField("mime", StringType, nullable = true),
    StructField("text", StringType, nullable = true))), containsNull = false)

  private final val MaxEntries = 4096
  private final val MaxBytes = 64 << 20

  def compute(content: Array[Byte]): ArrayData = {
    if (content == null || content.length < 4) return null
    if (content(0) != 'P' || content(1) != 'K') return null
    val D = graft.llmops.DocumentText
    try {
      val zin = new java.util.zip.ZipInputStream(
        new java.io.ByteArrayInputStream(content))
      val rows = scala.collection.mutable.ArrayBuffer.empty[AnyRef]
      var total = 0L
      var entry = zin.getNextEntry
      if (entry == null) return null // not actually a zip
      while (entry != null) {
        if (!entry.isDirectory) {
          if (rows.length >= MaxEntries) return null
          val buf = new java.io.ByteArrayOutputStream(8192)
          val chunk = new Array[Byte](64 * 1024)
          var n = zin.read(chunk)
          while (n > 0) {
            buf.write(chunk, 0, n)
            total += n
            if (total > MaxBytes) return null
            n = zin.read(chunk)
          }
          val bytes = buf.toByteArray
          val mime = D.sniffMime(bytes)
          val text = mime.flatMap(m => D.extractText(bytes, m))
          rows += new GenericInternalRow(Array[Any](
            UTF8String.fromString(entry.getName),
            mime.map(UTF8String.fromString).orNull,
            text.map(UTF8String.fromString).orNull))
        }
        entry = zin.getNextEntry
      }
      zin.close()
      new GenericArrayData(rows.toArray)
    } catch { case scala.util.control.NonFatal(_) => null }
  }
}
