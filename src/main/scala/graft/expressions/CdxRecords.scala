package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `CdxRecords(content: binary)` — CDXJ crawl-index shards (plain or
  * codec-wrapped) to one struct per capture line:
  *
  *   array<struct<surt string, ts string, url string, mime string,
  *                status int, digest string, filename string,
  *                offset bigint, length bigint>>
  *
  * The partition-pruned-fetch planning surface of the WARC family
  * ([[graft.llmops.Cdx]]). Malformed lines skip; non-index bytes NULL.
  */
case class CdxRecords(child: Expression) extends UnaryExpression {

  override def dataType: DataType = CdxRecords.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_cdx_records"

  override protected def nullSafeEval(input: Any): Any =
    CdxRecords.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("cdxOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.CdxRecords.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): CdxRecords =
    copy(child = newChild)
}

object CdxRecords {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("surt", StringType, nullable = false),
    StructField("ts", StringType, nullable = false),
    StructField("url", StringType, nullable = true),
    StructField("mime", StringType, nullable = true),
    StructField("status", IntegerType, nullable = true),
    StructField("digest", StringType, nullable = true),
    StructField("filename", StringType, nullable = true),
    StructField("offset", LongType, nullable = true),
    StructField("length", LongType, nullable = true))), containsNull = false)

  def compute(content: Array[Byte]): ArrayData = {
    val rs = graft.llmops.Cdx.records(content)
    if (rs == null) return null
    val rows = new Array[AnyRef](rs.length)
    var i = 0
    while (i < rs.length) {
      val r = rs(i)
      def s(v: String): AnyRef =
        if (v == null) null else UTF8String.fromString(v)
      rows(i) = new GenericInternalRow(Array[Any](
        s(r.surt), s(r.ts), s(r.url), s(r.mime),
        r.status, s(r.digest), s(r.filename), r.offset, r.length))
      i += 1
    }
    new GenericArrayData(rows)
  }
}
