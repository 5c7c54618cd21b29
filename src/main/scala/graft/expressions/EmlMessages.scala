package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** `EmlMessages(content: binary)` — email ingestion as one expression:
  * an RFC 5322 message yields one struct, an mbox mailbox one per
  * message, either optionally inside a [[graft.llmops.Compression]]
  * container (mailing-list archives ship `.mbox.gz`):
  *
  *   array<struct<subject string, from string, date string, text string>>
  *
  * Subjects/addresses are RFC 2047-decoded; bodies walk MIME multiparts
  * with quoted-printable/base64 transfer decoding and html→text
  * routing ([[graft.llmops.Eml]]). Bytes that are neither email nor
  * mailbox (nor a container of one) are NULL.
  */
case class EmlMessages(child: Expression) extends UnaryExpression {

  override def dataType: DataType = EmlMessages.schema
  override def nullable: Boolean = true
  override def prettyName: String = "graft_eml_messages"

  override protected def nullSafeEval(input: Any): Any =
    EmlMessages.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => {
      val tmp = ctx.freshName("emlOut")
      s"""
       org.apache.spark.sql.catalyst.util.ArrayData $tmp =
         graft.expressions.EmlMessages.compute($c);
       if ($tmp == null) { ${ev.isNull} = true; } else { ${ev.value} = $tmp; }
      """
    })

  override protected def withNewChildInternal(newChild: Expression): EmlMessages =
    copy(child = newChild)
}

object EmlMessages {

  val schema: DataType = ArrayType(StructType(Seq(
    StructField("subject", StringType, nullable = false),
    StructField("from", StringType, nullable = false),
    StructField("date", StringType, nullable = false),
    StructField("text", StringType, nullable = false))), containsNull = false)

  def compute(content: Array[Byte]): ArrayData = {
    if (content == null) return null
    val bytes =
      if (graft.llmops.Compression.sniffCodec(content).isDefined) {
        val d = graft.llmops.Compression.decodeAuto(content)
        if (d == null) return null else d
      } else content
    val E = graft.llmops.Eml
    val msgs: Seq[Array[Byte]] =
      E.mboxMessages(bytes) match {
        case Some(ms) if ms.nonEmpty && E.sniff(ms.head) => ms
        case _ => if (E.sniff(bytes)) Seq(bytes) else return null
      }
    val rows = msgs.flatMap(E.parse).map { m =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(m.subject),
        UTF8String.fromString(m.from),
        UTF8String.fromString(m.date),
        UTF8String.fromString(m.text))): AnyRef
    }
    if (rows.isEmpty) return null
    new GenericArrayData(rows.toArray)
  }
}
