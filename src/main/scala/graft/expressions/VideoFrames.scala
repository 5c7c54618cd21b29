package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Container-agnostic still-sequence extraction: sniffs the leading
  * magic and dispatches — `RIFF…AVI ` → [[AviFrames]], `GIF8xa` →
  * [[GifFrames]] (animated GIF, composited frames as PNGs), `II`/`MM`
  * → [[TiffPages]] (multi-page TIFF — a scanned document IS a still
  * sequence, so page-level dedup rides the whole frame-hash family),
  * ISO BMFF (`ftyp`, with `wide`/`free`/`skip` preambles) →
  * [[Mp4Frames]]. One expression, one `array<binary>` of complete
  * stills, one Hamming space for the whole sequence-dedup family
  * regardless of which container a crawl delivered — exactly how
  * [[graft.llmops.Multimodal.imageDHash]] unifies PNG and JPEG for
  * images. NULL when no container parses.
  */
case class VideoFrames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_video_frames"

  override protected def nullSafeEval(input: Any): Any =
    VideoFrames.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.VideoFrames.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): VideoFrames =
    copy(child = newChild)
}

object VideoFrames {

  /** Static kernel shared by interpreted eval and generated code. The
    * magic check is cheap and disjoint (RIFF little-endian fourcc vs BE
    * box headers), so exactly one parser ever runs per row.
    */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 12) return null
    if (b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F')
      AviFrames.compute(b)
    else if (b(0) == 'G' && b(1) == 'I' && b(2) == 'F')
      GifFrames.compute(b) // animated GIF: composited frames as PNGs
    else if ((b(0) == 'I' && b(1) == 'I') || (b(0) == 'M' && b(1) == 'M'))
      TiffPages.compute(b) // multi-page TIFF: scanned pages as PNGs
    else
      Mp4Frames.compute(b)
  }
}
