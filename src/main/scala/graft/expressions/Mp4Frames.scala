package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.types.{ArrayType, BinaryType, DataType}

/** Motion-JPEG-in-MP4/MOV frame extraction — `Mp4Frames(content)` walks
  * the ISO BMFF box tree (`ftyp` → `moov` → `trak` → `mdia` → `minf` →
  * `stbl`) and materializes the video samples of the first motion-JPEG
  * track via its sample tables: `stsd` (codec gate), `stsz` (sample
  * sizes), `stsc` (sample→chunk runs), `stco`/`co64` (chunk offsets).
  * Returns `array<binary>` in sample order; each element is a complete
  * still JPEG that [[JpegPixels]]/[[JpegDHash]] decode, so MP4 video
  * joins the same "explode frames, then the image pipeline" shape as
  * [[AviFrames]] — one Hamming space across containers.
  *
  * Codec gate: sample-entry fourccs of the motion-JPEG family
  * (`jpeg`, `mjpa`, `mjpb`, `dmb1`, `AVDJ`, `MJPG` and case variants).
  * H.26x/AV1 tracks are skipped — no JDK-only decoder is feasible for
  * them, and pretending otherwise would hash garbage; a file with no
  * motion-JPEG video track refuses (NULL). [[AvMeta]] still reports
  * their container metadata.
  *
  * NULL for anything that is not an ISO BMFF file (leading `ftyp`,
  * `wide`/`free`/`skip` preambles allowed) with one well-formed
  * motion-JPEG track; inconsistent sample tables or out-of-bounds
  * samples refuse wholesale rather than returning a partial frame list.
  * All offset math in Long; frame count capped at 4096 and total
  * payload at 64 MB — the PNG/JPEG allocation-bomb contract.
  *
  * Container parse only, engine-addition scope: the reference pipeline
  * is document-only (its media handling stops at upload plumbing,
  * reference: utils/extract_data_v2/aje_libs/documents/helpers/
  * document_processor.py:10-83).
  */
case class Mp4Frames(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(BinaryType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_mp4_frames"

  override protected def nullSafeEval(input: Any): Any =
    Mp4Frames.compute(input.asInstanceOf[Array[Byte]])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.Mp4Frames.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): Mp4Frames =
    copy(child = newChild)
}

object Mp4Frames {

  private val MaxFrames = 4096
  private val MaxBytes = 64L * 1024 * 1024

  /** Motion-JPEG sample-entry fourccs (QuickTime: jpeg/mjpa/mjpb/AVDJ,
    * MPEG-4 register dmb1, common mux alias MJPG).
    */
  private val MjpegCodecs =
    Set("jpeg", "mjpa", "mjpb", "dmb1", "AVDJ", "avdj", "MJPG", "mjpg")

  private def be16(b: Array[Byte], i: Long): Int =
    ((b(i.toInt) & 0xFF) << 8) | (b(i.toInt + 1) & 0xFF)

  private def be32(b: Array[Byte], i: Long): Long =
    ((b(i.toInt) & 0xFFL) << 24) | ((b(i.toInt + 1) & 0xFFL) << 16) |
      ((b(i.toInt + 2) & 0xFFL) << 8) | (b(i.toInt + 3) & 0xFFL)

  private def be64(b: Array[Byte], i: Long): Long =
    (be32(b, i) << 32) | be32(b, i + 4)

  private def boxType(b: Array[Byte], i: Long): String =
    new String(b, i.toInt + 4, 4, "US-ASCII")

  /** (payloadStart, boxEnd) of the box at `i`, or null if malformed.
    * Handles 32-bit sizes, `size==1` largesize, and `size==0` (to end —
    * legal only for a last top-level box, enforced by the caller via
    * `allowToEnd`).
    */
  private def boxBounds(b: Array[Byte], i: Long, limit: Long,
      allowToEnd: Boolean): (Long, Long) = {
    if (i + 8 > limit) return null
    val size32 = be32(b, i)
    if (size32 == 1L) {
      if (i + 16 > limit) return null
      val size = be64(b, i + 8)
      if (size < 16 || i + size > limit) return null
      (i + 16, i + size)
    } else if (size32 == 0L) {
      if (!allowToEnd) return null
      (i + 8, limit)
    } else {
      if (size32 < 8 || i + size32 > limit) return null
      (i + 8, i + size32)
    }
  }

  /** First child box named `name` inside [from, to), as (payloadStart,
    * boxEnd), or null.
    */
  private def child(b: Array[Byte], from: Long, to: Long,
      name: String): (Long, Long) = {
    var i = from
    while (i + 8 <= to) {
      val bounds = boxBounds(b, i, to, allowToEnd = false)
      if (bounds == null) return null
      if (boxType(b, i) == name) return bounds
      i = bounds._2
    }
    null
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(b: Array[Byte]): GenericArrayData = {
    if (b == null || b.length < 16) return null
    val n = b.length.toLong
    // ISO BMFF sniff: the first real box must be ftyp; QuickTime pads
    // with wide/free/skip preambles occasionally — tolerate those
    var i = 0L
    var sawFtyp = false
    var moov: (Long, Long) = null
    var guard = 0
    while (i + 8 <= n && guard < 64) {
      guard += 1
      val bounds = boxBounds(b, i, n, allowToEnd = true)
      if (bounds == null) return null
      val t = boxType(b, i)
      if (!sawFtyp) {
        if (t == "ftyp") sawFtyp = true
        else if (t != "wide" && t != "free" && t != "skip") return null
      } else if (t == "moov") moov = bounds
      if (bounds._2 <= i) return null // zero-progress guard
      i = bounds._2
    }
    if (!sawFtyp || moov == null) return null

    // find the first trak whose stbl carries a motion-JPEG sample entry
    var trakAt = moov._1
    while (trakAt + 8 <= moov._2) {
      val tb = boxBounds(b, trakAt, moov._2, allowToEnd = false)
      if (tb == null) return null
      if (boxType(b, trakAt) == "trak") {
        val frames = framesOfTrak(b, tb._1, tb._2, n)
        if (frames != null) return frames
      }
      trakAt = tb._2
    }
    null
  }

  /** Frames of one trak, or null if it is not a well-formed motion-JPEG
    * video track.
    */
  private def framesOfTrak(b: Array[Byte], from: Long, to: Long,
      fileLen: Long): GenericArrayData = {
    val mdia = child(b, from, to, "mdia")
    if (mdia == null) return null
    val minf = child(b, mdia._1, mdia._2, "minf")
    if (minf == null) return null
    val stbl = child(b, minf._1, minf._2, "stbl")
    if (stbl == null) return null

    // stsd: full box, entry_count, then sample entries; the codec gate
    val stsd = child(b, stbl._1, stbl._2, "stsd")
    if (stsd == null || stsd._1 + 16 > stsd._2) return null
    val entryCount = be32(b, stsd._1 + 4)
    if (entryCount < 1) return null
    // first entry: size(4) + format(4)
    val entryAt = stsd._1 + 8
    if (entryAt + 8 > stsd._2) return null
    val format = new String(b, entryAt.toInt + 4, 4, "US-ASCII")
    if (!MjpegCodecs.contains(format)) return null

    // stsz: full box, sample_size, sample_count, [sizes]
    val stsz = child(b, stbl._1, stbl._2, "stsz")
    if (stsz == null || stsz._1 + 12 > stsz._2) return null
    val fixedSize = be32(b, stsz._1 + 4)
    val nSamples = be32(b, stsz._1 + 8)
    if (nSamples < 1 || nSamples > MaxFrames) return null
    val sizes = new Array[Long](nSamples.toInt)
    if (fixedSize != 0L) {
      java.util.Arrays.fill(sizes, fixedSize)
    } else {
      if (stsz._1 + 12 + 4L * nSamples > stsz._2) return null
      var s = 0
      while (s < nSamples) {
        sizes(s) = be32(b, stsz._1 + 12 + 4L * s)
        s += 1
      }
    }

    // stco (32-bit) or co64 (64-bit) chunk offsets
    val stco = child(b, stbl._1, stbl._2, "stco")
    val co64 = if (stco == null) child(b, stbl._1, stbl._2, "co64") else null
    if (stco == null && co64 == null) return null
    val wide = stco == null
    val cbox = if (wide) co64 else stco
    if (cbox._1 + 8 > cbox._2) return null
    val nChunks = be32(b, cbox._1 + 4)
    if (nChunks < 1 || nChunks > MaxFrames) return null
    val offW = if (wide) 8L else 4L
    if (cbox._1 + 8 + offW * nChunks > cbox._2) return null
    val chunkOff = new Array[Long](nChunks.toInt)
    var c = 0
    while (c < nChunks) {
      chunkOff(c) =
        if (wide) be64(b, cbox._1 + 8 + 8L * c)
        else be32(b, cbox._1 + 8 + 4L * c)
      c += 1
    }

    // stsc: full box, entry_count, entries of (first_chunk,
    // samples_per_chunk, sample_description_index)
    val stsc = child(b, stbl._1, stbl._2, "stsc")
    if (stsc == null || stsc._1 + 8 > stsc._2) return null
    val nRuns = be32(b, stsc._1 + 4)
    if (nRuns < 1 || nRuns > MaxFrames) return null
    if (stsc._1 + 8 + 12L * nRuns > stsc._2) return null
    val runFirst = new Array[Long](nRuns.toInt)
    val runSpc = new Array[Long](nRuns.toInt)
    var r = 0
    while (r < nRuns) {
      runFirst(r) = be32(b, stsc._1 + 8 + 12L * r)
      runSpc(r) = be32(b, stsc._1 + 8 + 12L * r + 4)
      if (runFirst(r) < 1 || runSpc(r) < 1) return null
      if (r > 0 && runFirst(r) <= runFirst(r - 1)) return null
      r += 1
    }
    if (runFirst(0) != 1L) return null

    // walk chunks in order, slicing samples; the tables must agree
    // EXACTLY on the sample count — a mismatch refuses wholesale
    val out = new Array[Any](nSamples.toInt)
    var sample = 0
    var total = 0L
    c = 0
    var run = 0
    while (c < nChunks && sample < nSamples) {
      while (run + 1 < nRuns && runFirst(run + 1) <= c + 1) run += 1
      var off = chunkOff(c)
      var k = 0L
      while (k < runSpc(run) && sample < nSamples) {
        val len = sizes(sample)
        // off is attacker-controlled (co64 carries arbitrary be64): check
        // sign and use subtraction so a huge off cannot wrap off+len
        if (len < 1 || off < 0 || off > fileLen - len) return null
        total += len
        if (total > MaxBytes) return null
        out(sample) =
          java.util.Arrays.copyOfRange(b, off.toInt, (off + len).toInt)
        off += len
        sample += 1
        k += 1
      }
      c += 1
    }
    if (sample != nSamples) return null
    new GenericArrayData(out)
  }
}
