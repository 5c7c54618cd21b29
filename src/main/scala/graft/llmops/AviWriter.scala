package graft.llmops

import java.io.ByteArrayOutputStream

/** Minimal-but-complete MJPEG AVI writer — the container partner of
  * [[graft.expressions.AviFrames]] the way [[JpegWriter]] partners the
  * JPEG decoder: a real RIFF tree (`LIST hdrl` with avih/strh/strf,
  * `LIST movi` with word-aligned `00dc` chunks, trailing `idx1` index)
  * around caller-supplied frame payloads, so specs and gate queries
  * build genuine AVI bytes with known frames instead of shipping binary
  * fixtures. Deterministic for identical inputs.
  */
object AviWriter {

  private def le16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
  }
  private def le32(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xFF); out.write((v >> 8) & 0xFF)
    out.write((v >> 16) & 0xFF); out.write((v >> 24) & 0xFF)
  }
  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  private def chunk(out: ByteArrayOutputStream, id: String,
      body: Array[Byte]): Unit = {
    cc(out, id)
    le32(out, body.length)
    out.write(body, 0, body.length)
    if ((body.length & 1) == 1) out.write(0) // word alignment pad
  }

  private def list(out: ByteArrayOutputStream, listType: String,
      body: Array[Byte]): Unit = {
    cc(out, "LIST")
    le32(out, body.length + 4)
    cc(out, listType)
    out.write(body, 0, body.length)
  }

  /** A playable MJPEG AVI holding `frames` (each a complete baseline
    * JPEG, e.g. from [[JpegWriter]]) at the given dimensions.
    */
  def avi(width: Int, height: Int, frames: Seq[Array[Byte]],
      usPerFrame: Int = 40000, withIndex: Boolean = true): Array[Byte] = {
    require(frames.nonEmpty, "an AVI needs at least one frame")
    val maxFrame = frames.map(_.length).max

    val avih = new ByteArrayOutputStream()
    le32(avih, usPerFrame)
    le32(avih, if (usPerFrame > 0) (maxFrame.toLong * 1000000 / usPerFrame).toInt else 0)
    le32(avih, 0) // padding granularity
    le32(avih, 0x10) // AVIF_HASINDEX
    le32(avih, frames.length)
    le32(avih, 0) // initial frames
    le32(avih, 1) // streams
    le32(avih, maxFrame)
    le32(avih, width)
    le32(avih, height)
    (0 until 4).foreach(_ => le32(avih, 0)) // reserved

    val strh = new ByteArrayOutputStream()
    cc(strh, "vids")
    cc(strh, "MJPG")
    le32(strh, 0); le16(strh, 0); le16(strh, 0) // flags, priority, language
    le32(strh, 0) // initial frames
    le32(strh, usPerFrame) // scale
    le32(strh, 1000000) // rate: frames/sec = rate/scale
    le32(strh, 0) // start
    le32(strh, frames.length)
    le32(strh, maxFrame) // suggested buffer
    le32(strh, -1) // quality
    le32(strh, 0) // sample size
    le16(strh, 0); le16(strh, 0); le16(strh, width); le16(strh, height)

    val strf = new ByteArrayOutputStream() // BITMAPINFOHEADER
    le32(strf, 40)
    le32(strf, width)
    le32(strf, height)
    le16(strf, 1); le16(strf, 24)
    cc(strf, "MJPG")
    le32(strf, width * height * 3)
    le32(strf, 0); le32(strf, 0); le32(strf, 0); le32(strf, 0)

    val strl = new ByteArrayOutputStream()
    chunk(strl, "strh", strh.toByteArray)
    chunk(strl, "strf", strf.toByteArray)

    val hdrl = new ByteArrayOutputStream()
    chunk(hdrl, "avih", avih.toByteArray)
    list(hdrl, "strl", strl.toByteArray)

    val movi = new ByteArrayOutputStream()
    // record offsets (relative to the movi list type fourcc) for idx1
    val offsets = frames.map { f =>
      val at = movi.size() + 4 // idx1 offsets point at the chunk id
      chunk(movi, "00dc", f)
      at
    }

    val idx1 = new ByteArrayOutputStream()
    frames.zip(offsets).foreach { case (f, at) =>
      cc(idx1, "00dc")
      le32(idx1, 0x10) // AVIIF_KEYFRAME
      le32(idx1, at)
      le32(idx1, f.length)
    }

    val body = new ByteArrayOutputStream()
    list(body, "hdrl", hdrl.toByteArray)
    list(body, "movi", movi.toByteArray)
    if (withIndex) chunk(body, "idx1", idx1.toByteArray)

    val out = new ByteArrayOutputStream()
    cc(out, "RIFF")
    le32(out, body.size() + 4)
    cc(out, "AVI ")
    body.writeTo(out)
    out.toByteArray
  }
}
