package graft.llmops

import java.io.ByteArrayOutputStream

/** Minimal, structurally valid image byte builders (PNG/GIF/BMP/JPEG
  * headers + terminators, no pixel payload) — the synthetic-input partner
  * of [[graft.expressions.ImageDims]], exactly as [[OoxmlWriter]] partners
  * the OOXML parsers: gate queries and specs build real binary headers
  * with known dimensions instead of shipping binary fixtures. Deterministic
  * bytes for identical inputs.
  */
object ImageWriter {

  private def be16(v: Int): Array[Byte] =
    Array(((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def be32(v: Int): Array[Byte] =
    Array((v >>> 24).toByte, ((v >> 16) & 0xFF).toByte,
      ((v >> 8) & 0xFF).toByte, (v & 0xFF).toByte)
  private def le16(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte)
  private def le32(v: Int): Array[Byte] =
    Array((v & 0xFF).toByte, ((v >> 8) & 0xFF).toByte,
      ((v >> 16) & 0xFF).toByte, (v >>> 24).toByte)

  /** PNG signature + IHDR (real CRC) + empty IEND. */
  def png(width: Int, height: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(Array(0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A).map(_.toByte))
    val ihdr = "IHDR".getBytes("US-ASCII") ++ be32(width) ++ be32(height) ++
      Array[Byte](8, 2, 0, 0, 0) // bit depth 8, truecolor
    out.write(be32(13))
    out.write(ihdr)
    val crc = new java.util.zip.CRC32(); crc.update(ihdr)
    out.write(be32(crc.getValue.toInt))
    val iend = "IEND".getBytes("US-ASCII")
    out.write(be32(0)); out.write(iend)
    val crc2 = new java.util.zip.CRC32(); crc2.update(iend)
    out.write(be32(crc2.getValue.toInt))
    out.toByteArray
  }

  /** GIF89a header + logical screen descriptor + trailer. */
  def gif(width: Int, height: Int): Array[Byte] =
    "GIF89a".getBytes("US-ASCII") ++ le16(width) ++ le16(height) ++
      Array[Byte](0, 0, 0, 0x3B)

  /** BMP file header + BITMAPINFOHEADER (24bpp, no pixel data). */
  def bmp(width: Int, height: Int): Array[Byte] =
    "BM".getBytes("US-ASCII") ++ le32(54) ++ le32(0) ++ le32(54) ++
      le32(40) ++ le32(width) ++ le32(height) ++ le16(1) ++ le16(24) ++
      le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0) ++ le32(0)

  /** JPEG SOI + SOF0 frame header (one component) + EOI. */
  def jpeg(width: Int, height: Int): Array[Byte] =
    Array(0xFF, 0xD8).map(_.toByte) ++
      Array(0xFF, 0xC0).map(_.toByte) ++ be16(11) ++ Array[Byte](8) ++
      be16(height) ++ be16(width) ++ Array[Byte](1, 1, 0x11, 0) ++
      Array(0xFF, 0xD9).map(_.toByte)
}
