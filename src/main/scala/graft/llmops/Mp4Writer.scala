package graft.llmops

import java.io.ByteArrayOutputStream

/** Minimal-but-complete motion-JPEG MP4/MOV writer — the ISO BMFF
  * partner of [[graft.expressions.Mp4Frames]] the way [[AviWriter]]
  * partners the RIFF walker: a real box tree (`ftyp`, `mdat` holding
  * the frame payloads in chunks, `moov` → `trak` → `mdia` → `minf` →
  * `stbl` with genuine stsd/stts/stsc/stsz/stco tables) around
  * caller-supplied JPEG frames, so specs and gate queries build
  * authentic MP4 bytes with known frames instead of shipping binary
  * fixtures. Deterministic for identical inputs.
  *
  * Knobs exercise the reader's table walk: `samplesPerChunk` splits
  * the mdat into multiple chunks (multi-entry stco + stsc runs),
  * `useCo64` switches to 64-bit chunk offsets, `quicktime` emits the
  * `qt  ` brand + `jpeg` sample entry (vs `isom` + `dmb1`), and
  * `moovFirst` puts the index ahead of the media like a
  * faststart-remuxed web file.
  */
object Mp4Writer {

  private def be16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xFF); out.write(v & 0xFF)
  }
  private def be32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xFF).toInt); out.write(((v >> 16) & 0xFF).toInt)
    out.write(((v >> 8) & 0xFF).toInt); out.write((v & 0xFF).toInt)
  }
  private def be64(out: ByteArrayOutputStream, v: Long): Unit = {
    be32(out, (v >>> 32) & 0xFFFFFFFFL); be32(out, v & 0xFFFFFFFFL)
  }
  private def cc(out: ByteArrayOutputStream, s: String): Unit =
    out.write(s.getBytes("US-ASCII"))

  private def box(out: ByteArrayOutputStream, name: String,
      body: Array[Byte]): Unit = {
    be32(out, body.length + 8L)
    cc(out, name)
    out.write(body, 0, body.length)
  }

  private def fullBox(name: String, version: Int,
      body: Array[Byte]): Array[Byte] = {
    val o = new ByteArrayOutputStream()
    o.write(version); o.write(0); o.write(0); o.write(0) // version + flags
    o.write(body, 0, body.length)
    val boxed = new ByteArrayOutputStream()
    box(boxed, name, o.toByteArray)
    boxed.toByteArray
  }

  /** A playable motion-JPEG MP4/MOV holding `frames` (each a complete
    * baseline JPEG, e.g. from [[JpegWriter]]).
    */
  def mp4(width: Int, height: Int, frames: Seq[Array[Byte]],
      timescale: Int = 25, samplesPerChunk: Int = Int.MaxValue,
      useCo64: Boolean = false, quicktime: Boolean = false,
      moovFirst: Boolean = false): Array[Byte] = {
    require(frames.nonEmpty, "an MP4 needs at least one frame")
    val spc = math.max(1, math.min(samplesPerChunk, frames.length))
    val chunks = frames.grouped(spc).toSeq

    val ftyp = {
      val o = new ByteArrayOutputStream()
      cc(o, if (quicktime) "qt  " else "isom")
      be32(o, 0x200)
      cc(o, if (quicktime) "qt  " else "isom")
      cc(o, "mp41")
      val boxed = new ByteArrayOutputStream()
      box(boxed, "ftyp", o.toByteArray)
      boxed.toByteArray
    }
    val mdatPayload = frames.map(_.length.toLong).sum
    require(mdatPayload + 8 < Int.MaxValue, "mdat too large for a fixture")

    // moov is built as a pure function of the absolute chunk offsets;
    // every table number is fixed-width, so its size is offset-invariant
    // and the moovFirst layout converges in one re-render
    def moovBytes(chunkOffsets: Seq[Long]): Array[Byte] = {
      val duration = frames.length.toLong // one tick per frame

      val mvhd = {
        val o = new ByteArrayOutputStream()
        be32(o, 0); be32(o, 0) // creation, modification
        be32(o, timescale); be32(o, duration)
        be32(o, 0x00010000); be16(o, 0x0100); be16(o, 0) // rate, volume
        be32(o, 0); be32(o, 0) // reserved
        Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(be32(o, _)) // identity matrix
        (0 until 6).foreach(_ => be32(o, 0)) // pre_defined
        be32(o, 2) // next track id
        fullBox("mvhd", 0, o.toByteArray)
      }

      val tkhd = {
        val o = new ByteArrayOutputStream()
        be32(o, 0); be32(o, 0) // creation, modification
        be32(o, 1) // track id
        be32(o, 0) // reserved
        be32(o, duration)
        be32(o, 0); be32(o, 0) // reserved
        be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0) // layer, group, volume, rsvd
        Seq(0x00010000L, 0L, 0L, 0L, 0x00010000L, 0L, 0L, 0L, 0x40000000L)
          .foreach(be32(o, _))
        be32(o, width.toLong << 16); be32(o, height.toLong << 16)
        // flags 3 = enabled | in-movie; tkhd carries flags in a v0 box
        val f = new ByteArrayOutputStream()
        f.write(0); f.write(0); f.write(0); f.write(3)
        f.write(o.toByteArray, 0, o.size())
        val boxed = new ByteArrayOutputStream()
        box(boxed, "tkhd", f.toByteArray)
        boxed.toByteArray
      }

      val mdhd = {
        val o = new ByteArrayOutputStream()
        be32(o, 0); be32(o, 0)
        be32(o, timescale); be32(o, duration)
        be16(o, 0x55C4) // language 'und'
        be16(o, 0)
        fullBox("mdhd", 0, o.toByteArray)
      }

      val hdlr = {
        val o = new ByteArrayOutputStream()
        be32(o, 0)
        cc(o, "vide")
        be32(o, 0); be32(o, 0); be32(o, 0)
        cc(o, "GraftVideoHandler"); o.write(0)
        fullBox("hdlr", 0, o.toByteArray)
      }

      val stsd = {
        val entry = new ByteArrayOutputStream()
        (0 until 6).foreach(_ => entry.write(0)) // reserved
        be16(entry, 1) // data reference index
        be16(entry, 0); be16(entry, 0) // pre_defined, reserved
        (0 until 3).foreach(_ => be32(entry, 0)) // pre_defined
        be16(entry, width); be16(entry, height)
        be32(entry, 0x00480000); be32(entry, 0x00480000) // 72 dpi
        be32(entry, 0) // reserved
        be16(entry, 1) // frame count per sample
        val name = "Motion-JPEG".getBytes("US-ASCII")
        entry.write(name.length)
        entry.write(name, 0, name.length)
        (0 until 31 - name.length).foreach(_ => entry.write(0))
        be16(entry, 24) // depth
        be16(entry, 0xFFFF) // pre_defined -1
        val eBoxed = new ByteArrayOutputStream()
        box(eBoxed, if (quicktime) "jpeg" else "dmb1", entry.toByteArray)

        val o = new ByteArrayOutputStream()
        be32(o, 1) // entry count
        o.write(eBoxed.toByteArray, 0, eBoxed.size())
        fullBox("stsd", 0, o.toByteArray)
      }

      val stts = {
        val o = new ByteArrayOutputStream()
        be32(o, 1)
        be32(o, frames.length.toLong); be32(o, 1) // every sample 1 tick
        fullBox("stts", 0, o.toByteArray)
      }

      val stsc = {
        // runs: all chunks carry spc samples except a shorter last one
        val lastN = frames.length - spc * (chunks.length - 1)
        val runs =
          if (chunks.length == 1) Seq((1L, frames.length.toLong))
          else if (lastN == spc) Seq((1L, spc.toLong))
          else Seq((1L, spc.toLong), (chunks.length.toLong, lastN.toLong))
        val o = new ByteArrayOutputStream()
        be32(o, runs.length.toLong)
        runs.foreach { case (first, n) =>
          be32(o, first); be32(o, n); be32(o, 1)
        }
        fullBox("stsc", 0, o.toByteArray)
      }

      val stsz = {
        val o = new ByteArrayOutputStream()
        be32(o, 0) // variable sizes
        be32(o, frames.length.toLong)
        frames.foreach(f => be32(o, f.length.toLong))
        fullBox("stsz", 0, o.toByteArray)
      }

      val chunkBox = {
        val o = new ByteArrayOutputStream()
        be32(o, chunkOffsets.length.toLong)
        chunkOffsets.foreach(off => if (useCo64) be64(o, off) else be32(o, off))
        fullBox(if (useCo64) "co64" else "stco", 0, o.toByteArray)
      }

      val dinf = {
        val url = fullBox("url ", 0, Array.emptyByteArray)
        // flags=1 (self-contained) lives in url 's flag byte
        url(url.length - 1) = 1
        val dref = {
          val o = new ByteArrayOutputStream()
          be32(o, 1)
          o.write(url, 0, url.length)
          fullBox("dref", 0, o.toByteArray)
        }
        val boxed = new ByteArrayOutputStream()
        box(boxed, "dinf", dref)
        boxed.toByteArray
      }

      val vmhd = {
        val o = new ByteArrayOutputStream()
        be16(o, 0); be16(o, 0); be16(o, 0); be16(o, 0)
        val f = fullBox("vmhd", 0, o.toByteArray)
        f(11) = 1 // flags = 1, spec-required
        f
      }

      val stbl = {
        val o = new ByteArrayOutputStream()
        o.write(stsd, 0, stsd.length)
        o.write(stts, 0, stts.length)
        o.write(stsc, 0, stsc.length)
        o.write(stsz, 0, stsz.length)
        o.write(chunkBox, 0, chunkBox.length)
        val boxed = new ByteArrayOutputStream()
        box(boxed, "stbl", o.toByteArray)
        boxed.toByteArray
      }

      val minf = {
        val o = new ByteArrayOutputStream()
        o.write(vmhd, 0, vmhd.length)
        o.write(dinf, 0, dinf.length)
        o.write(stbl, 0, stbl.length)
        val boxed = new ByteArrayOutputStream()
        box(boxed, "minf", o.toByteArray)
        boxed.toByteArray
      }

      val mdia = {
        val o = new ByteArrayOutputStream()
        o.write(mdhd, 0, mdhd.length)
        o.write(hdlr, 0, hdlr.length)
        o.write(minf, 0, minf.length)
        val boxed = new ByteArrayOutputStream()
        box(boxed, "mdia", o.toByteArray)
        boxed.toByteArray
      }

      val trak = {
        val o = new ByteArrayOutputStream()
        o.write(tkhd, 0, tkhd.length)
        o.write(mdia, 0, mdia.length)
        val boxed = new ByteArrayOutputStream()
        box(boxed, "trak", o.toByteArray)
        boxed.toByteArray
      }

      val o = new ByteArrayOutputStream()
      o.write(mvhd, 0, mvhd.length)
      o.write(trak, 0, trak.length)
      val boxed = new ByteArrayOutputStream()
      box(boxed, "moov", o.toByteArray)
      boxed.toByteArray
    }

    def mdatBytes: Array[Byte] = {
      val o = new ByteArrayOutputStream()
      be32(o, mdatPayload + 8)
      cc(o, "mdat")
      frames.foreach(f => o.write(f, 0, f.length))
      o.toByteArray
    }

    // chunk offsets are absolute file positions of each chunk's first
    // sample; they depend on what precedes mdat
    def chunkOffsets(mdatDataStart: Long): Seq[Long] = {
      var off = mdatDataStart
      chunks.map { ch =>
        val here = off
        off += ch.map(_.length.toLong).sum
        here
      }
    }

    val out = new ByteArrayOutputStream()
    out.write(ftyp, 0, ftyp.length)
    if (moovFirst) {
      // moov size is offset-invariant: render once with zeros to learn
      // it, then again with the real offsets
      val probe = moovBytes(chunks.map(_ => 0L))
      val dataStart = ftyp.length.toLong + probe.length + 8
      val moov = moovBytes(chunkOffsets(dataStart))
      require(moov.length == probe.length, "moov must be offset-invariant")
      out.write(moov, 0, moov.length)
      out.write(mdatBytes, 0, mdatPayload.toInt + 8)
    } else {
      out.write(mdatBytes, 0, mdatPayload.toInt + 8)
      val moov = moovBytes(chunkOffsets(ftyp.length + 8L))
      out.write(moov, 0, moov.length)
    }
    out.toByteArray
  }
}
