package graft.llmops

/** Spec-shaped ZIM writer twin of [[Zim]] — fixtures for the reader
  * (and a usable exporter for small corpora): sorted url/title pointer
  * lists, mime list, directory entries, blob clusters compressed with
  * the native encoders (`none` / `xz` / `zstd` — the codecs the spec
  * allows today), trailing md5. Layout mirrors the openzim spec ordering
  * (header, mime list, pointer lists, directory, clusters, checksum).
  */
object ZimWriter {

  private def wr16(out: java.io.ByteArrayOutputStream, v: Int): Unit = {
    out.write(v & 0xff); out.write((v >>> 8) & 0xff)
  }

  private def wr32(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 4) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
  }

  private def wr64(out: java.io.ByteArrayOutputStream, v: Long): Unit = {
    var k = 0
    while (k < 8) { out.write(((v >>> (8 * k)) & 0xff).toInt); k += 1 }
  }

  private def cStr(out: java.io.ByteArrayOutputStream, s: String): Unit = {
    out.write(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    out.write(0)
  }

  /** Build one ZIM image.
    *
    * @param content   `(namespace, url, title, mime, bytes)` articles
    * @param redirects `(namespace, url, title, (targetNs, targetUrl))`;
    *                  the target must exist among `content`
    * @param codec     cluster compression: `none`, `xz` or `zstd`
    * @param blobsPerCluster blobs per cluster (the spec suggests ~1 MB
    *                  clusters; fixtures keep this small so several
    *                  clusters exist)
    */
  def write(content: Seq[(String, String, String, String, Array[Byte])],
      redirects: Seq[(String, String, String, (String, String))] = Seq.empty,
      codec: String = "zstd", blobsPerCluster: Int = 8): Array[Byte] = {
    require(Seq("none", "xz", "zstd").contains(codec),
      s"ZIM cluster codec must be none/xz/zstd, got $codec")
    require(blobsPerCluster > 0, "blobsPerCluster must be positive")

    // entry order = sorted by (ns, url) — the url pointer list contract
    sealed trait E {
      def ns: String; def url: String; def title: String
    }
    final case class C(ns: String, url: String, title: String, mime: String,
      bytes: Array[Byte]) extends E
    final case class R(ns: String, url: String, title: String,
      target: (String, String)) extends E
    val all: Seq[E] =
      (content.map(c => C(c._1, c._2, c._3, c._4, c._5)) ++
        redirects.map(r => R(r._1, r._2, r._3, r._4)))
        .sortBy(e => (e.ns, e.url))
    val idxOf: Map[(String, String), Int] =
      all.zipWithIndex.map { case (e, i) => (e.ns, e.url) -> i }.toMap

    val mimes = all.collect { case c: C => c.mime }.distinct.sorted
    val mimeIdx = mimes.zipWithIndex.toMap

    // cluster assignment in entry order
    val contentEntries = all.zipWithIndex.collect { case (c: C, i) => (c, i) }
    val clustered = contentEntries.grouped(blobsPerCluster).toSeq
    val place: Map[Int, (Int, Int)] = clustered.zipWithIndex.flatMap {
      case (group, ci) => group.zipWithIndex.map {
        case ((_, entryIdx), blob) => entryIdx -> (ci, blob)
      }
    }.toMap

    val clusterBytes: Seq[Array[Byte]] = clustered.map { group =>
      val blobs = group.map(_._1.bytes)
      val body = new java.io.ByteArrayOutputStream()
      var off = (blobs.length + 1) * 4L
      blobs.foreach { b => wr32(body, off); off += b.length }
      wr32(body, off)
      blobs.foreach(b => body.write(b, 0, b.length))
      val out = new java.io.ByteArrayOutputStream()
      codec match {
        case "none" => out.write(1); body.writeTo(out)
        case "xz" => out.write(4)
          out.write(Compression.encode(body.toByteArray, "xz"))
        case "zstd" => out.write(5)
          out.write(Compression.encode(body.toByteArray, "zstd"))
      }
      out.toByteArray
    }

    // directory entries, recording each entry's offset inside the blob
    val dir = new java.io.ByteArrayOutputStream()
    val entryOff = new Array[Long](all.length)
    all.zipWithIndex.foreach { case (e, i) =>
      entryOff(i) = dir.size().toLong
      e match {
        case c: C =>
          val (ci, blob) = place(i)
          wr16(dir, mimeIdx(c.mime))
          dir.write(0) // param len
          dir.write(c.ns.charAt(0).toInt)
          wr32(dir, 0L) // revision
          wr32(dir, ci.toLong)
          wr32(dir, blob.toLong)
          cStr(dir, c.url); cStr(dir, c.title)
        case r: R =>
          val target = idxOf.getOrElse(r.target,
            throw new IllegalArgumentException(
              s"redirect target ${r.target} not in archive"))
          wr16(dir, 0xFFFF)
          dir.write(0)
          dir.write(r.ns.charAt(0).toInt)
          wr32(dir, 0L)
          wr32(dir, target.toLong)
          cStr(dir, r.url); cStr(dir, r.title)
      }
    }

    val mimeList = new java.io.ByteArrayOutputStream()
    mimes.foreach(cStr(mimeList, _))
    mimeList.write(0) // empty string terminator

    // region offsets
    val mimeListPos = 80L
    val urlPtrPos = mimeListPos + mimeList.size()
    val titlePtrPos = urlPtrPos + 8L * all.length
    val dirPos = titlePtrPos + 4L * all.length
    val clusterPtrPos = dirPos + dir.size()
    val clustersPos = clusterPtrPos + 8L * clusterBytes.length
    val clusterOffsets = clusterBytes.scanLeft(clustersPos)(_ + _.length)
    val checksumPos = clusterOffsets.last

    val out = new java.io.ByteArrayOutputStream()
    wr32(out, Zim.MagicLE)
    wr16(out, 6); wr16(out, 0)
    out.write(new Array[Byte](16)) // uuid (fixtures: zero)
    wr32(out, all.length.toLong)
    wr32(out, clusterBytes.length.toLong)
    wr64(out, urlPtrPos)
    wr64(out, titlePtrPos)
    wr64(out, clusterPtrPos)
    wr64(out, mimeListPos)
    wr32(out, 0xFFFFFFFFL) // mainPage: none
    wr32(out, 0xFFFFFFFFL) // layoutPage: none
    wr64(out, checksumPos)
    mimeList.writeTo(out)
    entryOff.foreach(o => wr64(out, dirPos + o))
    // title pointer list: entry indices sorted by (ns, title, url)
    all.zipWithIndex.sortBy { case (e, _) => (e.ns, e.title, e.url) }
      .foreach { case (_, i) => wr32(out, i.toLong) }
    dir.writeTo(out)
    clusterOffsets.dropRight(1).foreach(wr64(out, _))
    clusterBytes.foreach(b => out.write(b, 0, b.length))
    val md = java.security.MessageDigest.getInstance("MD5")
    out.write(md.digest(out.toByteArray), 0, 16)
    out.toByteArray
  }
}
