package graft.llmops

/** One front door for the compressed-corpus codecs: magic-number
  * sniffing and decode dispatch over gzip/zlib-deflate (JDK), bzip2, xz,
  * zstd, lz4, framed snappy and LZW .Z (native kernels) — plus brotli, which
  * carries NO magic bytes and therefore never sniffs: it joins only the
  * explicitly-named paths (decode/encode by codec name, `.br` file
  * suffix, HTTP `Content-Encoding: br`). Symmetric encode dispatch
  * serves the shard writers. The corpus arms call [[decodeAuto]] so a
  * crawl payload or shard file decompresses the same way regardless of
  * which codec the producer picked. Reference hook: arbitrary-binary
  * ingestion, `aje_libs/documents/helpers/document_processor.py:10-83`.
  */
object Compression {

  private final val MaxOut = 64 << 20

  /** Codec names accepted by [[encode]] / returned by [[sniffCodec]].
    * `snappy` is the FRAMED format (the raw block format has no magic
    * to sniff; [[Snappy.decodeRaw]] serves it explicitly).
    */
  val Codecs: Seq[String] =
    Seq("gzip", "bzip2", "xz", "zstd", "lz4", "snappy", "compress")

  /** Every codec [[decode]]/[[encode]] accept BY NAME — [[Codecs]] plus
    * brotli, which cannot be sniffed (no magic) and so never appears in
    * [[sniffCodec]]/[[decodeAuto]] results.
    */
  val NamedCodecs: Seq[String] = Codecs :+ "br"

  /** [[graft.expressions.DecompressBytes]] as a Column. */
  def decompressCol(content: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.DecompressBytes(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content)))

  /** [[graft.expressions.DecodeBytes]] as a Column: decompress with an
    * EXPLICITLY named codec — the only scan-projection route to brotli,
    * which has no magic for [[decompressCol]] to sniff.
    */
  def decodeCol(content: org.apache.spark.sql.Column,
      codec: String): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.DecodeBytes(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content),
        codec))

  /** [[graft.expressions.ZstdDictDecode]] as a Column: decode
    * dictionary-compressed zstd frames in the scan projection, the
    * dictionary riding the expression once per task binary.
    */
  def zstdDictCol(content: org.apache.spark.sql.Column,
      dict: Array[Byte]): org.apache.spark.sql.Column =
    org.apache.spark.sql.graft.ColumnBridge.column(
      graft.expressions.ZstdDictDecode(
        org.apache.spark.sql.graft.ColumnBridge.expressionEager(content),
        dict))

  /** Sniff the codec from magic bytes; None when not a known container. */
  def sniffCodec(bytes: Array[Byte]): Option[String] = {
    if (bytes == null || bytes.length < 6) return None
    def u(i: Int) = bytes(i) & 0xff
    if (u(0) == 0x1f && u(1) == 0x8b) Some("gzip")
    else if (u(0) == 'B' && u(1) == 'Z' && u(2) == 'h' &&
      bytes(3) >= '1' && bytes(3) <= '9') Some("bzip2")
    else if (u(0) == 0xFD && u(1) == '7' && u(2) == 'z' && u(3) == 'X' &&
      u(4) == 'Z' && u(5) == 0) Some("xz")
    else if (u(0) == 0x28 && u(1) == 0xB5 && u(2) == 0x2F && u(3) == 0xFD)
      Some("zstd")
    else if (u(0) == 0x04 && u(1) == 0x22 && u(2) == 0x4D && u(3) == 0x18)
      Some("lz4")
    else if (Snappy.isFramed(bytes)) Some("snappy")
    else if (Lzw.isCompressed(bytes)) Some("compress")
    else None
  }

  /** Mime label for a sniffed codec (the document-pipeline vocabulary). */
  def codecMime(codec: String): String = codec match {
    case "gzip" => "application/gzip"
    case "bzip2" => "application/x-bzip2"
    case "xz" => "application/x-xz"
    case "zstd" => "application/zstd"
    case "lz4" => "application/x-lz4"
    case "snappy" => "application/x-snappy-framed"
    case "compress" => "application/x-compress"
    case "br" => "application/x-brotli"
    case other => other
  }

  private def gunzip(bytes: Array[Byte]): Array[Byte] = {
    try {
      val in = new java.util.zip.GZIPInputStream(
        new java.io.ByteArrayInputStream(bytes))
      val out = new java.io.ByteArrayOutputStream(math.min(
        bytes.length * 4, 1 << 20))
      val buf = new Array[Byte](64 * 1024)
      var n = in.read(buf)
      while (n > 0) {
        out.write(buf, 0, n)
        if (out.size() > MaxOut) return null
        n = in.read(buf)
      }
      in.close()
      out.toByteArray
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  private def gzip(bytes: Array[Byte]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream(bytes.length / 2 + 64)
    val gz = new java.util.zip.GZIPOutputStream(out)
    gz.write(bytes)
    gz.close()
    out.toByteArray
  }

  /** Decode with an explicit codec; null on failure. */
  def decode(bytes: Array[Byte], codec: String): Array[Byte] = codec match {
    case "gzip" => gunzip(bytes)
    case "bzip2" => Bzip2.decode(bytes)
    case "xz" => XzLzma.decode(bytes)
    case "zstd" => Zstd.decode(bytes)
    case "lz4" => Lz4.decode(bytes)
    case "snappy" => Snappy.decodeFramed(bytes)
    case "compress" => Lzw.decode(bytes)
    case "br" => Brotli.decode(bytes)
    case _ => null
  }

  /** Sniff-then-decode; null when the codec is unknown or decode fails. */
  def decodeAuto(bytes: Array[Byte]): Array[Byte] =
    sniffCodec(bytes) match {
      case Some(c) => decode(bytes, c)
      case None => null
    }

  /** Encode with the named codec (the writer twins). */
  def encode(bytes: Array[Byte], codec: String): Array[Byte] = codec match {
    case "gzip" => gzip(bytes)
    case "bzip2" => Bzip2Writer.encode(bytes)
    case "xz" => XzWriter.encode(bytes)
    case "zstd" => ZstdWriter.encode(bytes)
    case "lz4" => Lz4Writer.encode(bytes)
    case "snappy" => SnappyWriter.encode(bytes)
    case "compress" => Lzw.encode(bytes)
    case "br" => Brotli.encode(bytes)
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** File extension per codec (shard naming). */
  def extension(codec: String): String = codec match {
    case "gzip" => ".gz"
    case "bzip2" => ".bz2"
    case "xz" => ".xz"
    case "zstd" => ".zst"
    case "lz4" => ".lz4"
    case "snappy" => ".sz"
    case "compress" => ".Z"
    case "br" => ".br"
    case other => throw new IllegalArgumentException(s"unknown codec $other")
  }

  /** Codec from a file name's extension; None for plain files. */
  def codecForName(name: String): Option[String] = {
    val n = name.toLowerCase
    if (n.endsWith(".gz") || n.endsWith(".gzip")) Some("gzip")
    else if (n.endsWith(".bz2")) Some("bzip2")
    else if (n.endsWith(".xz")) Some("xz")
    else if (n.endsWith(".zst") || n.endsWith(".zstd")) Some("zstd")
    else if (n.endsWith(".lz4")) Some("lz4")
    else if (n.endsWith(".sz") || n.endsWith(".snappy")) Some("snappy")
    else if (n.endsWith(".z") && !n.endsWith(".gz") && !n.endsWith(".xz"))
      Some("compress") // .Z lowercased; gzip/xz suffixes already matched
    else if (n.endsWith(".br")) Some("br")
    else None
  }
}
