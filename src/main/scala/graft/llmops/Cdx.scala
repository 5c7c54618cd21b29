package graft.llmops

/** CDXJ crawl-index parsing — the lookup sidecar of the WARC family:
  * petabyte-scale crawls are navigated by their CDX(J) indexes (one
  * line per capture: SURT key, 14-digit timestamp, JSON attributes
  * naming the archive file / byte offset / length of the record), so a
  * pipeline plans partition-pruned fetches from the index instead of
  * scanning archives. Completes the crawl-curation family next to
  * `WarcRecords`/`Sitemap`/`Robots`. Reference hook:
  * `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * [[records]] parses plain or codec-wrapped index shards; each line is
  * `<surt> <timestamp> <json>`. The JSON object is flat with string
  * values (the CDXJ convention); unknown keys are ignored, missing ones
  * come back null. Malformed lines are SKIPPED (index files routinely
  * carry a trailing partial line — curation posture: surface what
  * parses); bytes that parse to zero records refuse (null).
  */
object Cdx {

  final case class CdxRecord(surt: String, ts: String, url: String,
      mime: String, status: Integer, digest: String, filename: String,
      offset: java.lang.Long, length: java.lang.Long)

  private final val MaxBytes = 64 << 20
  private final val MaxRecords = 1 << 20

  def records(bytes: Array[Byte]): Array[CdxRecord] = {
    if (bytes == null || bytes.length == 0) return null
    val plain =
      if (Compression.sniffCodec(bytes).isDefined) {
        val d = Compression.decodeAuto(bytes)
        if (d == null || d.length > MaxBytes) return null else d
      } else if (bytes.length > MaxBytes) return null
      else bytes
    val text = new String(plain, java.nio.charset.StandardCharsets.UTF_8)
    val out = new scala.collection.mutable.ArrayBuffer[CdxRecord](256)
    for (line <- text.split("\n", -1); if line.nonEmpty) {
      if (out.length >= MaxRecords) return null
      parseLine(line.stripSuffix("\r")).foreach(out += _)
    }
    if (out.isEmpty) null else out.toArray
  }

  private def parseLine(line: String): Option[CdxRecord] = {
    val brace = line.indexOf('{')
    if (brace < 0) return None
    val head = line.substring(0, brace).trim
    val parts = head.split("\\s+")
    if (parts.length != 2) return None
    val surt = parts(0)
    val ts = parts(1)
    if (ts.isEmpty || !ts.forall(_.isDigit)) return None
    val json = flatJson(line.substring(brace)) match {
      case Some(m) => m
      case None => return None
    }
    def num(k: String): java.lang.Long =
      json.get(k).flatMap(v => try Some(java.lang.Long.valueOf(v.trim))
        catch { case _: NumberFormatException => None }).orNull
    val status: Integer = json.get("status")
      .flatMap(v => try Some(Integer.valueOf(v.trim))
        catch { case _: NumberFormatException => None }).orNull
    Some(CdxRecord(surt, ts,
      json.getOrElse("url", null),
      json.getOrElse("mime", null),
      status,
      json.getOrElse("digest", null),
      json.getOrElse("filename", null),
      num("offset"), num("length")))
  }

  /** Flat JSON object with string/number scalar values (the CDXJ shape);
    * None on structural damage. Escapes: \" \\ \/ \n \r \t \uXXXX.
    */
  private[llmops] def flatJson(s: String): Option[Map[String, String]] = {
    var i = 0
    val n = s.length
    def ws(): Unit = while (i < n && s.charAt(i).isWhitespace) i += 1
    def str(): Option[String] = {
      if (i >= n || s.charAt(i) != '"') return None
      i += 1
      val sb = new java.lang.StringBuilder
      while (i < n && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\' && i + 1 < n) {
          i += 1
          s.charAt(i) match {
            case '"' => sb.append('"')
            case '\\' => sb.append('\\')
            case '/' => sb.append('/')
            case 'n' => sb.append('\n')
            case 'r' => sb.append('\r')
            case 't' => sb.append('\t')
            case 'b' => sb.append('\b')
            case 'f' => sb.append('\f')
            case 'u' =>
              if (i + 4 >= n) return None
              try sb.append(Integer.parseInt(s.substring(i + 1, i + 5), 16).toChar)
              catch { case _: NumberFormatException => return None }
              i += 4
            case _ => return None
          }
          i += 1
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) return None
      i += 1 // closing quote
      Some(sb.toString)
    }
    ws()
    if (i >= n || s.charAt(i) != '{') return None
    i += 1
    val out = scala.collection.mutable.LinkedHashMap.empty[String, String]
    ws()
    if (i < n && s.charAt(i) == '}') return Some(out.toMap)
    var done = false
    while (!done) {
      ws()
      val k = str() match { case Some(v) => v; case None => return None }
      ws()
      if (i >= n || s.charAt(i) != ':') return None
      i += 1
      ws()
      val v: String =
        if (i < n && s.charAt(i) == '"') str() match {
          case Some(x) => x
          case None => return None
        }
        else {
          val start = i
          while (i < n && (s.charAt(i).isDigit || "+-.eE".indexOf(s.charAt(i)) >= 0))
            i += 1
          if (i == start) return None
          s.substring(start, i)
        }
      if (!out.contains(k)) out(k) = v
      ws()
      if (i < n && s.charAt(i) == ',') i += 1
      else if (i < n && s.charAt(i) == '}') { i += 1; done = true }
      else return None
    }
    Some(out.toMap)
  }

  /** Writer twin: one CDXJ shard for the given records. */
  def writeIndex(rs: Seq[CdxRecord], codec: Option[String] = None): Array[Byte] = {
    def esc(v: String): String =
      v.replace("\\", "\\\\").replace("\"", "\\\"")
    val sb = new java.lang.StringBuilder(256)
    for (r <- rs) {
      sb.append(r.surt).append(' ').append(r.ts).append(" {")
      val fields = Seq(
        "url" -> r.url, "mime" -> r.mime,
        "status" -> (if (r.status == null) null else r.status.toString),
        "digest" -> r.digest, "filename" -> r.filename,
        "offset" -> (if (r.offset == null) null else r.offset.toString),
        "length" -> (if (r.length == null) null else r.length.toString))
        .filter(_._2 != null)
      sb.append(fields.map { case (k, v) =>
        "\"" + k + "\": \"" + esc(v) + "\""
      }.mkString(", "))
      sb.append("}\n")
    }
    val plain = sb.toString.getBytes(java.nio.charset.StandardCharsets.UTF_8)
    codec match {
      case Some(c) => Compression.encode(plain, c)
      case None => plain
    }
  }
}
