package graft.llmops

/** Shared reference-compressed Brotli streams (public brotli library,
  * qualities 2–11, windows 10–24) with their raw twins — the embedded
  * seed corpus for BrotliSpec's exact-decode checks and the fallback
  * corpus for the fuzz batteries when the full offline corpus
  * (/tmp/brotli_fuzz, 876 streams) is not mounted.
  */
object BrotliFixtures {

  private def b64(s: String): Array[Byte] =
    java.util.Base64.getMimeDecoder.decode(s)

  // dictionary-heavy English text, q11 w22 (67 bytes for 1392)
  val FxText: String =
    """G28F4I2ULt6kmioM7U6ClM0RTQ7Yr5VAIIm+OAXOsRa1admRHwUXiDgfg26/SnSsIGoQOEjD
      |MZFR0dzt2/3boLfFCA==""".stripMargin
  val FxTextRaw: String =
    ("The documents of the public internet, with their code and data and " +
      "time and life, show only that the city was open. ") * 12

  // UTF-8 multibyte (ferment transforms walk 2- and 3-byte chars), q9 w16
  val FxUtf8: String =
    """IkoAgCM16ovZnU6O9EChf+3N6wB2wkCVIy3zkunxgNIn15OFnP+sfVQTTVAF4JADh28BZhwA
      |x4lg4CErWfmnsQyzKzQnTT5anJfJojk13G9yy1fykJQYUWLv4t3gS1tAHJUu1ToXYgA=""".stripMargin
  val FxUtf8Raw: String =
    "naïve café über straße Привет мир こんにちは世界 — the first transform test. " * 6

  // incompressible bytes (literal-only path), q5 w10
  val FxRandom: String =
    """IawEBIK3Du5/GlA5vvB+wjR/Bm7Qj13HUSRH40BDAAJrblRVlKBlaF1kxJgLuNRUSochqZoB
      |rSGetZz2oV728Vodgwu3zgnWu8AE5xdcZDx97LC1gOw3vJcS3S5qrrlLro0vn6KcWihMnvdS
      |GCnPEHmwgOnXShwQ/KtqQkPTNlbevkwe15ZI6Fbo+aL1jJXwzks5wVv/rVwt+4u4ILYRnLqP
      |+IeWrlsF8oCmjO2TtrKMsNGzWOa6q0hVZbn0kCjVV9eaig5kUeFccFwV8XNUG0Q4olz3YxLU
      |7rPCJGh5vwCzz47ROr8SmjCXrZa0QtbRve9IUMP0ZUQuswDDN6ZIpsDb3XP8lfXCxFGFmv6A
      |1AqjnfuSSfQMPuN9lhRFyAb1jHzyEn36iU+SlvzzPAhAmQM=""".stripMargin
  // the literal 300 payload bytes of FxRandom (checksum-pinned in
  // BrotliSpec; store-mode q5 keeps them verbatim inside the stream)
  val FxRandomRaw: String =
    """grcO7n8aUDm+8H7CNH8GbtCPXcdRJEfjQEMAAmtuVFWUoGVoXWTEmAu41FRKhyGpmgGtIZ61
      |nPahXvbxWh2DC7fOCda7wATnF1xkPH3ssLWA7De8lxLdLmquuUuujS+fopxaKEye91IYKc8Q
      |ebCA6ddKHBD8q2pCQ9M2Vt6+TB7XlkjoVuj5ovWMlfDOSznBW/+tXC37i7ggthGcuo/4h5au
      |WwXygKaM7ZO2soyw0bNY5rqrSFVlufSQKNVX15qKDmRR4VxwXBXxc1QbRDiiXPdjEtTus8Ik
      |aHm/ALPPjtE6vxKaMJetlrRC1tG970hQw/RlRC6zAMM3pkimwNvdc/yV9cLEUYWa/oDUCqOd
      |+5JJ9Aw+432WFEXIBvWMfPISffqJT5KW/PM8CECZ""".stripMargin

  // long repeat (ring-buffer distances), q2 w24
  val FxRepeat: String =
    """H18JAICqqqrq/3Sl85UuzHcGHoCDsSASk8QAd9psRxEA0JmDAw==""".stripMargin
  val FxRepeatRaw: String = "graft " * 400

  val FxEmpty: String = "Ow=="

  /** (name, reference-compressed bytes, expected raw bytes). */
  def pairs: Seq[(String, Array[Byte], Array[Byte])] = Seq(
    ("fx_text", b64(FxText), FxTextRaw.getBytes("UTF-8")),
    ("fx_utf8", b64(FxUtf8), FxUtf8Raw.getBytes("UTF-8")),
    ("fx_random", b64(FxRandom), b64(FxRandomRaw)),
    ("fx_repeat", b64(FxRepeat), FxRepeatRaw.getBytes("UTF-8")),
    ("fx_empty", b64(FxEmpty), Array.emptyByteArray))

  /** The fuzz corpus: the full offline interop corpus when mounted at
    * /tmp/brotli_fuzz, else the embedded fixture pairs — the batteries
    * always run; the offline mount only widens them.
    */
  def corpus(): Seq[(String, Array[Byte], Array[Byte])] = {
    val dir = new java.io.File("/tmp/brotli_fuzz")
    if (!dir.isDirectory) pairs
    else dir.listFiles().filter(_.getName.endsWith(".br")).sortBy(_.getName)
      .toSeq.map { f =>
        (f.getName,
          java.nio.file.Files.readAllBytes(f.toPath),
          java.nio.file.Files.readAllBytes(
            new java.io.File(f.getPath.stripSuffix(".br") + ".raw").toPath))
      }
  }
}
