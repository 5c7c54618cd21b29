package graft.llmops

/** Minimal recursive-descent JSON parser for executor-side metadata
  * parsing (Avro container schemas and similar format headers), where
  * Spark's `from_json` is unavailable because the shape is recursive or
  * the parse happens inside a reader kernel. Reference hook: document
  * ingestion, `aje_libs/documents/helpers/document_processor.py:10-83`.
  *
  * Values map to: `Map[String, Any]` (object, insertion-ordered),
  * `Vector[Any]` (array), `String`, `java.lang.Boolean`,
  * `java.lang.Long` (integral) / `java.lang.Double` (fractional),
  * `null`. Malformed input returns null rather than throwing — the
  * ingestion-family contract for untrusted bytes.
  */
object Json {

  def parse(s: String): Any = {
    if (s == null) return null
    try {
      val p = new P(s)
      p.ws()
      val v = p.value()
      p.ws()
      if (p.i != s.length) null else v
    } catch { case scala.util.control.NonFatal(_) => null }
  }

  /** parse() narrowed to an object, null otherwise. */
  def parseObject(s: String): Map[String, Any] = parse(s) match {
    case m: Map[_, _] => m.asInstanceOf[Map[String, Any]]
    case _ => null
  }

  /** Nesting ceiling: the recursive descent would otherwise turn a
    * crafted "[[[[…" (an untrusted Avro schema header, a forged delta
    * commit) into a StackOverflowError — which is FATAL, escapes the
    * NonFatal catch in [[parse]], and kills the task instead of
    * degrading to null. 512 is far past any real metadata document.
    */
  private val MaxDepth = 512

  private final class P(s: String) {
    var i = 0
    private var depth = 0
    private def fail(): Nothing = throw new IllegalArgumentException(
      s"json parse error at $i")
    private[Json] def enter(): Unit = {
      depth += 1
      if (depth > MaxDepth) fail()
    }
    private[Json] def exit(): Unit = depth -= 1
    def ws(): Unit =
      while (i < s.length && (s.charAt(i) == ' ' || s.charAt(i) == '\t' ||
        s.charAt(i) == '\n' || s.charAt(i) == '\r')) i += 1
    private def expect(c: Char): Unit = {
      if (i >= s.length || s.charAt(i) != c) fail()
      i += 1
    }
    def value(): Any = {
      if (i >= s.length) fail()
      s.charAt(i) match {
        case '{' => obj()
        case '[' => arr()
        case '"' => str()
        case 't' =>
          if (!s.startsWith("true", i)) fail(); i += 4; java.lang.Boolean.TRUE
        case 'f' =>
          if (!s.startsWith("false", i)) fail(); i += 5; java.lang.Boolean.FALSE
        case 'n' =>
          if (!s.startsWith("null", i)) fail(); i += 4; null
        case c if c == '-' || (c >= '0' && c <= '9') => num()
        case _ => fail()
      }
    }
    private def obj(): Map[String, Any] = {
      enter()
      expect('{'); ws()
      val b = scala.collection.immutable.ListMap.newBuilder[String, Any]
      if (i < s.length && s.charAt(i) == '}') {
        i += 1; exit(); return b.result()
      }
      var more = true
      while (more) {
        ws()
        val k = str()
        ws(); expect(':'); ws()
        b += k -> value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect('}'); more = false }
      }
      exit()
      b.result()
    }
    private def arr(): Vector[Any] = {
      enter()
      expect('['); ws()
      val b = Vector.newBuilder[Any]
      if (i < s.length && s.charAt(i) == ']') {
        i += 1; exit(); return b.result()
      }
      var more = true
      while (more) {
        ws()
        b += value()
        ws()
        if (i < s.length && s.charAt(i) == ',') i += 1
        else { expect(']'); more = false }
      }
      exit()
      b.result()
    }
    private def str(): String = {
      expect('"')
      val b = new java.lang.StringBuilder
      while (i < s.length && s.charAt(i) != '"') {
        val c = s.charAt(i)
        if (c == '\\') {
          i += 1
          if (i >= s.length) fail()
          s.charAt(i) match {
            case '"' => b.append('"')
            case '\\' => b.append('\\')
            case '/' => b.append('/')
            case 'b' => b.append('\b')
            case 'f' => b.append('\f')
            case 'n' => b.append('\n')
            case 'r' => b.append('\r')
            case 't' => b.append('\t')
            case 'u' =>
              if (i + 4 >= s.length) fail()
              // exactly four hex DIGITS: Integer.parseInt(_, 16) also
              // accepts a sign character, which no JSON escape carries
              var v = 0
              var k = 1
              while (k <= 4) {
                val d = Character.digit(s.charAt(i + k), 16)
                if (d < 0) fail()
                v = (v << 4) | d
                k += 1
              }
              b.append(v.toChar)
              i += 4
            case _ => fail()
          }
        } else b.append(c)
        i += 1
      }
      expect('"')
      b.toString
    }
    private def num(): Any = {
      val start = i
      if (i < s.length && s.charAt(i) == '-') i += 1
      while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      var frac = false
      if (i < s.length && s.charAt(i) == '.') {
        frac = true; i += 1
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      if (i < s.length && (s.charAt(i) == 'e' || s.charAt(i) == 'E')) {
        frac = true; i += 1
        if (i < s.length && (s.charAt(i) == '+' || s.charAt(i) == '-')) i += 1
        while (i < s.length && s.charAt(i) >= '0' && s.charAt(i) <= '9') i += 1
      }
      val t = s.substring(start, i)
      if (t.isEmpty || t == "-") fail()
      if (frac) java.lang.Double.valueOf(t)
      else
        try java.lang.Long.valueOf(t)
        catch { case _: NumberFormatException => java.lang.Double.valueOf(t) }
    }
  }
}
