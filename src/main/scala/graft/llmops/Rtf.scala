package graft.llmops

import scala.util.control.NonFatal

/** JDK-only RTF text extraction — the remaining common legacy document
  * format after OOXML ([[Ooxml]]), PDF ([[Pdf]]) and OLE2
  * ([[LegacyOffice]]). RTF is a text markup of groups `{...}` and control
  * words `\word[-]N`; extraction is a single-pass state machine:
  *
  *   - destination groups that carry no body text (`\fonttbl`,
  *     `\colortbl`, `\stylesheet`, `\info`, `\pict`, any `{\*\...}`) are
  *     skipped to their closing brace.
  *   - `\par`/`\line` → '\n', `\tab` → '\t', `\~` → space; `\\ \{ \}`
  *     unescape; `\'xx` is a CP1252 byte; `\uN` is a signed 16-bit code
  *     unit followed by `\ucN` fallback chars to skip (default 1).
  *   - all other control words are formatting and drop.
  *
  * Poison-document posture as everywhere in this package: malformed input
  * returns None or best-effort text, never throws.
  */
object Rtf {

  private val SkipDestinations = Set(
    "fonttbl", "colortbl", "stylesheet", "info", "pict", "header", "footer",
    "generator", "themedata", "listtable", "listoverridetable", "xmlnstbl")

  def rtfText(bytes: Array[Byte]): Option[String] =
    try {
      if (bytes == null) return None
      val s = new String(bytes, "windows-1252")
      if (!s.startsWith("{\\rtf")) return None
      val out = new java.lang.StringBuilder
      var i = 0
      val n = s.length
      var skipDepth = 0 // inside a skip destination until depth back to 0
      var ucSkip = 1 // \ucN: fallback chars after \uN — group-scoped
      var ucStack: List[Int] = Nil // saved \uc per open group, popped on '}'
      var pendingSkip = 0 // chars to drop (the \uN fallback)
      var depth = 0

      def parseControl(): Unit = {
        // i points at the char after '\'
        if (i >= n) return
        val c = s.charAt(i)
        if (!Character.isLetter(c)) {
          // control symbol
          c match {
            case '\\' | '{' | '}' =>
              if (skipDepth == 0) {
                if (pendingSkip > 0) pendingSkip -= 1 else out.append(c)
              }
              i += 1
            case '\'' =>
              if (i + 2 < n) {
                val hex = s.substring(i + 1, i + 3)
                i += 3
                if (skipDepth == 0) {
                  if (pendingSkip > 0) pendingSkip -= 1
                  else try {
                    out.append(new String(
                      Array(Integer.parseInt(hex, 16).toByte), "windows-1252"))
                  } catch { case _: NumberFormatException => }
                }
              } else i = n
            case '~' =>
              if (skipDepth == 0) out.append(' ')
              i += 1
            case '*' =>
              // {\*\dest ...}: unknown destination — skip the whole group
              if (skipDepth == 0) skipDepth = depth
              i += 1
            case _ => i += 1 // other symbols: formatting
          }
        } else {
          val start = i
          while (i < n && Character.isLetter(s.charAt(i))) i += 1
          val word = s.substring(start, i)
          var param = 0
          var hasParam = false
          var neg = false
          if (i < n && (s.charAt(i) == '-' || Character.isDigit(s.charAt(i)))) {
            hasParam = true
            if (s.charAt(i) == '-') { neg = true; i += 1 }
            val ps = i
            while (i < n && Character.isDigit(s.charAt(i))) i += 1
            param = try s.substring(ps, i).toInt
            catch { case _: NumberFormatException => 0 }
            if (neg) param = -param
          }
          if (i < n && s.charAt(i) == ' ') i += 1 // delimiter space consumed
          if (word == "bin" && hasParam && param > 0) {
            // \binN is followed by N RAW bytes (windows-1252 decode is
            // 1:1 byte↔char, so N chars here): they are picture data, not
            // markup — a '}' byte inside them must not close the group or
            // end a \pict skip early and leak raster bytes as text
            i = math.min(n.toLong, i.toLong + param).toInt
          } else
          if (skipDepth == 0) word match {
            case "par" | "line" | "sect" | "page" => out.append('\n')
            case "tab" => out.append('\t')
            case "emdash" => out.append('—')
            case "endash" => out.append('–')
            case "lquote" => out.append('‘')
            case "rquote" => out.append('’')
            case "ldblquote" => out.append('“')
            case "rdblquote" => out.append('”')
            case "uc" if hasParam => ucSkip = math.max(0, param)
            case "u" if hasParam =>
              out.append(((param + 0x10000) % 0x10000).toChar)
              pendingSkip = ucSkip
            case w if SkipDestinations(w) => skipDepth = depth
            case _ => // formatting word
          }
        }
      }

      while (i < n) {
        s.charAt(i) match {
          case '{' =>
            depth += 1; ucStack = ucSkip :: ucStack; i += 1
          case '}' =>
            depth -= 1
            // \uc is scoped to its group: restore the opener's value
            ucStack match {
              case h :: t => ucSkip = h; ucStack = t
              case Nil => // unbalanced '}': keep current (best-effort)
            }
            if (skipDepth > 0 && depth < skipDepth) skipDepth = 0
            i += 1
          case '\\' => i += 1; parseControl()
          case '\r' | '\n' => i += 1 // raw newlines are not text in RTF
          case c =>
            if (skipDepth == 0) {
              if (pendingSkip > 0) pendingSkip -= 1 else out.append(c)
            }
            i += 1
        }
      }
      // trim the trailing newline most writers emit after the last \par
      var e = out.length
      while (e > 0 && (out.charAt(e - 1) == '\n' || out.charAt(e - 1) == ' '))
        e -= 1
      Some(out.substring(0, e))
    } catch { case NonFatal(_) => None }

  /** Fixture twin: paragraphs → a minimal standard RTF document (font
    * table destination, CP1252 escapes for 0x80-0xFF, `\uN` + '?'
    * fallback above).
    */
  def write(paragraphs: Seq[String]): Array[Byte] = {
    val body = new StringBuilder
    body ++= "{\\rtf1\\ansi\\ansicpg1252\\deff0{\\fonttbl{\\f0 Helvetica;}}\\uc1 "
    paragraphs.foreach { p =>
      p.foreach {
        case '\\' => body ++= "\\\\"
        case '{' => body ++= "\\{"
        case '}' => body ++= "\\}"
        case '\t' => body ++= "\\tab "
        case '\n' => body ++= "\\line "
        case c if c < 0x80 => body += c
        case c if c < 0x100 => body ++= f"\\'$c%02x"
        case c => // \uN is signed 16-bit: code units over 32767 go negative
          body ++= s"\\u${if (c > 32767) c.toInt - 65536 else c.toInt}?"
      }
      body ++= "\\par "
    }
    body ++= "}"
    body.toString.getBytes("windows-1252")
  }
}
