package graft.llmops

import org.scalatest.funsuite.AnyFunSuite

/** RTF extraction: writer-twin round trips, hand-authored markup with
  * destinations/escapes/unicode, and the no-throw posture.
  */
class RtfSpec extends AnyFunSuite {

  test("round trip: paragraphs, escapes, tabs, inline breaks") {
    val paras = Seq("Plain text", "braces {x} and back\\slash", "tab\there\nsplit")
    assert(Rtf.rtfText(Rtf.write(paras)) ===
      Some("Plain text\nbraces {x} and back\\slash\ntab\there\nsplit"))
  }

  test("round trip: CP1252 accents and unicode beyond latin-1") {
    val paras = Seq("café naïve", "λ中—dash")
    assert(Rtf.rtfText(Rtf.write(paras)) === Some("café naïve\nλ中—dash"))
  }

  test("hand-authored: destinations and formatting words are elided") {
    val rtf = ("{\\rtf1\\ansi{\\fonttbl{\\f0 Arial;}}{\\colortbl;\\red0;}" +
      "{\\info{\\author nobody}}{\\*\\generator Acme 1.0;}" +
      "\\pard\\b Bold\\b0  and \\i italic\\i0\\par done}").getBytes("windows-1252")
    assert(Rtf.rtfText(rtf) === Some("Bold and italic\ndone"))
  }

  test("hand-authored: \\uc0 and hex escapes") {
    val rtf = "{\\rtf1\\ansi\\uc0 a\\u8212 b \\'e9\\par}".getBytes("windows-1252")
    assert(Rtf.rtfText(rtf) === Some("a—b é"))
  }

  test("\\ucN is group-scoped: a nested \\uc does not leak past its brace") {
    // outer group runs \uc1 (default); the nested group sets \uc2 which
    // must NOT apply to the \u after the group closes — per spec the
    // opener's \uc is restored on '}'
    val rtf = ("{\\rtf1\\ansi a{\\uc2\\u955 XY}\\u8212 ?z\\par}")
      .getBytes("windows-1252")
    // inside group: \u955 (λ) skips 2 fallback chars (XY); after the
    // group: \u8212 (em dash) skips exactly 1 ('?'), so 'z' survives
    assert(Rtf.rtfText(rtf) === Some("aλ—z"))
  }

  test("\\binN raw bytes are skipped whole: a '}' inside them stays opaque") {
    // \binN is followed by N RAW bytes; a '}' (0x7D) in them must not
    // close the \pict group early and leak raster bytes as text
    // bin data "}xx}" stays opaque; " raster" is still inside \pict and
    // drops; the next real '}' closes the pict group; "b" is body text.
    // Without the guard the first '}' ends the pict skip and "xx raster"
    // leaks into the text.
    val rtf = "{\\rtf1 a{\\pict\\bin4 }xx} raster}b}".getBytes("windows-1252")
    assert(Rtf.rtfText(rtf) === Some("ab"))
    // same bytes WITHOUT the \bin guard would have ended the pict group
    // at the embedded '}' — prove the control word itself is honored by
    // a bin run that contains the group's entire remaining markup
    val truncated = "{\\rtf1 x{\\pict\\bin9999 }}}}".getBytes("windows-1252")
    assert(Rtf.rtfText(truncated) === Some("x"), "overlong bin consumes to EOF")
  }

  test("non-RTF and truncated inputs return None or partial, never throw") {
    assert(Rtf.rtfText("plain text".getBytes) === None)
    assert(Rtf.rtfText(Array.emptyByteArray) === None)
    assert(Rtf.rtfText(null) === None)
    val full = Rtf.write(Seq("some paragraph text"))
    (0 until full.length by 3).foreach { cut =>
      Rtf.rtfText(java.util.Arrays.copyOfRange(full, 0, cut)) // no throw
    }
  }

  test("DocumentText dispatches rtf before the text/ arm") {
    val bytes = Rtf.write(Seq("via mime"))
    assert(DocumentText.extractText(bytes, "application/rtf") === Some("via mime"))
    assert(DocumentText.extractText(bytes, "text/rtf") === Some("via mime"))
  }
}
