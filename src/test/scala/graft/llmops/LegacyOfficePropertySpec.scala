package graft.llmops

import org.scalacheck.{Gen, Prop, Test => ScTest}
import org.scalatest.funsuite.AnyFunSuite

/** Property tests for the legacy Office round trips: random content
  * through [[LegacyOfficeWriter]] and back through [[LegacyOffice]],
  * mixing ASCII (CP1252/compressed paths) and non-Latin text (UTF-16
  * paths) and straddling the mini/regular CFB storage cutoff via content
  * size.
  */
class LegacyOfficePropertySpec extends AnyFunSuite {

  private def run(prop: Prop): Unit = {
    val result = ScTest.check(
      ScTest.Parameters.default.withMinSuccessfulTests(100), prop)
    assert(result.passed, result.status.toString)
  }

  // printable non-space ASCII or a few multilingual chars; no control
  // chars (the doc extractor deliberately scrubs those), no '|' (the xls
  // line shape's cell separator), no whitespace (the doc extractor trims
  // trailing whitespace, so space-edged content cannot round-trip
  // verbatim — words join with single spaces below instead)
  private val charGen: Gen[Char] = Gen.frequency(
    8 -> Gen.choose(33.toChar, 126.toChar).suchThat(c => c != '|'),
    1 -> Gen.oneOf('é', 'ß', 'λ', 'ч', '中'))

  private val wordGen: Gen[String] = for {
    len <- Gen.choose(1, 12)
    cs <- Gen.listOfN(len, charGen)
  } yield cs.mkString

  private val lineGen: Gen[String] = for {
    n <- Gen.choose(1, 10)
    ws <- Gen.listOfN(n, wordGen)
  } yield ws.mkString(" ")

  test("doc: arbitrary paragraph lists round-trip") {
    run(Prop.forAll(Gen.nonEmptyListOf(lineGen)) { paras =>
      LegacyOffice.docText(LegacyOfficeWriter.doc(paras))
        .contains(paras.mkString("\n"))
    })
  }

  test("doc: arbitrary piece splits reassemble to the same text") {
    val piecesGen = for {
      n <- Gen.choose(1, 6)
      ps <- Gen.listOfN(n, lineGen)
    } yield ps
    run(Prop.forAll(piecesGen) { pieces =>
      LegacyOffice.docText(LegacyOfficeWriter.docPieces(pieces))
        .contains(pieces.mkString("").replaceAll("\\s+$", ""))
    })
  }

  test("xls: arbitrary string grids round-trip in the line shape") {
    val gridGen = for {
      rows <- Gen.choose(1, 6)
      cols <- Gen.choose(1, 4)
      cells <- Gen.listOfN(rows * cols, wordGen)
    } yield cells.grouped(cols).map(_.toSeq: Seq[Any]).toSeq
    run(Prop.forAll(gridGen) { grid =>
      val expected = "Sheet: s\n" + grid.zipWithIndex.map { case (r, i) =>
        s"Row ${i + 1}: ${r.mkString(" | ")}"
      }.mkString("\n") + "\n"
      LegacyOffice.xlsText(LegacyOfficeWriter.xls(Seq("s" -> grid)))
        .contains(expected)
    })
  }

  test("ppt: arbitrary slide decks round-trip in the slide shape") {
    val deckGen = for {
      n <- Gen.choose(1, 5)
      slides <- Gen.listOfN(n, Gen.nonEmptyListOf(lineGen))
    } yield slides
    run(Prop.forAll(deckGen) { slides =>
      val expected = slides.zipWithIndex.map { case (texts, i) =>
        s"Slide ${i + 1}: ${texts.mkString(" ")}"
      }.mkString("\n\n")
      LegacyOffice.pptText(LegacyOfficeWriter.ppt(slides)).contains(expected)
    })
  }
}
