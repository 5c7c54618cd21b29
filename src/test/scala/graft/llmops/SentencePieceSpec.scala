package graft.llmops

import graft.SparkTestBase
import graft.expressions.{SpEncode, SpModel}
import org.apache.spark.sql.functions._

class SentencePieceSpec extends SparkTestBase {

  import SentencePiece._

  private def mk(ps: (String, Float)*): SpModel =
    model(Piece("<unk>", 0f, TypeUnknown) +:
      ps.map { case (s, sc) => Piece(s, sc, TypeNormal) }.toVector)

  test("normalizer: trim, collapse runs, escape, dummy prefix") {
    assert(SpEncode.normalize("hello world") == "▁hello▁world")
    assert(SpEncode.normalize("  a\t\nb  ") == "▁a▁b")
    assert(SpEncode.normalize("") == "")
    assert(SpEncode.normalize(" \n ") == "")
    assert(SpEncode.normalize("x") == "▁x")
  }

  test("viterbi picks the max-score segmentation, not greedy") {
    // greedy longest-match would take ▁ab then stall on 'c'-less "cd";
    // viterbi compares totals: ▁a+bcd (-1-1=-2) beats ▁ab+c+d (-1-3-3=-7)
    val m = mk("▁a" -> -1f, "▁ab" -> -1f, "bcd" -> -1f, "c" -> -3f,
      "d" -> -3f)
    val ids = SpEncode.encodeIds("abcd", m)
    val surfaces = ids.map(m.pieces(_)._1).toSeq
    assert(surfaces == Seq("▁a", "bcd"))
  }

  test("ties keep the longer final piece; unknowns fall back per char") {
    val m = mk("▁a" -> -1f, "b" -> -1f, "▁ab" -> -2f)
    // ▁a+b and ▁ab both score -2: the longer final piece wins
    assert(SpEncode.encodeIds("ab", m).map(m.pieces(_)._1).toSeq ==
      Seq("▁ab"))
    // 'Z' and the bare trailing 'x' (no ▁x ends there) → two unks
    val m2 = mk("▁x" -> -1f)
    assert(SpEncode.encodeIds("xZx", m2).toSeq.count(_ == 0) == 2)
    // a model with NO unknown piece emits -1 sentinels
    val m3 = new SpModel(Array(("▁q", -1f)), -1)
    assert(SpEncode.encodeIds("qw", m3).toSeq == Seq(0, -1))
  }

  test("viterbi equals brute force on random small vocabularies") {
    val rnd = new scala.util.Random(7)
    val alphabet = "abc"
    (0 until 200).foreach { _ =>
      val surfaces = (Seq("▁a", "▁b", "▁c") ++
        (0 until 6).map(_ => (0 until 1 + rnd.nextInt(3))
          .map(_ => alphabet(rnd.nextInt(3))).mkString)).distinct
      val pieces = surfaces.map(s =>
        (s, -(1.0f + rnd.nextInt(50) / 10.0f)))
      val m = mk(pieces: _*)
      val text = (0 until 1 + rnd.nextInt(6))
        .map(_ => alphabet(rnd.nextInt(3))).mkString
      val s = SpEncode.normalize(text)
      val n = s.length
      // the kernel's lattice: piece edges from reachable starts, plus a
      // single-char unk edge into any position pieces cannot reach.
      // brute force then maximizes exhaustively over THAT edge set
      val reach = Array.fill(n + 1)(false)
      val unkEdge = Array.fill(n + 1)(false)
      reach(0) = true
      (1 to n).foreach { end =>
        var r = false
        (0 until end).foreach { start =>
          if (reach(start) &&
              m.index.get(s.substring(start, end)) != null) r = true
        }
        if (!r && reach(end - 1)) { unkEdge(end) = true; r = true }
        reach(end) = r
      }
      def bests(pos: Int): Double =
        if (pos == n) 0.0
        else {
          var best = Double.NegativeInfinity
          (pos + 1 to n).foreach { end =>
            val id = m.index.get(s.substring(pos, end))
            if (id != null) {
              val t = bests(end)
              if (t != Double.NegativeInfinity)
                best = math.max(best, m.pieces(id)._2 + t)
            }
          }
          if (unkEdge(pos + 1)) {
            val t = bests(pos + 1)
            if (t != Double.NegativeInfinity)
              best = math.max(best, m.unkScore + t)
          }
          best
        }
      val want = bests(0)
      val ids = SpEncode.encodeIds(text, m)
      val got = ids.map(id =>
        if (id == m.unkId) m.unkScore else m.pieces(id)._2.toDouble).sum
      assert(math.abs(got - want) < 1e-9,
        s"text=$text pieces=$pieces got=$got want=$want")
    }
  }

  test("control-piece surfaces never match literal text") {
    val pieces = Vector(
      Piece("<unk>", 0f, TypeUnknown),
      Piece("<s>", 0f, TypeControl),
      Piece("▁a", -1f, TypeNormal),
      Piece("<", -2f, TypeNormal), Piece("s", -2f, TypeNormal),
      Piece(">", -2f, TypeNormal))
    val m = model(pieces)
    // the literal text "<s>" tokenizes through content pieces, never
    // to the control id 1
    val ids = graft.expressions.SpEncode.encodeIds("a <s>", m)
    assert(!ids.contains(1))
    assert(ids.count(_ == m.unkId) == 1) // the ▁ before '<' has no piece
  }

  test("model proto round trip and unk detection") {
    val pieces = Vector(
      Piece("<unk>", 0f, TypeUnknown),
      Piece("▁the", -2.5f, TypeNormal),
      Piece("▁of", -3.125f, TypeNormal),
      Piece("ing", -4.75f, TypeNormal))
    val bytes = writeModel(pieces)
    assert(parseModel(bytes) == pieces)
    val m = modelFromBytes(bytes)
    assert(m.unkId == 0 && m.pieces.length == 4)
    assert(m.pieces(2) == ("▁of", -3.125f))
    // structural damage refuses
    intercept[IllegalArgumentException] {
      parseModel(Array[Byte](0x0a, 0x7f, 1))
    }
    intercept[IllegalArgumentException] { parseModel(Array.emptyByteArray) }
  }

  test("encode column + round-trip decode over a DataFrame") {
    val ss = spark
    import ss.implicits._
    val docs = Seq((1L, "the cat sat"), (2L, "  "), (3L, null))
      .toDF("id", "text")
    val pieces = wordUnigramModel(docs, "text")
    val m = model(pieces)
    val out = docs.select(col("id"),
        SentencePiece.encode(col("text"), m).as("ids"),
        SentencePiece.tokenCount(col("text"), m).as("n"))
      .orderBy("id").collect()
    assert(out(0).getSeq[Int](1).length == 3 && out(0).getLong(2) == 3L)
    assert(out(1).getSeq[Int](1).isEmpty)
    assert(out(2).isNullAt(1))
    val ids = out(0).getSeq[Int](1).toArray
    assert(SpEncode.decodeIds(ids, m) == "the cat sat")
    // whole-word pieces dominate: every id is a ▁word piece
    ids.foreach(id => assert(m.pieces(id)._1.startsWith("▁")))
  }
}
