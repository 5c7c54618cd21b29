package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

/** Exact-substring dedup (Lee et al. 2022 semantics): the CutSpans kernel
  * in isolation, then the operator — keep-first across documents, cut of
  * within-document repeats, short-doc passthrough, and a no-duplicate
  * corpus surviving unchanged.
  */
class ExactSubstringDedupSpec extends SparkTestBase {
  import spark.implicits._

  private def cut(text: String, starts: Seq[Long], len: Int): String =
    graft.expressions.CutSpans.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text),
      org.apache.spark.sql.catalyst.util.ArrayData.toArrayData(starts.toArray),
      len).toString

  test("CutSpans kernel: single, overlapping, adjacent, and clipped spans") {
    assert(cut("abcdefghij", Seq(), 3) === "abcdefghij")
    assert(cut("abcdefghij", Seq(0L), 3) === "defghij")
    assert(cut("abcdefghij", Seq(3L), 3) === "abcghij")
    // overlapping spans union: [2,5) + [4,7) = [2,7)
    assert(cut("abcdefghij", Seq(2L, 4L), 3) === "abhij")
    // adjacent spans: [0,3) + [3,6) = [0,6)
    assert(cut("abcdefghij", Seq(0L, 3L), 3) === "ghij")
    // span overhanging the end clips
    assert(cut("abcdefghij", Seq(8L), 5) === "abcdefgh")
    // everything cut
    assert(cut("abcd", Seq(0L, 1L), 4) === "")
  }

  test("keep-first across documents: the earliest occurrence survives, later ones cut") {
    val boiler = "SUBSCRIBE TO OUR NEWSLETTER FOR MORE GREAT CONTENT EVERY WEEK"
    val df = Seq(
      (1L, s"unique first article body. $boiler"),
      (2L, s"another completely different second article. $boiler"),
      (3L, s"$boiler and a trailing third body that is its own text")
    ).toDF("doc_id", "text")
    val got = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    // doc 1 carries the first occurrence (smallest (doc, pos)) — intact
    assert(got(1L).contains(boiler))
    // docs 2 and 3 lose the duplicated span but keep their own prose
    // (the cut extends into the shared ". " separator — any duplicated
    // ≥minLen run goes, maximal-match semantics)
    assert(!got(2L).contains(boiler.substring(0, 40)))
    assert(got(2L).startsWith("another completely different second article"))
    assert(!got(3L).contains(boiler.substring(0, 40)))
    assert(got(3L).contains("trailing third body"))
  }

  test("within-document repetition: the second copy in the same doc is cut") {
    val chunk = "this exact sentence repeats twice inside one single document body"
    val df = Seq(
      (1L, s"$chunk -- and then again: $chunk"),
      (2L, "some other document so the corpus is not a single row")
    ).toDF("doc_id", "text")
    val got = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40)
      .filter($"doc_id" === 1L).select("dedup_text").head().getString(0)
    // first copy survives, second is gone
    assert(got.startsWith(chunk))
    assert(got.indexOf(chunk.substring(0, 40), chunk.length) === -1)
  }

  test("no duplicated spans: corpus passes through byte-identical") {
    val df = Seq(
      (1L, "a completely unique first document with no repeated forty char runs"),
      (2L, "b thoroughly distinct second document, nothing shared with the first"),
      (3L, "short doc")
    ).toDF("doc_id", "text")
    val got = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40)
      .select("doc_id", "text", "dedup_text").collect()
    got.foreach(r => assert(r.getString(1) === r.getString(2)))
  }

  test("docs shorter than minLen are untouched and never fingerprinted") {
    val df = Seq((1L, "tiny"), (2L, "also tiny")).toDF("doc_id", "text")
    val got = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got === Map(1L -> "tiny", 2L -> "also tiny"))
  }

  test("fast mode (rolling hash) matches the portable (md5) mode exactly") {
    // planted duplication: shared boilerplate + within-doc repeats +
    // unique prose, across enough docs to exercise grouping and joins
    val boiler = "THIS LONG SHARED BOILERPLATE SENTENCE APPEARS IN MANY DOCUMENTS VERBATIM"
    val rows = (0L until 60L).map { i =>
      val own = s"document number $i with its own distinctive words repeated nowhere else at all"
      val text =
        if (i % 3 == 0) s"$own $boiler"
        else if (i % 3 == 1) s"$boiler $own"
        else s"$own and then $own"
      (i, text)
    }
    val df = rows.toDF("doc_id", "text")
    val portable = DedupOps.exactSubstringDedup(df, "text", "doc_id",
        minLen = 40, portable = true)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val fast = DedupOps.exactSubstringDedup(df, "text", "doc_id",
        minLen = 40, portable = false)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(fast === portable)
    // and the planted duplication was actually cut somewhere
    assert(rows.exists { case (i, t) => portable(i) != t })
  }

  test("PositionHashes kernel: rolling equals direct per-position hashing") {
    val text = "the quick brown fox jumps over the lazy dog"
    val L = 7
    def direct(s: String): Long = {
      var h = 0L
      s.foreach(c => h = h * 1000003L + c)
      h
    }
    val got = graft.expressions.PositionHashes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString(text), L)
    assert(got.numElements() === text.length - L + 1)
    (0 until got.numElements()).foreach { i =>
      assert(got.getLong(i) === direct(text.substring(i, i + L)), s"pos $i")
    }
    // shorter than L → empty
    assert(graft.expressions.PositionHashes.compute(
      org.apache.spark.unsafe.types.UTF8String.fromString("short"), 40)
      .numElements() === 0)
  }

  test("CutSpans positions are code points: astral chars do not shift cuts") {
    // "a😀bcd" = code points a(0) 😀(1) b(2) c(3) d(4); cutting [1,3)
    // must remove 😀 and b — a UTF-16 walk would remove half the emoji
    assert(cut("a😀bcd", Seq(1L), 2) === "acd")
    assert(cut("😀😁xy", Seq(0L), 2) === "xy")
    // and fast mode still equals portable mode when astral chars precede
    // a duplicated run (both index by code points end to end)
    val boiler = "DUPLICATED RUN OF TEXT LONG ENOUGH TO CROSS THE THRESHOLD"
    val df = Seq(
      (1L, s"😀 emoji prefix one $boiler"),
      (2L, s"😁😂 different emoji prefix two $boiler"),
      (3L, "plain third document keeps the corpus honest")
    ).toDF("doc_id", "text")
    val p = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    val f = DedupOps.exactSubstringDedup(df, "text", "doc_id", minLen = 40,
        portable = false)
      .select("doc_id", "dedup_text").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(p === f)
    assert(p(1L).contains(boiler), "first occurrence survives")
    assert(!p(2L).contains(boiler.substring(0, 40)), "second occurrence cut")
    assert(p(2L).startsWith("😁😂"),
      "prefix before the cut is untouched, surrogates intact")
  }

  test("CutSpans fuzz: kernel matches a naive per-char reference on random inputs") {
    val rng = new scala.util.Random(20260813L)
    def naive(text: String, starts: Seq[Long], len: Int): String =
      text.zipWithIndex.collect {
        case (c, i) if !starts.exists(s => s <= i && i < s + len) => c
      }.mkString
    (1 to 300).foreach { _ =>
      val n = rng.nextInt(120)
      val text = (0 until n).map(_ => ('a' + rng.nextInt(4)).toChar).mkString
      val len = 1 + rng.nextInt(10)
      val starts = (0 until rng.nextInt(8))
        .map(_ => rng.nextInt(math.max(1, n + 5)).toLong)
        .distinct.sorted
      assert(cut(text, starts, len) === naive(text, starts, len),
        s"text=$text starts=$starts len=$len")
    }
  }

  test("PositionHashes fuzz: every gram hash matches direct hashing") {
    val rng = new scala.util.Random(42L)
    def direct(s: String): Long = {
      var h = 0L
      s.foreach(c => h = h * 1000003L + c)
      h
    }
    (1 to 200).foreach { _ =>
      val n = rng.nextInt(200)
      val text = (0 until n).map(_ => (' ' + rng.nextInt(95)).toChar).mkString
      val len = 1 + rng.nextInt(50)
      val got = graft.expressions.PositionHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), len)
      val expected = math.max(0, n - len + 1)
      assert(got.numElements() === expected)
      (0 until got.numElements()).foreach { i =>
        assert(got.getLong(i) === direct(text.substring(i, i + len)))
      }
    }
  }

  test("Md5PositionHashes kernel: bit-identical to unhex(md5(substr))) per position") {
    // the portable gram mode's contract: element i = md5 of the UTF-8
    // bytes of code points [i, i+L) — exactly what the oracle's
    // md5(substr(text, i+1, L)) hashes. Mixed ASCII / multibyte /
    // astral text exercises the code-point byte-offset walk
    val texts = Seq(
      "the quick brown fox jumps over the lazy dog",
      "café païsajes España übergrößen ñandú çedille",
      "a😀b😁c plain tail with enough length to gram over",
      "短い日本語のテキストと ascii の混在 with latin tail here",
      "")
    for (text <- texts; len <- Seq(1, 3, 7)) {
      val got = graft.expressions.Md5PositionHashes.compute(
        org.apache.spark.unsafe.types.UTF8String.fromString(text), len)
      val cps = text.codePoints().toArray
      val n = cps.length
      val expected = math.max(0, n - len + 1)
      assert(got.numElements() === expected, s"text=$text len=$len")
      val md = java.security.MessageDigest.getInstance("MD5")
      (0 until got.numElements()).foreach { i =>
        val gram = new String(cps, i, len)
        md.reset()
        val want = md.digest(gram.getBytes("UTF-8"))
        assert(java.util.Arrays.equals(got.getBinary(i), want),
          s"text=$text len=$len pos=$i")
      }
    }
    // and through SQL: the kernel column equals the md5() builtin digest
    val df = texts.filter(_.nonEmpty).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val kernel = DedupOps.substringGrams(df, "text", "doc_id", 5,
        portable = true)
      .select(col("__k"), col("__pos"), hex(col("__h")).alias("hx"))
    val builtin = df.filter(length(col("text")) >= 5)
      .select(col("doc_id").alias("__k"),
        explode(sequence(lit(0L), (length(col("text")) - 5).cast("long")))
          .alias("__pos"), col("text"))
      .select(col("__k"), col("__pos"),
        upper(md5(col("text").substr(col("__pos").cast("int") + 1, lit(5))))
          .alias("hx"))
    assert(kernel.collect().toSet === builtin.collect().toSet)
  }

  test("graft_cut_spans SQL registration") {
    graft.GraftFunctions.register(spark)
    val got = spark.sql(
      "SELECT graft_cut_spans('abcdefghij', array(2L, 4L), 3) AS c")
      .head().getString(0)
    assert(got === "abhij")
    // bare int-array literals convert (not reinterpret) to the long
    // positions the kernel reads
    val ints = spark.sql(
      "SELECT graft_cut_spans('abcdefghij', array(2, 4), 3) AS c")
      .head().getString(0)
    assert(ints === "abhij")
    // unsorted starts: the registration sorts before the kernel's
    // single-pass union, so SQL callers can't silently get wrong output
    val unsorted = spark.sql(
      "SELECT graft_cut_spans('abcdefghij', array(4, 2), 3) AS c")
      .head().getString(0)
    assert(unsorted === "abhij")
  }
}
