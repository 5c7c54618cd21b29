package graft.llmops

import graft.SparkTestBase
import org.apache.spark.sql.functions._

class RepoContextSpec extends SparkTestBase {

  private def files = Seq(
    ("r1", "src/b.py", "bbb"),
    ("r1", "README.md", "hello"),
    ("r1", "src/a.py", "aaa"),
    ("r2", "only.txt", "x"))

  test("pack orders README first then path, renders headers") {
    val ss = spark
    import ss.implicits._
    val out = RepoContext.pack(files.toDF("repo", "path", "content"),
      "repo", "path", "content").orderBy("repo").collect()
    assert(out.length == 2)
    val r1 = out(0)
    assert(r1.getString(0) == "r1")
    assert(r1.getString(1) ==
      "<file> README.md\nhello\n<file> src/a.py\naaa\n<file> src/b.py\nbbb\n")
    assert(r1.getLong(2) == 3L)
    assert(r1.getLong(3) == r1.getString(1).length.toLong)
    assert(out(1).getString(1) == "<file> only.txt\nx\n")
  }

  test("char budget cuts at the first overflowing file (prefix rule)") {
    val ss = spark
    import ss.implicits._
    // rendered lengths: README=23, a.py=20, b.py=20 → budget 45 keeps 2
    val out = RepoContext.pack(files.toDF("repo", "path", "content"),
      "repo", "path", "content", maxChars = 45)
      .filter(col("repo") === "r1").collect()(0)
    assert(out.getLong(2) == 2L)
    assert(out.getString(1) == "<file> README.md\nhello\n<file> src/a.py\naaa\n")
    // even though b.py alone would fit a later gap, prefix semantics
    // stop the fold once the cumulative budget is exceeded
    val tight = RepoContext.pack(files.toDF("repo", "path", "content"),
      "repo", "path", "content", maxChars = 24)
      .filter(col("repo") === "r1").collect()(0)
    assert(tight.getLong(2) == 1L)
  }

  test("nested README and null content handled") {
    val ss = spark
    import ss.implicits._
    val out = RepoContext.pack(Seq(
      ("r", "a/b/readme.rst", null: String),
      ("r", "a/a.py", "x")).toDF("repo", "path", "content"),
      "repo", "path", "content").collect()(0)
    assert(out.getString(1) ==
      "<file> a/b/readme.rst\n\n<file> a/a.py\nx\n")
  }
}
