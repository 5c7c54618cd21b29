package graft.llmops

import graft.SparkTestBase

class GitDiffsSpec extends SparkTestBase {

  import GitDiffs.{Commit, FileDiff}

  private val log = GitDiffs.formatLog(Seq(
    Commit("abc1234", "Dev One <dev@example.test>",
      "Fix the thing\n\nLonger body.",
      Seq(
        FileDiff("src/a.py", "src/a.py", Seq("new line", "another"),
          Seq("old line")),
        FileDiff("README.md", "README.md", Seq("docs"), Nil))),
    Commit("def5678", "Dev Two <dev2@example.test>", "Second commit",
      Seq(FileDiff("x.c", "y.c", Nil, Seq("gone"))))))

  test("parseLog: commits, authors, messages, per-file +/- bodies") {
    val cs = GitDiffs.parseLog(log)
    assert(cs.map(_.sha) == Seq("abc1234", "def5678"))
    assert(cs(0).author == "Dev One <dev@example.test>")
    assert(cs(0).message == "Fix the thing\n\nLonger body.")
    assert(cs(0).files.map(_.newPath) == Seq("src/a.py", "README.md"))
    assert(cs(0).files(0).added == Seq("new line", "another"))
    assert(cs(0).files(0).removed == Seq("old line"))
    assert(cs(1).files(0).oldPath == "x.c" && cs(1).files(0).newPath == "y.c")
    assert(cs(1).files(0).removed == Seq("gone"))
  }

  test("--- and +++ marker lines are not diff bodies") {
    val cs = GitDiffs.parseLog(log)
    assert(!cs.exists(_.files.exists(f =>
      f.added.exists(_.startsWith("++")) ||
      f.removed.exists(_.startsWith("--")))))
  }

  test("junk between sections is skipped; malformed input is safe") {
    val noisy = "random preamble\n" + log + "trailing junk\nno commit"
    assert(GitDiffs.parseLog(noisy).map(_.sha) ==
      Seq("abc1234", "def5678"))
    assert(GitDiffs.parseLog(null) == Nil)
    assert(GitDiffs.parseLog("") == Nil)
    assert(GitDiffs.parseLog("diff --git a/x b/x\n+orphan") == Nil)
  }

  test("commits() and fileDiffs() explode with counts and bodies") {
    val ss = spark
    import ss.implicits._
    val df = Seq((9L, log)).toDF("id", "log")
    val cs = GitDiffs.commits(df, "id", "log").orderBy("sha").collect()
    assert(cs.length == 2)
    assert(cs(0).getString(1) == "abc1234" && cs(0).getLong(4) == 2L &&
      cs(0).getLong(5) == 3L && cs(0).getLong(6) == 1L)
    val fs = GitDiffs.fileDiffs(df, "id", "log")
      .orderBy("sha", "new_path").collect()
    assert(fs.length == 3)
    assert(fs(1).getString(4) == "src/a.py")
    assert(fs(1).getString(5) == "new line\nanother")
    assert(fs(1).getString(6) == "old line")
    assert(fs(2).getString(2) == "Second commit")
  }
}
