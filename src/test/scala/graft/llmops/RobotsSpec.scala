package graft.llmops

import graft.SparkTestBase
import graft.expressions.RobotsAllowed
import org.apache.spark.sql.functions._
import org.apache.spark.unsafe.types.UTF8String

class RobotsSpec extends SparkTestBase {
  import spark.implicits._

  private def allowed(robots: String, url: String,
      agent: String = "*"): Option[Boolean] = {
    val r = RobotsAllowed.compute(UTF8String.fromString(robots),
      UTF8String.fromString(url), agent)
    if (r == null) None else Some(r.booleanValue())
  }

  private val basic =
    """# site robots
      |User-agent: *
      |Disallow: /private/
      |Allow: /private/public.html
      |Disallow: /tmp
      |""".stripMargin

  test("longest-match decides; allow wins ties; no match allows") {
    assert(allowed(basic, "https://e.com/open/page") === Some(true))
    assert(allowed(basic, "https://e.com/private/x") === Some(false))
    assert(allowed(basic, "https://e.com/private/public.html") === Some(true))
    assert(allowed(basic, "https://e.com/tmpfile") === Some(false)) // prefix
    assert(allowed(basic, "https://e.com/") === Some(true))
  }

  test("wildcards and the $ end anchor") {
    val r =
      """User-agent: *
        |Disallow: /*.pdf$
        |Disallow: /cgi/*/raw
        |Allow: /cgi/ok/raw
        |""".stripMargin
    assert(allowed(r, "https://e.com/doc.pdf") === Some(false))
    assert(allowed(r, "https://e.com/doc.pdfx") === Some(true)) // anchored
    assert(allowed(r, "https://e.com/a/b/deep.pdf") === Some(false))
    assert(allowed(r, "https://e.com/cgi/bad/raw") === Some(false))
    assert(allowed(r, "https://e.com/cgi/ok/raw") === Some(true))
  }

  test("agent group election: longest prefix wins, * is the fallback") {
    val r =
      """User-agent: graftbot
        |Disallow: /only-graft/
        |
        |User-agent: graft
        |Disallow: /graft-family/
        |
        |User-agent: *
        |Disallow: /everyone/
        |""".stripMargin
    // graftbot/1.0 elects the 'graftbot' group ONLY (most specific)
    assert(allowed(r, "https://e.com/only-graft/x", "graftbot/1.0") === Some(false))
    assert(allowed(r, "https://e.com/graft-family/x", "graftbot/1.0") === Some(true))
    assert(allowed(r, "https://e.com/everyone/x", "graftbot/1.0") === Some(true))
    // 'graftling' matches only the shorter 'graft' token
    assert(allowed(r, "https://e.com/graft-family/x", "graftling") === Some(false))
    // unrelated agents fall back to *
    assert(allowed(r, "https://e.com/everyone/x", "otherbot") === Some(false))
    assert(allowed(r, "https://e.com/only-graft/x", "otherbot") === Some(true))
  }

  test("consecutive user-agent lines share one group; comments strip") {
    val r =
      """User-agent: a
        |User-agent: b
        |Disallow: /both/ # trailing comment
        |""".stripMargin
    assert(allowed(r, "https://e.com/both/x", "a/2") === Some(false))
    assert(allowed(r, "https://e.com/both/x", "b") === Some(false))
    assert(allowed(r, "https://e.com/both/x", "c") === Some(true))
  }

  test("empty robots allows everything; empty Disallow never blocks; bad URL NULL") {
    assert(allowed("", "https://e.com/x") === Some(true))
    assert(allowed("User-agent: *\nDisallow:", "https://e.com/x") === Some(true))
    assert(allowed(basic, "not a url") === None)
  }

  test("robotsScreen: broadcast per-host table, absent hosts default open") {
    val pages = Seq(
      (1L, "https://a.com/private/x"),
      (2L, "https://a.com/open"),
      (3L, "https://b.com/anything"),
      (4L, "https://unknown.org/y"),
      (5L, "not a url")).toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", basic),
      ("b.com", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt")
    val out = UrlCuration.robotsScreen(pages, "url", robots)
      .orderBy("doc_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("robots_allowed"))) ===
      Array(Some(false), Some(true), Some(false), Some(true), None))
    // plan: the robots join must be a broadcast, not a shuffle join
    val plan = UrlCuration.robotsScreen(pages, "url", robots)
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") ||
      plan.contains("BroadcastNestedLoopJoin"), plan)
  }

  test("robotsScreen size gate: over-threshold tables take the shuffled join") {
    val pages = Seq(
      (1L, "https://a.com/private/x"),
      (2L, "https://a.com/open"),
      (3L, "https://b.com/anything"),
      (4L, "https://unknown.org/y"),
      (5L, "not a url")).toDF("doc_id", "url")
    val robots = Seq(
      ("a.com", basic),
      ("b.com", "User-agent: *\nDisallow: /")).toDF("host", "robots_txt")
    val expect = Array(Some(false), Some(true), Some(false), Some(true), None)
    // force the fallback with a 1-host threshold; verdicts must be
    // identical to the broadcast path
    val out = UrlCuration.robotsScreen(pages, "url", robots,
      maxBroadcastHosts = 1).orderBy("doc_id").collect()
    assert(out.map(r => Option(r.getAs[Any]("robots_allowed"))) === expect)
    // plan shape: with the broadcast hint withheld and auto-broadcast
    // off, the screen is a shuffled equi-join — the 10^8-host path
    withSQLConf("spark.sql.autoBroadcastJoinThreshold" -> "-1",
      "spark.sql.adaptive.autoBroadcastJoinThreshold" -> "-1") {
      val plan = UrlCuration.robotsScreen(pages, "url", robots,
        maxBroadcastHosts = 1).queryExecution.executedPlan.toString
      assert(!plan.contains("BroadcastHashJoin") &&
        !plan.contains("BroadcastNestedLoopJoin"), plan)
      assert(plan.contains("SortMergeJoin") ||
        plan.contains("ShuffledHashJoin"), plan)
    }
  }
}
