package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.unsafe.types.UTF8String

/** robots.txt evaluation (RFC 9309) —
  * `graft_robots_allowed(robots_txt, url[, agent])`: whether `agent`
  * may fetch `url` under the host's robots.txt. The corpus-politeness
  * twin of the `<meta robots>` screen: a crawl-derived training set
  * honors both before a page becomes data.
  *
  * Semantics, per the RFC:
  *  - groups start at one-or-more `User-agent` lines; a group applies
  *    to `agent` when its product token is a case-insensitive prefix
  *    of the agent name, `*` matching every agent; the MOST SPECIFIC
  *    matching group wins (longest token; `*` only when nothing else
  *    matches) and all its groups' rules merge,
  *  - `Allow`/`Disallow` patterns match path+query from the URL;
  *    `*` wildcards and the `$` end anchor are honored,
  *  - the LONGEST matching pattern decides; on equal length Allow
  *    wins; no matching rule → allowed; empty Disallow never blocks,
  *  - comments (`#`) strip to end-of-line; unknown fields are ignored.
  *
  * NULL when the URL refuses to parse; an empty robots document allows
  * everything — the DataFrame surface passes `coalesce(robots, '')` so
  * a host with no fetched robots.txt defaults open. Agent-group
  * election follows the de facto (Google-documented) longest-prefix
  * rule over the agent's product token. The robots text rides
  * a broadcast join keyed on host — small by nature — and evaluation
  * is one scan projection.
  */
case class RobotsAllowed(left: Expression, right: Expression,
    agent: String) extends BinaryExpression {

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_robots_allowed"

  override protected def nullSafeEval(robots: Any, url: Any): Any =
    RobotsAllowed.compute(robots.asInstanceOf[UTF8String],
      url.asInstanceOf[UTF8String], agent)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val agentRef = ctx.addReferenceObj("robotsAgent", agent,
      classOf[String].getName)
    nullSafeCodeGen(ctx, ev, (r, u) => {
      // freshName, never a literal: two of these in one whole-stage span
      // would redefine the local and kick the WHOLE stage to interpreted
      // (janino "Redefinition of local variable")
      val v = ctx.freshName("ra")
      s"""
         |java.lang.Boolean $v = graft.expressions.RobotsAllowed.compute(
         |  $r, $u, $agentRef);
         |if ($v == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = $v.booleanValue(); }
       """.stripMargin
    })
  }

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): RobotsAllowed =
    copy(left = newLeft, right = newRight)
}

object RobotsAllowed {

  /** Parse and select the rule set for `agent` per the RFC's
    * most-specific-group election.
    */
  private[expressions] def rulesFor(robots: String,
      agent: String): Array[(Boolean, String)] = {
    val agentLc = agent.toLowerCase(java.util.Locale.ROOT)
    // (uaTokens, rules) per group
    val groups = scala.collection.mutable.ArrayBuffer
      .empty[(scala.collection.mutable.ArrayBuffer[String],
        scala.collection.mutable.ArrayBuffer[(Boolean, String)])]
    var curUa: scala.collection.mutable.ArrayBuffer[String] = null
    var curRules: scala.collection.mutable.ArrayBuffer[(Boolean, String)] = null
    var uaRun = false // consecutive user-agent lines extend one group
    robots.split("\r?\n", -1).foreach { raw =>
      val hash = raw.indexOf('#')
      val line = (if (hash >= 0) raw.substring(0, hash) else raw).trim
      val colon = line.indexOf(':')
      if (colon > 0) {
        val field = line.substring(0, colon).trim
          .toLowerCase(java.util.Locale.ROOT)
        val value = line.substring(colon + 1).trim
        field match {
          case "user-agent" =>
            if (!uaRun) {
              curUa = scala.collection.mutable.ArrayBuffer.empty[String]
              curRules = scala.collection.mutable
                .ArrayBuffer.empty[(Boolean, String)]
              groups += ((curUa, curRules))
              uaRun = true
            }
            curUa += value.toLowerCase(java.util.Locale.ROOT)
          case "allow" | "disallow" =>
            uaRun = false
            if (curRules != null) curRules += ((field == "allow", value))
          case _ =>
            uaRun = false
        }
      }
    }
    // election: longest UA token that prefixes the agent; '*' as fallback
    var bestLen = -1
    groups.foreach { case (uas, _) =>
      uas.foreach { ua =>
        if (ua != "*" && agentLc.startsWith(ua) && ua.length > bestLen)
          bestLen = ua.length
      }
    }
    val out = scala.collection.mutable.ArrayBuffer.empty[(Boolean, String)]
    if (bestLen >= 0) {
      groups.foreach { case (uas, rules) =>
        if (uas.exists(ua => ua != "*" && ua.length == bestLen &&
            agentLc.startsWith(ua))) out ++= rules
      }
    } else {
      groups.foreach { case (uas, rules) =>
        if (uas.contains("*")) out ++= rules
      }
    }
    out.toArray
  }

  /** Pattern match with `*` wildcards and an optional `$` end anchor;
    * returns the SPECIFICITY (pattern length) when it matches the
    * path, or −1.
    */
  private[expressions] def matchLen(pattern: String, path: String): Int = {
    if (pattern.isEmpty) return -1 // empty Disallow: no restriction
    val anchored = pattern.endsWith("$")
    val pat = if (anchored) pattern.substring(0, pattern.length - 1) else pattern
    // greedy wildcard walk: segments between '*' must appear in order;
    // first segment anchors at 0; with '$' the last segment must END the path
    val segs = pat.split("\\*", -1)
    var pos = 0
    var i = 0
    while (i < segs.length) {
      val seg = segs(i)
      if (i == 0) {
        if (!path.startsWith(seg)) return -1
        pos = seg.length
      } else if (i == segs.length - 1 && anchored) {
        if (path.length - pos < seg.length || !path.endsWith(seg)) return -1
        pos = path.length
      } else if (seg.nonEmpty) {
        val at = path.indexOf(seg, pos)
        if (at < 0) return -1
        pos = at + seg.length
      }
      i += 1
    }
    if (anchored && pos != path.length) -1 else pattern.length
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(robots: UTF8String, url: UTF8String,
      agent: String): java.lang.Boolean = {
    val p = UrlNormalize.parse(url.toString)
    if (p == null) return null
    if (robots == null) return java.lang.Boolean.TRUE
    val txt = robots.toString
    if (txt.trim.isEmpty) return java.lang.Boolean.TRUE
    val path = (if (p.path.isEmpty) "/" else p.path) +
      (if (p.query != null) "?" + p.query else "")
    val rules = rulesFor(txt, agent)
    var bestLen = -1
    var bestAllow = true
    rules.foreach { case (isAllow, pattern) =>
      val m = matchLen(pattern, path)
      if (m > bestLen || (m == bestLen && m >= 0 && isAllow && !bestAllow)) {
        if (m >= 0) { bestLen = m; bestAllow = isAllow }
      }
    }
    java.lang.Boolean.valueOf(if (bestLen < 0) true else bestAllow)
  }
}
