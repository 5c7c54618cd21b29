package graft.expressions

import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** URL canonicalization kernels — the crawl-curation counterpart of the
  * text fingerprint family. A crawl names one page many ways (case
  * variants, default ports, tracking parameters, shuffled query order,
  * fragments); URL-keyed stages (keep-latest, dedup stores, blocklists)
  * only co-locate revisits if every variant collapses to ONE canonical
  * key first. Reference anchor: the document pipeline keys uploads by
  * source path (`aje_libs/documents/helpers/document_processor.py`);
  * a web corpus's "source path" is the URL, and at 100 TB the
  * canonicalization must be a per-row scan projection, never a lookup.
  *
  * Canonical form (deterministic, SQL-replayable transforms only):
  *  - scheme and host lowercased (userinfo, path, values untouched),
  *  - default ports stripped (`http:80`, `https:443`),
  *  - fragment dropped,
  *  - tracking parameters removed: any key starting `utm_`, plus
  *    `gclid`/`fbclid`/`msclkid` (the cross-site click-id family),
  *  - surviving query parameters sorted bytewise as whole `k=v` units
  *    (one page, one param order), empty query drops its `?`,
  *  - empty path becomes `/`.
  *
  * Refusals (NULL): no `://`, empty scheme/host, or a scheme with any
  * character outside `[A-Za-z0-9+.-]` — not-a-URL text must not
  * round-trip as if canonical.
  */
case class UrlNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_normalize"

  override protected def nullSafeEval(input: Any): Any =
    UrlNormalize.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.UrlNormalize.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UrlNormalize =
    copy(child = newChild)
}

object UrlNormalize {

  /** Keys removed from query strings (lowercased compare; `utm_` is a
    * prefix class). Held to the short, stable industry set — an
    * aggressive list silently merges distinct pages.
    */
  private val TrackingKeys = Set("gclid", "fbclid", "msclkid")

  private[expressions] final case class Parts(scheme: String, userinfo: String,
      host: String, port: Int, path: String, query: String)

  /** Split `scheme://[userinfo@]host[:port][/path][?query][#fragment]`;
    * null on refusal. Port −1 = absent; query null = absent.
    */
  private[expressions] def parse(u: String): Parts = {
    val sep = u.indexOf("://")
    if (sep <= 0) return null
    val scheme = u.substring(0, sep)
    var i = 0
    while (i < scheme.length) {
      val c = scheme.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return null
      i += 1
    }
    val rest = u.substring(sep + 3)
    var authEnd = rest.length
    var j = 0
    while (j < authEnd) {
      val c = rest.charAt(j)
      if (c == '/' || c == '?' || c == '#') { authEnd = j } else j += 1
    }
    val auth = rest.substring(0, authEnd)
    val at = auth.lastIndexOf('@')
    val userinfo = if (at >= 0) auth.substring(0, at) else null
    var hostPort = if (at >= 0) auth.substring(at + 1) else auth
    var port = -1
    if (hostPort.startsWith("[")) {
      // IPv6 literal: the port follows the closing bracket — the
      // single-colon heuristic below never fires on ':'-riddled v6
      // hosts, which left ':443' glued inside the host and split
      // canonical keys for bracketed URLs
      val close = hostPort.indexOf(']')
      if (close < 0) return null
      if (close + 1 < hostPort.length) {
        if (hostPort.charAt(close + 1) != ':') return null
        val p = hostPort.substring(close + 2)
        if (p.nonEmpty && p.forall(c => c >= '0' && c <= '9') && p.length <= 5) {
          port = p.toInt
          hostPort = hostPort.substring(0, close + 1)
        } else return null
      }
    } else {
      val colon = hostPort.lastIndexOf(':')
      if (colon >= 0 && colon == hostPort.indexOf(':')) {
        val p = hostPort.substring(colon + 1)
        if (p.nonEmpty && p.forall(c => c >= '0' && c <= '9') && p.length <= 5) {
          port = p.toInt
          hostPort = hostPort.substring(0, colon)
        }
      }
    }
    if (hostPort.isEmpty) return null
    val tail = rest.substring(authEnd)
    val hash = tail.indexOf('#')
    val noFrag = if (hash >= 0) tail.substring(0, hash) else tail
    val qm = noFrag.indexOf('?')
    val path = if (qm >= 0) noFrag.substring(0, qm) else noFrag
    val query = if (qm >= 0) noFrag.substring(qm + 1) else null
    Parts(scheme, userinfo, hostPort, port, path, query)
  }

  private def isTracking(param: String): Boolean = {
    val eq = param.indexOf('=')
    val key = (if (eq >= 0) param.substring(0, eq) else param)
      .toLowerCase(java.util.Locale.ROOT)
    key.startsWith("utm_") || TrackingKeys.contains(key)
  }

  /** Static kernel shared by interpreted eval and generated code. */
  def compute(in: UTF8String): UTF8String = {
    val p = parse(in.toString)
    if (p == null) return null
    val scheme = p.scheme.toLowerCase(java.util.Locale.ROOT)
    val host = p.host.toLowerCase(java.util.Locale.ROOT)
    val defaultPort = (scheme == "http" && p.port == 80) ||
      (scheme == "https" && p.port == 443)
    val sb = new StringBuilder(scheme).append("://")
    if (p.userinfo != null) sb.append(p.userinfo).append('@')
    sb.append(host)
    if (p.port >= 0 && !defaultPort) sb.append(':').append(p.port)
    sb.append(if (p.path.isEmpty) "/" else p.path)
    if (p.query != null) {
      val kept = p.query.split("&", -1).filter(_.nonEmpty).filterNot(isTracking)
      // UTF-8 BYTEWISE order, not String.compareTo (UTF-16 code units):
      // supplementary characters sort before [U+E000,U+FFFF] in UTF-16
      // but after in UTF-8 — a bytewise-collating SQL engine (DuckDB
      // binary) would canonicalize the same URL differently
      java.util.Arrays.sort(kept, Utf8ByteOrder)
      if (kept.nonEmpty) sb.append('?').append(kept.mkString("&"))
    }
    UTF8String.fromString(sb.toString)
  }

  private val Utf8ByteOrder: java.util.Comparator[String] =
    new java.util.Comparator[String] {
      def compare(a: String, b: String): Int = {
        val x = a.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        val y = b.getBytes(java.nio.charset.StandardCharsets.UTF_8)
        var i = 0
        val n = math.min(x.length, y.length)
        while (i < n) {
          val d = (x(i) & 0xff) - (y(i) & 0xff)
          if (d != 0) return d
          i += 1
        }
        x.length - y.length
      }
    }
}

/** Lowercased host of a URL (userinfo and port stripped), NULL on the
  * same refusals as [[UrlNormalize]] — the join key for per-site
  * statistics and crawl politeness groupings.
  */
case class UrlHost(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_host"

  override protected def nullSafeEval(input: Any): Any =
    UrlHost.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.UrlHost.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UrlHost =
    copy(child = newChild)
}

object UrlHost {
  def compute(in: UTF8String): UTF8String = {
    val p = UrlNormalize.parse(in.toString)
    if (p == null) return null
    UTF8String.fromString(p.host.toLowerCase(java.util.Locale.ROOT))
  }
}

/** Registrable-domain approximation (eTLD+1) of a URL's host — the
  * blocklist/ownership granularity (UT1 and comparable curation lists
  * name `example.com`, not every subdomain). Without shipping the full
  * Public Suffix List, the documented approximation is the classic
  * two-level heuristic: last two labels, or last THREE when the
  * second-to-last label is a generic second-level registrar label
  * (`co|com|org|net|gov|edu|ac|mil`) under a two-letter ccTLD —
  * `shop.example.co.uk` → `example.co.uk`, `a.b.example.com` →
  * `example.com`. IPv4 literals and single-label hosts return
  * themselves. NULL on the [[UrlNormalize]] refusals.
  */
case class UrlDomain(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_domain"

  override protected def nullSafeEval(input: Any): Any =
    UrlDomain.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.UrlDomain.compute($c);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): UrlDomain =
    copy(child = newChild)
}

/** RFC 3986 §5 reference resolution — `graft_url_resolve(base, ref)`:
  * absolute refs pass through; `//host/…` adopts the base scheme;
  * `/path` roots at the base authority; relative paths merge against
  * the base path with full dot-segment removal; `?query`/`#frag` refs
  * replace those components. NULL when the base refuses to parse and
  * the ref is not itself absolute. The canonical-link companion: a
  * `<link rel=canonical href=…>` is routinely relative, and keying a
  * crawl on it requires resolving against the capture URL first.
  */
case class UrlResolve(left: Expression, right: Expression)
    extends org.apache.spark.sql.catalyst.expressions.BinaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_resolve"

  override protected def nullSafeEval(base: Any, ref: Any): Any =
    UrlResolve.compute(base.asInstanceOf[UTF8String],
      ref.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (b, r) =>
      s"""
         |${ev.value} = graft.expressions.UrlResolve.compute($b, $r);
         |if (${ev.value} == null) { ${ev.isNull} = true; }
       """.stripMargin)

  override protected def withNewChildrenInternal(newLeft: Expression,
      newRight: Expression): UrlResolve = copy(left = newLeft, right = newRight)
}

object UrlResolve {

  /** RFC 3986 §5.2.4 remove_dot_segments. */
  private[expressions] def removeDotSegments(path: String): String = {
    val out = new StringBuilder
    var in = path
    while (in.nonEmpty) {
      if (in.startsWith("../")) in = in.substring(3)
      else if (in.startsWith("./")) in = in.substring(2)
      else if (in.startsWith("/./")) in = "/" + in.substring(3)
      else if (in == "/.") in = "/"
      else if (in.startsWith("/../") || in == "/..") {
        in = if (in == "/..") "/" else "/" + in.substring(4)
        val cut = out.lastIndexOf("/")
        out.setLength(math.max(cut, 0))
      } else if (in == "." || in == "..") in = ""
      else {
        val from = if (in.startsWith("/")) 1 else 0
        val next = in.indexOf('/', from)
        val seg = if (next < 0) in else in.substring(0, next)
        out.append(seg)
        in = if (next < 0) "" else in.substring(next)
      }
    }
    out.toString
  }

  /** RFC 3986: ANY `scheme:` ref is absolute — not just hierarchical
    * `scheme://` ones. Crawled hrefs are full of `mailto:`/`tel:`/
    * `javascript:` links; merging them into the base path fabricated
    * parseable-but-bogus page keys.
    */
  private def hasScheme(s: String): Boolean = {
    val colon = s.indexOf(':')
    if (colon <= 0) return false
    val c0 = s.charAt(0)
    if (!((c0 >= 'a' && c0 <= 'z') || (c0 >= 'A' && c0 <= 'Z'))) return false
    var i = 1
    while (i < colon) {
      val c = s.charAt(i)
      val ok = (c >= 'a' && c <= 'z') || (c >= 'A' && c <= 'Z') ||
        (c >= '0' && c <= '9') || c == '+' || c == '.' || c == '-'
      if (!ok) return false
      i += 1
    }
    true
  }

  /** remove_dot_segments applies to the PATH only (RFC 3986 §5.2.2);
    * split any query/fragment tail off first — `/../` inside a query
    * would otherwise pop real path segments and destroy the query.
    */
  private def cleanPathKeepTail(s: String): String = {
    val q = s.indexOf('?')
    val h = s.indexOf('#')
    val cut = if (q < 0) h else if (h < 0) q else math.min(q, h)
    if (cut < 0) removeDotSegments(s)
    else removeDotSegments(s.substring(0, cut)) + s.substring(cut)
  }

  def compute(baseU: UTF8String, refU: UTF8String): UTF8String = {
    val ref = refU.toString
    if (hasScheme(ref)) return refU
    val p = UrlNormalize.parse(baseU.toString)
    if (p == null) return null
    val authority = {
      val sb = new StringBuilder(p.scheme).append("://")
      if (p.userinfo != null) sb.append(p.userinfo).append('@')
      sb.append(p.host)
      if (p.port >= 0) sb.append(':').append(p.port)
      sb.toString
    }
    val basePath = if (p.path.isEmpty) "/" else p.path
    val resolved =
      if (ref.startsWith("//")) p.scheme + ":" + ref
      else if (ref.startsWith("/"))
        authority + cleanPathKeepTail(ref)
      else if (ref.isEmpty)
        authority + basePath + (if (p.query != null) "?" + p.query else "")
      else if (ref.startsWith("?"))
        authority + basePath + ref
      else if (ref.startsWith("#"))
        authority + basePath +
          (if (p.query != null) "?" + p.query else "") // fragment dropped
      else {
        val cut = basePath.lastIndexOf('/')
        val merged = basePath.substring(0, cut + 1) + ref
        authority + cleanPathKeepTail(merged)
      }
    // a relative ref may carry its own fragment; resolution keeps the
    // URL proper and UrlNormalize would drop the fragment anyway — keep
    // it here for faithfulness EXCEPT the bare-# case above
    UTF8String.fromString(resolved)
  }
}

/** Suffix-chain membership of a URL's host in a blocklist set (UT1
  * convention: an entry blocks itself and every subdomain). The set is
  * a bounded driver artifact carried in the expression — the
  * classifier-model pattern — so the screen is O(labels) hash probes
  * per row in one scan; NULL when the URL refuses to parse.
  */
case class UrlBlocked(child: Expression, blocked: Set[String])
    extends UnaryExpression {

  override def dataType: DataType =
    org.apache.spark.sql.types.BooleanType
  override def nullable: Boolean = true
  override def prettyName: String = "graft_url_blocked"

  @transient private lazy val set: java.util.HashSet[String] = {
    val s = new java.util.HashSet[String](math.max(16, blocked.size * 2))
    blocked.foreach(d => s.add(d))
    s
  }

  override protected def nullSafeEval(input: Any): Any = {
    val h = UrlHost.compute(input.asInstanceOf[UTF8String])
    if (h == null) null else java.lang.Boolean.valueOf(
      UrlBlocked.anySuffix(h.toString, set))
  }

  // the set lives on this instance; codegen references it and calls the
  // shared static walk (same pattern as the hashed-n-gram scorers)
  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val setRef = ctx.addReferenceObj("blockedSet", set,
      classOf[java.util.HashSet[String]].getName)
    // freshName: a fixed local would redeclare when the expression
    // appears twice in one generated method over non-nullable children
    val uh = ctx.freshName("uh")
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |org.apache.spark.unsafe.types.UTF8String $uh =
         |  graft.expressions.UrlHost.compute($c);
         |if ($uh == null) { ${ev.isNull} = true; }
         |else { ${ev.value} =
         |  graft.expressions.UrlBlocked.anySuffix($uh.toString(), $setRef); }
       """.stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): UrlBlocked =
    copy(child = newChild)
}

object UrlBlocked {

  /** `host` or any parent suffix (label-boundary aligned) in `set`. */
  def anySuffix(host: String, set: java.util.HashSet[String]): Boolean = {
    var from = 0
    while (from >= 0 && from < host.length) {
      if (set.contains(if (from == 0) host else host.substring(from)))
        return true
      val dot = host.indexOf('.', from)
      from = if (dot < 0) -1 else dot + 1
    }
    false
  }
}

object UrlDomain {

  private val SecondLevel = Set("co", "com", "org", "net", "gov", "edu",
    "ac", "mil")

  /** Registrable domain of an already-extracted lowercase host. */
  def ofHost(host: String): String = {
    val labels = host.split("\\.", -1)
    if (labels.length <= 2) return host
    if (labels.forall(l => l.nonEmpty && l.forall(c => c >= '0' && c <= '9')))
      return host // IPv4 literal
    val tld = labels(labels.length - 1)
    val second = labels(labels.length - 2)
    val n = if (tld.length == 2 && SecondLevel.contains(second)) 3 else 2
    labels.takeRight(math.min(n, labels.length)).mkString(".")
  }

  def compute(in: UTF8String): UTF8String = {
    val h = UrlHost.compute(in)
    if (h == null) return null
    UTF8String.fromString(ofHost(h.toString))
  }
}

/** All label-boundary suffixes of a URL's host (`a.b.c` → `[a.b.c`,
  * `b.c`, `c]`), lowercased — the join key for the SHUFFLED form of the
  * blocklist screen: exploding these and semi-joining against a domain
  * list reproduces [[UrlBlocked.anySuffix]] without collecting the list.
  * NULL when the URL refuses to parse (same contract as the host kernel).
  */
case class HostSuffixes(child: Expression) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    StringType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "graft_host_suffixes"

  override protected def nullSafeEval(input: Any): Any =
    HostSuffixes.compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"""
         |${ev.value} = graft.expressions.HostSuffixes.compute($c);
         |${ev.isNull} = ${ev.value} == null;
       """.stripMargin)

  override protected def withNewChildInternal(newChild: Expression): HostSuffixes =
    copy(child = newChild)
}

object HostSuffixes {

  def compute(in: UTF8String): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val h = UrlHost.compute(in)
    if (h == null) return null
    val host = h.toString
    val out = new scala.collection.mutable.ArrayBuffer[Any](4)
    var from = 0
    while (from >= 0 && from < host.length) {
      out += UTF8String.fromString(
        if (from == 0) host else host.substring(from))
      val dot = host.indexOf('.', from)
      from = if (dot < 0) -1 else dot + 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out.toArray)
  }
}
