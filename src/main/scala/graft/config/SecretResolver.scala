package graft.config

/** Credential-resolution SPI — the engine-side equivalent of the
  * reference's Secrets Manager lookup (aje_libs/common/helpers/
  * secrets_helper.py:25-34 resolves `SRC_DB_SECRET` into a credentials
  * document): connection passwords flow through a one-method trait
  * instead of plain parameters, so a cloud-vault backend is a drop-in
  * implementation outside this repo while the in-sandbox backends cover
  * the two local secret sources that actually exist — process
  * environment and mounted secret files (the Docker/Kubernetes secrets
  * layout) — plus a static map for tests.
  *
  * Secret VALUES may be either the bare password or the reference's
  * JSON credentials document (`{"username": …, "password": …}` — the
  * shape Secrets Manager hands back); [[SecretResolver.passwordOf]]
  * extracts the password field from the latter, with full JSON string
  * unescaping, so either storage convention works unchanged.
  */
trait SecretResolver {
  /** The secret value for `ref`, or None when this backend has no entry. */
  def resolve(ref: String): Option[String]
}

object SecretResolver {

  /** Environment-backed: `ref` → env var `<prefix><REF>` (ref upcased,
    * non-alphanumerics folded to `_` — env names can't carry dots or
    * dashes that secret refs commonly do).
    */
  final class EnvResolver(prefix: String = "GRAFT_SECRET_",
      env: Map[String, String] = sys.env) extends SecretResolver {
    def resolve(ref: String): Option[String] =
      env.get(prefix + ref.toUpperCase.map(c =>
        if (c.isLetterOrDigit) c else '_'))
  }

  /** File-backed: one file per ref under `dir` (the mounted-secrets
    * layout). Path traversal in a ref is refused, a single trailing
    * newline is stripped (editors and `echo >` add one; real secrets
    * ending in a newline must be base64-wrapped by the producer, the
    * same rule Kubernetes documents).
    */
  final class FileResolver(dir: String) extends SecretResolver {
    def resolve(ref: String): Option[String] = {
      if (ref.contains("/") || ref.contains("\\") || ref.contains("..") ||
          ref.isEmpty) return None
      val p = java.nio.file.Paths.get(dir, ref)
      if (!java.nio.file.Files.isRegularFile(p)) None
      else {
        val raw = new String(java.nio.file.Files.readAllBytes(p), "UTF-8")
        Some(if (raw.endsWith("\n")) raw.dropRight(1) else raw)
      }
    }
  }

  /** Fixed map — tests and embedded use. */
  final class StaticResolver(m: Map[String, String]) extends SecretResolver {
    def resolve(ref: String): Option[String] = m.get(ref)
  }

  /** First backend that answers wins. */
  final class ChainResolver(rs: Seq[SecretResolver]) extends SecretResolver {
    def resolve(ref: String): Option[String] =
      rs.iterator.map(_.resolve(ref)).collectFirst { case Some(v) => v }
  }

  /** The default chain for pipeline entrypoints: environment first, then
    * a mounted secrets directory when `GRAFT_SECRETS_DIR` is set.
    */
  def default(env: Map[String, String] = sys.env): SecretResolver =
    new ChainResolver(
      new EnvResolver(env = env) +:
        env.get("GRAFT_SECRETS_DIR").map(new FileResolver(_)).toSeq)

  /** The password inside a resolved secret value: the `password` field
    * when the value is a JSON object carrying one (the Secrets Manager
    * credentials-document shape), otherwise the value itself. Minimal
    * scanning parser — top-level object, string values, full `\"`/`\\`/
    * `\/`/`\b`/`\f`/`\n`/`\r`/`\t`/`\uXXXX` unescaping — refusing (by
    * falling back to the raw value) anything that is not clearly a JSON
    * object, so a bare password that happens to start with spaces or
    * braces-in-text never gets mangled.
    */
  def passwordOf(secretValue: String): String = {
    val t = secretValue.trim
    if (!(t.startsWith("{") && t.endsWith("}"))) return secretValue
    jsonStringField(t, "password").getOrElse(secretValue)
  }

  /** `username` from a JSON credentials document, if present. */
  def usernameOf(secretValue: String): Option[String] = {
    val t = secretValue.trim
    if (!(t.startsWith("{") && t.endsWith("}"))) None
    else jsonStringField(t, "username")
  }

  private def jsonStringField(json: String, field: String): Option[String] = {
    // scan top-level "key": "value" pairs (nested objects are skipped
    // structurally; non-string values are skipped by delimiter scan)
    var i = 1
    val n = json.length - 1
    def skipWs(): Unit = while (i < n && json.charAt(i).isWhitespace) i += 1
    def readString(): Option[String] = {
      if (i >= n || json.charAt(i) != '"') return None
      i += 1
      val sb = new StringBuilder
      while (i < n && json.charAt(i) != '"') {
        val c = json.charAt(i)
        if (c == '\\' && i + 1 < n) {
          json.charAt(i + 1) match {
            case '"' => sb.append('"'); i += 2
            case '\\' => sb.append('\\'); i += 2
            case '/' => sb.append('/'); i += 2
            case 'b' => sb.append('\b'); i += 2
            case 'f' => sb.append('\f'); i += 2
            case 'n' => sb.append('\n'); i += 2
            case 'r' => sb.append('\r'); i += 2
            case 't' => sb.append('\t'); i += 2
            case 'u' if i + 6 <= n =>
              try {
                sb.append(Integer.parseInt(json.substring(i + 2, i + 6), 16)
                  .toChar)
                i += 6
              } catch { case _: NumberFormatException => return None }
            case _ => return None
          }
        } else { sb.append(c); i += 1 }
      }
      if (i >= n) None else { i += 1; Some(sb.toString) }
    }
    def skipValue(): Boolean = {
      skipWs()
      if (i >= n) return false
      json.charAt(i) match {
        case '"' => readString().isDefined
        case '{' | '[' =>
          val open = json.charAt(i)
          val close = if (open == '{') '}' else ']'
          var depth = 0
          var inStr = false
          while (i < n) {
            val c = json.charAt(i)
            if (inStr) {
              if (c == '\\') i += 1
              else if (c == '"') inStr = false
            } else if (c == '"') inStr = true
            else if (c == open) depth += 1
            else if (c == close) {
              depth -= 1
              if (depth == 0) { i += 1; return true }
            }
            i += 1
          }
          false
        case _ =>
          while (i < n && json.charAt(i) != ',' && json.charAt(i) != '}') i += 1
          true
      }
    }
    var found: Option[String] = None
    var ok = true
    while (ok && found.isEmpty) {
      skipWs()
      if (i >= n) ok = false
      else {
        readString() match {
          case None => ok = false
          case Some(key) =>
            skipWs()
            if (i >= n || json.charAt(i) != ':') ok = false
            else {
              i += 1
              if (key == field) {
                skipWs()
                found = readString()
                if (found.isEmpty) ok = false
              } else if (!skipValue()) ok = false
              skipWs()
              if (i < n && json.charAt(i) == ',') i += 1
            }
        }
      }
    }
    found
  }

  /** The endpoint's JDBC password through a resolver — the lookup order
    * the reference's per-endpoint secret naming implies: the endpoint's
    * own ref first (`DB_PASSWORD_<ENDPOINT>`), then the shared
    * `DB_PASSWORD`, each through [[passwordOf]]. Empty when no backend
    * answers (JDBC sources that genuinely have no password — embedded
    * Derby in the specs — keep working).
    */
  def endpointPassword(resolver: SecretResolver, endpointName: String): String =
    resolver.resolve(s"DB_PASSWORD_${endpointName.toUpperCase}")
      .orElse(resolver.resolve("DB_PASSWORD"))
      .map(passwordOf)
      .getOrElse("")
}
