package graft.config

import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** SecretResolver SPI: backend lookup semantics, the JSON credentials
  * document extraction, and the endpoint password chain.
  */
class SecretResolverSpec extends AnyFunSuite {

  import SecretResolver._

  test("EnvResolver folds refs to env-safe names under its prefix") {
    val r = new EnvResolver(env = Map(
      "GRAFT_SECRET_DB_PASSWORD_MAIN" -> "s3cr3t",
      "GRAFT_SECRET_SOME_API_KEY" -> "k"))
    assert(r.resolve("db_password_main") === Some("s3cr3t"))
    assert(r.resolve("some.api-key") === Some("k")) // dots/dashes fold to _
    assert(r.resolve("missing") === None)
  }

  test("FileResolver reads mounted files, strips one trailing newline, refuses traversal") {
    val dir = Files.createTempDirectory("graft-secrets")
    Files.write(dir.resolve("db_password"), "hunter2\n".getBytes("UTF-8"))
    Files.write(dir.resolve("raw"), "exact".getBytes("UTF-8"))
    val r = new FileResolver(dir.toString)
    assert(r.resolve("db_password") === Some("hunter2"))
    assert(r.resolve("raw") === Some("exact"))
    assert(r.resolve("missing") === None)
    assert(r.resolve("../etc/passwd") === None)
    assert(r.resolve("a/b") === None)
    assert(r.resolve("") === None)
  }

  test("ChainResolver: first backend that answers wins") {
    val r = new ChainResolver(Seq(
      new StaticResolver(Map("a" -> "first")),
      new StaticResolver(Map("a" -> "second", "b" -> "only"))))
    assert(r.resolve("a") === Some("first"))
    assert(r.resolve("b") === Some("only"))
    assert(r.resolve("c") === None)
  }

  test("passwordOf: bare values pass through, JSON documents extract") {
    assert(passwordOf("plain") === "plain")
    assert(passwordOf("""{"username":"u","password":"p"}""") === "p")
    assert(passwordOf("""{ "password" : "sp ace" , "x": 1 }""") === "sp ace")
    // escapes: quote, backslash, newline, unicode
    assert(passwordOf("""{"password":"a\"b\\c\nAA"}""") === "a\"b\\c\nAA")
    // nested objects before the field are skipped structurally
    assert(passwordOf(
      """{"meta":{"password":"decoy"},"password":"real"}""") === "real")
    // the reference's document shape: extra fields in any order
    assert(passwordOf(
      """{"host":"db","port":1433,"username":"sa","password":"pw","engine":"sqlserver"}""")
      === "pw")
    // not-a-JSON-object stays untouched even with braces inside
    assert(passwordOf("""pass{"password":"x"}word""")
      === """pass{"password":"x"}word""")
    // malformed JSON falls back to the raw value rather than guessing
    assert(passwordOf("""{"password": oops}""") === """{"password": oops}""")
  }

  test("usernameOf extracts when present") {
    assert(usernameOf("""{"username":"sa","password":"p"}""") === Some("sa"))
    assert(usernameOf("plain") === None)
  }

  test("endpointPassword: per-endpoint ref first, shared fallback, JSON unwrap, empty default") {
    val r = new StaticResolver(Map(
      "DB_PASSWORD_MAIN" -> """{"username":"u","password":"mainpw"}""",
      "DB_PASSWORD" -> "sharedpw"))
    assert(endpointPassword(r, "main") === "mainpw")
    assert(endpointPassword(r, "other") === "sharedpw")
    assert(endpointPassword(new StaticResolver(Map.empty), "x") === "")
  }

  test("default chain: env refs and a mounted dir compose") {
    val dir = Files.createTempDirectory("graft-secrets2")
    Files.write(dir.resolve("DB_PASSWORD"), "fromfile".getBytes("UTF-8"))
    val r = SecretResolver.default(Map(
      "GRAFT_SECRET_DB_PASSWORD_A" -> "fromenv",
      "GRAFT_SECRETS_DIR" -> dir.toString))
    assert(endpointPassword(r, "a") === "fromenv")
    assert(endpointPassword(r, "b") === "fromfile")
  }
}
