package graft.llmops

import graft.SparkTestBase

class JsonSpec extends SparkTestBase {

  test("values: nesting, escapes, numbers, literals") {
    val v = Json.parseObject(
      """{"a": [1, 2.5, -3], "b": {"c": "x\n\"yA"}, "t": true,
         "n": null, "big": 9007199254740993}""")
    assert(v("a") == Vector(1L, 2.5, -3L))
    assert(v("b").asInstanceOf[Map[String, Any]]("c") == "x\n\"yA")
    assert(v("t") == true && v("n") == null)
    assert(v("big") == 9007199254740993L) // integral stays exact
  }

  test("insertion order preserved; empty containers") {
    val v = Json.parseObject("""{"z": {}, "a": [], "m": 1}""")
    assert(v.keys.toSeq == Seq("z", "a", "m"))
    assert(v("z") == Map.empty && v("a") == Vector.empty)
  }

  test("malformed returns null, never throws") {
    assert(Json.parse("{broken") == null)
    assert(Json.parse("""{"a": }""") == null)
    assert(Json.parse("[1, 2") == null)
    assert(Json.parse("12abc") == null)
    assert(Json.parse("") == null)
    assert(Json.parse(null) == null)
    assert(Json.parseObject("[1]") == null) // not an object
  }

  test("scientific notation and trailing whitespace") {
    assert(Json.parse(" 1.5e3 ") == 1500.0)
    assert(Json.parse("-2E-2") == -0.02)
  }

  test("pathological nesting degrades to null, never a StackOverflowError") {
    // untrusted metadata (Avro schema headers) reaches this parser — a
    // 100k-deep "[[[[…" must hit the depth cap (fail -> null), not blow
    // the JVM stack (FATAL, escapes the NonFatal catch, kills the task)
    val deep = "[" * 100000 + "]" * 100000
    assert(Json.parse(deep) == null)
    val deepObj = "{\"a\":" * 100000 + "1" + "}" * 100000
    assert(Json.parse(deepObj) == null)
    // legitimate nesting well inside the cap still parses
    val ok = "[" * 100 + "1" + "]" * 100
    assert(Json.parse(ok) != null)
  }

  test("\\u escape requires exactly four hex digits") {
    assert(Json.parse("\"\\u0041\"") == "A")
    assert(Json.parse("\"\\u+041\"") == null) // parseInt would take '+'
    assert(Json.parse("\"\\u00G1\"") == null)
  }
}
