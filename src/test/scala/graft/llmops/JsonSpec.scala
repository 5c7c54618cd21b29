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
}
