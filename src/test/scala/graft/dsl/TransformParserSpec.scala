package graft.dsl

import org.scalatest.funsuite.AnyFunSuite

class TransformParserSpec extends AnyFunSuite {
  import TransformAst._

  test("empty transformation parses to None") {
    assert(TransformParser.parse("") === None)
    assert(TransformParser.parse("   ") === None)
    assert(TransformParser.parse(null) === None)
  }

  test("bare column name is a SimpleColumn") {
    assert(TransformParser.parse("FechaCreacion") === Some(SimpleColumn("FechaCreacion")))
  }

  test("single function with params") {
    assert(TransformParser.parse("fn_transform_Integer(Id)") ===
      Some(FuncCall("fn_transform_Integer", List(RawParam("Id")))))
  }

  test("params are trimmed and empties dropped") {
    assert(TransformParser.parse("fn_transform_Concatenate( a , b ,, c )") ===
      Some(FuncCall("fn_transform_Concatenate",
        List(RawParam("a"), RawParam("b"), RawParam("c")))))
  }

  test("nested function becomes NestedCall") {
    val got = TransformParser.parse(
      "fn_transform_Date_to_String(fn_transform_DateMagic(f,yyyy-MM-dd),yyyyMM)")
    assert(got === Some(FuncCall("fn_transform_Date_to_String", List(
      NestedCall(FuncCall("fn_transform_DateMagic",
        List(RawParam("f"), RawParam("yyyy-MM-dd")))),
      RawParam("yyyyMM")))))
  }

  test("commas inside nested parens do not split params") {
    val got = TransformParser.parse("fn_transform_Case(estado, 001|002->Activo, 003->Inactivo)")
    assert(got === Some(FuncCall("fn_transform_Case", List(
      RawParam("estado"), RawParam("001|002->Activo"), RawParam("003->Inactivo")))))
  }

  test("quoted commas are preserved") {
    val params = TransformParser.extractParameters("""a,"x,y",b""")
    assert(params === List("a", "\"x,y\"", "b"))
  }

  test("composite-key case rule keeps & and | intact") {
    val got = TransformParser.parse(
      "fn_transform_Case_with_default(linea&familia, 03&003->T, $F)")
    assert(got === Some(FuncCall("fn_transform_Case_with_default", List(
      RawParam("linea&familia"), RawParam("03&003->T"), RawParam("$F")))))
  }
}
