package graft.dsl

import graft.SparkTestBase
import org.apache.spark.sql.Row
import org.apache.spark.sql.types._

import java.sql.{Date, Timestamp}

/** Golden tests for the fn_transform_* semantics, pinned to the reference
  * implementation (light_transform.py:823-1326) including the documented
  * quirks: magic threshold 100000, offset 693596, `$`-literal vs column
  * defaults, rule-order precedence in Case, Datetime ignoring fmt args.
  */
class TransformCompilerSpec extends SparkTestBase {
  import spark.implicits._

  private def one(df: org.apache.spark.sql.DataFrame, transformation: String,
      dataType: String = "string"): Row = {
    df.select(TransformCompiler.compile(transformation, dataType, df.columns.toSet)
      .alias("out")).collect().head
  }

  private def outs(df: org.apache.spark.sql.DataFrame, transformation: String,
      dataType: String = "string"): Seq[Any] =
    df.select(TransformCompiler.compile(transformation, dataType, df.columns.toSet)
      .alias("out")).collect().toSeq.map(r => if (r.isNullAt(0)) null else r.get(0))

  test("F5 Integer: valid, invalid, null") {
    val df = Seq("42", "abc", null, " 7").toDF("c")
    assert(outs(df, "fn_transform_Integer(c)", "int") === Seq(42, null, null, 7))
  }

  test("F6 Numeric: decimal from NEW_DATA_TYPE") {
    val df = Seq("123.456").toDF("c")
    val r = one(df, "fn_transform_Numeric(c)", "numeric(13,2)")
    assert(r.get(0) === new java.math.BigDecimal("123.46"))
  }

  test("F2 ClearString: blank/None/NULL → null, trims otherwise") {
    val df = Seq("  x  ", "", "   ", "None", "NULL", "null", null).toDF("c")
    assert(outs(df, "fn_transform_ClearString(c)") ===
      Seq("x", null, null, null, null, null, null))
  }

  test("F2 ClearString: $-default literal vs column default") {
    val df = Seq(("None", "fallback")).toDF("c", "d")
    assert(one(df, "fn_transform_ClearString(c,$missing)").getString(0) === "missing")
    // un-escaped default resolves to the *column* d (reference quirk)
    assert(one(df, "fn_transform_ClearString(c,d)").getString(0) === "fallback")
  }

  test("F1 Concatenate: pipe join, null/blank → empty, literals trimmed") {
    val df = Seq((" a ", null: String, "b")).toDF("x", "y", "z")
    assert(one(df, "fn_transform_Concatenate(x,y,z,LIT)").getString(0) === "a||b|LIT")
  }

  test("F4 Concatenate_ws: explicit separator is last param") {
    val df = Seq(("a", "b")).toDF("x", "y")
    assert(one(df, "fn_transform_Concatenate_ws(x,y,-)").getString(0) === "a-b")
  }

  test("F3 DateMagic: magic number, boundary, string, junk, null") {
    val df = Seq("739062", "100000", "2024-06-25", "junk", null).toDF("c")
    val got = outs(df, "fn_transform_DateMagic(c,yyyy-MM-dd)", "date")
    // 739062 - 693596 = 45466 days after 1900-01-01 → 2024-06-23
    assert(got.head === Date.valueOf(java.time.LocalDate.of(1900, 1, 1).plusDays(45466).toString))
    assert(got(1) === null) // 100000 is NOT > threshold → string-parse fails
    assert(got(2) === Date.valueOf("2024-06-25"))
    assert(got(3) === null)
    assert(got(4) === null)
  }

  test("F3 DateMagic: literal default fills null and parse failure") {
    val df = Seq("junk", null).toDF("c")
    assert(outs(df, "fn_transform_DateMagic(c,yyyy-MM-dd,1900-01-01)", "date") ===
      Seq(Date.valueOf("1900-01-01"), Date.valueOf("1900-01-01")))
  }

  test("F7 Datetime: parses; declared fmt/default args ignored (quirk)") {
    val df = Seq("2024-06-25 07:30:00", "junk").toDF("c")
    val got = outs(df, "fn_transform_Datetime(c,yyyy-MM-dd HH:mm:ss,1900-01-01 00:00:01)", "timestamp")
    assert(got === Seq(Timestamp.valueOf("2024-06-25 07:30:00"), null))
  }

  test("F7 Datetime: no params → current_timestamp") {
    val df = Seq("x").toDF("c")
    assert(one(df, "fn_transform_Datetime()", "timestamp").get(0) != null)
  }

  test("F8 DatetimeMagic: magic date + int time with lpad") {
    val df = Seq(("739062", "70000"), ("2024-06-25", "123456")).toDF("d", "t")
    val got = outs(df, "fn_transform_DatetimeMagic(d,t,yyyy-MM-dd HH:mm:ss)", "timestamp")
    // 739062 is the reference's documented example: → 2024-06-25
    assert(got === Seq(
      Timestamp.valueOf("2024-06-25 07:00:00"),
      Timestamp.valueOf("2024-06-25 12:34:56")))
  }

  test("F9/F22 nested: Date_to_String over DateMagic") {
    val df = Seq("739062").toDF("c")
    assert(one(df,
      "fn_transform_Date_to_String(fn_transform_DateMagic(c,yyyy-MM-dd),yyyyMM)")
      .getString(0) === "202406")
  }

  test("F10 Date: format whitelist + default") {
    val df = Seq("25/06/2024", "bad").toDF("c")
    assert(outs(df, "fn_transform_Date(c,dd/MM/yyyy,1900-01-01)", "date") ===
      Seq(Date.valueOf("2024-06-25"), Date.valueOf("1900-01-01")))
  }

  test("F11 PeriodMagic: params are (month, year); null → 190001") {
    val df = Seq(("1", "2025"), (null, "2025")).toDF("mes", "anyo")
    assert(outs(df, "fn_transform_PeriodMagic(mes,anyo)") === Seq("202501", "190001"))
  }

  test("F12 ByteMagic: T/F, hex, int codes, default") {
    val df = Seq("T", "F", "0x54", "0x46", "84", "70", "x", null).toDF("c")
    assert(outs(df, "fn_transform_ByteMagic(c,$F)") ===
      Seq("T", "F", "T", "F", "T", "F", "F", "F"))
  }

  test("F13 Case: unmatched keeps original; later rules win on overlap") {
    val df = Seq("001", "003", "zzz").toDF("c")
    assert(outs(df, "fn_transform_Case(c, 001|002->Activo, 003->Inactivo)") ===
      Seq("Activo", "Inactivo", "zzz"))
    // overlap: second rule wraps the first → wins
    assert(outs(df, "fn_transform_Case(c, 001->first, 001->second)") ===
      Seq("second", "003", "zzz"))
  }

  test("F14 Case_with_default: single column + default") {
    val df = Seq("001", "zzz").toDF("c")
    assert(outs(df, "fn_transform_Case_with_default(c, 001->A, $D)") === Seq("A", "D"))
  }

  test("F14 Case_with_default: composite key over two columns") {
    val df = Seq(("03", "003"), ("03", "004"), ("99", "003")).toDF("linea", "familia")
    assert(outs(df, "fn_transform_Case_with_default(linea&familia, 03&003->T, $F)") ===
      Seq("T", "F", "F"))
  }

  test("F15 simple column passthrough and empty → typed null") {
    val df = Seq(("v", "w")).toDF("a", "b")
    assert(one(df, "a").getString(0) === "v")
    val r = df.select(TransformCompiler.compile("", "int", df.columns.toSet).alias("o"))
    assert(r.schema("o").dataType === IntegerType)
    assert(r.collect().head.isNullAt(0))
  }

  test("type mapping: numeric regex, defaults, unknown → string") {
    assert(TransformCompiler.sparkType("numeric(13,2)") === DecimalType(13, 2))
    assert(TransformCompiler.sparkType("numeric") === DecimalType(18, 2))
    assert(TransformCompiler.sparkType("int") === IntegerType)
    assert(TransformCompiler.sparkType("whatever") === StringType)
  }
}
