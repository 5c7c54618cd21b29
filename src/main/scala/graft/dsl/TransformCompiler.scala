package graft.dsl

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Compiles the `fn_transform_*` DSL to pure Catalyst `Column` expressions —
  * zero UDFs, so every transform stays inside whole-stage codegen and is
  * pushdown/prune-friendly at 100 TB.
  *
  * Function semantics are pinned 1:1 to the reference implementation
  * (artifacts/aws-glue/code/stage/light_transform.py:823-1326); see the
  * per-function notes. Deliberately preserved quirks:
  *   - `fn_transform_Datetime` ignores its declared fmt/default args
  *     (light_transform.py:974-978).
  *   - Un-`$`-prefixed default params resolve to *columns*, not literals
  *     (light_transform.py:854-859, 1263-1268).
  *   - Magic-number heuristic: int(value) > 100000 ⇒ Visual FoxPro day
  *     number, epoch 1900-01-01 with offset 693596
  *     (light_transform.py:33-34, 904-928).
  *   - `fn_transform_Case` rules are folded so *later* rules win on overlap
  *     (each rule wraps the previous expression; light_transform.py:1236-1244).
  *   - NESTED `fn_transform_Numeric` rounds to Decimal(18,2): the inferred
  *     return type "double" doesn't match the numeric(p,s) pattern, so
  *     `parseDecimalType` falls back — exactly the reference's
  *     `_parse_decimal_type(data_type='double')` chain
  *     (light_transform.py:810 + :967-971).
  *   - Composite-key `Case_with_default` alternatives SHORTER than the key
  *     column list match on the prefix (the reference's
  *     `if i < len(value_separated)` guard, light_transform.py:1291-1296);
  *     extra values beyond the key count are ignored.
  *
  * Requires `spark.sql.ansi.enabled=false` (cast-to-null) and
  * `spark.sql.legacy.timeParserPolicy=LEGACY` — see [[graft.GraftSession]].
  */
object TransformCompiler {
  import TransformAst._

  val MagicOffset = 693596       // FoxPro day-number offset (light_transform.py:34)
  val MagicThreshold = 100000    // > this ⇒ magic day number (light_transform.py:926)
  val BaseDateMagic = "1900-01-01"

  final case class CompileError(function: String, message: String)
      extends RuntimeException(s"$function: $message")

  /** A parameter after column/literal resolution: Right = a Column (df column
    * or nested-function result), Left = raw literal text.
    */
  private type P = Either[String, Column]

  /** Map a config type name to a Spark type (light_transform.py:1328-1354). */
  def sparkType(dataType: String): DataType = {
    val dt = Option(dataType).getOrElse("").toLowerCase
    if (dt.contains("numeric")) parseDecimalType(dt)
    else dt match {
      case "string"           => StringType
      case "int" | "integer"  => IntegerType
      case "double" | "float" => DoubleType
      case "boolean"          => BooleanType
      case "timestamp"        => TimestampType
      case "date"             => DateType
      case _                  => StringType
    }
  }

  private val DecimalPattern = """numeric\((\d+),(\d+)\)""".r
  def parseDecimalType(dataType: String): DecimalType =
    DecimalPattern.findFirstMatchIn(dataType.toLowerCase) match {
      case Some(m) => DecimalType(m.group(1).toInt, m.group(2).toInt)
      case None    => DecimalType(18, 2)
    }

  /** Nested-call return-type inference (light_transform.py:799-821). */
  def inferReturnType(functionName: String): String = functionName match {
    case "fn_transform_Date" | "fn_transform_DateMagic"        => "date"
    case "fn_transform_DatetimeMagic" | "fn_transform_Datetime" => "timestamp"
    case "fn_transform_Integer"                                 => "integer"
    case "fn_transform_Double" | "fn_transform_Numeric"         => "double"
    case "fn_transform_Boolean"                                 => "boolean"
    case _                                                      => "string"
  }

  /** Compile one transformation string for a column.
    *
    * @param transformation the DSL text (may be empty → typed NULL)
    * @param dataType       declared NEW_DATA_TYPE (drives Numeric precision
    *                       and the empty-transformation NULL type)
    * @param dfColumns      the input DataFrame's columns; params matching one
    *                       resolve to `col(...)`, everything else is literal
    */
  def compile(transformation: String, dataType: String, dfColumns: Set[String]): Column = {
    // column resolution is case-insensitive, matching Spark's default
    // analyzer behavior (spark.sql.caseSensitive=false)
    val canonical = dfColumns.map(_.toLowerCase)
    TransformParser.parse(transformation) match {
      case None => lit(null).cast(sparkType(dataType))
      case Some(SimpleColumn(name)) =>
        if (!canonical.contains(name.toLowerCase))
          throw CompileError("simple_column", s"unknown column: $name")
        col(name)
      case Some(fc: FuncCall) => compileCall(fc, dataType, canonical)
    }
  }

  private def compileCall(fc: FuncCall, dataType: String, dfColumns: Set[String]): Column = {
    val params: List[P] = fc.params.zipWithIndex.map {
      case (NestedCall(inner), _) =>
        Right(compileCall(inner, inferReturnType(inner.name), dfColumns))
      // Date_to_String wraps a RAW df-column date param in to_date()
      // exactly like the reference (light_transform.py:1091-1093 — str
      // params that name a column get to_date(col(...)); only NESTED
      // expressions pass through as-is). The general resolution below
      // erases the raw-vs-nested distinction, so the wrap must happen
      // here, where provenance is still known — without it a timestamp
      // column formats with its time part where the reference truncates.
      case (RawParam(text), 0)
          if fc.name == "fn_transform_Date_to_String" &&
            dfColumns.contains(text.toLowerCase) =>
        Right(to_date(col(text)))
      case (RawParam(text), _) =>
        if (dfColumns.contains(text.toLowerCase)) Right(col(text)) else Left(text)
    }
    apply(fc.name, params, dataType, dfColumns)
  }

  // --- parameter helpers -------------------------------------------------

  /** A Left param is by construction NOT a df column (compileCall resolves
    * those to Right), so treating it as a column reference is a contained
    * per-column error — the reference would blow up the whole select at
    * analysis time instead (light_transform.py error-containment fix).
    */
  private def asColumn(p: P): Column = p match {
    case Right(c) => c
    case Left(s)  => throw CompileError("param", s"references unknown column: $s")
  }

  /** `$x` → lit("x"); bare string → col(string); Column → itself.
    * (light_transform.py:854-859 — un-escaped defaults are column refs.)
    */
  private def dollarOrColumn(p: P): Column = p match {
    case Left(s) if s.startsWith("$") => lit(s.drop(1))
    case Left(s) => throw CompileError("default", s"default references unknown column: $s")
    case Right(c) => c
  }

  private def rawText(p: P): Option[String] = p.left.toOption

  // --- function dispatch --------------------------------------------------

  private def apply(name: String, params: List[P], dataType: String, dfColumns: Set[String]): Column =
    name match {
      case "fn_transform_Concatenate"       => concatenate(params)
      case "fn_transform_ClearString"       => clearString(params)
      case "fn_transform_DateMagic"         => dateMagic(params)
      case "fn_transform_Concatenate_ws"    => concatenateWs(params)
      case "fn_transform_Integer"           => castTo(params, IntegerType, name)
      case "fn_transform_Double"            => castTo(params, DoubleType, name)
      case "fn_transform_Boolean"           => castTo(params, BooleanType, name)
      case "fn_transform_Numeric"           => castTo(params, parseDecimalType(dataType), name)
      case "fn_transform_Datetime"          => datetime(params)
      case "fn_transform_DatetimeMagic"     => datetimeMagic(params)
      case "fn_transform_Date_to_String"    => dateToString(params, dfColumns)
      case "fn_transform_Date"              => dateFn(params)
      case "fn_transform_PeriodMagic"       => periodMagic(params)
      case "fn_transform_ByteMagic"         => byteMagic(params)
      case "fn_transform_Case"              => caseFn(params)
      case "fn_transform_Case_with_default" => caseWithDefault(params, dfColumns)
      case other => throw CompileError(other, s"unsupported function: $other")
    }

  /** F1 (light_transform.py:828-842): '|'-joined, NULL/blank → "", trimmed. */
  private def concatenate(params: List[P]): Column = {
    val parts = params.map { p =>
      val c = p.fold(lit(_), identity) // raw text → literal (py: lit(p))
      coalesce(
        when(c.isNull, lit(""))
          .otherwise(when(trim(c.cast(StringType)) === "", lit("")).otherwise(trim(c.cast(StringType)))),
        lit("")
      )
    }
    concat_ws("|", parts: _*)
  }

  /** F2 (light_transform.py:844-873) — public column-level form, shared by
    * the DSL compiler and the SQL function registry.
    */
  def clearString(origin: Column, default: Option[Column]): Column = {
    val blank = origin.isNull || (trim(origin) === "") ||
      trim(origin).isin("None", "NULL", "null")
    when(blank, default.getOrElse(lit(null).cast(StringType))).otherwise(trim(origin))
  }

  private def clearString(params: List[P]): Column = {
    if (params.isEmpty) throw CompileError("fn_transform_ClearString", "requires a column")
    clearString(asColumn(params.head), params.lift(1).map(dollarOrColumn))
  }

  /** F3 (light_transform.py:875-935): FoxPro day-number or formatted string. */
  def dateMagic(origin: Column, format: String, defaultText: String): Column = {
    val fmt = normalizeDateFormat(format)
    val toNull = defaultText.equalsIgnoreCase("to_null")
    val defaultDate =
      if (toNull) lit(null).cast(DateType) else to_date(lit(defaultText), "yyyy-MM-dd")
    val magicDate =
      date_add(to_date(lit(BaseDateMagic)), origin.cast(IntegerType) - lit(MagicOffset))
    when(origin.isNull, defaultDate)
      .when(origin.cast(IntegerType).isNotNull && (origin.cast(IntegerType) > lit(MagicThreshold)), magicDate)
      .otherwise(coalesce(to_date(origin.cast(StringType), fmt), defaultDate))
  }

  private def dateMagic(params: List[P]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_DateMagic", "requires >= 2 params")
    dateMagic(
      asColumn(params.head),
      rawText(params(1)).getOrElse("yyyy-MM-dd"),
      params.lift(2).flatMap(rawText).getOrElse("to_null"))
  }

  /** F4 (light_transform.py:937-951): explicit separator (last param). */
  private def concatenateWs(params: List[P]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_Concatenate_ws", "requires >= 2 params")
    val sep = rawText(params.last).getOrElse("|")
    val parts = params.dropRight(1).map { p =>
      coalesce(trim(asColumn(p).cast(StringType)), lit(""))
    }
    concat_ws(sep, parts: _*)
  }

  /** F5/F6 (light_transform.py:953-972): cast, failure → NULL (ANSI off). */
  private def castTo(params: List[P], t: DataType, fn: String): Column = {
    if (params.isEmpty) throw CompileError(fn, "requires a column")
    val origin = asColumn(params.head)
    coalesce(origin.cast(t), lit(null).cast(t))
  }

  /** F7 (light_transform.py:974-978) — fmt/default args deliberately ignored. */
  private def datetime(params: List[P]): Column =
    params.headOption match {
      case None    => current_timestamp()
      case Some(p) => coalesce(to_timestamp(asColumn(p)), lit(null).cast(TimestampType))
    }

  /** F8 (light_transform.py:980-1080): FoxPro date-number + HHMMSS time. */
  def datetimeMagic(dateP: Column, timeP: Column, defaultText: String): Column = {
    val dateFromMagic =
      date_add(to_date(lit(BaseDateMagic)), dateP.cast(IntegerType) - lit(MagicOffset))
    val convertedDate = when(dateP.isNull, lit(null).cast(DateType))
      .when(dateP.cast(IntegerType).isNotNull && (dateP.cast(IntegerType) > lit(MagicThreshold)), dateFromMagic)
      .otherwise(to_date(dateP.cast(StringType), "yyyy-MM-dd"))

    val timeNormalized = lpad(timeP.cast(StringType), 6, "0")
    val timeString = concat_ws(":",
      substring(timeNormalized, 1, 2),
      substring(timeNormalized, 3, 2),
      substring(timeNormalized, 5, 2))

    val ts = to_timestamp(
      concat(convertedDate.cast(StringType), lit(" "), timeString),
      "yyyy-MM-dd HH:mm:ss")

    if (defaultText.equalsIgnoreCase("to_null"))
      coalesce(ts, lit(null).cast(TimestampType))
    else
      coalesce(ts, to_timestamp(lit(defaultText), "yyyy-MM-dd HH:mm:ss"))
  }

  private def datetimeMagic(params: List[P]): Column = {
    if (params.length < 3) throw CompileError("fn_transform_DatetimeMagic", "requires >= 3 params")
    datetimeMagic(asColumn(params.head), asColumn(params(1)),
      params.lift(3).flatMap(rawText).getOrElse("to_null"))
  }

  /** F9 (light_transform.py:1082-1100). */
  private def dateToString(params: List[P], dfColumns: Set[String]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_Date_to_String", "requires 2 params")
    val dateCol = params.head match {
      // Right: either a nested expression (used as-is, reference parity)
      // or a raw df column already to_date-wrapped in compileCall
      case Left(s)  => to_date(lit(s)) // literal date text
      case Right(c) => c
    }
    val fmt = rawText(params(1)).getOrElse("yyyyMM")
    date_format(dateCol, fmt)
  }

  /** F10 (light_transform.py:1102-1149). */
  private def dateFn(params: List[P]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_Date", "requires >= 2 params")
    val origin = asColumn(params.head)
    val fmt = normalizeDateFormat(rawText(params(1)).getOrElse("yyyy-MM-dd"))
    val defaultText = params.lift(2).flatMap(rawText).getOrElse("to_null")
    val defaultDate =
      if (defaultText.equalsIgnoreCase("to_null")) lit(null).cast(DateType)
      else to_date(lit(defaultText), "yyyy-MM-dd")
    when(origin.isNull, defaultDate)
      .otherwise(coalesce(to_date(origin.cast(StringType), fmt), defaultDate))
  }

  /** Format whitelist shared by F3/F10 (light_transform.py:910-916). */
  private def normalizeDateFormat(fmt: String): String = fmt match {
    case "yyyy-MM-dd" | "yyyyMMdd" | "dd/MM/yyyy" | "MM/dd/yyyy" => fmt
    case _                                                       => "yyyy-MM-dd"
  }

  /** F11 (light_transform.py:1151-1178): params are (month, year) → 'YYYYMM'. */
  def periodMagic(month: Column, year: Column): Column =
    when(month.isNull || year.isNull, lit("190001"))
      .otherwise(concat(year.cast(StringType), lpad(month.cast(StringType), 2, "0")))

  private def periodMagic(params: List[P]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_PeriodMagic", "requires 2 params")
    periodMagic(asColumn(params.head), asColumn(params(1)))
  }

  /** F12 (light_transform.py:1180-1213): byte/char flag → 'T'/'F'. */
  def byteMagic(origin: Column, default: Column): Column =
    when(origin.isNull, default)
      .when(origin === lit("T"), lit("T"))
      .when(origin === lit("F"), lit("F"))
      .when(origin.cast(StringType) === "0x54", lit("T"))
      .when(origin.cast(StringType) === "0x46", lit("F"))
      .when(origin === lit(84), lit("T"))
      .when(origin === lit(70), lit("F"))
      .otherwise(default)

  private def byteMagic(params: List[P]): Column = {
    if (params.isEmpty) throw CompileError("fn_transform_ByteMagic", "requires >= 1 param")
    byteMagic(asColumn(params.head),
      params.lift(1).map(dollarOrColumn).getOrElse(lit("F")))
  }

  private val RuleSep = "->"

  /** F13 (light_transform.py:1215-1246): unmatched keeps original value. */
  private def caseFn(params: List[P]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_Case", "requires >= 2 params")
    val origin = asColumn(params.head)
    params.tail.foldLeft(origin) { (acc, p) =>
      rawText(p).filter(_.contains(RuleSep)) match {
        case Some(rule) =>
          val Array(valuePart, labelPart) = rule.split(RuleSep, 2)
          val values = valuePart.split('|').map(_.trim).toSeq
          when(origin.isin(values: _*), lit(labelPart.trim)).otherwise(acc)
        case None => acc
      }
    }
  }

  /** F14 (light_transform.py:1248-1323): with default; `a&b` composite keys. */
  private def caseWithDefault(params: List[P], dfColumns: Set[String]): Column = {
    if (params.length < 2) throw CompileError("fn_transform_Case_with_default", "requires >= 2 params")
    val originP = params.head
    val default = dollarOrColumn(params.last)
    val rules = if (params.length > 2) params.slice(1, params.length - 1) else Nil

    originP match {
      case Left(s) if s.contains("&") =>
        // composite key over several columns: rule 'v1&v2|w1&w2->label'
        val keyCols = s.split('&').map(_.trim)
        keyCols.filterNot(k => dfColumns.contains(k.toLowerCase)).foreach { missing =>
          throw CompileError("fn_transform_Case_with_default",
            s"composite key references unknown column: $missing")
        }
        rules.foldLeft(default) { (acc, p) =>
          rawText(p).filter(_.contains(RuleSep)) match {
            case Some(rule) =>
              val Array(valuePart, labelPart) = rule.split(RuleSep, 2)
              val alternatives = valuePart.split('|').map(_.trim)
              val cond = alternatives.map { alt =>
                val vals = alt.split('&')
                keyCols.zip(vals).map { case (c, v) => col(c) === lit(v.trim) }
                  .reduce(_ && _)
              }.reduce(_ || _)
              when(cond, lit(labelPart.trim)).otherwise(acc)
            case None => acc
          }
        }
      case _ =>
        val origin = asColumn(originP)
        rules.foldLeft(default) { (acc, p) =>
          rawText(p).filter(_.contains(RuleSep)) match {
            case Some(rule) =>
              val Array(valuePart, labelPart) = rule.split(RuleSep, 2)
              val values = valuePart.split('|').map(_.trim).toSeq
              when(origin.isin(values: _*), lit(labelPart.trim)).otherwise(acc)
            case None => acc
          }
        }
    }
  }
}
