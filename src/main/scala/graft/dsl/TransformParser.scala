package graft.dsl

/** Parser for the `fn_transform_*` transformation DSL.
  *
  * Grammar (reference: artifacts/aws-glue/code/stage/light_transform.py:619-692):
  *   expr        := funcCall | simpleColumn
  *   funcCall    := name '(' params? ')'          -- name = \w+, whole-string match
  *   params      := param (',' param)*            -- split at paren-depth 0, outside quotes
  *   param       := funcCall | rawText            -- nested call iff text starts with fn_transform_
  *
  * Raw params keep their surface text: the compiler decides column vs literal
  * vs `$`-escaped literal vs `a|b->label` case rule at application time,
  * exactly like the reference does.
  */
sealed trait TransformAst
object TransformAst {
  /** Bare column name (or empty transformation → typed NULL, decided by compiler). */
  final case class SimpleColumn(name: String) extends TransformAst
  final case class FuncCall(name: String, params: List[Param]) extends TransformAst

  sealed trait Param
  final case class RawParam(text: String) extends Param
  final case class NestedCall(call: FuncCall) extends Param
}

object TransformParser {
  import TransformAst._

  private val FuncPattern = """^(\w+)\((.*)\)$""".r

  /** Parse a transformation string. Empty/blank → None (typed NULL column). */
  def parse(expression: String): Option[TransformAst] = {
    val trimmed = Option(expression).getOrElse("").trim
    if (trimmed.isEmpty) None
    else Some(parseExpr(trimmed))
  }

  private def parseExpr(s: String): TransformAst = s match {
    case FuncPattern(name, paramsStr) =>
      FuncCall(name, extractParameters(paramsStr).map(toParam))
    case other => SimpleColumn(other)
  }

  private def toParam(text: String): Param =
    if (text.startsWith("fn_transform_")) {
      parseExpr(text) match {
        case fc: FuncCall => NestedCall(fc)
        case _            => RawParam(text) // unparseable → literal, as the reference does
      }
    } else RawParam(text)

  /** Split a parameter string on root-level commas, respecting nested parens
    * and double quotes (with backslash escape), mirroring
    * light_transform.py:650-692 exactly.
    */
  def extractParameters(paramsStr: String): List[String] = {
    if (paramsStr.isEmpty) return Nil
    val params = List.newBuilder[String]
    val current = new StringBuilder
    var parenCount = 0
    var inQuotes = false
    var i = 0
    while (i < paramsStr.length) {
      val ch = paramsStr.charAt(i)
      if (ch == '"' && (i == 0 || paramsStr.charAt(i - 1) != '\\')) {
        inQuotes = !inQuotes
        current += ch
      } else if (ch == '(' && !inQuotes) {
        parenCount += 1
        current += ch
      } else if (ch == ')' && !inQuotes) {
        parenCount -= 1
        current += ch
      } else if (ch == ',' && parenCount == 0 && !inQuotes) {
        if (current.toString.trim.nonEmpty) params += current.toString.trim
        current.clear()
      } else {
        current += ch
      }
      i += 1
    }
    if (current.toString.trim.nonEmpty) params += current.toString.trim
    params.result()
  }
}
