package graft.dsl

import graft.config.ConfigLoader
import org.scalatest.funsuite.AnyFunSuite

/** Fidelity sweep over the reference's REAL column-config corpus (692
  * transformation strings, 35 tables): every row must parse and compile to
  * a Column without error, and the function mix must match the counts
  * documented in BASELINE.md. Skipped when the reference checkout is not
  * present.
  */
class ReferenceCorpusSpec extends AnyFunSuite {

  private val corpusPath =
    "/root/reference/artifacts/configuration/csv/columns.csv"

  private def loaded = {
    assume(new java.io.File(corpusPath).exists(), "reference corpus not present")
    ConfigLoader.columnsFrom(ConfigLoader.loadFile(corpusPath))
  }

  test("all 691 config rows parse; function mix matches BASELINE counts") {
    val cols = loaded
    assert(cols.size === 691) // 692 lines - header

    val parsed = cols.map(c => c -> TransformParser.parse(c.transformation))
    val failures = parsed.collect { case (c, None) if c.transformation.trim.nonEmpty => c }
    assert(failures.isEmpty, s"unparsed transformations: $failures")

    def countFn(name: String): Int = parsed.count {
      case (_, Some(TransformAst.FuncCall(n, _))) => n == name
      case _ => false
    }
    // documented mix (BASELINE.md "Transform function mix")
    assert(countFn("fn_transform_Integer") === 353)
    assert(countFn("fn_transform_ClearString") === 175)
    assert(countFn("fn_transform_Datetime") === 85)
    assert(countFn("fn_transform_Boolean") === 59)
    assert(countFn("fn_transform_Numeric") === 8)
    assert(countFn("fn_transform_Date") === 8)
    assert(countFn("fn_transform_Double") === 3)
  }

  test("every transformation compiles to a Column expression") {
    val cols = loaded
    // raw-layer columns: every identifier token referenced by any
    // transformation (mirrors the stringified raw frame the stage job sees)
    val tokens = cols.flatMap { c =>
      "[A-Za-z_][A-Za-z0-9_]*".r.findAllIn(c.transformation).toSeq
    }.toSet ++ cols.map(_.name)

    val errors = cols.flatMap { c =>
      try { TransformCompiler.compile(c.transformation, c.dataType, tokens); None }
      catch { case e: Exception => Some(s"${c.name}: ${c.transformation} → ${e.getMessage}") }
    }
    assert(errors.isEmpty, s"compile failures:\n${errors.mkString("\n")}")
  }
}
