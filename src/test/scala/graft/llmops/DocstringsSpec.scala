package graft.llmops

import graft.SparkTestBase

class DocstringsSpec extends SparkTestBase {

  test("single-line defs with one-line and multi-line docstrings") {
    val tq = "\"\"\""
    val src =
      s"""def add(a, b):
        |    '''Add two numbers.'''
        |    return a + b
        |
        |def sub(a, b):
        |    ${tq}Subtract.
        |
        |    Longer text here.
        |    $tq
        |    return a - b
        |
        |def nodoc(x):
        |    return x
        |""".stripMargin
    val fs = Docstrings.pythonFunctions(src)
    assert(fs.map(_.name) == Seq("add", "sub", "nodoc"))
    assert(fs(0).docstring == "Add two numbers.")
    assert(fs(0).signature == "def add(a, b):")
    assert(fs(0).line == 1)
    assert(fs(1).docstring == "Subtract.\n\n    Longer text here.")
    assert(fs(2).docstring == null)
  }

  test("multi-line headers, async, annotations, methods") {
    val src =
      """class C:
        |    async def go(self,
        |                 x: int = 3,
        |                 y: dict = None) -> list:
        |        '''Runs.'''
        |        pass
        |
        |def ann(x) -> "weird":
        |    pass
        |""".stripMargin
    val fs = Docstrings.pythonFunctions(src)
    assert(fs.map(_.name) == Seq("go", "ann"))
    assert(fs(0).signature ==
      "async def go(self, x: int = 3, y: dict = None) -> list:")
    assert(fs(0).docstring == "Runs.")
    assert(fs(0).line == 2)
    assert(fs(1).docstring == null)
  }

  test("unterminated header or docstring does not loop or throw") {
    assert(Docstrings.pythonFunctions("def broken(a,\n  b") == Nil)
    val fs = Docstrings.pythonFunctions(
      "def f():\n    '''never closed\nmore text")
    assert(fs.length == 1 && fs(0).docstring == null)
    assert(Docstrings.pythonFunctions(null) == Nil)
    assert(Docstrings.pythonFunctions("") == Nil)
  }

  test("DataFrame explode keeps keys and nulls") {
    val ss = spark
    import ss.implicits._
    val out = Docstrings.functions(Seq(
      (1L, "def a():\n    '''da'''\n    pass\ndef b():\n    pass\n"),
      (2L, "no functions here"),
      (3L, null: String)).toDF("id", "content"), "id", "content")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getString(3)))
    assert(out.toSet == Set((1L, "a", "da"), (1L, "b", null)))
  }
}
