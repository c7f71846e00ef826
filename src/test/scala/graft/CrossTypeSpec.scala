package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.engine._

/** Cross-type (string ↔ numeric/bool) parity. The reference runs Python 2
  * object comparisons elementwise through pandas, where mixed-type
  * comparisons are CONSTANTS (numbers sort before strings) and mixed
  * assignment upcasts to object. A naive Spark plan instead survives
  * analysis and then crashes PER-ROW under ANSI (CAST_INVALID_INPUT →
  * HTTP 500) — the exact bug the round-3 fuzz found on update. Every mixed
  * combination in both grammars must either produce the pandas constant,
  * a pandas-equivalent value, or a clean 400. */
class CrossTypeSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  lazy val frame: DataFrame = {
    import spark.implicits._
    Seq((1L, 1.5, "x", true), (2L, 2.5, "y", false), (3L, 0.5, "z", true))
      .toDF("a", "b", "c", "f")
  }

  def runQ(json: String): DataFrame = QueryEngine.run(frame, json).df
  def as(df: DataFrame, c: String = "a"): Seq[Any] =
    df.select(c).collect().map(_.get(0)).toSeq
  def upd(json: String): DataFrame = UpdateEngine.update(frame, Query.parse(json))

  // ------------------------------------------------------------------
  // where-grammar comparisons (py2: number < string, always)
  // ------------------------------------------------------------------

  test("string column vs numeric literal comparisons are py2 constants") {
    assert(as(runQ("""{"where": ["==", "c", 1]}""")) == Seq())
    assert(as(runQ("""{"where": ["!=", "c", 1]}""")) == Seq(1L, 2L, 3L))
    assert(as(runQ("""{"where": ["<", "c", 1]}""")) == Seq())
    assert(as(runQ("""{"where": ["<=", "c", 1]}""")) == Seq())
    assert(as(runQ("""{"where": [">", "c", 1]}""")) == Seq(1L, 2L, 3L))
    assert(as(runQ("""{"where": [">=", "c", 1]}""")) == Seq(1L, 2L, 3L))
  }

  test("numeric column vs string literal comparisons are py2 constants") {
    assert(as(runQ("""{"where": ["==", "a", "'x'"]}""")) == Seq())
    assert(as(runQ("""{"where": ["!=", "a", "'x'"]}""")) == Seq(1L, 2L, 3L))
    assert(as(runQ("""{"where": ["<", "a", "'x'"]}""")) == Seq(1L, 2L, 3L))
    assert(as(runQ("""{"where": [">", "a", "'x'"]}""")) == Seq())
  }

  test("string column vs numeric column comparison is a py2 constant") {
    assert(as(runQ("""{"where": ["==", "c", "a"]}""")) == Seq())
    assert(as(runQ("""{"where": [">", "c", "a"]}""")) == Seq(1L, 2L, 3L))
  }

  test("string column vs nested boolean RHS is a py2 constant") {
    assert(as(runQ("""{"where": ["==", "c", ["==", "a", 1]]}""")) == Seq())
    assert(as(runQ("""{"where": [">", "c", ["==", "a", 1]]}""")) == Seq(1L, 2L, 3L))
  }

  test("bool column vs numeric literal compares as 0/1 (py2 bool is int)") {
    // True == 1, False == 0
    assert(as(runQ("""{"where": ["in", "f", [1]]}""")) == Seq(1L, 3L))
    assert(as(runQ("""{"where": ["in", "f", [0.0]]}""")) == Seq(2L))
    assert(as(runQ("""{"where": ["in", "f", [7]]}""")) == Seq())
  }

  // ------------------------------------------------------------------
  // mixed-type comparison over missing cells (py2: a missing cell is NaN
  // — a float — regardless of the column's dtype, so string-side nulls
  // compare NUMERICALLY while numeric-side nulls/NaN keep the constant)
  // ------------------------------------------------------------------

  lazy val nullFrame: DataFrame = {
    import spark.implicits._
    Seq((1L, Option(1.5), Option("x")),
        (2L, Option.empty[Double], Option.empty[String]),
        (3L, Option(Double.NaN), Option("z")))
      .toDF("a", "b", "c")
  }
  def runN(json: String): DataFrame = QueryEngine.run(nullFrame, json).df
  def asN(df: DataFrame, c: String = "a"): Seq[Any] =
    df.select(c).collect().map(_.get(0)).toSeq

  test("null string cells are excluded from true-side orderings, kept by !=") {
    // NaN > 1 is False (numeric compare), so the null-c row drops out
    assert(asN(runN("""{"where": [">", "c", 1]}""")) == Seq(1L, 3L))
    assert(asN(runN("""{"where": [">=", "c", 1]}""")) == Seq(1L, 3L))
    // NaN != 1 is True — null rows stay in
    assert(asN(runN("""{"where": ["!=", "c", 1]}""")) == Seq(1L, 2L, 3L))
    // false-side stays constant (NaN < 1 is also False)
    assert(asN(runN("""{"where": ["<", "c", 1]}""")) == Seq())
    assert(asN(runN("""{"where": ["==", "c", 1]}""")) == Seq())
  }

  test("null/NaN float cells keep the py2 constant vs a string literal") {
    // NaN is a number; numbers sort before strings — ALL rows match `<`
    assert(asN(runN("""{"where": ["<", "b", "'x'"]}""")) == Seq(1L, 2L, 3L))
    assert(asN(runN("""{"where": ["!=", "b", "'x'"]}""")) == Seq(1L, 2L, 3L))
    assert(asN(runN("""{"where": [">", "b", "'x'"]}""")) == Seq())
    assert(asN(runN("""{"where": ["==", "b", "'x'"]}""")) == Seq())
  }

  test("str-col vs num-col elementwise: only string-side nulls drop out") {
    // numeric-side null/NaN rows (2, 3) keep the constant; string-side
    // null (row 2) drops from the true side
    assert(asN(runN("""{"where": [">", "c", "b"]}""")) == Seq(1L, 3L))
    assert(asN(runN("""{"where": ["<", "c", "b"]}""")) == Seq())
    assert(asN(runN("""{"where": ["!=", "c", "b"]}""")) == Seq(1L, 2L, 3L))
  }

  test("nested string expression carries the null guard (alias grammar)") {
    // ['+','c','!'] is Str-category; its null row must behave like a
    // missing string cell, not fold to the constant
    val out = runN("""{"select": [["=", "d", [">", ["+", "c", "'!'"], 1]]]}""")
    assert(asN(out, "d") == Seq(true, false, true))
    val out2 = runN("""{"select": [["=", "d", ["<", ["+", "c", "'!'"], 1]]]}""")
    assert(asN(out2, "d") == Seq(false, false, false))
  }

  test("update where-filter: string-side nulls drop from true-side orderings") {
    val out = UpdateEngine.update(nullFrame,
      Query.parse("""{"update": [["a", 0]], "where": [">", "c", 1]}"""))
    assert(asN(out) == Seq(0L, 2L, 0L))
    val out2 = UpdateEngine.update(nullFrame,
      Query.parse("""{"update": [["a", 0]], "where": ["<", "b", "'x'"]}"""))
    assert(asN(out2) == Seq(0L, 0L, 0L))
  }

  // ------------------------------------------------------------------
  // in-lists: incompatible values can never match, never crash
  // ------------------------------------------------------------------

  test("mixed-type in-list keeps only column-compatible values") {
    assert(as(runQ("""{"where": ["in", "c", [1, "x", 2.5]]}""")) == Seq(1L))
    assert(as(runQ("""{"where": ["in", "a", ["x", 1, "2"]]}""")) == Seq(1L))
    assert(as(runQ("""{"where": ["in", "a", ["x"]]}""")) == Seq())
    // bools match their 0/1 numerics on a numeric column
    assert(as(runQ("""{"where": ["in", "a", [true]]}""")) == Seq(1L))
  }

  test("in sub-query against a mixed-type column matches nothing") {
    // sub-query yields numeric 'c' via alias; outer 'c' is a string
    val out = runQ(
      """{"where": ["in", "c", {"select": [["=", "c", "a"]]}]}""")
    assert(as(out) == Seq())
  }

  // ------------------------------------------------------------------
  // alias expressions
  // ------------------------------------------------------------------

  test("alias arithmetic over a string operand is a 400") {
    intercept[MalformedQueryException] {
      runQ("""{"select": [["=", "d", ["*", "c", 2]]]}""").collect()
    }
    intercept[MalformedQueryException] {
      runQ("""{"select": [["=", "d", ["-", 2.0, "c"]]]}""").collect()
    }
  }

  test("alias + over two strings concatenates (pandas eval python engine)") {
    val out = runQ("""{"select": [["=", "d", ["+", "c", "'!'"]]], "where": ["==", "a", 1]}""")
    assert(as(out, "d") == Seq("x!"))
  }

  test("alias comparison string vs numeric folds to the py2 constant") {
    val out = runQ("""{"select": [["=", "d", ["<", "c", 1]]], "where": ["==", "a", 1]}""")
    assert(as(out, "d") == Seq(false))
    val out2 = runQ("""{"select": [["=", "d", [">", "c", 1]]], "where": ["==", "a", 1]}""")
    assert(as(out2, "d") == Seq(true))
  }

  test("alias unary numeric function over a string operand is a 400") {
    intercept[MalformedQueryException] {
      runQ("""{"select": [["=", "d", ["sqrt", "c"]]]}""").collect()
    }
    intercept[MalformedQueryException] {
      runQ("""{"select": [["=", "d", ["-", "c"]]]}""").collect()
    }
  }

  test("alias ~ over an integer is bitwise complement (pandas ~int)") {
    val out = runQ("""{"select": [["=", "d", ["~", "a"]]], "where": ["==", "a", 1]}""")
    assert(as(out, "d") == Seq(-2L))
  }

  test("! over a string operand is a 400, not a runtime cast crash") {
    intercept[MalformedQueryException] {
      runQ("""{"where": ["!", "c"]}""").collect()
    }
  }

  // ------------------------------------------------------------------
  // update: simple assignment (the round-3 fuzz bug)
  // ------------------------------------------------------------------

  test("assigning a number to a string column stores its repr (200, not 500)") {
    val out = upd("""{"update": [["c", 9]], "where": ["==", "a", 1]}""")
    assert(as(out, "c") == Seq("9", "y", "z"))
    val out2 = upd("""{"update": [["c", 1.5]], "where": ["==", "a", 2]}""")
    assert(as(out2, "c") == Seq("x", "1.5", "z"))
  }

  test("assigning a numeric column to a string column stores its repr") {
    val out = upd("""{"update": [["c", "a"]], "where": ["==", "a", 3]}""")
    assert(as(out, "c") == Seq("x", "y", "3"))
  }

  test("assigning a string to a numeric or bool column is a 400") {
    intercept[MalformedQueryException] {
      upd("""{"update": [["a", "'x'"]], "where": ["==", "a", 1]}""").collect()
    }
    intercept[MalformedQueryException] {
      upd("""{"update": [["f", "'x'"]], "where": ["==", "a", 1]}""").collect()
    }
    // string COLUMN into numeric column is the same conflict
    intercept[MalformedQueryException] {
      upd("""{"update": [["a", "c"]], "where": ["==", "a", 1]}""").collect()
    }
  }

  test("bool into numeric stores 0/1; numeric into bool stores v != 0") {
    val out = upd("""{"update": [["a", true]], "where": ["==", "a", 2]}""")
    assert(as(out) == Seq(1L, 1L, 3L))
    val out2 = upd("""{"update": [["f", 9], ["f", 0]], "where": ["==", "a", 2]}""")
    // both assignments apply in order — last one wins on matched rows
    assert(as(out2, "f") == Seq(true, false, true))
  }

  test("assignment to an absent column creates it, null in unmatched rows") {
    val out = upd("""{"update": [["d", 7]], "where": ["==", "a", 1]}""")
    assert(as(out, "d") == Seq(7L, null, null))
    val outS = upd("""{"update": [["d", "'hi'"]], "where": [">", "a", 1]}""")
    assert(as(outS, "d") == Seq(null, "hi", "hi"))
  }

  test("update where-filter cross-type comparison is a py2 constant") {
    // "c" != 1 is all-True → every row updated
    val out = upd("""{"update": [["a", 0]], "where": ["!=", "c", 1]}""")
    assert(as(out) == Seq(0L, 0L, 0L))
    // "c" == 1 is all-False → nothing updated
    val out2 = upd("""{"update": [["a", 0]], "where": ["==", "c", 1]}""")
    assert(as(out2) == Seq(1L, 2L, 3L))
  }

  test("update in-filter drops incompatible values instead of crashing") {
    val out = upd("""{"update": [["a", 0]], "where": ["in", "c", [1, "'x'"]]}""")
    assert(as(out) == Seq(0L, 2L, 3L))
  }

  // ------------------------------------------------------------------
  // update: self-referring ops
  // ------------------------------------------------------------------

  test("string += string concatenates (pandas object column +=)") {
    val out = upd("""{"update": [["+", "c", "'!'"]], "where": ["==", "a", 1]}""")
    assert(as(out, "c") == Seq("x!", "y", "z"))
    val out2 = upd("""{"update": [["+", "c", "c"]], "where": ["==", "a", 2]}""")
    assert(as(out2, "c") == Seq("x", "yy", "z"))
  }

  test("other self-referring ops with a string operand are a 400") {
    intercept[MalformedQueryException] {
      upd("""{"update": [["*", "c", 2]], "where": ["==", "a", 1]}""").collect()
    }
    intercept[MalformedQueryException] {
      upd("""{"update": [["+", "c", 2]], "where": ["==", "a", 1]}""").collect()
    }
    intercept[MalformedQueryException] {
      upd("""{"update": [["+", "a", "'x'"]], "where": ["==", "a", 1]}""").collect()
    }
    intercept[MalformedQueryException] {
      upd("""{"update": [["<<", "a", "'x'"]], "where": ["==", "a", 1]}""").collect()
    }
  }
}
