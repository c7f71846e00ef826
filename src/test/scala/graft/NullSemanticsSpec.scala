package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.engine._
import graft.sources.Ingest

/** pandas null/NaN parity on the paths the ported reference tests don't
  * cover (the reference filters null-free pandas boolean masks, so None/NaN
  * rows behave very differently from Spark's three-valued logic):
  *   - `!=` is True on null/NaN rows (None != x, NaN != anything)
  *   - `!` negates a null-free mask, so unknown ⇒ False ⇒ negation keeps
  *   - ascending AND descending sorts put null/NaN last (na_position='last')
  *   - group_by drops null/NaN keys (groupby dropna=True)
  *   - ordered comparisons involving NaN are always False
  */
class NullSemanticsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  // bar is null on the ccc row (CSV '' ⇒ null float)
  lazy val frame: DataFrame = Ingest.fromCsv(spark,
    """foo,bar,baz
      |bbb,1.25,5
      |aaa,3.25,7
      |ccc,,9""".stripMargin)

  lazy val nanFrame: DataFrame = {
    import spark.implicits._
    Seq(("a", 1.0), ("b", Double.NaN), ("c", 3.0), ("d", Double.NaN))
      .toDF("k", "v")
  }

  def runQ(df: DataFrame, json: String): DataFrame = QueryEngine.run(df, json).df
  def foos(df: DataFrame, c: String = "foo"): Seq[Any] =
    df.select(c).collect().map(_.get(0)).toSeq

  test("!= includes null rows (pandas None != x is True)") {
    assert(foos(runQ(frame, """{"where": ["!=", "bar", 1.25]}""")) == Seq("aaa", "ccc"))
  }

  test("negated == includes null rows (~False = True)") {
    assert(foos(runQ(frame, """{"where": ["!", ["==", "bar", 1.25]]}""")) == Seq("aaa", "ccc"))
  }

  test("negated in includes null rows") {
    assert(foos(runQ(frame, """{"where": ["!", ["in", "bar", [1.25]]]}""")) == Seq("aaa", "ccc"))
  }

  test("in-list containing null matches missing values (pandas isin([None]))") {
    assert(foos(runQ(frame, """{"where": ["in", "bar", [null]]}""")) == Seq("ccc"))
    assert(foos(runQ(frame, """{"where": ["in", "bar", [1.25, null]]}""")) ==
      Seq("bbb", "ccc"))
    assert(foos(runQ(frame, """{"where": ["!", ["in", "bar", [null]]]}""")) ==
      Seq("bbb", "aaa"))
    // NaN counts as missing on float columns (None→NaN coercion in pandas)
    assert(foos(runQ(nanFrame, """{"where": ["in", "v", [null]]}"""), "k") ==
      Seq("b", "d"))
  }

  test("negated ordered comparison includes null rows") {
    assert(foos(runQ(frame, """{"where": ["!", ["<", "bar", 2]]}""")) == Seq("aaa", "ccc"))
  }

  test("ascending order_by puts nulls last, like pandas na_position") {
    assert(foos(runQ(frame, """{"order_by": ["bar"]}""")) == Seq("bbb", "aaa", "ccc"))
  }

  test("descending order_by also puts nulls last") {
    assert(foos(runQ(frame, """{"order_by": ["-bar"]}""")) == Seq("aaa", "bbb", "ccc"))
  }

  test("group_by drops null keys (pandas groupby dropna=True)") {
    val out = runQ(frame, """{"select": ["bar", ["sum", "baz"]], "group_by": ["bar"]}""")
    assert(out.select("bar").collect().map(_.get(0)).toSeq == Seq(1.25, 3.25))
  }

  test("update filter: != updates null rows, ordered comparisons never match NaN") {
    import graft.engine.{Query, UpdateEngine}
    // bar is null on ccc — pandas' mask for bar != 1.25 includes it
    val updated = UpdateEngine.update(frame, Query.parse(
      """{"update": [["baz", 0]], "where": ["!=", "bar", 1.25]}"""))
    assert(updated.select("foo", "baz").collect()
      .map(r => (r.getString(0), r.getAs[Number](1).intValue)).toSeq ==
      Seq(("bbb", 5), ("aaa", 0), ("ccc", 0)))
    // NaN rows must NOT match "> 2" (Spark alone treats NaN as greatest)
    val nanUpd = UpdateEngine.update(nanFrame, Query.parse(
      """{"update": [["v", 0.0]], "where": [">", "v", 2.0]}"""))
    assert(nanUpd.filter("k = 'b'").select("v").head.getDouble(0).isNaN)
    assert(nanUpd.filter("k = 'c'").select("v").head.getDouble(0) == 0.0)
  }

  test("NaN rows: != keeps them, == and ordered comparisons never match") {
    assert(foos(runQ(nanFrame, """{"where": ["!=", "v", 1.0]}"""), "k") ==
      Seq("b", "c", "d"))
    // NaN == NaN must NOT match (Spark alone would treat NaN as equal)
    assert(foos(runQ(nanFrame, """{"where": ["==", "v", "v"]}"""), "k") ==
      Seq("a", "c"))
    assert(foos(runQ(nanFrame, """{"where": ["!=", "v", "v"]}"""), "k") ==
      Seq("b", "d"))
    // Spark alone would say 3.0 < NaN ⇒ NaN rows pass "> 2"; pandas says no
    assert(foos(runQ(nanFrame, """{"where": [">", "v", 2.0]}"""), "k") == Seq("c"))
    assert(foos(runQ(nanFrame, """{"where": ["!", [">", "v", 2.0]]}"""), "k") ==
      Seq("a", "b", "d"))
  }

  test("NaN sorts last in both directions, with the nulls") {
    // NaN/NaN tie order is unspecified — assert prefix + tail set
    val asc = foos(runQ(nanFrame, """{"order_by": ["v"]}"""), "k")
    assert(asc.take(2) == Seq("a", "c") && asc.drop(2).toSet == Set("b", "d"))
    val desc = foos(runQ(nanFrame, """{"order_by": ["-v"]}"""), "k")
    assert(desc.take(2) == Seq("c", "a") && desc.drop(2).toSet == Set("b", "d"))
  }

  test("group_by drops NaN keys") {
    val out = runQ(nanFrame, """{"select": ["v", ["count", "k"]], "group_by": ["v"]}""")
    assert(out.select("v").collect().map(_.getDouble(0)).toSeq == Seq(1.0, 3.0))
  }
}
