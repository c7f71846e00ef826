package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.DataFrame

import graft.engine._

/** The dialect's fractional `sum` is compensated (KahanSumExpr):
  * exact where a plain double sum loses low-order bits, identical to the
  * native sum on null semantics, result types, non-finite propagation,
  * and grouping — and integral sums stay on the exact native path. */
class KahanSumSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  def runQ(df: DataFrame, json: String): DataFrame = QueryEngine.run(df, json).df

  test("compensation recovers bits a plain double sum loses") {
    import spark.implicits._
    // 1e16 + 1.0 rounds the 1.0 away entirely (ulp at 1e16 is 2), so the
    // naive left-to-right sum is 0.0; the compensated sum is exactly 1.0
    val df = Seq(1e16, 1.0, -1e16).toDF("v")
    assert(Seq(1e16, 1.0, -1e16).foldLeft(0.0)(_ + _) == 0.0,
      "fixture no longer defeats a naive left-to-right sum")
    val got = runQ(df, """{"select": [["sum", "v"]]}""").head.getDouble(0)
    assert(got == 1.0)
    // order/partition-independent: any layout of the same rows agrees
    assert(runQ(df.repartition(3), """{"select": [["sum", "v"]]}""")
      .head.getDouble(0) == 1.0)
  }

  test("null semantics and result types match the native sum") {
    import spark.implicits._
    val mixed = Seq[(String, java.lang.Double)](
      ("a", 1.5), ("a", null), ("b", null)).toDF("k", "v")
    // nulls are skipped; an all-null group is null
    val grouped = runQ(mixed,
      """{"select": ["k", ["sum", "v"]], "group_by": ["k"]}""")
      .collect().map(r => (r.getString(0), Option(r.get(1)))).toSeq
    assert(grouped == Seq(("a", Some(1.5)), ("b", None)))
    // double in, double out — same schema as the native sum
    assert(runQ(mixed, """{"select": [["sum", "v"]]}""")
      .schema("v").dataType == org.apache.spark.sql.types.DoubleType)
    // float widens to a double sum, like the native path
    val floats = Seq(1.5f, 2.25f).toDF("f")
    val f = runQ(floats, """{"select": [["sum", "f"]]}""")
    assert(f.schema("f").dataType == org.apache.spark.sql.types.DoubleType)
    assert(f.head.getDouble(0) == 3.75)
    // integral columns stay native and integral
    val longs = Seq(1L, 2L, 3L).toDF("n")
    val l = runQ(longs, """{"select": [["sum", "n"]]}""")
    assert(l.schema("n").dataType == org.apache.spark.sql.types.LongType)
    assert(l.head.getLong(0) == 6L)
  }

  test("non-finite inputs propagate like the native sum") {
    import spark.implicits._
    assert(runQ(Seq(1.0, Double.NaN).toDF("v"),
      """{"select": [["sum", "v"]]}""").head.getDouble(0).isNaN)
    assert(runQ(Seq(1.0, Double.PositiveInfinity).toDF("v"),
      """{"select": [["sum", "v"]]}""").head.getDouble(0)
      == Double.PositiveInfinity)
    assert(runQ(Seq(Double.NegativeInfinity, -5.0).toDF("v"),
      """{"select": [["sum", "v"]]}""").head.getDouble(0)
      == Double.NegativeInfinity)
    // opposing infinities: NaN, exactly as the native sum reports
    assert(runQ(Seq(Double.PositiveInfinity, Double.NegativeInfinity).toDF("v"),
      """{"select": [["sum", "v"]]}""").head.getDouble(0).isNaN)
  }

  test("grouped compensation: each group keeps its own correction term") {
    import spark.implicits._
    val df = Seq(("a", 1e16), ("a", 1.0), ("a", -1e16),
      ("b", 0.1), ("b", 0.2)).toDF("k", "v").repartition(4)
    val got = runQ(df,
      """{"select": ["k", ["sum", "v"]], "group_by": ["k"]}""")
      .collect().map(r => (r.getString(0), r.getDouble(1))).toSeq
    assert(got == Seq(("a", 1.0), ("b", 0.1 + 0.2)))
  }
}
