package graft

import org.scalatest.funsuite.AnyFunSuite

/** Driver-contract smoke: entry() must return rows on sf0.001, and every
  * declared query must have either an oracle or an explicit rows-only
  * rationale (the driver records a weaker check for missing oracles). */
class EntrySpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  test("entry() returns rows on sf0.001") {
    assert(SparkEntry.entry(spark).count() > 0)
  }

  test("every oracle key has a matching query") {
    val missing = SparkEntry.oracleSql.keySet.diff(SparkEntry.queries.keySet)
    assert(missing.isEmpty, s"oracle without query: $missing")
  }

  test("all queries run at sf0.001 and rows-only queries are non-empty") {
    val dir = "/root/testdata/sf0.001"
    SparkEntry.queries.foreach { case (name, fn) =>
      val n = fn(spark, dir).count()
      withClue(name) { assert(n >= 0) }
      if (!SparkEntry.oracleSql.contains(name))
        withClue(s"$name (rows-only check must not be empty)") { assert(n > 0) }
    }
  }
}
