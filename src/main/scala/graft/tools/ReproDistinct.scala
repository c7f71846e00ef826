package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.engine.QueryEngine
import graft.sources.Ingest

/** Scratch reproducer for the flaky "distinct [] is idempotent" property —
  * regenerates the PropertySpec frame distribution until a conjunct breaks,
  * then prints the offending CSV. Diagnostic only. */
object ReproDistinct {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val rnd = new scala.util.Random(args.headOption.map(_.toLong).getOrElse(42L))
    def rowGen(): String = {
      val a = rnd.between(-5, 6)
      val b = if (rnd.nextBoolean()) f"${rnd.between(-3.0, 3.0)}%.2f" else ""
      val c = Seq("x", "y", "z", "xy")(rnd.nextInt(4))
      s"$a,$b,$c"
    }
    def rows(df: DataFrame): Seq[String] =
      df.selectExpr("a", "b", "c").collect()
        .map(r => s"${r.get(0)}|${r.get(1)}|${r.get(2)}").toSeq

    var i = 0
    while (i < 3000) {
      i += 1
      val n = 1 + rnd.nextInt(12)
      val csv = ("a,b,c" :: List.fill(n)(rowGen())).mkString("\n")
      val df = Ingest.fromCsv(spark, csv)
      val once = QueryEngine.run(df, """{"distinct": []}""").df
      val twice = QueryEngine.run(once, """{"distinct": []}""").df
      val onceRows = rows(once)
      val c1 = onceRows.sorted == rows(twice).sorted
      val c2 = onceRows.distinct.length == onceRows.length
      val c3 = onceRows.toSet.subsetOf(rows(df).toSet)
      if (!(c1 && c2 && c3)) {
        println(s"FAILED at iter $i: idempotent=$c1 unique=$c2 subset=$c3")
        println("CSV:\n" + csv)
        println("once:  " + onceRows.sorted.mkString(" ; "))
        println("twice: " + rows(twice).sorted.mkString(" ; "))
        println("input: " + rows(df).sorted.mkString(" ; "))
        sys.exit(1)
      }
      if (i % 500 == 0) println(s"...$i ok")
    }
    println("no failure in 3000 iters")
    sys.exit(0)
  }
}
