package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: execute the interval-join queries at sf1 and dump the
  * AQE-FINAL physical plans (the static explain hides runtime join
  * strategy changes). */
object ProfileIjPlans {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableRegistry.warmup(spark, dir, Seq("events"))
    for (name <- Seq("x63_interval_join", "x63b_interval_join_left")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      df.count()
      println(s"\n========== $name (AQE final) ==========")
      println(df.queryExecution.executedPlan.toString.linesIterator
        .filter(l => l.contains("Join") || l.contains("Exchange") ||
          l.contains("Broadcast") || l.contains("Generate") ||
          l.contains("Sort") || l.contains("Aggregate"))
        .mkString("\n"))
    }
    spark.stop()
  }
}
