package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: x31 (auto granule) vs x31b (explicit granule) wall time at
  * a given sf dir — the footer-derivation target is x31 within ~15% of
  * x31b (round-10 verdict #5: the auto min/max pre-pass was worth ~1 s
  * at sf1). Prints per-pass times; judge on the MIN (same rationale as
  * Bench).
  *
  * Usage: ProfileAsof [sfDir] [passes]
  */
object ProfileAsof {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(4)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableRegistry.warmup(spark, dir, Seq("events"))

    // does the footer derivation engage for x31's real input shapes?
    {
      import org.apache.spark.sql.functions._
      val ev = graft.sources.TableRegistry.table(spark, dir, "events")
      val errors = ev.filter(col("event_type") === "error")
        .select("event_id", "user_id", "ts", "value")
      val clicks = ev.filter(col("event_type") === "click")
        .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))
      println(s"footer(errors.ts)=${org.apache.spark.sql.GraftSqlShims.parquetFooterBounds(errors, "ts")}")
      println(s"footer(clicks.ts)=${org.apache.spark.sql.GraftSqlShims.parquetFooterBounds(clicks, "ts")}")
      // x15's shape: eventsFrame truncs ts to seconds — the trunc-chain
      // trace must resolve too (sessionize's pre-pass elimination)
      val ef = graft.streaming.EventStreams.eventsFrame(spark, dir)
      println(s"footer(eventsFrame.ts)=${org.apache.spark.sql.GraftSqlShims.parquetFooterBounds(ef, "ts")}")
    }

    for (name <- Seq("x31_asof", "x31b_asof_hot")) {
      // one untimed warmup, then timed passes (fresh plan per pass — the
      // bench shape: the pre-pass/footer cost is paid at plan build)
      graft.SparkEntry.queries(name)(spark, dir).count()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min=${times.min}%.2f s  passes=${times.map(t => f"$t%.2f").mkString(", ")}")
    }
    spark.stop()
  }
}
