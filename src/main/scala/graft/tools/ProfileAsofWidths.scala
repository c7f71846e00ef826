package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic: x31's as-of join wall time vs explicit granule width at a
  * given sf dir — does the auto ~4096-segment target sit at the knee,
  * or does the sessionize lesson (coarser granules shed granule-relation
  * overhead) apply here too? Any width is correct; row counts are
  * asserted identical. Prints per-pass times; judge on the MIN.
  *
  * Usage: ProfileAsofWidths [sfDir] [passes]
  */
object ProfileAsofWidths {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(3)
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
    val ev = graft.sources.TableRegistry.table(spark, dir, "events")
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))

    def run(label: String, granule: Option[Long]): Long = {
      def once(): Long = graft.ops.Joins.asOfJoin(
        errors, clicks, "user_id", "ts", Seq("click_value"), granule).count()
      val n = once()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-24s rows=$n  min=${times.min}%.2f s  " +
        f"passes=${times.map(t => f"$t%.2f").mkString(", ")}")
      n
    }

    val hourUs = 3600L * 1000000L
    val counts = Seq(
      run("auto (~4096 seg)", None),
      run("15 min", Some(hourUs / 4)),
      run("1 h (x31b's)", Some(hourUs)),
      run("6 h", Some(6 * hourUs)),
      run("24 h", Some(24 * hourUs)),
      run("4 d (~8 seg)", Some(96 * hourUs)))
    assert(counts.distinct.size == 1, s"row counts diverged: $counts")
    spark.stop()
  }
}
