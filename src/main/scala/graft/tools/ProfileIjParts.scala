package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: isolate where the interval-join inner/left time difference
  * comes from — raw join row production vs rollup — by timing each part
  * in BOTH orders inside one JVM. */
object ProfileIjParts {
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
    val ev = graft.streaming.EventStreams.eventsFrame(spark, dir)
    def joined(how: String) = graft.streaming.EventStreams.intervalJoinBatch(
      ev.filter(col("event_type") === "error"),
      ev.filter(col("event_type") === "click"),
      "user_id", horizonSeconds = 21600, how = how)
    def time(label: String, f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label%-22s ${(System.nanoTime() - t0) / 1e9}%.2f s  rows=$n")
    }
    // two full rounds so both orders appear after JIT warmup
    for (round <- 1 to 2) {
      println(s"--- round $round")
      time("inner.count", joined("inner").count())
      time("left.count", joined("left").count())
      time("left.count(2)", joined("left").count())
      time("inner.count(2)", joined("inner").count())
    }
    spark.stop()
  }
}
