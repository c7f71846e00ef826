package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** One-off equality probe: does a native session_window rollup reproduce
  * sessionizeBatch row-for-row (start/end/count/sum) at a given sf dir?
  * Prints the symmetric difference count (0 = bit-equal).
  */
object CheckNativeSessions {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableRegistry.warmup(spark, dir, Seq("events"))
    val ev = graft.streaming.EventStreams.eventsFrame(spark, dir)
    val gap = 21600L
    val segmented = graft.streaming.EventStreams.sessionizeBatch(ev, gap,
      autoNative = false)
    val native = ev
      .groupBy(col("user_id"), session_window(col("ts"), s"$gap seconds"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("total_value"))
      .drop("session_window")
    val d1 = segmented.exceptAll(native).count()
    val d2 = native.exceptAll(segmented).count()
    println(s"segmented-only=$d1 native-only=$d2")
    spark.stop()
  }
}
