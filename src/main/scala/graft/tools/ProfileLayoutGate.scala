package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: the sessionize layout gate end-to-end on a big fixture.
  * Pass a dir whose events.parquet is TIME-SORTED (row-group footers
  * near-disjoint): asserts the gate detects it, times the auto pick
  * (native) against the forced segmented carry, and asserts equality.
  * Against the stock replica-layout sf1 dir the gate must stay off. */
object ProfileLayoutGate {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/tmp/events_sorted")
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
    val gap = 21600L
    println(s"timeClusteredLayout = ${graft.streaming.EventStreams.timeClusteredLayout(ev)}")
    def time(label: String, f: => Long): Long = {
      f // warm
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); val n = f
        ((System.nanoTime() - t0) / 1e6).toLong -> n
      }
      println(f"$label%-18s min=${times.map(_._1).min}%5d ms  sessions=${times.head._2}")
      times.head._2
    }
    val nAuto = time("auto", graft.streaming.EventStreams
      .sessionizeBatch(ev, gap).count())
    val nSeg = time("forced segmented", graft.streaming.EventStreams
      .sessionizeBatch(ev, gap, autoNative = false).count())
    require(nAuto == nSeg, s"session counts diverged: $nAuto vs $nSeg")
    val diff = graft.streaming.EventStreams.sessionizeBatch(ev, gap)
      .exceptAll(graft.streaming.EventStreams
        .sessionizeBatch(ev, gap, autoNative = false)).count()
    println(s"auto EXCEPT ALL segmented rows = $diff")
    spark.stop()
  }
}
