package graft.tools

import org.apache.spark.sql.SparkSession

/** Diagnostic: x15 sessionize wall time vs granule width at a given sf
  * dir. Any width is CORRECT (the segmented carry's contract); this
  * measures where the auto ~4096-segment choice sits against coarser
  * widths — in particular widths below vs above the session GAP, since a
  * granule narrower than the gap can never fire a local break (every
  * (user, granule) emits one partial session and all construction falls
  * to the cross-granule carry), while a granule holding many gaps does
  * the real work in the spread-out local windows. Also times the
  * one-window fallback for reference, and asserts every variant returns
  * the same session count. Prints per-pass times; judge on the MIN.
  *
  * Usage: ProfileSessionize [sfDir] [passes]
  */
object ProfileSessionize {
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
    val ev = graft.streaming.EventStreams.eventsFrame(spark, dir)
    val gap = 21600L

    def run(label: String, granule: Option[Long]): Long = {
      def once(): Long = graft.streaming.EventStreams
        .sessionizeBatch(ev, gap, granule, autoNative = false).count()
      val n = once() // untimed warmup
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        once()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-28s sessions=$n  min=${times.min}%.2f s  " +
        f"passes=${times.map(t => f"$t%.2f").mkString(", ")}")
      n
    }

    val counts = Seq(
      run("auto (4-gap floored)", None),
      run("granule = gap/4", Some(gap / 4)),
      run("granule = gap", Some(gap)),
      run("granule = 2*gap", Some(2 * gap)),
      run("granule = 4*gap", Some(4 * gap)),
      run("granule = 16*gap", Some(16 * gap)),
      run("granule = 64*gap", Some(64 * gap)))
    assert(counts.distinct.size == 1, s"session counts diverged: $counts")

    // reference point: Spark's NATIVE session_window aggregate — same
    // session semantics (gap-based merge), but its physical plan sorts
    // and merges each user's whole timeline inside one task (the
    // UpdatingSessions iterator runs per key partition), i.e. exactly
    // the hot-key funnel the segmented carry exists to avoid. Timed here
    // so the single-node cost of that funnel-free guarantee stays an
    // informed trade, not a guess.
    {
      import org.apache.spark.sql.functions._
      def once(): Long = ev
        .groupBy(col("user_id"), session_window(col("ts"), s"$gap seconds"))
        .agg(count(lit(1)).as("n_events"))
        .count()
      val n = once()
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); once(); (System.nanoTime() - t0) / 1e9
      }
      println(f"native session_window       sessions=$n  min=${times.min}%.2f s  " +
        f"passes=${times.map(t => f"$t%.2f").mkString(", ")}")
      assert(n == counts.head, s"native session_window diverged: $n vs ${counts.head}")
    }
    spark.stop()
  }
}
