package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wise wall-clock attribution for
  * [[graft.streaming.EventStreams.retention]] at scale (VERDICT r17
  * item 1): retention is the event family's single most expensive wall
  * (172.7–283.6 s at 1.28B) with no stage breakdown. Stages, MIN of
  * `passes`:
  *
  *   - distinct: the DISTINCT (user, period) collapse (scan + one
  *     map-side-collapsed exchange) — the shape's claimed cheap part
  *   - cohorts:  groupBy(user).min(period) — the optimizer collapses
  *     min-over-distinct into a SECOND full scan of the raw log
  *   - full:     the shipped operator end-to-end (distinct + cohorts +
  *     the user-keyed join + the (cohort, offset) cell aggregate)
  *   - window:   the candidate restructure — ONE scan: distinct
  *     (user, period), then cohort = min(period) over a user-partitioned
  *     window on the ALREADY-SMALL distinct relation, then the cell
  *     aggregate. Deletes the second scan and the join entirely; the
  *     per-user window partition is bounded by the period count (a
  *     user has at most span/periodSeconds distinct periods), so there
  *     is no skew exposure. Output asserted cell-identical.
  *
  * Usage: runMain graft.tools.ProfileRetentionStages <dir> [passes] */
object ProfileRetentionStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(1)
    val periodSeconds = 86400L
    val maxOffset = 7
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_SHUFFLE", "256"))
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.io.compression.codec", "zstd")
      .config("spark.local.dir", sys.env.getOrElse("SPARK_LOCAL_DIR", "/tmp"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val raw = spark.read.parquet(s"$dir/events.parquet")
    val sec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        graft.ops.Joins.granuleBucket(col("ts"), 1000000000L).cast("timestamp")
      case _ => date_trunc("second", col("ts")).cast("timestamp")
    }
    val ev = raw.withColumn("ts", sec)

    def timed(name: String)(f: => Long): Long = {
      var out = 0L
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); out = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[retention] $name%-8s rows=$out%,14d  min=${times.min}%7.1f s" +
        (if (passes > 1) s"  passes=${times.map(t => f"$t%.1f").mkString(", ")}"
         else ""))
      out
    }

    val epoch = unix_seconds(col("ts").cast("timestamp"))
    val adj = epoch - pmod(epoch, lit(periodSeconds))
    val period = (adj / lit(periodSeconds)).cast("long")
    val activity = ev.select(col("user_id").as("user"), period.as("period"))
      .distinct()
    timed("distinct")(activity.count())
    timed("cohorts")(activity.groupBy("user").agg(min("period").as("cohort"))
      .count())

    val shipped = graft.streaming.EventStreams
      .retention(ev, periodSeconds, maxOffset)
    timed("full")(shipped.count())

    val win = retentionWindowed(ev, periodSeconds, maxOffset)
    timed("window")(win.count())
    val mism = shipped.withColumnRenamed("n_users", "n_a")
      .join(win.withColumnRenamed("n_users", "n_b"),
        Seq("cohort", "offset"), "full_outer")
      .filter(col("n_a").isNull || col("n_b").isNull ||
        col("n_a") =!= col("n_b"))
    val nBad = mism.count()
    println(s"[retention] window-vs-shipped mismatched cells: $nBad")
    require(nBad == 0, "window form output differs from the shipped retention")
    spark.stop()
  }

  /** The window-form retention candidate (shared with the profiler's
    * equality check; promoted into EventStreams if the profile says so).
    * Null user/ts rows are dropped EXPLICITLY — the shipped form drops
    * them through the null-rejecting equi-join, which a window
    * partitioned by user would otherwise keep as a spurious null cohort. */
  def retentionWindowed(events: DataFrame, periodSeconds: Long,
                        maxOffset: Int, userCol: String = "user_id",
                        tsCol: String = "ts"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val epoch = unix_seconds(col(tsCol).cast("timestamp"))
    val adj = epoch - pmod(epoch, lit(periodSeconds))
    val period = (adj / lit(periodSeconds)).cast("long")
    events
      .filter(col(userCol).isNotNull && col(tsCol).isNotNull)
      .select(col(userCol).as("user"), period.as("period")).distinct()
      .withColumn("cohort",
        min(col("period")).over(Window.partitionBy(col("user"))))
      .withColumn("offset", col("period") - col("cohort"))
      .filter(col("offset") <= maxOffset)
      .groupBy("cohort", "offset")
      .agg(count(lit(1)).as("n_users"))
  }
}
