package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wise wall-clock attribution for [[graft.streaming.EventStreams.funnel]]
  * at scale (VERDICT r17 item 1): funnel is the event family's most
  * expensive unprofiled wall (100.6–205.3 s at 1.28B, SCALE_PROBE runs)
  * and its k−1 chained joins are the suspect. Stages timed on the real
  * corpus, MIN of `passes`:
  *
  *   - scan:   type-filtered count (the irreducible read)
  *   - s1:     step-1 aggregate (filter + groupBy(user).min)
  *   - s2:     s1 (persisted) + the step-2 join + aggregate
  *   - s3:     s2 (persisted) + the step-3 join + aggregate
  *   - full:   the shipped operator end-to-end (nothing persisted)
  *   - window: the candidate restructure — ONE exchange of the
  *     type-filtered events by user, k chained partition-wide window
  *     minima over that single sort (step i's matched ts feeds step
  *     i+1's `ts > prev` guard), then a groupBy(user) collapse that the
  *     user hash already satisfies (no second exchange). The sessionize
  *     playbook: delete joins by making one partitioning serve every
  *     step. Output is asserted row-identical to the shipped operator.
  *
  * Usage: runMain graft.tools.ProfileFunnelStages <dir> [passes] */
object ProfileFunnelStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(1)
    val steps = Seq("signup", "click", "purchase")
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
      println(f"[funnel] $name%-8s rows=$out%,14d  min=${times.min}%7.1f s" +
        (if (passes > 1) s"  passes=${times.map(t => f"$t%.1f").mkString(", ")}"
         else ""))
      out
    }

    timed("scan")(ev.filter(col("event_type").isin(steps: _*)).count())

    // stage decomposition: persist each accumulator so stage i+1's timer
    // excludes stage i's work (the full row below times the real thing)
    def stepAgg(acc: DataFrame, step: String, i: Int): DataFrame = {
      val prev = s"ts_$i"
      val cur = s"ts_${i + 1}"
      val stepEvents = ev.filter(col("event_type") === step)
        .select(col("user_id").as("__fk"), col("ts").as("__ft"))
      val accCols = acc.columns.map(acc(_))
      acc.join(stepEvents,
          acc("user_id") === col("__fk") && col("__ft") > acc(prev), "left")
        .groupBy(accCols: _*)
        .agg(min(col("__ft")).as(cur))
    }
    val s1 = ev.filter(col("event_type") === steps.head)
      .groupBy(col("user_id")).agg(min(col("ts")).as("ts_1"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("s1")(s1.count())
    val s2 = stepAgg(s1, steps(1), 1)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    timed("s2")(s2.count())
    val s3 = stepAgg(s2, steps(2), 2)
    timed("s3")(s3.count())
    s2.unpersist(); s1.unpersist()

    val shipped = graft.streaming.EventStreams.funnel(ev, "user_id", steps)
    val nFull = timed("full")(shipped.count())

    // candidate: one exchange, chained partition-wide window minima
    val win = funnelWindowed(ev, "user_id", steps)
    val nWin = timed("window")(win.count())
    require(nWin == nFull, s"window form row count differs: $nWin != $nFull")
    val mism = shipped.join(win,
        Seq("user_id") ++ steps.indices.map(i => s"ts_${i + 1}") :+
          "steps_completed", "full_outer")
      .filter(shipped.columns.map(c => col(c).isNull).reduce(_ || _))
    val nBad = mism.count()
    println(s"[funnel] window-vs-shipped mismatched rows: $nBad")
    require(nBad == 0, "window form output differs from the shipped funnel")
    spark.stop()
  }

  /** The window-form funnel candidate (shared with the profiler's
    * equality check; promoted into EventStreams if the profile says so). */
  def funnelWindowed(events: DataFrame, keyCol: String,
                     steps: Seq[String]): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(keyCol))
    var cur = events.filter(col("event_type").isin(steps: _*))
      .select(col(keyCol), col("event_type"), col("ts"))
    steps.zipWithIndex.foreach { case (s, i) =>
      val cond =
        if (i == 0) col("event_type") === s
        else col("event_type") === s && col("ts") > col(s"ts_$i")
      cur = cur.withColumn(s"ts_${i + 1}", min(when(cond, col("ts"))).over(w))
    }
    val tsCols = steps.indices.map(i => s"ts_${i + 1}")
    // "reached step 1" = HAS a step-1-typed event (the shipped form's
    // post-filter groupBy keeps a user whose step-1 events are all
    // null-ts, with ts_1 null) — gate on presence, not on ts_1
    cur.withColumn("__has1",
        max(when(col("event_type") === steps.head, 1).otherwise(0)).over(w))
      .groupBy(col(keyCol))
      .agg(first(col("__has1")).as("__has1"),
        tsCols.map(c => first(col(c)).as(c)): _*)
      .filter(col("__has1") === 1).drop("__has1")
      .withColumn("steps_completed",
        tsCols.map(c => when(col(c).isNotNull, 1).otherwise(0))
          .reduce(_ + _).cast("int"))
  }
}
