package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Diagnostic for the billion-row sessionize rung: attributes the
  * segmented carry's wall time to its constituent stages so "where does
  * 381 s go at 1.28B events" is a measurement, not a guess. Times, in
  * order:
  *
  *   scan      — count() over the raw events (parquet scan floor)
  *   partials  — the (user, granule) exchange + per-granule window +
  *               first aggregate, counted (everything the corpus-sized
  *               exchange pays, nothing downstream)
  *   carry     — partials + the per-user (granule, lsid)-ordered window
  *               assigning global session ids (the second exchange)
  *   full      — sessionizeBatch with the same explicit granule
  *
  * The deltas between consecutive rows are the incremental costs of the
  * carry window (carry − partials) and of the chain emission
  * (full − carry — the prefix-sum windows + chain-last filter that
  * replaced the terminal (user, sid) merge aggregate in round 17). The
  * partials/carry lineages are REPLICAS of segmentedSessions' stages
  * (kept in sync by the session-count assertion against the real
  * operator).
  *
  * Usage: ProfileSessionizeStages <dir> [gapSeconds=21600] [passes=1]
  * Env:   SPARK_GRAFT_CPUS (default 32), SPARK_GRAFT_SHUFFLE (256),
  *        SPARK_DRIVER_MEM via build.sbt fork options.
  */
object ProfileSessionizeStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val gap = args.lift(1).map(_.toLong).getOrElse(21600L)
    val passes = args.lift(2).map(_.toInt).getOrElse(1)
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

    // ScaleProbe's uncached read (MEMORY_ONLY must not wrap a
    // beyond-storage-pool corpus)
    val raw = spark.read.parquet(s"$dir/events.parquet")
    val sec = raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        graft.ops.Joins.granuleBucket(col("ts"), 1000000000L).cast("timestamp")
      case _ => date_trunc("second", col("ts")).cast("timestamp")
    }
    val ev = raw.withColumn("ts", sec)

    // the auto-derivation's granule width, from one min/max job
    val mm = ev.agg(min(col("ts").cast("long")), max(col("ts").cast("long"))).head()
    val span = mm.getLong(1) - mm.getLong(0)
    val width = math.max(span / 4096 + 1, 4 * gap)
    println(s"[stages] span=$span s, granule width=$width s, gap=$gap s")

    def timed(name: String)(f: => Long): Long = {
      var out = 0L
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); out = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[stages] $name%-10s rows=$out%,14d  min=${times.min}%7.1f s" +
        (if (passes > 1) s"  passes=${times.map(t => f"$t%.1f").mkString(", ")}"
         else ""))
      out
    }

    val tl = col("ts").cast("long")
    import org.apache.spark.sql.expressions.Window
    def partialsOf(e: DataFrame): DataFrame = {
      val wLocal = Window.partitionBy(col("user_id"), col("__g")).orderBy(col("ts"))
      val prev = lag(col("ts"), 1).over(wLocal)
      val brk = when(prev.isNull.or(tl - prev.cast("long") > gap), 1L).otherwise(0L)
      e.withColumn("__g", graft.ops.Joins.granuleBucket(tl, width))
        .withColumn("__brk", brk)
        .withColumn("__lsid", sum(col("__brk")).over(
          wLocal.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__g"), col("__lsid"))
        .agg(min(col("ts")).as("__s_start"), max(col("ts")).as("__s_end"),
          count(lit(1)).as("__n"), sum(col("value")).as("__v"))
    }

    timed("scan")(ev.count())
    timed("partials")(partialsOf(ev).count())
    // carry — partials + the per-user (granule, lsid)-ordered window
    // that assigns global session ids (segmentedSessions' second and
    // final exchange); full − carry is then the chain emission (prefix
    // windows + chain-last filter — replaced the terminal merge
    // aggregate, 185.7 s -> 2.1 s at 1.28B)
    timed("carry") {
      val wUser = Window.partitionBy(col("user_id"))
        .orderBy(col("__g"), col("__lsid"))
      val prevEnd = lag(col("__s_end"), 1).over(wUser)
      val cont = when(col("__lsid") === 1L && prevEnd.isNotNull &&
          col("__s_start").cast("long") - prevEnd.cast("long") <= gap, 1L)
        .otherwise(0L)
      partialsOf(ev)
        .withColumn("__cont", cont)
        .withColumn("__sid", sum(lit(1L) - col("__cont")).over(
          wUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .count()
    }
    val sessions = timed("full")(graft.streaming.EventStreams
      .sessionizeBatch(ev, gap, Some(width), autoNative = false).count())
    println(s"[stages] sessions=$sessions")
    // the classic one-window-per-user form (sessionizeBatch's sub-gate
    // path, replicated): ONE corpus exchange on user_id and NO second
    // exchange — groupBy(user, sid) is satisfied by the user hash. Its
    // risk is per-user skew (a hot user's rows sort in one partition),
    // not wall time on uniform corpora; timing it here quantifies what
    // the segmented carry's skew insurance costs at this rung.
    // interior/boundary decomposition stats (the carry-split question):
    // a partial is INTERIOR when it is neither first nor last in its
    // granule — the local break already completed it, so a split
    // implementation could emit it without the carry join or the final
    // (user, sid) exchange. The split only pays when interior is a
    // large fraction; on corpora averaging ~1 event per (user, granule)
    // nbrk is 1, first == last, and interior is ~0 — measured here so
    // the decision is a number, not a guess.
    if (args.drop(3).contains("split")) {
      val pstats = partialsOf(ev)
        .withColumn("__nbrk", max(col("__lsid")).over(
          Window.partitionBy(col("user_id"), col("__g"))))
        .agg(count(lit(1)).as("partials"),
          sum(when(col("__lsid") > 1 && col("__lsid") < col("__nbrk"), 1L)
            .otherwise(0L)).as("interior")).head()
      val (np, ni) = (pstats.getLong(0), pstats.getLong(1))
      println(f"[stages] split-stats partials=$np%,d interior=$ni%,d " +
        f"interior_frac=${ni.toDouble / math.max(1L, np)}%.4f")
    }
    if (args.drop(3).contains("onewindow")) {
      val byUser = Window.partitionBy(col("user_id")).orderBy(col("ts"))
      val prevU = lag(col("ts"), 1).over(byUser)
      val brkU = when(prevU.isNull.or(tl - prevU.cast("long") > gap), 1L)
        .otherwise(0L)
      val oneW = ev
        .withColumn("__brk", brkU)
        .withColumn("__sid", sum(col("__brk")).over(
          byUser.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .groupBy(col("user_id"), col("__sid"))
        .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
          count(lit(1)).as("n_events"), round(sum(col("value")), 4).as("total_value"))
      val n1 = timed("onewindow")(oneW.count())
      require(n1 == sessions, s"one-window disagrees: $n1 != $sessions")
    }
    spark.stop()
  }
}
