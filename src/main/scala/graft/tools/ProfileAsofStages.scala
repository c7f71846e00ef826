package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Stage-wise wall-clock attribution for [[graft.ops.Joins.asOfJoin]] at
  * the ≥100M-right-rows rung (VERDICT r17 items 2+3): the as-of carry
  * kept the round-15 granule shape (local window → boundary aggregate →
  * carry-in window → join back) while sessionize's per-row rewrite
  * proved the boundary machinery deletable — this tool measures what
  * each as-of stage actually costs and what the strategy tiers trade.
  * The x31 shape on the events corpus: errors as the left side, clicks
  * (max value per (user, ts)) as the right. Stages, MIN of `passes`:
  *
  *   - sides:   materialize both sides (count) — the irreducible feed
  *   - local:   union + per-(key, granule) running-last window
  *   - boundary: the (key, granule) closing-carry aggregate alone
  *   - segmented: the full segmented carry (strategy=segmented)
  *   - window:  the one-window carry (strategy=window)
  *   - auto:    the shipped strategy (row gate + measured skew tier —
  *     the verdict logs via graft.skewmeasure)
  *
  * Output equality is asserted between segmented and window via an
  * order-independent fingerprint (sum of row hashes in decimal — exact,
  * no ANSI overflow), so the strategy tiers provably trade only wall
  * time at this rung.
  *
  * Usage: runMain graft.tools.ProfileAsofStages <dir> [passes]
  *        [stage,stage,...]  — subset from {sides, skewcheck, stages,
  * segmented, window, auto}; the strategies' shuffle files accumulate
  * for the JVM's lifetime (the ScaleProbe caveat), so on a disk-tight
  * box run each strategy in its own JVM. */
object ProfileAsofStages {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val passes = args.lift(1).map(_.toInt).getOrElse(1)
    val only = args.lift(2).map(_.split(",").toSet)
    def wanted(name: String): Boolean = only.forall(_.contains(name))
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
    val errors = ev.filter(col("event_type") === "error")
      .select("event_id", "user_id", "ts", "value")
    val clicks = ev.filter(col("event_type") === "click")
      .groupBy("user_id", "ts").agg(max(col("value")).as("click_value"))

    def timed(name: String)(f: => Long): Long = {
      var out = 0L
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime(); out = f
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[asof] $name%-9s rows=$out%,14d  min=${times.min}%7.1f s" +
        (if (passes > 1) s"  passes=${times.map(t => f"$t%.1f").mkString(", ")}"
         else ""))
      out
    }

    if (wanted("sides")) timed("sides")(errors.count() + clicks.count())

    // the measured-skew tier's verdict on the real union, printed
    // explicitly (INFO logs are suppressed at WARN level here)
    if (wanted("skewcheck")) {
      val l = errors.select(col("user_id").as("__k"), col("ts").as("__t"))
      val r = clicks.select(col("user_id").as("__k"), col("ts").as("__t"))
      val u = l.unionByName(r)
      val est = graft.ops.Similarity.approxRows(u, rowBytes = 64L,
        unknownAs = Long.MaxValue)
      val t0 = System.nanoTime()
      val uniform = graft.ops.Joins.measuredUniformKeys(u, "__k", "__t", est)
      println(f"[asof] skewcheck estRows=$est%,d verdict=" +
        s"${if (uniform) "windowed" else "segmented"} " +
        f"(measured in ${(System.nanoTime() - t0) / 1e9}%.1f s)")
    }

    // hand-unrolled stages of the segmented carry (mirrors
    // Joins.asOfJoin's segmented branch; micros embedding, auto width)
    if (wanted("stages")) {
      import org.apache.spark.sql.expressions.Window
      val width = {
        val mm = ev.agg(min(col("ts").cast("long")), max(col("ts").cast("long"))).head()
        math.max((mm.getLong(1) - mm.getLong(0)) * 1000000L / 4096 + 1, 1L)
      }
      println(s"[asof] granule width=$width micros")
      val l = errors.select(col("user_id").as("__k"),
        col("ts").as("__t"), lit(1).as("__side"),
        lit(null).cast("double").as("__p"))
      val r = clicks.select(col("user_id").as("__k"),
        col("ts").as("__t"), lit(0).as("__side"),
        col("click_value").as("__p"))
      val u = l.unionByName(r)
      val ub = u.withColumn("__g", graft.ops.Joins.granuleBucket(
        unix_micros(col("__t")), width))
      val wLocal = Window.partitionBy(col("__k"), col("__g"))
        .orderBy(col("__t"), col("__side"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      timed("local")(ub.withColumn("__local",
        last(col("__p"), ignoreNulls = true).over(wLocal)).count())
      timed("boundary")(ub.groupBy(col("__k"), col("__g"))
        .agg(max_by(col("__p"), when(col("__side") === 0,
          struct(col("__t").isNotNull.as("nn"), col("__t").as("t")))).as("__bp"))
        .count())
    }

    def fingerprint(df: DataFrame): (Long, String) = {
      val row = df.agg(count(lit(1)).as("n"),
        sum(xxhash64(struct(df.columns.map(col): _*)).cast("decimal(38,0)"))
          .as("fp")).head()
      (row.getLong(0), String.valueOf(row.get(1)))
    }
    def run(strategy: String): (Long, String) = {
      var out: (Long, String) = (0L, "")
      val times = (1 to passes).map { _ =>
        val t0 = System.nanoTime()
        out = fingerprint(graft.ops.Joins.asOfJoin(errors, clicks,
          "user_id", "ts", Seq("click_value"), strategy = strategy))
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[asof] ${strategy}%-9s rows=${out._1}%,14d  " +
        f"min=${times.min}%7.1f s  fp=${out._2}" +
        (if (passes > 1) s"  passes=${times.map(t => f"$t%.1f").mkString(", ")}"
         else ""))
      out
    }
    val results = Seq("segmented", "window", "auto").filter(wanted)
      .map(st => st -> run(st)).toMap
    require(results.values.toSet.size <= 1,
      s"strategy outputs differ: $results")
    if (results.size > 1)
      println(s"[asof] ${results.keys.mkString("+")} fingerprint-identical")
    spark.stop()
  }
}
