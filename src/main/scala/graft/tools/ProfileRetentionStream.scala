package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Per-epoch cost attribution for
  * [[graft.streaming.EventStreams.retentionStream]]'s round-19
  * INCREMENTAL refold vs the round-18 full refold, at a state size
  * where the difference matters (default 20M users, 10k-user epoch —
  * the steady-state monitoring regime: the state dwarfs every batch).
  *
  * Both shapes are reproduced here as plain DataFrame jobs over a
  * synthetic (user, cohort, mask) state so each epoch's TOTAL work —
  * including the state re-checkpoint both shapes pay — is timed
  * end-to-end, and their cell outputs are asserted IDENTICAL:
  *
  *   - full:        explode the WHOLE state to (user, period) pairs,
  *                  union the batch, re-fold every user, re-aggregate
  *                  the whole triangle (the round-18 per-epoch shape);
  *   - incremental: semi/anti split on the batch's users (AQE
  *                  broadcasts the 10k set — the state never
  *                  shuffles), re-fold only the affected slice, update
  *                  the readout-sized triangle by the ± cell delta
  *                  (the round-19 shape).
  *
  * Usage: runMain graft.tools.ProfileRetentionStream
  *        [nUsers=20000000] [batchUsers=10000] [maxOffset=30] [passes=3]
  */
object ProfileRetentionStream {
  def main(args: Array[String]): Unit = {
    val nUsers = args.lift(0).map(_.toLong).getOrElse(20000000L)
    val batchUsers = args.lift(1).map(_.toLong).getOrElse(10000L)
    val maxOffset = args.lift(2).map(_.toInt).getOrElse(30)
    val passes = args.lift(3).map(_.toInt).getOrElse(3)
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val maskOffsets = expr(
      s"filter(sequence(0L, ${maxOffset}L), " +
        "d -> (shiftright(mask, cast(d AS int)) & 1) = 1)")

    // synthetic settled state: cohort = user % 1000; two mask bits (the
    // cohort bit plus one pseudo-random offset), so the explode carries
    // a realistic >1 pairs/user
    val state = spark.range(nUsers).select(
        col("id").as("user"),
        (col("id") % 1000).as("cohort"),
        expr(s"1L | shiftleft(1L, cast(pmod(hash(id), $maxOffset) + 1 AS int))")
          .as("mask"))
      .localCheckpoint()
    // the epoch's batch: batchUsers spread across the id range, each
    // contributing one NEW in-range period (a fresh mask bit)
    val stride = math.max(1L, nUsers / batchUsers)
    val fresh = spark.range(batchUsers).select(
        (col("id") * stride).as("user"),
        ((col("id") * stride) % 1000 +
          pmod(hash(col("id") + 7), lit(maxOffset - 1)) + 1).as("period"))
      .localCheckpoint()

    def fold(in: DataFrame): DataFrame = in.groupBy("user")
      .agg(graft.functions.RetentionMaskExpr
        .column(col("period"), maxOffset).as("__rm"))
      .select(col("user"), col("__rm.cohort").as("cohort"),
        col("__rm.mask").as("mask"))

    def cellsOf(s: DataFrame): DataFrame = s
      .select(col("cohort"), explode(maskOffsets).as("offset"))
      .groupBy("cohort", "offset").agg(count(lit(1)).as("n_users"))

    def fingerprint(c: DataFrame): (Long, Long) = {
      val r = c.agg(count(lit(1)),
        sum(xxhash64(col("cohort"), col("offset"), col("n_users"))
          .cast("decimal(38,0)")).cast("string")).head()
      (r.getLong(0), r.getString(1).##.toLong)
    }

    def timed(name: String)(f: => (Long, Long)): (Long, Long) = {
      var best = Double.MaxValue; var out: (Long, Long) = (0L, 0L)
      (1 to passes).foreach { _ =>
        val t0 = System.nanoTime()
        out = f
        val dt = (System.nanoTime() - t0) / 1e9
        if (dt < best) best = dt
        println(f"[prs] $name%-12s ${dt}%8.1f s")
      }
      println(f"[prs] $name%-12s best ${best}%8.1f s  -> $out")
      out
    }

    println(s"[prs] state=$nUsers users, batch=$batchUsers, " +
      s"maxOffset=$maxOffset, passes=$passes (min reported)")

    // round-18 shape: full explode + full refold + full triangle
    val fullOut = timed("full") {
      val all = state
        .select(col("user"), explode(maskOffsets).as("__d"), col("cohort"))
        .select(col("user"), (col("cohort") + col("__d")).as("period"))
        .unionByName(fresh)
      val merged = fold(all).localCheckpoint()
      val cells = cellsOf(merged).localCheckpoint()
      val fp = fingerprint(cells)
      merged.unpersist(); cells.unpersist()
      fp
    }

    // round-19 shape: affected-only refold + cell delta over a
    // maintained triangle (seeded from the state once, untimed)
    val cells0 = cellsOf(state).localCheckpoint()
    def incEpoch(persistTo: Option[String]): (Long, Long) = {
      val freshUsers = fresh.select("user").distinct()
      val affected = state.join(freshUsers, Seq("user"), "left_semi")
        .localCheckpoint()
      val untouched = state.join(freshUsers, Seq("user"), "left_anti")
      val refolded = fold(affected
        .select(col("user"), explode(maskOffsets).as("__d"), col("cohort"))
        .select(col("user"), (col("cohort") + col("__d")).as("period"))
        .unionByName(fresh)).localCheckpoint()
      val newState = untouched.unionByName(refolded).localCheckpoint()
      val plus = refolded
        .select(col("cohort"), explode(maskOffsets).as("offset"))
        .groupBy("cohort", "offset").agg(count(lit(1)).as("__d"))
      val delta = affected
        .select(col("cohort"), explode(maskOffsets).as("offset"))
        .groupBy("cohort", "offset").agg((count(lit(1)) * lit(-1L)).as("__d"))
        .unionByName(plus)
        .groupBy("cohort", "offset").agg(sum(col("__d")).as("__d"))
      val newCells = cells0.join(delta, Seq("cohort", "offset"), "full_outer")
        .select(col("cohort"), col("offset"),
          (coalesce(col("n_users"), lit(0L)) +
            coalesce(col("__d"), lit(0L))).as("n_users"))
        .filter(col("n_users") > 0).localCheckpoint()
      persistTo.foreach { d =>
        graft.streaming.StreamState.persist(spark, d,
          "retention_stream_state", 0L,
          Seq("users" -> newState, "cells" -> newCells.coalesce(1)))
      }
      val fp = fingerprint(newCells)
      affected.unpersist(); refolded.unpersist()
      newState.unpersist(); newCells.unpersist()
      fp
    }
    val incOut = timed("incremental")(incEpoch(None))

    // restart durability priced at the same state size: the identical
    // incremental epoch PLUS the StreamState persist (generationed
    // state-sized parquet write + atomic manifest publish + prune) that
    // makes restart-from-checkpoint exact. Each pass writes a fresh
    // generation, exactly as the live stream would per epoch.
    val stateDir = java.nio.file.Files
      .createTempDirectory("prs_statedir").toString
    val perOut = timed("inc+persist")(incEpoch(Some(stateDir)))

    println(s"[prs] cells identical: " +
      s"${fullOut == incOut && incOut == perOut} " +
      s"(full=$fullOut incremental=$incOut inc+persist=$perOut)")
    if (fullOut != incOut || incOut != perOut) sys.exit(1)
    spark.stop()
  }
}
