package graft.streaming

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Idempotent disk sinks for the monitoring twins' `foreachBatch`
  * output. foreachBatch delivers AT-LEAST-ONCE: a crash between the
  * sink call and Spark's epoch commit replays the epoch, so a sink that
  * appends writes the replayed rows twice. Writing each epoch into its
  * own `epoch=<N>` directory with Overwrite makes the replay REWRITE
  * the same directory instead — and because both twins recompute a
  * replayed epoch's rows deterministically (the accumulator merges are
  * idempotent; see [[EventStreams.rateAnomalyStream]] /
  * [[EventStreams.retentionStream]]), a COMMITTED directory's content
  * is EXACTLY-ONCE for any downstream reader. "Committed" is what the
  * readers enforce: a writer crash mid-job leaves a partial `epoch=N`
  * (no `_SUCCESS` marker, possibly a `_temporary` subtree) next to a
  * complete `epoch=N−1`, so both readers admit only epoch directories
  * carrying the committer's `_SUCCESS` marker — a torn epoch is
  * invisible until the restarted stream rewrites it whole. The layout
  * is plain Spark partition discovery, so the committed history reads
  * back as one DataFrame with an `epoch` column.
  *
  * Which reader fits is per-operator: the rate twin emits each window's
  * rows once (epochs are DISJOINT slices — union them with
  * [[readAllEpochs]]); the retention twin re-emits the FULL triangle
  * each folding epoch (epochs are SNAPSHOTS — take [[readLatestEpoch]]).
  */
object StreamSinks {

  /** A sink for `rateAnomalyStream`/`retentionStream`(...)(sink): each
    * epoch's rows land in `<dir>/epoch=<N>`, replays overwrite in
    * place. The write inherits the frame's partitioning; epochs are
    * batch-sized (rate: the freshly finalized windows; retention: the
    * readout-sized triangle), so no coalesce is forced here. The
    * `_SUCCESS` marker the committer drops last is the readers'
    * completeness gate — do not disable it
    * (`mapreduce.fileoutputcommitter.marksuccessfuljobs`) on these
    * directories. */
  def epochPartitionedParquet(dir: String): (DataFrame, Long) => Unit =
    (df, epoch) => df.write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/epoch=$epoch")

  /** The committed (`_SUCCESS`-marked) `epoch=<N>` directories under
    * `dir`, one listing of the root plus one marker probe per epoch
    * dir — epochs are few (one per folding batch), so this never
    * becomes a wide scan. */
  private def committedEpochs(spark: SparkSession, dir: String): Seq[Long] = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    fs.listStatus(root).toSeq
      .filter(_.isDirectory)
      .map(_.getPath)
      .collect { case p if p.getName.startsWith("epoch=") =>
        (p, p.getName.drop(6).toLong) }
      .collect { case (p, n)
          if fs.exists(new org.apache.hadoop.fs.Path(p, "_SUCCESS")) => n }
  }

  /** Every COMMITTED epoch's rows as one frame with the discovered
    * `epoch` column — the disjoint-slices reader (rate twin). A torn
    * epoch (crash mid-write: no `_SUCCESS`) is excluded; the restarted
    * stream's replay rewrites it whole, after which it appears. */
  def readAllEpochs(spark: SparkSession, dir: String): DataFrame = {
    val epochs = committedEpochs(spark, dir)
    if (epochs.isEmpty) throw new IllegalArgumentException(
      s"no committed epoch directories under $dir")
    spark.read.option("basePath", dir)
      .parquet(epochs.sorted.map(n => s"$dir/epoch=$n"): _*)
  }

  /** Only the highest COMMITTED epoch's rows (without the epoch
    * column) — the snapshot reader (retention twin). A partial
    * `epoch=N` left by a writer crash must not shadow the settled
    * `epoch=N−1`: the max is taken over `_SUCCESS`-marked directories
    * only. Listing is one directory scan plus one marker probe per
    * epoch; the read touches only the chosen epoch's files. */
  def readLatestEpoch(spark: SparkSession, dir: String): DataFrame = {
    val epochs = committedEpochs(spark, dir)
    if (epochs.isEmpty) throw new IllegalArgumentException(
      s"no committed epoch directories under $dir")
    spark.read.parquet(s"$dir/epoch=${epochs.max}")
  }
}
