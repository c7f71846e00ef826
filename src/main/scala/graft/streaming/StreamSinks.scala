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
  * [[EventStreams.retentionStream]]), the directory's settled content
  * is EXACTLY-ONCE for any downstream reader. The layout is plain
  * Spark partition discovery, so the whole history reads back as one
  * DataFrame with an `epoch` column.
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
    * readout-sized triangle), so no coalesce is forced here. */
  def epochPartitionedParquet(dir: String): (DataFrame, Long) => Unit =
    (df, epoch) => df.write.mode(SaveMode.Overwrite)
      .parquet(s"$dir/epoch=$epoch")

  /** Every epoch's rows as one frame with the discovered `epoch`
    * column — the disjoint-slices reader (rate twin). */
  def readAllEpochs(spark: SparkSession, dir: String): DataFrame =
    spark.read.option("basePath", dir).parquet(dir)

  /** Only the highest epoch's rows (without the epoch column) — the
    * snapshot reader (retention twin). Listing is one directory scan;
    * the read touches only that epoch's files. */
  def readLatestEpoch(spark: SparkSession, dir: String): DataFrame = {
    val root = new org.apache.hadoop.fs.Path(dir)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val epochs = fs.listStatus(root).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("epoch=") => n.drop(6).toLong }
    if (epochs.isEmpty) throw new IllegalArgumentException(
      s"no epoch directories under $dir")
    spark.read.parquet(s"$dir/epoch=${epochs.max}")
  }
}
