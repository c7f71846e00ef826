package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode}
import org.apache.spark.sql.functions._

/** Train-ready shard export: write a corpus partitioned by a shard/bin
  * column (e.g. `Packing.packSequences`' `bin`) and return the manifest
  * the training job reads instead of listing 100 TB of files.
  *
  * The write is `partitionBy(shardCol)` parquet: one directory per shard,
  * pruned scans for any consumer that filters on it. `repartition` on the
  * shard column first, so each shard's rows co-locate and every shard
  * directory holds ONE file per shuffle partition that owns it — without
  * it, every executor appends a sliver file to every shard and the
  * filesystem drowns in small files at scale (the classic partitioned-
  * write mistake). The manifest aggregates (rows, token sum) per shard in
  * the same pass shape as any grouped count.
  */
object ShardWriter {

  def writeShards(df: DataFrame, shardCol: String, tokenCol: String,
                  path: String): DataFrame = {
    df.repartition(col(shardCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(shardCol)
      .parquet(path)
    manifest(df.sparkSession.read.parquet(path), shardCol, tokenCol)
  }

  /** The same export as line-delimited JSON (JSONL) — what most training
    * loaders consume directly. Spark's json writer IS one-object-per-line,
    * so each shard directory holds ready-to-stream JSONL part files;
    * `codec` ("gzip", "zstd", …) compresses them when the loader reads
    * compressed shards. The manifest is read back from what actually
    * landed, like [[writeShards]]. */
  def writeShardsJsonl(df: DataFrame, shardCol: String, tokenCol: String,
                       path: String, codec: Option[String] = None): DataFrame = {
    val w = df.repartition(col(shardCol))
      .write.mode(SaveMode.Overwrite)
      .partitionBy(shardCol)
    codec.fold(w)(c => w.option("compression", c)).json(path)
    // read back with the WRITER's schema: inference would re-read the
    // whole export once just to guess types, and an all-null column never
    // lands in JSON at all (null fields are omitted), which would make
    // the manifest's token sum an unresolved-column error
    manifest(df.sparkSession.read.schema(df.schema).json(path),
      shardCol, tokenCol)
  }

  private def manifest(written: DataFrame, shardCol: String,
                       tokenCol: String): DataFrame =
    written.groupBy(col(shardCol))
      .agg(count(lit(1)).as("n_rows"),
        sum(col(tokenCol)).cast("long").as("n_tokens"))
      .orderBy(col(shardCol))
}
