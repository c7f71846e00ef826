package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sequence packing for training pipelines: assign each document to a
  * fixed token-budget bin, processing documents in a deterministic order
  * (contiguous chunked concatenation — a doc's bin is where its segment
  * STARTS, `floor(tokens_before / budget)`).
  *
  * The running total is a DISTRIBUTED two-level prefix sum, not one
  * global window: a single unpartitioned window funnels the corpus
  * through one task, which dies at scale. Instead:
  *   1. per-shard running sums (window partitioned by a coarse shard of
  *      the order key — parallel across shards),
  *   2. shard totals → running shard offsets (a window over the tiny
  *      shard-level frame — thousands of rows at any corpus size),
  *   3. global prefix = shard offset + in-shard prefix (broadcast join).
  */
object Packing {

  /** (id, bin, tokens_before) per row; `orderCol` must be unique (it
    * defines the packing order), `tokenCol` a non-negative count. */
  def packSequences(df: DataFrame, orderCol: String, tokenCol: String,
                    budget: Long, shardSize: Long = 100000L): DataFrame = {
    require(budget > 0, "budget must be positive")
    require(shardSize > 0, "shardSize must be positive")
    // `div` (integral) — `/` is double division, which mis-shards order
    // keys beyond 2^53
    val shard: Column = expr(s"CAST(`$orderCol` AS BIGINT) div ${shardSize}L")
    val withLocal = df
      .withColumn("__shard", shard)
      .withColumn("__local", sum(col(tokenCol)).over(
        Window.partitionBy(col("__shard")).orderBy(col(orderCol))
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))

    // shard totals → exclusive running offsets (tiny frame, one task);
    // computed from the RAW input with a plain sum, not max(__local) over
    // the windowed frame, which would evaluate the per-shard window sort
    // a second time under the aggregate
    val offsets = df
      .groupBy(shard.as("__shard"))
      .agg(sum(col(tokenCol)).as("__total"))
      .withColumn("__offset",
        coalesce(sum(col("__total")).over(
          Window.orderBy(col("__shard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("__shard", "__offset")

    withLocal.join(broadcast(offsets), Seq("__shard"))
      .withColumn("tokens_before",
        col("__offset") + col("__local") - col(tokenCol))
      .withColumn("bin", expr(s"tokens_before div ${budget}L"))
      .drop("__shard", "__local", "__offset")
  }
}
