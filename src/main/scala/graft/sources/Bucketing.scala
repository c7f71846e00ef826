package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed table layout: the zero-shuffle path for the joins a pipeline
  * repeats (fact-to-fact on the same key, every run). Writing both sides
  * `bucketBy(n, key)` (and sorting within buckets) records the hash
  * partitioning in the catalog; Spark then plans an equi-join on that key
  * with NO Exchange on either side — each task zips bucket i with bucket
  * i — and with both sides bucket-SORTED, no Sort either: the join is a
  * pure streaming merge per bucket pair.
  *
  * At 100 TB this is the difference between re-shuffling the corpus on
  * every join of every run and paying one layout write at ingest. Bucket
  * count sizes task granularity: aim for buckets of 100-500 MB (e.g.
  * 100 TB / 256 MB ≈ 400k buckets); both sides must agree on count and
  * key for the exchange-free plan.
  */
object Bucketing {

  /** Write `df` as a bucketed, bucket-sorted catalog table. */
  def writeBucketed(df: DataFrame, table: String, key: String,
                    buckets: Int): Unit =
    df.write.format("parquet").mode(SaveMode.Overwrite)
      .bucketBy(buckets, key).sortBy(key)
      .saveAsTable(table) // managed: lives under spark.sql.warehouse.dir

  /** The co-located equi-join of two same-bucketed tables. The physical
    * plan is the evidence: no Exchange (and no Sort) on either side —
    * assert with `hasExchange(plannedJoin(...)) == false`. */
  def colocatedJoin(spark: SparkSession, left: String, right: String,
                    key: String): DataFrame =
    spark.table(left).join(spark.table(right), Seq(key))

  /** True if the plan contains a shuffle exchange — the thing bucketing
    * exists to eliminate. Runs the plan first: under AQE the adaptive
    * node hides its inner tree from `collect` until the final plan is
    * decided, so the honest check is against the post-execution tree
    * (`isFinalPlan=true`). Broadcast exchanges don't count — they move a
    * dimension table, not the corpus. */
  def hasExchange(df: DataFrame): Boolean = {
    df.count()
    "(?<!Broadcast)Exchange".r
      .findFirstIn(df.queryExecution.executedPlan.toString).isDefined
  }
}
