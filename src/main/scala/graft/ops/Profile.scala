package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** One-pass data audit: per-column row/null/distinct counts and value
  * ranges — the pre-flight check every training-data refresh runs before
  * anything expensive touches the corpus.
  *
  * All columns aggregate in a SINGLE job: one global aggregate row (the
  * per-column expressions fold into the same partial-aggregation pass, so
  * the exchange carries one row per partition), then a driver-side unpivot
  * of that single row into (column, stats) rows — constant-size work, not
  * a per-column scan. Exact `count(distinct)` is the oracle-checkable
  * default and plans through Spark's Expand (rows × audited columns in
  * the map stage, partially aggregated before the shuffle); pass
  * `approx = true` at 100 TB to swap in HyperLogLog sketches
  * (`approx_count_distinct`), which collapses the Expand back to one row
  * per partition per column.
  *
  * Ranges are reported as strings (min/max of the column's own type, cast
  * after the fact) so mixed-type frames profile into one uniform shape.
  */
object Profile {

  def profile(df: DataFrame, approx: Boolean = false): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val cols = df.schema.fields.map(_.name).toSeq
    def nd(c: String): Column =
      if (approx) approx_count_distinct(col(c)) else countDistinct(col(c))
    val aggs: Seq[Column] = cols.flatMap { c =>
      Seq(count(col(c)).as(s"__n_$c"),
        nd(c).as(s"__d_$c"),
        min(col(c)).cast("string").as(s"__min_$c"),
        max(col(c)).cast("string").as(s"__max_$c"))
    }
    val row = df.agg(count(lit(1)).as("__rows"), aggs: _*).head()
    val total = row.getAs[Long]("__rows")
    cols.map { c =>
      (c, total,
        total - row.getAs[Long](s"__n_$c"),
        row.getAs[Long](s"__d_$c"),
        Option(row.getAs[String](s"__min_$c")),
        Option(row.getAs[String](s"__max_$c")))
    }.toDF("column", "n_rows", "n_null", "n_distinct", "min_value", "max_value")
  }

  /** Per-group interpolated quantiles of a numeric column — the
    * distribution half of the audit (length/score distributions per
    * source). One aggregate job: Spark's `percentile` keeps a value→count
    * map per group, so memory scales with the DISTINCT values per group,
    * not rows — fine for bounded domains (lengths, scores, token counts)
    * at any corpus size. `approx = true` swaps in `approx_percentile`
    * (a KLL-style sketch with BOUNDED per-group memory regardless of
    * distinct values) — the escape hatch before quantiling a
    * billion-distinct-value double column at 100 TB; approximate results
    * are not oracle-comparable, so the exact path stays the default.
    * Output is long-form (group, quantile, value), quantile values
    * rounded with the engine-portable floor(x·10⁴+½)/10⁴ (the oracle's
    * quantile_cont interpolates with a different-but-equivalent formula
    * whose last ulp can differ). */
  def groupQuantiles(df: DataFrame, groupCol: String, valueCol: String,
                     qs: Seq[Double], approx: Boolean = false): DataFrame = {
    require(qs.nonEmpty && qs.forall(q => q >= 0 && q <= 1),
      "quantiles must be in [0,1]")
    val agg =
      if (approx) approx_percentile(col(valueCol), typedLit(qs), lit(10000))
      else percentile(col(valueCol), typedLit(qs))
    df.groupBy(col(groupCol))
      .agg(agg.as("__vals"))
      .select(col(groupCol), posexplode(col("__vals")))
      .select(col(groupCol),
        element_at(typedLit(qs), col("pos") + 1).as("quantile"),
        Rounding.halfUp4(col("col").cast("double")).as("value"))
  }

  /** Per-group token-distribution drift: KL(group ‖ corpus) over the
    * word-token unigram distributions — the domain-shift monitor a
    * mixture pipeline watches per source/snapshot (every group token
    * also occurs in the corpus, so no smoothing is needed and the KL is
    * finite by construction).
    *
    * Shape at scale: one (group, token) count aggregation (map-side
    * combine), corpus marginals as a window over the same lineage, the
    * two one-row totals broadcast back, and the per-group Σ p·ln(p/q)
    * folds in TOKEN order (collect/sort/fold) so the score is bit-stable
    * and oracle-replayable. The fold materializes each group's vocab as
    * one array — exact engine-portable divergence pays group-vocab
    * memory; a monitoring-only consumer can swap the fold for a plain
    * sum. Returns (groupCol, n_tokens, kl). */
  def tokenDivergence(df: DataFrame, groupCol: String,
                      textCol: String): DataFrame = {
    // no id in this op's contract: the all-atomic-column hash keeps the
    // spread deterministic (stage-reusable) without collapsing duplicate
    // texts whenever any other column (hidden row id, group) distinguishes
    val toks = graft.ops.Dedup.spread(df, graft.ops.Dedup.spreadKey(df, textCol))
      .select(col(groupCol).as("__grp"),
        explode(TextOps.tokens(col(textCol))).as("__term"))
      .filter(col("__term") =!= "")
    val counts = toks.groupBy("__grp", "__term").agg(count(lit(1)).as("__c"))
    val withMarginals = counts
      .withColumn("__ct", sum(col("__c")).over(Window.partitionBy(col("__term"))))
      .withColumn("__ng", sum(col("__c")).over(Window.partitionBy(col("__grp"))))
    val total = counts.agg(sum(col("__c")).as("__tot"))
    val p = col("__c").cast("double") / col("__ng").cast("double")
    val q = col("__ct").cast("double") / col("__tot").cast("double")
    val contrib = p * log(p / q)
    withMarginals.crossJoin(broadcast(total))
      .groupBy("__grp")
      .agg(first(col("__ng")).as("n_tokens"),
        collect_list(struct(col("__term").as("t"), contrib.as("c"))).as("__cs"))
      .select(col("__grp").as(groupCol),
        col("n_tokens").cast("long").as("n_tokens"),
        round(aggregate(array_sort(col("__cs")), lit(0.0d),
          (acc, x) => acc + x.getField("c")), 4).as("kl"))
  }

  /** Population-stability drift between two corpus versions over one
    * categorical column (source, language, license bucket…) — the
    * monitoring report a training-data refresh reads NEXT TO the id-level
    * [[Dedup.corpusDiff]]: the diff says WHICH documents moved, this says
    * whether the MIX moved (a crawl that doubled one domain's share
    * changes model behavior even if every id-level change looks benign).
    * Per value: both shares and the PSI contribution
    * (p − q)·ln(p / q) with the standard ε-floor (Yurdakul 2018's
    * recommended guard) so values present on only one side contribute a
    * large-but-finite term instead of ±∞. Σ psi is the headline score
    * (alerting folklore: < 0.1 stable, 0.1–0.25 drifting, > 0.25 shifted)
    * — returned per-value so the report also names WHO drifted.
    *
    * Shape at scale: each side collapses to a (value, count) aggregate
    * map-side (the relation is as big as the column's cardinality —
    * categorical by contract); totals ride one broadcast row each; the
    * FULL OUTER join runs over the two tiny aggregates, never corpus
    * rows. Shares and psi round to 6 decimals AFTER the arithmetic, both
    * here and in the oracle, so libm-ln last-ulp differences cannot leak
    * into the hash compare. A null category is a legal value (null-safe
    * join key), reported as its own row. */
  def mixDrift(base: DataFrame, cur: DataFrame, colName: String,
               eps: Double = 1e-6): DataFrame = {
    require(eps > 0, "eps must be positive")
    def shares(df: DataFrame, out: String): DataFrame = {
      val counts = df.groupBy(col(colName).as("value"))
        .agg(count(lit(1)).as("__n"))
      val total = counts.agg(sum(col("__n")).as("__tot"))
      counts.crossJoin(broadcast(total))
        .select(col("value"),
          (col("__n").cast("double") / col("__tot").cast("double")).as(out))
    }
    val b = shares(base, "__sb").withColumnRenamed("value", "__vb")
    val c = shares(cur, "__sc").withColumnRenamed("value", "__vc")
    val p = greatest(coalesce(col("__sc"), lit(0.0d)), lit(eps))
    val q = greatest(coalesce(col("__sb"), lit(0.0d)), lit(eps))
    b.join(c, col("__vb") <=> col("__vc"), "full_outer")
      .select(coalesce(col("__vb"), col("__vc")).as("value"),
        Rounding.halfUp(coalesce(col("__sb"), lit(0.0d)), 6).as("share_base"),
        Rounding.halfUp(coalesce(col("__sc"), lit(0.0d)), 6).as("share_cur"),
        Rounding.halfUp((p - q) * log(p / q), 6).as("psi"))
      .orderBy(col("value"))
  }
}
