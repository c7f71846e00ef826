package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic sampling operators for corpus curation. Randomness comes
  * from arithmetic hashes of a key column, never from RNG state, so
  * samples are reproducible across runs, partitionings, and engines —
  * a training-data pipeline requirement (the sample IS the dataset
  * definition) and what makes the operators oracle-checkable.
  */
object Sampling {

  /** Multiplicative hash (Knuth constant, mod a prime) — expressible
    * identically in any SQL engine, unlike xxhash64. Uniform enough for
    * sampling; NOT for adversarial inputs. The id is reduced mod p BEFORE
    * the multiply and the multiplier is pre-reduced (2654435761 ≡
    * 654435747 mod p), keeping the product under 2^63 for ANY 64-bit id —
    * the congruence gives identical values to the unreduced form, without
    * Spark's silent wraparound or DuckDB's overflow error. */
  private val P = 1000000007L
  private def orderHash(id: Column): Column =
    pmod(pmod(id.cast("long"), lit(P)) * lit(2654435761L % P), lit(P))

  /** Fail fast when a hash-keyed sampler gets a non-integral id column:
    * [[orderHash]] embeds the id via cast("long"), so a string id would
    * hash to NULL on every row — an all-null split / silently EMPTY
    * sample instead of an error. Checked statically at every public
    * entry that hashes an id (the numericColumn precedent at the xop
    * layer, enforced here so Scala-API callers fail fast too). */
  private def requireIntegralId(df: DataFrame, idCol: String,
                                what: String,
                                why: String = "the deterministic hash " +
                                  "embeds it as int64"): Unit = {
    import org.apache.spark.sql.types._
    val dt = df.select(Dedup.exactCol(idCol)).schema.head.dataType
    dt match {
      case ByteType | ShortType | IntegerType | LongType => ()
      case other => throw new IllegalArgumentException(
        s"$what requires an integral id column ($why); " +
          s"'$idCol' is ${other.simpleString}")
    }
  }

  /** Past this many weights entries, the mixture samplers stop compiling
    * the per-source lookup as a literal when/otherwise chain. Each chain
    * entry is one more CaseWhen branch — a 10k-source weights map would
    * codegen a 10k-deep Case (twice, for the epoch sampler), blowing up
    * plan size and tripping codegen's method-size fallback. Realistic
    * mixture tables are tens of sources; past the bound the lookup runs
    * as a broadcast hash join instead (same semantics, O(1) probes). */
  private[graft] val ChainLiteralMax = 100

  /** Resolve per-source long parameters for the mixture samplers: extend
    * `df` with one column per (name, weight→value) entry, where a row's
    * value comes from its source's weight (or `default` when the source
    * is absent from the map or NULL). Up to [[ChainLiteralMax]] sources
    * this compiles as a literal when/otherwise chain — every boundary an
    * exact integer in the plan, the engine-portability shape the oracle
    * SQL mirrors. Past the bound it becomes a broadcast hash join
    * against a driver-built (source → values) relation: identical
    * fall-to-default semantics (an unmatched or NULL source misses the
    * join and coalesces to the default), still map-only — the broadcast
    * ships the weights table, never shuffles the corpus. */
  private def withSourceParams(df: DataFrame, sourceCol: String,
      weights: Map[String, Double], default: Double,
      outCols: Seq[(String, Double => Long)]): DataFrame = {
    for ((n, _) <- outCols)
      require(!df.columns.contains(n), s"internal column '$n' collides")
    if (weights.size <= ChainLiteralMax) {
      outCols.foldLeft(df) { case (d, (n, f)) =>
        d.withColumn(n,
          weights.toSeq.sortBy(_._1).foldLeft(lit(f(default))) {
            case (acc, (s, w)) =>
              when(col(sourceCol) === s, lit(f(w))).otherwise(acc)
          })
      }
    } else {
      require(!df.columns.contains("__graft_src"),
        "internal column '__graft_src' collides")
      val spark = df.sparkSession
      val schema = org.apache.spark.sql.types.StructType(
        org.apache.spark.sql.types.StructField("__graft_src",
          org.apache.spark.sql.types.StringType, nullable = false) +:
        outCols.map { case (n, _) => org.apache.spark.sql.types.StructField(
          n, org.apache.spark.sql.types.LongType, nullable = false) })
      val rows = weights.toSeq.sortBy(_._1).map { case (s, w) =>
        org.apache.spark.sql.Row.fromSeq(s +: outCols.map(_._2(w)))
      }
      import scala.jdk.CollectionConverters._
      val wdf = spark.createDataFrame(rows.asJava, schema)
      val joined = df.join(broadcast(wdf),
        col(sourceCol) === col("__graft_src"), "left")
      outCols.foldLeft(joined) { case (d, (n, f)) =>
        d.withColumn(n, coalesce(col(n), lit(f(default))))
      }.drop("__graft_src")
    }
  }

  /** Keep the `k` hash-smallest rows per stratum — a deterministic uniform
    * sample without replacement, stratified by `stratumCol`. Plans as
    * row_number over (stratum, hash) bounded by k, which Spark executes
    * with WindowGroupLimit: each map task keeps only its local top-k per
    * stratum BEFORE the shuffle, so the exchange carries O(k × strata ×
    * tasks) rows, not the corpus. */
  def stratifiedTopK(df: DataFrame, stratumCol: String, idCol: String,
                     k: Int): DataFrame = {
    requireIntegralId(df, idCol, "stratifiedTopK")
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(orderHash(col(idCol)), col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Keep the `k` BEST rows per group by a score column — the curation
    * stage that keeps the highest-quality N documents per domain/source.
    * Same WindowGroupLimit shape as stratifiedTopK (map tasks keep their
    * local top-k per group before the shuffle). The rank key is the score
    * ROUNDED to 6 with an id tie-break, so last-ulp float differences
    * between engines or aggregation orders never decide membership. */
  def topKByScore(df: DataFrame, groupCol: String, idCol: String,
                  scoreCol: String, k: Int): DataFrame = {
    val w = Window.partitionBy(col(groupCol))
      .orderBy(round(col(scoreCol), 6).desc, col(idCol))
    df.withColumn("__rk", row_number().over(w))
      .filter(col("__rk") <= k)
      .drop("__rk")
  }

  /** Deterministic named splits (train/val/test) by id hash: a row lands
    * in split i iff hash(id) falls in [P·cum_{i-1}, P·cum_i). Map-only, no
    * RNG, and CONSISTENT with fractionByHash — a fraction-f sample is
    * exactly the union of the leading splits up to weight f, so a sample
    * drawn for evaluation can never straddle a later split of the same
    * table. Weights may sum below 1; leftover rows get a null split
    * (deliberately unassigned). */
  def splitByHash(df: DataFrame, idCol: String,
                  splits: Seq[(String, Double)]): DataFrame = {
    requireIntegralId(df, idCol, "splitByHash")
    df.withColumn("split", splitCase(orderHash(col(idCol)), splits))
  }

  /** The split CASE chain shared by every split form: cumulative
    * thresholds as exact integer literals in the plan (engines disagree
    * on double→int cast rounding — same rule as fractionByHash) over an
    * already-hashed key. Validates the weights. */
  private def splitCase(h: Column, splits: Seq[(String, Double)]): Column = {
    require(splits.nonEmpty, "at least one split required")
    require(splits.forall(_._2 >= 0), "split weights must be >= 0")
    require(splits.map(_._2).sum <= 1.0 + 1e-9, "split weights must sum to <= 1")
    val bounds = splits.map(_._2).scanLeft(0.0)(_ + _).tail
      .map(f => math.floor(P * math.min(f, 1.0)).toLong)
    splits.zip(bounds).foldRight(lit(null).cast("string")) {
      case (((name, _), bound), els) => when(h < lit(bound), lit(name)).otherwise(els)
    }
  }

  /** LEAKAGE-FREE named splits over EXACT-duplicate classes: documents
    * with identical normalized text always land in the SAME split, so a
    * test set can never contain a verbatim copy of a training document —
    * the contamination path a plain per-id split leaves open whenever the
    * corpus carries duplicates (crawls always do). The class key is the
    * md5 content fingerprint ([[graft.ops.TextOps.fingerprintMd5]], the
    * exact-dedup key), the class REPRESENTATIVE is the minimum id (the
    * row [[graft.ops.Dedup.exactByText]] keeps), and the split is
    * [[splitByHash]]'s hash OF THE REPRESENTATIVE — so a document with no
    * duplicates keeps exactly the label splitByHash gives it: turning
    * leakage protection on re-labels ONLY duplicated documents, never
    * churning the split of the unduplicated bulk. Null texts share one
    * class (the exactByText convention).
    *
    * Plan shape: ONE exchange — the corpus hash-partitions by the
    * fingerprint for the window min; the split label is then a map-side
    * CASE. (A zero-shuffle variant would hash the fingerprint itself, but
    * it loses the singleton-consistency property above and a portable
    * numeric hash of hex text; one fingerprint exchange is the same cost
    * class as the exact dedup this split guards.) */
  def splitLeakFreeExact(df: DataFrame, idCol: String, textCol: String,
                         splits: Seq[(String, Double)]): DataFrame = {
    requireIntegralId(df, idCol, "splitLeakFreeExact")
    val fp = graft.ops.TextOps.fingerprintMd5(Dedup.exactCol(textCol))
    val rep = min(Dedup.exactCol(idCol)).over(Window.partitionBy(fp))
    df.withColumn("split", splitCase(orderHash(rep), splits))
  }

  /** LEAKAGE-FREE named splits over an EXPLICIT class relation
    * `(id, cluster)` — [[graft.ops.Dedup.duplicateClusters]]' output
    * shape, so ANY near-dup family's pair relation (shingle-Jaccard,
    * MinHash, SimHash, embedding-cosine, or their weighted forms) can
    * drive the split: the whole connected component hashes on its
    * cluster label (the component's minimum id) and lands in one split.
    * Rows absent from `clusters` are singletons and hash their own id —
    * identical to [[splitByHash]], so protection re-labels only the
    * paired minority. `clusters` holds only ids that appear in a pair
    * (≪ corpus); the left join broadcasts when it is small and AQE picks
    * the shuffled form past the threshold — either way the corpus side
    * is touched once, map-side. */
  /** [[splitByClass]] composed with [[splitLeakFreeExact]]'s collapse —
    * the split form for the WEIGHTED (collapse-first) near-dup
    * pipelines, where the pair relation holds only exact-class
    * REPRESENTATIVES: each document first collapses to its exact class's
    * min-id representative by content fingerprint, the representative
    * looks up its near-dup component in `clusters`
    * (weighted pairs → [[graft.ops.Dedup.duplicateClusters]]), and every
    * member hashes on coalesce(cluster(rep), rep). So the FULL family —
    * exact copies AND near-dup links — lands in one split, while a
    * document that is neither duplicated nor paired keeps exactly its
    * plain [[splitByHash]] label (rep = own id, no cluster row). Plan:
    * the one fingerprint exchange plus the broadcastable cluster join —
    * the same cost class as the weighted collapse it rides behind. */
  def splitByClassExact(df: DataFrame, idCol: String, textCol: String,
                        clusters: DataFrame,
                        splits: Seq[(String, Double)]): DataFrame = {
    requireIntegralId(df, idCol, "splitByClassExact")
    requireIntegralId(clusters, "cluster", "splitByClassExact (cluster labels)")
    requireIntegralId(clusters, "id", "splitByClassExact (clusters id)",
      "it equi-joins against the representative id, which must compare exactly")
    val fp = graft.ops.TextOps.fingerprintMd5(Dedup.exactCol(textCol))
    val rep = min(Dedup.exactCol(idCol)).over(Window.partitionBy(fp))
    val cls = clusters.select(col("id").as("__cls_id"),
      col("cluster").as("__cls"))
    df.withColumn("__rep", rep)
      .join(cls, col("__rep") === col("__cls_id"), "left")
      .withColumn("split",
        splitCase(orderHash(coalesce(col("__cls"), col("__rep"))), splits))
      .drop("__cls_id", "__cls", "__rep")
  }

  def splitByClass(df: DataFrame, idCol: String, clusters: DataFrame,
                   splits: Seq[(String, Double)]): DataFrame = {
    requireIntegralId(df, idCol, "splitByClass")
    requireIntegralId(clusters, "cluster", "splitByClass (cluster labels)")
    // the join key too: a non-integral clusters.id would type-coerce the
    // df.id === __cls_id comparison (long vs string promotes to double),
    // silently mis-joining ids above 2^53 instead of failing fast
    requireIntegralId(clusters, "id", "splitByClass (clusters id)",
      "it equi-joins against the corpus id, which must compare exactly")
    val cls = clusters.select(col("id").as("__cls_id"),
      col("cluster").as("__cls"))
    df.join(cls, Dedup.exactCol(idCol) === col("__cls_id"), "left")
      .withColumn("split",
        splitCase(orderHash(coalesce(col("__cls"), Dedup.exactCol(idCol))), splits))
      .drop("__cls_id", "__cls")
  }

  /** Keep ~`fraction` of rows, deterministically: hash(id) mod D < D·p.
    * Map-only — no shuffle, no RNG; the same row set survives any
    * re-partitioning or re-run. */
  def fractionByHash(df: DataFrame, idCol: String, fraction: Double): DataFrame = {
    requireIntegralId(df, idCol, "fractionByHash")
    require(fraction >= 0 && fraction <= 1, "fraction must be in [0,1]")
    // threshold computed driver-side so the boundary is one exact integer
    // literal in the plan (engines disagree on double→int cast rounding)
    df.filter(orderHash(col(idCol)) < lit(math.floor(P * fraction).toLong))
  }

  /** Source-mixture sampling: keep a per-source fraction of rows
    * (`weights(source)`, `default` for unlisted sources) — how a training
    * mix up/down-weights corpora. The same id hash gates every source, so
    * raising a weight strictly grows that source's sample (nested samples:
    * the 10% set is a subset of the 50% set) and the mix stays
    * reproducible under re-partitioning and re-runs. Map-only: the
    * weights become a literal CASE chain, no shuffle, no RNG. */
  /** Token-budget sampling: within each source, take documents in hash
    * order until the running token total exceeds `budget` — how a
    * training mix caps each corpus at a token (not document) quota while
    * staying reproducible (the hash order is the dataset definition, so
    * a bigger budget strictly extends the sample it took at a smaller
    * one). Token counts are exact longs, so the cut-off is
    * engine-portable.
    *
    * The per-source running total is a DISTRIBUTED two-level prefix sum
    * (the Packing.packSequences shape): a window partitioned by SOURCE
    * alone funnels each source — possibly most of a 100 TB corpus —
    * through one task. Instead the hash range splits into coarse shards
    * (hash div shardSize, monotone in the hash order), per-(source,
    * shard) windows run in parallel, and shard totals roll up in a tiny
    * per-source window whose offsets broadcast back. Null-safe join keys:
    * a null source is a legal group. */
  def tokenBudgetByHash(df: DataFrame, idCol: String, sourceCol: String,
                        tokensCol: Column, budget: Long,
                        shardSize: Long = 1000000L): DataFrame = {
    require(shardSize > 0, "shardSize must be positive")
    requireIntegralId(df, idCol, "tokenBudgetByHash")
    val base = df
      .withColumn("__h", orderHash(col(idCol)))
      .withColumn("__shard", expr(s"__h div ${shardSize}L"))
      .withColumn("__tok", tokensCol.cast("long"))
    val local = base.withColumn("__local", sum(col("__tok")).over(
      Window.partitionBy(col(sourceCol), col("__shard"))
        .orderBy(col("__h"), col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = base.groupBy(col(sourceCol).as("__osrc"), col("__shard").as("__oshard"))
      .agg(sum(col("__tok")).as("__total"))
      .withColumn("__offset",
        coalesce(sum(col("__total")).over(
          Window.partitionBy(col("__osrc")).orderBy(col("__oshard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__oshard"), col("__offset"))
    local.join(broadcast(offsets),
        col(sourceCol) <=> col("__osrc") && col("__shard") === col("__oshard"))
      .withColumn("__cum_tokens", col("__offset") + col("__local"))
      .filter(col("__cum_tokens") <= budget)
      .drop("__h", "__shard", "__tok", "__local", "__osrc", "__oshard", "__offset")
  }

  /** Deterministic weighted sample WITHOUT replacement (Efraimidis &
    * Spirakis 2006): each row draws a hash-uniform u ∈ (0, 1] from its
    * id and ranks by key = u^(1/w); the k largest keys are a weighted
    * sample without replacement — selection probability proportional to
    * weight, reproducible across runs, partitionings, and engines (the
    * module's hash-not-RNG policy: the sample IS the dataset
    * definition). The quality-weighted corpus draw: w = a quality score
    * or a length.
    *
    * Rows with null, NaN or non-positive weight are never selected (NaN
    * needs its own guard: Spark ORDERS NaN above every double, so it
    * passes a bare `> 0` filter and u^(1/NaN) = NaN would then sort
    * ahead of every real key). Plans as
    * TakeOrderedAndProject (per-partition partial top-k — only k rows
    * per partition reach the driver; the corpus never sorts globally).
    * The rank key rounds to 9 decimals with an id tie-break so libm pow
    * last-ulp differences can never flip membership between engines. */
  def weightedByHash(df: DataFrame, idCol: String, weightCol: String,
                     k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    requireIntegralId(df, idCol, "weightedByHash")
    val u = (orderHash(col(idCol)) + lit(1L)).cast("double") /
      lit((P + 1).toDouble)
    val w = col(weightCol).cast("double")
    df.filter(w > 0 && !isnan(w))
      .withColumn("__wk", Rounding.halfUp(pow(u, lit(1.0) / w), 9))
      .orderBy(col("__wk").desc, col(idCol))
      .limit(k)
      .drop("__wk")
  }

  def mixtureByHash(df: DataFrame, idCol: String, sourceCol: String,
                    weights: Map[String, Double],
                    default: Double = 0.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(w => w >= 0 && w <= 1),
      "weights must be in [0,1]")
    requireIntegralId(df, idCol, "mixtureByHash")
    withSourceParams(df, sourceCol, weights, default,
      Seq("__thr" -> (w => math.floor(P * w).toLong)))
      .filter(orderHash(col(idCol)) < col("__thr"))
      .drop("__thr")
  }

  /** Training-mix EPOCH resampling — [[mixtureByHash]] generalized past
    * weight 1: a source with weight w = m + f (m = ⌊w⌋) contributes m
    * full copies of every row (epoch 0..m−1) plus a deterministic
    * hash-fraction-f sample as epoch m — upsampling a small high-quality
    * corpus (wiki ×2.5) while downsampling a big one (crawl ×0.3) in the
    * SAME pass, the mix-application stage of a training-data pipeline.
    * The fractional epoch uses the same id-hash gate as
    * [[mixtureByHash]]/[[fractionByHash]]: weights ≤ 1 reduce to
    * mixtureByHash's row set exactly (as epoch 0 — pinned in tests),
    * raising a weight strictly extends the sample, and the output is
    * identical under any partitioning or re-run. The `epoch` column
    * keeps copies distinguishable for downstream packing/shuffling.
    *
    * Shape at scale: map-only plus a row-local bounded explode — no
    * shuffle, no RNG (past [[ChainLiteralMax]] sources the per-source
    * lookup rides a broadcast hash join instead of a literal CASE
    * chain; still map-only). The explode multiplies rows by at most
    * ⌈max weight⌉; the [0, 1000] guard keeps a fat-fingered weight from
    * quietly scheduling a 10^9-fold blow-up. */
  def mixtureEpochsByHash(df: DataFrame, idCol: String, sourceCol: String,
                          weights: Map[String, Double],
                          default: Double = 1.0): DataFrame = {
    require((weights.values ++ Seq(default)).forall(w => w >= 0 && w <= 1000),
      "weights must be in [0,1000]")
    requireIntegralId(df, idCol, "mixtureEpochsByHash")
    // two per-source parameters (full copies; fractional-epoch
    // threshold), both resolved driver-side so every boundary is one
    // exact integer in the plan — the engine-portability rule every hash
    // sampler follows; past ChainLiteralMax sources the lookup joins
    // instead of chaining (see withSourceParams)
    val resolved = withSourceParams(df, sourceCol, weights, default, Seq(
      "__full" -> (w => math.floor(w).toLong),
      "__fracThr" -> (w => math.floor(P * (w - math.floor(w))).toLong)))
    val n = col("__full") +
      when(orderHash(col(idCol)) < col("__fracThr"), lit(1L)).otherwise(lit(0L))
    resolved.withColumn("__n", n)
      .filter(col("__n") > 0)
      .withColumn("epoch", explode(sequence(lit(0L), col("__n") - 1)))
      .drop("__n", "__full", "__fracThr")
  }

  /** Mixture-weight SOLVER — the planning stage that PRODUCES
    * [[mixtureEpochsByHash]]'s weights map: given the corpus's
    * per-source token supply and a target mix (source → share of a
    * token budget), the weight that hits each target is
    * `share · budget / supply` epochs of that source. The output is the
    * mix plan a pipeline reviews before applying: supply, the
    * uncapped `weight_needed`, the applicable `weight` (capped at
    * `maxWeight`, the same [0, 1000] bound the epoch sampler enforces),
    * and an honest `status` — `ok`, `capped` (the target is not
    * reachable without more than maxWeight epochs: upsampling a tiny
    * source 500× is a data-quality decision, not a default), or
    * `no_supply` (a targeted source absent from the corpus — the typo
    * tripwire). Token supply is [[TextOps.tokenCount]], the same unit
    * the packing/budget operators use.
    *
    * Shape at scale: one map-side tokenCount pass partial-combining
    * into a per-source aggregate (group-count-sized), then a full-outer
    * join against the driver-built targets relation — both sides tiny
    * post-aggregation, so the join is trivially broadcast; the corpus
    * never shuffles. Weights round HALF_UP to 6 (engine-portable).
    * Sources in the corpus but not targeted read share 0 / weight 0:
    * the mix DROPS unlisted sources, matching the epoch sampler's
    * explicit-default contract. */
  def mixtureWeights(df: DataFrame, sourceCol: String, textCol: String,
                     targets: Map[String, Double], budgetTokens: Long,
                     maxWeight: Double = 1000.0): DataFrame = {
    require(budgetTokens > 0, "budgetTokens must be positive")
    require(targets.nonEmpty, "targets must be non-empty")
    require(targets.values.forall(s => s >= 0 && !s.isNaN && !s.isInfinite),
      "target shares must be finite and >= 0")
    require(maxWeight > 0 && maxWeight <= 1000,
      "maxWeight must be in (0, 1000] (mixtureEpochsByHash's weight bound)")
    val spark = df.sparkSession
    import spark.implicits._
    val supply = df.groupBy(col(sourceCol).as("source"))
      .agg(sum(TextOps.tokenCount(col(textCol)).cast("long"))
        .as("available_tokens"))
    val tgt = targets.toSeq.sortBy(_._1).toDF("source", "target_share")
    val need = col("target_share") * lit(budgetTokens.toDouble) /
      col("available_tokens")
    supply.join(tgt, Seq("source"), "full_outer")
      .select(col("source"),
        coalesce(col("available_tokens"), lit(0L)).as("available_tokens"),
        coalesce(col("target_share"), lit(0.0)).as("target_share"))
      .select(col("source"), col("available_tokens"), col("target_share"),
        when(col("available_tokens") > 0, Rounding.halfUp(need, 6))
          .as("weight_needed"),
        when(col("available_tokens") > 0,
            Rounding.halfUp(least(need, lit(maxWeight)), 6))
          .otherwise(lit(0.0)).as("weight"),
        when(col("available_tokens") === 0 && col("target_share") > 0,
            lit("no_supply"))
          .when(col("available_tokens") > 0 && need > lit(maxWeight),
            lit("capped"))
          .otherwise(lit("ok")).as("status"))
  }

  /** Per-group adaptive quantile band filter: keep rows whose `valueCol`
    * lies inside their OWN group's [lo, hi] interpolated quantile band —
    * the outlier filter that adapts to each source/domain instead of one
    * global threshold (a 10 kB doc is normal for books, anomalous for
    * chat logs). Inclusive bounds; a NULL group is a legal group (module
    * convention — the join back is null-safe).
    *
    * Shape at scale: one per-group percentile aggregate (groups ≪ rows —
    * the bounds relation is group-count-sized, so AQE broadcasts it) and
    * a map-side band comparison on the join back; the corpus itself
    * never shuffles. Like [[Profile.groupQuantiles]], the exact
    * percentile buffers each group's value multiset — fine for the
    * bounded-cardinality columns outlier bands are cut on (lengths,
    * counts); `approx = true` swaps in `approx_percentile` (bounded
    * sketch memory per group) before banding a billion-distinct-value
    * double column at 100 TB. Approximate bounds are not
    * oracle-comparable, so exact stays the default.
    *
    * Bounds are floor-rounded to 4 decimals BEFORE comparing, on both
    * this side and the oracle: engines interpolate quantiles with
    * different-but-equivalent formulas whose last ulp can differ, and a
    * raw-double bound one ulp either side of an integer order statistic
    * would flip that integer's membership per engine. After identical
    * rounding the bound is the same number everywhere. */
  def quantileBandFilter(df: DataFrame, groupCol: String, valueCol: String,
                         lo: Double, hi: Double,
                         approx: Boolean = false): DataFrame = {
    require(lo >= 0 && hi <= 1 && lo <= hi, "band must satisfy 0 <= lo <= hi <= 1")
    def snap(c: Column): Column = Rounding.halfUp4(c.cast("double"))
    val qAgg =
      if (approx) approx_percentile(col(valueCol), typedLit(Seq(lo, hi)), lit(10000))
      else percentile(col(valueCol), typedLit(Seq(lo, hi)))
    val bounds = df.groupBy(col(groupCol).as("__g"))
      .agg(qAgg.as("__b"))
      .select(col("__g"), snap(element_at(col("__b"), 1)).as("__lo"),
        snap(element_at(col("__b"), 2)).as("__hi"))
    df.join(bounds, df(groupCol) <=> bounds("__g"))
      .filter(col(valueCol) >= col("__lo") && col(valueCol) <= col("__hi"))
      .select(df.columns.toSeq.map(df(_)): _*) // original columns and order
  }

  /** Shard count for the budget-selection classification prefix:
    * explicit when positive, else the cluster's default parallelism
    * floored at 16 — the shard count scales with how many window tasks
    * the cluster can actually run, the same way a global orderBy's
    * range partitioning does. */
  private def resolveClassifyShards(df: DataFrame, requested: Int): Int =
    if (requested > 0) requested
    else math.max(df.sparkSession.sparkContext.defaultParallelism, 16)

  /** The classification stage of [[budgetSelect]], pre-collect, exposed
    * (private[graft]) for the plan-shape guard: per-distinct-priority
    * token totals with their DESC running prefix (`__p`, `__gtot`,
    * `__before`), computed as a two-level range-shard prefix so NO
    * unpartitioned window consumes a relation unbounded in corpus size
    * — the distinct-priority relation is corpus-sized when the priority
    * is a raw classifier double. Level 0: the relation is
    * range-partitioned into `nShards` contiguous priority ranges with
    * boundaries picked by Spark's range-partition sampler (balanced
    * even when scores cluster in a narrow band, where a stateless
    * `floor(p*2^k)` bucketing would collapse into one bucket); the
    * physical partition id becomes the shard key — monotone (higher
    * shard id = strictly lower priorities) because range partitions are
    * contiguous. Level 1: per-shard running prefixes are parallel
    * windows PARTITIONED by the shard id. Level 2: shard totals roll up
    * in one window over ≤ nShards rows — bounded by construction, the
    * only unpartitioned window here, and its sort key is the shard id,
    * never the priority. `base` must carry a `tokens` long column.
    *
    * Both levels derive from ONE `sharded` relation, and correctness of
    * `__before` requires both plan branches (the offsets rollup and the
    * windowed prefix) to see the SAME shard assignment — so `sharded`
    * (partition ids already materialized as column data) is pinned with
    * a persist for the duration of `consume`, never left to physical
    * exchange reuse: with reuse disabled or canonicalization diverging,
    * each branch would re-sample RangePartitioner bounds independently
    * and rows could silently land in different shards per branch. The
    * callers consume the classified relation with one bounded collect,
    * so the pin is released before this method returns (disk-spillable,
    * and the relation is the per-priority aggregate, not the corpus). */
  private[graft] def classifyCrossing[T](base: DataFrame, priorityCol: String,
      nShards: Int)(consume: DataFrame => T): T = {
    val perP = base.groupBy(col(priorityCol).as("__p"))
      .agg(sum(col("tokens")).as("__gtot"))
    val sharded = perP.repartitionByRange(nShards, col("__p").desc)
      .withColumn("__pshard", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try consume(classifiedFrom(sharded))
    finally sharded.unpersist(false)
  }

  private def classifiedFrom(sharded: DataFrame): DataFrame = {
    val offsets = sharded.groupBy(col("__pshard").as("__oshard"))
      .agg(sum(col("__gtot")).as("__stot"))
      .withColumn("__soffset",
        coalesce(sum(col("__stot")).over(
          Window.orderBy(col("__oshard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__oshard"), col("__soffset"))
    sharded.withColumn("__lbefore",
        coalesce(sum(col("__gtot")).over(
          Window.partitionBy(col("__pshard")).orderBy(col("__p").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(broadcast(offsets), col("__pshard") === col("__oshard"))
      .withColumn("__before", col("__soffset") + col("__lbefore"))
  }

  /** [[classifyCrossing]] vectorized over sources, for
    * [[budgetSelectBySource]]: per-(source, priority) totals with the
    * per-source DESC running prefix and the source's budget carried
    * through (`__src`, `__p`, `__gtot`, `__b`, `__before`). Range
    * sharding is over the composite (source, priority DESC) key, so a
    * source spans a CONTIGUOUS run of shards: the (source, shard) pair
    * relation has at most nShards + #sources rows and each source's
    * slice of it is ≤ nShards rows — the rollup window's per-partition
    * bound, again by construction. The offsets join is deliberately
    * un-hinted: AQE broadcasts it in the categorical-source case, and a
    * non-categorical source (the user-contract violation the crossing
    * collect fail-fasts on) degrades to a shuffle join instead of an
    * OOM-ing forced broadcast. `base` must carry `tokens` and
    * `__budget` long columns. Shard-assignment consistency across the
    * two plan branches is pinned by the same persist-for-consume
    * bracket as [[classifyCrossing]]. */
  private[graft] def classifyCrossingBySource[T](base: DataFrame,
      sourceCol: String, priorityCol: String, nShards: Int)
      (consume: DataFrame => T): T = {
    val perSP = base
      .groupBy(col(sourceCol).as("__src"), col(priorityCol).as("__p"))
      .agg(sum(col("tokens")).as("__gtot"), first(col("__budget")).as("__b"))
    val sharded = perSP
      .repartitionByRange(nShards, col("__src"), col("__p").desc)
      .withColumn("__pshard", spark_partition_id())
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    try consume(classifiedBySourceFrom(sharded))
    finally sharded.unpersist(false)
  }

  private def classifiedBySourceFrom(sharded: DataFrame): DataFrame = {
    val offsets = sharded
      .groupBy(col("__src").as("__osrc"), col("__pshard").as("__oshard"))
      .agg(sum(col("__gtot")).as("__stot"))
      .withColumn("__soffset",
        coalesce(sum(col("__stot")).over(
          Window.partitionBy(col("__osrc")).orderBy(col("__oshard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__oshard"), col("__soffset"))
    sharded.withColumn("__lbefore",
        coalesce(sum(col("__gtot")).over(
          Window.partitionBy(col("__src"), col("__pshard"))
            .orderBy(col("__p").desc)
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .join(offsets, col("__src") <=> col("__osrc") &&
        col("__pshard") === col("__oshard"))
      .withColumn("__before", col("__soffset") + col("__lbefore"))
  }

  /** Quality-ranked token-budget selection — "take the BEST documents
    * until the budget is spent", the curation move that assembles a
    * fixed-size training set from a scored corpus (score = a quality
    * classifier, a dedup-survivor priority, an edu-value rating).
    * Documents are consumed in (priority DESC, id ASC) order; a document
    * is selected iff the running token total THROUGH it stays ≤ `budget`
    * (so once the budget is crossed nothing later gets in, zero-token
    * rows included — the prefix property that makes the selection a
    * dataset definition rather than a heuristic). Differs from
    * [[tokenBudgetByHash]] exactly in the order key: hash order samples
    * the distribution, priority order CHOOSES the top of it.
    *
    * Shape at scale — the naive form is one global window ordered by
    * (priority DESC, id), which funnels the corpus through a single
    * task. Instead the selection decomposes around the ONE priority
    * value where the budget runs out, and that crossing point is a
    * SINGLE ROW, which this operator collects (the module's confined-
    * collect policy: a bounded — here ≤ 1-row — driver fetch, the same
    * license the quantizer builds and oversized-bucket guards use):
    *   1. per-exact-priority token totals (map-side-combined aggregate;
    *      the relation is as big as the number of DISTINCT priority
    *      values — corpus-sized when the priority is a raw classifier
    *      double, so NOTHING here may assume it is small), classified
    *      by the same two-level prefix the boundary tie group uses,
    *      applied to the PRIORITY axis: the distinct-priority relation
    *      is range-sharded ([[classifyShards]] contiguous priority
    *      ranges, boundaries picked by Spark's range-partition sampler
    *      — the balance mechanism a global orderBy already trusts, so
    *      no stateless `floor(p·2^k)` bucketing that collapses when
    *      scores cluster in a narrow band), per-shard running totals
    *      are parallel windows PARTITIONED by the shard id, and shard
    *      totals roll up in one window over ≤ classifyShards rows —
    *      bounded by construction, the only unpartitioned window in
    *      the operator. The at-most-one boundary row (the first group
    *      that does not fully fit — its priority and the tokens spent
    *      before it) comes back to the driver. Collecting it, rather than
    *      broadcast-joining the classified relation, turns every
    *      downstream consumer into a LITERAL comparison that pushes
    *      into the parquet scan and executes exactly once — the
    *      broadcast form re-ran this corpus aggregation under each of
    *      its three consumers (the x63b stage-reuse trap, dodged by
    *      making the shared state one number instead of one subtree).
    *   2. no boundary ⇒ everything fits: the corpus IS the selection.
    *   3. fully-in rows are `priority > boundary` — a pushed-down
    *      map-only filter; no per-row running total is ever computed
    *      for them. Priorities below the boundary never leave the scan.
    *   4. only the boundary priority's rows — one tie group, reached by
    *      a pushed-down equality — need an exact prefix sum, and within
    *      one priority the order is pure id, so the [[Packing]]
    *      two-level id-shard prefix applies: per-(id div shardSize)
    *      windows in parallel, shard totals rolled up in a tiny window,
    *      offsets broadcast back, the remaining budget a literal. A
    *      million-way tie on the boundary score costs parallel
    *      shard-local windows, never a single-task sort.
    *
    * Rows with a null id or null priority are never selected (they have
    * no place in the order); negative token counts are rejected by a
    * kept-in-plan guard on the boundary group and treated as impossible
    * elsewhere (token counters are non-negative by construction).
    * Returns the selected rows as (idCol, priorityCol, tokens), ordered
    * by id. `idCol` must be unique and integral (it is both the
    * tie-break and the `id div shardSize` shard key, so it must divide
    * exactly — a double id would truncate shard boundaries). */
  def budgetSelect(df: DataFrame, idCol: String, priorityCol: String,
                   tokensCol: Column, budget: Long,
                   shardSize: Long = 1000000L,
                   classifyShards: Int = 0): DataFrame = {
    require(budget >= 0, "budget must be >= 0")
    require(shardSize > 0, "shardSize must be positive")
    requireIntegralId(df, idCol, "budgetSelect",
      "it is the tie-break and the id-div shard key, which must divide exactly")
    val base = df
      .filter(col(idCol).isNotNull && col(priorityCol).isNotNull)
      .select(col(idCol), col(priorityCol),
        coalesce(tokensCol.cast("long"), lit(0L)).as("tokens"))
    // 1: per-priority totals classified by the two-level range-shard
    // prefix (never a single-task window over the distinct-priority
    // relation); fetch the at-most-one crossing row.
    val boundary = classifyCrossing(base, priorityCol,
        resolveClassifyShards(df, classifyShards)) { classified =>
      classified
        .filter(col("__before") + col("__gtot") > lit(budget) &&
          col("__before") <= lit(budget))
        .select(col("__p"), col("__before"))
        .collect()
    }
    boundary.headOption match {
      case None =>
        // 2: the whole corpus fits.
        base.orderBy(col(idCol))
      case Some(row) =>
        val bp = lit(row.get(0))
        val remaining = budget - row.getLong(1)
        // 3: strictly-better priorities — map-only, filter pushed down.
        val fullIn = base.filter(col(priorityCol) > bp)
        // 4: the boundary tie group — Packing-shaped two-level prefix
        // by id against the literal remaining budget.
        val bnd = base.filter(col(priorityCol) === bp)
          .withColumn("__shard",
            expr(s"CAST(`$idCol` AS BIGINT) div ${shardSize}L"))
        val local = bnd.withColumn("__local", sum(col("tokens")).over(
          Window.partitionBy(col("__shard")).orderBy(col(idCol))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        val offsets = bnd.groupBy(col("__shard").as("__oshard"))
          .agg(sum(col("tokens")).as("__total"))
          .withColumn("__offset",
            coalesce(sum(col("__total")).over(
              Window.orderBy(col("__oshard"))
                .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
          .select(col("__oshard"), col("__offset"))
        val bndIn = local
          .join(broadcast(offsets), col("__shard") === col("__oshard"))
          .withColumn("__guard", assert_true(col("tokens") >= 0,
            lit("budgetSelect: token counts must be non-negative")))
          .filter(col("__guard").isNull &&
            col("__offset") + col("__local") <= lit(remaining))
          .select(col(idCol), col(priorityCol), col("tokens"))
        fullIn.unionByName(bndIn).orderBy(col(idCol))
    }
  }

  /** Per-source [[budgetSelect]] — the form a mixture actually ships:
    * each source takes its OWN best documents under its OWN token
    * budget ("wiki: best 30B tokens, crawl: best 200B"), the per-corpus
    * quality cutoff a solved mix ([[mixtureWeights]]) turns into a
    * dataset. Selection order and the prefix rule are per source:
    * within a source, documents are consumed (priority DESC, id ASC)
    * and selected while the source's running token total stays ≤ its
    * budget. Sources absent from `budgets` get `defaultBudget` (0 =
    * unlisted sources contribute nothing — the mixture convention); a
    * null source is a legal group and reads the default.
    *
    * Shape at scale — [[budgetSelect]]'s crossing-point decomposition,
    * vectorized over sources: per-(source, priority) totals classify
    * via the two-level (source, priority)-range-shard prefix
    * ([[classifyCrossingBySource]] — parallel shard windows, per-source
    * rollups bounded at the shard count, never a window over one
    * source's full distinct-priority relation); every source's
    * at-most-one crossing row comes back in ONE bounded collect
    * (fail-fast past 10000 sources — the corpus-contract bound the
    * oversized-bucket guards use), broadcast back as a tiny boundary
    * map. Fully-in rows are a map-only broadcast-join filter (a source
    * with no boundary row fits entirely); only the per-source boundary
    * tie groups pay the [[Packing]]-shaped prefix, partitioned by
    * (source, id-shard) so a million-way tie in one source still
    * spreads across shard tasks. Rows with null id or priority are
    * never selected. Returns (idCol, sourceCol, priorityCol, tokens),
    * ordered by id. */
  def budgetSelectBySource(df: DataFrame, idCol: String, sourceCol: String,
                           priorityCol: String, tokensCol: Column,
                           budgets: Map[String, Long],
                           defaultBudget: Long = 0L,
                           shardSize: Long = 1000000L,
                           classifyShards: Int = 0): DataFrame = {
    require((budgets.values ++ Seq(defaultBudget)).forall(_ >= 0),
      "budgets must be >= 0")
    // the per-source parameter plumbing rides a Double and 2^53 is where
    // longs stop round-tripping through one
    require((budgets.values ++ Seq(defaultBudget)).forall(_ <= (1L << 53)),
      "budgets must be <= 2^53")
    require(shardSize > 0, "shardSize must be positive")
    requireIntegralId(df, idCol, "budgetSelectBySource",
      "it is the tie-break and the id-div shard key, which must divide exactly")
    val base0 = df
      .filter(col(idCol).isNotNull && col(priorityCol).isNotNull)
      .select(col(idCol), col(sourceCol), col(priorityCol),
        coalesce(tokensCol.cast("long"), lit(0L)).as("tokens"))
    val base = withSourceParams(base0, sourceCol,
      budgets.view.mapValues(_.toDouble).toMap, defaultBudget.toDouble,
      Seq("__budget" -> (_.toLong)))
    // per-(source, priority) totals, classified per source by the
    // two-level range-shard prefix; fetch every source's at-most-one
    // crossing row in one bounded collect
    val crossing = classifyCrossingBySource(base, sourceCol, priorityCol,
        resolveClassifyShards(df, classifyShards)) { classified =>
      classified
        .filter(col("__before") + col("__gtot") > col("__b") &&
          col("__before") <= col("__b"))
        .select(col("__src"), col("__p"),
          (col("__b") - col("__before")).as("__rem"))
        .limit(10001)
        .collect()
    }
    require(crossing.length <= 10000,
      "more than 10000 sources have a budget crossing point — the source " +
        "column is not categorical; group it first")
    val spark = df.sparkSession
    val bSchema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("__src",
        base.schema(sourceCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__p",
        base.schema(priorityCol).dataType, nullable = true),
      org.apache.spark.sql.types.StructField("__rem",
        org.apache.spark.sql.types.LongType, nullable = false)))
    import scala.jdk.CollectionConverters._
    val bmap = spark.createDataFrame(crossing.toSeq.asJava, bSchema)
    val joined = base.join(broadcast(bmap), col(sourceCol) <=> col("__src"), "left")
    // map-only: no crossing row means the source fits entirely (a
    // zero/exhausted budget always produces a crossing row at the top
    // priority, with __rem admitting only zero-token prefixes);
    // otherwise keep what sits strictly above the boundary priority
    val fullIn = joined
      .filter(col("__p").isNull || col(priorityCol) > col("__p"))
      .select(col(idCol), col(sourceCol), col(priorityCol), col("tokens"))
    // per-source boundary tie groups: Packing-shaped prefix partitioned
    // by (source, id-shard)
    val bnd = joined.filter(col(priorityCol) === col("__p"))
      .withColumn("__shard",
        expr(s"CAST(`$idCol` AS BIGINT) div ${shardSize}L"))
    val local = bnd.withColumn("__local", sum(col("tokens")).over(
      Window.partitionBy(col(sourceCol), col("__shard")).orderBy(col(idCol))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val offsets = bnd
      .groupBy(col(sourceCol).as("__osrc"), col("__shard").as("__oshard"))
      .agg(sum(col("tokens")).as("__total"))
      .withColumn("__offset",
        coalesce(sum(col("__total")).over(
          Window.partitionBy(col("__osrc")).orderBy(col("__oshard"))
            .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select(col("__osrc"), col("__oshard"), col("__offset"))
    val bndIn = local.join(broadcast(offsets),
        col(sourceCol) <=> col("__osrc") && col("__shard") === col("__oshard"))
      .withColumn("__guard", assert_true(col("tokens") >= 0,
        lit("budgetSelectBySource: token counts must be non-negative")))
      .filter(col("__guard").isNull &&
        col("__offset") + col("__local") <= col("__rem"))
      .select(col(idCol), col(sourceCol), col(priorityCol), col("tokens"))
    fullIn.unionByName(bndIn).orderBy(col(idCol))
  }
}
