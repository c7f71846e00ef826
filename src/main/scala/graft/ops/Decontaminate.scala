package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Benchmark decontamination for training pipelines: find (and drop)
  * training documents that share a long word n-gram with an evaluation
  * set — the standard contamination test (an n-gram of 8–13 words
  * appearing verbatim in both a training document and a benchmark item).
  *
  * Shape at scale: both sides explode to (doc, gram) with per-document
  * gram dedup BEFORE the explode (bounds the blowup at one row per
  * distinct gram), then one equi-join keyed on the 64-bit gram hash WITH
  * the gram string as a second key — the hash keeps the shuffle keys
  * narrow and uniformly distributed, the string equality keeps the result
  * exact. The eval side is an aggregated (distinct) relation, so AQE sees
  * its true size after the distinct and converts the join to broadcast
  * whenever the benchmark set is small — the common case: a few thousand
  * eval items vs a 100 TB train corpus never shuffles the train grams.
  */
object Decontaminate {

  /** All word `n`-grams of the normalized text, as space-joined strings;
    * empty array when the document has fewer than `n` tokens. Runs as the
    * native WordNgramsExpr kernel — one codegen'd loop per row where the
    * HOF formulation (kept below as the cross-check) pays ~3 interpreted
    * lambda evaluations per gram. `distinct=true` dedups first-seen inside
    * the same loop, replacing an `array_distinct` pass over the output. */
  def wordNgrams(c: Column, n: Int, distinct: Boolean = false): Column = {
    require(n > 0, "n must be positive")
    val kernel = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.WordNgramsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(TextOps.tokens(c)),
        n, distinct))
    when(c.isNull || TextOps.normalizeText(c) === "",
      array().cast("array<string>")).otherwise(kernel)
  }

  /** Non-overlapping `n`-token chunks of the normalized text (the final
    * partial chunk included) — the unit for passage-level dedup. Same
    * native kernel, stride = n. */
  def tokenChunks(c: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    val kernel = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.WordNgramsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(TextOps.tokens(c)),
        n, distinct = false, stride = n))
    when(c.isNull || TextOps.normalizeText(c) === "",
      array().cast("array<string>")).otherwise(kernel)
  }

  /** Pure higher-order-function formulation of `wordNgrams` —
    * value-identical to the native kernel (asserted in tests), kept as the
    * reference implementation and codegen cross-check. */
  private[graft] def wordNgramsHof(c: Column, n: Int): Column = {
    require(n > 0, "n must be positive")
    val tk = TextOps.tokens(c)
    when(c.isNull || TextOps.normalizeText(c) === "" || size(tk) < n,
      array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), size(tk) - n),
        i => concat_ws(" ", slice(tk, i + lit(1), lit(n)))))
  }

  /** Contaminated training documents: (id, n_shared_grams) for every
    * train document sharing ≥1 distinct word n-gram with `eval`. */
  def contaminated(train: DataFrame, eval: DataFrame, idCol: String,
                   textCol: String, n: Int = 8): DataFrame = {
    def grams(df: DataFrame, cols: Column*) =
      df.select(cols :+ explode(
        wordNgrams(col(textCol), n, distinct = true)).as("gram"): _*)
        .withColumn("__gh", xxhash64(col("gram")))
    val evalGrams = grams(eval).dropDuplicates("__gh", "gram")
    // spread the train side before its gram kernel scan: a single-row-
    // group parquet corpus arrives as ONE partition and would serialize
    // the n-gram work on one thread (no-op on multi-partition inputs)
    grams(Dedup.spread(train, col(idCol)), col(idCol).as("id"))
      .join(evalGrams, Seq("__gh", "gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** The decontaminated training set: `train` minus every document
    * `contaminated` flags (one extra anti-join on the id). */
  def decontaminate(train: DataFrame, eval: DataFrame, idCol: String,
                    textCol: String, n: Int = 8): DataFrame =
    train.join(
      contaminated(train, eval, idCol, textCol, n)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** [[contaminated]] served from a persisted [[DecontIndex]] — the
    * eval suite's gram derivation (normalize, tokenize, explode,
    * distinct) is NOT re-paid: the artifact's sketch probes the train
    * grams map-side inside codegen (no false negatives, so no true
    * match is lost), and only probe-positive grams — true matches plus
    * fpp of the rest — reach the exact (hash, gram) join against the
    * artifact's gram relation, which rescues the false positives.
    * Result is therefore EXACTLY [[contaminated]] over the suite the
    * artifact was built/updated from. The gram relation is
    * suite-sized, so AQE broadcasts the join side the same way the
    * inline operator's distinct aggregate gets broadcast — at 100 TB
    * the train grams never shuffle, and the sketch pre-filter shrinks
    * the join probe mass to contamination density. */
  def contaminatedWith(train: DataFrame, idCol: String, textCol: String,
                       art: DecontIndex.Artifact): DataFrame = {
    val probe = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.BloomContainsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(col("__gh")),
        art.bloomBytes))
    Dedup.spread(train, col(idCol))
      .select(col(idCol).as("id"), explode(
        wordNgrams(col(textCol), art.n, distinct = true)).as("gram"))
      .withColumn("__gh", xxhash64(col("gram")))
      .filter(coalesce(probe, lit(false)))
      .join(art.grams.select(col("gh").as("__gh"), col("gram")),
        Seq("__gh", "gram"))
      .groupBy("id")
      .agg(count(lit(1)).as("n_shared_grams"))
  }

  /** [[decontaminate]] through a persisted [[DecontIndex]]. */
  def decontaminateWith(train: DataFrame, idCol: String, textCol: String,
                        art: DecontIndex.Artifact): DataFrame =
    train.join(
      contaminatedWith(train, idCol, textCol, art)
        .select(col("id").as(idCol)),
      Seq(idCol), "left_anti")

  /** Span-level decontamination — the surgical variant of
    * [[decontaminate]]: instead of DROPPING a contaminated training
    * document, excise exactly the tokens covered by some word `n`-gram
    * appearing verbatim in the eval set and keep the rest (documents
    * are expensive; a benchmark question quoted in one footer should
    * not cost the whole page). The rewrite is
    * [[Dedup.scrubDuplicatedSpans]]'s machinery with the
    * corpus-duplicated gram set replaced by the eval gram set.
    *
    * Shape at scale: eval grams dedup to a distinct relation (AQE
    * broadcasts the typical benchmark-sized set, so the train grams
    * never shuffle); train positional grams explode once from a
    * materialized array and inner-join on (gram hash, gram) like
    * [[contaminated]]; only MATCHING occurrences reach the per-doc
    * start collect, so the rollup is sized by contamination density;
    * the excision is a map-side two-arg filter over the token array.
    * Returns (idCol, clean_text, n_tokens_removed) for every train
    * row. */
  def scrubContaminated(train: DataFrame, eval: DataFrame, idCol: String,
                        textCol: String, n: Int = 8): DataFrame = {
    require(n > 0, "n must be positive")
    val evalGrams = eval
      .select(explode(wordNgrams(col(textCol), n, distinct = true)).as("__gram"))
      .withColumn("__gh", xxhash64(col("__gram")))
      .dropDuplicates("__gh", "__gram")
    val g = Dedup.spread(train, col(idCol))
      .select(col(idCol).as("__id"), wordNgrams(col(textCol), n).as("__g"))
      .select(col("__id"), posexplode(col("__g")).as(Seq("__s", "__gram")))
      .withColumn("__gh", xxhash64(col("__gram")))
    val hitStarts = g.join(evalGrams, Seq("__gh", "__gram"))
      .groupBy("__id").agg(collect_list(col("__s")).as("__starts"))
    train.join(hitStarts, train(idCol) === hitStarts("__id"), "left")
      .withColumn("__tk", coalesce(TextOps.tokens(col(textCol)),
        array().cast("array<string>")))
      .withColumn("__kept", filter(col("__tk"), (t, p) =>
        !exists(coalesce(col("__starts"), array().cast("array<int>")),
          s => s <= p && p <= s + lit(n - 1))))
      .select(train(idCol),
        array_join(col("__kept"), " ").as("clean_text"),
        (size(col("__tk")) - size(col("__kept"))).cast("long")
          .as("n_tokens_removed"))
  }
}
