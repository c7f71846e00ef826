package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Text-analysis operators for training-data pipelines: tokenization,
  * language ID, quality scoring, fingerprinting. Everything is built from
  * codegen'd Catalyst expressions (no UDFs), so the operators distribute and
  * pipeline with scans — at 100 TB these run as map-only stages over the
  * parquet scan with full column pruning.
  */
object TextOps {

  /** Lowercase, collapse whitespace, trim — the canonical form used by
    * dedup and fingerprinting. */
  def normalizeText(c: Column): Column =
    trim(regexp_replace(lower(c), "\\s+", " "))

  /** Whitespace tokens of the normalized text — the fused native kernel
    * (graft.functions.WhitespaceTokensExpr): one lower-case + one byte
    * scan instead of two regex passes, value-identical to
    * [[tokensRegex]] (asserted bit-identical in tests). Every text
    * operator's tokenize path funnels through here. */
  def tokens(c: Column): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.WhitespaceTokensExpr(
        org.apache.spark.sql.GraftSqlShims.expression(c)))

  /** The regex composition the tokens() kernel replaces — kept as the
    * cross-check reference for the bit-identity tests and as executable
    * documentation of the exact semantics (this IS what the DuckDB
    * oracles replay). */
  private[graft] def tokensRegex(c: Column): Column = split(normalizeText(c), " ")

  /** Whitespace token count; empty/null-safe. */
  def tokenCount(c: Column): Column =
    when(c.isNull || normalizeText(c) === "", lit(0)).otherwise(size(tokens(c)))

  /** BPE-ish sub-word token estimate: word pieces of ≤4 chars, digits and
    * punctuation as single tokens (a deterministic stand-in for a real BPE
    * vocab — the regex mirrors common byte-pair segmentation behavior). */
  def bpeTokenCount(c: Column): Column =
    size(regexp_extract_all(lower(c), lit("[a-z]{1,4}|[0-9]|[^a-z0-9\\s]"), lit(0)))

  /** Stopword lists for the n-gram/stopword language-ID heuristic. Tiny by
    * design: language ID at pipeline scale wants a cheap, shuffle-free
    * per-row signal. */
  val StopWords: Map[String, Seq[String]] = Map(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "that", "it", "for"),
    "es" -> Seq("el", "la", "de", "y", "que", "en", "un", "una", "es", "por"),
    "fr" -> Seq("le", "la", "de", "et", "que", "en", "un", "une", "est", "pour"),
    "de" -> Seq("der", "die", "das", "und", "zu", "in", "ist", "ein", "eine", "mit"))

  /** Count of tokens that appear in `words` (multiset count — repeated
    * stopwords count every occurrence). Fused native kernel
    * (MemberCountExpr: one hash probe per token); value-identical to
    * [[stopwordHitsHof]], asserted in tests. */
  def stopwordHits(toks: Column, words: Seq[String]): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.MemberCountExpr(
        org.apache.spark.sql.GraftSqlShims.expression(toks), words))

  /** The HOF composition the stopwordHits kernel replaces — cross-check
    * reference for the bit-identity tests. */
  private[graft] def stopwordHitsHof(toks: Column, words: Seq[String]): Column =
    size(filter(toks, t => t.isin(words: _*)))

  /** Count of characters from an ASCII class — fused kernel, identical
    * to `length(regexp_replace(c, "[^" + members + "]", ""))`. */
  private def asciiClassCount(c: Column, members: String): Column =
    org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.AsciiClassCountExpr(
        org.apache.spark.sql.GraftSqlShims.expression(c), members))

  private val AlphaChars = (('A' to 'Z') ++ ('a' to 'z')).mkString
  private val PunctChars = ".,;:!?'\"()[]-"

  // bit-identity test hooks for the class-count kernels
  private[graft] def alphaCountForTest(c: Column): Column =
    asciiClassCount(c, AlphaChars)
  private[graft] def punctCountForTest(c: Column): Column =
    asciiClassCount(c, PunctChars)

  /** Heuristic language ID over a fixed candidate set: argmax of stopword
    * hits, ties broken by language code, "und" (undetermined) when no
    * stopword matches. Pure expressions → map-only at any scale. */
  def langId(c: Column, candidates: Seq[String] = Seq("en", "es", "fr", "de")): Column = {
    val toks = tokens(c)
    // greatest() over (score, negated-lang-rank) structs = deterministic argmax
    val scored = candidates.map { lang =>
      struct(
        stopwordHits(toks, StopWords(lang)).as("score"),
        lit(-candidates.indexOf(lang)).as("rank"),
        lit(lang).as("lang"))
    }
    val best = greatest(scored: _*)
    when(best.getField("score") <= 0, lit("und")).otherwise(best.getField("lang"))
  }

  /** Document-quality features + a composite score in [0,1]:
    * length, alpha ratio, punctuation ratio, stopword ratio, mean token
    * length — the usual cheap pre-training filters. */
  def qualityFeatures(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    val toks = tokens(c)
    val nChars = length(c).cast("double")
    val nTok = size(toks).cast("double")
    val allStop = StopWords.values.flatten.toSeq.distinct
    df.withColumn("n_tokens", nTok.cast("long"))
      .withColumn("mean_token_len",
        round(when(nTok > 0, (length(normalizeText(c)) - (nTok - 1)) / nTok).otherwise(0.0), 4))
      .withColumn("alpha_ratio",
        round(when(nChars > 0,
          asciiClassCount(c, AlphaChars) / nChars).otherwise(0.0), 4))
      .withColumn("punct_ratio",
        round(when(nChars > 0,
          asciiClassCount(c, PunctChars) / nChars).otherwise(0.0), 4))
      .withColumn("stopword_ratio",
        round(when(nTok > 0, stopwordHits(toks, allStop) / nTok)
          .otherwise(0.0), 4))
      .withColumn("quality_score",
        // Rounding.halfUp4, not round(…, 4): engines disagree on
        // round-half ties of a composite double, while floor of the
        // identical IEEE value is bit-portable (see x33's oracle)
        Rounding.halfUp4(least(lit(1.0), greatest(lit(0.0),
          lit(0.25) * least(nTok / 50.0, lit(1.0)) +
          lit(0.25) * col("alpha_ratio") +
          lit(0.25) * least(col("stopword_ratio") * 5.0, lit(1.0)) +
          lit(0.25) * (lit(1.0) - col("punct_ratio") * 5.0)))))
  }

  /** Gopher-style quality RULE evaluation (Rae et al. 2021's filter
    * family, public-standard): each document is checked against a set of
    * threshold rules and annotated with `pass` plus the comma-joined,
    * alphabetically-ordered list of failed-rule names — the audit trail a
    * curation pipeline keeps so filtered data can be re-admitted when
    * thresholds move.
    *
    * Rules (all tunable):
    *   - `word_count`:      minTokens ≤ n ≤ maxTokens
    *   - `mean_token_len`:  minMeanLen ≤ mean token length ≤ maxMeanLen
    *   - `dup_word_frac`:   1 − distinct/total tokens ≤ maxDupWordFrac
    *   - `stopword_ratio`:  stopword fraction ≥ minStopwordRatio
    *   - `alpha_ratio`:     alphabetic-char fraction ≥ minAlphaRatio
    *
    * Engine-portable BY CONSTRUCTION: every ratio is one IEEE division of
    * two exact integers (correctly rounded on any engine), compared raw —
    * no float accumulation, no rounding step whose half-ties engines
    * could disagree on. Map-only: one projection, the token array and
    * normalized text computed once per row (multi-referenced non-cheap
    * aliases survive CollapseProject), no shuffle at any corpus size.
    *
    * APPENDS `n_tokens`, `reasons` and `pass` to every input column
    * (overwriting same-named ones), so the audited text flows to
    * downstream pipeline stages — a gate that eats its input can't
    * compose. */
  def qualityRules(df: DataFrame, textCol: String,
                   minTokens: Long = 50, maxTokens: Long = 100000,
                   minMeanLen: Double = 3.0, maxMeanLen: Double = 10.0,
                   maxDupWordFrac: Double = 0.6,
                   minStopwordRatio: Double = 0.02,
                   minAlphaRatio: Double = 0.7): DataFrame = {
    val allStop = StopWords.values.flatten.toSeq.distinct
    val base = df
      .withColumn("__qr_tk", tokens(col(textCol)))
      .withColumn("__qr_norm", normalizeText(col(textCol)))
      .withColumn("n_tokens", tokenCount(col(textCol)).cast("long"))
    val n = col("n_tokens")
    val nD = n.cast("double")
    val meanLen = when(n > 0, (length(col("__qr_norm")) - (nD - 1)) / nD).otherwise(0.0)
    val dupFrac = when(n > 0, (nD - size(array_distinct(col("__qr_tk")))) / nD).otherwise(0.0)
    val stopRatio = when(n > 0,
      stopwordHits(col("__qr_tk"), allStop) / nD).otherwise(0.0)
    val alphaRatio = when(length(col(textCol)) > 0,
      asciiClassCount(col(textCol), AlphaChars).cast("double") /
        length(col(textCol))).otherwise(0.0)
    val failed = array( // alphabetical, so `reasons` needs no sort
      when(alphaRatio < minAlphaRatio, lit("alpha_ratio")),
      when(dupFrac > maxDupWordFrac, lit("dup_word_frac")),
      when(meanLen < minMeanLen || meanLen > maxMeanLen, lit("mean_token_len")),
      when(stopRatio < minStopwordRatio, lit("stopword_ratio")),
      when(n < minTokens || n > maxTokens, lit("word_count")))
    base
      .withColumn("reasons", array_join(filter(failed, x => x.isNotNull), ","))
      .withColumn("pass", col("reasons") === "")
      .drop("__qr_tk", "__qr_norm")
  }

  /** Repetition features (Gopher-style quality rules): per-document
    * duplicate-word fraction and top-bigram fraction — the cheap signals
    * that catch degenerate/boilerplate text before training.
    *
    *   - `dup_word_frac` = 1 − distinct/total tokens: map-only (array ops
    *     on the row), no shuffle.
    *   - `top_bigram_frac` = occurrences of the most frequent word bigram
    *     over total bigrams. Counting the mode of a per-row collection is
    *     NOT done with a per-row higher-order fold (interpreted, O(d²));
    *     it plans as explode → partial-aggregated count per (doc, bigram)
    *     → max/sum per doc: two narrow shuffles that scale out, with the
    *     combiner absorbing the in-document repetition that is the signal
    *     itself.
    *
    * Fractions round to 4 like the other quality features. Documents with
    * no bigrams (fewer than 2 tokens) report 0.0. */
  def repetitionFeatures(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = tokens(col(textCol))
    val nTok = tokenCount(col(textCol)).cast("double")
    val base = df.select(col(idCol).as("id"),
      nTok.cast("long").as("n_tokens"),
      round(when(nTok > 0, (nTok - size(array_distinct(toks))) / nTok)
        .otherwise(0.0), 4).as("dup_word_frac"))
    val bigramTop = df
      .select(col(idCol).as("id"),
        explode(Decontaminate.wordNgrams(col(textCol), 2)).as("g"))
      .groupBy("id", "g").agg(count(lit(1)).as("c"))
      .groupBy("id").agg(
        round(max(col("c")).cast("double") / sum(col("c")), 4)
          .as("top_bigram_frac"))
    base.join(bigramTop, Seq("id"), "left")
      .withColumn("top_bigram_frac", coalesce(col("top_bigram_frac"), lit(0.0)))
  }

  /** C4-style line-quality filter (Raffel et al. 2020 §2.2's line
    * rules): keep only lines that (a) hold at least `minWords`
    * whitespace words, (b) end in a terminal punctuation mark
    * (`. ! ? "` — when `requireTerminalPunct`), and (c) contain none of
    * the `banned` phrases (case-insensitive; C4 drops "javascript"
    * lines and boilerplate policy text). The page reassembles from its
    * surviving lines; pair with [[graft.ops.Dedup.dedupLines]] for the
    * full C4 line stage (filter, then corpus-dedup).
    *
    * Entirely MAP-SIDE: one split + higher-order filter per row inside
    * the scan's projection — no explode, no shuffle, nothing at any
    * corpus size. APPENDS clean_text / n_kept / n_lines so the original
    * text stays available downstream. */
  def filterLines(df: DataFrame, textCol: String,
                  minWords: Int = 3, requireTerminalPunct: Boolean = true,
                  banned: Seq[String] = Seq("javascript", "lorem ipsum", "cookie"))
      : DataFrame = {
    require(minWords >= 0, "minWords must be >= 0")
    val lines = split(coalesce(col(textCol), lit("")), "\n")
    def keepLine(l: Column): Column = {
      val t = trim(regexp_replace(l, "\\s+", " "))
      val wordsOk = size(split(t, " ")) >= minWords && t =!= ""
      val punctOk = if (requireTerminalPunct) t.rlike("[.!?\"]$") else lit(true)
      val bannedOk = banned.map(b => !lower(l).contains(b.toLowerCase))
        .reduceOption(_ && _).getOrElse(lit(true))
      wordsOk && punctOk && bannedOk
    }
    val kept = filter(lines, keepLine _)
    df.withColumn("clean_text", array_join(kept, "\n"))
      .withColumn("n_kept", size(kept).cast("long"))
      .withColumn("n_lines", size(lines).cast("long"))
  }

  /** Corpus token frequency, top `k` by (count desc, token asc): the
    * vocabulary-building primitive. Plans as explode → partial (map-side)
    * count aggregation → one shuffle on token → TakeOrdered top-k, so the
    * full corpus never sorts and the driver receives exactly k rows. */
  def topTokens(df: DataFrame, textCol: String, k: Int): DataFrame =
    df.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
      .orderBy(col("n").desc, col("token"))
      .limit(k)

  /** Per-group top-k token frequencies — [[topTokens]] sliced by a group
    * column: per-source vocabulary drift at a glance, or per-cluster
    * keywords when the group column is a `clusterAssignWith` label
    * joined on. Ties rank token-ascending, so output is deterministic on
    * any engine.
    *
    * Shape at scale: one (group, token) exchange with map-side partial
    * count combine (a boilerplate token costs one row per mapper per
    * group); the rank filter plans as WindowGroupLimit over the
    * AGGREGATED relation, whose per-group size is bounded by the
    * vocabulary, not the corpus. Returns (groupCol, token, n, rank). */
  def topTokensByGroup(df: DataFrame, groupCol: String, textCol: String,
                       k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol)).orderBy(col("n").desc, col("token"))
    df.select(col(groupCol), explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy(col(groupCol), col("token")).agg(count(lit(1)).as("n"))
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
  }

  /** Vocabulary growth curve — the Heaps'-law observable (Heaps 1978):
    * how many NEW distinct tokens each successive slab of the corpus
    * contributes, in document-id order (crawl order in a training
    * pipeline). The flattening of this curve is the evidence behind
    * tokenizer-vocabulary sizing and "is more crawl still adding
    * vocabulary?" calls; a slab that spikes long after the curve
    * flattened is an ingestion anomaly (new language, OCR noise, a
    * format break).
    *
    * A running distinct-count looks inherently sequential, but the
    * curve is a pure function of each token's FIRST occurrence: a
    * token is new in the slab containing min(id). So the plan is one
    * token exchange with map-side partial min combine (a boilerplate
    * token costs one row per mapper, never one per occurrence), a
    * tiny bucket aggregate, and a cumulative sum over the ≤
    * max_id/granule bucket rows — the single-task window runs over
    * the BUCKET relation, never corpus rows, the same bounded-window
    * discipline as [[VocabIndex]]'s rank. Docs with null ids group
    * into a null bucket (honestly visible) rather than silently
    * vanishing. Returns (bucket_start, new_tokens, vocab_size),
    * vocab_size = distinct tokens seen through that bucket. */
  def vocabGrowth(df: DataFrame, idCol: String, textCol: String,
                  granule: Long): DataFrame = {
    require(granule > 0, "granule must be positive")
    val first = df
      .select(col(idCol).cast("long").as("__id"),
        explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(min(col("__id")).as("__fid"))
    val buckets = first
      .groupBy((floor(col("__fid") / granule) * granule)
        .cast("long").as("bucket_start"))
      .agg(count(lit(1)).as("new_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("bucket_start").asc_nulls_first)
      .rowsBetween(Long.MinValue, 0)
    buckets.withColumn("vocab_size", sum(col("new_tokens")).over(w))
      .orderBy(col("bucket_start"))
  }

  /** Token-frequency spectrum — the count-of-counts relation (freq,
    * n_tokens, rank_ge): how many distinct tokens occur exactly `freq`
    * times, plus the Zipf rank boundary rank_ge = distinct tokens
    * occurring AT LEAST that often. The spectrum is the whole-corpus
    * shape behind Zipf's-law diagnostics, Good–Turing mass estimates
    * (singleton count = the unseen-mass numerator) and "how much tail
    * would a min-frequency cutoff drop" decisions — all read directly
    * off this relation without ranking individual tokens.
    *
    * Shape at scale: the token count aggregation is the only
    * corpus-sized exchange (map-side combined); the count-of-counts
    * re-aggregation is over the vocabulary; and the spectrum itself
    * has at most O(√N) rows for N total occurrences (distinct counts
    * f₁<f₂<… sum to ≤ N, so there are ≤ √(2N) of them) — the
    * cumulative window is single-task over that provably tiny
    * relation, never a corpus or vocabulary sort. */
  def tokenSpectrum(df: DataFrame, textCol: String): DataFrame = {
    val counts = df.select(explode(tokens(col(textCol))).as("token"))
      .filter(col("token") =!= "")
      .groupBy("token").agg(count(lit(1)).as("n"))
    val spectrum = counts.groupBy(col("n").as("freq"))
      .agg(count(lit(1)).as("n_tokens"))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("freq").desc)
      .rowsBetween(Long.MinValue, 0)
    spectrum.withColumn("rank_ge", sum(col("n_tokens")).over(w))
      .orderBy(col("freq"))
  }

  /** Certified-bounds distributed top-k token frequency — the sketch
    * form of [[topTokens]] for vocabularies too large to shuffle
    * (billions of distinct tokens make even the map-side-combined
    * exchange the bottleneck: one row per distinct token per mapper).
    * TPUT/threshold-style, with a BOUNDED per-partition summarizer:
    * each partition runs a Space-Saving summary (Metwally et al. 2005)
    * of exactly `capacity` counters — O(capacity) task heap no matter
    * how many distinct tokens the partition holds (an exact local map
    * would need multi-GB heaps with no spill path in precisely the
    * billions-distinct regime this operator exists for). Each counter
    * tracks (count, err); the true local count of a tracked token lies
    * in [count − err, count], and any UNtracked token's local count is
    * ≤ θ, the final minimum counter value (0 if the summary never
    * evicted). A partition ships every counter as (token, lo, hi, θ)
    * plus one θ-sentinel. Downstream, n = Σ lo is exact-from-below and
    * n_max = Σ hi + (Θ − ρ(t)) is a CERTIFIED upper bound (Θ = Σ all
    * thresholds, ρ(t) = Σ thresholds of the partitions that did report
    * t: a partition that withheld t cannot have counted it above its
    * own θ; one that reported it already contributes its certified
    * local hi). capacity ≥ each partition's distinct-token count ⇒ no
    * eviction ever happens, every err and θ is 0, lo = hi = the exact
    * local count, and the output equals [[topTokens]] exactly — x67's
    * oracle anchor. The ranking picks by n (ties token asc);
    * overlapping [n, n_max] intervals near the cut are the documented
    * approximation, inspectable from the bounds themselves.
    *
    * Shape at scale: one narrow imperative pass (the only mapPartitions
    * in the text family — per-partition summarization is its legitimate
    * use) with O(capacity) memory, an exchange bounded at capacity+1
    * rows per partition regardless of vocabulary size, a TakeOrdered
    * top-(k+1), and a Window over those k+1 rows only (the Θ
    * attachment — see the in-body comment for why it is NOT a scalar
    * branch). Returns (token, n, n_max). */
  def topTokensSketch(df: DataFrame, textCol: String, k: Int,
                      capacity: Int): DataFrame = {
    require(k > 0, "k must be positive")
    require(capacity > 0, "capacity must be positive")
    val agg = tokenSummaryAgg(df, textCol, capacity)
    // Θ is the null-sentinel group's rho. It must NOT be read through a
    // second consumer of `agg`: a scalar branch looks free, but the
    // is-null/not-null filters push through the aggregate below the
    // exchange, the subtrees stop being canonically equal, and the
    // whole corpus summarization executes twice (the x63b stage-reuse
    // lesson). Instead the sentinel rides the SINGLE TakeOrdered —
    // forced to sort first — and Θ spreads onto the survivors via a
    // window whose input is the limit-bounded k+1 rows (one task over
    // k+1 narrow rows; never a corpus-wide global window).
    val w = org.apache.spark.sql.expressions.Window
      .rowsBetween(Long.MinValue, Long.MaxValue)
    agg
      .orderBy(col("token").isNotNull, col("n").desc, col("token"))
      .limit(k + 1)
      .withColumn("theta",
        max(when(col("token").isNull, col("rho"))).over(w))
      .filter(col("token").isNotNull)
      .select(col("token"), col("n"),
        (col("nhi") + coalesce(col("theta"), lit(0L)) - col("rho")).as("n_max"))
      .orderBy(col("n").desc, col("token"))
  }

  /** [[topTokensSketch]]'s summarize-and-aggregate stage, shared with
    * the [[VocabIndex]] mergeable-summary build: per-partition
    * Space-Saving summaries (O(capacity) task heap), one exchange
    * bounded at capacity+1 rows per partition, aggregated to one row
    * per tracked token `(token, n = Σ certified local lower bounds,
    * nhi = Σ certified local upper bounds, rho = Σ thresholds of the
    * partitions that tracked it)` plus ONE null-token sentinel row
    * whose `rho` is Θ, the sum of every partition's threshold. The
    * certified-bounds algebra over this relation: a tracked token's
    * true count lies in [n, nhi + Θ − rho]; an untracked token's in
    * [0, Θ]. Callers must consume the relation through a SINGLE action
    * (see the Θ-sentinel comment in [[topTokensSketch]]). */
  private[graft] def tokenSummaryAgg(df: DataFrame, textCol: String,
                                     capacity: Int): DataFrame = {
    require(capacity > 0, "capacity must be positive")
    val spark = df.sparkSession
    import spark.implicits._
    val summaries = df.select(tokens(col(textCol)).as("toks")).as[Seq[String]]
      .mapPartitions { it =>
        val s = new SpaceSavingSummary(capacity)
        var sawRows = false
        it.foreach { arr =>
          sawRows = true
          if (arr != null) arr.foreach { t =>
            if (t != null && t.nonEmpty) s.add(t)
          }
        }
        if (!sawRows) Iterator.empty
        else {
          val thr = s.threshold
          // one sentinel row per partition THAT SAW INPUT carries θ into
          // the same exchange the entries ride (Θ = their sum
          // downstream). The sentinel goes out even when the partition
          // produced no tokens (all-null/whitespace texts, thr = 0):
          // builders ride their row-count/fingerprint metrics on this
          // job via observe, and a zero-OUTPUT aggregation gets its
          // CollectMetrics dropped from the executed plan — the empty
          // metric map would then silently read as "empty input" and
          // no-op the update, drifting n_docs/fingerprint against a
          // rebuild (caught by VocabIndexSpec's null-only-batch pin).
          s.entries.map { case (t, lo, hi) => (t, lo, hi, thr) } ++
            Iterator((null: String, 0L, 0L, thr))
        }
      }.toDF("token", "lo", "hi", "thr")
    summaries.groupBy("token")
      .agg(sum(col("lo")).as("n"), sum(col("hi")).as("nhi"),
        sum(col("thr")).as("rho"))
  }

  /** Per-document out-of-vocabulary rate against the corpus's OWN
    * top-`vocabSize` token vocabulary — the tokenizer-fit /
    * domain-mismatch signal: documents full of tokens outside the head
    * vocabulary are OCR noise, code, or off-domain for the mixture.
    * Vocabulary = [[topTokens]] of this corpus (count desc, token asc
    * ties — deterministic on any engine); oov_rate = the fraction of a
    * document's token OCCURRENCES outside it, HALF_UP-rounded to 4.
    *
    * Shape at scale: the k-bounded vocabulary broadcasts, membership
    * checks ride a map-side broadcast join (the corpus never shuffles
    * on tokens), and the per-doc rollup is one id aggregation. Docs
    * with zero tokens report rate 0. Returns (id, n_tokens, n_oov,
    * oov_rate). */
  def oovRate(df: DataFrame, idCol: String, textCol: String,
              vocabSize: Int): DataFrame = {
    require(vocabSize > 0, "vocabSize must be positive")
    oovRateAgainst(df, idCol, textCol,
      topTokens(df, textCol, vocabSize).select(col("token")))
  }

  /** [[oovRate]] against an EXTERNAL vocabulary relation (one `token`
    * string column) — the artifact-served form: a persisted
    * [[VocabIndex]] replaces the per-query corpus-wide token
    * aggregation, so the only corpus pass left is the map-side
    * membership probe. Same broadcast shape either way (the vocabulary
    * is k-bounded by construction). */
  def oovRateAgainst(df: DataFrame, idCol: String, textCol: String,
                     vocabulary: DataFrame): DataFrame = {
    val toks = graft.ops.Dedup.spread(df, col(idCol))
      .select(col(idCol).as("id"), explode(tokens(col(textCol))).as("__t"))
      .filter(col("__t") =!= "")
    val vocab = vocabulary.select(col("token").as("__v"))
    val perDoc = toks.join(broadcast(vocab), col("__t") === col("__v"), "left")
      .groupBy("id")
      .agg(count(lit(1)).as("n_tokens"),
        sum(col("__v").isNull.cast("long")).as("n_oov"))
    df.select(col(idCol).as("id")).join(perDoc, Seq("id"), "left")
      .select(col("id"),
        coalesce(col("n_tokens"), lit(0L)).as("n_tokens"),
        coalesce(col("n_oov"), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, lit(0.0))
          .otherwise(Rounding.halfUp4(
            col("n_oov").cast("double") / col("n_tokens"))))
  }

  /** Overlapping token-window chunking — the RAG/eval context-prep
    * stage: windows of `chunkTokens` whitespace tokens advancing by
    * `stride` (stride < chunkTokens ⇒ overlap), the final window
    * keeping the (possibly shorter) tail. Empty documents emit no
    * chunks; documents shorter than one window emit exactly one (the
    * whole document).
    *
    * Map-side: the token array materializes ONCE per row in its own
    * projection (multi-referenced non-cheap aliases survive
    * CollapseProject — inlining it beside the explode would re-tokenize
    * per emitted chunk), windows slice from it, and the explode is the
    * only row expansion; no shuffle at any corpus size. Returns
    * (id, chunk_idx, chunk_text, n_tokens). */
  def chunkText(df: DataFrame, idCol: String, textCol: String,
                chunkTokens: Int = 128, stride: Int = 64): DataFrame = {
    require(chunkTokens > 0, "chunkTokens must be positive")
    require(stride > 0 && stride <= chunkTokens,
      "stride must be in [1, chunkTokens]")
    val base = df.select(col(idCol).as("id"),
      tokens(col(textCol)).as("__tk"),
      tokenCount(col(textCol)).as("__n"))
    val nWin = (lit(1) + greatest(lit(0),
      ceil((col("__n") - lit(chunkTokens)).cast("double") / stride)
        .cast("int"))).cast("int")
    val wins = when(col("__n") <= 0, array().cast("array<string>"))
      .otherwise(transform(sequence(lit(0), nWin - 1),
        i => concat_ws(" ", slice(col("__tk"), i * stride + 1, lit(chunkTokens)))))
    base.select(col("id"), posexplode(wins))
      .select(col("id"), col("pos").cast("long").as("chunk_idx"),
        col("col").as("chunk_text"))
      .withColumn("n_tokens", size(split(col("chunk_text"), " ")).cast("long"))
  }

  /** Top-`k` PMI collocations: the token pairs that co-occur in
    * documents far more than chance — the collocation-mining primitive
    * behind vocabulary/tokenizer curation and phrase detection
    * (pointwise mutual information over document-level presence,
    * Church & Hanks 1990). `PMI(a,b) = ln(n_ab·N / (n_a·n_b))` with
    * document counts; pairs in fewer than `minPairDocs` documents are
    * noise and drop. Ties order by (term_a, term_b); scores round to 4.
    *
    * Shape at scale: pair generation is MAP-SIDE — each doc's sorted
    * distinct-token array expands to its own O(d²) pairs via nested
    * array transforms (no self-join of an exploded token relation, which
    * would shuffle the corpus and explode skew on common tokens); the
    * pair counts aggregate with map-side combine, per-term document
    * frequencies join on term, the one-row N broadcasts, and the top-k
    * collapses to TakeOrderedAndProject. Two tokenizing corpus scans
    * total (pairs + term frequencies). Pair expansion is the native
    * TokenPairsExpr kernel (the HOF formulation is kept in
    * [[tokenPairsHof]] as the cross-check).
    *
    * `maxDocTokens` bounds the O(d²) per-document expansion: a document
    * with more distinct tokens keeps only the first `maxDocTokens` of
    * its SORTED distinct-token array (a deterministic alphabetical
    * prefix) — one degenerate 100k-distinct-token document would
    * otherwise emit 5·10⁹ pairs from a single row (and the kernel
    * hard-fails past 16384 rather than OOM). Term document-frequencies
    * count from the same truncated arrays, so the PMI stays internally
    * consistent. Documents under the cap — all real text — are
    * unaffected. */
  def pmiCollocations(df: DataFrame, textCol: String, k: Int,
                      minPairDocs: Long = 2,
                      maxDocTokens: Int = 16384): DataFrame = {
    require(k > 0, "k must be positive")
    require(maxDocTokens >= 2 && maxDocTokens <= 16384,
      "maxDocTokens must be in [2, 16384]")
    // no id column in this op's contract: spread on the all-atomic-column
    // hash (dot-safe, map-safe; the server's hidden row-order column
    // keeps rows distinct even on boilerplate-heavy corpora)
    val base = graft.ops.Dedup.spread(df,
      graft.ops.Dedup.spreadKey(df, textCol)).select(
      slice(filter(array_sort(array_distinct(tokens(col(textCol)))),
        t => t =!= ""), 1, maxDocTokens).as("__ts"))
    val nDocs = base.agg(count(lit(1)).as("__n"))
    val pairCol = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.TokenPairsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(col("__ts"))))
    val pairs = base
      .select(explode(pairCol).as("__p"))
      .select(col("__p.a").as("term_a"), col("__p.b").as("term_b"))
      .groupBy("term_a", "term_b").agg(count(lit(1)).as("n_pair"))
      .filter(col("n_pair") >= minPairDocs)
    val termDocs = base.select(explode(col("__ts")).as("__t"))
      .groupBy("__t").agg(count(lit(1)).as("__nt"))
    val joined = pairs
      .join(termDocs.select(col("__t").as("term_a"), col("__nt").as("__na")),
        Seq("term_a"))
      .join(termDocs.select(col("__t").as("term_b"), col("__nt").as("__nb")),
        Seq("term_b"))
      .crossJoin(broadcast(nDocs))
    joined
      .withColumn("pmi", round(
        log(col("n_pair").cast("double") * col("__n").cast("double") /
          (col("__na").cast("double") * col("__nb").cast("double"))), 4))
      .select(col("term_a"), col("term_b"), col("n_pair"), col("pmi"))
      .orderBy(col("pmi").desc, col("term_a"), col("term_b"))
      .limit(k)
  }

  /** Pure HOF formulation of the pair expansion — value-identical to the
    * native TokenPairsExpr kernel (asserted in tests), kept as the
    * reference implementation and codegen cross-check. */
  private[graft] def tokenPairsHof(ts: Column): Column =
    flatten(transform(ts, a =>
      transform(filter(ts, b => b > a), b => struct(a.as("a"), b.as("b")))))

  /** PII patterns, written in the regex subset Java (Spark codegen) and
    * RE2 (DuckDB, the oracle) interpret identically — no backrefs, no
    * lookaround. Conservative on purpose: a redaction stage prefers
    * false negatives over eating ordinary text. */
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhoneRe = "\\+\\d{1,2} \\d{3}-\\d{3}-\\d{4}"
  val Ipv4Re  = "\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}\\.\\d{1,3}"

  /** PII scrub — the pre-training redaction pass: replace emails, phone
    * numbers and IPv4 literals with typed placeholders and count each
    * kind per document. Map-only (three regex passes per row inside
    * whole-stage codegen), so it scales with the scan and shuffles
    * nothing. Emails redact first so their host part is no longer
    * visible when the IP pattern runs. */
  def redactPii(df: DataFrame, textCol: String): DataFrame = {
    val c = col(textCol)
    df.withColumn("n_emails", regexp_count(c, lit(EmailRe)))
      .withColumn("n_phones", regexp_count(c, lit(PhoneRe)))
      .withColumn("n_ips", regexp_count(c, lit(Ipv4Re)))
      .withColumn("redacted",
        regexp_replace(
          regexp_replace(
            regexp_replace(c, EmailRe, "<EMAIL>"),
            PhoneRe, "<PHONE>"),
          Ipv4Re, "<IP>"))
  }

  /** Shannon entropy over a string's characters, bits/char — the cheap
    * degenerate-text detector (all-same-char spam scores ~0, natural text
    * ~4-4.5). Native codegen kernel, map-only; the result is rounded with
    * the engine-portable floor(x·10⁴+½)/10⁴ so the DuckDB oracle's libm
    * last-ulp differences cannot flip a rounding. */
  def charEntropy(c: Column): Column = {
    val raw = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.CharEntropyExpr(
        org.apache.spark.sql.GraftSqlShims.expression(c)))
    Rounding.halfUp4(raw)
  }

  /** Gopher-style WITHIN-document repetition signals (Rae et al. 2021's
    * repetition quality filters, the standard pretraining-corpus gate
    * for boilerplate/spam) — the CHARACTER-fraction family that
    * completes [[repetitionFeatures]]'s count-based pair (and, unlike
    * its exploded top-bigram stage, needs no shuffle at all): per
    * document —
    *
    *   - `n_lines`: non-blank trimmed lines;
    *   - `dup_line_frac`: fraction of lines that are repeats of an
    *     earlier line ((n_lines − n_distinct) / n_lines);
    *   - `dup_line_char_frac`: the same fraction in characters (repeat
    *     occurrences' chars / all line chars);
    *   - `top_2gram_char_frac`: characters covered by the single most
    *     frequent word 2-gram (count × gram chars) over the normalized
    *     text's length — ties broken by longer gram, then lexicographic,
    *     so the metric is deterministic and oracle-exact. Overlap-
    *     agnostic like the original Gopher signal, so a self-overlapping
    *     gram ("a a a …" → "a a"×7) can exceed 1 — degenerate repetition
    *     scores HIGHER, which is what a filter threshold wants;
    *   - `dup_5gram_char_frac`: characters covered by word 5-grams that
    *     occur 2+ times (Σ count × gram chars, overlap-agnostic like the
    *     original, capped at 1.0) over the normalized length.
    *
    * Unlike [[graft.ops.Dedup.dupGramStats]] (gram duplication ACROSS
    * the corpus — one gram shuffle), every signal here is internal to
    * one document: the whole operator is MAP-ONLY, zero exchanges.
    * Within a row the gram passes are O(G log G) (one array_sort, then
    * single aggregate folds over runs) — no O(G²) distinct×occurrence
    * probing, so a 100k-token document costs a sort, not a quadratic
    * scan. The run folds track the best/duplicated runs through the
    * sorted array; best-gram selection rides struct ordering (min of
    * (−count, −len, gram)), which short-circuits field-wise exactly
    * like the oracle's ORDER BY cnt DESC, length DESC, gram ASC.
    * Fractions are rounded with the engine-portable floor(x·10⁶+½)/10⁶.
    */
  def repetitionSignals(df: DataFrame, idCol: String, textCol: String): DataFrame = {
    val staged = df
      .select(col(idCol).as("id"), coalesce(col(textCol), lit("")).as("__t"))
      .withColumn("__norm", normalizeText(col("__t")))
      .withColumn("__lines",
        expr("filter(transform(split(__t, '\n'), l -> trim(l)), l -> l != '')"))
      .withColumn("__dl", array_distinct(col("__lines")))
      .withColumn("__s2", array_sort(Decontaminate.wordNgrams(col("__t"), 2)))
      .withColumn("__s5", array_sort(Decontaminate.wordNgrams(col("__t"), 5)))
      .withColumn("__nl", size(col("__lines")).cast("long"))
      .withColumn("__lc", expr("aggregate(__lines, 0L, (a, l) -> a + length(l))"))
      .withColumn("__dlc", expr("aggregate(__dl, 0L, (a, l) -> a + length(l))"))
      // best 2-gram as min of (−run, −len, gram): struct comparison
      // short-circuits field-wise, so ties fall through to longer gram,
      // then lexicographically smaller — the oracle's ORDER BY
      .withColumn("__best2", expr(
        """aggregate(__s2,
           named_struct('prev', cast(null as string), 'run', 0L,
             'best', named_struct('nc', 0L, 'nlen', 0L, 'g', cast(null as string))),
           (acc, g) -> named_struct(
             'prev', g,
             'run', if(g <=> acc.prev, acc.run + 1, 1L),
             'best', least(acc.best,
               named_struct('nc', -if(g <=> acc.prev, acc.run + 1, 1L),
                 'nlen', -length(g), 'g', g))),
           acc -> acc.best)"""))
      // duplicated-5-gram chars: flush each completed run of length ≥ 2
      // at the transition, plus the final run in the finish lambda
      .withColumn("__dup5", expr(
        """aggregate(__s5,
           named_struct('prev', cast(null as string), 'run', 0L, 'acc', 0L),
           (acc, g) -> named_struct(
             'prev', g,
             'run', if(g <=> acc.prev, acc.run + 1, 1L),
             'acc', acc.acc + if(g <=> acc.prev, 0L,
               if(acc.run >= 2, acc.run * length(acc.prev), 0L))),
           st -> st.acc + if(st.run >= 2, st.run * length(st.prev), 0L))"""))
    staged.select(
      col("id"),
      col("__nl").as("n_lines"),
      when(col("__nl") === 0, lit(0.0)).otherwise(Rounding.halfUp(
        (col("__nl") - size(col("__dl"))).cast("double") / col("__nl"), 6))
        .as("dup_line_frac"),
      when(col("__lc") === 0, lit(0.0)).otherwise(Rounding.halfUp(
        (col("__lc") - col("__dlc")).cast("double") / col("__lc"), 6))
        .as("dup_line_char_frac"),
      when(size(col("__s2")) === 0, lit(0.0)).otherwise(Rounding.halfUp(
        (-col("__best2.nc") * -col("__best2.nlen")).cast("double") /
          length(col("__norm")), 6))
        .as("top_2gram_char_frac"),
      when(size(col("__s5")) === 0, lit(0.0)).otherwise(Rounding.halfUp(
        least(lit(1.0),
          col("__dup5").cast("double") / length(col("__norm"))), 6))
        .as("dup_5gram_char_frac"))
  }

  /** Stable content fingerprint: md5 of the normalized text. Identical
    * duplicates collide exactly; used as the exact-dedup key. */
  def fingerprintMd5(c: Column): Column = md5(normalizeText(c))

  /** Polynomial rolling hash (Rabin-Karp style, base 31 mod 2^61-1) over the
    * normalized text's characters, computed with the `aggregate`
    * higher-order function — a cheap order-sensitive fingerprint that,
    * unlike md5, supports incremental/windowed composition. */
  def fingerprintRolling(c: Column): Column = {
    val p = lit(1000000007L) // prime small enough that acc*31+c never overflows
    val chars = split(normalizeText(c), "")
    aggregate(chars, lit(0L),
      (acc, ch) => pmod(acc * 31 + coalesce(ascii(ch).cast("long"), lit(0L)), p))
  }
}

/** Space-Saving frequent-items summary (Metwally, Agrawal, El Abbadi,
  * ICDT 2005) — the bounded per-partition summarizer behind
  * [[TextOps.topTokensSketch]]. Exactly `capacity` counters, each a
  * (token, count, err) triple kept in a hand-rolled indexed binary
  * min-heap on count (O(log capacity) per token, O(capacity) memory —
  * a partition with billions of distinct tokens still costs a few MB
  * of task heap, where an exact map would be multi-GB with no spill
  * path). Invariants the sketch's certified bounds rest on:
  *
  *  - a tracked token's TRUE local count lies in [count − err, count]
  *    (err is the evicted predecessor's overestimate, itself ≥ the
  *    token's pre-takeover occurrences);
  *  - any token NOT tracked at the end has true local count ≤
  *    [[threshold]], the final minimum counter value (counter values
  *    never decrease, and an item out-monitored the whole stream never
  *    exceeded the minimum);
  *  - if the summary never evicts (distinct ≤ capacity), every err is
  *    0 and every tracked count is EXACT — the ample-capacity
  *    exactness anchor.
  *
  * Eviction picks the heap-min deterministically for a given input
  * order, so summaries (and the sketch built on them) are reproducible
  * for a fixed partition layout. */
private[graft] final class SpaceSavingSummary(val capacity: Int) {
  require(capacity > 0, "capacity must be positive")

  private final class Ctr(var token: String, var count: Long, var err: Long,
                          var pos: Int)
  private val index = new java.util.HashMap[String, Ctr](capacity * 2)
  private val heap = new Array[Ctr](capacity)
  private var used = 0
  private var evictedAny = false

  /** Number of counters currently held — never exceeds `capacity`. */
  def size: Int = used

  def add(t: String): Unit = {
    val c = index.get(t)
    if (c != null) {
      c.count += 1L
      siftDown(c.pos)
    } else if (used < capacity) {
      val nc = new Ctr(t, 1L, 0L, used)
      heap(used) = nc
      used += 1
      index.put(t, nc)
      siftUp(nc.pos)
    } else {
      // take over the minimum counter: the classic Space-Saving step
      evictedAny = true
      val m = heap(0)
      index.remove(m.token)
      m.err = m.count
      m.count += 1L
      m.token = t
      index.put(t, m)
      siftDown(0)
    }
  }

  /** Certified upper bound on the local count of any token absent from
    * the summary: the final minimum counter value, or 0 if nothing was
    * ever evicted (then absence means the token never occurred). */
  def threshold: Long = if (evictedAny) heap(0).count else 0L

  /** All counters as (token, certified lower bound, overestimate). */
  def entries: Iterator[(String, Long, Long)] =
    heap.iterator.take(used).map(c => (c.token, c.count - c.err, c.count))

  private def place(c: Ctr, i: Int): Unit = { heap(i) = c; c.pos = i }

  private def siftUp(i0: Int): Unit = {
    var i = i0
    val c = heap(i)
    var done = false
    while (!done && i > 0) {
      val p = (i - 1) >> 1
      if (heap(p).count > c.count) { place(heap(p), i); i = p }
      else done = true
    }
    place(c, i)
  }

  private def siftDown(i0: Int): Unit = {
    var i = i0
    val c = heap(i)
    var done = false
    while (!done) {
      val l = 2 * i + 1
      if (l >= used) done = true
      else {
        val r = l + 1
        val s = if (r < used && heap(r).count < heap(l).count) r else l
        if (heap(s).count < c.count) { place(heap(s), i); i = s }
        else done = true
      }
    }
    place(c, i)
  }
}
