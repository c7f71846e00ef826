package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the lexical counterpart to
  * the ANN family in [[Similarity]] (the qcache reference has no search
  * operator; BM25 is the public-standard ranking function, Robertson &
  * Zaragoza 2009, with the +1 idf flooring Lucene uses so scores stay
  * non-negative at any document frequency).
  *
  * Shape at scale: the query is a handful of literal terms, so the
  * per-doc [dl, tf…] vector comes from ONE pass of the fused
  * TermFreqsExpr kernel over the token array — a map-only projection
  * with NO explode and NO (term, doc) shuffle; an inverted-index build
  * would shuffle the whole corpus to answer one query. Corpus
  * statistics (N, Σdl, per-term df) reduce to a
  * single one-row aggregate that broadcasts back over the scoring scan,
  * and the top-k collapses to TakeOrderedAndProject (per-partition
  * partial top-k, only k rows per partition reach the driver). Two
  * map-only scans of the corpus total — the exact-BM25 minimum.
  */
object Search {

  /** Top-`k` documents by BM25 score for a whitespace query. Terms are
    * normalized like the corpus ([[TextOps.normalizeText]]) and
    * deduplicated; documents matching no term are dropped. Scores are
    * rounded to 4 decimals and ties break on ascending id, so the result
    * is engine-portable and deterministic. */
  def bm25(docs: DataFrame, idCol: String, textCol: String, queryText: String,
           k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val terms: Seq[String] =
      queryText.toLowerCase.trim.split("\\s+").filter(_.nonEmpty).distinct.toSeq
    require(terms.nonEmpty, "query must contain at least one term")

    // fused [dl, tf…] kernel: one codegen'd pass over the tokens — the
    // HOF form (kept below as the cross-check) re-walks the array once
    // per term through interpreted lambdas
    val tfs = org.apache.spark.sql.GraftSqlShims.column(
      graft.functions.TermFreqsExpr(
        org.apache.spark.sql.GraftSqlShims.expression(
          TextOps.tokens(col(textCol))), terms))
    // spread before the per-row kernel scan: a single-row-group parquet
    // corpus arrives as ONE partition and serializes tokenization on one
    // thread (stack-sampled; no-op on real multi-partition inputs)
    val base = Dedup.spread(docs, col(idCol)).select(col(idCol), tfs.as("__tfs"))
      .select(col(idCol) +: element_at(col("__tfs"), 1).as("__dl") +:
        terms.indices.map(i =>
          element_at(col("__tfs"), i + 2).as(s"__tf$i")): _*)

    // one-row corpus statistics: N, Σdl (ints — exact, so avgdl is the
    // same double on any engine), and per-term document frequencies
    val stats = base.agg(
      count(lit(1)).as("__n"),
      sum(col("__dl")).as("__sumdl") +:
        terms.indices.map(i =>
          sum((col(s"__tf$i") > 0).cast("long")).as(s"__df$i")): _*)

    val n = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / n
    // per-term BM25, summed left-to-right so the float op sequence is
    // reproducible by the SQL oracle verbatim
    val score = terms.indices.map { i =>
      val tf = col(s"__tf$i").cast("double")
      val dfT = col(s"__df$i").cast("double")
      val idf = log((n - dfT + lit(0.5)) / (dfT + lit(0.5)) + lit(1.0))
      idf * tf * lit(k1 + 1.0) /
        (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl))
    }.reduce(_ + _)

    base.crossJoin(broadcast(stats))
      .withColumn("score", round(score, 4))
      .filter(col("score") > 0)
      .select(col(idCol), col("score"))
      .orderBy(col("score").desc, col(idCol))
      .limit(k)
  }

  /** Batch BM25: top-`k` documents per query for a whole QUERY TABLE —
    * the store-once-search-many shape (mirrors the ANN family's stored
    * `queries` dataset). One query would waste this plan; a batch
    * amortizes the corpus pass across all of them.
    *
    * Shape at scale: the distinct term set of the whole batch is tiny, so
    * it broadcasts; the corpus token explode is FILTERED by that
    * broadcast before anything shuffles — only tokens matching some
    * query term survive to the single (term, doc) aggregation. Document
    * frequencies and corpus stats are small aggregates broadcast back,
    * query terms broadcast onto the postings, and the per-query top-k is
    * a rank window partitioned by query (WindowGroupLimit prunes to k
    * rows per query map-side). No per-query corpus scan, no cartesian.
    *
    * Scores round to 4 decimals with a doc-id tie-break, like [[bm25]].
    * Returns (qIdCol, idCol, score).
    */
  def bm25Batch(docs: DataFrame, idCol: String, textCol: String,
                queries: DataFrame, qIdCol: String, qTextCol: String,
                k: Int, k1: Double = 1.2, b: Double = 0.75): DataFrame = {
    require(k > 0, "k must be positive")
    val qTerms = queries.select(col(qIdCol).as("__qid"),
        explode(array_distinct(TextOps.tokens(col(qTextCol)))).as("__term"))
      .filter(col("__term") =!= "")
    val termSet = qTerms.select("__term").distinct()

    // tokenize ONCE into an array column, then derive both dl and the
    // explode from it — inlining tokens() into two consumers around a
    // Generate lets the optimizer hoist the projection ABOVE the explode,
    // re-running the tokenization regex once per TOKEN instead of once
    // per document (stack-sampled: that regex was ~80% of the query)
    // spread before BOTH tokenizing corpus scans: a single-row-group
    // parquet corpus arrives as one partition and would serialize the
    // regex work on one thread (no-op on real multi-partition inputs)
    val spreadDocs = Dedup.spread(docs, col(idCol))
    val exploded = spreadDocs
      .select(col(idCol).as("__doc"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("__doc"), size(col("__toks")).as("__dl"),
        explode(col("__toks")).as("__term"))
      .join(broadcast(termSet), Seq("__term")) // drop non-query tokens pre-shuffle
    val postings = exploded.groupBy("__term", "__doc")
      .agg(first(col("__dl")).as("__dl"), count(lit(1)).as("__tf"))

    val stats = spreadDocs.agg(count(lit(1)).as("__n"),
      sum(TextOps.tokenCount(col(textCol))).as("__sumdl"))
    // df(term) = distinct docs containing the term. NOT derived from the
    // postings relation: a second reference to `postings` re-computes
    // its whole explode subtree (per-branch column pruning makes shared
    // subtrees canonically unequal, so AQE never stage-reuses the
    // (term, doc) exchange — verified on the executed adaptive plan),
    // and a term WINDOW over postings would funnel a common query
    // term's full posting list into one task. Instead df is its own
    // NARROW pass: per-doc distinct tokens, query-term filter before
    // the explode's output shuffles anywhere, then one (term) count
    // with map-side partial combine — each mapper contributes one row
    // per term it saw, no (term, doc) exchange at all. The query-
    // bounded result broadcasts back onto postings.
    val dfCounts = spreadDocs
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("__term"))
      .join(broadcast(termSet), Seq("__term"))
      .groupBy("__term").agg(count(lit(1)).as("__dfc"))
    val withDf = postings.join(broadcast(dfCounts), Seq("__term"))

    val n = col("__n").cast("double")
    val avgdl = col("__sumdl").cast("double") / n
    val tf = col("__tf").cast("double")
    val dfDouble = col("__dfc").cast("double")
    val idf = log((n - dfDouble + lit(0.5)) / (dfDouble + lit(0.5)) + lit(1.0))
    val contrib = idf * tf * lit(k1 + 1.0) /
      (tf + lit(k1) * (lit(1.0 - b) + lit(b) * col("__dl").cast("double") / avgdl))

    // Per-term contributions are summed in TERM order, not partial-agg
    // arrival order: collect the (term, contrib) pairs, sort, left-fold.
    // A plain sum() leaves the double addition order up to the shuffle,
    // so a score landing exactly on a 4th-decimal rounding boundary
    // could flip between runs (and against the oracle, which replays the
    // same ordered fold). The arrays are query-term-sized (a handful of
    // elements), so the interpreted HOF fold is noise.
    val scored = withDf
      .join(broadcast(qTerms), Seq("__term"))
      .crossJoin(broadcast(stats))
      .groupBy("__qid", "__doc")
      .agg(collect_list(struct(col("__term").as("t"), contrib.as("c"))).as("__cs"))
      .withColumn("score", round(
        aggregate(array_sort(col("__cs")), lit(0.0d),
          (acc, x) => acc + x.getField("c")), 4))
      .drop("__cs")
      .filter(col("score") > 0)
    val w = Window.partitionBy(col("__qid"))
      .orderBy(col("score").desc, col("__doc"))
    scored.withColumn("__rank", row_number().over(w))
      .filter(col("__rank") <= k)
      .select(col("__qid").as(qIdCol), col("__doc").as(idCol), col("score"))
  }

  /** Top-`k` characteristic terms per document by TF-IDF — the keyword /
    * topic-signal extraction stage of a corpus pipeline. Smooth-idf
    * weighting (`tf · (ln((1+N)/(1+df)) + 1)`, the sklearn formulation,
    * public-standard), scores rounded to 4 decimals, ties broken on
    * ascending term so output is engine-portable.
    *
    * Shape at scale: one explode of the token stream into a single
    * (doc, term) count aggregation — map-side combine absorbs in-document
    * repetition before the one full shuffle exact TF-IDF cannot avoid.
    * Per-term document frequency is a per-term AGGREGATE of the postings
    * joined back on term (the skew-safe [[graft.ops.Dedup.withKeyAgg]]
    * shape: map-side combine collapses each task to its distinct terms,
    * and the join is AQE-broadcastable/skew-splittable — a df WINDOW over
    * raw terms would put a Zipf-head term's entire posting list into one
    * task, with no partial combine and no AQE escape). Both branches
    * share the postings subtree below its (doc, term) exchange, so the
    * corpus scan is not repeated (ReuseExchange / AQE stage reuse). The
    * one-row corpus count broadcasts back, and the per-doc top-k rank
    * window prunes to k rows per doc map-side (WindowGroupLimit).
    * Returns (idCol, term, score, rank). */
  def tfidfKeywords(docs: DataFrame, idCol: String, textCol: String,
                    k: Int): DataFrame = {
    require(k > 0, "k must be positive")
    val spreadDocs = Dedup.spread(docs, col(idCol))
    val postings = spreadDocs
      .select(col(idCol).as("__doc"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("__doc"), explode(col("__toks")).as("__term"))
      .filter(col("__term") =!= "")
      .groupBy("__doc", "__term").agg(count(lit(1)).as("__tf"))
    // df(term) = distinct docs containing the term, as its own NARROW
    // pass (per-doc distinct tokens → one (term) count with map-side
    // partial combine): a second reference to `postings` re-computes
    // its whole explode + (doc, term) exchange — per-branch column
    // pruning defeats AQE stage reuse (verified on executed adaptive
    // plans) — and a term window would funnel a hot term into one task.
    // Unlike bm25Batch's query-bounded df, this one is vocabulary-sized,
    // so the join back stays a plain equi-join (AQE broadcasts it when
    // it fits, skew-splits it when it doesn't).
    val dfCounts = spreadDocs
      .select(explode(array_distinct(TextOps.tokens(col(textCol)))).as("__term"))
      .filter(col("__term") =!= "")
      .groupBy("__term").agg(count(lit(1)).as("__dfc"))
    val withDf = postings.join(dfCounts, Seq("__term"))
    val stats = docs.agg(count(lit(1)).as("__n"))
    val score = round(col("__tf").cast("double") *
      (log((lit(1.0) + col("__n").cast("double")) /
           (lit(1.0) + col("__dfc").cast("double"))) + lit(1.0)), 4)
    val w = Window.partitionBy(col("__doc"))
      .orderBy(col("score").desc, col("__term"))
    withDf.crossJoin(broadcast(stats))
      .withColumn("score", score)
      .withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("__doc").as(idCol), col("__term").as("term"),
        col("score"), col("rank"))
  }

  /** Per-document mean token surprisal (negative log-likelihood) under
    * the corpus's own unigram language model — the cheap
    * fluency/gibberish signal (a CCNet-style perplexity filter with the
    * n=1 model that needs no external artifact: p(t) = count(t)/Σcounts
    * over this corpus). LOWER = more typical; rare-token soup scores
    * high. Kept positive so the 4-decimal rounding emulation stays exact
    * on every engine. Documents with zero tokens are omitted.
    *
    * Shape at scale: one posexplode of the token stream, one shuffle
    * joining tokens to the aggregated vocabulary (the vocab can exceed
    * broadcast size at corpus scale, so it stays a shuffled hash join —
    * AQE downgrades to broadcast when it fits), the one-row total
    * broadcasts, and the per-doc mean folds the per-token logs in token
    * POSITION order (collect/sort/fold like [[bm25Batch]]) so the score
    * is bit-stable across physical layouts and replayable by the SQL
    * oracle. Returns (idCol, n_tokens, nll). */
  def unigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val toks = Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("__doc"), TextOps.tokens(col(textCol)).as("__toks"))
      .select(col("__doc"), posexplode(col("__toks")).as(Seq("__pos", "__term")))
      .filter(col("__term") =!= "")
    val vocab = toks.groupBy("__term").agg(count(lit(1)).as("__cnt"))
    // corpus token total as a MAP-ONLY pass over the docs (Σ per-doc
    // token counts ≡ Σ vocab counts — same long, bit-identical logp
    // denominators). Deriving it from `vocab` re-computed the whole
    // explode + (term) aggregate chain a third time: per-branch column
    // pruning makes shared subtrees canonically unequal, so AQE never
    // stage-reuses the vocab exchange (verified on the executed
    // adaptive plan — the old comment claiming ReuseExchange dedupes it
    // was wrong).
    val total = docs.agg(
      sum(TextOps.tokenCount(col(textCol)).cast("long")).as("__tot"))
    val logp = log(col("__cnt").cast("double") / col("__tot").cast("double"))
    toks.join(vocab, Seq("__term"))
      .crossJoin(broadcast(total))
      .groupBy("__doc")
      .agg(collect_list(struct(col("__pos").as("p"), logp.as("lp"))).as("__ls"))
      .select(col("__doc").as(idCol),
        size(col("__ls")).cast("long").as("n_tokens"),
        round(-(aggregate(array_sort(col("__ls")), lit(0.0d),
          (acc, x) => acc + x.getField("lp")) / size(col("__ls"))), 4)
          .as("nll"))
  }

  /** Per-document mean BIGRAM surprisal under the corpus's own bigram
    * model — [[unigramNll]]'s sharper sibling: `p(cur|prev) =
    * c(prev,cur) / c(prev)` (MLE, no smoothing needed because every
    * in-document bigram exists in the corpus by construction), scored as
    * the mean −ln p over a document's bigram positions. Word-salad that
    * sneaks past unigram frequencies (common words in impossible orders)
    * scores high here. Documents with fewer than 2 tokens are omitted.
    *
    * Shape at scale: bigrams zip map-side from the materialized token
    * array (no self-join), one (prev, cur) count shuffle with map-side
    * combine, a unigram-context join on prev, and the per-doc fold runs
    * in bigram POSITION order (the [[bm25Batch]] pattern) so scores are
    * bit-stable and oracle-replayable. Returns (idCol, n_bigrams, nll). */
  def bigramNll(docs: DataFrame, idCol: String, textCol: String): DataFrame = {
    val base = Dedup.spread(docs, col(idCol))
      .select(col(idCol).as("__doc"), TextOps.tokens(col(textCol)).as("__toks"))
    val bigrams = base
      .select(col("__doc"), posexplode(zip_with(
        slice(col("__toks"), lit(1), size(col("__toks")) - 1),
        slice(col("__toks"), lit(2), size(col("__toks")) - 1),
        (a, b) => struct(a.as("p"), b.as("c")))).as(Seq("__pos", "__bg")))
      .select(col("__doc"), col("__pos"),
        col("__bg.p").as("__prev"), col("__bg.c").as("__cur"))
      .filter(col("__prev") =!= "" && col("__cur") =!= "")
    val bigramCounts = bigrams.groupBy("__prev", "__cur")
      .agg(count(lit(1)).as("__c2"))
    val uniCounts = base
      .select(explode(col("__toks")).as("__prev"))
      .filter(col("__prev") =!= "")
      .groupBy("__prev").agg(count(lit(1)).as("__c1"))
    val logp = log(col("__c2").cast("double") / col("__c1").cast("double"))
    bigrams
      .join(bigramCounts, Seq("__prev", "__cur"))
      .join(uniCounts, Seq("__prev"))
      .groupBy("__doc")
      .agg(collect_list(struct(col("__pos").as("p"), logp.as("lp"))).as("__ls"))
      .select(col("__doc").as(idCol),
        size(col("__ls")).cast("long").as("n_bigrams"),
        round(-(aggregate(array_sort(col("__ls")), lit(0.0d),
          (acc, x) => acc + x.getField("lp")) / size(col("__ls"))), 4)
          .as("nll"))
  }

  /** Pure higher-order-function formulation of the [dl, tf…] vector —
    * value-identical to the native TermFreqsExpr kernel (asserted in
    * tests), kept as the reference implementation and codegen
    * cross-check. */
  private[graft] def termFreqsHof(c: Column, terms: Seq[String]): Column = {
    val toks = TextOps.tokens(c)
    array(TextOps.tokenCount(c) +:
      terms.map(t => size(filter(toks, x => x === lit(t)))): _*)
  }
}
