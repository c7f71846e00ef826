package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Keyword retrieval over a document corpus — the lexical counterpart to
  * the ANN family in [[Similarity]] (the qcache reference has no search
  * operator; BM25 is the public-standard ranking function, Robertson &
  * Zaragoza 2009, with the +1 idf flooring Lucene uses so scores stay
  * non-negative at any document frequency).
  *
  * Shape at scale: the query is a handful of literal terms, so per-doc
  * term frequencies come from q codegen'd `filter` passes over the token
  * array — a map-only projection with NO explode and NO (term, doc)
  * shuffle; an inverted-index build would shuffle the whole corpus to
  * answer one query. Corpus statistics (N, Σdl, per-term df) reduce to a
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

    val toks = TextOps.tokens(col(textCol))
    val tfCols = terms.zipWithIndex.map { case (t, i) =>
      size(filter(toks, x => x === lit(t))).as(s"__tf$i")
    }
    val base = docs.select(
      col(idCol) +: TextOps.tokenCount(col(textCol)).as("__dl") +: tfCols: _*)

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
}
