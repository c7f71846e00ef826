package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *   - brute-force top-k: broadcast the (small) query set against the
  *     corpus — map-side cosine per (query, row), per-query top-k via
  *     window. No corpus shuffle at all; scales linearly with corpus size
  *     and executor count.
  *   - LSH-bucketed: random-hyperplane sign bits (computed with
  *     deterministic pseudo-hyperplanes from xxhash64) → candidates share
  *     a signature band → exact cosine only within buckets. The scale path
  *     when the query set is itself large.
  *
  * Vector math uses zip_with/aggregate higher-order expressions — no UDFs.
  * Embedding-cosine near-duplicate detection reuses the same primitives.
  */
object Similarity {

  /** Vector dimensionality probe (one tiny job); callers on fixed-dim
    * corpora should pass dim explicitly instead. */
  def vecDim(df: DataFrame, vecCol: String): Int =
    df.select(size(col(vecCol))).head.getInt(0)

  /** Dot product of two array<numeric> columns. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0d), (acc, x) => acc + x)

  def norm(a: Column): Column = sqrt(dot(a, a))

  def cosine(a: Column, b: Column): Column = {
    val d = norm(a) * norm(b)
    when(d === 0, lit(0.0)).otherwise(dot(a, b) / d)
  }

  /** Brute-force cosine top-k: for each query vector, the k most similar
    * corpus vectors (excluding self). Query side is broadcast — the corpus
    * is scanned once, map-side, then only (nQueries × corpusRows reduced by
    * window top-k) flows into the shuffle. */
  def bruteForceTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
                     vecCol: String, k: Int): DataFrame = {
    val q = broadcast(queries.select(col(idCol).as("query_id"), col(vecCol).as("qvec")))
    val c = corpus.select(col(idCol).as("neighbor_id"), col(vecCol).as("cvec"))
    val scored = c.join(q, col("query_id") =!= col("neighbor_id"))
      .withColumn("cos", cosine(col("qvec"), col("cvec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    scored.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Deterministic ±1 hyperplane components from a splitmix64-style mix —
    * computed once on the driver and shipped as literals, so signature
    * evaluation is pure multiply-add over the vector (no per-element
    * hashing at runtime). */
  private def planeSign(j: Int, i: Int): Double = {
    var z = j.toLong * 0x9E3779B97F4A7C15L + i.toLong * 0xBF58476D1CE4E5B9L + 0x94D049BB133111EBL
    z = (z ^ (z >>> 30)) * 0xBF58476D1CE4E5B9L
    z = (z ^ (z >>> 27)) * 0x94D049BB133111EBL
    z ^= z >>> 31
    if ((z & 1L) == 0L) 1.0 else -1.0
  }

  /** Random-hyperplane signature: bit j = sign of <v, h_j>. The hyperplanes
    * are literal ±1 arrays (dim must be known — embeddings have a fixed
    * dimensionality), making each bit one zip_with/aggregate pass with no
    * hashing in the row path. */
  def hyperplaneSignature(vec: Column, bits: Int, dim: Int): Column =
    array((0 until bits).map { j =>
      val plane = typedLit((0 until dim).map(i => planeSign(j, i)))
      val proj = aggregate(zip_with(vec, plane, (x, s) => x * s),
        lit(0.0d), (acc, x) => acc + x)
      when(proj >= 0, lit(1)).otherwise(lit(0))
    }: _*)

  /** LSH-bucketed ANN: candidates must share one full band of the
    * hyperplane signature; exact cosine ranks candidates per query.
    * Recall < 1 by construction — `bands`×`bitsPerBand` trades recall for
    * candidate volume. */
  def lshTopK(corpus: DataFrame, queries: DataFrame, idCol: String,
              vecCol: String, k: Int, bands: Int = 8, bitsPerBand: Int = 4,
              dim: Int = -1): DataFrame = {
    val bits = bands * bitsPerBand
    val d = if (dim > 0) dim else vecDim(corpus, vecCol)
    def banded(df: DataFrame, side: String) =
      df.select(col(idCol).as(s"${side}_id"), col(vecCol).as(s"${side}_vec"),
          hyperplaneSignature(col(vecCol), bits, d).as("sig"))
        .select(col(s"${side}_id"), col(s"${side}_vec"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(bitsPerBand) + 1, lit(bitsPerBand)))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")

    val c = banded(corpus, "neighbor")
    val q = banded(queries, "query")
    val cand = q.join(c, Seq("band", "bucket"))
      .filter(col("query_id") =!= col("neighbor_id"))
      .select("query_id", "query_vec", "neighbor_id", "neighbor_vec")
      .dropDuplicates("query_id", "neighbor_id")
      .withColumn("cos", cosine(col("query_vec"), col("neighbor_vec")))
    val w = Window.partitionBy(col("query_id"))
      .orderBy(col("cos").desc, col("neighbor_id"))
    cand.withColumn("rank", row_number().over(w))
      .filter(col("rank") <= k)
      .select(col("query_id"), col("rank"), col("neighbor_id"),
        round(col("cos"), 6).as("cos"))
  }

  /** Embedding-cosine near-duplicate pairs (cos ≥ threshold) via the same
    * LSH bucketing, self-join form. */
  def cosineNearDupPairs(df: DataFrame, idCol: String, vecCol: String,
                         threshold: Double, bands: Int = 8,
                         bitsPerBand: Int = 8, dim: Int = -1): DataFrame = {
    val bits = bands * bitsPerBand
    val d = if (dim > 0) dim else vecDim(df, vecCol)
    val sigs = df.select(col(idCol).as("id"), col(vecCol).as("vec"),
        hyperplaneSignature(col(vecCol), bits, d).as("sig"))
      .select(col("id"), col("vec"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(bitsPerBand) + 1, lit(bitsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val l = sigs.select(col("band"), col("bucket"), col("id").as("id_a"), col("vec").as("vec_a"))
    val r = sigs.select(col("band"), col("bucket"), col("id").as("id_b"), col("vec").as("vec_b"))
    l.join(r, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .dropDuplicates("id_a", "id_b")
      .withColumn("cos", cosine(col("vec_a"), col("vec_b")))
      .filter(col("cos") >= threshold)
      .select(col("id_a"), col("id_b"), round(col("cos"), 6).as("cos"))
  }
}
