package graft

import org.scalatest.funsuite.AnyFunSuite
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Measured recall@k of the approximate ANN paths against brute force on
  * the real embeddings fixture — the approximate operators' quality gate.
  * Everything is deterministic (hash-based signatures, fixed centroids),
  * so recall is a stable number, pinned here with headroom.
  */
class AnnRecallSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark

  private lazy val emb = spark.read
    .parquet("/root/testdata/sf0.01/embeddings.parquet")
    .withColumn("embedding", col("embedding").cast("array<double>"))
  private lazy val queries = emb.filter(col("vec_id") < 20)

  private def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
    df.collect()
      .map(r => (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id")))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap

  private lazy val brute = topSet(
    Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", k = 10))

  private def recallOf(approx: Map[Long, Set[Long]]): Double = {
    val hits = brute.map { case (q, truth) =>
      approx.getOrElse(q, Set.empty).count(truth.contains).toDouble / truth.size
    }
    hits.sum / hits.size
  }

  test("semanticDedup LSH path: never over-drops, and drop recall clears the pinned floor") {
    // x61's spike recipe on the real fixture: perturbed copies of the
    // first 150 vectors at cos ≈ 0.999998, fixed centroids = first 4 rows
    val cents: Seq[Seq[Double]] = emb.filter(col("vec_id") < 4).orderBy("vec_id")
      .select(col("embedding")).collect().map(_.getSeq[Double](0).toSeq).toSeq
    val base = emb.select(col("vec_id"), col("embedding"))
    val perturbed = base.filter(col("vec_id") < 150)
      .select((col("vec_id") + (1L << 40)).as("vec_id"),
        transform(col("embedding"), (x, i) =>
          x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
    val u = base.unionByName(perturbed)
    def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
      df.select("vec_id").collect().map(_.getLong(0)).toSet
    val exact = ids(Similarity.semanticDedupExact(u, "vec_id", "embedding",
      cents, maxId = Long.MaxValue, threshold = 0.95))
    val lsh = ids(Similarity.semanticDedup(u, "vec_id", "embedding",
      cents, threshold = 0.95))
    // cosine verifies in-bucket, so the LSH pair set is a SUBSET of the
    // true pair set: it can only drop fewer rows, never a wrong one
    assert(exact.subsetOf(lsh))
    val all = ids(u)
    val dropRecall =
      (all -- lsh).size.toDouble / math.max((all -- exact).size, 1)
    info(f"semanticDedup drop recall = $dropRecall%.3f")
    assert(dropRecall >= 0.95, f"SemDeDup LSH drop recall degraded: $dropRecall%.3f")
  }

  test("IVF recall@10 at nProbe=8/32 clears the pinned floor") {
    val ivf = topSet(Similarity.ivfTopK(emb, queries, "vec_id", "embedding",
      k = 10, nCells = 32, nProbe = 8, dim = 64))
    val r = recallOf(ivf)
    info(f"ivf recall@10 = $r%.3f")
    assert(r >= 0.35, f"IVF recall degraded: $r%.3f")
  }

  test("k-means refinement does not reduce IVF recall") {
    val plain = recallOf(topSet(Similarity.ivfTopK(emb, queries, "vec_id",
      "embedding", k = 10, nCells = 32, nProbe = 8, dim = 64)))
    val refined = recallOf(topSet(Similarity.ivfTopK(emb, queries, "vec_id",
      "embedding", k = 10, nCells = 32, nProbe = 8, dim = 64, kmeansIters = 2)))
    info(f"ivf recall plain=$plain%.3f refined=$refined%.3f")
    assert(refined >= plain - 0.05,
      f"refinement hurt recall: $plain%.3f -> $refined%.3f")
  }

  test("LSH recall@10 clears the pinned floor") {
    val lsh = topSet(Similarity.lshTopK(emb, queries, "vec_id", "embedding",
      k = 10, dim = 64))
    val r = recallOf(lsh)
    info(f"lsh recall@10 = $r%.3f")
    assert(r >= 0.25, f"LSH recall degraded: $r%.3f")
  }
}
