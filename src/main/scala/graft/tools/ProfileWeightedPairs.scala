package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the duplication-proof pairing claim, per family: on a
  * replicated corpus (every document/vector R exact copies), times the
  * plain full-corpus pairing (x2/x3/x5's shapes — pair output quadratic
  * in R) against the weighted variant (collapse first, pair
  * representatives, multiplicities attached) and prints both wall times
  * and output cardinalities. The weighted run's pair count must equal
  * the BASE corpus's near-dup relation count — independent of R —
  * while the plain run's explodes ~R² per relation.
  *
  * Families: minhash (x2 vs x90, documents.text), simhash (x3 vs x92,
  * documents.text), embcos (x5 vs x93, embeddings.embedding).
  *
  * Usage: ProfileWeightedPairs <dir> [family=minhash] [skipPlain]
  */
object ProfileWeightedPairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val family = args.lift(1).getOrElse("minhash")
    val skipPlain = args.lift(2).contains("skipPlain")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[wpairs] $name%-10s pairs=$n%,12d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }

    family match {
      case "minhash" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        println(s"[wpairs] family=minhash docs=${docs.count()}")
        timed("weighted")(graft.ops.Dedup.minhashPairsWeighted(
          docs, "doc_id", "text", numHashes = 64, bands = 16,
          threshold = 0.6, shingleSize = 3).count())
        if (!skipPlain)
          timed("plain")(graft.ops.Dedup.minhashPairs(
            docs, "doc_id", "text", numHashes = 64, bands = 16,
            threshold = 0.6, shingleSize = 3).count())
      case "simhash" =>
        val docs = spark.read.parquet(s"$dir/documents.parquet")
        println(s"[wpairs] family=simhash docs=${docs.count()}")
        timed("weighted")(graft.ops.Dedup.simhashPairsWeighted(
          docs, "doc_id", "text", maxHamming = 3).count())
        if (!skipPlain)
          timed("plain")(graft.ops.Dedup.simhashPairs(
            docs, "doc_id", "text", maxHamming = 3).count())
      case "embcos" =>
        val vecs = spark.read.parquet(s"$dir/embeddings.parquet")
          .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
        println(s"[wpairs] family=embcos vecs=${vecs.count()}")
        timed("weighted")(graft.ops.Similarity.cosineNearDupPairsWeighted(
          vecs, "vec_id", "embedding", threshold = 0.95, dim = 64).count())
        if (!skipPlain)
          timed("plain")(graft.ops.Similarity.cosineNearDupPairs(
            vecs, "vec_id", "embedding", threshold = 0.95, dim = 64).count())
      case other => sys.error(s"unknown family: $other (minhash|simhash|embcos)")
    }
    spark.stop()
  }
}
