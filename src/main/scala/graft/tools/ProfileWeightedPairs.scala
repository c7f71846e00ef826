package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Diagnostic for the duplication-proof pairing claim: on a replicated
  * corpus (every document R exact copies), times the plain full-corpus
  * MinHash pairing (x2's shape — pair output quadratic in R) against
  * the weighted variant (collapse first, pair representatives,
  * multiplicities attached) and prints both wall times and output
  * cardinalities. The weighted run's pair count must equal the BASE
  * corpus's near-dup relation count — independent of R — while the
  * plain run's explodes ~R² per relation.
  *
  * Usage: ProfileWeightedPairs <dir> [threshold=0.6] [skipPlain]
  */
object ProfileWeightedPairs {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val thr = args.lift(1).map(_.toDouble).getOrElse(0.6)
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
    val docs = spark.read.parquet(s"$dir/documents.parquet")
    println(s"[wpairs] docs=${docs.count()}")

    def timed(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"[wpairs] $name%-10s pairs=$n%,12d  ${(System.nanoTime() - t0) / 1e9}%8.1f s")
    }
    timed("weighted")(graft.ops.Dedup.minhashPairsWeighted(
      docs, "doc_id", "text", numHashes = 64, bands = 16,
      threshold = thr, shingleSize = 3).count())
    if (!skipPlain)
      timed("plain")(graft.ops.Dedup.minhashPairs(
        docs, "doc_id", "text", numHashes = 64, bands = 16,
        threshold = thr, shingleSize = 3).count())
    spark.stop()
  }
}
