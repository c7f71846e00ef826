package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-level timing of the MinHash LSH pipeline at sf0.1: full runs,
  * then shingle-hash / signature / band-explode sub-plans in isolation.
  * Round-3 findings: signatures cost ~0.1 s; the groupBy of 80k banded
  * rows carrying 512-byte signature payloads costs ~0.6 s regardless of
  * collect_set vs collect_list, and a narrow (id-only) shuffle plus
  * sig re-join trades that for two joins of the same total cost — the
  * warm floor is stage-scheduling overhead, not a payload problem. */
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    import graft.ops.Dedup.{shingleHashesFused, minhashSignature}
    import graft.sources.TableRegistry
    // mimic Bench: registry-cached table
    val df = TableRegistry.table(spark, "/root/testdata/sf0.1", "documents")
    df.count()
    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime(); val n = f
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%6.2f s ($n rows)")
    }
    def run(label: String): Unit =
      time(label)(Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 0.6, 3)
        .orderBy("id_a", "id_b").count())

    run("x2 full run 1 (cold)")
    run("x2 full run 2 (warm)")

    val hashed = df.select(col("doc_id").as("id"),
      shingleHashesFused(col("text"), 3).as("hs"))
    val sigs = hashed.select(col("id"), minhashSignature(col("hs"), 64).as("sig"))
    val banded = sigs.select(struct(col("id"), col("sig")).as("p"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * lit(4) + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    for (i <- 1 to 2) time(s"  shingle-hash only $i")(hashed.select(sum(size(col("hs")))).count())
    for (i <- 1 to 2) time(s"  +signature $i")(sigs.select(sum(size(col("sig")))).count())
    for (i <- 1 to 2) time(s"  +band explode $i")(banded.count())
    run("x2 full run 3 (warm)")
    spark.stop()
  }
}
