package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = spark.read.parquet("/root/testdata/sf0.1/documents.parquet")
    println("input partitions: " + df.rdd.getNumPartitions)
    def time[T](label: String)(f: => T): T = {
      val t0 = System.nanoTime(); val r = f
      println(f"$label%-30s ${(System.nanoTime()-t0)/1e9}%8.2f s"); r
    }
    import graft.ops.Dedup
    // materialize each stage with persist so timings are per-stage
    val hashed = df.repartition(32).select(col("doc_id").as("id"),
      Dedup.shingleHashes(Dedup.shingles(col("text"), 3)).as("hs"))
      .persist(StorageLevel.MEMORY_ONLY)
    time("shingle+hash (materialize)")(hashed.foreach(_ => ()))
    val sigs = hashed.select(col("id"), Dedup.minhashSignature(col("hs"), 64).as("sig"))
      .persist(StorageLevel.MEMORY_ONLY)
    time("signatures (materialize)")(sigs.foreach(_ => ()))
    val banded = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * lit(4) + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      .persist(StorageLevel.MEMORY_ONLY)
    time("banded (materialize)")(banded.foreach(_ => ()))
    val pairs = time("bucketPairs plan+run") {
      val grouped = banded.groupBy(col("band"), col("bucket"))
        .agg(array_sort(collect_set(col("id"))).as("ids"))
        .filter(size(col("ids")).between(2, 1000))
      val p = grouped.select(explode(flatten(transform(
          sequence(lit(0), size(col("ids")) - 2),
          i => transform(
            slice(col("ids"), i + lit(2), size(col("ids")) - i - 1),
            b => struct(element_at(col("ids"), i + lit(1)).as("id_a"), b.as("id_b"))))))
          .as("pair"))
        .select(col("pair.id_a"), col("pair.id_b"))
        .dropDuplicates("id_a", "id_b")
      p.count()
    }
    println("pairs: " + pairs)
    val full = time("full minhashPairs")(
      Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 0.6, 3).count())
    println("out: " + full)
    spark.stop()
  }
}
