package graft.tools
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
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

    // stage breakdown (each warm-measured on its second call)
    val hashed = df.select(col("doc_id").as("id"),
      shingleHashesFused(col("text"), 3).as("hs"))
    val sigs = hashed.select(col("id"), minhashSignature(col("hs"), 64).as("sig"))
    for (i <- 1 to 2) time(s"  shingle-hash only $i")(hashed.select(sum(size(col("hs")))).count())
    for (i <- 1 to 2) time(s"  +signature $i")(sigs.select(sum(size(col("sig")))).count())
    val banded = sigs.select(struct(col("id"), col("sig")).as("p"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * lit(4) + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    for (i <- 1 to 2) time(s"  +band explode $i")(banded.count())
    val groupedSet = banded.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_set(col("p"))).as("ps"))
      .filter(size(col("ps")).between(2, 1000))
    val groupedList = banded.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_list(col("p"))).as("ps"))
      .filter(size(col("ps")).between(2, 1000))
    for (i <- 1 to 2) time(s"  +collect_set agg $i")(groupedSet.count())
    for (i <- 1 to 2) time(s"  +collect_list agg $i")(groupedList.count())
    def pairsOf(g: org.apache.spark.sql.DataFrame) = g
      .select(col("ps"), posexplode(col("ps")))
      .select(col("col").as("a"), explode(slice(col("ps"), col("pos") + lit(2),
        size(col("ps")) - col("pos") - 1)).as("b"))
      .withColumn("est_jaccard",
        size(filter(zip_with(col("a.sig"), col("b.sig"), (x, y) => x === y),
          x => x)).cast("double") / 64.0)
      .filter(col("est_jaccard") >= 0.6)
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"), col("est_jaccard"))
      .dropDuplicates("id_a", "id_b")
    for (i <- 1 to 2) time(s"  +pairs via set $i")(pairsOf(groupedSet).count())
    for (i <- 1 to 2) time(s"  +pairs via list $i")(pairsOf(groupedList).count())
    for (i <- 1 to 2) time(s"  +pairs+orderBy via list $i")(
      pairsOf(groupedList).orderBy("id_a", "id_b").count())

    // narrow variant: shuffle only (band,bucket,id); re-join sigs to verify
    val bandedNarrow = sigs.select(col("id"),
      posexplode(transform(sequence(lit(0), lit(15)),
        b => xxhash64(slice(col("sig"), b * lit(4) + 1, lit(4))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    for (i <- 1 to 2) time(s"  narrow band explode $i")(bandedNarrow.count())
    val narrowIds = bandedNarrow.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_list(col("id"))).as("ids"))
      .filter(size(col("ids")).between(2, 1000))
    for (i <- 1 to 2) time(s"  narrow agg $i")(narrowIds.count())
    def narrowPairs = {
      val cand = narrowIds
        .select(col("ids"), posexplode(col("ids")))
        .select(col("col").as("id_a"), explode(slice(col("ids"), col("pos") + lit(2),
          size(col("ids")) - col("pos") - 1)).as("id_b"))
        .dropDuplicates("id_a", "id_b")
      cand
        .join(sigs.select(col("id").as("id_a"), col("sig").as("sig_a")), Seq("id_a"))
        .join(sigs.select(col("id").as("id_b"), col("sig").as("sig_b")), Seq("id_b"))
        .withColumn("est_jaccard",
          size(filter(zip_with(col("sig_a"), col("sig_b"), (x, y) => x === y),
            x => x)).cast("double") / 64.0)
        .filter(col("est_jaccard") >= 0.6)
        .select(col("id_a"), col("id_b"), round(col("est_jaccard"), 4))
    }
    for (i <- 1 to 2) time(s"  narrow pairs+verify $i")(narrowPairs.count())
    run("x2 full run 3 (warm)")
    spark.stop()
  }
}
