package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage profiler for the two bench-dominating ANN queries
  * (x14_ann_ivf, x5_dedup_embcos). Each stage's count() re-executes its
  * predecessors, so the per-stage cost is the delta between consecutive
  * timings. Run twice per plan — the first run pays codegen compilation.
  */
object ProfileAnn {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Similarity}
    import graft.sources.TableRegistry

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = TableRegistry.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    e.count()

    // surface per-compile timings (CodeGenerator logs at INFO) while the
    // root logger stays at ERROR
    org.apache.logging.log4j.core.config.Configurator.setLevel(
      "org.apache.spark.sql.catalyst.expressions.codegen.CodeGenerator",
      org.apache.logging.log4j.Level.INFO)

    import scala.jdk.CollectionConverters._
    def gcMillis: Long = java.lang.management.ManagementFactory
      .getGarbageCollectorMXBeans.asScala.map(_.getCollectionTime).sum

    def time(label: String)(f: => Long): Unit = {
      val g0 = gcMillis
      val t0 = System.nanoTime()
      val n = f
      val dt = (System.nanoTime() - t0) / 1e9
      println(f"$label%-28s $dt%7.2f s  gc=${(gcMillis - g0) / 1000.0}%5.2f s  ($n rows)")
    }

    // ---- x14 ivf ----
    println("== x14_ann_ivf ==")
    def ivf() = Similarity.ivfTopK(e, e.filter(col("vec_id") < 10), "vec_id",
      "embedding", k = 5, nCells = 32, nProbe = 8, dim = 64).orderBy("query_id", "rank")
    time("ivf run1 (cold)") { ivf().count() }
    time("ivf run2 (warm)") { ivf().count() }
    time("ivf run3 (warm)") { ivf().count() }

    // ---- x5 embcos, staged ----
    println("== x5_dedup_embcos stages ==")
    val perturbed = e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
    val u = e.unionByName(perturbed)
    val bands = 8; val bitsPerBand = 8; val bits = bands * bitsPerBand; val d = 64
    val rows = Dedup.spread(u, col("vec_id"))
      .select(col("vec_id").as("id"), col("embedding").as("vec"),
        Similarity.norm(col("embedding")).as("nrm"),
        Similarity.hyperplaneSignature(col("embedding"), bits, d).as("sig"))
    val banded = rows
      .select(struct(col("id"), col("vec"), col("nrm")).as("p"),
        posexplode(transform(sequence(lit(0), lit(bands - 1)),
          b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(bitsPerBand) + 1, lit(bitsPerBand)))))))
      .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
    val grouped = banded.groupBy(col("band"), col("bucket"))
      .agg(array_sort(collect_set(col("p"))).as("ps"))
      .filter(size(col("ps")).between(2, 1000))
    val pairs = Dedup.bucketPairsWithPayload(banded)
    val cos = pairs.withColumn("cos", Similarity.cosine(col("a.vec"), col("b.vec")))
      .filter(col("cos") >= 0.95)

    for (r <- 1 to 2) {
      println(s"-- pass $r --")
      time("union input") { u.count() }
      time("rows (sig+norm)") { rows.count() }
      time("banded (explode)") { banded.count() }
      time("grouped (collect_set)") { grouped.count() }
      time("pairs (explode tri)") { pairs.count() }
      time("pairs+cos filter") { cos.count() }
      time("full cosineNearDupPairs") {
        Similarity.cosineNearDupPairs(u, "vec_id", "embedding",
          threshold = 0.95, dim = 64).orderBy("id_a", "id_b").count()
      }
    }
    spark.stop()
  }
}
