package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeated-run timing of x4_dedup_jaccard to separate intrinsic plan cost
  * from environmental noise (JIT/GC/codegen). */
object ProfileX4 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val d = graft.sources.TableRegistry.table(spark, dir, "documents")
    d.count()
    import scala.jdk.CollectionConverters._
    def gc = java.lang.management.ManagementFactory.getGarbageCollectorMXBeans
      .asScala.map(_.getCollectionTime).sum
    def jit = java.lang.management.ManagementFactory.getCompilationMXBean
      .getTotalCompilationTime
    for (r <- 1 to 8) {
      val g0 = gc; val j0 = jit
      val t0 = System.nanoTime()
      val n = graft.ops.Dedup.jaccardPairsExact(d, "doc_id", "text",
        maxId = 300, threshold = 0.5).orderBy("id_a", "id_b").count()
      println(f"run $r: ${(System.nanoTime() - t0) / 1e9}%5.2f s  gc=${(gc - g0) / 1000.0}%5.2f  jit=${(jit - j0) / 1000.0}%5.2f  ($n pairs)")
    }
    spark.stop()
  }
}
