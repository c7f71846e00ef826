package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileMinhash {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.Dedup
    import graft.sources.TableRegistry
    // mimic Bench: registry-cached table
    val df = TableRegistry.table(spark, "/root/testdata/sf0.1", "documents")
    df.count()
    def run(label: String): Unit = {
      val t0 = System.nanoTime()
      val n = Dedup.minhashPairs(df, "doc_id", "text", 64, 16, 0.6, 3)
        .orderBy("id_a", "id_b").count()
      println(f"$label: ${(System.nanoTime()-t0)/1e9}%6.2f s ($n pairs)")
    }
    run("x2 run 1 (cold codegen)")
    run("x2 run 2 (warm)")
    run("x2 run 3 (warm)")
    spark.stop()
  }
}
