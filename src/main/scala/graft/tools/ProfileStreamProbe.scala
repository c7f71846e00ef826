package graft.tools
import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream

/** Per-trigger cost of the streaming index probe with and without the
  * persisted static side (round 14): a MinHash index over sf0.1
  * documents (50k docs at sf0.1), a MemoryStream feeding one tiny
  * micro-batch per trigger, and wall-clock per processAllAvailable.
  * persistStatic=false re-scans the signature parquet every trigger;
  * true serves it from the MEMORY_AND_DISK cache after the first. */
object ProfileStreamProbe {
  case class Doc(ts: Timestamp, doc_id: Long, text: String)

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val docs = graft.sources.TableRegistry.table(spark, sfDir, "documents")
    val path = java.nio.file.Files.createTempDirectory("probe_prof").toString + "/idx"
    val art = graft.ops.MinHashIndex.buildAndSave(docs, "doc_id", "text", path = path)

    def drive(persist: Boolean, triggers: Int): Seq[Double] = {
      val fresh = graft.ops.MinHashIndex.load(spark, path)
      val input = MemoryStream[Doc]
      val q = graft.ops.Dedup.minhashPairsAgainstIndexStream(input.toDF(),
        "doc_id", "text", "ts", "10 minutes", fresh, threshold = 0.5,
        persistStatic = persist)
        .writeStream.format("memory")
        .queryName(s"probe_${persist}_${System.nanoTime()}")
        .start()
      try {
        (1 to triggers).map { i =>
          input.addData(Doc(Timestamp.valueOf(f"2024-01-01 10:$i%02d:00"),
            1000000L + i, "the quick brown fox jumps over the lazy dog"))
          val t0 = System.nanoTime()
          q.processAllAvailable()
          (System.nanoTime() - t0) / 1e9
        }
      } finally { q.stop(); fresh.sigs.unpersist() }
    }

    for (persist <- Seq(false, true)) {
      val times = drive(persist, 6)
      println(f"persistStatic=$persist%-5s per-trigger: " +
        times.map(t => f"$t%5.2f").mkString(" ") +
        f"  (steady: ${times.drop(2).min}%5.2f s)")
    }
    spark.stop()
  }
}
