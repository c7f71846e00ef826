package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Dev tool: stage-cost breakdown of the batch-BM25 plan, with a crude
  * stack sampler over executor threads — the instrument that caught the
  * round-6 regression where `tokenCount(text)` projected ABOVE the token
  * explode re-ran the tokenization regex once per token (~80% of the
  * query; fixed by tokenizing once into an array column and deriving dl
  * + explode from it). `sbt "runMain graft.tools.ProfileBm25"`. */
object ProfileBm25 {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableRegistry.warmup(spark, sfDir, Seq("documents"))

    @volatile var verbose = false
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          s: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit =
        if (verbose) println(f"    stage ${s.stageInfo.stageId}%4d " +
          f"tasks=${s.stageInfo.numTasks} runMs=${s.stageInfo.taskMetrics.executorRunTime}")
    })
    def time(label: String)(f: => Unit): Unit = {
      f // warm
      val runs = (1 to 3).map { _ =>
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      println(f"$label%-24s min=${runs.min}%.3f runs=${runs.map(r => f"$r%.3f").mkString(",")}")
    }

    val qname = args.headOption.getOrElse("x41_bm25_batch")
    val fn = graft.SparkEntry.queries(qname)
    time(s"$qname full")(fn(spark, sfDir).count())
    verbose = true
    fn(spark, sfDir).count()
    verbose = false

    // sample executor stacks during one more run — regex/UTF8String frames
    // inside GeneratedIterator mean a per-row recompute crept back in
    val sampler = new Thread(() => {
      (1 to 30).foreach { _ =>
        Thread.sleep(100)
        import scala.jdk.CollectionConverters._
        Thread.getAllStackTraces.asScala.foreach { case (t, st) =>
          if (t.getName.startsWith("Executor task launch") && st.nonEmpty &&
              !st.head.toString.contains("Unsafe.park"))
            println("SAMPLE: " + st.take(3).map(_.toString).mkString(" <- "))
        }
      }
    })
    sampler.setDaemon(true)
    sampler.start()
    fn(spark, sfDir).count()
    spark.stop()
  }
}
