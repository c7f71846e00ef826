package graft.tools

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerStageCompleted}
import org.apache.spark.sql.SparkSession

import scala.collection.mutable

/** Per-job breakdown of one bench query (guide §1: measure first).
  *
  * Runs the named SparkEntry queries with the Bench session settings,
  * two untimed warmup passes (Bench's methodology — the first pays
  * codegen compilation, the second lets the C2 queue drain) then a
  * timed pass, and prints every Spark
  * job the timed execution launched — duration, stage/task counts, and
  * the callsite — so a multi-job operator composition (the artifact
  * maintenance rows) shows WHERE its wall-clock goes: which jobs are
  * the corpus-consuming aggregations and which are fixed-overhead
  * commit/readback jobs worth fusing or removing.
  *
  *   sbt "runMain graft.tools.ProfileJobs x91_vocab_compact ..."
  */
object ProfileJobs {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    final case class JobRec(id: Int, var name: String = "",
                            var startMs: Long = 0L, var endMs: Long = 0L,
                            var stages: Int = 0, var tasks: Int = 0)
    val jobs = mutable.LinkedHashMap[Int, JobRec]()
    @volatile var recording = false
    val listener = new SparkListener {
      override def onJobStart(js: SparkListenerJobStart): Unit = if (recording) {
        val r = JobRec(js.jobId)
        r.name = Option(js.properties)
          .flatMap(p => Option(p.getProperty("callSite.short"))).getOrElse("?")
        r.startMs = js.time
        r.stages = js.stageInfos.size
        r.tasks = js.stageInfos.map(_.numTasks).sum
        jobs.synchronized { jobs(js.jobId) = r }
      }
      override def onJobEnd(je: SparkListenerJobEnd): Unit = if (recording) {
        jobs.synchronized { jobs.get(je.jobId).foreach(_.endMs = je.time) }
      }
      override def onStageCompleted(sc: SparkListenerStageCompleted): Unit = ()
    }
    spark.sparkContext.addSparkListener(listener)

    val names = if (args.nonEmpty) args.toSeq else Seq("x91_vocab_compact")
    val qmap = graft.SparkEntry.queries.toMap
    graft.sources.TableRegistry.warmup(spark, sfDir, Seq("region", "nation",
      "customer", "supplier", "part", "orders", "lineitem", "events",
      "documents", "embeddings"))
    for (n <- names) {
      val fn = qmap.getOrElse(n, sys.error(s"unknown query $n"))
      // two untimed warmups, matching Bench's methodology
      fn(spark, sfDir).count(); fn(spark, sfDir).count()
      jobs.synchronized { jobs.clear() }
      recording = true
      val t0 = System.nanoTime()
      fn(spark, sfDir).count()
      val totalMs = (System.nanoTime() - t0) / 1e6
      recording = false
      Thread.sleep(300) // let the listener bus drain
      println(s"== $n: total ${totalMs.round} ms, ${jobs.size} jobs ==")
      val snap = jobs.synchronized { jobs.values.toSeq }
      var acct = 0L
      snap.foreach { r =>
        val d = math.max(0L, r.endMs - r.startMs)
        acct += d
        println(f"  job ${r.id}%4d ${d}%6d ms  stages=${r.stages}%2d tasks=${r.tasks}%4d  ${r.name}")
      }
      println(f"  [sum of job walls ${acct} ms; gaps (driver/planning/fs) ${totalMs.round - acct} ms]")
    }
    spark.stop()
  }
}
