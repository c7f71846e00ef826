package graft.tools

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import java.util.concurrent.atomic.AtomicLong

/** Hunts the episodic multi-second stalls seen in ProfileAnn: repeatedly
  * executes the x5 pair-generation plan, records per-stage executor task
  * time vs wall time, and samples thread stacks mid-run when a run is slow.
  */
object ProfileStall {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import graft.ops.{Dedup, Similarity}
    import graft.sources.TableRegistry

    val taskTime = new AtomicLong(0) // executorRunTime ms across tasks
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onTaskEnd(t: SparkListenerTaskEnd): Unit =
        if (t.taskMetrics != null) taskTime.addAndGet(t.taskMetrics.executorRunTime)
    })

    // background sampler: every 400ms dump distinct busy top-frames
    val samples = new java.util.concurrent.ConcurrentHashMap[String, Integer]()
    @volatile var sampling = false
    val sampler = new Thread(() => {
      while (true) {
        if (sampling) {
          val traces = Thread.getAllStackTraces
          traces.forEach { (th, st) =>
            if (th.getState == Thread.State.RUNNABLE && st.nonEmpty &&
                (th.getName.startsWith("Executor task") || th.getName.contains("dag-scheduler") || th.getName.contains("main"))) {
              val frame = st.take(4).mkString(" <- ")
              samples.merge(frame, 1, (a, b) => a + b)
            }
          }
        }
        Thread.sleep(400)
      }
    }); sampler.setDaemon(true); sampler.start()

    val dir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val e = TableRegistry.table(spark, dir, "embeddings")
      .select(col("vec_id"), col("embedding").cast("array<double>").as("embedding"))
    e.count()
    val perturbed = e.select((col("vec_id") + 1000000).as("vec_id"),
      transform(col("embedding"), (x, i) =>
        x * (lit(1.0) + (i % 7).cast("double") / 1000)).as("embedding"))
    val u = e.unionByName(perturbed)
    val bands = 8; val bitsPerBand = 8; val bits = bands * bitsPerBand; val d = 64
    def mkPairs() = {
      val rows = Dedup.spread(u)
        .select(col("vec_id").as("id"), col("embedding").as("vec"),
          Similarity.norm(col("embedding")).as("nrm"),
          Similarity.hyperplaneSignature(col("embedding"), bits, d).as("sig"))
      val banded = rows
        .select(struct(col("id"), col("vec"), col("nrm")).as("p"),
          posexplode(transform(sequence(lit(0), lit(bands - 1)),
            b => xxhash64(concat_ws(",", slice(col("sig"), b * lit(bitsPerBand) + 1, lit(bitsPerBand)))))))
        .withColumnRenamed("pos", "band").withColumnRenamed("col", "bucket")
      Dedup.bucketPairsWithPayload(banded)
    }
    val reused = mkPairs()
    for (i <- 1 to 10) {
      val fresh = if (i % 2 == 0) mkPairs() else reused
      val tag = if (i % 2 == 0) "fresh " else "reused"
      samples.clear(); taskTime.set(0); sampling = true
      val t0 = System.nanoTime()
      val n = fresh.count()
      val dt = (System.nanoTime() - t0) / 1e9
      sampling = false
      println(f"run$i%2d $tag $dt%6.2f s  taskTime=${taskTime.get() / 1000.0}%7.2f s  ($n rows)")
      if (dt > 3.0) {
        println("  busy frames during slow run:")
        samples.entrySet().stream()
          .sorted((a, b) => b.getValue - a.getValue).limit(8)
          .forEach(en => println(f"   ${en.getValue}%4d  ${en.getKey.take(220)}"))
      }
    }
    spark.stop()
  }
}
