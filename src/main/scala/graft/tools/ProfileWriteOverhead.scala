package graft.tools

import org.apache.spark.sql.{SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Isolates the fixed cost of one artifact-sized parquet write action —
  * the unit the vocabulary/minhash/bloom maintenance compositions pay
  * 20-50 times per invocation (guide §1: find out whether the time is
  * compute, commit, planning, or listener latency before optimizing
  * any of them).
  *
  * Variants, each over the same 4096-row relation, medians of N reps:
  *   plain      — write.parquet
  *   observed   — two Observation metrics riding the write + .get
  *   noAqe      — plain write with AQE off
  *   sortLimit  — orderBy+limit(4096) before the write (the summary
  *                truncation shape)
  *   readBack   — spark.read.parquet of the written dir + count
  */
object ProfileWriteOverhead {
  def main(args: Array[String]): Unit = {
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val n = 30
    val base = "/tmp/graft_profile_write"
    def df() = spark.range(4096).select(
      concat(lit("tok_"), col("id")).as("token"),
      (col("id") * 7).as("lo"), (col("id") * 9).as("hi"))

    def median(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    def bench(name: String)(f: Int => Unit): Unit = {
      (1 to 5).foreach(f) // warm
      val times = (1 to n).map { i =>
        val t0 = System.nanoTime(); f(i); (System.nanoTime() - t0) / 1e6
      }
      println(f"$name%-12s median ${median(times)}%7.1f ms  min ${times.min}%7.1f  max ${times.max}%7.1f")
    }

    bench("plain") { i =>
      df().write.mode(SaveMode.Overwrite).parquet(s"$base/plain")
    }
    bench("observed") { i =>
      val o1 = org.apache.spark.sql.Observation()
      val o2 = org.apache.spark.sql.Observation()
      df().observe(o1, count(lit(1)).as("n"))
        .observe(o2, sum(col("lo")).as("s"))
        .write.mode(SaveMode.Overwrite).parquet(s"$base/obs")
      graft.ops.Observed.long(o1.get, "n")
      ()
    }
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    bench("noAqe") { i =>
      df().write.mode(SaveMode.Overwrite).parquet(s"$base/noaqe")
    }
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    bench("sortLimit") { i =>
      df().orderBy(col("lo").desc, col("token")).limit(4096)
        .write.mode(SaveMode.Overwrite).parquet(s"$base/sl")
    }
    bench("sortLimObs") { i =>
      val o1 = org.apache.spark.sql.Observation()
      val o2 = org.apache.spark.sql.Observation()
      df().observe(o1, count(lit(1)).as("n"))
        .orderBy(col("lo").desc, col("token")).limit(4096)
        .observe(o2, count(lit(1)).as("n"))
        .write.mode(SaveMode.Overwrite).parquet(s"$base/slo")
      graft.ops.Observed.long(o2.get, "n")
      ()
    }
    bench("readBack") { i =>
      spark.read.parquet(s"$base/plain").count()
    }
    // decompose the action floor: a trivial 1-row action with no file
    // system involvement isolates the bare plan+schedule+collect cost...
    bench("trivial") { i =>
      spark.range(1).count()
    }
    // ...and a pre-resolved reader (one read.parquet, counted N times)
    // isolates the per-action listing/footer/schema share of readBack
    val resolved = spark.read.parquet(s"$base/plain")
    bench("countResolved") { i =>
      resolved.count()
    }
    // fresh path each rep — does Overwrite-to-same-path amortize listing?
    bench("freshPath") { i =>
      df().write.mode(SaveMode.Overwrite).parquet(s"$base/fresh_$i")
    }
    spark.stop()
  }
}
