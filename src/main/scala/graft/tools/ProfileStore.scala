package graft.tools

import org.apache.spark.sql.SparkSession

/** Breaks the store path's latency into stages for a 200k-row CSV body
  * (the BENCH_NOTES store scenario). */
object ProfileStore {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder("id,name,price,qty,flag\n")
    var i = 0
    while (i < 200000) {
      sb.append(i).append(",name_").append(i % 997).append(',')
        .append((i % 10000) / 100.0).append(',').append(i % 50).append(',')
        .append(if (i % 2 == 0) "true" else "false").append('\n')
      i += 1
    }
    val body = sb.toString
    println(s"body: ${body.length / 1024} KiB")

    def time[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"$label%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }

    for (round <- 1 to 3) {
      println(s"-- round $round --")
      val lines = time("createDataset lines") {
        val ds = spark.createDataset(
          body.linesIterator.filter(_.nonEmpty).toSeq)(
          org.apache.spark.sql.Encoders.STRING).coalesce(1)
        ds
      }
      val inferred = time("csv read + inferSchema (lazy+plan)") {
        spark.read.option("header", "true").option("inferSchema", "true")
          .option("nullValue", "").option("emptyValue", "")
          .csv(lines)
      }
      time("schema force") { inferred.schema }
      val withId = inferred.withColumn("__row_id__",
        org.apache.spark.sql.functions.monotonically_increasing_id())
      val persisted = time("persist+count (parse pass)") {
        withId.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        withId.count()
        withId
      }
      time("repartition+persist+count") {
        val spread = persisted.repartition(4)
        spread.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        spread.count()
        persisted.unpersist()
        spread.unpersist()
      }
      persisted.unpersist()
      time("full Ingest.fromCsv+persist+count") {
        val df = graft.sources.Ingest.fromCsv(spark, body)
        df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
        df.count()
        df.unpersist()
      }
    }
    spark.stop()
  }
}
