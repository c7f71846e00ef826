package graft.tools

import org.apache.spark.sql.SparkSession

/** Dev tool: phase breakdown of the big-body CSV store path (the one
  * BENCH_NOTES number outside the reference envelope). Generates an
  * sf1-scale CSV body (6M rows, ~390 MB) and times: fromCsv (driver
  * split + inference job), the parse pass (count on the parsed frame),
  * and the full store layout (range partition + sort + persist + count). */
object ProfileStoreBig {
  def main(args: Array[String]): Unit = {
    val rows = args.headOption.map(_.toInt).getOrElse(6000000)
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rowId = graft.engine.ExprCompiler.RowId

    val sb = new java.lang.StringBuilder(rows * 70)
    sb.append("okey,lnum,pkey,skey,qty,price,disc,tax,rflag,lstat,sdate\n")
    var i = 0
    while (i < rows) {
      sb.append(i / 4).append(',').append(i % 4).append(',')
        .append(i % 200000).append(',').append(i % 10000).append(',')
        .append(i % 50).append(',').append((i % 900000) / 100.0).append(',')
        .append((i % 11) / 100.0).append(',').append((i % 9) / 100.0).append(',')
        .append(if (i % 3 == 0) "R" else "N").append(',')
        .append(if (i % 2 == 0) "O" else "F").append(',')
        .append("1997-0").append(i % 9 + 1).append("-1").append(i % 9).append('\n')
      i += 1
    }
    val body = sb.toString
    println(f"body: ${body.length / 1e6}%.0f MB chars, $rows rows")

    for (r <- 1 to 3) {
      System.gc()
      val t0 = System.nanoTime()
      val parsed = graft.sources.Ingest.fromCsv(spark, body)
      val t1 = System.nanoTime()
      parsed.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      val n = parsed.count()
      val t2 = System.nanoTime()
      val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (rows.toLong / 50000L).toInt))
      val df = parsed.repartitionByRange(parts, parsed(rowId))
        .sortWithinPartitions(rowId)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
      val t3 = System.nanoTime()
      println(f"round $r: fromCsv(split+infer)=${(t1 - t0) / 1e9}%5.2f s  " +
        f"parse+cache=${(t2 - t1) / 1e9}%5.2f s  layout=${(t3 - t2) / 1e9}%5.2f s  " +
        f"total=${(t3 - t0) / 1e9}%5.2f s  rows=$n")
      df.unpersist(); parsed.unpersist()
    }
    spark.stop()
  }
}
