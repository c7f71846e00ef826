package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions.col

/** Post-fix store-path check: warm store latency for a 200k-row CSV via the
  * real ingest+layout code, and the physical plan of an unordered query
  * (must show NO global Sort / Exchange over the cached table). */
object ProfileStore2 {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
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
    val rowId = graft.engine.ExprCompiler.RowId

    def storeOnce(): org.apache.spark.sql.DataFrame = {
      val parsed = graft.sources.Ingest.fromCsv(spark, body)
      val parts = math.max(1, math.min(spark.sparkContext.defaultParallelism,
        (body.count(_ == '\n').toLong / 50000L).toInt))
      val df = parsed.repartitionByRange(parts, parsed(rowId))
        .sortWithinPartitions(rowId)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
      df
    }

    var last: org.apache.spark.sql.DataFrame = null
    for (r <- 1 to 4) {
      val t0 = System.nanoTime()
      val df = storeOnce()
      println(f"store round $r: ${(System.nanoTime() - t0) / 1e9}%5.2f s")
      if (last != null) last.unpersist()
      last = df
    }

    // JSON path: same 200k rows as a records array
    val jsonBody = {
      val jb = new StringBuilder("[")
      var k = 0
      while (k < 200000) {
        if (k > 0) jb.append(',')
        jb.append(s"""{"id":$k,"name":"name_${k % 997}","price":${(k % 10000) / 100.0},"qty":${k % 50}}""")
        k += 1
      }
      jb.append(']').toString
    }
    for (r <- 1 to 3) {
      val t0 = System.nanoTime()
      val df = graft.sources.Ingest.fromJsonRecords(spark, jsonBody)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
      println(f"json store round $r: ${(System.nanoTime() - t0) / 1e9}%5.2f s")
      df.unpersist()
    }

    // unordered query = engine's pandas-order path
    val q = graft.engine.QueryEngine.run(last, """{"where": [">", "qty", 25]}""").df
    println("== physical plan of unordered filter query ==")
    println(q.queryExecution.executedPlan.toString.take(2000))
    // row-order correctness: ids strictly increasing in collect order
    val ids = graft.engine.QueryEngine
      .run(last, """{"select": ["id"]}""").df.collect().map(_.getInt(0))
    val inOrder = ids.zip(ids.tail).forall { case (a, b) => a < b }
    println(s"rows=${ids.length} inOrder=$inOrder first=${ids.take(3).mkString(",")}")
    val t1 = System.nanoTime()
    q.collect()
    println(f"filter query collect: ${(System.nanoTime() - t1) / 1e9}%5.2f s")
    spark.stop()
  }
}
