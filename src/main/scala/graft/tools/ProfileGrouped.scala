package graft.tools

import org.apache.spark.sql.SparkSession

import graft.engine.{Query, QueryEngine}
import graft.sources.{Ingest, Serialize}

/** Where do the grouped-sum HTTP milliseconds go? Decomposes the server's
  * query path on the BENCH_NOTES 200k-row table: JSON parse, plan build
  * (QueryEngine.run), first execution, repeated execution of the SAME
  * DataFrame (Catalyst caches the QueryExecution), and fresh-plan repeats.
  * Diagnostic only. */
object ProfileGrouped {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val sb = new StringBuilder("id,name,price,qty,flag\n")
    var i = 0
    while (i < 200000) {
      sb.append(i).append(",name_").append(i % 997).append(',')
        .append((i % 10000) / 100.0).append(',').append(i % 50).append(',')
        .append(i % 2 == 0).append('\n')
      i += 1
    }
    val df = Ingest.fromCsv(spark, sb.toString)
    df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
    df.count() // materialize

    val qJson = """{"select": ["name", ["sum", "qty"]], "group_by": ["name"]}"""

    def ms[A](f: => A): (Double, A) = {
      val t0 = System.nanoTime(); val a = f; ((System.nanoTime() - t0) / 1e6, a)
    }

    // warm codegen/classes
    Serialize.toJsonCounted(QueryEngine.run(df, qJson).df)

    var (tParse, tPlan, tExec1, tExecN, tSer, tFresh) = (0.0, 0.0, 0.0, 0.0, 0.0, 0.0)
    val reps = 15
    val planned = QueryEngine.run(df, qJson).df
    for (_ <- 1 to reps) {
      val (a, q) = ms(Query.parse(qJson)); tParse += a
      val (b, r) = ms(QueryEngine.run(df, q)); tPlan += b
      val (c, rows) = ms(r.df.collect()); tExec1 += c
      val (d, _) = ms(planned.collect()); tExecN += d
      val (e, _) = ms(Serialize.toJsonCounted(r.df)); tSer += e
      val (f, _) = ms(Serialize.toJsonCounted(QueryEngine.run(df, qJson).df)); tFresh += f
      val _ = rows.length
    }
    println(f"parse      ${tParse / reps}%8.1f ms")
    println(f"plan-build ${tPlan / reps}%8.1f ms")
    println(f"collect(fresh plan)   ${tExec1 / reps}%8.1f ms")
    println(f"collect(reused plan)  ${tExecN / reps}%8.1f ms")
    println(f"serialize(2nd exec)   ${tSer / reps}%8.1f ms")
    println(f"full path (fresh)     ${tFresh / reps}%8.1f ms")
    spark.stop()
  }
}
