package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.engine.QueryEngine

/** Diagnostic: where does the first-contact latency of a KNOWN query
  * shape on a SECOND same-schema dataset go? Prints per-phase times from
  * QueryPlanningTracker plus wall-clock build/plan/execute splits. */
object ProfileShape {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.adaptive.enabled", sys.env.getOrElse("PS_AQE", "true"))
      .config("spark.sql.codegen.useIdInClassName", sys.env.getOrElse("PS_IDCLS", "true"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val rowId = graft.engine.ExprCompiler.RowId

    def mk(seed: Int): DataFrame = {
      val sb = new StringBuilder("k,v,w\n")
      var i = 0
      while (i < 200000) {
        sb.append((i * seed) % 100).append(',')
          .append((i % 10000) / 100.0).append(',').append(i).append('\n')
        i += 1
      }
      val parsed = graft.sources.Ingest.fromCsv(spark, sb.toString)
      val df = parsed.repartitionByRange(4, parsed(rowId)).sortWithinPartitions(rowId)
      df.persist(org.apache.spark.storage.StorageLevel.MEMORY_ONLY)
      df.count()
      df
    }
    val a = mk(1); val b = mk(3)

    def run(df: DataFrame, q: String, label: String): Unit = {
      val t0 = System.nanoTime()
      val out = QueryEngine.run(df, q).df
      val t1 = System.nanoTime()
      out.queryExecution.executedPlan // force planning
      val t2 = System.nanoTime()
      assert(out.collect().length > 0)
      val t3 = System.nanoTime()
      assert(out.collect().length > 0) // same QueryExecution: finalized AQE plan + warm stages
      val t4 = System.nanoTime()
      val phases = out.queryExecution.tracker.phases.map { case (p, s) =>
        s"$p=${s.durationMs}ms"
      }.mkString(" ")
      println(f"$label%-28s build=${(t1 - t0) / 1e6}%.1f plan=${(t2 - t1) / 1e6}%.1f exec=${(t3 - t2) / 1e6}%.1f re-exec=${(t4 - t3) / 1e6}%.1f  $phases")
    }

    val lit = (System.nanoTime() % 100000).toString
    def grouped(l: String) =
      s"""{"select": ["k", ["sum", "v"]], "where": ["<", "w", $l], "group_by": ["k"]}"""
    // settle JIT/codegen of unrelated machinery with a few throwaway shapes
    run(a, grouped((lit.toInt + 50).toString), "jit warm 1")
    run(a, grouped((lit.toInt + 51).toString), "jit warm 2")
    run(a, grouped((lit.toInt + 52).toString), "jit warm 3")
    println("---")
    run(a, grouped(lit), "novel on A")
    run(b, grouped(lit), "same shape on B")
    run(a, grouped(lit), "rebuilt on A (no memo)")
    val lit2 = (lit.toInt + 1).toString
    run(a, grouped(lit2), "novel2 on A")
    run(b, grouped(lit2), "novel2 on B")
    spark.stop()
  }
}
