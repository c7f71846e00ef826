package graft.tools
import org.apache.spark.sql.SparkSession

/** Diagnostic: print the FINAL adaptive plan of a SparkEntry query after
  * execution — the only reliable way to see what AQE actually reused,
  * broadcast, or coalesced (static explain shows duplicated exchange
  * subtrees that may or may not stage-reuse at runtime).
  * Usage: runMain graft.tools.CheckReuse [queryName] [sfDir] */
object CheckReuse {
  def main(args: Array[String]): Unit = {
    val name = args.headOption.getOrElse("x31b_asof_hot")
    val dir = args.drop(1).headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder().master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val df = graft.SparkEntry.queries(name)(spark, dir)
    df.collect()
    println("=====PLAN=====")
    println(df.queryExecution.executedPlan.toString)
    spark.stop()
  }
}
