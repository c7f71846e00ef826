package graft.tools

import org.apache.spark.sql.SparkSession

/** Scale-validation probe: prints, for every SparkEntry query against a
  * given sf directory, the MULTISET of physical operator class names in
  * the pre-AQE physical plan (`sparkPlan` — deterministic in the input
  * statistics, no execution). Diffing two runs (e.g. sf0.1 vs the
  * generated sf1) surfaces exactly which queries change plan SHAPE with
  * scale — stats-gated branches (segmented carries), broadcast-vs-shuffle
  * join picks, stats-sized LSH bands — so each can be audited on purpose
  * instead of discovered in production.
  *
  * Usage: PlanShapes <sfDir>  — one line per query:
  *   <name>\t<op>xN <op>xN ...   (or <name>\tERROR: msg)
  *
  * Note: a few query BUILDS run bounded eager jobs by design (min/max
  * granule probes, <=k centroid/quantizer builds); this probe pays them
  * but never executes the main plan.
  */
object PlanShapes {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", 8)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val line = try {
        val plan = fn(spark, dir).queryExecution.sparkPlan
        val ops = scala.collection.mutable.Map.empty[String, Int]
        plan.foreach(n => ops.updateWith(n.getClass.getSimpleName) {
          c => Some(c.getOrElse(0) + 1)
        })
        ops.toSeq.sorted.map { case (op, n) => s"${op}x$n" }.mkString(" ")
      } catch { case e: Throwable => s"ERROR: ${e.getMessage.take(80)}" }
      println(s"$name\t$line")
    }
    spark.stop()
  }
}
