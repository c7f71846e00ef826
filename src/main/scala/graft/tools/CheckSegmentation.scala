package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Window => LW}

/** Scale-validation probe: builds the as-of join (x31) and batch
  * sessionization (x15) against a given sf directory and reports whether
  * the STATS-GATED segmented-carry branch engaged on its own — the same
  * plan-shape test SkewSpec pins with explicit granules, applied to the
  * auto path on real parquet statistics. A window partitioned on a single
  * bare key over raw events is the funnel shape; the segmented shape
  * partitions local windows on (key, granule) and keeps bare-key windows
  * only above the bounded per-(key,granule) boundary aggregate.
  *
  * Usage: CheckSegmentation <sfDir>  — prints one line per operator:
  *   <name>: segmented=<bool> windows=<partition key sets>
  */
object CheckSegmentation {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", 4)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    for (name <- Seq("x31_asof", "x15_events_sessions")) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val windows = df.queryExecution.optimizedPlan.collect { case w: LW => w }
      val keySets = windows.map(_.partitionSpec
        .flatMap(_.references.map(_.name)).toSet)
      // segmented = every bare-single-key window sits above the bounded
      // boundary aggregate, and some window carries a 2-key (key,granule)
      // partition spec over the raw relation
      val funneled = windows.exists { w =>
        val keys = w.partitionSpec.flatMap(_.references.map(_.name)).toSet
        keys.size <= 1 && w.child.collectFirst { case a: Aggregate => a }.isEmpty
      }
      val hasLocal = keySets.exists(_.size >= 2)
      println(s"$name: segmented=${!funneled && hasLocal} " +
        s"windows=${keySets.map(_.mkString("(", ",", ")")).mkString(" ")}")
    }
    spark.stop()
  }
}
