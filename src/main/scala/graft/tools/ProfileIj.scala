package graft.tools
import org.apache.spark.sql.SparkSession
object ProfileIj {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/repo/testdata-sf1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    graft.sources.TableRegistry.warmup(spark, dir, Seq("events"))
    val queries =
      if (args.length > 1) args.drop(1).toSeq
      else Seq("x63_interval_join", "x63b_interval_join_left")
    for (name <- queries) {
      graft.SparkEntry.queries(name)(spark, dir).count()
      val times = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        graft.SparkEntry.queries(name)(spark, dir).count()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"$name: min=${times.min}%.2f passes=${times.map(t => f"$t%.2f").mkString(",")}")
    }
    spark.stop()
  }
}
