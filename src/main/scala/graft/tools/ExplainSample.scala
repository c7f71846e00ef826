package graft.tools
import org.apache.spark.sql.SparkSession
object ExplainSample {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    val df = (0L until 1000L).map(i => (i, "l" + (i % 4))).toDF("id", "lang")
    val plan = graft.ops.Sampling.stratifiedTopK(df, "lang", "id", 5)
      .queryExecution.executedPlan.toString
    println(plan.take(1500))
    spark.stop()
  }
}
