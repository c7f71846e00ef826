package graft.tools

import org.apache.spark.sql.SparkSession

/** One-shot harness: the decontamination artifact path must equal the
  * inline operator row-for-row on real testdata (x96/x97's claim),
  * before the DuckDB oracle ever sees it. */
object SmokeDecont {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def rows(name: String) = graft.SparkEntry.queries(name)(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSeq
    val inline = rows("x21_decontam")
    val indexed = rows("x96_decontam_index")
    val updated = rows("x97_decontam_index_update")
    println(s"x21 rows=${inline.size} x96 rows=${indexed.size} " +
      s"x97 rows=${updated.size}")
    println(s"x96 == x21: ${indexed == inline}")
    println(s"x97 == x21: ${updated == inline}")
    assert(inline.nonEmpty && indexed == inline && updated == inline)
    spark.stop()
  }
}
