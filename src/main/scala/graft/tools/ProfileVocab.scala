package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Phase-level timing of the vocabulary-artifact maintenance rows (the
  * bench's top cost family: x73/x78/x89/x91) — which of build / update /
  * compact / remove / serve owns the wall-clock (guide §1: measure
  * first, then optimize the one thing).
  *
  *   sbt "runMain graft.tools.ProfileVocab"
  */
object ProfileVocab {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.codegen.cache.maxEntries", "5000")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.sources.TableRegistry.warmup(spark, sfDir, Seq("documents"))
    val docs = graft.sources.TableRegistry.table(spark, sfDir, "documents")
    val path = "/tmp/graft_profile_vocab"

    def timed[T](what: String)(f: => T): T = {
      val t0 = System.nanoTime()
      val r = f
      println(f"    $what%-28s ${(System.nanoTime() - t0) / 1e6}%8.0f ms")
      r
    }

    // x91's recipe, phase-timed; 3 reps, read the last (warm) one
    for (rep <- 1 to 3) {
      println(s"== rep $rep ==")
      timed("TOTAL x91 shape") {
        val b = timed("buildAndSave(%4==0)") {
          graft.ops.VocabIndex.buildAndSave(docs.filter(col("doc_id") % 4 === 0),
            "text", k = 50, path = path, capacity = Some(4096))
        }
        timed("update(%4==1)") {
          graft.ops.VocabIndex.update(spark, path,
            docs.filter(col("doc_id") % 4 === 1), "text")
        }
        val grown = timed("update(%4==2)") {
          graft.ops.VocabIndex.update(spark, path,
            docs.filter(col("doc_id") % 4 === 2), "text")
        }
        timed("compactSlabs(keepLast=1)") {
          graft.ops.VocabIndex.compactSlabs(spark, path, keepLast = 1)
        }
        val art = timed("removeSlab(newest)") {
          graft.ops.VocabIndex.removeSlab(spark, path,
            grown.slabs.get.map(_.id).max)
        }
        timed("oovRateAgainst+count") {
          graft.ops.TextOps.oovRateAgainst(docs.filter(col("doc_id") % 4 <= 1),
            "doc_id", "text",
            graft.ops.VocabIndex.tokens(art, 30, "vocabulary artifact"))
            .orderBy("id").count()
        }
        b
      }
    }
    spark.stop()
  }
}
