package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Persistable corpus vocabulary — the fourth artifact kind beside
  * [[IvfIndex]], [[BloomIndex]] and [[MinHashIndex]]: the corpus's
  * top-k token relation `(token, n, rank)` as parquet plus a manifest,
  * built once per corpus version instead of recomputed by every
  * consumer ([[TextOps.oovRate]]'s vocabulary side, tokenizer-fit
  * checks, drift dashboards all re-ran the same explode + count
  * aggregation over the whole corpus per query).
  *
  * The relation is k-bounded — small enough to broadcast, which is
  * exactly how [[TextOps.oovRateAgainst]] consumes it — but it is
  * still stored as a relation, never collected here. `rank` is the
  * (n desc, token asc) position, so ONE artifact built at a generous k
  * serves every smaller vocabulary size by a `rank <= v` filter.
  *
  * Layout mirrors the other artifacts:
  *   - `<path>/vocabulary/` — the (token, n, rank) parquet;
  *   - `<path>/manifest.json` — format version, k, the optional sketch
  *     capacity when the certified-bounds builder produced the counts,
  *     the text column's name (free identity tripwire), the corpus doc
  *     count, the relation's own row count, and an order-independent
  *     content fingerprint of the corpus texts (the [[MinHashIndex]]
  *     decimal-sum formula over xxhash64(text) — text only, because
  *     the vocabulary depends on nothing else).
  *
  * `load` runs no Spark job; [[verifyCount]] is one scan of the tiny
  * relation; [[verifyContent]] recomputes the corpus fingerprint (one
  * column-pruned aggregation, opt-in via the xop `verify_index` flag).
  */
object VocabIndex {

  val FormatVersion = 1

  /** Loaded artifact: the LAZY (token, n, rank) relation plus manifest
    * parameters. k is mandatory (it bounds which vocabulary sizes the
    * artifact can serve); the rest are optional tripwires. */
  final case class Artifact(vocab: DataFrame, k: Int,
                            capacity: Option[Int] = None,
                            textCol: Option[String] = None,
                            nDocs: Option[Long] = None,
                            nTokens: Option[Long] = None,
                            contentFingerprint: Option[String] = None)

  /** Order-independent corpus-text fingerprint: the exact decimal sum
    * of xxhash64(text) — [[MinHashIndex.fingerprint]]'s formula without
    * the id column, because the vocabulary is a pure function of the
    * text multiset (an id swap that leaves texts alone changes
    * nothing here, and honestly reads as fresh). */
  def fingerprint(corpus: DataFrame, textCol: String): String =
    fingerprintAndCount(corpus, textCol)._1

  private def fingerprintAndCount(corpus: DataFrame,
                                  textCol: String): (String, Long) = {
    val row = corpus.agg(
      sum(xxhash64(Dedup.exactCol(textCol)).cast("decimal(38,0)")).as("fp"),
      count(lit(1)).as("n")).head()
    (Option(row.getDecimal(0)).map(d => BigDecimal(d).toBigInt.toString)
      .getOrElse("0"), row.getLong(1))
  }

  /** Build the top-`k` vocabulary and persist it at `path`. By default
    * the exact [[TextOps.topTokens]] lineage (one token exchange with
    * map-side combine, TakeOrdered k); pass `capacity` to build through
    * the memory-bounded [[TextOps.topTokensSketch]] instead when even
    * the aggregated vocabulary exchange is the bottleneck — the stored
    * counts are then the sketch's certified lower bounds, and the
    * manifest records the capacity so consumers can tell. Plus one
    * column-pruned aggregation for the doc count + content
    * fingerprint. */
  def buildAndSave(corpus: DataFrame, textCol: String, k: Int,
                   path: String, capacity: Option[Int] = None): Artifact = {
    require(k > 0, "k must be positive")
    capacity.foreach(c => require(c > 0, "capacity must be positive"))
    val spark = corpus.sparkSession
    val top = capacity match {
      case Some(c) => TextOps.topTokensSketch(corpus, textCol, k, c)
        .select(col("token"), col("n"))
      case None => TextOps.topTokens(corpus, textCol, k)
    }
    // rank over exactly k rows (post-limit): one task, never corpus-wide
    val w = org.apache.spark.sql.expressions.Window
      .orderBy(col("n").desc, col("token"))
    val vocab = top.withColumn("rank", row_number().over(w))
    vocab.write.mode(SaveMode.Overwrite).parquet(s"$path/vocabulary")
    val (fp, nDocs) = fingerprintAndCount(corpus, textCol)
    val nTokens = spark.read.parquet(s"$path/vocabulary").count()
    val manifest = mutable.LinkedHashMap[String, Any](
      "version" -> FormatVersion,
      "kind" -> "vocabulary",
      "k" -> k.toLong,
      "text_col" -> textCol,
      "n_docs" -> nDocs,
      "n_tokens" -> nTokens,
      "fingerprint" -> fp) ++
      capacity.map(c => "capacity" -> (c.toLong: Any))
    writeManifest(spark, path, graft.engine.QueryJson.write(manifest))
    load(spark, path)
  }

  private def writeManifest(spark: SparkSession, path: String, json: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted vocabulary. Runs no Spark job — the relation is
    * returned lazy; schema and manifest coherence are checked, every
    * failure mode surfacing as IllegalArgumentException (the artifacts'
    * shared fail-fast contract). */
  def load(spark: SparkSession, path: String): Artifact = {
    val mPath = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mPath))
      throw new IllegalArgumentException(
        s"no vocabulary artifact at $path (missing manifest.json)")
    val in = fs.open(mPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed =
      try graft.engine.QueryJson.parse(text)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"malformed vocabulary manifest at $path: ${e.getMessage}") }
    val manifest = parsed match {
      case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(
        s"malformed vocabulary manifest at $path")
    }
    if (!manifest.get("kind").contains("vocabulary"))
      throw new IllegalArgumentException(
        s"artifact at $path is not a vocabulary (kind=${manifest.get("kind")})")
    if (!manifest.get("version").contains(FormatVersion.toLong))
      throw new IllegalArgumentException(
        s"unsupported vocabulary version ${manifest.get("version")} at $path")
    val k = manifest.get("k") match {
      case Some(l: Long) if l > 0 && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"vocabulary at $path is corrupt: bad k $other")
    }
    val capacity = manifest.get("capacity") match {
      case None => None
      case Some(l: Long) if l > 0 && l <= Int.MaxValue => Some(l.toInt)
      case other => throw new IllegalArgumentException(
        s"vocabulary at $path is corrupt: bad capacity $other")
    }
    val vocab =
      try spark.read.parquet(s"$path/vocabulary")
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"vocabulary at $path is corrupt: unreadable relation: ${e.getMessage}") }
    import org.apache.spark.sql.types._
    def colType(n: String): Option[DataType] =
      vocab.schema.fields.find(_.name == n).map(_.dataType)
    if (!colType("token").contains(StringType) ||
        !colType("n").contains(LongType) ||
        !colType("rank").contains(IntegerType))
      throw new IllegalArgumentException(
        s"vocabulary at $path is corrupt: relation must be " +
          s"(token STRING, n BIGINT, rank INT), got ${vocab.schema.catalogString}")
    Artifact(vocab, k, capacity,
      manifest.get("text_col").collect { case s: String => s },
      manifest.get("n_docs").collect { case l: Long => l },
      manifest.get("n_tokens").collect { case l: Long => l },
      manifest.get("fingerprint").collect { case s: String => s })
  }

  /** The token set for a requested vocabulary size: `rank <= size` over
    * the stored relation (one artifact at a generous k serves every
    * smaller size). A request beyond the artifact's k fails fast — the
    * tail past k was never stored, so serving it would silently shrink
    * the vocabulary. */
  def tokens(art: Artifact, size: Int, what: String): DataFrame = {
    require(size > 0, "vocabulary size must be positive")
    if (size > art.k)
      throw new IllegalArgumentException(
        s"$what stores the top ${art.k} tokens; cannot serve a " +
          s"vocabulary of $size — rebuild with a larger k")
    if (size == art.k) art.vocab.select(col("token"))
    else art.vocab.filter(col("rank") <= size).select(col("token"))
  }

  /** CHEAP integrity tripwire — one scan of the (tiny, k-bounded)
    * relation: row count vs the manifest's n_tokens, and rank integrity
    * (max rank == row count, so `rank <= size` slices are exact). The
    * content swap needs [[verifyContent]]. */
  def verifyCount(art: Artifact, what: String): Unit = {
    val row = art.vocab.agg(count(lit(1)).as("n"),
      coalesce(max(col("rank")), lit(0)).as("maxRank")).head()
    val actual = row.getLong(0)
    if (row.getInt(1).toLong != actual)
      throw new IllegalArgumentException(
        s"$what is corrupt: max rank ${row.getInt(1)} != row count $actual")
    art.nTokens.foreach { recorded =>
      if (actual != recorded)
        throw new IllegalArgumentException(
          s"$what is corrupt: manifest claims $recorded tokens, parquet holds $actual")
    }
  }

  /** STRONG staleness check: recompute the corpus-text fingerprint and
    * compare with the manifest's — catches any text drift, including
    * in-place edits. One column-pruned aggregation over the corpus
    * (opt-in per query via the xop `verify_index` flag, or call after a
    * corpus refresh). */
  def verifyContent(spark: SparkSession, path: String, corpus: DataFrame,
                    textCol: String): Unit =
    verifyContent(load(spark, path), s"vocabulary at $path", corpus, textCol)

  /** [[verifyContent]] against an ALREADY-loaded artifact. */
  def verifyContent(art: Artifact, what: String, corpus: DataFrame,
                    textCol: String): Unit = {
    val recorded = art.contentFingerprint.getOrElse(
      throw new IllegalArgumentException(
        s"$what records no content fingerprint " +
          "(pre-fingerprint artifact) — rebuild it to enable verification"))
    val (current, n) = fingerprintAndCount(corpus, textCol)
    if (art.nDocs.exists(_ != n) || current != recorded)
      throw new IllegalArgumentException(
        s"$what is stale: corpus fingerprint $current (n=$n) does not match " +
          s"the recorded $recorded (n=${art.nDocs.getOrElse("?")}) — rebuild the artifact")
  }
}
