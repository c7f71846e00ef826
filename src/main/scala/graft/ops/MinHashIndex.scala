package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Persistable MinHash signature index — the third artifact kind beside
  * [[IvfIndex]] and [[BloomIndex]], and the one whose data plane is
  * CORPUS-scale: a parquet relation `(id, sig ARRAY<BIGINT>)`, one row
  * per corpus document, NEVER collected to the driver.
  *
  * Why it exists: the expensive half of incremental MinHash dedup
  * ([[Dedup.minhashPairsAgainst]], x43) is the corpus side — reading
  * every document's text and running the shingle+permute signature pass,
  * re-paid on EVERY batch admission even though the corpus didn't
  * change. Persisting the signature relation once per corpus version
  * turns each admission into: a map-only signature pass over the (tiny)
  * batch, a ~numHashes·8-bytes-per-doc parquet scan of the index, and
  * the same single (band, bucket) shuffle. At 100 TB of text with 64
  * hashes that scan is ~512 bytes/doc — a 100–1000× input reduction —
  * and signatures round-trip parquet bit-exactly, so the index-served
  * operators return IDENTICAL output to the inline ones (pinned in
  * MinHashIndexSpec and by x66 sharing x43b's oracle verbatim).
  *
  * Layout:
  *   - `<path>/signatures/` — the (id, sig) parquet, written with the
  *     corpus's natural partitioning (band expansion re-shuffles by
  *     (band, bucket) anyway, so no layout promise is needed).
  *   - `<path>/manifest.json` — format version, the parameters that make
  *     signatures comparable (num_hashes, shingle_size — consumers take
  *     these FROM the artifact; a mismatched batch side would silently
  *     produce incomparable signatures), the id column's name and type
  *     (free identity tripwires), the exact doc count, and an
  *     order-independent content fingerprint of the corpus's (id, text)
  *     pairs for strong staleness detection.
  *
  * Unlike the centroid/sketch artifacts, `load` runs NO Spark job: the
  * signature relation stays a lazy DataFrame. The count tripwire is one
  * metadata-cheap count on demand ([[verifyCount]]); the content check
  * recomputes the fingerprint against the current corpus
  * ([[verifyContent]], the xop `verify_index` flag).
  *
  * Consumers: [[Dedup.minhashPairsAgainstIndex]] /
  * [[Dedup.dropNearDuplicatesAgainstIndex]] (incremental admission),
  * [[Dedup.minhashPairsFromIndex]] (bands/threshold sweep re-runs), and
  * the xop `minhash_against` clause's `index` argument (resolved under
  * `spark.graft.index.root`, like the other artifacts).
  */
object MinHashIndex {

  val FormatVersion = 1

  /** Loaded artifact: the LAZY signature relation plus the manifest
    * parameters. numHashes and shingleSize are mandatory (without them
    * the signatures are uninterpretable); identity metadata is optional
    * and validated at use time where recorded. */
  final case class Artifact(sigs: DataFrame, numHashes: Int, shingleSize: Int,
                            idCol: Option[String] = None,
                            idType: Option[String] = None,
                            nDocs: Option[Long] = None,
                            contentFingerprint: Option[String] = None)

  /** Order-independent content fingerprint of the corpus's (id, text)
    * pairs: the exact decimal sum of xxhash64(id, text) — one
    * column-pruned aggregation, catching both id swaps and IN-PLACE text
    * edits (the drift a count tripwire is blind to). Every row enters
    * the index — including null ids/texts, which xxhash64 folds
    * deterministically — so every row contributes here; build and verify
    * run the same expression, keeping the check exact. */
  def fingerprint(corpus: DataFrame, idCol: String, textCol: String): String =
    fingerprintAndCount(corpus, idCol, textCol)._1

  private def fingerprintAndCount(corpus: DataFrame, idCol: String,
                                  textCol: String): (String, Long) = {
    val row = corpus.agg(
      sum(xxhash64(Dedup.exactCol(idCol), Dedup.exactCol(textCol))
        .cast("decimal(38,0)")).as("fp"),
      count(lit(1)).as("n")).head()
    (Option(row.getDecimal(0)).map(d => BigDecimal(d).toBigInt.toString)
      .getOrElse("0"), row.getLong(1))
  }

  /** Compute the corpus's signature relation (the exact lineage
    * [[Dedup.minhashPairs]] uses) and persist it at `path`, plus one
    * column-pruned aggregation for the doc count + content fingerprint.
    * The signature job and the fingerprint job each scan the corpus once
    * — both are map-side-only passes, and the build runs once per corpus
    * version. */
  def buildAndSave(corpus: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, shingleSize: Int = 3,
                   path: String): Artifact = {
    require(numHashes > 0, "numHashes must be positive")
    require(shingleSize > 0, "shingleSize must be positive")
    val spark = corpus.sparkSession
    val sigs = Dedup.signatureRelation(corpus, idCol, textCol, numHashes, shingleSize)
    sigs.write.mode(SaveMode.Overwrite).parquet(s"$path/signatures")
    val (fp, n) = fingerprintAndCount(corpus, idCol, textCol)
    val manifest = mutable.LinkedHashMap[String, Any](
      "version" -> FormatVersion,
      "kind" -> "minhash_signatures",
      "num_hashes" -> numHashes.toLong,
      "shingle_size" -> shingleSize.toLong,
      "id_col" -> idCol,
      "id_type" -> corpus.schema(idCol).dataType.catalogString,
      "n_docs" -> n,
      "fingerprint" -> fp)
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

  /** Load a persisted signature index. Runs no Spark job — the signature
    * relation is returned lazy; schema and manifest coherence are
    * checked, every failure mode surfacing as IllegalArgumentException
    * (the artifacts' shared fail-fast contract). */
  def load(spark: SparkSession, path: String): Artifact = {
    val mPath = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mPath))
      throw new IllegalArgumentException(
        s"no minhash index at $path (missing manifest.json)")
    val in = fs.open(mPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed =
      try graft.engine.QueryJson.parse(text)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"malformed minhash manifest at $path: ${e.getMessage}") }
    val manifest = parsed match {
      case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(
        s"malformed minhash manifest at $path")
    }
    if (!manifest.get("kind").contains("minhash_signatures"))
      throw new IllegalArgumentException(
        s"artifact at $path is not a minhash signature index " +
          s"(kind=${manifest.get("kind")})")
    if (!manifest.get("version").contains(FormatVersion.toLong))
      throw new IllegalArgumentException(
        s"unsupported minhash index version ${manifest.get("version")} at $path")
    val numHashes = manifest.get("num_hashes") match {
      case Some(l: Long) if l > 0 && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"minhash index at $path is corrupt: bad num_hashes $other")
    }
    val shingleSize = manifest.get("shingle_size") match {
      case Some(l: Long) if l > 0 && l <= Int.MaxValue => l.toInt
      case other => throw new IllegalArgumentException(
        s"minhash index at $path is corrupt: bad shingle_size $other")
    }
    val sigs =
      try spark.read.parquet(s"$path/signatures")
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"minhash index at $path is corrupt: unreadable signatures: ${e.getMessage}") }
    import org.apache.spark.sql.types._
    val sigField = sigs.schema.fields.find(_.name == "sig")
    val sigOk = sigField.exists(_.dataType match {
      case ArrayType(LongType, _) => true
      case _ => false
    })
    if (!sigs.columns.contains("id") || !sigOk)
      throw new IllegalArgumentException(
        s"minhash index at $path is corrupt: signatures must be (id, sig ARRAY<BIGINT>), " +
          s"got ${sigs.schema.catalogString}")
    Artifact(sigs, numHashes, shingleSize,
      manifest.get("id_col").collect { case s: String => s },
      manifest.get("id_type").collect { case s: String => s },
      manifest.get("n_docs").collect { case l: Long => l },
      manifest.get("fingerprint").collect { case s: String => s })
  }

  /** FREE-ish staleness tripwire: the signature relation's row count vs
    * the manifest's n_docs (one metadata-cheap count over the index's own
    * parquet — no corpus scan). Catches grow/shrink drift; the same-size
    * swap needs [[verifyContent]]. */
  def verifyCount(art: Artifact, what: String): Unit =
    art.nDocs.foreach { recorded =>
      val actual = art.sigs.count()
      if (actual != recorded)
        throw new IllegalArgumentException(
          s"$what is corrupt: manifest claims $recorded signatures, parquet holds $actual")
    }

  /** STRONG staleness check: recompute the corpus content fingerprint and
    * compare with the manifest's — detects the same-count
    * different-content swap AND the in-place text edit the count tripwire
    * cannot. One column-pruned aggregation over the corpus (so NOT on the
    * default probe path — opt in per query via the xop `verify_index`
    * flag, or call after a corpus refresh). */
  def verifyContent(spark: SparkSession, path: String, corpus: DataFrame,
                    idCol: String, textCol: String): Unit =
    verifyContent(load(spark, path), s"minhash index at $path",
      corpus, idCol, textCol)

  /** [[verifyContent]] against an ALREADY-loaded artifact. */
  def verifyContent(art: Artifact, what: String, corpus: DataFrame,
                    idCol: String, textCol: String): Unit = {
    val recorded = art.contentFingerprint.getOrElse(
      throw new IllegalArgumentException(
        s"$what records no content fingerprint " +
          "(pre-fingerprint artifact) — rebuild it to enable verification"))
    val (current, n) = fingerprintAndCount(corpus, idCol, textCol)
    if (art.nDocs.exists(_ != n) || current != recorded)
      throw new IllegalArgumentException(
        s"$what is stale: corpus fingerprint $current (n=$n) does not match " +
          s"the recorded $recorded (n=${art.nDocs.getOrElse("?")}) — rebuild the index")
  }
}
