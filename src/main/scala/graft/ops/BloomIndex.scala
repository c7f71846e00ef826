package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

import scala.collection.mutable

/** Persistable Bloom-exclusion artifact — the [[IvfIndex]] pattern
  * applied to [[Dedup.excludeByBloom]]'s sketch.
  *
  * The Bloom build is the per-refresh cost of id exclusion: one full
  * aggregation job over the exclusion list (10^9-id lists are normal for
  * a "never re-train on these" ledger), re-paid by every session that
  * excludes against it. This artifact persists the built sketch:
  *
  *   - `<path>/bloom/` — a one-row parquet relation `(bloom BINARY)`
  *     holding the serialized `BloomFilter` (Spark's own writeTo format;
  *     bit-array OR-merge makes the build order-independent, so the
  *     bytes are deterministic for a given list + parameters).
  *   - `<path>/manifest.json` — format version + build parameters
  *     (n_items estimate, fpp, byte length as an integrity check), the
  *     id column's NAME and TYPE (a sketch probed through a different
  *     column or type silently under-deletes — the consumer validates
  *     both for free), and an order-independent CONTENT fingerprint of
  *     the id list (exact decimal sum of xxhash64(id) — append, remove
  *     and replace all move it, unlike a bit-xor where a same-count
  *     pair swap can cancel; the count tripwire alone cannot see a
  *     same-size swap). Written via the Hadoop FileSystem API (any
  *     Spark-reachable filesystem).
  *
  * The artifact is sketch-only by design: the exact exclusion ids stay
  * wherever the pipeline already keeps them (they are still needed for
  * the false-positive rescue anti-join — see
  * [[Dedup.excludeByBloomWith]]), while the aggregation over them is the
  * part worth persisting. Loading is O(bytes) driver memory — the same
  * bound the inline build already carries before broadcast.
  *
  * Consumers: `Dedup.excludeByBloomWith` takes the loaded bytes
  * directly, and the xop surface takes an `index` argument on
  * `exclude_ids` (resolved under `spark.graft.index.root`, like the IVF
  * artifact). The count/name/type tripwires are FREE and always checked
  * there; [[verifyContent]] recomputes the fingerprint (one
  * column-pruned aggregation job over the list) for explicit integrity
  * checks — the xop `verify_index` flag runs it per query for callers
  * who want the strong guarantee over the cheap one.
  */
object BloomIndex {

  val FormatVersion = 1

  /** Order-independent content fingerprint of `df`'s id list: the exact
    * decimal sum of xxhash64 over the raw (non-distinct) column — one
    * column-pruned aggregation, safe at any list size (10^9 ids × the
    * 64-bit hash range stays ~28 digits, far inside decimal(38)).
    * Deterministic across partitionings and runs (xxhash64's seed is
    * fixed). Null ids contribute 0 — they never enter the sketch
    * (Spark's bloomFilter aggregate skips nulls), so they must not move
    * the fingerprint either; xxhash64(null) alone would return the
    * seed (42) and make an all-null list fingerprint as 42·n. Empty or
    * all-null list → "0". */
  def fingerprint(df: DataFrame, idCol: String): String =
    fingerprintAndCount(df, idCol)._1

  /** Marker for the CURRENT fingerprint formula, recorded in the
    * manifest: "zero" = null ids contribute 0. Artifacts whose manifest
    * lacks the marker predate the null-neutral change (their formula
    * folded xxhash64's seed per null row); the two formulas agree on any
    * null-free list, so verification of such artifacts proceeds normally
    * unless the current list actually contains nulls — then it demands a
    * rebuild with a precise error instead of a misleading "stale". */
  val FingerprintNullsZero = "zero"

  /** [[fingerprint]], the exact list row count, and the null-id count,
    * all from the SAME aggregation pass. */
  private def fingerprintAndCount(df: DataFrame, idCol: String): (String, Long, Long) = {
    val row = df.agg(
      sum(when(col(idCol).isNotNull, xxhash64(col(idCol))).otherwise(lit(0L))
        .cast("decimal(38,0)")).as("fp"),
      count(lit(1)).as("n"),
      count(when(col(idCol).isNull, lit(1))).as("n_null")).head()
    (Option(row.getDecimal(0)).map(d => BigDecimal(d).toBigInt.toString)
      .getOrElse("0"), row.getLong(1), row.getLong(2))
  }

  /** Build the sketch over `exclude`'s id column (the same build
    * [[Dedup.excludeByBloom]] runs inline) and persist it at `path`,
    * alongside one extra column-pruned aggregation for the exact row
    * count + content fingerprint. Returns the serialized bytes. */
  def buildAndSave(exclude: DataFrame, idCol: String, fpp: Double,
                   path: String): Array[Byte] = {
    val bytes = Dedup.buildBloom(exclude, idCol, fpp)
    val (fp, n, _) = fingerprintAndCount(exclude, idCol)
    save(exclude.sparkSession, path, bytes, fpp = fpp,
      nIds = Some(n),
      idCol = Some(idCol),
      idType = Some(exclude.schema(idCol).dataType.catalogString),
      contentFingerprint = Some(fp))
    bytes
  }

  /** Loaded artifact: the sketch bytes plus whatever build metadata the
    * artifact recorded (all optional — hand-built manifests may omit
    * them; every recorded field is validated at use time). */
  final case class Artifact(bytes: Array[Byte], nIds: Option[Long],
                            idCol: Option[String] = None,
                            idType: Option[String] = None,
                            contentFingerprint: Option[String] = None,
                            fingerprintNulls: Option[String] = None)

  /** Persist already-built sketch bytes at `path` (overwrite). */
  def save(spark: SparkSession, path: String, bytes: Array[Byte],
           fpp: Double, nIds: Option[Long] = None,
           idCol: Option[String] = None, idType: Option[String] = None,
           contentFingerprint: Option[String] = None): Unit = {
    require(bytes.nonEmpty, "bloom bytes must be non-empty")
    import spark.implicits._
    Seq(Tuple1(bytes)).toDF("bloom")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/bloom")
    val manifest = mutable.LinkedHashMap[String, Any](
      "version" -> FormatVersion,
      "kind" -> "bloom_exclusion",
      "fpp" -> fpp,
      "n_bytes" -> bytes.length.toLong) ++
      nIds.map("n_ids" -> _.asInstanceOf[Any]) ++
      idCol.map("id_col" -> _.asInstanceOf[Any]) ++
      idType.map("id_type" -> _.asInstanceOf[Any]) ++
      contentFingerprint.map("fingerprint" -> _.asInstanceOf[Any]) ++
      contentFingerprint.map(_ =>
        "fingerprint_nulls" -> FingerprintNullsZero.asInstanceOf[Any])
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(graft.engine.QueryJson.write(manifest)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted sketch. Fails fast (IllegalArgumentException) on a
    * missing/foreign/corrupt artifact. */
  def load(spark: SparkSession, path: String): Array[Byte] =
    loadWithMeta(spark, path).bytes

  /** Load a persisted sketch with its manifest metadata. Every failure
    * mode — missing, foreign, corrupt, unparsable manifest, missing
    * sketch parquet — surfaces as IllegalArgumentException (the
    * documented fail-fast contract; raw parse/read exceptions are
    * wrapped so direct-API consumers can catch one type). */
  def loadWithMeta(spark: SparkSession, path: String): Artifact = {
    val mPath = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mPath))
      throw new IllegalArgumentException(
        s"no bloom index at $path (missing manifest.json)")
    val in = fs.open(mPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val parsed =
      try graft.engine.QueryJson.parse(text)
      catch { case e: Exception => throw new IllegalArgumentException(
        s"malformed bloom manifest at $path: ${e.getMessage}") }
    val manifest = parsed match {
      case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(
        s"malformed bloom manifest at $path")
    }
    if (!manifest.get("kind").contains("bloom_exclusion"))
      throw new IllegalArgumentException(
        s"artifact at $path is not a bloom exclusion (kind=${manifest.get("kind")})")
    if (!manifest.get("version").contains(FormatVersion.toLong))
      throw new IllegalArgumentException(
        s"unsupported bloom index version ${manifest.get("version")} at $path")
    val rows =
      try spark.read.parquet(s"$path/bloom").collect()
      catch { case e: org.apache.spark.sql.AnalysisException =>
        throw new IllegalArgumentException(
          s"bloom index at $path is corrupt: unreadable sketch: ${e.getMessage}") }
    if (rows.length != 1)
      throw new IllegalArgumentException(
        s"bloom index at $path is corrupt: expected one sketch row, got ${rows.length}")
    val bytes = rows.head.getAs[Array[Byte]]("bloom")
    if (bytes == null || !manifest.get("n_bytes").contains(bytes.length.toLong))
      throw new IllegalArgumentException(
        s"bloom index at $path is corrupt: byte length disagrees with manifest")
    Artifact(bytes,
      manifest.get("n_ids").collect { case l: Long => l },
      manifest.get("id_col").collect { case s: String => s },
      manifest.get("id_type").collect { case s: String => s },
      manifest.get("fingerprint").collect { case s: String => s },
      manifest.get("fingerprint_nulls").collect { case s: String => s })
  }

  /** STRONG staleness check: recompute the content fingerprint of the
    * current `exclude` list and compare with the manifest's — detects
    * the same-count different-content swap the free count tripwire
    * cannot. One column-pruned aggregation job over the list (so NOT on
    * the default query path — opt in per query via the xop
    * `verify_index` flag, or call this after a ledger refresh).
    * IllegalArgumentException on mismatch or when the artifact predates
    * fingerprints. */
  def verifyContent(spark: SparkSession, path: String,
                    exclude: DataFrame, idCol: String): Unit =
    verifyContent(loadWithMeta(spark, path), s"bloom index at $path",
      exclude, idCol)

  /** [[verifyContent]] against an ALREADY-loaded artifact — consumers
    * that just called [[loadWithMeta]] (the xop path) skip the second
    * manifest+sketch read. `what` names the artifact in errors. */
  def verifyContent(art: Artifact, what: String,
                    exclude: DataFrame, idCol: String): Unit = {
    val recorded = art.contentFingerprint.getOrElse(
      throw new IllegalArgumentException(
        s"$what records no content fingerprint " +
          "(pre-fingerprint artifact) — rebuild it to enable verification"))
    val (current, _, nNull) = fingerprintAndCount(exclude, idCol)
    // formula-generation guard: an artifact without the nulls marker was
    // fingerprinted under the old formula (seed folded per null row).
    // Both formulas agree on null-free lists, so verification proceeds
    // there; with nulls present the comparison would be apples-to-
    // oranges — demand a rebuild with the real reason, not "stale"
    if (art.fingerprintNulls.isEmpty && nNull > 0)
      throw new IllegalArgumentException(
        s"$what predates the null-neutral fingerprint formula and the " +
          s"exclude list contains $nNull null ids — rebuild the artifact " +
          "to verify it")
    if (current != recorded)
      throw new IllegalArgumentException(
        s"$what is stale: exclude list content changed " +
          s"(fingerprint $current, artifact built over $recorded) — " +
          "rebuild the artifact")
  }
}
