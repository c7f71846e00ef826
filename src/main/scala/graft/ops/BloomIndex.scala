package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

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
  *     (n_items estimate, fpp, byte length as an integrity check),
  *     written via the Hadoop FileSystem API (any Spark-reachable
  *     filesystem).
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
  * artifact).
  */
object BloomIndex {

  val FormatVersion = 1

  /** Build the sketch over `exclude`'s id column (the same build
    * [[Dedup.excludeByBloom]] runs inline) and persist it at `path`.
    * Returns the serialized bytes. */
  def buildAndSave(exclude: DataFrame, idCol: String, fpp: Double,
                   path: String): Array[Byte] = {
    val bytes = Dedup.buildBloom(exclude, idCol, fpp)
    // row count of the list the sketch was built over — the staleness
    // tripwire consumers check when the current list's exact size is
    // free (a heuristic: a same-size swap still slips through, but the
    // common drift — ids appended to the ledger — trips it)
    save(exclude.sparkSession, path, bytes, fpp = fpp,
      nIds = Some(exclude.count()))
    bytes
  }

  /** Loaded artifact: the sketch bytes plus the build-time list row
    * count when the artifact recorded one. */
  final case class Artifact(bytes: Array[Byte], nIds: Option[Long])

  /** Persist already-built sketch bytes at `path` (overwrite). */
  def save(spark: SparkSession, path: String, bytes: Array[Byte],
           fpp: Double, nIds: Option[Long] = None): Unit = {
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
      nIds.map("n_ids" -> _.asInstanceOf[Any])
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
    Artifact(bytes, manifest.get("n_ids").collect { case l: Long => l })
  }
}
