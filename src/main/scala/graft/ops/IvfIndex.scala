package graft.ops

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import scala.collection.mutable

/** Persistable coarse-quantizer (IVF / spherical-k-means) index artifact.
  *
  * The quantizer build is the expensive half of [[Similarity.ivfTopK]] /
  * [[Similarity.clusterAssign]] — a handful of driver-coordinated jobs
  * per corpus (centroid sample + k-means rounds). The session-level
  * [[IvfIndexCache]] amortizes it within one process, but a server
  * restart silently re-pays it per corpus. This artifact makes the index
  * a first-class on-disk object, the way any production ANN deployment
  * treats it:
  *
  *   - `<path>/centroids/` — a one-file parquet relation
  *     `(cell INT, centroid ARRAY<DOUBLE>)`. Parquet doubles are exact
  *     IEEE754 round-trips, so a loaded quantizer reproduces assignments
  *     BIT-FOR-BIT (pinned in OpsSpec).
  *   - `<path>/manifest.json` — format version + build parameters
  *     (n_cells requested, n_centroids actually built, dim,
  *     kmeans_iters), written via the Hadoop FileSystem API so the path
  *     may be any Spark-reachable filesystem (local, HDFS, S3), not just
  *     the driver's local disk.
  *
  * The artifact is centroids-only by design: corpus cell ASSIGNMENT is a
  * stateless map-only pass (cheap, and any persisted copy would go stale
  * with the corpus), while the centroid build is the part worth
  * persisting. Loading is O(nCells·dim) driver memory — the same bound
  * the in-memory cache already carries.
  *
  * Consumers: `Similarity.ivfTopKWith` / `Similarity.clusterAssignWith`
  * accept the loaded centroids directly, and the xop surface takes an
  * `index` argument on `ann_ivf` / `emb_cluster` (resolved under the
  * `spark.graft.index.root` conf — see XopEngine).
  */
object IvfIndex {

  val FormatVersion = 1

  /** Build the quantizer for `corpus` (through the session cache — a
    * warm build is free) and persist it at `path`. Returns the
    * centroids. */
  def buildAndSave(corpus: DataFrame, idCol: String, vecCol: String,
                   nCells: Int, kmeansIters: Int, path: String): Seq[Seq[Double]] = {
    require(nCells > 0, "nCells must be positive")
    require(kmeansIters >= 0, "kmeansIters must be >= 0")
    val centroids =
      Similarity.buildQuantizer(corpus, idCol, vecCol, nCells, kmeansIters)
    save(corpus.sparkSession, path, centroids,
      nCells = nCells, kmeansIters = kmeansIters)
    centroids
  }

  /** Persist an already-built centroid list at `path` (overwrite). */
  def save(spark: SparkSession, path: String, centroids: Seq[Seq[Double]],
           nCells: Int, kmeansIters: Int): Unit = {
    require(centroids.nonEmpty, "centroids must be non-empty")
    require(centroids.map(_.length).distinct.size == 1,
      "centroids must share one dimensionality")
    import spark.implicits._
    // nCells×dim doubles — driver-scale data; one file keeps the artifact
    // a single-read object for any later loader
    centroids.zipWithIndex.map { case (c, i) => (i, c) }
      .toDF("cell", "centroid")
      .coalesce(1)
      .write.mode(SaveMode.Overwrite)
      .parquet(s"$path/centroids")
    val manifest = mutable.LinkedHashMap[String, Any](
      "version" -> FormatVersion,
      "kind" -> "ivf_coarse_quantizer",
      "n_cells" -> nCells.toLong,
      "n_centroids" -> centroids.length.toLong,
      "dim" -> centroids.head.length.toLong,
      "kmeans_iters" -> kmeansIters.toLong)
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = p.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(p, true)
    try out.write(graft.engine.QueryJson.write(manifest)
      .getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Load a persisted quantizer. Fails fast (IllegalArgumentException)
    * on a missing/foreign/corrupt artifact rather than returning a
    * half-index. */
  def load(spark: SparkSession, path: String): Seq[Seq[Double]] = {
    val mPath = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mPath))
      throw new IllegalArgumentException(s"no IVF index at $path (missing manifest.json)")
    val in = fs.open(mPath)
    val text =
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    val manifest = graft.engine.QueryJson.parse(text) match {
      case m: scala.collection.Map[String @unchecked, Any @unchecked] => m
      case _ => throw new IllegalArgumentException(s"malformed IVF manifest at $path")
    }
    if (!manifest.get("kind").contains("ivf_coarse_quantizer"))
      throw new IllegalArgumentException(
        s"artifact at $path is not an IVF quantizer (kind=${manifest.get("kind")})")
    if (!manifest.get("version").contains(FormatVersion.toLong))
      throw new IllegalArgumentException(
        s"unsupported IVF index version ${manifest.get("version")} at $path")
    val centroids = spark.read.parquet(s"$path/centroids")
      .orderBy("cell")
      .collect()
      .map(r => r.getAs[scala.collection.Seq[Double]]("centroid").toSeq)
      .toSeq
    val expected = manifest.get("n_centroids")
    if (!expected.contains(centroids.length.toLong))
      throw new IllegalArgumentException(
        s"IVF index at $path is corrupt: manifest claims $expected centroids, " +
          s"parquet holds ${centroids.length}")
    if (centroids.isEmpty || centroids.map(_.length).distinct.size != 1 ||
        !manifest.get("dim").contains(centroids.head.length.toLong))
      throw new IllegalArgumentException(
        s"IVF index at $path is corrupt: centroid dimensionality disagrees with manifest")
    centroids
  }
}
