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
  *   - `<path>/signatures/` — the (id, sig) parquet, written
  *     PARTITIONED by a `sig_shard` directory key for EVERY id type,
  *     which is what makes [[update]]'s IO drift-sized: a refresh
  *     rewrites only the shard directories containing drifted ids,
  *     leaving every other shard's files byte-untouched. Integral ids
  *     shard by locality (`sig_shard = id div shard_span`, so appends
  *     land in the tail shard and an id-local edit touches one shard);
  *     string/UUID/any other id type shards by hash
  *     (`sig_shard = pmod(xxhash64(id), n_shards)`), which spreads a
  *     k-row drift over at most k shards — the same drift-sized-IO
  *     contract, just without the append-locality bonus. Probes are
  *     unaffected — band expansion re-shuffles by (band, bucket)
  *     anyway, and [[load]] drops the shard column so consumers see
  *     exactly (id, sig, fp). Flat pre-shard layouts still load and
  *     probe; [[update]] on them falls back to a whole-relation staged
  *     rewrite.
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
                            contentFingerprint: Option[String] = None,
                            shardSpan: Option[Long] = None,
                            nShards: Option[Int] = None)

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
    * [[Dedup.minhashPairs]] uses) and persist it at `path`. The doc
    * count + content fingerprint ride the signature job as observed
    * metrics, so the build scans the corpus EXACTLY ONCE (one
    * map-side-only pass per corpus version); between versions,
    * [[update]] refreshes only the drifted
    * rows. Each signature row also carries `fp = xxhash64(id, text)`,
    * the per-row summand of the manifest fingerprint, which is what
    * makes the incremental update possible without a corpus re-scan. */
  def buildAndSave(corpus: DataFrame, idCol: String, textCol: String,
                   numHashes: Int = 64, shingleSize: Int = 3,
                   path: String, shardSpan: Long = 1L << 20,
                   hashShards: Int = 1024): Artifact =
      ArtifactLock.withWriteLock(path) {
    require(numHashes > 0, "numHashes must be positive")
    require(shingleSize > 0, "shingleSize must be positive")
    require(shardSpan > 0, "shardSpan must be positive")
    require(hashShards > 0, "hashShards must be positive")
    val spark = corpus.sparkSession
    // the doc count + content fingerprint ride the signature job as
    // observed metrics (same expressions as fingerprintAndCount,
    // evaluated once per row) instead of a second corpus scan — at
    // fleet scale that second scan re-read the whole text column
    val obs = org.apache.spark.sql.Observation()
    val observed = corpus.observe(obs,
      sum(xxhash64(Dedup.exactCol(idCol), Dedup.exactCol(textCol))
        .cast("decimal(38,0)")).as("fp"),
      count(lit(1)).as("n"))
    val sigs = Dedup.signatureRelationWithFp(observed, idCol, textCol, numHashes, shingleSize)
    val spanSharded = isIntegral(corpus.schema(idCol).dataType)
    val shard = if (spanSharded) shardOf(shardSpan) else hashShardOf(hashShards)
    sigs.withColumn("sig_shard", shard)
      .write.partitionBy("sig_shard")
      .mode(SaveMode.Overwrite).parquet(s"$path/signatures")
    val m = obs.get
    val (fp, n) = (Observed.decimalSum(m, "fp").toString, Observed.long(m, "n"))
    val manifest = mutable.LinkedHashMap[String, Any](
      "version" -> FormatVersion,
      "kind" -> "minhash_signatures",
      "num_hashes" -> numHashes.toLong,
      "shingle_size" -> shingleSize.toLong,
      "id_col" -> idCol,
      "id_type" -> corpus.schema(idCol).dataType.catalogString,
      "n_docs" -> n,
      "fingerprint" -> fp) ++
      (if (spanSharded) Seq("shard_span" -> shardSpan.asInstanceOf[Any])
       else Seq("n_shards" -> hashShards.toLong.asInstanceOf[Any]))
    writeManifest(spark, path, graft.engine.QueryJson.write(manifest))
    load(spark, path)
  }

  private def isIntegral(dt: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _ => false
    }
  }

  /** The shard an `id` column's signature row lives in: exact integer
    * floor-division (pmod-then-div, no doubles — a double quotient
    * would misplace ids past 2^53) so ids cluster by locality — appends
    * (fresh high ids) land in the tail shard(s), and an id-local edit
    * touches exactly one shard. Null ids map to shard 0 (they are
    * legal index rows). Always applied to a column literally named
    * `id` (the signature relation's fixed schema). */
  private def shardOf(span: Long): org.apache.spark.sql.Column =
    coalesce(expr(
      s"(CAST(id AS BIGINT) - pmod(CAST(id AS BIGINT), ${span}L)) div ${span}L"),
      lit(0L))

  /** Hash shard for non-integral ids: `pmod(xxhash64(id), n)` — total
    * over every id type (xxhash64 folds a null id deterministically, so
    * null-id rows land in one fixed shard), uniform, and a pure function
    * of the id alone, which is exactly what the drift-sized rewrite
    * needs: the same id hashes to the same shard at build time and at
    * every later update. Always applied to the signature relation's
    * fixed `id` column. */
  private def hashShardOf(n: Int): org.apache.spark.sql.Column =
    pmod(xxhash64(col("id")), lit(n.toLong))

  /** The layout's shard expression, if the artifact is shard-partitioned
    * at all: locality span for integral-id layouts, id hash for the
    * rest, None for flat pre-shard layouts. */
  private def shardExprOf(art: Artifact): Option[org.apache.spark.sql.Column] =
    art.shardSpan.map(shardOf).orElse(art.nShards.map(hashShardOf))

  private def writeManifest(spark: SparkSession, path: String, json: String): Unit =
    ArtifactLock.publishManifest(spark, path, json) // temp + atomic rename

  /** Load a persisted signature index. Runs no Spark job — the signature
    * relation is returned lazy; schema and manifest coherence are
    * checked, every failure mode surfacing as IllegalArgumentException
    * (the artifacts' shared fail-fast contract). Load-time races with a
    * concurrent [[update]] are retried bounded
    * ([[ArtifactLock.retryingLoad]]); because the relation is LAZY and
    * this layout swaps shard files in place (no generations — the
    * relation is corpus-sized, so keeping prior generations would
    * double the artifact's footprint), an ACTION racing an update can
    * still capture a pre-swap file listing — wrap the whole
    * plan-and-act in [[probeRetrying]] for that (the HTTP server's
    * query loop is the same retry one layer up). */
  def load(spark: SparkSession, path: String): Artifact =
    ArtifactLock.retryingLoad(loadOnce(spark, path))

  /** Bounded re-plan retry for library-level PROBES of this index: runs
    * `use` against a freshly-loaded artifact and, when the action fails
    * because an [[update]]'s shard swap raced the plan's captured file
    * listing (a missing input file — [[ArtifactLock.isMissingInputFile]]),
    * re-loads and re-runs, up to twice. The reload is what heals: a
    * fresh `load` resolves a fresh file listing. `use` must be a pure
    * read (it may run multiple times); put the ACTION (collect/count/
    * write) inside it, not just the plan, or the retry guards nothing.
    * This is the library twin of the HTTP server's re-plan retry for
    * direct consumers of [[Dedup.minhashPairsAgainstIndex]] /
    * [[Dedup.minhashPairsFromIndex]]. */
  def probeRetrying[T](spark: SparkSession, path: String)
                      (use: Artifact => T): T =
    ArtifactLock.retryingLoad(use(loadOnce(spark, path)))

  private def loadOnce(spark: SparkSession, path: String): Artifact = {
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
    // the shard-partitioned layout surfaces its directory key as a
    // sig_shard column; drop it so consumers see exactly (id, sig, fp)
    // regardless of layout — update() re-reads the relation itself when
    // it needs shard pruning
    val sigs =
      (try spark.read.parquet(s"$path/signatures")
      catch { case e: org.apache.spark.sql.AnalysisException =>
        // cause attached: retryingLoad's classifier walks the chain to
        // tell a maintenance race (PATH_NOT_FOUND) from real corruption
        throw new IllegalArgumentException(
          s"minhash index at $path is corrupt: unreadable signatures: ${e.getMessage}", e) })
        .drop("sig_shard")
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
    // the per-row fp column (current builds) must be BIGINT when present;
    // its absence only disables incremental update, not probing
    sigs.schema.fields.find(_.name == "fp").foreach { f =>
      if (f.dataType != LongType)
        throw new IllegalArgumentException(
          s"minhash index at $path is corrupt: fp must be BIGINT, got ${f.dataType.catalogString}")
    }
    Artifact(sigs, numHashes, shingleSize,
      manifest.get("id_col").collect { case s: String => s },
      manifest.get("id_type").collect { case s: String => s },
      manifest.get("n_docs").collect { case l: Long => l },
      manifest.get("fingerprint").collect { case s: String => s },
      manifest.get("shard_span").collect { case l: Long if l > 0 => l },
      manifest.get("n_shards").collect {
        case l: Long if l > 0 && l <= Int.MaxValue => l.toInt })
  }

  /** CHEAP staleness/integrity tripwire — one pruned scan of the index's
    * own parquet (no corpus scan) checking two things: the row count vs
    * the manifest's n_docs, and that every stored signature array has
    * exactly num_hashes elements. The length check matters because a
    * hand-assembled or tampered data plane with short/long arrays would
    * otherwise pass load's schema checks and silently DEFLATE
    * est_jaccard in cross-side probes (zip_with over unequal-length
    * arrays yields nulls, counted as disagreement) instead of erroring.
    * The same-size same-length content swap still needs
    * [[verifyContent]]. */
  def verifyCount(art: Artifact, what: String): Unit = {
    val row = art.sigs.agg(
      count(lit(1)).as("n"),
      sum(when(coalesce(size(col("sig")), lit(-1)) =!= art.numHashes, 1L)
        .otherwise(0L)).as("bad")).head()
    val actual = row.getLong(0)
    val badLen = if (row.isNullAt(1)) 0L else row.getLong(1)
    if (badLen > 0)
      throw new IllegalArgumentException(
        s"$what is corrupt: $badLen signature rows have length != num_hashes=${art.numHashes}")
    art.nDocs.foreach { recorded =>
      if (actual != recorded)
        throw new IllegalArgumentException(
          s"$what is corrupt: manifest claims $recorded signatures, parquet holds $actual")
    }
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

  /** INCREMENTAL index maintenance — close the loop [[Dedup.corpusDiff]]
    * opens: after a corpus refresh, re-signature only the rows that
    * actually drifted instead of rebuilding the whole index. A refresh
    * that touched 0.1% of a 100-TB corpus re-signatures ~0.1% of it.
    *
    * Which rows drifted is decided from the index's OWN per-row
    * `fp = xxhash64(id, text)` column against the same hash of the
    * current corpus — deliberately NOT from a caller-supplied
    * [[Dedup.corpusDiff]] report: that diff classifies by NORMALIZED
    * content (whitespace/case edits read `unchanged`), while the
    * manifest fingerprint sums RAW hashes, so delta-updating it off the
    * normalized diff would drift on normalization-only edits and turn
    * every later [[verifyContent]] into a false staleness alarm. The
    * raw comparison costs one map-side hash pass over the current
    * corpus (no text ever shuffles — 16 bytes/doc after the projection)
    * plus a pruned (id, fp) scan of the index.
    *
    * The rewrite is: anti-join departing ids out of the stored
    * signatures, union freshly-signatured arriving/changed rows
    * (signatures are a pure function of (text, num_hashes,
    * shingle_size), so the result is row-identical to a from-scratch
    * build of the new corpus — pinned in MinHashIndexSpec), stage to
    * `signatures.staging`, swap, and rewrite the manifest with the
    * delta-updated count and fingerprint (the decimal sum is exactly
    * delta-updatable: subtract departing fp, add arriving). No corpus
    * re-scan, no signature re-computation for unchanged rows — and on
    * the shard-partitioned layout no artifact-sized IO either: only the
    * shard directories containing drifted ids are re-read (partition
    * pruning), re-staged, and swapped, so a 0.1% id-local refresh
    * rewrites ~0.1% of the signatures parquet; untouched shards keep
    * their exact files (byte-checksummed in the spec).
    *
    * Preconditions: ids are unique per corpus version (the same
    * precondition [[Dedup.corpusDiff]] documents — duplicate ids would
    * fan out through the joins), and nothing reads the artifact
    * mid-swap (single-writer refresh window; the swap is
    * delete-then-rename, not atomic). A no-drift corpus returns the
    * loaded artifact untouched without writing anything. Artifacts
    * built before the per-row fp column must be rebuilt once. */
  def update(spark: SparkSession, path: String, cur: DataFrame,
             idCol: String, textCol: String): Artifact =
      ArtifactLock.withWriteLock(path) {
    val art = load(spark, path)
    val what = s"minhash index at $path"
    if (!art.sigs.columns.contains("fp"))
      throw new IllegalArgumentException(
        s"$what predates incremental maintenance (no per-row fp column) — " +
          "rebuild it once with buildAndSave")
    val oldFp = art.contentFingerprint.getOrElse(
      throw new IllegalArgumentException(
        s"$what records no content fingerprint — rebuild it to enable incremental update"))
    val oldN = art.nDocs.getOrElse(
      throw new IllegalArgumentException(
        s"$what records no n_docs — rebuild it to enable incremental update"))
    art.idCol.foreach { rec =>
      if (rec != idCol) throw new IllegalArgumentException(
        s"$what was built on id column '$rec', not '$idCol'")
    }
    val curIdType = cur.schema(idCol).dataType.catalogString
    art.idType.foreach { rec =>
      if (rec != curIdType) throw new IllegalArgumentException(
        s"$what was built on id type $rec, current corpus has $curIdType")
    }
    // raw drift set: full-outer on id (null-safe: a null-id row is one
    // row, compared like any other), keep only rows whose hash differs
    // or that exist on one side only
    val curFp = cur.select(Dedup.exactCol(idCol).as("__cid"),
      xxhash64(Dedup.exactCol(idCol), Dedup.exactCol(textCol)).as("__fpc"))
    val idxFp = art.sigs.select(col("id").as("__oid"), col("fp").as("__fpo"))
    val delta = curFp.join(idxFp, col("__cid") <=> col("__oid"), "full_outer")
      .select(coalesce(col("__cid"), col("__oid")).as("id"),
        col("__fpc"), col("__fpo"))
      .filter(!(col("__fpc") <=> col("__fpo")))
      .persist()
    try {
      // the drift stats AND the affected-shard set ride ONE action over
      // the delta (they were two — a global agg plus a distinct-collect
      // over the same persisted relation, each paying the full fixed
      // per-action cost): per-shard partial aggregates, collected
      // bounded, folded exactly on the driver. The 10001-row limit can
      // only truncate in the >10000-shard fallback case, which re-runs
      // one global agg — the same pathological path that already pays a
      // whole-relation rewrite.
      val shardOpt = shardExprOf(art)
      val perShard = delta
        .groupBy(shardOpt.getOrElse(lit(0L)).as("__shard"))
        .agg(
          sum(col("__fpc").cast("decimal(38,0)")).as("add_sum"),
          sum(col("__fpo").cast("decimal(38,0)")).as("remove_sum"),
          count(when(col("__fpo").isNull, lit(1))).as("n_added"),
          count(when(col("__fpc").isNull, lit(1))).as("n_removed"))
        .limit(10001).collect()
      if (perShard.isEmpty) return art
      val truncated = perShard.length > 10000
      def decSum(i: Int): BigInt = perShard.iterator.map(r =>
        Option(r.getDecimal(i)).map(BigDecimal(_).toBigInt)
          .getOrElse(BigInt(0))).sum
      val (addSum, removeSum, nAdded, nRemoved) =
        if (!truncated)
          (decSum(1), decSum(2),
            perShard.iterator.map(_.getLong(3)).sum,
            perShard.iterator.map(_.getLong(4)).sum)
        else {
          val g = delta.agg(
            sum(col("__fpc").cast("decimal(38,0)")).as("add_sum"),
            sum(col("__fpo").cast("decimal(38,0)")).as("remove_sum"),
            count(when(col("__fpo").isNull, lit(1))).as("n_added"),
            count(when(col("__fpc").isNull, lit(1))).as("n_removed")).head()
          (Option(g.getDecimal(0)).map(BigDecimal(_).toBigInt).getOrElse(BigInt(0)),
            Option(g.getDecimal(1)).map(BigDecimal(_).toBigInt).getOrElse(BigInt(0)),
            g.getLong(2), g.getLong(3))
        }
      val newFp = (BigInt(oldFp) - removeSum + addSum).toString
      val newN = oldN + nAdded - nRemoved
      // departing ids (removed or changed) leave; arriving ids (added or
      // changed) are re-signatured from the current corpus. Both id sets
      // are drift-sized, so AQE broadcasts them against the big sides.
      val removeIds = delta.filter(col("__fpo").isNotNull)
        .select(col("id").as("__rm_id"))
      val addIds = delta.filter(col("__fpc").isNotNull)
        .select(col("id").as("__add_id"))
      val fresh = Dedup.signatureRelationWithFp(
        cur.join(addIds, Dedup.exactCol(idCol) <=> col("__add_id"), "left_semi"),
        idCol, textCol, art.numHashes, art.shingleSize)
      val staging = s"$path/signatures.staging"
      val sigPath = new org.apache.hadoop.fs.Path(path, "signatures")
      val fs = sigPath.getFileSystem(spark.sessionState.newHadoopConf())
      // stage beside the live relation, then swap: the rewrite READS the
      // live signatures parquet, so an in-place Overwrite would delete
      // its own input mid-job
      def rewriteWhole(): Unit = {
        val keep = art.sigs
          .join(removeIds, col("id") <=> col("__rm_id"), "left_anti")
          .select(col("id"), col("sig"), col("fp"))
        val staged = keep.unionByName(fresh)
        shardExprOf(art) match {
          case Some(shard) => staged.withColumn("sig_shard", shard)
            .write.partitionBy("sig_shard")
            .mode(SaveMode.Overwrite).parquet(staging)
          case None =>
            staged.write.mode(SaveMode.Overwrite).parquet(staging)
        }
        fs.delete(sigPath, true)
        if (!fs.rename(new org.apache.hadoop.fs.Path(staging), sigPath))
          throw new IllegalStateException(
            s"could not swap staged signatures into place at $sigPath")
      }
      // drift-sized IO on the sharded layouts (span AND hash): only the
      // shard directories holding a drifted id are re-read, re-written
      // to staging, and swapped — every other shard's files stay
      // byte-untouched (pinned by checksum in MinHashIndexSpec for both
      // layouts). Falls back to the whole-relation staged rewrite for
      // flat legacy layouts and for drifts so scattered (>10000 shards)
      // that the drift effectively IS the corpus. The shard set comes
      // free from the per-shard stats rows collected above.
      val affectedShards: Option[Set[Long]] =
        if (truncated) None
        else shardOpt.map(_ => perShard.iterator.map(_.getLong(0)).toSet)
      affectedShards match {
        case Some(affected) =>
          val shard = shardOpt.get
          val live = spark.read.parquet(s"$path/signatures")
          val keep = live
            .filter(col("sig_shard").isin(affected.toSeq: _*))
            .join(removeIds, col("id") <=> col("__rm_id"), "left_anti")
            .select(col("id"), col("sig"), col("fp"))
          keep.unionByName(fresh)
            .withColumn("sig_shard", shard)
            .write.partitionBy("sig_shard")
            .mode(SaveMode.Overwrite).parquet(staging)
          for (sh <- affected) {
            val dst = new org.apache.hadoop.fs.Path(
              s"$path/signatures/sig_shard=$sh")
            val src = new org.apache.hadoop.fs.Path(
              s"$staging/sig_shard=$sh")
            fs.delete(dst, true)
            // a shard whose every row departed produces no staged dir —
            // deleting the live dir IS its rewrite
            if (fs.exists(src) && !fs.rename(src, dst))
              throw new IllegalStateException(
                s"could not swap staged shard into place at $dst")
          }
          fs.delete(new org.apache.hadoop.fs.Path(staging), true)
        case _ => rewriteWhole()
      }
      val manifest = mutable.LinkedHashMap[String, Any](
        "version" -> FormatVersion,
        "kind" -> "minhash_signatures",
        "num_hashes" -> art.numHashes.toLong,
        "shingle_size" -> art.shingleSize.toLong,
        "id_col" -> idCol,
        "id_type" -> curIdType,
        "n_docs" -> newN,
        "fingerprint" -> newFp) ++
        art.shardSpan.map("shard_span" -> _.asInstanceOf[Any]) ++
        art.nShards.map(n => "n_shards" -> n.toLong.asInstanceOf[Any])
      writeManifest(spark, path, graft.engine.QueryJson.write(manifest))
      load(spark, path)
    } finally delta.unpersist()
  }
}
