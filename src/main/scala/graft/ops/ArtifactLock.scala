package graft.ops

/** JVM-wide mutual exclusion for artifact MAINTENANCE. Every artifact
  * kind (MinHash/Bloom/IVF/Vocab) mutates its directory as a
  * read-modify-write cycle over `<path>/manifest.json` plus staged data
  * moves; the HTTP server runs requests on a thread pool, so two
  * concurrent maintenance calls on the SAME artifact path could
  * interleave those cycles — both read manifest v1, both write their own
  * successor, and one update's registry entries (or Bloom delta, or
  * refined centroids) silently vanish. Wrapping each mutating entry
  * point in [[withWriteLock]] serializes writers per normalized path so
  * the cycles compose; concurrent maintenance on DIFFERENT artifacts
  * stays parallel (per-path monitors, no global lock).
  *
  * Scope and non-goals: this is WITHIN-JVM serialization — the single
  * writer the artifact formats already assume (their crash posture is
  * manifest-last ordering, not multi-writer reconciliation). Multiple
  * driver JVMs maintaining one artifact path need external coordination,
  * exactly as any manifest-pointer table format does. Keying is by the
  * normalized path STRING (the server resolves each artifact name to one
  * canonical root, so filesystem aliasing of the same directory through
  * different spellings is not a supported layout). READS are not locked:
  * loads resolve the manifest in one read and every mutation publishes
  * its manifest ATOMICALLY ([[publishManifest]]: write a hidden temp
  * file, then a rename-with-OVERWRITE — atomic on POSIX local
  * filesystems and HDFS), so an unlocked reader sees either the old or
  * the new manifest bytes, never a truncated or partial file (the
  * previous create-overwrite truncated in place, a real torn-read
  * window hammered shut by ArtifactRaceSpec).
  */
object ArtifactLock {

  /** Atomically publish `json` as `<path>/manifest.json`: write to a
    * hidden sibling temp file, then rename over the target with
    * OVERWRITE via FileContext — the one rename Hadoop guarantees
    * atomic on local POSIX filesystems and HDFS alike. Readers racing
    * the publish see complete old bytes or complete new bytes; there is
    * no moment where the manifest is missing or truncated. Shared by
    * all four artifact kinds' writers. */
  def publishManifest(spark: org.apache.spark.sql.SparkSession,
                      path: String, json: String): Unit = {
    val conf = spark.sessionState.newHadoopConf()
    val p = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val tmp = new org.apache.hadoop.fs.Path(path,
      s".manifest.json.${java.util.UUID.randomUUID().toString.take(8)}.tmp")
    val fs = p.getFileSystem(conf)
    val out = fs.create(tmp, true)
    try out.write(json.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
    val scheme = Option(fs.getUri.getScheme).getOrElse("file")
    if (scheme == "file" || scheme == "local") {
      // POSIX rename: the only rename that is truly atomic-with-replace
      // on a local filesystem. Hadoop's local FileContext rename with
      // OVERWRITE deletes the destination FIRST (a missing-manifest
      // window the ArtifactRaceSpec hammer actually caught under load).
      val dir = java.nio.file.Paths.get(
        new org.apache.hadoop.fs.Path(path).toUri.getPath)
      java.nio.file.Files.move(dir.resolve(tmp.getName), dir.resolve(p.getName),
        java.nio.file.StandardCopyOption.REPLACE_EXISTING,
        java.nio.file.StandardCopyOption.ATOMIC_MOVE)
    } else {
      // HDFS-class filesystems implement rename-with-OVERWRITE
      // atomically at the namenode
      val fc = org.apache.hadoop.fs.FileContext.getFileContext(p.toUri, conf)
      fc.rename(tmp, p, org.apache.hadoop.fs.Options.Rename.OVERWRITE)
    }
  }

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

  /** Generation-suffixed data-relation directory name: generation 0 is
    * the bare legacy name (pre-generation artifacts load unchanged),
    * generation N > 0 is `<base>-N`. Mutations write the NEXT
    * generation's dirs and repoint the (atomically published) manifest
    * (`data_gen`) — an unlocked reader that resolved the old manifest
    * keeps reading the old generation's files, which stay on disk until
    * the generation after next prunes them. In-place Overwrite/swap
    * gave racing readers missing dirs and vanished footers
    * (ArtifactRaceSpec). */
  private[graft] def genDirName(base: String, gen: Long): String =
    if (gen <= 0L) base else s"$base-$gen"

  /** The existing artifact's data generation, when `path` already holds
    * one: None for a fresh path; an unreadable/legacy manifest reads as
    * generation 0 (so a rebuild over it writes generation 1 and never
    * truncates dirs a reader may hold open). */
  private[graft] def currentDataGen(spark: org.apache.spark.sql.SparkSession,
                                    path: String): Option[Long] = {
    val mPath = new org.apache.hadoop.fs.Path(path, "manifest.json")
    val fs = mPath.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(mPath)) None
    else try {
      val in = fs.open(mPath)
      val text =
        try scala.io.Source.fromInputStream(in, "UTF-8").mkString
        finally in.close()
      graft.engine.QueryJson.parse(text) match {
        case m: scala.collection.Map[String @unchecked, Any @unchecked] =>
          Some(m.get("data_gen") match {
            case Some(l: Long) if l >= 0 => l
            case _ => 0L
          })
        case _ => Some(0L)
      }
    } catch { case _: Exception => Some(0L) }
  }

  /** Best-effort cleanup AFTER a new generation's manifest published:
    * delete the named bases' generations older than `newGen - 1` (the
    * PREVIOUS generation stays alive for readers that resolved the old
    * manifest just before the publish). Crash between publish and prune
    * just leaves extra dirs for the next mutation's prune. */
  private[graft] def pruneGenerations(spark: org.apache.spark.sql.SparkSession,
                                      path: String, bases: Seq[String],
                                      newGen: Long): Unit = {
    val root = new org.apache.hadoop.fs.Path(path)
    val fs = root.getFileSystem(spark.sessionState.newHadoopConf())
    val pat = ("^(" + bases.mkString("|") + ")(?:-([0-9]+))?$").r
    try {
      fs.listStatus(root).foreach { st =>
        st.getPath.getName match {
          case pat(_, g) =>
            val gen = Option(g).map(_.toLong).getOrElse(0L)
            if (gen < newGen - 1) fs.delete(st.getPath, true)
          case _ => ()
        }
      }
    } catch { case _: Exception => () } // cleanup is best-effort
  }

  /** Normalize a path string to its lock key: Hadoop Path normalization
    * (collapses `//`, strips trailing `/`) so the spellings one caller
    * plausibly varies map to one monitor. */
  private def keyOf(path: String): String =
    new org.apache.hadoop.fs.Path(path).toString

  /** Run `f` holding this artifact path's writer monitor. Reentrant by
    * JVM monitor semantics, so a mutating op may compose others (e.g.
    * update → auto-compact) without self-deadlock. */
  def withWriteLock[T](path: String)(f: => T): T =
    locks.computeIfAbsent(keyOf(path), _ => new Object).synchronized(f)
}
