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
  * its manifest atomically-enough (single create-overwrite after all
  * data moves), so a reader sees either the old or the new artifact —
  * the fail-fast load validation catches the torn cases.
  */
object ArtifactLock {

  private val locks =
    new java.util.concurrent.ConcurrentHashMap[String, Object]()

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
