package graft.ops

/** Readers for `Dataset.observe` metric maps — the artifact builders
  * ride their manifest statistics (row counts, decimal-sum content
  * fingerprints, Θ totals) on the SAME job that consumes the corpus,
  * instead of paying a second column-pruned scan per build.
  *
  * Exactly ONE silent fallback is tolerated, and it is provable: when
  * the observed input is optimizer-provably empty,
  * PropagateEmptyRelation can eliminate the CollectMetrics node and the
  * observation completes with NO metrics AT ALL — which only ever
  * happens when the true value is the empty aggregate (0 count / null
  * sum), so an EMPTY metric map reads as 0. A NON-empty map missing the
  * requested key, or holding an unexpected type, is a programming error
  * (renamed key, future optimizer change, Integer-vs-Long surprise) and
  * throws — returning 0 there would silently write n_docs=0 /
  * fingerprint=0 into an artifact manifest and turn every later
  * verifyContent into a wrong staleness verdict. */
private[graft] object Observed {

  private def fail(m: Map[String, Any], key: String, want: String): Nothing =
    throw new IllegalStateException(
      s"observed metric '$key' ($want) missing or mistyped in non-empty " +
        s"metric map ${m.map { case (k, v) =>
          s"$k=${Option(v).map(_.getClass.getSimpleName).getOrElse("null")}"
        }.mkString("{", ", ", "}")} — a builder/metric-name drift, not an empty input")

  def long(m: Map[String, Any], key: String): Long = m.get(key) match {
    case Some(l: Long) => l
    case Some(i: java.lang.Integer) => i.longValue
    case _ if m.isEmpty => 0L // PropagateEmptyRelation: provably empty input
    case Some(null) => 0L     // null aggregate over zero rows (e.g. sum)
    case _ => fail(m, key, "long")
  }

  /** A `sum(... .cast("decimal(38,0)"))` metric as an exact BigInt
    * (0 for the empty/null sum). */
  def decimalSum(m: Map[String, Any], key: String): BigInt = m.get(key) match {
    case Some(d: java.math.BigDecimal) => BigDecimal(d).toBigInt
    case _ if m.isEmpty => BigInt(0)
    case Some(null) => BigInt(0) // null sum: rows observed, all-null column
    case _ => fail(m, key, "decimal sum")
  }
}
