package graft.ops

/** Tolerant readers for `Dataset.observe` metric maps — the artifact
  * builders ride their manifest statistics (row counts, decimal-sum
  * content fingerprints, Θ totals) on the SAME job that consumes the
  * corpus, instead of paying a second column-pruned scan per build.
  *
  * Tolerance matters because of one Catalyst corner: when the observed
  * input is optimizer-provably empty, PropagateEmptyRelation can
  * eliminate the CollectMetrics node and the observation completes
  * with NO metrics — which only ever happens when the true value is
  * the empty aggregate (0 count / null sum), so that is what these
  * readers return. */
private[graft] object Observed {

  def long(m: Map[String, Any], key: String): Long = m.get(key) match {
    case Some(l: Long) => l
    case Some(i: java.lang.Integer) => i.longValue
    case _ => 0L
  }

  /** A `sum(... .cast("decimal(38,0)"))` metric as an exact BigInt
    * (0 for the empty/null sum). */
  def decimalSum(m: Map[String, Any], key: String): BigInt = m.get(key) match {
    case Some(d: java.math.BigDecimal) => BigDecimal(d).toBigInt
    case _ => BigInt(0)
  }
}
