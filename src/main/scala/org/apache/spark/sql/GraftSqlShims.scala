package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression

/** Access shim: the Column ⇄ Expression bridges are `private[sql]` in
  * Spark 4 (org.apache.spark.sql.classic.ExpressionUtils), but building a
  * `Column` from a custom Catalyst `Expression` is exactly the supported
  * extension path for native functions. This object lives in the sql
  * package purely to re-export those two bridges to graft code. */
object GraftSqlShims {
  def column(e: Expression): Column = classic.ExpressionUtils.column(e)
  def expression(c: Column): Expression = classic.ExpressionUtils.expression(c)

  /** Materialized in-memory byte size of a cached DataFrame, from the
    * InMemoryRelation's accumulated stats — the honest analog of the
    * reference's deep `memory_usage` (only meaningful after the cache has
    * been built by an action). None if the frame isn't cached. */
  def cachedSizeOf(df: DataFrame): Option[Long] = {
    val ds = df.asInstanceOf[classic.Dataset[_]]
    val session = ds.sparkSession
    session.sharedState.cacheManager
      .lookupCachedData(session, ds.queryExecution.logical)
      .map(_.cachedRepresentation.computeStats().sizeInBytes.toLong)
  }
}
