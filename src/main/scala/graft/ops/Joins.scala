package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for. */
object Joins {

  /** As-of join: for every left row, attach the payload of the single
    * right row with the LARGEST `right.timeCol <= left.timeCol` within
    * the same key — "the latest reading at or before this event" (the
    * qcache reference has nothing like it; DuckDB ships it as ASOF JOIN,
    * which is the correctness oracle). Left rows with no earlier right
    * row keep null payloads (LEFT semantics).
    *
    * Shape at scale: a naive range join explodes to O(left × right) per
    * key, and a per-left-row probe is a driver-side loop. Instead both
    * sides UNION into one relation tagged by side, ONE hash shuffle on
    * the key co-locates each key's timeline, an in-partition sort by
    * (time, side) interleaves rights before lefts on timestamp ties
    * (<= semantics), and one running `last(payload, ignoreNulls)` window
    * carries each right payload forward to the left rows that follow it.
    * O(n log n) per partition, no row explosion, and the window is
    * streaming-friendly (rowsBetween unboundedPreceding..current plans
    * as a RunningWindowFunction — no full-partition buffering).
    *
    * Right-side (key, time) pairs should be unique (pre-aggregate if
    * not); among exact duplicates the carried payload is the sort-order
    * last, which no engine defines better.
    *
    * Returns every left column plus `payloadCols` from the right.
    */
  def asOfJoin(left: DataFrame, right: DataFrame, keyCol: String,
               timeCol: String, payloadCols: Seq[String]): DataFrame = {
    require(payloadCols.nonEmpty, "asOfJoin needs at least one payload column")
    val leftRow = struct(left.columns.map(left(_)): _*)
    val payload = struct(payloadCols.map(right(_)): _*)
    val leftRowType = left.select(leftRow).schema.head.dataType
    val payloadType = right.select(payload).schema.head.dataType

    // side 0 = right, 1 = left: sorting (time, side) puts a right row
    // BEFORE left rows at the same time, so ties match (<=, ASOF's rule)
    val l = left.select(left(keyCol).as("__k"), left(timeCol).as("__t"),
      lit(1).as("__side"), leftRow.as("__row"),
      lit(null).cast(payloadType).as("__p"))
    val r = right.select(right(keyCol).as("__k"), right(timeCol).as("__t"),
      lit(0).as("__side"), lit(null).cast(leftRowType).as("__row"),
      payload.as("__p"))

    val w = Window.partitionBy(col("__k")).orderBy(col("__t"), col("__side"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val carried = l.unionByName(r)
      .withColumn("__carried", last(col("__p"), ignoreNulls = true).over(w))
      .filter(col("__side") === 1)

    val leftCols: Seq[Column] = left.columns.toSeq.map(c => col(s"__row.$c").as(c))
    val payloadOut: Seq[Column] = payloadCols.map(c => col(s"__carried.$c").as(c))
    carried.select(leftCols ++ payloadOut: _*)
  }
}
