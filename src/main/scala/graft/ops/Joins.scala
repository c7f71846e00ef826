package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Temporal joins Spark has no native operator for, plus the plain
  * enrichment equi-join the JSON dialect exposes. */
object Joins {

  /** Enrichment equi-join between two tables — the dialect-level join the
    * single-table reference never had. `on` pairs (leftCol, rightCol);
    * `how` is inner | left | semi | anti (left-row-preserving variants
    * only — the output keeps the left table's identity, which is what a
    * pipeline enrichment step means). For inner/left, `rightCols` name
    * the right-side payload to append; they must not collide with a left
    * column. Keys compare with SQL equality (nulls never match).
    *
    * Scale: a plain declarative join — Catalyst/AQE pick broadcast vs
    * shuffled hash from observed sizes; `broadcastRight` forces the hint
    * when the caller KNOWS the right side is a dimension table (the
    * planner's size estimate can be unavailable for freshly-ingested
    * HTTP datasets). */
  def equiJoin(left: DataFrame, right: DataFrame, on: Seq[(String, String)],
               how: String, rightCols: Seq[String] = Seq.empty,
               broadcastRight: Boolean = false): DataFrame = {
    require(on.nonEmpty, "equiJoin needs at least one key pair")
    val sparkHow = how match {
      case "inner" => "inner"
      case "left"  => "left_outer"
      case "semi"  => "left_semi"
      case "anti"  => "left_anti"
      case other   => throw new IllegalArgumentException(s"unknown join how: $other")
    }
    val r0 = if (broadcastRight) broadcast(right) else right
    val cond = on.map { case (l, rr) => left(l) === r0(rr) }.reduce(_ && _)
    val joined = left.join(r0, cond, sparkHow)
    if (sparkHow == "left_semi" || sparkHow == "left_anti") joined
    else {
      val payload = rightCols.map(c => r0(c))
      joined.select(left.columns.map(left(_)) ++ payload: _*)
    }
  }

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
