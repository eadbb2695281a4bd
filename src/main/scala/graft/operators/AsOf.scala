package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** As-of (point-in-time) join — the classic operator Spark's built-in join
  * family lacks: for every left row, the single right row with the LATEST
  * timestamp at or before the left timestamp, per key. The naive
  * formulation is a range theta-join (O(|L|·|R|) pairs per key before
  * aggregation); this implementation is the scale-correct union + window
  * shape:
  *
  *   tag and union both sides → ONE hash shuffle on the key →
  *   within-partition sort by (ts, tag) (right rows sort before left rows
  *   at equal ts, so `ts_left >= ts_right` ties match) →
  *   `last(right_id) IGNORE NULLS` running window → keep left rows.
  *
  * Cost is one shuffle + one sort of |L|+|R| rows regardless of how many
  * right rows precede each left row — the same plan shape at 10^12 rows.
  * Left rows with no preceding right row are dropped (inner as-of).
  */
object AsOf {

  /** `left(key, ts, leftId)` as-of-joined to `right(key, ts, rightId)`;
    * output (key, leftId, rightId). Both id columns must be BIGINT (the
    * bit-stable oracle contract).
    */
  /** Range (interval-containment) join for NON-OVERLAPPING intervals per
    * key — e.g. events into sessions: the interval with the latest start at
    * or before the row's timestamp is the only candidate, so the as-of
    * shape applies and the end-bound becomes a post-filter. One shuffle +
    * sort, never the O(|L|·|R|) inequality join a naive range predicate
    * plans as. `right` = (key, startCol, endCol, rightId).
    */
  def rangeJoinNonOverlapping(left: DataFrame, right: DataFrame, key: String,
      ts: String, startCol: String, endCol: String, leftId: String,
      rightId: String): DataFrame = {
    val l = left.select(col(key), col(ts).as("_ts"),
      col(leftId).as("_lid"), lit(null).cast("bigint").as("_rid"),
      lit(null).cast("bigint").as("_rend"), lit(1).as("_tag"))
    val r = right.select(col(key), col(startCol).as("_ts"),
      lit(null).cast("bigint").as("_lid"), col(rightId).as("_rid"),
      col(endCol).cast("bigint").as("_rend"), lit(0).as("_tag"))
    val w = Window.partitionBy(key).orderBy(col("_ts"), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_asof", last("_rid", ignoreNulls = true).over(w))
      .withColumn("_end", last("_rend", ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_asof").isNotNull && col("_ts") <= col("_end"))
      .select(col(key), col("_lid").as(leftId), col("_asof").as(rightId))
  }

  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key), col(ts),
      col(leftId).as("_lid"), lit(null).cast("bigint").as("_rid"), lit(1).as("_tag"))
    val r = right.select(col(key), col(ts),
      lit(null).cast("bigint").as("_lid"), col(rightId).as("_rid"), lit(0).as("_tag"))
    // _rid as the third sort key pins right-right ties at equal (key, ts):
    // without it, which duplicate the running last() returns is partition-
    // order-dependent — the GREATEST rightId wins, deterministically
    val w = Window.partitionBy(key).orderBy(col(ts), col("_tag"), col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_asof", last("_rid", ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_asof").isNotNull)
      .select(col(key), col("_lid").as(leftId), col("_asof").as(rightId))
  }

  /** FORWARD as-of join — the other direction: for every left row, the
    * single right row with the EARLIEST timestamp at or after the left
    * timestamp, per key ("the next snapshot/price/capture after this
    * event" — lead attribution, next-capture diffing, deadline matching).
    * Identical one-shuffle union + window shape, with the frame walked in
    * DESCENDING timestamp order so the running `last` is the closest
    * at-or-after right row; right rows sort before left at equal ts, so
    * `ts_left <= ts_right` ties match (mirroring [[asOfJoin]]'s tie rule).
    * Left rows with no following right row are dropped (inner as-of).
    */
  def asOfJoinForward(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key), col(ts),
      col(leftId).as("_lid"), lit(null).cast("bigint").as("_rid"), lit(1).as("_tag"))
    val r = right.select(col(key), col(ts),
      lit(null).cast("bigint").as("_lid"), col(rightId).as("_rid"), lit(0).as("_tag"))
    // same tie pin as the backward join: the GREATEST rightId wins among
    // equal-(key, ts) right rows, on any partitioning
    val w = Window.partitionBy(key).orderBy(col(ts).desc, col("_tag"), col("_rid").asc_nulls_last)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_asof", last("_rid", ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_asof").isNotNull)
      .select(col(key), col("_lid").as(leftId), col("_asof").as(rightId))
  }
}
