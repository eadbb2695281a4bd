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
  def asOfJoin(left: DataFrame, right: DataFrame, key: String, ts: String,
      leftId: String, rightId: String): DataFrame = {
    val l = left.select(col(key), col(ts),
      col(leftId).as("_lid"), lit(null).cast("bigint").as("_rid"), lit(1).as("_tag"))
    val r = right.select(col(key), col(ts),
      lit(null).cast("bigint").as("_lid"), col(rightId).as("_rid"), lit(0).as("_tag"))
    val w = Window.partitionBy(key).orderBy(col(ts), col("_tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    l.unionAll(r)
      .withColumn("_asof", last("_rid", ignoreNulls = true).over(w))
      .where(col("_tag") === 1 && col("_asof").isNotNull)
      .select(col(key), col("_lid").as(leftId), col("_asof").as(rightId))
  }
}
