package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Generic as-of (point-in-time) join — for each left row, the single most
  * recent right row with `rightTime <= leftTime` per key. Spark has no
  * native operator for this; the naive formulation (range join + per-row
  * max) explodes into a quadratic candidate set.
  *
  * This implementation is the scalable union trick: tag both sides, union,
  * and carry the right payload forward with `last(_, ignoreNulls)` over one
  * (key, time)-ordered window — a SINGLE shuffle on the key, O(n log n)
  * from the sort, no candidate explosion. At same-instant collisions the
  * right row sorts before the left (side tag ascending), making the match
  * inclusive, exactly like `ON l.t >= r.t` in engines with native ASOF
  * (the DuckDB oracle uses its built-in ASOF LEFT JOIN).
  *
  * `right` must be unique per (keys, rightTime) — pre-dedupe to make the
  * match deterministic (native ASOF picks an arbitrary row on ties).
  */
object AsOfJoin {

  def asofJoin(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String]): DataFrame = {
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first at equal times), 1 = left
    val l = left
      .withColumn(ts, col(leftTime))
      .withColumn(side, lit(1))
    val lAligned = payloadCols.foldLeft(l)((df, c) =>
      df.withColumn(c, lit(null).cast(right.schema(c).dataType)))
    val r = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(ts), lit(0).as(side)) ++
        payloadCols.map(col): _*)
    val rAligned = lAligned.columns.foldLeft(r) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(lAligned.schema(c).dataType))
    }.select(lAligned.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = payloadCols.foldLeft(lAligned.unionByName(rAligned)) {
      (df, c) => df.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    carried.filter(col(side) === 1).drop(ts, side)
  }
}
