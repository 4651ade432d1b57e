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
      payloadCols: Seq[String]): DataFrame =
    asofJoinTolerance(left, right, keys, leftTime, rightTime, payloadCols,
      toleranceMicros = None)

  /** As-of join with an optional match-staleness bound: a right row only
    * matches while `leftTime - rightTime <= tolerance` (native ASOF's
    * TOLERANCE clause). Implemented by carrying the matched row's own
    * timestamp inside the payload struct and nulling the payload when the
    * carried match is staler than the bound — same single key-shuffle plan.
    */
  def asofJoinTolerance(
      left: DataFrame,
      right: DataFrame,
      keys: Seq[String],
      leftTime: String,
      rightTime: String,
      payloadCols: Seq[String],
      toleranceMicros: Option[Long]): DataFrame = {
    // mixed time types would otherwise surface as an opaque union-coercion
    // analysis error deep inside the plan (or, worse, a silent widening that
    // changes tolerance units) — reject them at the API boundary by name.
    // Name matching honors the session's spark.sql.caseSensitive so the
    // guard validates the SAME column the plan will resolve, and an
    // ambiguous match (two case-variant columns under case-insensitive
    // resolution) is an error rather than a coin flip.
    val caseSensitive = left.sparkSession.conf
      .get("spark.sql.caseSensitive", "false").toBoolean
    def timeTypeOf(df: DataFrame, name: String, side: String) = {
      val hits = df.schema.fields.filter(f =>
        if (caseSensitive) f.name == name else f.name.equalsIgnoreCase(name))
      hits match {
        case Array(one) => one.dataType
        case Array() => throw new IllegalArgumentException(
          s"asofJoin: $side time column '$name' not found")
        case many => throw new IllegalArgumentException(
          s"asofJoin: $side time column '$name' is ambiguous: " +
            many.map(_.name).mkString(", "))
      }
    }
    val lt = timeTypeOf(left, leftTime, "left")
    val rt = timeTypeOf(right, rightTime, "right")
    if (lt != rt) throw new IllegalArgumentException(
      s"asofJoin: left time column '$leftTime' (${lt.simpleString}) and " +
        s"right time column '$rightTime' (${rt.simpleString}) must have the " +
        "same type — cast one side explicitly")
    val ts = "__asof_ts"
    val side = "__asof_side" // 0 = right (sorts first at equal times), 1 = left
    val pay = "__asof_payload"
    // All payload columns travel in ONE struct that is non-null for every
    // right row: last(struct, ignoreNulls) then matches the most recent
    // right ROW even when that row's payload values are legitimately NULL
    // (per-column ignoreNulls carry would skip them and surface an older
    // row's value, diverging from native ASOF). Also: one window pass
    // instead of |payloadCols|.
    val rts = "__asof_rts" // matched row's own time rides in the struct
    val r0 = right.select(
      keys.map(col) ++
        Seq(col(rightTime).as(ts), lit(0).as(side),
          struct(col(rightTime).as(rts) +: payloadCols.map(col): _*).as(pay)): _*)
    val payType = r0.schema(pay).dataType
    val l0 = left
      .withColumn(ts, col(leftTime))
      .withColumn(side, lit(1))
      .withColumn(pay, lit(null).cast(payType))
    val rAligned = l0.columns.foldLeft(r0) { (df, c) =>
      if (df.columns.contains(c)) df
      else df.withColumn(c, lit(null).cast(l0.schema(c).dataType))
    }.select(l0.columns.map(col): _*)

    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(col(ts), col(side))
      .rowsBetween(Window.unboundedPreceding, 0)
    val carried = l0.unionByName(rAligned)
      .withColumn(pay, last(col(pay), ignoreNulls = true).over(w))
    val bounded = toleranceMicros match {
      case Some(tol) =>
        // units: microseconds for timestamp(-NTZ) columns, raw units for
        // integral time columns. Dispatch on the UNIONED column's type (the
        // post-coercion truth for mixed left/right inputs); anything else —
        // e.g. DateType, where cast-to-long is seconds in non-ANSI and an
        // analysis error in ANSI mode — is rejected instead of silently
        // comparing in the wrong unit.
        import org.apache.spark.sql.types._
        def micros(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
          carried.schema(ts).dataType match {
            case TimestampType => unix_micros(c)
            case TimestampNTZType => unix_micros(c.cast(TimestampType))
            case LongType | IntegerType | ShortType => c.cast("long")
            case other => throw new IllegalArgumentException(
              s"asofJoinTolerance: unsupported time column type $other " +
                "(use timestamp, timestamp_ntz, or an integral column)")
          }
        carried.withColumn(pay,
          when(micros(col(ts)) - micros(col(pay).getField(rts)) <= tol,
            col(pay)))
      case None => carried
    }
    val extracted = payloadCols.foldLeft(bounded)((df, c) =>
      df.withColumn(c, col(pay).getField(c)))
    extracted.filter(col(side) === 1).drop(ts, side, pay)
  }
}
