package graft.pipeline

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** dbt `check`-strategy snapshot semantics (reference
  * `dbt/stock_analytics/snapshots/russell3000_constituents_snapshot.sql:4-12`):
  * each run compares the source against the OPEN version per key on the
  * declared check columns; a change closes the open version
  * (`valid_to = asOf`) and inserts a new one (`valid_from = asOf`,
  * `valid_to = NULL`); new keys insert; keys missing from the source stay
  * open (dbt's default soft-delete behavior).
  *
  * Pure frame-in/frame-out — persistence is the caller's MERGE/overwrite.
  * Comparisons are null-safe (`<=>`). Scale shape: one shuffle on the
  * snapshot key for the full-outer join; the snapshot table is
  * dimension-sized.
  */
object Scd2Snapshot {

  val ValidFrom = "dbt_valid_from"
  val ValidTo = "dbt_valid_to"

  /** First run: every source row opens a version. */
  def initialize(source: DataFrame, asOf: Timestamp): DataFrame =
    source
      .withColumn(ValidFrom, lit(asOf))
      .withColumn(ValidTo, lit(null).cast("timestamp"))

  /** Subsequent run. `existing` must carry [[ValidFrom]]/[[ValidTo]]. */
  def advance(
      existing: DataFrame,
      source: DataFrame,
      keyCols: Seq[String],
      checkCols: Seq[String],
      asOf: Timestamp): DataFrame = {
    val dataCols = existing.columns.filterNot(Set(ValidFrom, ValidTo)).toSeq
    val open = existing.filter(col(ValidTo).isNull)
    val closed = existing.filter(col(ValidTo).isNotNull)

    val src = source.select(dataCols.map(c => col(c).as(s"src_$c")): _*)
    val joined = open.join(src,
      keyCols.map(k => col(k) <=> col(s"src_$k")).reduce(_ && _), "full_outer")

    val inSource = col(s"src_${keyCols.head}").isNotNull
    val inOpen = col(keyCols.head).isNotNull
    val changed = checkCols.map(c => !(col(c) <=> col(s"src_$c"))).reduce(_ || _)

    // open versions: unchanged or soft-deleted stay open; changed close
    val keptOpen = joined.filter(inOpen && (!inSource || !changed))
      .select(dataCols.map(col) :+ col(ValidFrom) :+ col(ValidTo): _*)
    val closedNow = joined.filter(inOpen && inSource && changed)
      .select(dataCols.map(col) :+ col(ValidFrom) :+ lit(asOf).as(ValidTo): _*)
    // new versions: changed rows re-open from the source values; new keys insert
    val opened = joined.filter(inSource && (!inOpen || changed))
      .select(dataCols.map(c => col(s"src_$c").as(c)) :+
        lit(asOf).as(ValidFrom) :+ lit(null).cast("timestamp").as(ValidTo): _*)

    closed.select(dataCols.map(col) :+ col(ValidFrom) :+ col(ValidTo): _*)
      .unionByName(keptOpen)
      .unionByName(closedNow)
      .unionByName(opened)
  }
}
