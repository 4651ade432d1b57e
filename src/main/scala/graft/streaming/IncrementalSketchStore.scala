package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

/** Incremental aggregate maintenance via MERGEABLE partials — the third
  * leg of the incremental suite (next to [[IncrementalCuration]] and
  * [[IncrementalAnnIndex]]): dashboard aggregates over an append-only
  * event stream, maintained without ever rescanning history.
  *
  * Per micro-batch the store appends one row per (day) with
  *  - ADDITIVE partials (event count, value sum) that merge exactly, and
  *  - an HLL SKETCH partial (`hll_sketch_agg` — the DataSketches HLL
  *    Spark ships natively) for distinct users, a few KB per day that
  *    merges associatively under `hll_union_agg`.
  *
  * Readers fold the partials: additive counters by SUM, sketches by
  * union — so "daily users, all time" costs a scan of day-grain partial
  * rows (thousands), not a shuffle of every (day, user) pair in history.
  * This is the mergeable-summaries pattern (Agarwal et al., "Mergeable
  * Summaries", PODS 2012) that makes streaming aggregation work at
  * 100 TB: the raw stream is touched exactly once, at landing.
  *
  * Exactly-once follows the house pattern: checkpointed file tracking +
  * idempotent per-batch overwrite directories.
  */
object IncrementalSketchStore {

  /** Day-grain partial aggregates of one batch. lgConfigK 12 ⇒ ~2.5%
    * relative standard error, ~4 KB per sketch.
    */
  def partials(events: DataFrame): DataFrame =
    events.groupBy(col("ts").cast("date").as("day"))
      .agg(
        count(lit(1)).as("n_events"),
        sum("value").as("sum_value"),
        expr("hll_sketch_agg(user_id, 12)").as("users_hll"))

  /** Schema of the merged daily report. */
  val ReportSchema: org.apache.spark.sql.types.StructType =
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("day",
        org.apache.spark.sql.types.DateType),
      org.apache.spark.sql.types.StructField("n_events",
        org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("sum_value",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("n_users_approx",
        org.apache.spark.sql.types.LongType)))

  /** The merged daily report: exact additive counters, sketch-estimated
    * distinct users. One scan of day-grain partial rows. An empty stream
    * (store never created) reports zero days, not a crash — the house
    * pattern.
    */
  def dailyReport(spark: SparkSession, sketchPath: String): DataFrame =
    if (!StoragePaths.exists(spark, sketchPath))
      spark.createDataFrame(
        new java.util.ArrayList[org.apache.spark.sql.Row](), ReportSchema)
    else spark.read.parquet(sketchPath).drop("batch")
      .groupBy("day")
      .agg(
        sum("n_events").as("n_events"),
        sum("sum_value").as("sum_value"),
        expr("hll_sketch_estimate(hll_union_agg(users_hll, true))")
          .as("n_users_approx"))
      .orderBy("day")

  /** Drain the landing dir, appending each micro-batch's partials. */
  def run(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      sketchPath: String,
      eventSchema: org.apache.spark.sql.types.StructType): DataFrame = {
    val q = spark.readStream.schema(eventSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // per-batch overwrite = idempotent under foreachBatch replay
          partials(batch).write.mode("overwrite")
            .parquet(s"$sketchPath/batch=$batchId")
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    dailyReport(spark, sketchPath)
  }
}
