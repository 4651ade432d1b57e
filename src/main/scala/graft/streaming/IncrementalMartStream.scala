package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.ingest.RawLoader
import graft.models.{IntRussellDaily, StgDailyStocks}
import graft.pipeline.MergeWriter

/** Streaming end-to-end incremental mart maintenance — §2.9 ST3's streaming
  * analogue, closing the loop the reference runs daily via Airflow
  * (`airflow/dags/daily_stock_pipeline_dag.py:22-55`: extract → dbt
  * incremental run): each micro-batch of newly landed vendor files triggers
  * the incremental cycle against the STORED mart — append to raw, restage,
  * recompute the 4-day lookback slice with the cross-boundary
  * yesterday_close fallback, MERGE by trade_date partition overwrite.
  *
  * Exactly-once: Spark's checkpointed file tracking dedupes landed files
  * across restarts; the raw write is keyed by batch id (overwrite of a
  * per-batch directory), so foreachBatch's at-least-once replay of an
  * uncommitted epoch rewrites the identical rows instead of appending
  * duplicates; and the merge itself is idempotent (re-merging an identical
  * slice rewrites identical partitions — `IncrementalParitySpec`). A crash
  * anywhere between raw write and merge therefore converges on replay.
  *
  * Scale shape: per-trigger work is proportional to the lookback window
  * (slice recompute + the touched partitions' rewrite), never to mart
  * history; the full-history scan happens once at bootstrap.
  */
object IncrementalMartStream {

  /** Raw-store read pruned on the stored `DATE` partition column to the
    * incremental lookback window. `buildIncremental`'s slice filter is on
    * the DERIVED `trade_date` (an alias of DATE after staging) — Catalyst
    * usually pushes it through the rename, but the "per-trigger cost ∝
    * lookback" contract should not hinge on an optimizer rewrite surviving
    * refactors: filtering here, on the partition column itself, guarantees
    * partition pruning (pinned in `StreamingMartSpec`). The cutoff matches
    * the slice filter exactly; the cross-boundary yesterday_close fallback
    * reads the STORED mart, not raw, so no extra margin is needed.
    */
  def prunedRaw(spark: SparkSession, rawPath: String,
      martMaxDate: java.sql.Date, lookbackDays: Int): DataFrame =
    RawLoader.readRaw(spark, rawPath)
      .filter(col("DATE") >= date_sub(lit(martMaxDate), lookbackDays))
      .drop("batch")

  /** One maintenance cycle per micro-batch; Trigger.AvailableNow drains the
    * landing dir then stops (the scheduled-run shape). Returns the mart
    * path's final frame.
    */
  def maintainIntDaily(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      rawPath: String,
      martPath: String,
      constituents: DataFrame,
      lookbackDays: Int = 4): DataFrame = {
    def exists(p: String): Boolean = StoragePaths.exists(spark, p)
    val q = RawLanding.normalizedStream(spark, landingDir).writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // idempotent raw write: overwrite THIS batch's directory, so an
          // at-least-once replay rewrites identical rows instead of
          // appending duplicate grain
          batch.write.mode("overwrite").partitionBy("DATE")
            .parquet(s"$rawPath/batch=$batchId")
          if (!exists(martPath)) {
            // bootstrap is the one full-history scan (SURVEY ST3); readRaw =
            // schema-merged, legacy TS-less files read with typed NULL TS
            val staged = StgDailyStocks.build(
              RawLoader.readRaw(spark, rawPath).drop("batch"))
            IntRussellDaily.buildFull(staged, constituents)
              .write.partitionBy("trade_date").parquet(martPath)
          } else {
            val existing = spark.read.parquet(martPath)
            val martMax = existing.agg(max("trade_date")).head().getDate(0)
            val staged = StgDailyStocks.build(RawLoader.heal(
              prunedRaw(spark, rawPath, martMax, lookbackDays)))
            val slice = IntRussellDaily.buildIncremental(
              staged, constituents, existing, lookbackDays,
              knownMaxDate = Some(martMax))
            // align column order with the stored mart (partition column
            // moves last on disk) before the partition-overwrite merge
            MergeWriter.mergeByDatePartition(spark,
              slice.select(existing.columns.map(col): _*), martPath)
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    spark.read.parquet(martPath)
  }
}
