package graft.ingest

import java.sql.{Date, Timestamp}
import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Ingestion checkpoint ledger — the ADMIN.INGESTION_CHECKPOINTS port
  * (DDL reference `src/snowflake_client.py:86-97`; status writes
  * `src/load.py:28-33,83-98`; completed-dates read-back
  * `src/snowflake_client.py:146-160`).
  *
  * A tiny append-only Parquet table; one row per (run, date, status
  * transition). Idempotent replay (SURVEY ST2) comes from
  * [[completedDates]]-based skipping, exactly like the reference.
  */
class CheckpointLedger(spark: SparkSession, path: String) {

  val schema: StructType = StructType(Seq(
    StructField("run_id", StringType),
    StructField("api_date", DateType),
    StructField("status", StringType), // started | completed | failed
    StructField("total_tickers", LongType),
    StructField("rows_inserted", LongType),
    StructField("started_at", TimestampType),
    StructField("completed_at", TimestampType),
    StructField("error_message", StringType)))

  def read(): DataFrame =
    try spark.read.schema(schema).parquet(path)
    catch {
      case _: Exception =>
        spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    }

  private def append(rows: Seq[org.apache.spark.sql.Row]): Unit =
    spark.createDataFrame(spark.sparkContext.parallelize(rows, 1), schema)
      .write.mode(SaveMode.Append).parquet(path)

  private def now() = new Timestamp(System.currentTimeMillis())

  def markStarted(runId: String, date: LocalDate, totalTickers: Long): Unit =
    append(Seq(org.apache.spark.sql.Row(
      runId, Date.valueOf(date), "started", totalTickers, null, now(), null, null)))

  def markCompleted(runId: String, date: LocalDate, rowsInserted: Long): Unit =
    append(Seq(org.apache.spark.sql.Row(
      runId, Date.valueOf(date), "completed", null, rowsInserted, null, now(), null)))

  def markFailed(runId: String, date: LocalDate, error: String): Unit =
    append(Seq(org.apache.spark.sql.Row(
      runId, Date.valueOf(date), "failed", null, null, null, now(),
      error.take(1000))))

  /** `SELECT DISTINCT api_date WHERE status='completed'` (S7). */
  def completedDates(): Set[LocalDate] =
    read().filter(col("status") === "completed")
      .select("api_date").distinct().collect()
      .map(_.getDate(0).toLocalDate).toSet
}
