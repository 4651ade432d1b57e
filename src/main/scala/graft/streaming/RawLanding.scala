package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types._

/** Streaming analogue of the batch ingestion path (SURVEY ST1–ST2): vendor
  * JSON lands in a directory; a file-source stream normalizes to the
  * canonical RAW shape and appends DATE-partitioned parquet under
  * `Trigger.AvailableNow`. Spark's checkpointed file tracking provides the
  * exactly-once/idempotent-replay guarantee the batch path gets from the
  * checkpoint ledger (reference `src/extract_load_stocks.py:53-69`).
  */
object RawLanding {

  /** Landing-file schema: the vendor's grouped-daily short names
    * (reference `src/extraction.py:11-44`) with ONE deviation — the bar
    * timestamp lands as `t_ms`, because the vendor's `T`/`t` pair cannot
    * coexist in one schema under Spark's case-insensitive resolution (the
    * fetcher writing the landing files does the rename).
    */
  val landingSchema: StructType = StructType(Seq(
    StructField("T", StringType),
    StructField("v", DoubleType),
    StructField("vw", DoubleType),
    StructField("o", DoubleType),
    StructField("c", DoubleType),
    StructField("h", DoubleType),
    StructField("l", DoubleType),
    StructField("n", LongType),
    StructField("t_ms", LongType), // bar timestamp, ms epoch
    StructField("api_date", StringType)))

  /** Landing-dir stream → canonical raw frame (rename + ms-epoch→timestamp
    * + ingest stamp, reference `src/load.py:37-76`).
    */
  def normalizedStream(spark: SparkSession, landingDir: String): DataFrame =
    spark.readStream.schema(landingSchema).json(landingDir)
      .select(
        col("T"),
        col("v").as("V"),
        col("vw").as("VW"),
        col("o").as("O"),
        col("c").as("C"),
        col("h").as("H"),
        col("l").as("L"),
        col("n").as("N"),
        timestamp_millis(col("t_ms")).as("TS"),
        to_date(col("api_date")).as("DATE"),
        current_timestamp().as("INGESTED_AT"))

  /** Drain everything currently in the landing dir into the raw store and
    * stop (Trigger.AvailableNow) — re-running only processes NEW files.
    */
  def drainOnce(spark: SparkSession, landingDir: String, rawPath: String,
      checkpointDir: String): Unit = {
    val q = normalizedStream(spark, landingDir).writeStream
      .format("parquet")
      .option("path", rawPath)
      .option("checkpointLocation", checkpointDir)
      .partitionBy("DATE")
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
  }
}
