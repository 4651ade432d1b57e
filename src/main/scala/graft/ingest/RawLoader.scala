package graft.ingest

import java.time.LocalDate

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Normalizes API bars into the canonical RAW.DAILY_STOCKS shape and appends
  * them, date-partitioned (reference normalize `src/load.py:37-76`:
  * rename :50-60, ms-epoch→timestamp :41, DATE/INGESTED_AT literals :44-47,
  * column whitelist :63-68; append sink `src/snowflake_client.py:103-124`).
  *
  * The explicit schema + select-whitelist is the reference's anti-drift
  * discipline (SURVEY §1.2): loads FAIL on shape change rather than
  * silently widening.
  */
object RawLoader {

  /** RAW.DAILY_STOCKS, `src/snowflake_client.py:63-77`. */
  val rawSchema: StructType = StructType(Seq(
    StructField("T", StringType),
    StructField("V", DoubleType),
    StructField("VW", DoubleType),
    StructField("O", DoubleType),
    StructField("C", DoubleType),
    StructField("H", DoubleType),
    StructField("L", DoubleType),
    StructField("N", LongType),
    StructField("TS", TimestampType),
    StructField("DATE", DateType),
    StructField("INGESTED_AT", TimestampType)))

  /** API bars → canonical raw frame for one trading date. */
  def normalize(spark: SparkSession, bars: Seq[ApiBar], date: LocalDate): DataFrame = {
    import spark.implicits._
    bars.toDF()
      .select(
        col("ticker").as("T"),
        col("volume").as("V"),
        col("vwap").as("VW"),
        col("open").as("O"),
        col("close").as("C"),
        col("high").as("H"),
        col("low").as("L"),
        col("numTransactions").as("N"),
        timestamp_millis(col("epochMillis")).as("TS"),
        lit(java.sql.Date.valueOf(date)).as("DATE"),
        current_timestamp().as("INGESTED_AT"))
  }

  /** Append one date's rows to the raw store, partitioned by DATE so
    * downstream incremental predicates prune at the file-listing level.
    */
  def append(df: DataFrame, rawPath: String): Long = {
    val n = df.count()
    df.write.mode(SaveMode.Append).partitionBy("DATE").parquet(rawPath)
    n
  }

  /** Raw-store read with the legacy-layout self-heal applied. `mergeSchema`
    * is essential, not optional: a store that mixes legacy TS-less files
    * with current ones would otherwise take its schema from ONE file footer
    * — listing-order dependent — and a legacy footer winning would silently
    * NULL the real TS values the newer files carry. Merging unions the file
    * schemas (files lacking TS read NULL per-file, exactly the healed
    * semantics), at the price of a footer read per file — a one-time,
    * parallelized metadata pass, the correct trade for a mutation-free
    * migration story. [[heal]] then only fires for an all-legacy store.
    */
  def readRaw(spark: SparkSession, rawPath: String): DataFrame =
    heal(spark.read.option("mergeSchema", "true").parquet(rawPath))

  /** Read-side self-heal for a legacy raw layout that predates `TS` — the
    * reference's `ALTER TABLE ... ADD COLUMN IF NOT EXISTS TS TIMESTAMP_NTZ`
    * safeguard (`src/snowflake_client.py:78-83`), re-expressed as a typed
    * NULL projection (parquet files are immutable, so the heal happens at
    * read, in canonical column order). ONLY the additive TS case heals;
    * any other column missing from [[rawSchema]] throws here, named, and a
    * type change still fails the declared pipeline contracts downstream —
    * the repo's stricter-than-reference drift policy. A frame that already
    * carries TS passes through untouched. Store reads belong on [[readRaw]]
    * (schema-merged) — healing a single-footer inferred schema cannot see a
    * mixed store.
    */
  def heal(raw: DataFrame): DataFrame =
    if (raw.columns.exists(_.equalsIgnoreCase("TS"))) raw
    else {
      val have = raw.columns.map(_.toLowerCase).toSet
      val missing = rawSchema.fieldNames
        .filter(f => f != "TS" && !have.contains(f.toLowerCase))
      if (missing.nonEmpty)
        throw new IllegalStateException(
          s"raw store is missing non-healable column(s): ${missing.mkString(", ")} " +
            "(only the legacy TS-less layout self-heals)")
      raw.select(rawSchema.fields.toSeq.map { f =>
        if (f.name == "TS") lit(null).cast(f.dataType).as("TS") else col(f.name)
      }: _*)
    }
}
