package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** Deterministic content-hash sampling and dataset splits — the
  * reproducibility-critical operators of a training-data pipeline.
  * `DataFrame.sample`/`randomSplit` depend on partition layout and seed
  * plumbing; hashing the CONTENT gives splits that are stable across
  * cluster sizes, re-runs, and engines (the DuckDB oracle reproduces them
  * exactly), and automatically keep exact duplicates in the same split
  * (no train/test leakage between identical documents).
  */
object HashSplit {

  val Buckets = 100
  /** train/val/test bucket boundaries: [0,90) / [90,95) / [95,100). */
  val TrainUpper = 90
  val ValUpper = 95

  /** Stable bucket in [0, [[Buckets]]) from the document content. */
  private def bucketExpr: String =
    s"CAST(${hexcastSpark("text")} % $Buckets AS INT)"

  /** Reproducible p-percent sample (buckets [0, pct)). */
  def sampleByHash(docs: DataFrame, pct: Int): DataFrame =
    docs.withColumn("bucket", expr(bucketExpr))
      .filter(col("bucket") < pct)
      .select(col("doc_id"), col("bucket"))

  /** Train/val/test assignment per document. */
  def split(docs: DataFrame): DataFrame =
    docs.withColumn("bucket", expr(bucketExpr))
      .withColumn("split",
        when(col("bucket") < TrainUpper, "train")
          .when(col("bucket") < ValUpper, "val")
          .otherwise("test"))
      .select("doc_id", "bucket", "split")

  /** Split-size audit: counts and fractions per split. */
  def splitSummary(docs: DataFrame): DataFrame = {
    val total = docs.count()
    split(docs).groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("fraction", col("n_docs").cast("double") / total)
  }
}
