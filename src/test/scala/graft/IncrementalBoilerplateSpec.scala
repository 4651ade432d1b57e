package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dedup
import graft.streaming.{IncrementalBoilerplate, StoreMaintenance}

/** Incremental boilerplate filtering: one drain reproduces the batch
  * operator exactly; cross-batch df accumulates so a chunk crossing
  * `minDf` is scrubbed from that batch ONWARD while already-shipped
  * documents keep their copies (the documented arrival-time divergence);
  * a re-crawled document neither re-emits rows nor inflates df; replays
  * are idempotent; and the delta-summed prior survives store compaction.
  */
class IncrementalBoilerplateSpec extends SparkSpec {

  import spark.implicits._

  private val boiler = "b0 b1 b2 b3 b4 b5 b6 b7" // one exact 8-token chunk

  private def docs(rows: (Long, String)*): DataFrame =
    rows.toDF("doc_id", "text")

  private def schema = docs((0L, "")).schema

  private case class Dirs(landing: java.nio.file.Path, ckpt: String,
      dfPath: String, corpusPath: String)

  private def dirs(tag: String): Dirs = Dirs(
    Files.createTempDirectory(s"$tag-landing"),
    Files.createTempDirectory(s"$tag-ckpt").toString + "/c",
    Files.createTempDirectory(s"$tag-df").toString + "/d",
    Files.createTempDirectory(s"$tag-corpus").toString + "/corpus")

  private def cleanSet(df: DataFrame) = df
    .select("doc_id", "clean_text", "n_chunks", "n_kept")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3))).toSet

  test("a single drain reproduces the batch operator exactly") {
    val d = dirs("bp1")
    val corpus = docs(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h"),
      (3L, "solo only"))
    landParquet(d.landing, "b1.parquet", corpus)
    val out = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    // all df is within-drain, so the arrival-time verdicts equal the
    // batch operator's final-df verdicts row for row
    assert(cleanSet(out) == cleanSet(Dedup.boilerplateDocs(corpus)))
    // the df store holds one delta row per distinct chunk, each the
    // batch's own distinct-doc count
    val store = spark.read.parquet(d.dfPath)
    val boilerDf = store.filter(col("df_docs") === 2L).count()
    assert(boilerDf == 1L, "exactly the shared chunk reaches df 2")
  }

  test("df accumulates across batches; shipped documents never retro-change") {
    val d = dirs("bp2")
    // batch 1: the chunk appears in ONE document — under-threshold, kept
    landParquet(d.landing, "b1.parquet",
      docs((1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h")))
    val out1 = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    assert(out1.filter(col("doc_id") === 1L).head()
      .getAs[String]("clean_text").startsWith(boiler))
    // batch 2: a second document carries the same chunk — accumulated df
    // reaches minDf=2, so batch 2's copy is scrubbed...
    landParquet(d.landing, "b2.parquet",
      docs((2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h")))
    val out2 = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    val byId = out2.collect().map(r => r.getAs[Long]("doc_id") -> r).toMap
    assert(byId(2L).getAs[String]("clean_text") ==
      "u2a u2b u2c u2d u2e u2f u2g u2h")
    assert(byId(2L).getAs[Long]("n_chunks") == 2L &&
      byId(2L).getAs[Long]("n_kept") == 1L)
    // ...while batch 1's already-shipped document keeps its copy — the
    // documented arrival-time divergence from the batch operator (which
    // would scrub both)
    assert(byId(1L).getAs[String]("clean_text").startsWith(boiler))
    assert(Dedup.boilerplateDocs(docs(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h")))
      .filter(col("doc_id") === 1L).head()
      .getAs[String]("clean_text").startsWith("u1a"),
      "fixture must make the divergence visible")
    // the store's summed df for the chunk is 2 (one delta per batch)
    val summed = spark.read.parquet(d.dfPath)
      .groupBy("chunk_hash", "chunk_hash2").agg(sum("df_docs").as("df"))
      .agg(max("df")).head().getLong(0)
    assert(summed == 2L)
  }

  test("a re-crawled document is dropped whole and does not inflate df") {
    val d = dirs("bp3")
    landParquet(d.landing, "b1.parquet",
      docs((1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h")))
    IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    // the SAME doc_id re-lands: guarded out — no new corpus row, and the
    // chunk's df stays 1 (a re-crawl is not a second document)
    landParquet(d.landing, "b2.parquet",
      docs((1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h")))
    val out = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    assert(out.filter(col("doc_id") === 1L).count() == 1L)
    val summed = spark.read.parquet(d.dfPath)
      .groupBy("chunk_hash", "chunk_hash2").agg(sum("df_docs").as("df"))
      .agg(max("df")).head().getLong(0)
    assert(summed == 1L, "re-crawl must not double-count df")
    // so a genuinely distinct second document still crosses minDf next
    landParquet(d.landing, "b3.parquet",
      docs((2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h")))
    val out3 = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    assert(out3.filter(col("doc_id") === 2L).head()
      .getAs[String]("clean_text") == "u2a u2b u2c u2d u2e u2f u2g u2h")
  }

  test("an at-least-once replay rewrites identical rows") {
    val d = dirs("bp4")
    landParquet(d.landing, "b1.parquet", docs(
      (1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h"),
      (2L, s"$boiler u2a u2b u2c u2d u2e u2f u2g u2h")))
    val first = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
      .collect().map(_.toString).sorted
    // crash-replay: the checkpoint survives but batch 0's COMMIT is lost
    // (the crash window after the stores landed), so the restarted drain
    // re-executes batch 0; the store readers exclude the batch's own
    // partitions, so the decisions (and the delta rows) land
    // byte-identical. (A fresh checkpoint is NOT a replay — the era
    // guard refuses it; see the second-era test.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(d.ckpt, "commits", "0"))
    // the local ChecksumFileSystem's crc sibling must crash away with its
    // file, or the restarted commit write fails the atomic rename
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(d.ckpt, "commits", ".0.crc"))
    val second = IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    val store = spark.read.parquet(d.dfPath)
    assert(store.groupBy("chunk_hash", "chunk_hash2", "df_docs").count()
      .filter(col("count") > 1).count() == 0,
      "replay must overwrite, never duplicate delta rows")
  }

  test("the delta-summed prior survives store compaction") {
    val d = dirs("bp5")
    landParquet(d.landing, "b1.parquet",
      docs((1L, s"$boiler u1a u1b u1c u1d u1e u1f u1g u1h")))
    IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    landParquet(d.landing, "b2.parquet",
      docs((2L, s"$boiler x2a x2b x2c x2d x2e x2f x2g x2h")))
    IncrementalBoilerplate.run(
      spark, d.landing.toString, d.ckpt, d.dfPath, d.corpusPath, schema)
    val probe = Dedup.chunkRows(
      docs((9L, s"$boiler z z z z z z z z"))).select("chunk_hash")
    def dfMap(path: String, exclude: Long) = IncrementalBoilerplate
      .priorDf(spark, path, probe, excludeBatchId = exclude)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getLong(2)).toMap
    val before = dfMap(d.dfPath, 99L)
    // fold the per-batch deltas into batch=-1, keeping the bucket layout
    val dfPath2 = Files.createTempDirectory("bp5-df2").toString + "/d"
    StoreMaintenance.compact(spark, d.dfPath, dfPath2, numFiles = 1,
      bucketBy = Some(("chunk_hash", IncrementalBoilerplate.NumDfBuckets)))
    assert(dfMap(dfPath2, 99L) == before,
      "compaction must preserve the delta-summed prior exactly")
    // the folded batch=-1 rows survive a live batch id's own-partition
    // exclusion (the replay guard must never exclude compacted history)
    assert(dfMap(dfPath2, 0L) == before)
    assert(before.values.exists(_ == 2L), "the shared chunk's df must sum to 2")
  }
}
