package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ops.{Pq, Similarity}
import graft.streaming.{IncrementalAnnIndex, IncrementalPqIndex}
import graft.testdata.{TestFixtures => T}

/** Incremental PQ code store: frozen-codebook adds reproduce the batch
  * operator, searches run against accumulated codes, re-crawls are
  * ignored, replay is idempotent, and an empty bootstrap epoch doesn't
  * brick the stream.
  */
class IncrementalPqIndexSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb = T.table(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  private def land(landing: Path, name: String, rs: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rs.asJava, embSchema))

  private def dirs(): (Path, String, String, String) = {
    val landing = Files.createTempDirectory("ipq-landing")
    val ckpt = Files.createTempDirectory("ipq-ckpt").toString + "/c"
    val book = Files.createTempDirectory("ipq-book").toString + "/book"
    val codes = Files.createTempDirectory("ipq-codes").toString + "/codes"
    (landing, ckpt, book, codes)
  }

  private def codeSet(df: DataFrame): Set[(Long, Long)] =
    df.select("vec_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("an ordered drain reproduces the batch encoder and its ADC search") {
    val (landing, ckpt, book, codes) = dirs()
    // bootstrap batch carries the seed vec_ids (< CodebookSize), so the
    // frozen codebook equals the batch operator's
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 200)))
    land(landing, "b2.parquet",
      rows(emb.filter(col("vec_id") >= 200 && col("vec_id") < 400)))
    IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    land(landing, "b3.parquet", rows(emb.filter(col("vec_id") >= 400)))
    val store = IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    assert(codeSet(store) == codeSet(Pq.codes(emb)))
    // store search == the batch ADC top-k (shared code path, same book)
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    val got = IncrementalPqIndex.searchStore(spark, codes, book, queries)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Pq.adcTopK(emb)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("a re-landed vec_id is ignored: first write wins, codes stay stable") {
    val (landing, ckpt, book, codes) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 100)))
    IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    // re-crawl of ids 0..49 with DIFFERENT embeddings (vector 100's data)
    val recrawl = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select((col("vec_id") - 100L).as("vec_id"), col("embedding"))
    land(landing, "b2.parquet", rows(recrawl))
    val store = IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    assert(store.count() == 100)
    assert(codeSet(store) ==
      codeSet(Pq.codes(emb.filter(col("vec_id") < 100))))
  }

  test("a crash-replay rewrites identical code batches") {
    val (landing, ckpt, book, codes) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 300)))
    val first = codeSet(IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema))
    // crash-replay: commit 0 (and its crc sibling) lost, checkpoint
    // kept — a fresh checkpoint is NOT a replay; the era guard refuses it
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = codeSet(IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema))
    assert(first == second)
    assert(spark.read.parquet(codes).count() == first.size)
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("ipq-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalPqIndex.run(
        spark, landing.toString, ckptF, book, codes, embSchema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("an empty bootstrap epoch does not brick the stream") {
    val (landing, ckpt, book, codes) = dirs()
    // drain an empty landing: epoch 0 commits empty, no codebook written
    IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 100)))
    val store = IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    assert(store.count() == 100)
    assert(IncrementalPqIndex.readCodebook(spark, book).size ==
      Pq.NumSubspaces * Pq.CodebookSize)
  }

  test("the membership probe prunes to the batch's touched id buckets") {
    val (landing, ckpt, book, codes) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 300)))
    IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    val probe = emb.filter(col("vec_id") < 8).select("vec_id")
    val prior = IncrementalAnnIndex.priorIds(spark, codes, probe, 999L)
    val got = prior.collect().map(_.getLong(0)).toSet
    // the pruned read returns every stored id in the TOUCHED buckets —
    // a superset of the probed ids (the anti-join filters downstream) but
    // a strict subset of the 300-row store
    assert((0L until 8L).toSet.subsetOf(got))
    assert(got.size < 300, s"probe read the whole store (${got.size} ids)")
    val scans = prior.queryExecution.executedPlan.toString
    assert(scans.contains("id_bucket"), scans)
  }
}
