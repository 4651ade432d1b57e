package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ops.{Pq, Similarity}
import graft.streaming.IncrementalIvfPqIndex
import graft.testdata.{TestFixtures => T}

/** Incremental residual IVFPQ store: both quantizers freeze at bootstrap,
  * adds assign+encode only, the store search reproduces the batch
  * operator on an ordered drain, re-crawls are ignored, and replay is
  * idempotent.
  */
class IncrementalIvfPqIndexSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb = T.table(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  private def rows(df: DataFrame): Seq[Row] = df.collect().toSeq

  private def land(landing: Path, name: String, rs: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rs.asJava, embSchema))

  private def dirs(): (Path, String, String) = {
    val landing = Files.createTempDirectory("iivfpq-landing")
    val ckpt = Files.createTempDirectory("iivfpq-ckpt").toString + "/c"
    val root = Files.createTempDirectory("iivfpq-root").toString + "/idx"
    (landing, ckpt, root)
  }

  private def codeSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select("vec_id", "list_id", "pq_code").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("an ordered drain reproduces the batch codes and the IVFPQ search") {
    val (landing, ckpt, root) = dirs()
    // bootstrap batch carries the leader ids (< NumLists) AND the residual
    // seed ids ([NumLists, NumLists + CodebookSize)), so both frozen
    // quantizers equal the batch operator's
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 200)))
    land(landing, "b2.parquet",
      rows(emb.filter(col("vec_id") >= 200 && col("vec_id") < 400)))
    IncrementalIvfPqIndex.run(spark, landing.toString, ckpt, root, embSchema)
    land(landing, "b3.parquet", rows(emb.filter(col("vec_id") >= 400)))
    val store = IncrementalIvfPqIndex.run(
      spark, landing.toString, ckpt, root, embSchema)
    // the store holds EVERY vector's codes (the cap is a search guard);
    // within the batch operator's capped lists the codes agree exactly
    assert(store.count() == emb.count())
    val batchCodes = codeSet(Pq.ivfpqCodes(emb))
    assert(batchCodes.subsetOf(codeSet(store)))
    // store search == the batch IVFPQ top-k (shared probe + scoring)
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    val got = IncrementalIvfPqIndex.searchStore(spark, root, queries)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val want = Pq.ivfpqTopK(emb)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(got == want)
  }

  test("a re-landed vec_id is ignored: first write wins, codes stay stable") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 100)))
    IncrementalIvfPqIndex.run(spark, landing.toString, ckpt, root, embSchema)
    val before = codeSet(spark.read
      .parquet(IncrementalIvfPqIndex.codePath(root)).drop("batch", "id_bucket"))
    // re-crawl of ids 0..49 with DIFFERENT embeddings (vector 100's data)
    val recrawl = emb.filter(col("vec_id") >= 100 && col("vec_id") < 150)
      .select((col("vec_id") - 100L).as("vec_id"), col("embedding"))
    land(landing, "b2.parquet", rows(recrawl))
    val store = IncrementalIvfPqIndex.run(
      spark, landing.toString, ckpt, root, embSchema)
    assert(codeSet(store) == before,
      "a re-crawled id must not re-enter or re-encode")
    assert(store.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  test("an at-least-once replay rewrites identical code rows") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", rows(emb.filter(col("vec_id") < 300)))
    val first = IncrementalIvfPqIndex.run(
      spark, landing.toString, ckpt, root, embSchema)
    val snapshot = codeSet(first)
    // crash-replay: the checkpoint survives but batch 0's commit (and
    // its crc sibling) is lost, so the restarted drain re-executes it;
    // the quantizers already exist, assignment/encode are deterministic,
    // and the own-partition-excluded guard re-derives the same rows. (A
    // fresh checkpoint is NOT a replay — the era guard refuses it.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalIvfPqIndex.run(
      spark, landing.toString, ckpt, root, embSchema)
    assert(codeSet(second) == snapshot)
    assert(second.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("iivfpq-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalIvfPqIndex.run(
        spark, landing.toString, ckptF, root, embSchema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("a bootstrap batch without the seed ids fails loudly") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet",
      rows(emb.filter(col("vec_id") >= 400 && col("vec_id") < 450)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalIvfPqIndex.run(spark, landing.toString, ckpt, root, embSchema)
    }
    assert(e.getMessage.contains("bootstrap") ||
      e.getCause.getMessage.contains("bootstrap"))
  }

  test("a leaderless bootstrap rejects the batch WITHOUT poisoning the root") {
    val (landing, ckpt, root) = dirs()
    // residual seeds all present, leader vec_ids only PARTIALLY present
    // (8 of 16): the codebook trains to full size against the 8 available
    // leaders, so only the pre-write leader validation stands between
    // this batch and a bricked store (a short leader store under an
    // existing codebook would skip bootstrap forever)
    land(landing, "b1.parquet",
      rows(emb.filter(col("vec_id") >= Similarity.NumLists / 2)))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalIvfPqIndex.run(spark, landing.toString, ckpt, root, embSchema)
    }
    assert(e.getMessage.contains("leaders") ||
      e.getCause.getMessage.contains("leaders"))
    // nothing durable was written — the root can still bootstrap
    assert(!graft.streaming.StoragePaths.exists(
      spark, IncrementalIvfPqIndex.bookPath(root)))
    assert(!graft.streaming.StoragePaths.exists(
      spark, IncrementalIvfPqIndex.leaderPath(root)))
    // a corrected batch heals: fresh landing + checkpoint, full id range
    val landing2 = Files.createTempDirectory("iivfpq-landing2")
    val ckpt2 = Files.createTempDirectory("iivfpq-ckpt2").toString + "/c"
    land(landing2, "b2.parquet", rows(emb.filter(col("vec_id") < 200)))
    val store = IncrementalIvfPqIndex.run(
      spark, landing2.toString, ckpt2, root, embSchema)
    assert(store.count() > 0)
  }
}
