package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ops.Similarity
import graft.streaming.{IncrementalIvfPqIndex, IvfPqMaintenance, StoreMaintenance}
import graft.testdata.{TestFixtures => T}

/** Residual IVFPQ maintenance: the drift monitor stays quiet on the
  * bootstrap-era corpus, trips on a drifted one, the retrained generation
  * recovers search recall against brute force, and the stream re-enters
  * the published generation on its frozen quantizer pair.
  */
class IvfPqMaintenanceSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb = T.table(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  /** The corpus after a re-crawl drift: every component shifted by +4 —
    * far from the unit-sphere region both bootstrap quantizers were
    * trained on (the [[PqMaintenanceSpec]] drift).
    */
  private def drifted(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x + 4.0 AS FLOAT))")
        .as("embedding"))

  private def bootstrapStore(): (String, String) = {
    val landing = Files.createTempDirectory("ipqm-landing")
    val ckpt = Files.createTempDirectory("ipqm-ckpt").toString + "/c"
    val flat = Files.createTempDirectory("ipqm-flat").toString + "/idx"
    landParquet(landing, "b1.parquet",
      spark.createDataFrame(emb.collect().toSeq.asJava, embSchema))
    IncrementalIvfPqIndex.run(spark, landing.toString, ckpt, flat, embSchema)
    val root = Files.createTempDirectory("ipqm-root").toString + "/ivfpq"
    val gen = IvfPqMaintenance.adopt(spark, root, flat)
    (root, gen)
  }

  private def hits(df: DataFrame): Set[(Long, Long)] =
    df.select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  /** recall@k of an approximate neighbor set against the brute top-k. */
  private def recallVsBrute(approx: DataFrame, corpus: DataFrame): Double = {
    val exact = hits(Similarity.bruteTopK(corpus))
    if (exact.isEmpty) 0.0
    else hits(approx).intersect(exact).size.toDouble / exact.size
  }

  test("adopt republishes the flat store; the search is unchanged by it") {
    val (root, gen) = bootstrapStore()
    assert(StoreMaintenance.resolveCurrent(spark, root) == gen)
    val queries = emb.filter(col("vec_id") % Similarity.QueryStride === 0)
    val viaPointer = IvfPqMaintenance.searchCurrent(spark, root, queries)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    // the compacted batch=-1 re-bucketed generation must answer exactly
    // like the batch operator the drain was pinned against
    val want = graft.ops.Pq.ivfpqTopK(emb)
      .select("query_id", "neighbor_id", "rank").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    assert(viaPointer == want)
  }

  test("no drift: the monitor measures near-parity and does not retrain") {
    val (root, _) = bootstrapStore()
    val r = IvfPqMaintenance.maintain(spark, root, emb)
    assert(!r.retrained, s"retrained at ratio ${r.errorRatio}")
    assert(r.errorRatio < IvfPqMaintenance.DefaultErrorRatioThreshold)
  }

  test("drift trips the monitor; the retrained generation recovers recall") {
    val (root, gen0) = bootstrapStore()
    val moved = drifted(emb)
    val queries = moved.filter(col("vec_id") % Similarity.QueryStride === 0)
    // stale index, moved corpus: codes still describe the OLD vectors, so
    // the search ranks against where the corpus USED to be
    val before = recallVsBrute(
      IvfPqMaintenance.searchCurrent(spark, root, queries), moved)
    val r = IvfPqMaintenance.maintain(spark, root, moved)
    assert(r.retrained, s"drift not detected (ratio ${r.errorRatio})")
    val cur = StoreMaintenance.resolveCurrent(spark, root)
    assert(r.generation.contains(cur) && cur != gen0)
    // the re-encoded generation carries every current vector exactly once
    val codes = spark.read
      .parquet(IvfPqMaintenance.codePath(cur)).drop("batch", "id_bucket")
    assert(codes.count() == moved.count())
    assert(codes.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    val after = recallVsBrute(
      IvfPqMaintenance.searchCurrent(spark, root, queries), moved)
    info(s"recall@10 vs brute: stale $before -> retrained $after " +
      s"(ratio ${r.errorRatio})")
    assert(after > before,
      s"retrain did not recover recall: $before -> $after")
  }

  test("the stream re-enters the retrained generation on frozen quantizers") {
    val (root, _) = bootstrapStore()
    val moved = drifted(emb)
    val r = IvfPqMaintenance.maintain(spark, root, moved)
    assert(r.retrained)
    val cur = StoreMaintenance.resolveCurrent(spark, root)
    val bookBefore = graft.streaming.IncrementalPqIndex.readCodebook(
      spark, IvfPqMaintenance.bookPath(cur))
    // new landing of additional drifted vectors under fresh ids; a fresh
    // checkpoint against the published generation's paths must ADOPT both
    // retrained quantizers (bootstrap guard keys on book existence)
    val extra = drifted(emb.filter(col("vec_id") < 50))
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
    val landing = Files.createTempDirectory("ipqm-landing2")
    landParquet(landing, "b1.parquet",
      spark.createDataFrame(extra.collect().toSeq.asJava, embSchema))
    val ckpt = Files.createTempDirectory("ipqm-ckpt2").toString + "/c"
    val store = IncrementalIvfPqIndex.run(
      spark, landing.toString, ckpt, cur, embSchema)
    val bookAfter = graft.streaming.IncrementalPqIndex.readCodebook(
      spark, IvfPqMaintenance.bookPath(cur))
    assert(bookBefore.map(c => (c.m, c.k, c.cnorm2)) ==
      bookAfter.map(c => (c.m, c.k, c.cnorm2)))
    assert(store.filter(col("vec_id") >= 7000L).count() == 50)
    // the adds are searchable through the live pointer
    val got = IvfPqMaintenance.searchCurrent(spark, root, extra.limit(1))
      .collect()
    assert(got.nonEmpty)
  }
}
