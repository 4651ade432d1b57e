package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{ArrayType, FloatType, LongType, StructField, StructType}

import graft.ops.{Pq, Similarity}
import graft.streaming.{IncrementalPqIndex, PqMaintenance, StoreMaintenance}
import graft.testdata.{TestFixtures => T}

/** PQ maintenance: the drift monitor stays quiet on the bootstrap-era
  * corpus, trips on a drifted one, and the retrained generation encodes
  * better, searches, and re-enters the stream.
  */
class PqMaintenanceSpec extends SparkSpec {

  private val embSchema = StructType(Seq(
    StructField("vec_id", LongType),
    StructField("embedding", ArrayType(FloatType))))

  private lazy val emb = T.table(spark, sf, "embeddings")
    .select("vec_id", "embedding")

  /** The corpus after drift: every component shifted by +4 — far from the
    * unit-sphere region the bootstrap codebook was trained on.
    */
  private def drifted(df: DataFrame): DataFrame =
    df.select(col("vec_id"),
      expr("transform(embedding, x -> CAST(x + 4.0 AS FLOAT))")
        .as("embedding"))

  private def bootstrapStore(): (String, String, String) = {
    val landing = Files.createTempDirectory("pqm-landing")
    val ckpt = Files.createTempDirectory("pqm-ckpt").toString + "/c"
    val book = Files.createTempDirectory("pqm-book").toString + "/book"
    val codes = Files.createTempDirectory("pqm-codes").toString + "/codes"
    landParquet(landing, "b1.parquet",
      spark.createDataFrame(emb.collect().toSeq.asJava, embSchema))
    IncrementalPqIndex.run(
      spark, landing.toString, ckpt, book, codes, embSchema)
    val root = Files.createTempDirectory("pqm-root").toString + "/pq"
    val gen = PqMaintenance.adopt(spark, root, book, codes)
    (root, book, gen)
  }

  test("no drift: the monitor measures near-parity and does not retrain") {
    val (root, _, _) = bootstrapStore()
    val r = PqMaintenance.maintain(spark, root, emb)
    assert(!r.retrained, s"retrained at ratio ${r.errorRatio}")
    assert(r.errorRatio < PqMaintenance.DefaultErrorRatioThreshold)
  }

  test("drift trips the monitor; the retrained generation encodes better") {
    val (root, _, gen0) = bootstrapStore()
    val moved = drifted(emb)
    val live = IncrementalPqIndex.readCodebook(
      spark, PqMaintenance.bookPath(gen0))
    val before = Pq.quantizationError(moved, live)
      .collect().head.getDouble(1)
    val r = PqMaintenance.maintain(spark, root, moved)
    assert(r.retrained, s"drift not detected (ratio ${r.errorRatio})")
    val cur = StoreMaintenance.resolveCurrent(spark, root)
    assert(r.generation.contains(cur))
    val after = Pq.quantizationError(moved,
      IncrementalPqIndex.readCodebook(spark, PqMaintenance.bookPath(cur)))
      .collect().head.getDouble(1)
    assert(after < before / PqMaintenance.DefaultErrorRatioThreshold,
      s"retrain did not recover error: $before -> $after")
    // the re-encoded store answers searches on the new generation
    val queries = moved.filter(col("vec_id") % Similarity.QueryStride === 0)
    val hits = PqMaintenance.searchCurrent(spark, root, queries)
    assert(hits.count() > 0)
    assert(hits.groupBy("query_id").count()
      .agg(max("count")).collect().head.getLong(0) <= Similarity.TopK)
  }

  test("the stream re-enters the retrained generation on its frozen book") {
    val (root, _, _) = bootstrapStore()
    val moved = drifted(emb)
    PqMaintenance.maintain(spark, root, moved)
    val cur = StoreMaintenance.resolveCurrent(spark, root)
    // new landing of additional drifted vectors under fresh ids; a fresh
    // checkpoint against the published generation's paths must ADOPT the
    // retrained book (bootstrap guard keys on book existence), not retrain
    val extra = drifted(emb.filter(col("vec_id") < 50))
      .select((col("vec_id") + 7000L).as("vec_id"), col("embedding"))
    val landing = Files.createTempDirectory("pqm-landing2")
    landParquet(landing, "b1.parquet",
      spark.createDataFrame(extra.collect().toSeq.asJava, embSchema))
    val ckpt = Files.createTempDirectory("pqm-ckpt2").toString + "/c"
    val bookBefore = IncrementalPqIndex.readCodebook(
      spark, PqMaintenance.bookPath(cur))
    val store = IncrementalPqIndex.run(
      spark, landing.toString, ckpt,
      PqMaintenance.bookPath(cur), PqMaintenance.codesPath(cur), embSchema)
    val bookAfter = IncrementalPqIndex.readCodebook(
      spark, PqMaintenance.bookPath(cur))
    assert(bookBefore.map(c => (c.m, c.k, c.cnorm2)) ==
      bookAfter.map(c => (c.m, c.k, c.cnorm2)))
    assert(store.filter(col("vec_id") >= 7000L).count() == 50)
    // the adds are searchable through the live pointer
    val got = PqMaintenance.searchCurrent(spark, root,
        extra.limit(1))
      .collect()
    assert(got.nonEmpty)
  }
}
