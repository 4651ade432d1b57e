package graft

import org.apache.spark.sql.functions._

import graft.ops.{Dedup, HashSplit, Similarity}
import graft.testdata.{TestFixtures => T}

/** Semantic decontamination (Similarity.crossSetContamination +
  * HashSplit.semanticContamination): planted-duplicate recall, exactness
  * of the verify stage (no false positives vs brute force), and the
  * hot-bucket degradation guard.
  */
class SemanticDecontamSpec extends SparkSpec {

  private lazy val emb = T.table(spark, sf, "embeddings")
  private lazy val docs = T.table(spark, sf, "documents")

  /** Exact brute-force cross-set contamination (quadratic ground truth). */
  private def brute(corpus: org.apache.spark.sql.DataFrame,
      probe: org.apache.spark.sql.DataFrame): Map[Long, (Long, Double)] = {
    val a = Similarity.withNorms(corpus).select(
      col("vec_id").as("a_id"), col("embedding").as("a_emb"), col("norm").as("a_norm"))
    val b = Similarity.withNorms(probe).select(
      col("vec_id").as("b_id"), col("embedding").as("b_emb"), col("norm").as("b_norm"))
    a.crossJoin(b)
      .select(col("a_id"), col("b_id"),
        (expr(Dedup.dot("a_emb", "b_emb")) / (col("a_norm") * col("b_norm")))
          .as("cos"))
      .filter(col("cos") >= Similarity.NearDupCosine)
      .groupBy("a_id").agg(count(lit(1)).as("n"), max("cos").as("mx"))
      .collect().map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
  }

  test("planted probe copies are flagged with certainty") {
    // probe = exact copies of 5 corpus vectors under new ids: cosine 1.0,
    // hamming 0 — every band collides, so banded recall is exact for true
    // duplicates (the contamination case that matters)
    val planted = Seq(3L, 77L, 123L, 250L, 444L)
    val probe = emb.filter(col("vec_id").isin(planted: _*))
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding"))
    val flagged = Similarity.crossSetContamination(emb, probe)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    planted.foreach(p => assert(flagged.contains(p), s"planted $p not flagged"))
    val maxes = Similarity.crossSetContamination(emb, probe)
      .filter(col("vec_id").isin(planted: _*))
      .collect().map(r => r.getAs[Double]("max_cos"))
    maxes.foreach(m => assert(m > 0.999))
  }

  test("the verify stage is exact: flagged set has no false positives") {
    val sp = HashSplit.split(docs).select("doc_id", "split")
    def side(name: String) = emb
      .join(sp.filter(col("split") === name), col("vec_id") === col("doc_id"))
      .select("vec_id", "embedding")
    val truth = brute(side("train"), side("test"))
    val got = HashSplit.semanticContamination(docs, emb).collect()
      .map(r => r.getLong(0) -> ((r.getLong(1), r.getDouble(2)))).toMap
    assert(got.nonEmpty)
    got.foreach { case (id, (n, mx)) =>
      val (tn, tmx) = truth.getOrElse(id,
        fail(s"false positive: $id not in brute-force result"))
      assert(n <= tn, s"$id reports more hits than brute force")
      assert(mx == tmx || mx <= tmx, s"$id max_cos above brute force")
    }
  }

  test("a hot probe bucket degrades to its star root and stays a subset") {
    val probe = emb.filter(col("vec_id") >= 400)
      .select("vec_id", "embedding")
    val truth = brute(emb.filter(col("vec_id") < 400), probe)
    val capped = Similarity.crossSetContamination(
        emb.filter(col("vec_id") < 400), probe, maxBandOccupancy = 1)
      .collect().map(r => r.getAs[Long]("vec_id")).toSet
    assert(capped.nonEmpty)
    capped.foreach(id => assert(truth.contains(id),
      s"capped run flagged $id not present in brute force"))
  }
}
