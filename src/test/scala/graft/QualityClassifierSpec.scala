package graft

import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier
import graft.testdata.{TestFixtures => T}

/** NB quality classifier (graft.ops.QualityClassifier) properties beyond
  * the sf oracle: the smoothed log-odds formula against an independent
  * computation, the seed-vocabulary-scores-higher semantics, consistency
  * between score/select/summary, and the frozen-model seam.
  */
class QualityClassifierSpec extends SparkSpec {

  import spark.implicits._

  private lazy val docs = T.table(spark, sf, "documents")

  /** Tiny labeled corpus: seed docs speak "good", crawl docs speak "bad",
    * one shared token keeps a mixed bucket in play.
    */
  private lazy val tiny = Seq(
    (0L, "good good shared", "src0"),
    (1L, "good shared", "src0"),
    (2L, "bad bad shared", "srcX"),
    (3L, "bad shared", "srcX"),
    (4L, "", "srcX"))
    .toDF("doc_id", "text", "source")

  test("the model matches an independent smoothed log-odds computation") {
    val m = QualityClassifier.modelTable(tiny)
      .collect()
      .map(r => (r.getAs[Long]("n_seed"), r.getAs[Long]("n_crawl")) ->
        r.getAs[Long]("w_micro")).toMap
    // token totals: seed = 5 (good×3, shared×2), crawl = 5 (bad×3, shared×2)
    // buckets: good (3, 0), bad (0, 3), shared (2, 2)
    assert(m.keySet == Set((3L, 0L), (0L, 3L), (2L, 2L)))
    val b = QualityClassifier.Buckets
    def expect(ns: Long, nc: Long): Long =
      math.floor((math.log((ns + 1.0) / (5 + b))
        - math.log((nc + 1.0) / (5 + b))) * QualityClassifier.Micro).toLong
    m.foreach { case ((ns, nc), w) => assert(w == expect(ns, nc)) }
  }

  test("every document gets exactly one score row; score = prior + likelihood") {
    val sc = QualityClassifier.score(tiny)
    assert(sc.count() == 5)
    assert(sc.select("doc_id").distinct().count() == 5)
    // prior: 2 seed docs, 3 crawl docs -> floor(ln(3/4) * 1e6)
    val prior = math.floor(
      math.log(3.0 / 4.0) * QualityClassifier.Micro).toLong
    val bad = sc.filter(
      col("score_micro") =!= col("like_micro") + lit(prior))
    assert(bad.count() == 0)
    // the token-less document carries likelihood exactly 0
    assert(sc.filter(col("doc_id") === 4L).head()
      .getAs[Long]("like_micro") == 0L)
  }

  test("seed-vocabulary documents out-score crawl-vocabulary documents") {
    val byDoc = QualityClassifier.score(tiny)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("like_micro")).toMap
    assert(byDoc(0L) > 0L && byDoc(1L) > 0L, s"seed docs not positive: $byDoc")
    assert(byDoc(2L) < 0L && byDoc(3L) < 0L, s"crawl docs not negative: $byDoc")
    assert(byDoc(0L) > byDoc(1L)) // more seed tokens, higher score
  }

  test("select is the per-token-thresholded subset; summary agrees per source") {
    val sel = QualityClassifier.select(docs).collect()
      .map(_.getAs[Long]("doc_id")).toSet
    val expected = QualityClassifier.score(docs)
      .filter(col("n_tokens") >= 1 && col("like_micro") >=
        lit(QualityClassifier.SelectTauMicro) * col("n_tokens"))
      .collect().map(_.getAs[Long]("doc_id")).toSet
    assert(sel == expected)
    // the sf calibration keeps the row non-degenerate: some but not all
    assert(sel.nonEmpty && sel.size < docs.count())
    val sm = QualityClassifier.summary(docs).collect()
    assert(sm.map(_.getAs[Long]("n_docs")).sum == docs.count())
    assert(sm.map(_.getAs[Long]("n_selected")).sum == sel.size)
  }

  test("frozen-model seam: scoreWith an explicit model matches the live score") {
    val model = QualityClassifier.modelTable(tiny)
    val prior = QualityClassifier.priorRow(tiny)
    val live = QualityClassifier.score(tiny)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_micro")).toMap
    val frozen = QualityClassifier.scoreWith(tiny, model, prior)
      .collect().map(r => r.getAs[Long]("doc_id") ->
        r.getAs[Long]("score_micro")).toMap
    assert(frozen == live)
    // and a NEW batch scored against the frozen model uses the OLD stats;
    // out-of-vocabulary tokens ("novel" hashes to a bucket the frozen
    // model never saw) weigh 0 but still count in n_tokens — the
    // per-token threshold must divide by the document's true length
    val batch = Seq((9L, "good good novel", "srcY"))
      .toDF("doc_id", "text", "source")
    val wGood = model.filter(col("n_seed") === 3L).head().getAs[Long]("w_micro")
    val pr = prior.head().getAs[Long]("prior_micro")
    val row = QualityClassifier.scoreWith(batch, model, prior).head()
    assert(row.getAs[Long]("n_tokens") == 3L)
    assert(row.getAs[Long]("like_micro") == 2 * wGood)
    assert(row.getAs[Long]("score_micro") == 2 * wGood + pr)
  }
}
