package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.QualityClassifier
import graft.streaming.{IncrementalQualityFilter, QualityFilterMaintenance}

/** Incremental NB quality filter: the model freezes at bootstrap and every
  * later batch scores against it (frozen-reference, the IncrementalPqIndex
  * contract); a single drain reproduces the batch operator exactly;
  * replays are idempotent; label-free batches score fine after bootstrap;
  * and a drifted crawl mix trips [[QualityFilterMaintenance]]'s
  * counterfactual, after which the achieved admission fraction matches the
  * batch operator on the current window.
  */
class IncrementalQualityFilterSpec extends SparkSpec {

  private val SeedVocab = Seq("clean", "cite", "prose", "edit", "vet", "ref", "fact", "style")
  private val CrawlVocab = Seq("spam", "click", "win", "free", "buy", "now", "deal", "ad")

  /** Deterministic labeled corpus: ids ≡ 0 (mod 5) are the curated seed
    * drawing 6 tokens from `seedWords`, the rest are crawl drawing from
    * `crawlWords`; token choice is hash-driven per (doc_id, position).
    */
  private def corpus(lo: Long, hi: Long,
      seedWords: Seq[String] = SeedVocab,
      crawlWords: Seq[String] = CrawlVocab): DataFrame = {
    def arr(ws: Seq[String]) =
      ws.map(w => s"'$w'").mkString("array(", ", ", ")")
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "IF(doc_id % 5 = 0, 'src0', 'srcX') AS source",
      s"""array_join(transform(sequence(0, 5),
         |  i -> element_at(IF(doc_id % 5 = 0, ${arr(seedWords)}, ${arr(crawlWords)}),
         |                  CAST(pmod(hash(doc_id, i), 8) AS INT) + 1)), ' ')
         |  AS text""".stripMargin.replaceAll("\n", " "))
  }

  private def schema = corpus(0L, 1L).schema

  test("a single drain reproduces the batch operator exactly") {
    val landing = Files.createTempDirectory("nbf-landing")
    val ckpt = Files.createTempDirectory("nbf-ckpt").toString + "/c"
    val root = Files.createTempDirectory("nbf-root").toString + "/d"
    val docs = corpus(0L, 400L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalQualityFilter.run(
      spark, landing.toString, ckpt, root, schema)
    assert(ledger.count() == 400L)
    // the bootstrap batch IS the corpus, so the frozen model equals the
    // batch operator's and the drained admission matches
    // QualityClassifier.select row-for-row, scores included
    val streamSel = ledger.filter(col("selected"))
      .select("doc_id", "n_tokens", "like_micro", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val batchSel = QualityClassifier.select(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(batchSel.nonEmpty && streamSel == batchSel)
    // the distinctive-vocabulary fixture admits the seed and only the seed
    val admitted = spark.read
      .parquet(IncrementalQualityFilter.admittedPath(root))
    assert(admitted.columns.toSet ==
      Set("doc_id", "source", "text", "batch"))
    assert(admitted.filter(col("source") =!= "src0").count() == 0)
    assert(admitted.count() == docs.filter(col("source") === "src0").count())
  }

  test("later batches score under the FROZEN model, labels not required") {
    val landing = Files.createTempDirectory("nbf2-landing")
    val ckpt = Files.createTempDirectory("nbf2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("nbf2-root").toString + "/d"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalQualityFilter.run(spark, landing.toString, ckpt, root, schema)
    val (frozenModel, frozenPrior) =
      IncrementalQualityFilter.readModel(spark, root)
    // batch 2 is crawl-only (no seed rows): per-batch re-training would be
    // degenerate; the frozen model must not move. The source column is
    // still in the landing schema but the SCORES must not depend on it.
    val b2 = corpus(300L, 500L).filter(col("doc_id") % 5 =!= 0)
    landParquet(landing, "b2.parquet", b2)
    val ledger = IncrementalQualityFilter.run(
      spark, landing.toString, ckpt, root, schema)
    val got = ledger.join(b2.select("doc_id"), Seq("doc_id"))
      .select("doc_id", "like_micro", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = IncrementalQualityFilter
      .scoreBatch(b2.drop("source"), frozenModel, frozenPrior)
      .select("doc_id", "like_micro", "score_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want,
      "batch 2 must score under the frozen model, label-free")
    // crawl-vocabulary rows stay rejected under the frozen model
    assert(ledger.join(b2.select("doc_id"), Seq("doc_id"))
      .filter(col("selected")).count() == 0)
  }

  test("an at-least-once replay rewrites identical ledger rows") {
    val landing = Files.createTempDirectory("nbf3-landing")
    val ckpt = Files.createTempDirectory("nbf3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("nbf3-root").toString + "/d"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = IncrementalQualityFilter.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    // crash-replay: the checkpoint survives but batch 0's commit (and
    // its crc sibling) is lost, so the restarted drain re-executes it;
    // the frozen model already exists, scoring is deterministic, the
    // overwrite directories land byte-identical decisions. (A fresh
    // checkpoint is NOT a replay — the era guard refuses it.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalQualityFilter.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("nbf3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalQualityFilter.run(
        spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("crawl-mix drift trips the counterfactual; the fraction recovers") {
    val landing = Files.createTempDirectory("nbf4-landing")
    val ckpt = Files.createTempDirectory("nbf4-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("nbf4-root").toString + "/d"
    val genRoot = Files.createTempDirectory("nbf4-gen").toString + "/g"
    val boot = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalQualityFilter.run(
      spark, landing.toString, ckpt, flatRoot, schema)

    val gen0 = QualityFilterMaintenance.adopt(spark, genRoot, flatRoot)
    assert(QualityFilterMaintenance.currentRoot(spark, genRoot) == gen0)
    // below-threshold maintain is a pure read
    val noop = QualityFilterMaintenance.maintain(
      spark, genRoot, boot, threshold = 1.0)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(QualityFilterMaintenance.currentRoot(spark, genRoot) == gen0)

    // DRIFT: the crawl class adopts the seed vocabulary (spam learns to
    // sound curated) — under the frozen model the whole window is
    // admitted; under current statistics the classes are separable again
    // only through the fresh counts. The window (not the all-time union)
    // is the measurement corpus — drift is a property of what is arriving
    // NOW
    val drifted = corpus(300L, 700L, crawlWords = SeedVocab)
    val report = QualityFilterMaintenance.maintain(spark, genRoot, drifted)
    assert(report.retrained,
      s"fraction drift ${report.frozenFraction} vs " +
        s"${report.candidateFraction} must trip the default threshold")
    val gen1 = report.generation.get
    assert(QualityFilterMaintenance.currentRoot(spark, genRoot) == gen1)
    // the carried history survives intact
    assert(spark.read
      .parquet(IncrementalQualityFilter.ledgerPath(gen1)).count() ==
      spark.read
        .parquet(IncrementalQualityFilter.ledgerPath(gen0)).count())

    // AFTER: the stream re-enters on the retrained generation under a
    // fresh checkpoint; the achieved fraction equals the batch operator's
    // on the current window — recalibration recovered the contract
    val landing2 = Files.createTempDirectory("nbf4-landing2")
    val ckpt2 = Files.createTempDirectory("nbf4-ckpt2").toString + "/c"
    landParquet(landing2, "b2.parquet", drifted)
    IncrementalQualityFilter.run(
      spark, landing2.toString, ckpt2, gen1, schema)
    val era = spark.read
      .parquet(IncrementalQualityFilter.ledgerPath(gen1))
      .filter(col("batch") >= 0)
    assert(era.count() == drifted.count())
    val achieved = era.filter(col("selected")).count().toDouble /
      era.count()
    val sm = QualityClassifier.summary(drifted)
    val (nSel, nDocs) = (
      sm.agg(sum("n_selected")).head().getLong(0),
      sm.agg(sum("n_docs")).head().getLong(0))
    val batchFraction = nSel.toDouble / nDocs
    assert(achieved == batchFraction,
      s"post-retrain fraction $achieved must equal the batch operator's " +
        s"$batchFraction")
  }
}
