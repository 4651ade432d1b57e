package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dsir}
import graft.streaming.{IncrementalLearnedEnsemble, LearnedEnsembleMaintenance}

/** Ensemble maintenance: the three family counterfactuals composed over
  * one generation swap — a drifted family is retrained, stable families'
  * tables are carried verbatim, history is carried count-verified, and
  * the single drain re-enters the published generation.
  */
class LearnedEnsembleMaintenanceSpec extends SparkSpec {

  /** The [[IncrementalLearnedEnsembleSpec]] corpus: even ids are fluent
    * seed docs, odd ids hash-token crawl docs; lang cycles on doc_id % 3.
    */
  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "IF(doc_id % 2 = 0, 'src0', 'crawl') AS source",
      "IF(doc_id % 3 = 0, 'en', 'de') AS lang",
      """IF(doc_id % 2 = 0,
        |  array_join(transform(sequence(0, 39), i -> concat('w', i % 4)), ' '),
        |  array_join(transform(sequence(0, 11),
        |    i -> element_at(array('w0', 'w1', 'w2', 'w3',
        |                          'x0', 'x1', 'x2', 'x3'),
        |                    CAST(pmod(hash(doc_id, i), 8) AS INT) + 1)), ' '))
        |  AS text""".stripMargin.replaceAll("\n", " "))

  private def schema = corpus(0L, 1L).schema

  private def bootstrapped(): (String, String, DataFrame) = {
    val landing = Files.createTempDirectory("ensm-landing")
    val ckpt = Files.createTempDirectory("ensm-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("ensm-root").toString + "/e"
    val genRoot = Files.createTempDirectory("ensm-gen").toString + "/g"
    val boot = corpus(0L, 400L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalLearnedEnsemble.run(spark, landing.toString, ckpt, flatRoot, schema)
    LearnedEnsembleMaintenance.adopt(spark, genRoot, flatRoot)
    (genRoot, flatRoot, boot)
  }

  test("a window matching the bootstrap is a no-op for every family") {
    val (genRoot, _, boot) = bootstrapped()
    val gen0 = LearnedEnsembleMaintenance.currentRoot(spark, genRoot)
    // candidates trained on the bootstrap window ARE the frozen tables
    // (deterministic training), so every achieved fraction matches its
    // counterfactual exactly and the DEFAULT threshold holds
    val r = LearnedEnsembleMaintenance.maintain(spark, genRoot, boot)
    assert(!r.nb.retrained && !r.lm.retrained && !r.dsir.retrained, r)
    assert(r.generation.isEmpty)
    assert(r.nb.frozenFraction == r.nb.candidateFraction)
    assert(r.lm.frozenFraction == r.lm.candidateFraction)
    assert(r.dsir.frozenFraction == r.dsir.candidateFraction)
    assert(LearnedEnsembleMaintenance.currentRoot(spark, genRoot) == gen0)
  }

  test("a lang-composition drift retrains DSIR alone; stable tables carry") {
    val (genRoot, _, boot) = bootstrapped()
    val gen0 = LearnedEnsembleMaintenance.currentRoot(spark, genRoot)
    // DRIFT: the window's text and source mix are UNCHANGED (the NB and
    // LM candidates train to the exact frozen tables — zero drift by
    // construction), but every document now labels `en`: the DSIR target
    // slice collapses onto the whole corpus, its candidate ratios flatten,
    // and the achieved selection fraction slides
    val drifted = boot.withColumn("lang", lit("en"))
    val r = LearnedEnsembleMaintenance.maintain(spark, genRoot, drifted)
    assert(!r.nb.retrained && r.nb.frozenFraction == r.nb.candidateFraction, r)
    assert(!r.lm.retrained && r.lm.frozenFraction == r.lm.candidateFraction, r)
    assert(r.dsir.retrained,
      s"dsir ${r.dsir.frozenFraction} vs ${r.dsir.candidateFraction} " +
        "must trip the default threshold")
    val gen1 = r.generation.get
    assert(LearnedEnsembleMaintenance.currentRoot(spark, genRoot) == gen1)
    // stable families carried VERBATIM; the drifted table replaced
    val (nb0, _, lm0, _, lr0) = IncrementalLearnedEnsemble.readTables(spark, gen0)
    val (nb1, _, lm1, _, lr1) = IncrementalLearnedEnsemble.readTables(spark, gen1)
    def rows(df: DataFrame) = df.collect().map(_.toString).sorted.toSeq
    assert(rows(nb1) == rows(nb0) && rows(lm1) == rows(lm0))
    assert(rows(lr1) != rows(lr0))
    assert(rows(lr1) == rows(Dsir.ratioTable(Dsir.featureCounts(drifted))))
    // decision history carried count-verified
    assert(spark.read.parquet(IncrementalLearnedEnsemble.ledgerPath(gen1)).count()
      == spark.read.parquet(IncrementalLearnedEnsemble.ledgerPath(gen0)).count())
    assert(spark.read.parquet(IncrementalLearnedEnsemble.admittedPath(gen1)).count()
      == spark.read.parquet(IncrementalLearnedEnsemble.admittedPath(gen0)).count())
  }

  test("the drain re-enters the published generation on its new tables") {
    val (genRoot, _, boot) = bootstrapped()
    val gen0 = LearnedEnsembleMaintenance.currentRoot(spark, genRoot)
    val drifted = boot.withColumn("lang", lit("en"))
    val r = LearnedEnsembleMaintenance.maintain(spark, genRoot, drifted)
    assert(r.dsir.retrained)
    val gen1 = LearnedEnsembleMaintenance.currentRoot(spark, genRoot)

    // a fresh batch drains against the published generation under a fresh
    // checkpoint: the bootstrap guard sees the tables and adopts them
    val landing2 = Files.createTempDirectory("ensm-landing2")
    val ckpt2 = Files.createTempDirectory("ensm-ckpt2").toString + "/c"
    val b2 = corpus(400L, 600L)
    landParquet(landing2, "b2.parquet", b2)
    IncrementalLearnedEnsemble.run(spark, landing2.toString, ckpt2, gen1, schema)
    val got = spark.read.parquet(IncrementalLearnedEnsemble.ledgerPath(gen1))
      .filter(col("batch").cast("long") === 0L)
      .select("doc_id", "nb_selected", "lm_selected", "dsir_selected", "kept")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    // expectation built INDEPENDENTLY: gen0's carried nb/lm tables + a
    // ratio table trained directly on the drift window by the batch op
    val (nb0, prior0, lm0, ctx0, _) =
      IncrementalLearnedEnsemble.readTables(spark, gen0)
    val want = Curation.learnedAuditWith(b2, nb0, prior0, lm0, ctx0,
      Dsir.ratioTable(Dsir.featureCounts(drifted)))
      .select("doc_id", "nb_selected", "lm_selected", "dsir_selected", "kept")
      .collect().map(r => (r.getLong(0), r.getBoolean(1), r.getBoolean(2),
        r.getBoolean(3), r.getBoolean(4))).toSet
    assert(got == want)
  }
}
