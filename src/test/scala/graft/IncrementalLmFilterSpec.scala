package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.LmPerplexity
import graft.streaming.{IncrementalLmFilter, LmFilterMaintenance}

/** Incremental LM perplexity filtering: the bigram tables freeze at
  * bootstrap and every later batch scores against them label-free
  * (frozen-reference, the IncrementalPqIndex contract); a single drain
  * reproduces the batch operator exactly; replays are idempotent; and a
  * shifted target vocabulary trips [[LmFilterMaintenance]]'s
  * counterfactual, after which the achieved admission fraction matches
  * the batch operator on the current window.
  */
class IncrementalLmFilterSpec extends SparkSpec {

  /** Even ids are fluent seed documents (a strongly patterned cycle over
    * `<vocab>0..3`); odd ids are junk crawl documents with per-document
    * vocabularies (every bigram context unseen by any LM).
    */
  private def corpus(lo: Long, hi: Long, vocab: String = "w"): DataFrame =
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "IF(doc_id % 2 = 0, 'src0', 'crawl') AS source",
      s"""IF(doc_id % 2 = 0,
         |  array_join(transform(sequence(0, 39), i -> concat('$vocab', i % 4)), ' '),
         |  array_join(transform(sequence(0, 7), i -> concat('j', doc_id, 'x', i)), ' '))
         |  AS text""".stripMargin.replaceAll("\n", " "))

  private def schema = corpus(0L, 1L).schema

  private def ledgerSet(df: DataFrame) = df
    .select("doc_id", "n_bigrams", "logprob_micro", "selected")
    .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
      r.getBoolean(3))).toSet

  test("a single drain reproduces the batch operator exactly") {
    val landing = Files.createTempDirectory("lmf1-landing")
    val ckpt = Files.createTempDirectory("lmf1-ckpt").toString + "/c"
    val root = Files.createTempDirectory("lmf1-root").toString + "/lm"
    val docs = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalLmFilter.run(
      spark, landing.toString, ckpt, root, schema)
    assert(ledger.count() == 300L)
    // the bootstrap batch IS the corpus, so the frozen tables equal the
    // batch operator's and the drained admission matches LmPerplexity
    // .select row-for-row, scores included
    val streamSel = ledger.filter(col("selected"))
      .select("doc_id", "n_bigrams", "logprob_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val batchSel = LmPerplexity.select(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(batchSel.nonEmpty && streamSel == batchSel)
    assert(streamSel.size < 300, "the filter must be a real cut")
    // the admitted stream preserves the input schema
    val adm = spark.read.parquet(IncrementalLmFilter.admittedPath(root))
    assert(adm.columns.toSet == Set("doc_id", "source", "text", "batch"))
    assert(adm.count() == batchSel.size.toLong)
  }

  test("later batches score under the FROZEN tables, label-free") {
    val landing = Files.createTempDirectory("lmf2-landing")
    val ckpt = Files.createTempDirectory("lmf2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("lmf2-root").toString + "/lm"
    landParquet(landing, "b1.parquet", corpus(0L, 200L, "w"))
    IncrementalLmFilter.run(spark, landing.toString, ckpt, root, schema)
    val (model, ctx) = IncrementalLmFilter.readModel(spark, root)
    // batch 2 flips the seed label onto junk and junk onto fluent text —
    // a per-batch re-train would invert the filter; the frozen tables
    // must score IDENTICALLY to a direct label-free scoreBatch
    val b2 = corpus(200L, 400L, "w")
      .withColumn("source", when(col("source") === "src0", "crawl")
        .otherwise("src0"))
    landParquet(landing, "b2.parquet", b2)
    val ledger = IncrementalLmFilter.run(
      spark, landing.toString, ckpt, root, schema)
    val got = ledgerSet(ledger.join(b2.select("doc_id"), Seq("doc_id")))
    val want = ledgerSet(IncrementalLmFilter.scoreBatch(
      b2.select("doc_id", "text"), model, ctx))
    assert(got == want,
      "batch 2 must score under the frozen tables, labels ignored")
    // and the fluent (even-id) docs are still the admitted ones — the
    // flipped labels changed nothing
    assert(got.filter(_._4).forall(_._1 % 2 == 0))
  }

  test("an at-least-once replay rewrites identical ledger rows") {
    val landing = Files.createTempDirectory("lmf3-landing")
    val ckpt = Files.createTempDirectory("lmf3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("lmf3-root").toString + "/lm"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = IncrementalLmFilter.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    // crash-replay: commit 0 (and its crc sibling) lost, checkpoint
    // kept — a fresh checkpoint is NOT a replay; the era guard refuses it
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalLmFilter.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("lmf3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalLmFilter.run(spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("a shifted target vocabulary trips the counterfactual; the fraction recovers") {
    val landing = Files.createTempDirectory("lmf4-landing")
    val ckpt = Files.createTempDirectory("lmf4-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("lmf4-root").toString + "/lm"
    val genRoot = Files.createTempDirectory("lmf4-gen").toString + "/g"
    val boot = corpus(0L, 300L, "w")
    landParquet(landing, "b1.parquet", boot)
    IncrementalLmFilter.run(spark, landing.toString, ckpt, flatRoot, schema)

    val gen0 = LmFilterMaintenance.adopt(spark, genRoot, flatRoot)
    assert(LmFilterMaintenance.currentRoot(spark, genRoot) == gen0)
    // below-threshold maintain is a pure read
    val noop = LmFilterMaintenance.maintain(
      spark, genRoot, boot, threshold = 1.0)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(LmFilterMaintenance.currentRoot(spark, genRoot) == gen0)

    // DRIFT: the curated target moves to a NEW vocabulary — under the
    // frozen w-LM every window document prices at the uniform OOV floor
    // and nothing is admitted; under the window's own LM the fluent half
    // clears τ. The window (not the all-time union) is the measurement
    // corpus — drift is a property of what is arriving NOW
    val drifted = corpus(300L, 700L, "v")
    val report = LmFilterMaintenance.maintain(spark, genRoot, drifted)
    assert(report.retrained,
      s"fraction drift ${report.frozenFraction} vs " +
        s"${report.candidateFraction} must trip the default threshold")
    assert(report.frozenFraction < report.candidateFraction)
    val gen1 = report.generation.get
    assert(LmFilterMaintenance.currentRoot(spark, genRoot) == gen1)
    // the carried history survives intact
    assert(
      spark.read.parquet(IncrementalLmFilter.ledgerPath(gen1)).count() ==
        spark.read.parquet(IncrementalLmFilter.ledgerPath(gen0)).count())

    // AFTER: the stream re-enters on the retrained generation under a
    // fresh checkpoint; the achieved fraction equals the batch operator's
    // on the current window — recalibration recovered the contract
    val landing2 = Files.createTempDirectory("lmf4-landing2")
    val ckpt2 = Files.createTempDirectory("lmf4-ckpt2").toString + "/c"
    landParquet(landing2, "b2.parquet", drifted)
    IncrementalLmFilter.run(spark, landing2.toString, ckpt2, gen1, schema)
    val era = spark.read.parquet(IncrementalLmFilter.ledgerPath(gen1))
      .filter(col("batch") >= 0)
    assert(era.count() == drifted.count())
    val achieved = era.filter(col("selected")).count().toDouble / era.count()
    val batchFraction = LmPerplexity.select(drifted).count().toDouble /
      drifted.count()
    assert(achieved == batchFraction,
      s"post-retrain fraction $achieved must equal the batch operator's " +
        s"$batchFraction")
  }
}
