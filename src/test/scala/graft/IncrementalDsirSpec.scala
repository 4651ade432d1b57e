package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Dsir
import graft.streaming.{DsirMaintenance, IncrementalDsir}

/** Incremental DSIR: the ratio table freezes at bootstrap and every later
  * batch scores against it (frozen-reference, the IncrementalPqIndex
  * contract); a single drain reproduces the batch operator exactly;
  * replays are idempotent; and a drifted raw distribution trips
  * [[DsirMaintenance]]'s counterfactual, after which the achieved
  * selection fraction matches the batch operator on the current corpus.
  */
class IncrementalDsirSpec extends SparkSpec {

  private val EnVocab = Seq("the", "of", "and", "to", "in", "for", "on", "with")
  private val DeVocab = Seq("der", "die", "das", "und", "zu", "von", "mit", "auf")

  /** Deterministic corpus: even ids are `en` drawing 6 tokens from
    * `enWords`, odd ids are `de` drawing from `deWords`; token choice is
    * hash-driven per (doc_id, position).
    */
  private def corpus(lo: Long, hi: Long,
      enWords: Seq[String] = EnVocab,
      deWords: Seq[String] = DeVocab): DataFrame = {
    def arr(ws: Seq[String]) =
      ws.map(w => s"'$w'").mkString("array(", ", ", ")")
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "IF(doc_id % 2 = 0, 'en', 'de') AS lang",
      s"""array_join(transform(sequence(0, 5),
         |  i -> element_at(IF(doc_id % 2 = 0, ${arr(enWords)}, ${arr(deWords)}),
         |                  CAST(pmod(hash(doc_id, i), 8) AS INT) + 1)), ' ')
         |  AS text""".stripMargin.replaceAll("\n", " "))
  }

  private def schema = corpus(0L, 1L).schema

  test("a single drain reproduces the batch operator exactly") {
    val landing = Files.createTempDirectory("dsir-landing")
    val ckpt = Files.createTempDirectory("dsir-ckpt").toString + "/c"
    val root = Files.createTempDirectory("dsir-root").toString + "/d"
    val docs = corpus(0L, 400L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalDsir.run(
      spark, landing.toString, ckpt, root, schema)
    assert(ledger.count() == 400L)
    // the bootstrap batch IS the corpus, so the frozen table equals the
    // batch operator's and the drained selection matches Dsir.select
    // row-for-row, keys included
    val streamSel = ledger.filter(col("selected"))
      .select("doc_id", "logweight_micro", "gumbel_micro", "key_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    val batchSel = Dsir.select(docs)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet
    assert(batchSel.nonEmpty && streamSel == batchSel)
    // the selected stream preserves the input schema for the admitted ids
    val sel = spark.read.parquet(IncrementalDsir.selectedPath(root))
    assert(sel.columns.toSet == Set("doc_id", "lang", "text", "batch"))
    assert(sel.count() == batchSel.size.toLong)
  }

  test("later batches score under the FROZEN bootstrap table") {
    val landing = Files.createTempDirectory("dsir2-landing")
    val ckpt = Files.createTempDirectory("dsir2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("dsir2-root").toString + "/d"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalDsir.run(spark, landing.toString, ckpt, root, schema)
    val frozen = IncrementalDsir.readRatioTable(
      spark, IncrementalDsir.ratioPath(root))
    // batch 2 is a skewed slice (mostly de): a per-batch re-derivation
    // would shift every score; the frozen table must not move
    val b2 = corpus(300L, 500L).filter(col("doc_id") % 4 =!= 0)
    val landing2Name = "b2.parquet"
    landParquet(landing, landing2Name, b2)
    val ledger = IncrementalDsir.run(
      spark, landing.toString, ckpt, root, schema)
    val got = ledger.join(b2.select("doc_id"), Seq("doc_id"))
      .select("doc_id", "logweight_micro", "key_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val want = IncrementalDsir.scoreBatch(b2, frozen)
      .select("doc_id", "logweight_micro", "key_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, "batch 2 must score under the frozen table")
    // and the frozen table genuinely differs from batch 2's own statistics
    val rederived = Dsir.selectWith(b2,
      Dsir.ratioTable(Dsir.featureCounts(b2)))
      .select("doc_id", "logweight_micro")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val gotW = got.map(t => (t._1, t._2))
    assert(rederived != gotW,
      "fixture must make per-batch re-derivation visible")
  }

  test("an at-least-once replay rewrites identical ledger rows") {
    val landing = Files.createTempDirectory("dsir3-landing")
    val ckpt = Files.createTempDirectory("dsir3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("dsir3-root").toString + "/d"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = IncrementalDsir.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    // crash-replay: the checkpoint survives but batch 0's commit (and
    // its crc sibling) is lost, so the restarted drain re-executes it;
    // the frozen table already exists, scoring is deterministic, the
    // overwrite directories land byte-identical decisions. (A fresh
    // checkpoint is NOT a replay — the era guard refuses it.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalDsir.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("dsir3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalDsir.run(spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("raw-distribution drift trips the counterfactual; the fraction recovers") {
    val landing = Files.createTempDirectory("dsir4-landing")
    val ckpt = Files.createTempDirectory("dsir4-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("dsir4-root").toString + "/d"
    val genRoot = Files.createTempDirectory("dsir4-gen").toString + "/g"
    val boot = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalDsir.run(spark, landing.toString, ckpt, flatRoot, schema)

    val gen0 = DsirMaintenance.adopt(spark, genRoot, flatRoot)
    assert(DsirMaintenance.currentRoot(spark, genRoot) == gen0)
    // below-threshold maintain is a pure read
    val noop = DsirMaintenance.maintain(spark, genRoot, boot, threshold = 1.0)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(DsirMaintenance.currentRoot(spark, genRoot) == gen0)

    // DRIFT: the recent crawl window collapses onto the en vocabulary —
    // under the frozen table everything looks like the target and the
    // whole window is admitted, silently inflating the selected stream;
    // under current statistics the window is indistinguishable from its
    // own target slice and only the Gumbel tail clears τ. The window (not
    // the all-time union) is the measurement corpus — drift is a property
    // of what is arriving NOW
    val drifted = corpus(300L, 700L, enWords = EnVocab, deWords = EnVocab)
    val report = DsirMaintenance.maintain(spark, genRoot, drifted)
    assert(report.retrained,
      s"fraction drift ${report.frozenFraction} vs " +
        s"${report.candidateFraction} must trip the default threshold")
    val gen1 = report.generation.get
    assert(DsirMaintenance.currentRoot(spark, genRoot) == gen1)
    // the carried history survives intact
    assert(spark.read.parquet(IncrementalDsir.ledgerPath(gen1)).count() ==
      spark.read.parquet(IncrementalDsir.ledgerPath(gen0)).count())

    // AFTER: the stream re-enters on the retrained generation under a
    // fresh checkpoint; the achieved fraction equals the batch operator's
    // on the current corpus — recalibration recovered the contract
    val landing2 = Files.createTempDirectory("dsir4-landing2")
    val ckpt2 = Files.createTempDirectory("dsir4-ckpt2").toString + "/c"
    landParquet(landing2, "b2.parquet", drifted)
    IncrementalDsir.run(spark, landing2.toString, ckpt2, gen1, schema)
    // the new era's rows only: the carried history sits at batch=-1,
    // this drain wrote batch>=0
    val era = spark.read.parquet(IncrementalDsir.ledgerPath(gen1))
      .filter(col("batch") >= 0)
    assert(era.count() == drifted.count())
    val achieved = era.filter(col("selected")).count().toDouble /
      era.count()
    val sm = Dsir.summary(drifted).collect().head
    val batchFraction =
      sm.getAs[Long]("n_selected").toDouble / sm.getAs[Long]("n_docs")
    assert(achieved == batchFraction,
      s"post-retrain fraction $achieved must equal the batch operator's " +
        s"$batchFraction")
  }
}
