package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Portable, Sampling}
import graft.streaming.{IncrementalTemperature, TemperatureMaintenance}

/** Incremental temperature sampling: the per-stratum threshold table
  * freezes at bootstrap and every later batch assigns against it
  * (frozen-reference, the IncrementalPqIndex contract); a single drain
  * reproduces the batch operator exactly; strata unseen at bootstrap keep
  * everything; replays are idempotent; and a drifted stratum mix trips
  * [[TemperatureMaintenance]]'s counterfactual, after which the achieved
  * keep fraction matches the batch operator on the current window.
  */
class IncrementalTemperatureSpec extends SparkSpec {

  /** Deterministic skewed-mix corpus: 60% en / 30% de / 10% zh by id. */
  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "CASE WHEN doc_id % 10 < 6 THEN 'en' " +
        "WHEN doc_id % 10 < 9 THEN 'de' ELSE 'zh' END AS lang",
      "'w w w' AS text")

  /** The same ids with the mix inverted: 10% en / 30% de / 60% zh. */
  private def inverted(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      "CASE WHEN doc_id % 10 < 6 THEN 'zh' " +
        "WHEN doc_id % 10 < 9 THEN 'de' ELSE 'en' END AS lang",
      "'w w w' AS text")

  private def schema = corpus(0L, 1L).schema

  private def assignSet(df: DataFrame) = df
    .select("doc_id", "stratum", "bucket", "threshold", "kept")
    .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
      r.getLong(3), r.getBoolean(4))).toSet

  test("a single drain reproduces the batch operator exactly") {
    val landing = Files.createTempDirectory("temp1-landing")
    val ckpt = Files.createTempDirectory("temp1-ckpt").toString + "/c"
    val root = Files.createTempDirectory("temp1-root").toString + "/t"
    val docs = corpus(0L, 500L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalTemperature.run(
      spark, landing.toString, ckpt, root, schema)
    assert(ledger.count() == 500L)
    // the bootstrap batch IS the corpus, so the frozen table equals the
    // batch operator's and the drained assignment matches row-for-row
    assert(assignSet(ledger) == assignSet(Sampling.temperatureAssign(docs)))
    // the summary tail over the ledger equals the batch summary
    val streamSum = IncrementalTemperature.storeSummary(ledger)
      .collect().map(_.toString).sorted
    val batchSum = Sampling.temperatureSummary(docs)
      .collect().map(_.toString).sorted
    assert(streamSum.sameElements(batchSum))
    // the kept stream preserves the input schema for the kept ids
    val kept = spark.read.parquet(IncrementalTemperature.keptPath(root))
    assert(kept.columns.toSet == Set("doc_id", "lang", "text", "batch"))
    assert(kept.count() == ledger.filter(col("kept")).count())
  }

  test("later batches assign under the FROZEN table; unseen strata keep all") {
    val landing = Files.createTempDirectory("temp2-landing")
    val ckpt = Files.createTempDirectory("temp2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("temp2-root").toString + "/t"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalTemperature.run(spark, landing.toString, ckpt, root, schema)
    val frozen = IncrementalTemperature.readThresholds(
      spark, IncrementalTemperature.thresholdsPath(root))
    val frozenMap = frozen.collect()
      .map(r => r.getAs[String]("stratum") -> r.getAs[Long]("threshold")).toMap
    // batch 2 skews the mix (all zh+fr): a per-batch re-derivation would
    // move every threshold; the frozen table must not move — and the
    // never-seen 'fr' stratum keeps everything (rarer than anything the
    // bootstrap saw)
    val b2 = spark.range(300L, 500L).toDF("doc_id").selectExpr(
      "doc_id", "IF(doc_id % 2 = 0, 'zh', 'fr') AS lang", "'w w w' AS text")
    landParquet(landing, "b2.parquet", b2)
    val ledger = IncrementalTemperature.run(
      spark, landing.toString, ckpt, root, schema)
    val got = ledger.join(b2.select("doc_id"), Seq("doc_id"))
    // zh rows carry the BOOTSTRAP threshold, not batch 2's own statistics
    val zhTh = got.filter(col("stratum") === "zh")
      .select("threshold").distinct().collect().map(_.getLong(0)).toSeq
    assert(zhTh == Seq(frozenMap("zh")))
    // fr rows coalesce to keep-everything and are all kept
    val fr = got.filter(col("stratum") === "fr")
    assert(fr.count() == 100L)
    assert(fr.filter(col("threshold") =!= Portable.SampleMod).count() == 0)
    assert(fr.filter(!col("kept")).count() == 0)
    // the table on disk is untouched by the second drain
    val after = IncrementalTemperature.readThresholds(
      spark, IncrementalTemperature.thresholdsPath(root))
      .collect().map(r => r.getAs[String]("stratum") ->
        r.getAs[Long]("threshold")).toMap
    assert(after == frozenMap)
  }

  test("an at-least-once replay rewrites identical ledger rows") {
    val landing = Files.createTempDirectory("temp3-landing")
    val ckpt = Files.createTempDirectory("temp3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("temp3-root").toString + "/t"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = IncrementalTemperature.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    // crash-replay: the checkpoint survives but batch 0's commit (and
    // its crc sibling) is lost, so the restarted drain re-executes it;
    // the frozen table already exists, assignment is deterministic, the
    // overwrite directories land byte-identical decisions. (A fresh
    // checkpoint is NOT a replay — the era guard refuses it.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = IncrementalTemperature.run(
      spark, landing.toString, ckpt, root, schema)
      .collect().map(_.toString).sorted
    assert(second.sameElements(first))
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("temp3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalTemperature.run(
        spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("mix drift trips the counterfactual; the fraction recovers") {
    val landing = Files.createTempDirectory("temp4-landing")
    val ckpt = Files.createTempDirectory("temp4-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("temp4-root").toString + "/t"
    val genRoot = Files.createTempDirectory("temp4-gen").toString + "/g"
    val boot = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalTemperature.run(spark, landing.toString, ckpt, flatRoot, schema)

    val gen0 = TemperatureMaintenance.adopt(spark, genRoot, flatRoot)
    assert(TemperatureMaintenance.currentRoot(spark, genRoot) == gen0)
    // below-threshold maintain is a pure read
    val noop = TemperatureMaintenance.maintain(
      spark, genRoot, boot, threshold = 1.0)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(TemperatureMaintenance.currentRoot(spark, genRoot) == gen0)

    // DRIFT: the crawl window inverts the mix (en collapses to the rare
    // stratum, zh floods) — under the frozen table the flooding stratum
    // rides its keep-everything threshold and the window is barely
    // thinned; under current statistics zh is the over-represented one.
    // The window (not the all-time union) is the measurement corpus —
    // drift is a property of what is arriving NOW
    val drifted = inverted(300L, 700L)
    val report = TemperatureMaintenance.maintain(spark, genRoot, drifted)
    assert(report.retrained,
      s"fraction drift ${report.frozenFraction} vs " +
        s"${report.candidateFraction} must trip the default threshold")
    val gen1 = report.generation.get
    assert(TemperatureMaintenance.currentRoot(spark, genRoot) == gen1)
    // the carried history survives intact
    assert(
      spark.read.parquet(IncrementalTemperature.ledgerPath(gen1)).count() ==
        spark.read.parquet(IncrementalTemperature.ledgerPath(gen0)).count())

    // AFTER: the stream re-enters on the retrained generation under a
    // fresh checkpoint; the achieved fraction equals the batch operator's
    // on the current window — recalibration recovered the contract
    val landing2 = Files.createTempDirectory("temp4-landing2")
    val ckpt2 = Files.createTempDirectory("temp4-ckpt2").toString + "/c"
    landParquet(landing2, "b2.parquet", drifted)
    IncrementalTemperature.run(spark, landing2.toString, ckpt2, gen1, schema)
    // the new era's rows only: the carried history sits at batch=-1,
    // this drain wrote batch>=0
    val era = spark.read.parquet(IncrementalTemperature.ledgerPath(gen1))
      .filter(col("batch") >= 0)
    assert(era.count() == drifted.count())
    val achieved = era.filter(col("kept")).count().toDouble / era.count()
    val batchKept = Sampling.temperatureAssign(drifted)
      .filter(col("kept")).count().toDouble
    val batchFraction = batchKept / drifted.count()
    assert(achieved == batchFraction,
      s"post-retrain fraction $achieved must equal the batch operator's " +
        s"$batchFraction")
  }
}
