package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Similarity
import graft.streaming.{IncrementalAnnIndex, IncrementalSemDedup,
  SemDedupMaintenance, StoreMaintenance}

/** The semdedup retrain loop: a drifted embedding stream crowds the
  * frozen-leader assignment into one hot list, the bounded head stops
  * covering the drifted region, and duplicate families planted there sail
  * through undetected. The imbalance signal trips [[SemDedupMaintenance]],
  * the quantizer retrains on the admitted corpus, the head re-elects under
  * the new assignment, and the catch rate recovers — mirroring
  * [[IvfMaintenanceSpec]]'s recall@10 structure.
  */
class SemDedupMaintenanceSpec extends SparkSpec {

  private val Cap = 30

  /** Deterministic drifted corpus (dim 32). Bootstrap rows (id < 50) sit
    * on axes 0..15, so the frozen seed leaders (vec_id < 16) tile them.
    * Early drift (50 ≤ id < 1000) lives in 7 clusters on axes 16..22; the
    * LATE family (id ≥ 1000) sits on axis 23 and appears only after the
    * head of the hot list is frozen at low ids. Every drifted row carries
    * a 0.25·e₀ pull that routes it to frozen leader 0 — one list takes
    * the whole stream. The pull's cosine against a pure axis-0 bootstrap
    * vector is 0.25/√1.0625 ≈ 0.24, safely under the 0.3 dup threshold,
    * so only SAME-cluster pairs (cos ≈ 1.0) are true duplicates.
    */
  private def drifted(ids: DataFrame): DataFrame =
    ids.select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 31), d -> CAST(
        |  (CASE WHEN id < 50 AND d = id % 16 THEN 1.0
        |        WHEN id >= 50 AND id < 1000 AND d = 16 + id % 7 THEN 1.0
        |        WHEN id >= 1000 AND d = 23 THEN 1.0
        |        ELSE 0.0 END)
        |  + (CASE WHEN id >= 50 AND d = 0 THEN 0.25 ELSE 0.0 END)
        |  + ((pmod(hash(id, d), 201) - 100) * 0.0001) AS FLOAT))"""
        .stripMargin.replaceAll("\n", " ")).as("embedding"))

  private def rangeVecs(lo: Long, hi: Long): DataFrame =
    drifted(spark.range(lo, hi).toDF("id"))

  /** Probe batch: fresh ids whose vectors live in the late axis-23 family
    * — every one is a true duplicate of ~1050 stored members.
    */
  private def probes: DataFrame =
    drifted(spark.range(5000L, 5020L).toDF("id"))

  private def catchRate(ledger: DataFrame): Double = {
    val p = ledger.filter(col("vec_id") >= 5000L && col("vec_id") < 5020L)
    p.filter(!col("kept")).count().toDouble / p.count()
  }

  test("drift defeats the frozen head; retrain restores the catch rate") {
    val landing = Files.createTempDirectory("sdm-landing")
    val ckpt = Files.createTempDirectory("sdm-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("sdm-flat").toString + "/sd"
    val genRoot = Files.createTempDirectory("sdm-gen").toString + "/gens"
    val schema = rangeVecs(0L, 1L).schema

    landParquet(landing, "b1.parquet", rangeVecs(0L, 50L))
    IncrementalSemDedup.run(spark, landing.toString, ckpt, flatRoot, schema,
      maxListOccupancy = Cap)
    landParquet(landing, "b2.parquet", rangeVecs(50L, 2050L))
    IncrementalSemDedup.run(spark, landing.toString, ckpt, flatRoot, schema,
      maxListOccupancy = Cap)

    // BEFORE: probe the frozen store with a pure (write-free) dedupBatch —
    // the hot list's head froze at low ids on axes the family never
    // touches, so the planted duplicates are NOT caught
    val cents = spark.read.parquet(
      IncrementalSemDedup.leaderPath(flatRoot))
    val before = IncrementalSemDedup.dedupBatch(
      Similarity.assignWithLeadersRetaining(probes, cents),
      IncrementalSemDedup.readHeads(spark, flatRoot, Long.MinValue),
      maxListOccupancy = Cap)
    val catchBefore = catchRate(before.ledger)
    assert(catchBefore < 0.2,
      s"fixture must defeat the frozen head, caught $catchBefore")

    // adopt into the generation layout; below-threshold maintain is a
    // pure read
    val gen0 = SemDedupMaintenance.adopt(spark, genRoot, flatRoot, 1)
    assert(SemDedupMaintenance.currentRoot(spark, genRoot) == gen0)
    val noop = SemDedupMaintenance.maintain(spark, genRoot, threshold = 1e9)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(SemDedupMaintenance.currentRoot(spark, genRoot) == gen0)

    // the drifted store trips the default threshold and retrains.
    // Storage-level inspection rides along: the retrain path STREAMS the
    // reassigned corpus into the new generation's list store and re-reads
    // it id-width — no stage it runs may carry a cached (persisted) RDD,
    // which is how a full-corpus vector-carrying persist would show up
    val cachedStages = new java.util.concurrent.ConcurrentLinkedQueue[String]
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onStageSubmitted(
          s: org.apache.spark.scheduler.SparkListenerStageSubmitted): Unit =
        s.stageInfo.rddInfos.filter(_.storageLevel.isValid)
          .foreach(r => cachedStages.add(r.name))
    }
    spark.sparkContext.addSparkListener(listener)
    val report =
      try SemDedupMaintenance.maintain(spark, genRoot, maxListOccupancy = Cap)
      finally {
        Thread.sleep(1000) // let the async listener bus drain
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(cachedStages.isEmpty,
      s"retrain must not persist any relation, saw cached RDDs: " +
        s"${cachedStages.toArray.mkString(",")}")
    assert(report.retrained,
      s"imbalance ${report.imbalanceFactor} must trip the default threshold")
    val gen1 = report.generation.get
    assert(SemDedupMaintenance.currentRoot(spark, genRoot) == gen1)

    // no admitted vector lost or duplicated; the superseded generation is
    // intact for readers still draining it; the hot list dissolved
    val before0 = spark.read
      .parquet(IncrementalSemDedup.listPath(gen0)).select("vec_id")
    val after1 = spark.read
      .parquet(IncrementalSemDedup.listPath(gen1)).select("vec_id")
    assert(before0.count() == after1.count())
    assert(after1.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
    val imbAfter = graft.streaming.IvfMaintenance.imbalanceFactor(
      spark.read.parquet(IncrementalSemDedup.listPath(gen1))
        .select("list_id"))
    assert(imbAfter < report.imbalanceFactor / 2,
      s"imbalance must drop: ${report.imbalanceFactor} -> $imbAfter")

    // AFTER: the stream re-enters service on the retrained generation
    // under a fresh checkpoint; the same planted family is now caught
    // against a head that covers its region, and dup_of points into the
    // stored family
    val landing2 = Files.createTempDirectory("sdm-landing2")
    val ckpt2 = Files.createTempDirectory("sdm-ckpt2").toString + "/c"
    landParquet(landing2, "b3.parquet",
      probes.unionByName(rangeVecs(60L, 61L))) // plus one re-crawled id
    val ledger = IncrementalSemDedup.run(
      spark, landing2.toString, ckpt2, gen1, schema,
      maxListOccupancy = Cap)
    val catchAfter = catchRate(ledger)
    assert(catchAfter >= 0.9,
      s"retrain must restore the catch rate: $catchBefore -> $catchAfter")
    val dupTargets = ledger
      .filter(col("vec_id") >= 5000L && !col("kept"))
      .select("dup_of").collect().map(_.getLong(0))
    assert(dupTargets.forall(_ >= 1000L),
      s"dup_of must point into the stored axis-23 family: " +
        s"${dupTargets.mkString(",")}")
    // the carried decided store still guards re-crawls: id 60 was decided
    // in the pre-retrain era and must not gain a second ledger row
    assert(ledger.filter(col("vec_id") === 60L).count() == 1,
      "a re-crawled pre-retrain id must not be re-decided")
  }
}
