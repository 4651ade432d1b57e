package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Dsir
import graft.streaming.DriftMaintenance.{Kind, Outcome, Store}

/** The recalibration loop for [[IncrementalDsir]]'s frozen ratio table —
  * the [[DriftMaintenance]] engine instantiated for importance weighting:
  * the table freezes the (target, raw) estimate at bootstrap, so a crawl
  * whose RAW distribution drifts is scored against statistics that no
  * longer describe it — the achieved selection fraction slides away from
  * what the same τ selects under current statistics, and nothing fails
  * loudly.
  *
  * The counterfactual is DIRECT, no proxy metric: score the current raw
  * corpus (the source of record — the table cannot reconstruct documents)
  * under the LIVE frozen table and under a CANDIDATE table computed from
  * that same corpus, and compare the two achieved selection fractions.
  * Drift beyond `threshold` ships the measured candidate into the next
  * generation with the scoring ledger and selected stream carried
  * (decisions already made stay made — only FUTURE batches score under
  * the new table), verified, and published behind the atomic `_current`
  * pointer. The stream re-enters on the new generation under a fresh
  * checkpoint; [[IncrementalDsir.run]]'s bootstrap guard sees the ratio
  * store and adopts it.
  */
object DsirMaintenance {

  /** Retrain when the achieved selection fraction under the frozen table
    * differs from the candidate table's by more than this (absolute).
    */
  val DefaultFractionDriftThreshold = 0.10

  final case class Report(
      frozenFraction: Double,
      candidateFraction: Double,
      retrained: Boolean,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalDsir]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    DriftMaintenance.currentRoot(spark, genRoot)

  /** The engine description: the frozen table is the model, the ledger
    * and selected stream are history (pinned against the writer's
    * `storePaths`); the measurement rides along as the retained value.
    */
  private val base = DriftMaintenance.Family[(Double, Double, DataFrame)](
    what = "DsirMaintenance",
    stores = Seq(
      Store("ratio", IncrementalDsir.ratioPath _, Kind.Model),
      Store("ledger", IncrementalDsir.ledgerPath _, Kind.History()),
      Store("selected", IncrementalDsir.selectedPath _, Kind.History())),
    counterfactual = (_, _) => throw new IllegalStateException(
      "DsirMaintenance: direct retrain carries no counterfactual"),
    retrainInto = (_, m, _, dest, _) => {
      require(!m._3.isEmpty,
        "DsirMaintenance.retrain: the current corpus produced an empty " +
          "ratio table — nothing to recalibrate against")
      IncrementalDsir.writeRatioTable(m._3, IncrementalDsir.ratioPath(dest))
    },
    pinStorePaths = Some(IncrementalDsir.storePaths _))

  /** Adopt a flat [[IncrementalDsir]] root into the generation layout,
    * publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1): String =
    DriftMaintenance.adopt(spark, base, genRoot, flatRoot, numFiles)

  /** The achieved selection fraction of `docs` under an explicit ratio
    * table — one aggregate over the shared scoring path, no global rank.
    */
  def achievedFraction(docs: DataFrame, lrTable: DataFrame): Double = {
    val r = IncrementalDsir.scoreBatch(docs, lrTable)
      .agg(count(lit(1)).as("n"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("sel"))
      .collect().head
    if (r.getLong(0) == 0L) 0.0
    else r.getLong(1).toDouble / r.getLong(0)
  }

  /** Recalibrate: write the candidate table (computed from `docs`, the
    * current raw corpus) into the next generation, carry the ledger and
    * selected stream with row-count verification, publish atomically.
    * Returns the new generation's path.
    */
  def retrain(
      spark: SparkSession,
      genRoot: String,
      docs: DataFrame,
      numFiles: Int = 1): String =
    retrainWith(spark, genRoot,
      Dsir.ratioTable(Dsir.featureCounts(docs)), numFiles)

  /** [[retrain]] with an ALREADY-BUILT candidate table — [[maintain]]
    * passes the materialized table its counterfactual scored, so the
    * corpus is not re-tokenized a second time just to recompute the
    * identical ≤[[Dsir.Buckets]]-row relation.
    */
  def retrainWith(
      spark: SparkSession,
      genRoot: String,
      lr: DataFrame,
      numFiles: Int = 1): String =
    DriftMaintenance.retrainWith(spark, base, genRoot,
      (Double.NaN, Double.NaN, lr), numFiles)

  /** Measure-then-act: read the live generation's frozen table, score
    * `docs` under it and under the candidate, retrain iff the achieved
    * fractions drift apart by more than `threshold`. Below threshold the
    * cost is two broadcast-join scans and no writes.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      docs: DataFrame,
      threshold: Double = DefaultFractionDriftThreshold,
      numFiles: Int = 1): Report = {
    val fam = base.copy(counterfactual = (spark, cur) => {
      val frozen = IncrementalDsir.readRatioTable(
        spark, IncrementalDsir.ratioPath(cur))
      val fFrozen = achievedFraction(docs, frozen)
      // materialize the bounded candidate ONCE: the counterfactual scoring
      // and (on drift) the generation write both read it, and rebuilding
      // it would pay the corpus tokenize+aggregate a second time
      val cand = Dsir.ratioTable(Dsir.featureCounts(docs)).localCheckpoint()
      val fCand = achievedFraction(docs, cand)
      Outcome(math.abs(fFrozen - fCand) > threshold, (fFrozen, fCand, cand))
    })
    val (m, gen) = DriftMaintenance.maintain(spark, fam, genRoot, numFiles)
    Report(m._1, m._2, gen.isDefined, gen)
  }
}
