package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.ops.{Dsir, LmPerplexity, QualityClassifier}
import graft.streaming.DriftMaintenance.{Kind, Outcome, Store}

/** Drift maintenance for [[IncrementalLearnedEnsemble]]'s frozen table
  * set — the [[DriftMaintenance]] engine composing the three families'
  * counterfactuals ([[QualityFilterMaintenance]] /
  * [[LmFilterMaintenance]] / [[DsirMaintenance]]) over ONE generation
  * swap, because the ensemble root is ONE artifact: its ledger records
  * the AND of three verdicts, so recalibrating a family by hand-editing a
  * subroot in place would change future verdicts with no audit trail and
  * no atomic cut — and the per-family maintenance loops cannot be pointed
  * at the ensemble root directly (they carry THEIR family's standalone
  * ledger/admitted layout, which the ensemble does not have).
  *
  * Policy per family, unchanged from the singles: score the current
  * labeled corpus window under the LIVE frozen tables and under CANDIDATE
  * tables trained on that same window; a family whose achieved admission
  * fraction drifts beyond `threshold` is retrained. If ANY family drifts,
  * the next generation is built with the drifted families' candidate
  * tables and the stable families' tables CARRIED verbatim (their
  * estimates still describe the crawl — retraining them too would move
  * verdicts for no reason), the ensemble ledger and admitted stream are
  * carried count-verified (decisions already made stay made), and the
  * generation publishes behind the atomic `_current` pointer. The drain
  * re-enters on [[currentRoot]] under a fresh checkpoint; the bootstrap
  * guard sees the NB model present and adopts the whole table set.
  */
object LearnedEnsembleMaintenance {

  /** Retrain a family when its achieved admission fraction under the
    * frozen tables differs from the candidate's by more than this
    * (absolute) — the same bar as the standalone family loops.
    */
  val DefaultFractionDriftThreshold = 0.10

  final case class FamilyReport(
      frozenFraction: Double,
      candidateFraction: Double,
      retrained: Boolean)

  final case class Report(
      nb: FamilyReport,
      lm: FamilyReport,
      dsir: FamilyReport,
      generation: Option[String])

  /** The measured verdicts plus the window-trained candidates a retrain
    * ships for the drifted families.
    */
  private final case class Retained(
      nb: FamilyReport, lm: FamilyReport, dsir: FamilyReport,
      candNbModel: DataFrame, candNbPrior: DataFrame,
      candLmModel: DataFrame, candLmCtx: DataFrame, candLr: DataFrame)

  /** The live generation's path — a full [[IncrementalLearnedEnsemble]]
    * root.
    */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    DriftMaintenance.currentRoot(spark, genRoot)

  private def nbModelPath(root: String) =
    IncrementalQualityFilter.modelPath(IncrementalLearnedEnsemble.nbRoot(root))
  private def nbPriorPath(root: String) =
    IncrementalQualityFilter.priorPath(IncrementalLearnedEnsemble.nbRoot(root))
  private def lmModelPath(root: String) =
    IncrementalLmFilter.modelPath(IncrementalLearnedEnsemble.lmRoot(root))
  private def lmCtxPath(root: String) =
    IncrementalLmFilter.contextsPath(IncrementalLearnedEnsemble.lmRoot(root))
  private def dsirRatioPath(root: String) =
    IncrementalDsir.ratioPath(IncrementalLearnedEnsemble.dsirRoot(root))

  private val base = DriftMaintenance.Family[Retained](
    what = "LearnedEnsembleMaintenance",
    stores = Seq(
      Store("nb model", nbModelPath _, Kind.Model),
      Store("nb prior", nbPriorPath _, Kind.Model),
      Store("lm model", lmModelPath _, Kind.Model),
      Store("lm contexts", lmCtxPath _, Kind.Model),
      Store("dsir ratio", dsirRatioPath _, Kind.Model),
      Store("ledger", IncrementalLearnedEnsemble.ledgerPath _,
        Kind.History()),
      Store("admitted", IncrementalLearnedEnsemble.admittedPath _,
        Kind.History())),
    counterfactual = (_, _) => throw new IllegalStateException(
      "LearnedEnsembleMaintenance: maintain is the only entry point"),
    retrainInto = (spark, m, cur, dest, _) => {
      // drifted families ship their measured candidates; stable families'
      // tables carry VERBATIM (count-verified) — their estimates still
      // describe the crawl, and retraining them would move verdicts for
      // no reason
      def carry(path: String => String, what: String): Unit =
        DriftMaintenance.carryTable(spark, path(cur), path(dest), what)
      if (m.nb.retrained)
        IncrementalQualityFilter.writeModel(m.candNbModel, m.candNbPrior,
          IncrementalLearnedEnsemble.nbRoot(dest))
      else {
        carry(nbModelPath, "ensemble nb model")
        carry(nbPriorPath, "ensemble nb prior")
      }
      if (m.lm.retrained)
        IncrementalLmFilter.writeModel(m.candLmModel, m.candLmCtx,
          IncrementalLearnedEnsemble.lmRoot(dest))
      else {
        carry(lmModelPath, "ensemble lm model")
        carry(lmCtxPath, "ensemble lm contexts")
      }
      if (m.dsir.retrained)
        IncrementalDsir.writeRatioTable(m.candLr, dsirRatioPath(dest))
      else carry(dsirRatioPath, "ensemble dsir ratio")
    },
    pinStorePaths = Some(IncrementalLearnedEnsemble.storePaths _))

  /** Adopt a flat [[IncrementalLearnedEnsemble]] root into the generation
    * layout, publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1): String =
    DriftMaintenance.adopt(spark, base, genRoot, flatRoot, numFiles)

  /** Measure-then-act over all three families: read the live generation's
    * tables (each validated by its own family module), train candidates
    * on `docs` — the current LABELED corpus window, which must carry
    * `source` (NB + LM) and `lang` (DSIR) — compare achieved fractions,
    * and swap one generation if anything drifted. Below threshold
    * everywhere, the cost is six scoring scans and no writes.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      docs: DataFrame,
      threshold: Double = DefaultFractionDriftThreshold,
      numFiles: Int = 1): Report = {
    require(docs.columns.contains("source") && docs.columns.contains("lang"),
      "LearnedEnsembleMaintenance.maintain: the measurement window must " +
        "carry the `source` and `lang` label columns (candidate training)")
    val f = base.copy(counterfactual = (spark, cur) => {
      val (nbModel, nbPrior) = IncrementalQualityFilter.readModel(
        spark, IncrementalLearnedEnsemble.nbRoot(cur))
      val (lmModel, lmContexts) = IncrementalLmFilter.readModel(
        spark, IncrementalLearnedEnsemble.lmRoot(cur))
      val lr = IncrementalDsir.readRatioTable(spark, dsirRatioPath(cur))

      // candidates, trained once on the window and materialized (bounded
      // relations): the counterfactual scoring and — on drift — the
      // generation write both read them
      val candNbModel = QualityClassifier.modelTable(docs).localCheckpoint()
      val candNbPrior = QualityClassifier.priorRow(docs).localCheckpoint()
      val lmCounts = LmPerplexity.seedBigramCounts(docs).localCheckpoint()
      val candLmModel = LmPerplexity.modelOf(lmCounts).localCheckpoint()
      val candLmCtx = LmPerplexity.contextsOf(lmCounts).localCheckpoint()
      val candLr = Dsir.ratioTable(Dsir.featureCounts(docs)).localCheckpoint()
      require(!candNbModel.isEmpty && !candLmModel.isEmpty && !candLr.isEmpty,
        "LearnedEnsembleMaintenance.maintain: the window produced an " +
          "empty candidate table — nothing to recalibrate against")

      def fam(frozen: Double, cand: Double): FamilyReport =
        FamilyReport(frozen, cand, math.abs(frozen - cand) > threshold)
      val nb = fam(
        QualityFilterMaintenance.achievedFraction(docs, nbModel, nbPrior),
        QualityFilterMaintenance.achievedFraction(docs, candNbModel,
          candNbPrior))
      val lm = fam(
        LmFilterMaintenance.achievedFraction(docs, lmModel, lmContexts),
        LmFilterMaintenance.achievedFraction(docs, candLmModel, candLmCtx))
      val dsir = fam(
        DsirMaintenance.achievedFraction(docs, lr),
        DsirMaintenance.achievedFraction(docs, candLr))
      Outcome(nb.retrained || lm.retrained || dsir.retrained,
        Retained(nb, lm, dsir, candNbModel, candNbPrior,
          candLmModel, candLmCtx, candLr))
    })
    val (m, gen) = DriftMaintenance.maintain(spark, f, genRoot, numFiles)
    Report(m.nb, m.lm, m.dsir, gen)
  }
}
