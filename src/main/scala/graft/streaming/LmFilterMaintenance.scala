package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.LmPerplexity

/** The recalibration loop for [[IncrementalLmFilter]]'s frozen bigram LM
  * — [[PqMaintenance]]'s measure-then-act policy applied to perplexity
  * filtering: the tables freeze the target's sequence statistics at
  * bootstrap, so when the curated target itself evolves (new seed
  * snapshots, topic drift) arriving text is priced against a stale LM —
  * the achieved admission fraction slides away from what the same τ
  * admits under current statistics, and nothing fails loudly (new
  * vocabulary quietly rides the OOV ladder at the uniform floor).
  *
  * The policy is a DIRECT counterfactual, no proxy metric: score the
  * current labeled corpus window (the source of record) under the LIVE
  * frozen tables and under CANDIDATE tables trained on that same
  * window's seed slice, and compare the two achieved admission
  * fractions. Drift beyond `threshold` trips [[retrainWith]]: the
  * candidate tables are written into the next generation with the
  * scoring ledger and admitted stream carried (decisions already made
  * stay made — only FUTURE batches score under the new LM), row-count
  * verified, and published behind the atomic `_current` pointer. The
  * stream re-enters on the new generation under a fresh checkpoint;
  * [[IncrementalLmFilter.run]]'s bootstrap guard sees the model store
  * and adopts it.
  */
object LmFilterMaintenance {

  /** Retrain when the achieved admission fraction under the frozen LM
    * differs from the candidate's by more than this (absolute).
    */
  val DefaultFractionDriftThreshold = 0.10

  final case class Report(
      frozenFraction: Double,
      candidateFraction: Double,
      retrained: Boolean,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalLmFilter]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Adopt a flat [[IncrementalLmFilter]] root into the generation
    * layout, publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1): String = {
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    spark.read.parquet(IncrementalLmFilter.modelPath(flatRoot))
      .coalesce(1).write.mode("errorifexists")
      .parquet(IncrementalLmFilter.modelPath(dest))
    spark.read.parquet(IncrementalLmFilter.contextsPath(flatRoot))
      .coalesce(1).write.mode("errorifexists")
      .parquet(IncrementalLmFilter.contextsPath(dest))
    StoreMaintenance.compactVerified(spark,
      IncrementalLmFilter.ledgerPath(flatRoot),
      IncrementalLmFilter.ledgerPath(dest),
      "LmFilterMaintenance.adopt ledger", numFiles)
    StoreMaintenance.compactVerified(spark,
      IncrementalLmFilter.admittedPath(flatRoot),
      IncrementalLmFilter.admittedPath(dest),
      "LmFilterMaintenance.adopt admitted", numFiles)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** The achieved admission fraction of `docs` under explicit tables —
    * one aggregate over the shared scoring path, no global rank.
    */
  def achievedFraction(docs: DataFrame, model: DataFrame,
      contexts: DataFrame): Double = {
    val r = IncrementalLmFilter.scoreBatch(docs, model, contexts)
      .agg(count(lit(1)).as("n"),
        sum(when(col("selected"), 1L).otherwise(0L)).as("sel"))
      .collect().head
    if (r.getLong(0) == 0L) 0.0
    else r.getLong(1).toDouble / r.getLong(0)
  }

  /** Recalibrate with ALREADY-BUILT candidate tables — [[maintain]]
    * passes the materialized counts its counterfactual scored, so the
    * window's seed slice is not re-tokenized a second time.
    */
  def retrainWith(
      spark: SparkSession,
      genRoot: String,
      model: DataFrame,
      contexts: DataFrame,
      numFiles: Int = 1): String = {
    val cur = currentRoot(spark, genRoot)
    require(!model.isEmpty,
      "LmFilterMaintenance.retrain: the current window produced an empty " +
        "LM — nothing to recalibrate against")
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    IncrementalLmFilter.writeModel(model, contexts, dest)
    // verify every carried store before the pointer moves (the shared
    // compactVerified gate): a lossy ledger carry silently truncates the
    // audit history; a lossy admitted carry drops admitted documents
    StoreMaintenance.compactVerified(spark,
      IncrementalLmFilter.ledgerPath(cur),
      IncrementalLmFilter.ledgerPath(dest),
      "LmFilterMaintenance.retrain ledger", numFiles)
    StoreMaintenance.compactVerified(spark,
      IncrementalLmFilter.admittedPath(cur),
      IncrementalLmFilter.admittedPath(dest),
      "LmFilterMaintenance.retrain admitted", numFiles)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** Measure-then-act: read the live generation's frozen tables, score
    * `docs` under them and under the candidate trained on `docs`' own
    * seed slice, retrain iff the achieved admission fractions drift apart
    * by more than `threshold`. Below threshold the cost is two
    * broadcast-join scans and no writes.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      docs: DataFrame,
      threshold: Double = DefaultFractionDriftThreshold,
      numFiles: Int = 1): Report = {
    val cur = currentRoot(spark, genRoot)
    val (frozenModel, frozenCtx) = IncrementalLmFilter.readModel(spark, cur)
    val fFrozen = achievedFraction(docs, frozenModel, frozenCtx)
    // materialize the bounded candidate counts ONCE: both derived tables,
    // the counterfactual scoring, and (on drift) the generation write
    // read them, and rebuilding would re-tokenize the window's seed slice
    val counts = LmPerplexity.seedBigramCounts(docs).localCheckpoint()
    val candModel = LmPerplexity.modelOf(counts)
    val candCtx = LmPerplexity.contextsOf(counts)
    val fCand = achievedFraction(docs, candModel, candCtx)
    if (math.abs(fFrozen - fCand) <= threshold)
      Report(fFrozen, fCand, retrained = false, None)
    else Report(fFrozen, fCand, retrained = true,
      Some(retrainWith(spark, genRoot, candModel, candCtx, numFiles)))
  }
}
