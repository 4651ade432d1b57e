package graft.streaming

import org.apache.spark.sql.SparkSession

/** The shared generation engine for MODEL-family maintenance — the one
  * spelling of the measure → counterfactual → retrain-into-next-generation
  * → carry-history → publish loop that all ten drift loops instantiate
  * ([[PqMaintenance]], [[IvfMaintenance]], [[IvfPqMaintenance]],
  * [[SemDedupMaintenance]], [[DsirMaintenance]],
  * [[QualityFilterMaintenance]], [[LmFilterMaintenance]],
  * [[TemperatureMaintenance]], [[LearnedEnsembleMaintenance]],
  * [[SubwordMaintenance]]) — the
  * model-side twin of [[FamilyMaintenance]] (the FACT-store engine),
  * built for the same reason the fact engine was: a review pass found
  * two bespoke fact loops had silently diverged, and the same fork risk
  * lived nine-wide on the model side.
  *
  * What the engine owns (the physical loop):
  *  - generation allocation, the carry of every store by KIND, and the
  *    atomic `_current` publish ([[StoreMaintenance.publishGeneration]])
  *    — a crash anywhere before the pointer write leaves readers on the
  *    old generation; the retry takes a fresh generation number;
  *  - the measure-then-act skeleton: below threshold the cost is the
  *    family's counterfactual reads and no writes; on drift, the
  *    RETAINED candidate the counterfactual measured is the one shipped,
  *    so measured and published models cannot diverge;
  *  - the history-store pin: a family whose [[Kind.History]] carry list
  *    diverges from its writer's `storePaths` fails loudly before any
  *    write — a store added to the writer cannot silently miss the carry.
  *
  * What stays per-family (the semantics): the counterfactual itself
  * (quantization-error ratio, list-imbalance factor, achieved-fraction
  * drift), candidate training, and the model/rebuilt-store writes —
  * supplied as two functions per family.
  *
  * Store kinds:
  *  - [[Kind.Model]]: a bounded frozen table (codebook, leaders, ratio /
  *    NB / LM / threshold tables). Carried VERBATIM (count-verified
  *    1-file rewrite) by [[adopt]]; on retrain, `retrainInto` either
  *    replaces it with the candidate or carries it via [[carryTable]]
  *    (the ensemble's stable families).
  *  - [[Kind.Rebuilt]]: a derived store a retrain RE-DERIVES from the
  *    source of record (re-encoded codes, reassigned lists) — codes from
  *    different codebooks are not comparable, so it can never be carried
  *    across a retrain; `retrainInto` owns it and must verify its own
  *    invariant. [[adopt]] carries it count-verified in its bucket
  *    layout.
  *  - [[Kind.History]]: exact decision history (ledgers, admitted / kept
  *    / selected streams, decided ids) — compactVerified across EVERY
  *    generation boundary: decisions already made stay made; only future
  *    batches score under the new model.
  *  - [[Kind.Custom]]: a store whose ADOPT carry is bespoke (the semdedup
  *    SUPERSEDING head store) — the fn lands it at `batch=-1` and
  *    verifies; on retrain, `retrainInto` re-derives it like a Rebuilt.
  */
object DriftMaintenance {

  sealed trait Kind
  object Kind {
    case object Model extends Kind
    final case class Rebuilt(bucketCol: String) extends Kind
    final case class History(bucketCol: Option[String] = None) extends Kind
    final case class Custom(
        adoptFn: (SparkSession, String, String, Int) => Unit) extends Kind
  }

  final case class Store(name: String, path: String => String, kind: Kind)

  /** One counterfactual's verdict: whether to retrain, plus whatever the
    * family measured and trained (the metrics its Report carries, the
    * candidate tables a retrain ships) — opaque to the engine.
    */
  final case class Outcome[M](drifted: Boolean, retained: M)

  /** A family's drift-maintenance description: the store list, the
    * counterfactual over the live generation root, and the retrain step
    * `(spark, retained, cur, dest, numFiles)` that writes the candidate
    * model and re-derives every Rebuilt/Custom store into `dest`.
    */
  final case class Family[M](
      what: String,
      stores: Seq[Store],
      counterfactual: (SparkSession, String) => Outcome[M],
      retrainInto: (SparkSession, M, String, String, Int) => Unit,
      pinStorePaths: Option[String => Seq[String]] = None)

  /** The live generation's path — a complete streaming root for the
    * family's incremental writer, which re-enters it under a fresh
    * checkpoint (history landed at `batch=-1`, below every epoch).
    */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Verified verbatim carry of one bounded frozen table. Raw
    * read+rewrite (the family writers' write ORDER only matters on a live
    * flat root — an unpublished generation becomes visible atomically or
    * not at all), gated like [[StoreMaintenance.compactVerified]]: a
    * lossy carry does not publish.
    */
  def carryTable(spark: SparkSession, src: String, dst: String,
      what: String): Unit = {
    val rows = spark.read.parquet(src)
    val n = rows.count()
    rows.coalesce(1).write.mode("errorifexists").parquet(dst)
    require(spark.read.parquet(dst).count() == n,
      s"$what: carried $src lost rows — not publishing the generation")
  }

  private def buckets(spark: SparkSession, path: String): Int =
    IncrementalAnnIndex.bucketCount(spark, path)
      .getOrElse(IncrementalAnnIndex.NumIdBuckets)

  private def pin[M](fam: Family[M], root: String): Unit =
    fam.pinStorePaths.foreach { p =>
      val hist = fam.stores.collect {
        case Store(_, path, Kind.History(_)) => path(root) }
      require(hist == p(root),
        s"${fam.what}: maintenance history-store list diverged from the " +
          "writer's storePaths — add the new store to the family's carry")
    }

  /** Adopt a FLAT writer root into the generation layout, publishing the
    * first generation atomically: model tables verbatim-verified, rebuilt
    * stores count-verified in their bucket layout, history
    * compactVerified, custom stores through their own fn. One-time
    * migration; thereafter the stream drains into the live generation's
    * paths and [[maintain]] owns the swaps. `srcOf` overrides per-store
    * source paths for writers whose flat stores live at independent paths
    * ([[IvfMaintenance.adopt]]); `bucketsOverride` pins a store's bucket
    * count instead of carrying the source marker.
    */
  def adopt[M](spark: SparkSession, fam: Family[M], genRoot: String,
      flatRoot: String, numFiles: Int = 1,
      srcOf: Map[String, String] = Map.empty,
      bucketsOverride: Map[String, Int] = Map.empty): String = {
    pin(fam, flatRoot)
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    fam.stores.foreach { s =>
      val src = srcOf.getOrElse(s.name, s.path(flatRoot))
      s.kind match {
        case Kind.Model =>
          carryTable(spark, src, s.path(dest),
            s"${fam.what}.adopt ${s.name}")
        case Kind.Rebuilt(bc) =>
          StoreMaintenance.compactVerified(spark, src, s.path(dest),
            s"${fam.what}.adopt ${s.name}", numFiles,
            bucketBy = Some((bc,
              bucketsOverride.getOrElse(s.name, buckets(spark, src)))))
        case Kind.History(bc) =>
          StoreMaintenance.compactVerified(spark, src, s.path(dest),
            s"${fam.what}.adopt ${s.name}", numFiles,
            bucketBy = bc.map(c => (c, buckets(spark, src))))
        case Kind.Custom(fn) =>
          fn(spark, src, s.path(dest), numFiles)
      }
    }
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** Build the next generation from a retained candidate: the family's
    * `retrainInto` writes the candidate model and re-derives every
    * Rebuilt/Custom store (self-verifying — a lossy re-encode must throw
    * before this returns), then the engine carries every HISTORY store
    * compactVerified and moves the pointer LAST. Returns the new
    * generation's path.
    */
  def retrainWith[M](spark: SparkSession, fam: Family[M], genRoot: String,
      retained: M, numFiles: Int = 1): String = {
    val cur = currentRoot(spark, genRoot)
    pin(fam, cur)
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    fam.retrainInto(spark, retained, cur, dest, numFiles)
    fam.stores.foreach {
      case Store(n, p, Kind.History(bc)) =>
        StoreMaintenance.compactVerified(spark, p(cur), p(dest),
          s"${fam.what}.retrain $n", numFiles,
          bucketBy = bc.map(c => (c, buckets(spark, p(cur)))))
      case _ => ()
    }
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** Measure-then-act: run the family's counterfactual against the live
    * generation; below its threshold, pure reads and no writes; on
    * drift, the RETAINED candidate publishes through [[retrainWith]].
    * Returns the measurement and the new generation's path when it
    * retrained.
    */
  def maintain[M](spark: SparkSession, fam: Family[M], genRoot: String,
      numFiles: Int = 1): (M, Option[String]) = {
    val cur = currentRoot(spark, genRoot)
    val o = fam.counterfactual(spark, cur)
    if (!o.drifted) (o.retained, None)
    else (o.retained,
      Some(retrainWith(spark, fam, genRoot, o.retained, numFiles)))
  }
}
