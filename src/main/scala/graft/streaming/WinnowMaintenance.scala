package graft.streaming

import org.apache.spark.sql.SparkSession

/** The compaction loop for [[IncrementalWinnow]]'s accumulating stores —
  * [[StoreMaintenance]]'s generation contract applied to the containment
  * admission family. Like the inverted index ([[Bm25Maintenance]]) and
  * unlike the learned-filter families, winnow has no model to
  * recalibrate: fingerprints are exact facts of the admitted corpus, so
  * the maintenance hazard is purely physical. Every micro-batch adds a
  * `batch=N` directory to five stores (fingerprints, sizes, decided ids,
  * admitted corpus, decision ledger), and a crawl that has been draining
  * for a year answers each containment probe by listing thousands of
  * small files per touched bucket — growing per-batch PLANNING cost with
  * history even though the scanned bytes stay touched-bucket bounded.
  *
  * The policy is measure-then-act on the physical signal itself
  * ([[StoreMaintenance.fileStats]]): when the fingerprint store's file
  * count passes `maxFiles`, rewrite all five stores into the next
  * generation — fingerprints re-bucketed by `h`, sizes and decided ids by
  * `doc_id` (each row-count verified through
  * [[StoreMaintenance.compactVerified]]), corpus and ledger folded flat —
  * then atomically repoint readers via the `_current` manifest. Nothing
  * is summed or re-derived: every store carries facts, so the whole carry
  * is lossless by row-count identity alone (no fold-verification leg like
  * [[Bm25Maintenance]]'s additive stats store needs). Below threshold the
  * cost is one recursive listing and no writes.
  *
  * A compacted generation is a complete [[IncrementalWinnow]] root: the
  * carried rows land at `batch=-1` (below every streaming epoch), so a
  * stream re-entering under a FRESH checkpoint appends `batch=0` beside
  * the history, its containment probes still see every carried
  * fingerprint, and its re-crawl guard still sees every decided doc_id.
  * One fresh era per compaction: [[IncrementalWinnow.run]] REFUSES a
  * fresh checkpoint while `batch>=0` directories remain, because the new
  * era's ids restart at 0 and would overwrite them.
  *
  * The source root must have drained at least one non-empty batch: the
  * five stores are written together per admitted batch, and a carry of an
  * absent store has nothing to verify against.
  */
object WinnowMaintenance {

  /** Compact when the fingerprint store holds more files than this. At
    * ~one directory per drained batch × touched buckets, the default
    * trips after the store's listing cost — not its data — dominates a
    * containment probe.
    */
  val DefaultMaxFiles = 512L

  /** Target bytes per bucket after compaction — the unit a probe reads.
    * [[maintain]] grows a store's bucket count to hold this line, which
    * is what keeps per-probe fingerprint I/O bounded by the batch's
    * touched fingerprints instead of total corpus bulk: a frozen bucket
    * count over a 100× corpus means every probe reads 100× more
    * unrelated fingerprints, however healthy the file count looks.
    */
  val TargetBucketBytes: Long = 64L << 20

  final case class Report(
      fpFiles: Long,
      fpBytes: Long,
      compacted: Boolean,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalWinnow]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Adopt a flat [[IncrementalWinnow]] root into the generation layout,
    * publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1): String = {
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    carry(spark, flatRoot, dest, numFiles)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** Rewrite the LIVE generation into the next one and atomically repoint
    * readers. A crash anywhere before the final pointer write leaves
    * readers on the old generation; the retry takes a fresh generation
    * number ([[StoreMaintenance.nextGeneration]] never reuses a partial).
    * `fpBuckets` / `idBuckets` re-size the bucket counts on the way
    * through (the grown-store path: more buckets keeps bucket SIZE — the
    * unit a probe reads — bounded); None carries the source counts.
    */
  def compact(
      spark: SparkSession,
      genRoot: String,
      numFiles: Int = 1,
      fpBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): String = {
    val cur = currentRoot(spark, genRoot)
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    carry(spark, cur, dest, numFiles, fpBuckets, idBuckets)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** One verified carry of all five stores, shared by [[adopt]] and
    * [[compact]] so the store list cannot fork (and pinned against
    * [[IncrementalWinnow.storePaths]] so a store added to the writer
    * cannot silently miss the carry). Bucket counts carry from the source
    * markers (or the fresh-store default) unless the caller re-sizes
    * them.
    */
  private def carry(
      spark: SparkSession,
      src: String,
      dest: String,
      numFiles: Int,
      fpBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): Unit = {
    def marked(path: String): Int =
      IncrementalAnnIndex.bucketCount(spark, path)
        .getOrElse(IncrementalWinnow.NumBuckets)
    val fb = fpBuckets.getOrElse(marked(IncrementalWinnow.fpPath(src)))
    val ib = idBuckets.getOrElse(marked(IncrementalWinnow.decidedPath(src)))
    val carried = Seq(
      (IncrementalWinnow.fpPath _, Some(("h", fb))),
      (IncrementalWinnow.sizesPath _, Some(("doc_id", ib))),
      (IncrementalWinnow.decidedPath _, Some(("doc_id", ib))),
      (IncrementalWinnow.corpusPath _, None),
      (IncrementalWinnow.ledgerPath _, None))
    require(carried.map(_._1(src)) == IncrementalWinnow.storePaths(src),
      "WinnowMaintenance.carry: store list diverged from " +
        "IncrementalWinnow.storePaths — add the new store to the carry")
    carried.foreach { case (path, bucketBy) =>
      StoreMaintenance.compactVerified(spark, path(src), path(dest),
        s"WinnowMaintenance ${path(src).split('/').last}", numFiles, bucketBy)
    }
  }

  /** Measure-then-act: list the live generation's fingerprint store and
    * compact iff its file count passed `maxFiles`. Below threshold the
    * cost is the listing alone — no reads, no writes. A triggered
    * compaction RE-SIZES both bucket families from the measured bytes
    * (never shrinking below the source markers), so a store that outgrew
    * its bootstrap bucket count leaves maintenance with
    * `targetBucketBytes`-sized buckets and the bounded-probe contract
    * intact.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      maxFiles: Long = DefaultMaxFiles,
      numFiles: Int = 1,
      targetBucketBytes: Long = TargetBucketBytes): Report = {
    require(targetBucketBytes > 0,
      "WinnowMaintenance.maintain: targetBucketBytes must be positive")
    val cur = currentRoot(spark, genRoot)
    val (files, bytes) = StoreMaintenance.fileStats(
      spark, IncrementalWinnow.fpPath(cur))
    if (files <= maxFiles) Report(files, bytes, compacted = false, None)
    else {
      def grown(path: String, storeBytes: Long): Int = {
        val src = IncrementalAnnIndex.bucketCount(spark, path)
          .getOrElse(IncrementalWinnow.NumBuckets)
        math.max(src,
          math.ceil(storeBytes.toDouble / targetBucketBytes).toInt)
      }
      val fb = grown(IncrementalWinnow.fpPath(cur), bytes)
      val ib = grown(IncrementalWinnow.decidedPath(cur),
        StoreMaintenance.fileStats(
          spark, IncrementalWinnow.decidedPath(cur))._2)
      Report(files, bytes, compacted = true,
        Some(compact(spark, genRoot, numFiles,
          fpBuckets = Some(fb), idBuckets = Some(ib))))
    }
  }
}
