package graft.streaming

import org.apache.spark.sql.SparkSession

/** The compaction loop for [[IncrementalSourceCap]]'s accumulating
  * stores — the [[FamilyMaintenance]] measure → carry → publish contract,
  * composed bespoke because the counts store's bucket key is its own
  * (`xxhash64(source)` under the id-bucket formula — the
  * [[IncrementalSourceCap.compactCounts]] discipline; the engine's
  * generic fold would bucket on the raw column and place the rows where
  * [[IncrementalSourceCap.spentBudget]]'s touched-bucket probe never
  * looks). The three carries:
  *
  *  - counts: ADDITIVE fold via [[IncrementalSourceCap.compactCounts]] —
  *    one summed delta per source ever admitted, sum-verified before the
  *    bucket marker lands (a lost delta silently re-opens an exhausted
  *    source's budget);
  *  - decided ids: row-preserving, re-bucketed by `doc_id`
  *    ([[StoreMaintenance.compactVerified]]);
  *  - corpus: row-preserving, flat.
  *
  * The carry list is pinned against
  * [[IncrementalSourceCap.storePaths]]; publish is the atomic
  * `_current` pointer. A compacted generation is a complete
  * [[IncrementalSourceCap]] root at `batch=-1`, and
  * [[IncrementalSourceCap.run]] REFUSES a fresh checkpoint while
  * `batch>=0` directories remain — one fresh era per compaction.
  */
object SourceCapMaintenance {

  /** Compact when the counts store holds more files than this. */
  val DefaultMaxFiles = 512L

  /** Target bytes per bucket after compaction — the unit a budget or
    * re-crawl probe reads.
    */
  val TargetBucketBytes: Long = 64L << 20

  final case class Report(
      countFiles: Long,
      countBytes: Long,
      compacted: Boolean,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalSourceCap]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Adopt a flat [[IncrementalSourceCap]] root into the generation
    * layout, publishing generation 0 atomically (and folding the spent
    * deltas on the way in).
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

  /** Rewrite the LIVE generation into the next one and atomically
    * repoint readers. `countBuckets` / `idBuckets` re-size the bucket
    * counts on the way through; None carries the source counts.
    */
  def compact(
      spark: SparkSession,
      genRoot: String,
      numFiles: Int = 1,
      countBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): String = {
    val cur = currentRoot(spark, genRoot)
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    carry(spark, cur, dest, numFiles, countBuckets, idBuckets)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** One verified carry of all three stores, shared by [[adopt]] and
    * [[compact]] so the store list cannot fork (and pinned against
    * [[IncrementalSourceCap.storePaths]]).
    */
  private def carry(
      spark: SparkSession,
      src: String,
      dest: String,
      numFiles: Int,
      countBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): Unit = {
    val carried = Seq(
      IncrementalSourceCap.countsPath _,
      IncrementalSourceCap.decidedPath _,
      IncrementalSourceCap.corpusPath _)
    require(carried.map(_(src)) == IncrementalSourceCap.storePaths(src),
      "SourceCapMaintenance.carry: store list diverged from " +
        "IncrementalSourceCap.storePaths — add the new store to the carry")
    IncrementalSourceCap.compactCounts(spark,
      IncrementalSourceCap.countsPath(src),
      IncrementalSourceCap.countsPath(dest), numFiles, countBuckets)
    val ib = idBuckets.getOrElse(
      IncrementalAnnIndex.bucketCount(spark,
        IncrementalSourceCap.decidedPath(src))
        .getOrElse(IncrementalSourceCap.NumSourceBuckets))
    StoreMaintenance.compactVerified(spark,
      IncrementalSourceCap.decidedPath(src),
      IncrementalSourceCap.decidedPath(dest),
      "SourceCapMaintenance decided", numFiles,
      bucketBy = Some(("doc_id", ib)))
    StoreMaintenance.compactVerified(spark,
      IncrementalSourceCap.corpusPath(src),
      IncrementalSourceCap.corpusPath(dest),
      "SourceCapMaintenance corpus", numFiles)
  }

  /** Measure-then-act: list the live generation's counts store and
    * compact iff its file count passed `maxFiles`. A triggered
    * compaction re-sizes both bucketed stores from their measured bytes
    * (never shrinking below the source markers).
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      maxFiles: Long = DefaultMaxFiles,
      numFiles: Int = 1,
      targetBucketBytes: Long = TargetBucketBytes): Report = {
    require(targetBucketBytes > 0,
      "SourceCapMaintenance.maintain: targetBucketBytes must be positive")
    val cur = currentRoot(spark, genRoot)
    val countsPath = IncrementalSourceCap.countsPath(cur)
    val (files, bytes) = StoreMaintenance.fileStats(spark, countsPath)
    if (files <= maxFiles) Report(files, bytes, compacted = false, None)
    else {
      def grown(path: String, storeBytes: Long): Int = {
        val src = IncrementalAnnIndex.bucketCount(spark, path)
          .getOrElse(IncrementalSourceCap.NumSourceBuckets)
        math.max(src,
          math.ceil(storeBytes.toDouble / targetBucketBytes).toInt)
      }
      val cb = grown(countsPath, bytes)
      val ib = grown(IncrementalSourceCap.decidedPath(cur),
        StoreMaintenance.fileStats(
          spark, IncrementalSourceCap.decidedPath(cur))._2)
      Report(files, bytes, compacted = true,
        Some(compact(spark, genRoot, numFiles,
          countBuckets = Some(cb), idBuckets = Some(ib))))
    }
  }
}
