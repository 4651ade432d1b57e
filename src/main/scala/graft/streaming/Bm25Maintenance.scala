package graft.streaming

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** The compaction loop for [[IncrementalBm25]]'s accumulating index
  * stores — [[StoreMaintenance]]'s generation contract applied to an
  * inverted index. BM25 has no model to recalibrate (the index is exact),
  * so the maintenance hazard is purely physical: every micro-batch adds a
  * `batch=N` posting directory plus a 1-row stats delta, and a crawl
  * that has been draining for a year answers each query by listing
  * thousands of small files per touched term bucket — the small-files
  * problem, growing per-query PLANNING cost with history even though the
  * scanned bytes stay bounded.
  *
  * The policy is measure-then-act on the physical signal itself
  * ([[StoreMaintenance.fileStats]]): when the posting store's file count
  * passes `maxFiles`, rewrite all three stores into the next generation —
  * postings re-bucketed by term, decided ids re-bucketed by doc_id (both
  * row-count verified through [[StoreMaintenance.compactVerified]]), and
  * the stats deltas FOLDED to their single-row sum (verified by exact
  * integer equality of `(n_docs, sum_dl)` against the source fold — the
  * additive store's lossless carry, which also resets the per-read fold
  * to O(1)) — then atomically repoint readers via the `_current`
  * manifest. Below threshold the cost is one recursive listing and no
  * writes.
  *
  * A compacted generation is a complete [[IncrementalBm25]] root: the
  * carried rows land at `batch=-1` (below every streaming epoch), so a
  * stream re-entering under a FRESH checkpoint appends `batch=0` beside
  * the history, and its own-partition-excluded guard reads still see every
  * carried doc_id. One fresh era per compaction: `run` REFUSES a fresh
  * checkpoint while `batch>=0` directories remain, because the new era's
  * ids restart at 0 and would overwrite them.
  */
object Bm25Maintenance {

  /** Compact when the posting store holds more files than this. At ~one
    * posting dir per drained batch × buckets, the default trips after the
    * store's listing cost — not its data — dominates a probe.
    */
  val DefaultMaxFiles = 512L

  /** Target bytes per bucket after compaction — the unit a probe reads.
    * [[maintain]] grows a store's bucket count to hold this line, which
    * is what keeps per-query posting I/O bounded by the probed terms'
    * document frequency instead of total corpus bulk: a frozen bucket
    * count over a 100× corpus means every probe reads 100× more
    * off-vocabulary postings, however healthy the file count looks.
    */
  val TargetBucketBytes: Long = 64L << 20

  final case class Report(
      postingFiles: Long,
      postingBytes: Long,
      compacted: Boolean,
      generation: Option[String])

  /** The live generation's path — a full [[IncrementalBm25]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    StoreMaintenance.resolveCurrent(spark, genRoot)

  /** Adopt a flat [[IncrementalBm25]] root into the generation layout,
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
    * `postingBuckets` / `idBuckets` re-size the bucket counts on the way
    * through (the grown-store path: more buckets keeps bucket SIZE — the
    * unit a probe reads — bounded); None carries the source counts.
    */
  def compact(
      spark: SparkSession,
      genRoot: String,
      numFiles: Int = 1,
      postingBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): String = {
    val cur = currentRoot(spark, genRoot)
    val gen = StoreMaintenance.nextGeneration(spark, genRoot)
    val dest = s"$genRoot/$gen"
    carry(spark, cur, dest, numFiles, postingBuckets, idBuckets)
    StoreMaintenance.publishGeneration(spark, genRoot, gen)
    dest
  }

  /** One verified carry of all three stores, shared by [[adopt]] and
    * [[compact]] so the store list cannot fork. Bucket counts carry from
    * the source markers (or the fresh-store default) unless the caller
    * re-sizes them.
    */
  private def carry(
      spark: SparkSession,
      src: String,
      dest: String,
      numFiles: Int,
      postingBuckets: Option[Int] = None,
      idBuckets: Option[Int] = None): Unit = {
    val pb = postingBuckets.getOrElse(
      IncrementalAnnIndex.bucketCount(spark,
        IncrementalBm25.postingsPath(src))
        .getOrElse(IncrementalBm25.NumBuckets))
    val ib = idBuckets.getOrElse(
      IncrementalAnnIndex.bucketCount(spark,
        IncrementalBm25.decidedPath(src))
        .getOrElse(IncrementalBm25.NumBuckets))
    StoreMaintenance.compactVerified(spark,
      IncrementalBm25.postingsPath(src), IncrementalBm25.postingsPath(dest),
      "Bm25Maintenance postings", numFiles, bucketBy = Some(("term", pb)))
    StoreMaintenance.compactVerified(spark,
      IncrementalBm25.decidedPath(src), IncrementalBm25.decidedPath(dest),
      "Bm25Maintenance decided", numFiles, bucketBy = Some(("doc_id", ib)))
    foldStats(spark, src, dest)
  }

  /** Fold the additive stats deltas into ONE `(n_docs, sum_dl)` row in the
    * destination — the mergeable-partials carry: readers only ever SUM the
    * store, so the fold is lossless, and it resets the per-read fold cost
    * to a single row no matter how many batches the source accumulated.
    * Verified by exact integer equality (both columns are longs) before
    * the caller may publish.
    */
  private def foldStats(
      spark: SparkSession, src: String, dest: String): Unit = {
    val srcStats = spark.read
      .parquet(IncrementalBm25.statsPath(src))
      .agg(sum("n_docs").as("n_docs"), sum("sum_dl").as("sum_dl"))
      .localCheckpoint() // one fold feeds the write AND the verify gate
    srcStats.coalesce(1).write.mode("errorifexists")
      .parquet(s"${IncrementalBm25.statsPath(dest)}/batch=" +
        s"${StoreMaintenance.CompactedBatch}")
    val carried = spark.read.parquet(IncrementalBm25.statsPath(dest))
      .agg(sum("n_docs"), sum("sum_dl")).head()
    val want = srcStats.head()
    require(carried.getLong(0) == want.getLong(0) &&
      carried.getLong(1) == want.getLong(1),
      s"Bm25Maintenance stats: carried (${carried.getLong(0)}, " +
        s"${carried.getLong(1)}) of (${want.getLong(0)}, " +
        s"${want.getLong(1)}) — not publishing the generation")
  }

  /** Measure-then-act: list the live generation's posting store and
    * compact iff its file count passed `maxFiles`. Below threshold the
    * cost is the listing alone — no reads, no writes. A triggered
    * compaction RE-SIZES both stores' bucket counts from the measured
    * bytes (never shrinking below the source markers), so a store that
    * outgrew its bootstrap bucket count leaves maintenance with
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
      "Bm25Maintenance.maintain: targetBucketBytes must be positive")
    val cur = currentRoot(spark, genRoot)
    val (files, bytes) = StoreMaintenance.fileStats(
      spark, IncrementalBm25.postingsPath(cur))
    if (files <= maxFiles) Report(files, bytes, compacted = false, None)
    else {
      def grown(path: String, storeBytes: Long): Int = {
        val src = IncrementalAnnIndex.bucketCount(spark, path)
          .getOrElse(IncrementalBm25.NumBuckets)
        math.max(src,
          math.ceil(storeBytes.toDouble / targetBucketBytes).toInt)
      }
      val pb = grown(IncrementalBm25.postingsPath(cur), bytes)
      val ib = grown(IncrementalBm25.decidedPath(cur),
        StoreMaintenance.fileStats(
          spark, IncrementalBm25.decidedPath(cur))._2)
      Report(files, bytes, compacted = true,
        Some(compact(spark, genRoot, numFiles,
          postingBuckets = Some(pb), idBuckets = Some(ib))))
    }
  }
}
