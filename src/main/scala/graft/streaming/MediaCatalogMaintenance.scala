package graft.streaming

import org.apache.spark.sql.SparkSession

import graft.streaming.FamilyMaintenance.{Carry, StoreSpec}

/** The generation-maintenance loop for [[MediaCatalogStore]] — the
  * [[FamilyMaintenance]] engine instantiated for the media byte catalog,
  * closing the one asymmetry among the serving stores: every other store
  * (ANN lists, BM25 postings, chunk digests, packing fragments) got the
  * drain + compaction + fresh-era treatment, while the catalog was a
  * one-shot bootstrap.
  *
  * The catalog is an exact-fact store (payload bytes keyed by media_id,
  * first write wins), so the carry is row-preserving and id-bucketed
  * ([[Carry.Rows]] with the `media_id` bucket column): compaction folds
  * the accumulated `batch=N` directories into one `batch=-1` generation,
  * verified by row-count identity BEFORE the `_current` pointer moves —
  * a lossy carry would silently drop served bytes, so it never
  * publishes. Because the store is bucketed, the engine's byte-driven
  * re-sizing applies: a triggered compaction re-computes the bucket
  * count from measured bytes (never shrinking below the source marker),
  * so bucket SIZE — the unit a reader's window fetch reads — holds the
  * `targetBucketBytes` line as the crawl grows. Media payloads are the
  * WIDEST rows any store in the engine serves, which is exactly why this
  * family needs the re-size most: a bucket count chosen at bootstrap is
  * wrong within one order of magnitude of catalog growth.
  *
  * A compacted generation is a complete [[MediaCatalogStore]] root at
  * `batch=-1`, and [[MediaCatalogStore.run]] refuses a fresh checkpoint
  * while `batch>=0` directories remain — one fresh era per compaction,
  * the house contract.
  */
object MediaCatalogMaintenance {

  /** Compact when the media store holds more files than this. */
  val DefaultMaxFiles = 512L

  /** Bucket-size target the byte-driven re-size holds (the unit one
    * window fetch reads; payload rows are wide, so the default matches
    * the comfortable-task-read line the other bucketed stores use).
    */
  val DefaultTargetBucketBytes: Long = 64L << 20

  final case class Report(
      files: Long,
      bytes: Long,
      compacted: Boolean,
      generation: Option[String])

  private val family = FamilyMaintenance.Family(
    what = "MediaCatalogMaintenance",
    measureStore = "media",
    stores = Seq(
      StoreSpec("media", MediaCatalogStore.mediaPath _,
        Carry.Rows(Some("media_id"), MediaCatalogStore.DefaultBuckets))),
    pinStorePaths = Some(MediaCatalogStore.storePaths _))

  /** The live generation's path — a full [[MediaCatalogStore]] root. */
  def currentRoot(spark: SparkSession, genRoot: String): String =
    FamilyMaintenance.currentRoot(spark, genRoot)

  /** Adopt a flat [[MediaCatalogStore]] root into the generation layout,
    * publishing generation 0 atomically.
    */
  def adopt(
      spark: SparkSession,
      genRoot: String,
      flatRoot: String,
      numFiles: Int = 1,
      buckets: Map[String, Int] = Map.empty): String =
    FamilyMaintenance.adopt(spark, family, genRoot, flatRoot, numFiles,
      buckets)

  /** Rewrite the LIVE generation into the next one and atomically
    * repoint readers. `buckets` re-sizes the media store's bucket count
    * on the way through (the grown-catalog path); unnamed carries keep
    * the source marker.
    */
  def compact(
      spark: SparkSession,
      genRoot: String,
      numFiles: Int = 1,
      buckets: Map[String, Int] = Map.empty): String =
    FamilyMaintenance.compact(spark, family, genRoot, numFiles, buckets)

  /** Measure-then-act: list the live generation's media store and
    * compact iff its file count passed `maxFiles`. A triggered compaction
    * re-sizes the bucket count from the measured payload bytes (never
    * below the source marker), so the bounded-window-fetch contract
    * survives catalog growth.
    */
  def maintain(
      spark: SparkSession,
      genRoot: String,
      maxFiles: Long = DefaultMaxFiles,
      numFiles: Int = 1,
      targetBucketBytes: Long = DefaultTargetBucketBytes): Report = {
    val r = FamilyMaintenance.maintain(
      spark, family, genRoot, maxFiles, numFiles, targetBucketBytes)
    Report(r.files, r.bytes, r.compacted, r.generation)
  }
}
