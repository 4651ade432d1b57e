package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Packing

/** The media catalog as a probe-able STORE — the serving layout behind
  * [[graft.ops.Packing.fetchMediaPayloads]] at corpus scale. The relation
  * form of the catalog ([[graft.ops.Multimodal.media]]) is fine when the
  * whole epoch is fetched (every byte is read once either way), but a
  * loader fetching ONE reader's window must not scan a 100 TB byte
  * catalog to resolve a handful of refs: this store lands the payload
  * bytes id-bucketed by `media_ref` (the [[IncrementalAnnIndex.idBucket]]
  * discipline — `pmod(xxhash64(ref), buckets)` as a partition column), so
  * a fetch reads ONLY the buckets its window's refs touch, via static
  * partition pruning. Bucket count is a store property frozen in the
  * [[IncrementalAnnIndex.IdBucketsMarker]] file (probing with a different
  * count would look in the wrong partitions); size it so one bucket's
  * bytes fit a task comfortably — bucket SIZE, not count, is the bounded
  * quantity, exactly as in the ANN/BM25 stores.
  */
object MediaCatalogStore {

  def mediaPath(root: String): String = s"$root/media"

  /** Land the catalog relation as the bucketed serving layout. `media` is
    * [[graft.ops.Multimodal.media]]'s shape; only the fetch-relevant
    * columns are stored (the payload BYTES plus typed metadata — the hex
    * mirror and dimension struct stay derivable upstream).
    */
  def write(media: DataFrame, root: String, buckets: Int): Unit = {
    require(buckets > 0, s"MediaCatalogStore.write: buckets must be " +
      s"positive, got $buckets")
    val spark = media.sparkSession
    media
      .select(col("media_id"), col("media_type"), col("n_bytes"),
        col("payload"))
      .withColumn("id_bucket",
        IncrementalAnnIndex.idBucket(col("media_id"), buckets))
      .repartition(col("id_bucket"))
      .write.partitionBy("id_bucket").parquet(mediaPath(root))
    StoragePaths.writeSmallFile(spark,
      s"${mediaPath(root)}/${IncrementalAnnIndex.IdBucketsMarker}",
      buckets.toString)
  }

  /** The catalog slice a feed's refs touch: the store read pruned to the
    * refs' id buckets (collecting at most `buckets` distinct bucket
    * numbers to the driver — the bounded collect of the ANN membership
    * probe), with the leaf directories ENUMERATED explicitly so even the
    * file LISTING is window-bounded — a plain partition-filtered read
    * would still list every bucket dir of a catalog whose bucket count
    * grew with its size (the chunk-store lesson,
    * [[StoragePaths.readTouchedBuckets]]). Probe I/O is ∝ touched
    * buckets, independent of catalog size — the property the soak's
    * `media_fetch_probe` leg measures.
    */
  def touchedCatalog(spark: SparkSession, root: String,
      feed: DataFrame): DataFrame = {
    val path = mediaPath(root)
    val buckets = IncrementalAnnIndex.bucketCount(spark, path)
      .getOrElse(throw new IllegalArgumentException(
        s"MediaCatalogStore: no bucketed catalog at $root (missing " +
          s"${IncrementalAnnIndex.IdBucketsMarker})"))
    val touched = feed
      .select(explode(col("media_slots")).as("s"))
      .select(IncrementalAnnIndex.idBucket(col("s.media_ref"), buckets)
        .as("id_bucket"))
      .distinct().collect().map(_.getInt(0))
    val fsPath = new org.apache.hadoop.fs.Path(path)
    val fs = fsPath.getFileSystem(spark.sessionState.newHadoopConf())
    val dirs = touched.toSeq
      .map(b => new org.apache.hadoop.fs.Path(fsPath, s"id_bucket=$b"))
      .filter(fs.exists(_)).map(_.toString)
    if (dirs.isEmpty)
      // static empty schema, never a limit(0) over the root read — that
      // would partition-discover every bucket dir, re-paying the exact
      // listing this function exists to bound
      spark.createDataFrame(new java.util.ArrayList[org.apache.spark.sql.Row](),
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("media_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("media_type",
            org.apache.spark.sql.types.StringType),
          org.apache.spark.sql.types.StructField("n_bytes",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("payload",
            org.apache.spark.sql.types.BinaryType))))
    else
      spark.read.option("basePath", path).parquet(dirs: _*)
        .select("media_id", "media_type", "n_bytes", "payload")
  }

  /** The byte fetch against the store: [[Packing.fetchMediaPayloads]]'s
    * exact join over the PRUNED catalog read — same rows as the relation
    * form (spec-asserted), probe I/O bounded by the window's buckets.
    */
  def fetch(spark: SparkSession, root: String, feed: DataFrame): DataFrame =
    Packing.fetchMediaPayloads(feed, touchedCatalog(spark, root, feed))
}
