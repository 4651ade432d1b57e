package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Packing}
import graft.streaming.{IncrementalAnnIndex, MediaCatalogMaintenance, MediaCatalogStore, StoragePaths}

/** The media catalog's incremental path: per-batch append drain ≡ the
  * one-shot bootstrap of the union, first-write-wins on re-crawled ids,
  * replay idempotence, and the maintenance carry (byte-driven bucket
  * re-size included) — the [[graft.streaming.IncrementalAnnIndex]]
  * discipline applied to the byte catalog.
  */
class MediaCatalogStoreSpec extends SparkSpec {

  private def docs = spark.read.parquet(s"$sf/documents.parquet")
    .select("doc_id", "text").filter("doc_id < 120")

  private lazy val media = Multimodal.media(docs).localCheckpoint()

  /** A loader window whose slots reference the given media ids — the only
    * columns [[Packing.fetchMediaPayloads]] consumes, so the catalog
    * contract is testable without standing up a packed corpus.
    */
  private def windowOf(refs: Seq[Long]): DataFrame = {
    import scala.jdk.CollectionConverters._
    spark.createDataFrame(
      refs.zipWithIndex.map { case (r, i) =>
        org.apache.spark.sql.Row(0L, (i + 1).toLong, 0L, i.toLong, r)
      }.asJava,
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("reader",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("reader_pos",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("bin",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("ref",
          org.apache.spark.sql.types.LongType))))
      .withColumn("media_slots", array(struct(
        lit(0L).as("slot"), col("ref").as("media_ref"))))
      .drop("ref")
  }

  private def fetchRows(df: DataFrame) = df.selectExpr(
    "reader", "reader_pos", "slot", "media_ref", "media_type", "n_bytes",
    "md5(lower(hex(payload))) AS m").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getString(4), r.getLong(5), r.getString(6))).toSet

  private def catRows(df: DataFrame) = df.selectExpr(
    "media_id", "media_type", "n_bytes", "md5(lower(hex(payload))) AS m")
    .collect()
    .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getString(3)))
    .toSet

  test("drain ≡ one-shot write of the union; store fetch ≡ relation fetch") {
    val base = Files.createTempDirectory("mcat-drain").toString
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    val b0 = media.filter("media_id % 2 = 0")
    val b1 = media.filter("media_id % 2 = 1")
    landParquet(land, "b0.parquet", b0)
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema, buckets = 8)
    landParquet(land, "b1.parquet", b1)
    val drained = MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema, buckets = 8)
    // the accumulated relation IS the union catalog
    assert(catRows(drained) == catRows(media))
    // and equals a one-shot bootstrap of the same union, row-for-row
    MediaCatalogStore.write(media, s"$base/oneshot", buckets = 8)
    assert(catRows(spark.read.parquet(
      MediaCatalogStore.mediaPath(s"$base/oneshot"))
      .drop("batch", "id_bucket")) == catRows(drained))
    // fetch over the DRAINED store ≡ the relation-form fetch, bytes and
    // slots included, across both eras' batches
    val window = windowOf(Seq(0L, 3L, 7L, 10L, 111L)).localCheckpoint()
    assert(fetchRows(MediaCatalogStore.fetch(spark, s"$base/root", window))
      == fetchRows(Packing.fetchMediaPayloads(window, media)))
  }

  test("first write wins on a re-crawled id; a lost commit replays identically") {
    val base = Files.createTempDirectory("mcat-replay").toString
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    landParquet(land, "b0.parquet", media.filter("media_id < 60"))
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema, buckets = 8)
    // batch 1 re-lands id 7 with DIFFERENT bytes beside genuinely new ids
    val recrawl = media.filter("media_id >= 60").unionByName(
      media.filter("media_id = 7")
        .withColumn("payload", lit("deadbeef".getBytes))
        .withColumn("n_bytes", lit(8L)))
    landParquet(land, "b1.parquet", recrawl)
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema, buckets = 8)
    val after = catRows(spark.read.parquet(
      MediaCatalogStore.mediaPath(s"$base/root")).drop("batch", "id_bucket"))
    // the union catalog, with id 7's ORIGINAL bytes — first write wins
    assert(after == catRows(media))
    // crash-at-the-worst-moment drill: batch 1's commit is lost, the
    // drain replays it — own-partition exclusion makes the rewrite
    // identical instead of emptying batch=1 against its own rows
    Files.delete(java.nio.file.Paths.get(s"$base/ck", "commits", "1"))
    Files.deleteIfExists(
      java.nio.file.Paths.get(s"$base/ck", "commits", ".1.crc"))
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema, buckets = 8)
    assert(catRows(spark.read.parquet(
      MediaCatalogStore.mediaPath(s"$base/root"))
      .drop("batch", "id_bucket")) == after)
  }

  test("a bootstrapped catalog is a valid drain root; the fresh-era guard bites") {
    val base = Files.createTempDirectory("mcat-boot").toString
    MediaCatalogStore.write(media.filter("media_id < 80"),
      s"$base/root", buckets = 8)
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    // the drain appends beside batch=-1 under a FRESH checkpoint (the
    // bootstrap sorts below every epoch), and the membership probe sees
    // the bootstrapped rows: the re-landed id 11 is ignored
    landParquet(land, "b0.parquet", media.filter(
      "media_id >= 80 OR media_id = 11"))
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/root", media.schema)
    assert(catRows(spark.read.parquet(
      MediaCatalogStore.mediaPath(s"$base/root"))
      .drop("batch", "id_bucket")) == catRows(media))
    assert(spark.read.parquet(MediaCatalogStore.mediaPath(s"$base/root"))
      .filter("media_id = 11").count() == 1)
    // a SECOND fresh checkpoint over the live batch=0 dir must refuse —
    // its epoch 0 would overwrite the drained batch
    val e = intercept[IllegalArgumentException] {
      MediaCatalogStore.run(spark, land.toString, s"$base/ck2",
        s"$base/root", media.schema)
    }
    assert(e.getMessage.contains("fresh checkpoint"))
  }

  test("a legacy flat catalog (pre-drain layout) still serves through the pruned fetch") {
    // the old one-shot layout: id_bucket leaves DIRECTLY under media/,
    // no batch= level — a store persisted before the append path landed
    val base = Files.createTempDirectory("mcat-legacy").toString
    val buckets = 8
    media.select(col("media_id"), col("media_type"), col("n_bytes"),
        col("payload"))
      .withColumn("id_bucket",
        IncrementalAnnIndex.idBucket(col("media_id"), buckets))
      .repartition(col("id_bucket"))
      .write.partitionBy("id_bucket")
      .parquet(MediaCatalogStore.mediaPath(s"$base/root"))
    StoragePaths.writeSmallFile(spark,
      s"${MediaCatalogStore.mediaPath(s"$base/root")}/" +
        IncrementalAnnIndex.IdBucketsMarker, buckets.toString)
    val window = windowOf(Seq(1L, 42L, 99L)).localCheckpoint()
    assert(fetchRows(MediaCatalogStore.fetch(spark, s"$base/root", window))
      == fetchRows(Packing.fetchMediaPayloads(window, media)))
  }

  test("a crashed bootstrap (data without marker) refuses the drain loudly") {
    val base = Files.createTempDirectory("mcat-crash").toString
    // simulate write() dying between the data write and the marker write
    MediaCatalogStore.write(media.filter("media_id < 40"),
      s"$base/root", buckets = 20)
    java.nio.file.Files.delete(java.nio.file.Paths.get(
      MediaCatalogStore.mediaPath(s"$base/root"),
      IncrementalAnnIndex.IdBucketsMarker))
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(
      MediaCatalogStore.mediaPath(s"$base/root"),
      "." + IncrementalAnnIndex.IdBucketsMarker + ".crc"))
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    landParquet(land, "b0.parquet", media.filter("media_id >= 40"))
    // draining would stamp the DEFAULT bucket count over data hashed at
    // 20 — the probe/fetch would silently look in the wrong partitions
    val e = intercept[IllegalArgumentException] {
      MediaCatalogStore.run(spark, land.toString, s"$base/ck",
        s"$base/root", media.schema)
    }
    assert(e.getMessage.contains("without its"))
  }

  test("retraction removes the bytes, tombstones hold across re-crawls and compactions") {
    import graft.streaming.StoreMaintenance
    val base = Files.createTempDirectory("mcat-retract").toString
    MediaCatalogStore.write(media, s"$base/flat", buckets = 8)
    val genRoot = s"$base/gen"
    MediaCatalogMaintenance.adopt(spark, genRoot, s"$base/flat")

    // takedown: ids 3 and 33 (plus 9999, a not-yet-crawled asset whose
    // takedown arrives before the crawl does)
    import spark.implicits._
    val gone = MediaCatalogMaintenance.retract(spark, genRoot,
      Seq(3L, 33L, 9999L).toDF("media_id"))
    val window = windowOf(Seq(2L, 3L, 33L, 40L)).localCheckpoint()
    val served = fetchRows(MediaCatalogStore.fetch(spark, gone, window))
    // the retracted refs serve NOTHING; the rest serve the same bytes
    assert(served.map(_._4).toSet == Set(2L, 40L))
    assert(served == fetchRows(Packing.fetchMediaPayloads(
      window, media.filter("media_id IN (2, 40)"))))
    assert(spark.read.parquet(MediaCatalogStore.mediaPath(gone))
      .count() == media.count() - 2)

    // a re-crawl lands the taken-down asset again (plus the pre-crawl
    // one and a genuinely new id) under a fresh era over the generation:
    // tombstoned ids are refused admission, the new id lands
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    val newDocs = spark.read.parquet(s"$sf/documents.parquet")
      .select("doc_id", "text").filter("doc_id >= 120 AND doc_id < 125")
    landParquet(land, "b0.parquet",
      media.filter("media_id IN (3, 33)")
        .unionByName(Multimodal.media(newDocs))
        .unionByName(media.filter("media_id = 5")
          .withColumn("media_id", lit(9999L))))
    MediaCatalogStore.run(spark, land.toString, s"$base/ck", gone,
      media.schema)
    val after = spark.read.parquet(MediaCatalogStore.mediaPath(gone))
    assert(after.filter("media_id IN (3, 33, 9999)").count() == 0,
      "a tombstoned id must never re-enter the catalog")
    assert(after.filter("media_id >= 120").count() == 5)

    // the ledger survives a routine compaction, and so does the refusal
    val compacted = MediaCatalogMaintenance.compact(spark, genRoot)
    assert(spark.read.parquet(MediaCatalogStore.tombstonesPath(compacted))
      .select("media_id").collect().map(_.getLong(0)).toSet ==
      Set(3L, 33L, 9999L))
    val land2 = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land2"))
    landParquet(land2, "b0.parquet", media.filter("media_id = 3"))
    MediaCatalogStore.run(spark, land2.toString, s"$base/ck2", compacted,
      media.schema)
    assert(spark.read.parquet(MediaCatalogStore.mediaPath(compacted))
      .filter("media_id = 3").count() == 0)
    // retraction is complete once superseded generations are vacuumed —
    // the stale list names every pre-retraction copy of the bytes
    assert(StoreMaintenance.staleGenerations(spark, genRoot).size == 2)
  }

  test("maintenance carries the bytes and re-sizes buckets; a fresh era continues over the generation") {
    val base = Files.createTempDirectory("mcat-maint").toString
    val land = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land"))
    // bootstrap DELIBERATELY under-bucketed (2), then grow by a drain —
    // the shape a real crawl reaches maintenance in
    MediaCatalogStore.write(media.filter("media_id < 50"),
      s"$base/flat", buckets = 2)
    landParquet(land, "b0.parquet", media.filter("media_id >= 50"))
    MediaCatalogStore.run(spark, land.toString, s"$base/ck",
      s"$base/flat", media.schema)
    val window = windowOf(Seq(2L, 49L, 50L, 119L)).localCheckpoint()
    val before = fetchRows(
      MediaCatalogStore.fetch(spark, s"$base/flat", window))
    assert(before.nonEmpty)

    val genRoot = s"$base/gen"
    MediaCatalogMaintenance.adopt(spark, genRoot, s"$base/flat")
    val adopted = MediaCatalogMaintenance.currentRoot(spark, genRoot)
    // the adopted generation serves identically through the pruned path
    assert(fetchRows(
      MediaCatalogStore.fetch(spark, adopted, window)) == before)

    // byte-driven re-size: a tiny bucket-size target forces the grown
    // count; the marker moves, the bytes don't
    val r = MediaCatalogMaintenance.maintain(spark, genRoot,
      maxFiles = 0L, targetBucketBytes = 1024L)
    assert(r.compacted)
    val resized = MediaCatalogMaintenance.currentRoot(spark, genRoot)
    val grownBuckets = IncrementalAnnIndex.bucketCount(
      spark, MediaCatalogStore.mediaPath(resized)).get
    assert(grownBuckets > 2, s"expected a re-sized bucket count, " +
      s"got $grownBuckets")
    assert(catRows(spark.read.parquet(MediaCatalogStore.mediaPath(resized))
      .drop("batch", "id_bucket")) == catRows(media))
    // the fetch across the RE-SIZED generation — the pruned probe under
    // the new bucket geometry — still serves the same bytes
    assert(fetchRows(
      MediaCatalogStore.fetch(spark, resized, window)) == before)

    // a compacted generation is a complete drain root: a fresh era
    // appends batch=0 beside the carried batch=-1, membership intact
    val land2 = Files.createDirectories(
      java.nio.file.Paths.get(s"$base/land2"))
    landParquet(land2, "b0.parquet",
      Multimodal.media(spark.read.parquet(s"$sf/documents.parquet")
        .select("doc_id", "text").filter("doc_id >= 120 AND doc_id < 140"))
        .unionByName(media.filter("media_id = 3")
          .withColumn("payload", lit("cafe".getBytes))
          .withColumn("n_bytes", lit(4L))))
    MediaCatalogStore.run(spark, land2.toString, s"$base/ck2",
      resized, media.schema)
    val served = spark.read.parquet(MediaCatalogStore.mediaPath(resized))
      .drop("batch", "id_bucket")
    assert(served.count() == 140)
    // the carried history still wins over the new era's re-crawl
    assert(catRows(served.filter("media_id = 3")) ==
      catRows(media.filter("media_id = 3")))
    // and the store keeps serving under its re-sized marker, probes
    // touching a strict subset of leaf dirs (the bounded-listing claim)
    val touched = StoragePaths.touchedBucketDirs(spark,
      MediaCatalogStore.mediaPath(resized), "id_bucket",
      Seq(IncrementalAnnIndex.idBucket(lit(2L), grownBuckets)).map(c =>
        media.sparkSession.range(1).select(c.as("b")).head().getInt(0)))
    val allLeaves = StoragePaths.touchedBucketDirs(spark,
      MediaCatalogStore.mediaPath(resized), "id_bucket",
      0 until grownBuckets)
    assert(touched.nonEmpty && touched.size < allLeaves.size)
  }
}
