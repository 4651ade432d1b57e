package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.streaming.{IncrementalAnnIndex, IncrementalSourceCap, SourceCapMaintenance, StoreMaintenance}

/** Source-cap-store maintenance: the file-count monitor stays quiet
  * under threshold, compaction folds the spent deltas to one summed row
  * per source while the carried budget stays exhausted for exhausted
  * sources and the carried decisions still block re-crawls, bucket
  * counts re-size from measured bytes, and a second fresh era refuses
  * until the next compaction.
  */
class SourceCapMaintenanceSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("source", StringType)))

  private def row(id: Long, src: String): Row = Row(id, src)

  private def land(landing: Path, name: String, rows: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rows.asJava, docSchema))

  private def corpusIds(root: String): Set[Long] =
    spark.read.parquet(IncrementalSourceCap.corpusPath(root))
      .select("doc_id").collect().map(_.getLong(0)).toSet

  /** Two drains at cap=2: source "a" exhausts its budget in batch 0
    * (docs 1,2 admitted; 3 dropped), "b" spends 1 of 2 (doc 10), and
    * batch 1 opens source "c" (doc 11). Returns (genRoot, flatRoot).
    */
  private def adoptedStore(): (String, String) = {
    val landing = Files.createTempDirectory("scm-landing")
    val ckpt = Files.createTempDirectory("scm-ckpt").toString + "/c"
    val flat = Files.createTempDirectory("scm-flat").toString + "/cap"
    land(landing, "b1.parquet", Seq(
      row(1L, "a"), row(2L, "a"), row(3L, "a"), row(10L, "b")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, flat, docSchema, cap = 2)
    land(landing, "b2.parquet", Seq(row(11L, "c")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, flat, docSchema, cap = 2)
    val genRoot = Files.createTempDirectory("scm-gen").toString + "/cap"
    SourceCapMaintenance.adopt(spark, genRoot, flat)
    (genRoot, flat)
  }

  test("under threshold the monitor lists and does nothing") {
    val (genRoot, _) = adoptedStore()
    val gen0 = StoreMaintenance.currentGeneration(spark, genRoot)
    val r = SourceCapMaintenance.maintain(spark, genRoot, maxFiles = 1000000L)
    assert(!r.compacted && r.generation.isEmpty)
    assert(r.countFiles > 0 && r.countBytes > 0)
    assert(StoreMaintenance.currentGeneration(spark, genRoot) == gen0,
      "a no-op maintain must not move the generation pointer")
  }

  test("compaction folds the deltas and a fresh era enforces the carried budget") {
    val (genRoot, _) = adoptedStore()
    val r = SourceCapMaintenance.maintain(spark, genRoot, maxFiles = 0L)
    assert(r.compacted && r.generation.isDefined)
    val cur = StoreMaintenance.resolveCurrent(spark, genRoot)
    assert(r.generation.contains(cur))
    // the folded counts store holds one summed row per source ever seen
    val counts = spark.read.parquet(IncrementalSourceCap.countsPath(cur))
    assert(counts.count() == 3L, "one summed delta per source")
    assert(corpusIds(cur) == Set(1L, 2L, 10L, 11L))
    // a fresh era drains BESIDE the carry: source "a" is exhausted (its
    // carried spend is 2 of 2 — a lost delta would silently re-open it),
    // "b" has one slot left, a re-crawled dropped doc stays dropped, a
    // novel source admits
    val landing = Files.createTempDirectory("scm2-landing")
    val ckpt = Files.createTempDirectory("scm2-ckpt").toString + "/c"
    land(landing, "b1.parquet", Seq(
      row(20L, "a"), row(21L, "b"), row(22L, "b"), row(3L, "a"),
      row(30L, "d")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, cur, docSchema, cap = 2)
    val ids = corpusIds(cur)
    assert(!ids.contains(20L), "exhausted source must stay exhausted")
    assert(!ids.contains(3L), "re-crawl of a dropped doc must stay dropped")
    assert(ids.intersect(Set(21L, 22L)).size == 1,
      "source b had exactly one slot left")
    assert(ids.contains(30L), "a novel source admits")
  }

  test("a triggered compaction re-sizes bucket counts from measured bytes") {
    val (genRoot, _) = adoptedStore()
    SourceCapMaintenance.compact(
      spark, genRoot, countBuckets = Some(8), idBuckets = Some(8))
    val cur = StoreMaintenance.resolveCurrent(spark, genRoot)
    val countsPath = IncrementalSourceCap.countsPath(cur)
    assert(IncrementalAnnIndex.bucketCount(spark, countsPath).contains(8))
    val bytes = StoreMaintenance.fileStats(spark, countsPath)._2
    val r = SourceCapMaintenance.maintain(
      spark, genRoot, maxFiles = 0L, targetBucketBytes = 64L)
    assert(r.compacted)
    val cur2 = StoreMaintenance.resolveCurrent(spark, genRoot)
    val grown = IncrementalAnnIndex.bucketCount(
      spark, IncrementalSourceCap.countsPath(cur2)).get
    assert(grown == math.max(8, math.ceil(bytes / 64.0).toInt), grown)
    assert(grown > 8, "fixture too small to exercise growth")
    // the re-bucketed store still answers the budget probe under its own
    // double-hash key
    val probe = spark.createDataFrame(
      Seq(row(0L, "a"), row(0L, "b")).asJava, docSchema).select("source")
    val spent = IncrementalSourceCap.spentBudget(
      spark, cur2, probe, excludeBatchId = -999L)
      .collect().map(x => x.getString(0) -> x.getLong(1)).toMap
    // (the probe is bucket-pruned, so other sources sharing a touched
    // bucket may legitimately ride along — key on the probed ones)
    assert(spent.get("a").contains(2L) && spent.get("b").contains(1L),
      spent.toString)
  }

  test("a second fresh era refuses until the next compaction") {
    val (genRoot, _) = adoptedStore()
    SourceCapMaintenance.maintain(spark, genRoot, maxFiles = 0L)
    val cur = StoreMaintenance.resolveCurrent(spark, genRoot)
    val landing = Files.createTempDirectory("scm3-landing")
    val ckpt = Files.createTempDirectory("scm3-ckpt").toString + "/c"
    land(landing, "b1.parquet", Seq(row(60L, "z")))
    IncrementalSourceCap.run(
      spark, landing.toString, ckpt, cur, docSchema, cap = 2)
    val ckpt2 = Files.createTempDirectory("scm4-ckpt").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalSourceCap.run(
        spark, landing.toString, ckpt2, cur, docSchema, cap = 2)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
    // …and compacting again re-opens the root for one more fresh era
    SourceCapMaintenance.maintain(spark, genRoot, maxFiles = 0L)
    val cur2 = StoreMaintenance.resolveCurrent(spark, genRoot)
    val landing2 = Files.createTempDirectory("scm5-landing")
    land(landing2, "b1.parquet", Seq(row(61L, "z")))
    IncrementalSourceCap.run(
      spark, landing2.toString, ckpt2, cur2, docSchema, cap = 2)
    assert(corpusIds(cur2) == Set(1L, 2L, 10L, 11L, 60L, 61L))
  }
}
