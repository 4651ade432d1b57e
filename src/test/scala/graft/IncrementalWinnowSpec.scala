package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Dedup
import graft.streaming.IncrementalWinnow

/** Incremental winnow-overlap admission against the accumulated
  * fingerprint store: containment duplicates (pasted spans — the case the
  * MinHash signature store misses) are dropped across batches without
  * reprocessing history, the within-batch pass matches the batch pairs
  * operator, re-crawls are not re-decided, and replays are idempotent.
  */
class IncrementalWinnowSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private def uniqText(seed: Long, n: Int = 30): String =
    (0 until n).map(j => s"w${seed}q$j").mkString(" ")

  private def row(id: Long, text: String): Row = Row(id, text)

  private def land(landing: Path, name: String, rows: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rows.asJava, docSchema))

  private def dirs(): (Path, String, String) = {
    val landing = Files.createTempDirectory("iw-landing")
    val ckpt = Files.createTempDirectory("iw-ckpt").toString + "/c"
    val root = Files.createTempDirectory("iw-root").toString + "/winnow"
    (landing, ckpt, root)
  }

  test("single drain admits exactly the batch operator's non-overlapped set") {
    val (landing, ckpt, root) = dirs()
    val docs = Seq(
      row(1L, uniqText(1)),
      row(2L, uniqText(1)), // exact copy of 1 — must drop with dup_of 1
      row(3L, uniqText(3)),
      row(4L, uniqText(4)))
    land(landing, "b1.parquet", docs)
    val out = IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    val batchPairs = Dedup.winnowOverlapPairs(
      spark.createDataFrame(docs.asJava, docSchema))
      .filter(col("is_overlap") === 1)
      .select("b_id").collect().map(_.getLong(0)).toSet
    val admitted = out.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 2L, 3L, 4L).diff(batchPairs))
    assert(admitted == Set(1L, 3L, 4L))
    val ledger = spark.read.parquet(IncrementalWinnow.ledgerPath(root))
    val dup = ledger.filter(col("doc_id") === 2L).head()
    assert(!dup.getAs[Boolean]("kept") && dup.getAs[Long]("dup_of") == 1L)
  }

  test("a pasted span is caught across batches: containment vs the store") {
    val (landing, ckpt, root) = dirs()
    val long1 = uniqText(1) // 30 tokens, admitted in batch 1
    land(landing, "b1.parquet", Seq(row(1L, long1)))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    // a 10-token contiguous substring: ≥ w + k − 1 shared tokens ⇒ a
    // shared fingerprint is GUARANTEED; the short side has exactly one
    // fingerprint, so containment is 1.0 regardless of which gram won
    val pasted = long1.split(" ").slice(10, 20).mkString(" ")
    land(landing, "b2.parquet", Seq(row(20L, pasted), row(21L, uniqText(21))))
    val out = IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    val admitted = out.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L, 21L), s"got $admitted")
    val dup = spark.read.parquet(IncrementalWinnow.ledgerPath(root))
      .filter(col("doc_id") === 20L).head()
    assert(!dup.getAs[Boolean]("kept") && dup.getAs[Long]("dup_of") == 1L)
  }

  test("funnel counts decompose: a doubly-caught doc is attributed once") {
    // Y overlaps BOTH a lower-id batch doc (X) and a stored doc (A) — the
    // within-batch pass wins the attribution, so the counts decompose:
    // nDroppedWithin + nDroppedStore + |admitted| == nDocs (the naive
    // per-pass counts would double-count Y and sum to nDocs + 1)
    val a = uniqText(1)
    val stored = spark.createDataFrame(Seq(row(1L, a)).asJava, docSchema)
    val storeFps = Dedup.winnowFingerprints(stored)
      .select("doc_id", "h").distinct()
    val storeSizes = storeFps.groupBy("doc_id")
      .agg(count(lit(1)).as("n"))
    val batch = spark.createDataFrame(
      Seq(row(100L, a), row(101L, a)).asJava, docSchema)
    val r = IncrementalWinnow.decideBatch(batch, storeFps, storeSizes)
    val admitted = r.admitted.count()
    assert(admitted == 0L, "both copies of a stored doc must drop")
    assert(r.nDocs == 2L && r.nDroppedWithin == 1L && r.nDroppedStore == 1L,
      s"got within=${r.nDroppedWithin} store=${r.nDroppedStore}")
    assert(r.nDroppedWithin + r.nDroppedStore + admitted == r.nDocs)
  }

  test("a re-crawled doc_id landing in a later batch is not re-decided") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", Seq(row(1L, uniqText(1)), row(2L, uniqText(2))))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    land(landing, "b2.parquet", Seq(row(1L, uniqText(1)), row(3L, uniqText(3))))
    val out = IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    val perId = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L), s"got $perId")
    // the ledger holds ONE decision row for doc 1 (the original)
    val n1 = spark.read.parquet(IncrementalWinnow.ledgerPath(root))
      .filter(col("doc_id") === 1L).count()
    assert(n1 == 1L)
  }

  test("crash replay is idempotent: own-partition exclusion") {
    val (landing, ckpt, root) = dirs()
    land(landing, "b1.parquet", Seq(row(1L, uniqText(1)), row(2L, uniqText(2))))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    val batch = spark.createDataFrame(
      Seq(row(1L, uniqText(1)), row(2L, uniqText(2))).asJava, docSchema)
    val fps = IncrementalWinnow.batchFingerprints(batch)
    // a replay of batch 0 must not see its own stored fingerprints or ids
    val ownFps = IncrementalWinnow.priorFingerprints(
      spark, root, fps.select("h"), excludeBatchId = 0L)
    val ownIds = IncrementalWinnow.priorDecided(
      spark, root, batch.select("doc_id"), excludeBatchId = 0L)
    assert(ownFps.count() == 0 && ownIds.count() == 0,
      "own partition must be invisible to a replay")
    val r = IncrementalWinnow.decideFingerprinted(batch, fps,
      ownFps, IncrementalWinnow.priorSizes(spark, root,
        ownFps.select("doc_id"), excludeBatchId = 0L))
    assert(r.admitted.count() == 2L, "replay must re-admit its own docs")
    // while a LATER batch sees the stored rows
    val later = IncrementalWinnow.priorDecided(
      spark, root, batch.select("doc_id"), excludeBatchId = 1L)
    assert(later.count() == 2L)
  }

  test("a compacted, re-bucketed fingerprint store still catches stored spans") {
    val (landing, ckpt, root) = dirs()
    val long1 = uniqText(1)
    land(landing, "b1.parquet", Seq(row(1L, long1), row(2L, uniqText(2))))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    // compact every store into a fresh root with a DIFFERENT bucket count
    // (the grown-store maintenance move) and resume the stream against it:
    // batch=-1 must coexist with the resumed stream's batch=0 and keep
    // feeding the containment probe under the new bucketing
    val root2 = Files.createTempDirectory("iw-root2").toString + "/winnow"
    graft.streaming.StoreMaintenance.compact(spark,
      IncrementalWinnow.fpPath(root), IncrementalWinnow.fpPath(root2),
      numFiles = 1, bucketBy = Some(("h", 16)))
    graft.streaming.StoreMaintenance.compact(spark,
      IncrementalWinnow.sizesPath(root), IncrementalWinnow.sizesPath(root2),
      numFiles = 1, bucketBy = Some(("doc_id", 16)))
    graft.streaming.StoreMaintenance.compact(spark,
      IncrementalWinnow.decidedPath(root), IncrementalWinnow.decidedPath(root2),
      numFiles = 1, bucketBy = Some(("doc_id", 16)))
    val landing2 = Files.createTempDirectory("iw-landing2")
    val ckpt2 = Files.createTempDirectory("iw-ckpt2").toString + "/c"
    val pasted = long1.split(" ").slice(5, 15).mkString(" ")
    land(landing2, "b2.parquet", Seq(row(20L, pasted), row(21L, uniqText(21))))
    val out = IncrementalWinnow.run(
      spark, landing2.toString, ckpt2, root2, docSchema)
    val admitted = out.select("doc_id").collect().map(_.getLong(0)).toSet
    assert(admitted == Set(21L), s"got $admitted")
    // and the re-crawl guard survived the compaction too (same era — a
    // SECOND fresh checkpoint over the now-written batch=0 directories is
    // exactly what the fresh-era guard refuses)
    land(landing2, "b3.parquet", Seq(row(2L, uniqText(2))))
    val out2 = IncrementalWinnow.run(
      spark, landing2.toString, ckpt2, root2, docSchema)
    assert(out2.filter(col("doc_id") === 2L).count() == 0,
      "compacted decided store must still block the re-crawl")
    val ckpt3 = Files.createTempDirectory("iw-ckpt3").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalWinnow.run(spark, landing2.toString, ckpt3, root2, docSchema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("store probes read only the touched fingerprint buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (landing, ckpt, root) = dirs()
    // enough distinct documents to populate many h buckets
    land(landing, "b1.parquet", (1L to 40L).map(i => row(i, uniqText(i))))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)

    def parquetFiles(path: String): Seq[String] =
      TempDirs.walkFiles(java.nio.file.Paths.get(path))
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).filter(_.endsWith(".parquet"))

    // probe with one re-crawled text: its fingerprints touch few buckets
    val probeFps = IncrementalWinnow.batchFingerprints(spark.createDataFrame(
      Seq(row(100L, uniqText(1))).asJava, docSchema))
    val probe = probeFps.select("h")
    val store = IncrementalWinnow.fpPath(root)
    val n = graft.streaming.IncrementalAnnIndex.bucketCount(spark, store).get
    val touched = probe.select(
      graft.streaming.IncrementalAnnIndex.idBucket(col("h"), n).as("b"))
      .distinct().collect().map(_.getInt(0)).toSet
    val files = parquetFiles(store)
    val expected = files.count(f =>
      touched.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expected < files.size,
      "fixture too narrow: the touched slice must be a strict subset")
    val rel = IncrementalWinnow.priorFingerprints(spark, root, probe, -999L)
    // the stored copy's fingerprints are found...
    assert(rel.count() >= 1)
    rel.collect()
    // the keys semi-join makes this an AQE plan: descend through the
    // adaptive wrapper and materialized query stages to the store scan
    // (the probe side is a checkpointed LogicalRDD — no file scan)
    import org.apache.spark.sql.execution.SparkPlan
    import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
    def scans(p: SparkPlan): Seq[FileSourceScanExec] = p match {
      case a: AdaptiveSparkPlanExec => scans(a.executedPlan)
      case q: QueryStageExec => scans(q.plan)
      case s: FileSourceScanExec => Seq(s)
      case other => other.children.flatMap(scans)
    }
    val scan = scans(rel.queryExecution.executedPlan).head
    // ...reading exactly the touched-bucket files, id-width columns only
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected $expected of ${files.size}")
    assert(scan.toString.contains("ReadSchema: struct<doc_id:bigint,h:bigint>"),
      scan.toString.take(800))
    probeFps.unpersist(blocking = false)
  }

  test("swallowing direction: a long doc containing a stored short one drops") {
    val (landing, ckpt, root) = dirs()
    // 10 tokens → 8 grams → exactly ONE full window → exactly one
    // fingerprint, so the swallowed copy's containment is deterministically
    // 1.0 (the shared full window selects the same gram on both sides)
    val short1 = uniqText(1, n = 10)
    land(landing, "b1.parquet", Seq(row(1L, short1)))
    IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    // long doc swallows the stored short doc whole: every fingerprint of
    // the short side recurs, so containment (min-normalized) is 1.0 —
    // whole-document Jaccard here is far below the duplicate threshold
    val long2 = s"${uniqText(2, n = 25)} $short1 ${uniqText(3, n = 25)}"
    land(landing, "b2.parquet", Seq(row(30L, long2)))
    val out = IncrementalWinnow.run(spark, landing.toString, ckpt, root, docSchema)
    val admitted = out.select("doc_id")
      .collect().map(_.getLong(0)).toSet
    assert(admitted == Set(1L), s"got $admitted")
  }
}
