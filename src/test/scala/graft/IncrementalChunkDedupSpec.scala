package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Dedup
import graft.streaming.IncrementalChunkDedup

/** Incremental chunk dedup against the accumulated chunk-hash store: new
  * docs dedup against all history without reprocessing it, the keep-first
  * election matches the batch operator, store probes stay touched-bucket
  * bounded, re-crawls are not re-admitted.
  */
class IncrementalChunkDedupSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType)))

  private val boiler = "b0 b1 b2 b3 b4 b5 b6 b7" // one exact 8-token chunk

  private def uniqText(seed: Long): String =
    (0 until 8).map(j => s"u${seed}x$j").mkString(" ")

  private def row(id: Long, text: String): Row = Row(id, text)

  private def land(landing: Path, name: String, rows: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rows.asJava, docSchema))

  private def dirs(): (Path, String, String, String) = {
    val landing = Files.createTempDirectory("ckd-landing")
    val ckpt = Files.createTempDirectory("ckd-ckpt").toString + "/c"
    val store = Files.createTempDirectory("ckd-store").toString + "/chunks"
    val corpus = Files.createTempDirectory("ckd-corpus").toString + "/corpus"
    (landing, ckpt, store, corpus)
  }

  test("incremental drains reconcile with the batch operator in doc_id order") {
    val (landing, ckpt, store, corpus) = dirs()
    val b1 = Seq(
      row(1L, s"$boiler ${uniqText(1)}"),
      row(2L, uniqText(2)))
    val b2 = Seq(
      row(10L, s"$boiler ${uniqText(10)}"), // cross-batch boilerplate copy
      row(11L, s"${uniqText(2)} ${uniqText(11)}")) // copies doc 2 whole
    land(landing, "b1.parquet", b1)
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    land(landing, "b2.parquet", b2)
    val out = IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)

    val expected = Dedup.chunkDedupDocs(
      spark.createDataFrame((b1 ++ b2).asJava, docSchema))
    val got = out.select("doc_id", "clean_text", "n_chunks", "n_kept")
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getLong(3))).toSet
    val want = expected.collect().map(r => (r.getLong(0), r.getString(1),
      r.getLong(2), r.getLong(3))).toSet
    assert(got == want, s"incremental $got != batch $want")
    // the cross-batch boilerplate survived exactly once, in its first doc
    assert(got.exists { case (id, t, _, _) => id == 1L && t.startsWith(boiler) })
    assert(got.exists { case (id, t, _, _) =>
      id == 10L && t == uniqText(10) })
    // the store holds exactly the distinct chunk hashes of the corpus
    val storeHashes = spark.read.parquet(store)
      .select("chunk_hash").collect().map(_.getLong(0)).toSet
    val allHashes = Dedup.chunkRows(spark.createDataFrame(
      (b1 ++ b2).asJava, docSchema))
      .select("chunk_hash").collect().map(_.getLong(0)).toSet
    assert(storeHashes == allHashes)
    // no new files → drain is a no-op
    val again = IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    assert(again.count() == out.count())
  }

  test("a re-crawled doc_id landing in a later batch is not re-admitted") {
    val (landing, ckpt, store, corpus) = dirs()
    land(landing, "b1.parquet", Seq(row(1L, uniqText(1)), row(2L, uniqText(2))))
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    land(landing, "b2.parquet", Seq(row(1L, uniqText(1)), row(3L, uniqText(3))))
    val out = IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    val perId = out.groupBy("doc_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(perId == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
      s"one corpus row per doc: $perId")
    // and doc 1's surviving row is the ORIGINAL admission, intact
    assert(out.filter(col("doc_id") === 1L).head().getAs[String]("clean_text")
      == uniqText(1))
  }

  test("per-batch metrics ledger records the chunk funnel") {
    val (landing, ckpt, store, corpus) = dirs()
    val metrics = Files.createTempDirectory("ckd-metrics").toString + "/m"
    land(landing, "b1.parquet", Seq(
      row(1L, s"$boiler ${uniqText(1)}"), row(2L, uniqText(2))))
    IncrementalChunkDedup.run(spark, landing.toString, ckpt, store, corpus,
      docSchema, metricsPath = Some(metrics))
    land(landing, "b2.parquet", Seq(row(10L, s"$boiler ${uniqText(10)}")))
    IncrementalChunkDedup.run(spark, landing.toString, ckpt, store, corpus,
      docSchema, metricsPath = Some(metrics))
    val m = spark.read.parquet(metrics).collect()
      .map(r => r.getAs[Long]("batch_id") ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_occurrences"),
          r.getAs[Long]("n_kept_chunks"))).toMap
    // batch 0: 2 docs, 3 occurrences (boiler + 2 unique tails), all kept
    assert(m(0L) == ((2L, 3L, 3L)), m.toString)
    // batch 1: 1 doc, 2 occurrences, boiler already stored -> 1 kept
    assert(m(1L) == ((1L, 2L, 1L)), m.toString)
  }

  test("an empty first drain returns an empty corpus, not a crash") {
    val (landing, ckpt, store, corpus) = dirs()
    val out = IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    assert(out.count() == 0)
    assert(out.schema == IncrementalChunkDedup.CorpusSchema)
  }

  test("crash replay is idempotent: own-partition exclusion") {
    val (landing, ckpt, store, corpus) = dirs()
    land(landing, "b1.parquet", Seq(row(1L, uniqText(1)), row(2L, uniqText(2))))
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    // simulate the at-least-once replay of batch 0 AFTER its store write
    // landed: the membership read must exclude batch=0's own rows, so the
    // batch's chunks do not look stored and the rewrite stays identical
    val batch = spark.createDataFrame(
      Seq(row(1L, uniqText(1)), row(2L, uniqText(2))).asJava, docSchema)
    val prior = IncrementalChunkDedup.priorChunkHashes(spark, store,
      Dedup.chunkRows(batch).select("chunk_hash"), excludeBatchId = 0L)
    assert(prior.count() == 0, "own partition must be invisible to a replay")
    val r = IncrementalChunkDedup.dedupBatch(batch, prior)
    assert(r.nKeptChunks == 2L, "replay must re-admit its own chunks")
    // while a LATER batch (different id) sees those same rows as stored
    val later = IncrementalChunkDedup.priorChunkHashes(spark, store,
      Dedup.chunkRows(batch).select("chunk_hash"), excludeBatchId = 1L)
    assert(later.count() == 2L)
  }

  test("a compacted, re-bucketed chunk store still drops stored chunks") {
    val (landing, ckpt, store, corpus) = dirs()
    land(landing, "b1.parquet", Seq(
      row(1L, s"$boiler ${uniqText(1)}"), row(2L, uniqText(2))))
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)

    // compact into a fresh root with a DIFFERENT bucket count (the grown-
    // store maintenance move) and resume the stream against it: batch=-1
    // must coexist with the resumed stream's batch=0 and keep feeding the
    // membership anti-join under the new bucketing
    val store2 = Files.createTempDirectory("ckd7-store2").toString + "/chunks"
    graft.streaming.StoreMaintenance.compact(spark, store, store2,
      numFiles = 1, bucketBy = Some(("chunk_hash", 16)))
    val landing2 = Files.createTempDirectory("ckd7-landing2")
    val ckpt2 = Files.createTempDirectory("ckd7-ckpt2").toString + "/c"
    val corpus2 = Files.createTempDirectory("ckd7-corpus2").toString + "/c2"
    land(landing2, "b2.parquet", Seq(
      row(10L, s"$boiler ${uniqText(10)}"), row(11L, uniqText(11))))
    val out = IncrementalChunkDedup.run(
      spark, landing2.toString, ckpt2, store2, corpus2, docSchema)
    // doc 10's boilerplate chunk is stored (under the new bucketing) →
    // only its unique tail survives
    assert(out.filter(col("doc_id") === 10L).head()
      .getAs[String]("clean_text") == uniqText(10))
    // the re-entered store accumulated exactly the novel hashes
    val storeHashes = spark.read.parquet(store2)
      .select("chunk_hash").collect().map(_.getLong(0)).toSet
    val expected = Dedup.chunkRows(spark.createDataFrame(Seq(
      row(1L, s"$boiler ${uniqText(1)}"), row(2L, uniqText(2)),
      row(10L, s"$boiler ${uniqText(10)}"), row(11L, uniqText(11))).asJava,
      docSchema)).select("chunk_hash").collect().map(_.getLong(0)).toSet
    assert(storeHashes == expected)
  }

  test("a crash between first bucketed write and marker write heals bucketed on replay") {
    val (landing, ckpt, store, corpus) = dirs()
    val b1 = Seq(row(1L, s"$boiler ${uniqText(1)}"), row(2L, uniqText(2)))
    land(landing, "b1.parquet", b1)
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    // rewind to the crash point: batch=0's bucketed data landed, but the
    // marker — and everything the loop writes after it (the doc-id
    // sidecar, whose own marker trails its data the same way) — did not
    val marker = java.nio.file.Paths.get(store,
      graft.streaming.IncrementalAnnIndex.IdBucketsMarker)
    java.nio.file.Files.delete(marker)
    def rmTree(p: String): Unit = {
      val root = java.nio.file.Paths.get(p)
      if (java.nio.file.Files.exists(root))
        TempDirs.walkFiles(root).reverse
          .foreach(java.nio.file.Files.delete)
    }
    rmTree(IncrementalChunkDedup.docIdIndexPath(corpus))
    // the crash-replay (checkpoint survives, batch 0's commit lost → the
    // restarted drain re-executes batch 0) must take the BUCKETED
    // branch: before the structural layout probe, the missing marker
    // demoted the store to flat forever, silently losing the
    // touched-bucket pruning contract on batch 0's worst-timed crash
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    // the local ChecksumFileSystem's crc sibling must crash away with its
    // file, or the restarted commit write fails the atomic rename
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    assert(java.nio.file.Files.exists(marker),
      "replay must restore the bucket marker")
    assert(!graft.streaming.StoragePaths.isFlatLayout(spark, store),
      "replay must rewrite bucketed, not demote the store to flat")
    // and the healed store's pruned probe still drops stored chunks: the
    // ORIGINAL checkpoint carries on at batch 1 (own-partition exclusion
    // leaves batch=0 visible), reading through the restored marker
    land(landing, "b2.parquet", Seq(row(10L, s"$boiler ${uniqText(10)}")))
    val out = IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)
    assert(out.filter(col("doc_id") === 10L).head()
      .getAs[String]("clean_text") == uniqText(10))
  }

  test("store probes read only the touched hash buckets") {
    import org.apache.spark.sql.execution.FileSourceScanExec
    val (landing, ckpt, store, corpus) = dirs()
    // enough distinct chunks to populate many buckets
    land(landing, "b1.parquet", (1L to 40L).map(i => row(i, uniqText(i))))
    IncrementalChunkDedup.run(
      spark, landing.toString, ckpt, store, corpus, docSchema)

    def parquetFiles(path: String): Seq[String] =
      TempDirs.walkFiles(java.nio.file.Paths.get(path))
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).filter(_.endsWith(".parquet"))

    // probe with one re-crawled text: it touches exactly one bucket
    val probe = Dedup.chunkRows(spark.createDataFrame(
      Seq(row(100L, uniqText(1))).asJava, docSchema))
      .select("chunk_hash")
    val n = graft.streaming.IncrementalAnnIndex.bucketCount(spark, store).get
    val touched = probe.select(
      graft.streaming.IncrementalAnnIndex.idBucket(col("chunk_hash"), n)
        .as("b")).distinct().collect().map(_.getInt(0)).toSet
    val files = parquetFiles(store)
    val expected = files.count(f =>
      touched.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expected < files.size,
      "fixture too narrow: the touched slice must be a strict subset")
    val rel = IncrementalChunkDedup.priorChunkHashes(spark, store, probe, -999L)
    // the stored duplicate is found...
    val probeHash = probe.head().getLong(0)
    assert(rel.filter(col("chunk_hash") === probeHash).count() == 1)
    rel.collect()
    val scan = rel.queryExecution.executedPlan.collect {
      case s: FileSourceScanExec => s }.head
    // ...reading exactly the touched-bucket files, hash column only
    assert(scan.metrics("numFiles").value == expected,
      s"scan read ${scan.metrics("numFiles").value} files, " +
        s"expected $expected of ${files.size}")
    assert(scan.toString.contains(
      "ReadSchema: struct<chunk_hash:bigint,chunk_hash2:bigint>"),
      scan.toString.take(800))
  }
}
