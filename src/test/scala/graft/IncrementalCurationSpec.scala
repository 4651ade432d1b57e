package graft

import java.nio.file.{Files, Path}

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

import graft.ops.Curation
import graft.streaming.IncrementalCuration

/** Incremental curation against the accumulated signature store: new docs
  * dedup against history without reprocessing it, survivors pass the same
  * row gates as the batch path, replay is idempotent.
  */
class IncrementalCurationSpec extends SparkSpec {

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  // long enough to clear the quality gate's 20-token band, with stopwords
  private def goodText(seed: Int): String =
    (1 to 30).map(i => s"w${seed}x$i").mkString(" ") +
      " the and for that with this from have were been"

  private def row(id: Long, text: String): Row =
    Row(id, text, "en", "crawl", text.length.toLong)

  private def land(landing: Path, name: String, rows: Seq[Row]): Unit =
    landParquet(landing, name, spark.createDataFrame(rows.asJava, docSchema))

  private def ids(df: org.apache.spark.sql.DataFrame): Set[Long] =
    df.select("doc_id").collect().map(_.getLong(0)).toSet

  test("cross-batch duplicates collapse against the stored keeper") {
    val landing = Files.createTempDirectory("cur-landing")
    val ckpt = Files.createTempDirectory("cur-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur-corpus").toString + "/corpus"

    // batch 1: two distinct docs plus a within-batch duplicate of doc 1
    land(landing, "b1.parquet", Seq(
      row(1L, goodText(1)), row(2L, goodText(2)), row(3L, goodText(1))))
    val ids1 = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))
    assert(!ids1.contains(3L), "within-batch duplicate must be dropped")
    assert(ids1.subsetOf(Set(1L, 2L)))

    // batch 2: an exact copy of stored doc 1 (new id), plus a novel doc
    land(landing, "b2.parquet", Seq(
      row(10L, goodText(1)), row(11L, goodText(7))))
    val ids2 = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))
    assert(!ids2.contains(10L),
      "duplicate of a STORED doc must collapse without reprocessing history")

    // the signature store accumulated exactly the non-duplicates
    val sigIds = ids(spark.read.parquet(sigs))
    assert(sigIds == Set(1L, 2L, 11L), s"signature store: $sigIds")

    // survivors carry the batch path's gate decisions exactly
    val survivors = spark.createDataFrame(
      Seq(row(1L, goodText(1)), row(2L, goodText(2)),
        row(11L, goodText(7))).asJava, docSchema)
    val expected = ids(Curation.rowAudit(survivors).filter(col("curated")))
    assert(ids2 == expected,
      s"incremental corpus $ids2 != batch gate decisions $expected")

    // no new files → drain is a no-op and the corpus is unchanged
    val ids3 = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))
    assert(ids3 == ids2)
  }

  test("an empty first drain returns an empty corpus, not a crash") {
    val landing = Files.createTempDirectory("cur3-landing")
    val ckpt = Files.createTempDirectory("cur3-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur3-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur3-corpus").toString + "/corpus"
    val out = IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    assert(out.count() == 0)
    assert(out.schema == IncrementalCuration.CorpusSchema)
  }

  test("hot reference buckets degrade to their root, stay bounded") {
    // five identical docs, cap of 2: every band bucket is hot, so each
    // non-root doc compares against the bucket ROOT only — candidates are
    // linear (one ref per new doc), yet the family still collapses because
    // the root IS the keeper for identical texts (estimate 1.0)
    val docs = spark.createDataFrame(
      (1L to 5L).map(i => row(i, goodText(1))).asJava, docSchema)
    val sigRows = graft.ops.Dedup.minhashSignatures(docs)
    val dups = IncrementalCuration.newDuplicates(
      sigRows, sigRows.limit(0), maxBandOccupancy = 2)
    val pairs = dups.collect()
    assert(pairs.forall(_.getAs[Long]("ref_id") == 1L),
      s"star candidates must point at the root: ${pairs.mkString(",")}")
    assert(pairs.map(_.getAs[Long]("new_id")).toSet == Set(2L, 3L, 4L, 5L))
    assert(pairs.length == 4, "bounded: one candidate per non-root member")
  }

  test("per-batch metrics ledger records the funnel") {
    val landing = Files.createTempDirectory("cur5-landing")
    val ckpt = Files.createTempDirectory("cur5-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur5-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur5-corpus").toString + "/corpus"
    val metrics = Files.createTempDirectory("cur5-m").toString + "/metrics"
    // 3 landed, 2 unique (1 re-crawled id), 1 near-dup pair → 1 dropped
    land(landing, "b1.parquet", Seq(
      row(1L, goodText(1)), row(1L, goodText(1)), row(2L, goodText(1))))
    val c = IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema, Some(metrics))
    val m = spark.read.parquet(metrics).collect().head
    assert(m.getAs[Long]("n_landed") == 3L)
    assert(m.getAs[Long]("n_unique") == 2L)
    assert(m.getAs[Long]("n_duplicates") == 1L)
    assert(m.getAs[Long]("n_curated") == c.count())
  }

  test("duplicate doc_ids within one drain produce one corpus row") {
    val landing = Files.createTempDirectory("cur4-landing")
    val ckpt = Files.createTempDirectory("cur4-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur4-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur4-corpus").toString + "/corpus"
    // the original and its re-crawl land BEFORE the drain → one batch
    land(landing, "b1.parquet", Seq(row(1L, goodText(1)), row(2L, goodText(2))))
    land(landing, "b1dup.parquet", Seq(row(1L, goodText(1))))
    val c = IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    assert(c.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    val sigIds = spark.read.parquet(sigs).groupBy("doc_id").count()
    assert(sigIds.filter(col("count") > 1).count() == 0)
  }

  test("a new doc cannot unseat a stored hot-bucket root") {
    import graft.ops.Dedup
    // stored family: ids 100..104 identical; a new EXACT COPY arrives
    // with id 50 — lower than every stored id. With a tiny occupancy cap
    // the bucket is hot; the stored-first root key must keep a STORED doc
    // as root so the newcomer still matches and is rejected as a dup.
    val txt = goodText(9)
    val stored = spark.createDataFrame(
      (100L to 104L).map(i => row(i, txt)).asJava, docSchema)
    val incoming = spark.createDataFrame(
      Seq(row(50L, txt)).asJava, docSchema)
    val dups = IncrementalCuration.newDuplicates(
      Dedup.minhashSignatures(incoming),
      Dedup.minhashSignatures(stored),
      maxBandOccupancy = 2)
    val hit = dups.filter(col("new_id") === 50L).collect()
    assert(hit.nonEmpty,
      "a stored doc must stay root: the low-id newcomer must be caught")
    assert(hit.forall(_.getAs[Long]("ref_id") >= 100L))
  }

  test("incremental curation reconciles with the batch path on a real corpus") {
    import graft.ops.{Curation, Dedup}
    import graft.testdata.{TestFixtures => T}
    val docs = T.table(spark, sf, "documents")
      .select("doc_id", "text", "lang", "source", "n_chars").cache()
    val batchIds = ids(Curation.audit(docs, Dedup.minhashDupClusters(docs))
      .filter(col("curated")))

    val landing = Files.createTempDirectory("cur6-landing")
    val ckpt = Files.createTempDirectory("cur6-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur6-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur6-corpus").toString + "/corpus"
    val mid = 250L
    landParquet(landing, "b1.parquet", docs.filter(col("doc_id") < mid))
    IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    landParquet(landing, "b2.parquet", docs.filter(col("doc_id") >= mid))
    val incIds = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))

    // every incrementally curated doc passes the same row gates — the two
    // paths may only disagree through the dedup stage (exact-Jaccard
    // keeper-by-quality vs signature-estimate first-seen keeper)
    val gateIds = ids(Curation.rowAudit(docs).filter(col("curated")))
    assert(incIds.subsetOf(gateIds), "incremental must respect the gates")

    val sym = (batchIds diff incIds).size + (incIds diff batchIds).size
    val agreement = 1.0 - sym.toDouble / math.max(batchIds.size, 1)
    assert(agreement >= 0.9,
      s"batch/incremental curation agree on ${agreement * 100}%% " +
        s"(batch ${batchIds.size}, incremental ${incIds.size}, " +
        s"symmetric diff $sym) — the est-Jaccard approximation drifted")
  }

  test("a compacted signature store still catches re-crawled duplicates") {
    val landing = Files.createTempDirectory("cur7-landing")
    val ckpt = Files.createTempDirectory("cur7-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur7-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur7-corpus").toString + "/corpus"
    land(landing, "b1.parquet", Seq(row(1L, goodText(1)), row(2L, goodText(2))))
    IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)

    // compact the signature store and swap it in as the live store under
    // a FRESH checkpoint — the batch=-1 generation must coexist with the
    // resumed stream's batch=0 and keep feeding the dedup join
    val sigs2 = Files.createTempDirectory("cur7-sigs2").toString + "/sigs"
    graft.streaming.StoreMaintenance.compact(spark, sigs, sigs2, numFiles = 1)
    val landing2 = Files.createTempDirectory("cur7-landing2")
    val ckpt2 = Files.createTempDirectory("cur7-ckpt2").toString + "/c"
    val corpus2 = Files.createTempDirectory("cur7-corpus2").toString + "/c2"
    land(landing2, "b2.parquet", Seq(row(10L, goodText(1)), row(11L, goodText(8))))
    IncrementalCuration.run(
      spark, landing2.toString, ckpt2, sigs2, corpus2, docSchema)
    val sigIds = ids(spark.read.parquet(sigs2))
    assert(!sigIds.contains(10L),
      "re-crawl of a compacted-store doc must still be caught as duplicate")
    assert(sigIds == Set(1L, 2L, 11L), s"store after re-entry: $sigIds")
  }

  test("a re-crawled doc_id landing in a LATER batch is not re-admitted") {
    val landing = Files.createTempDirectory("cur8-landing")
    val ckpt = Files.createTempDirectory("cur8-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur8-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur8-corpus").toString + "/corpus"
    land(landing, "b1.parquet", Seq(row(1L, goodText(1)), row(2L, goodText(2))))
    val c1 = IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    val doc1Before = c1.filter(col("doc_id") === 1L).count()
    // batch 2 re-lands doc 1 under its STORED id (a re-crawl): the only
    // stored row with matching content is its own prior copy, which the
    // candidate join excludes by doc_id — membership (first write wins)
    // must catch it, or duplicate rows accumulate in both stores
    land(landing, "b2.parquet", Seq(row(1L, goodText(1)), row(5L, goodText(5))))
    val c = IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    assert(c.filter(col("doc_id") === 1L).count() == doc1Before,
      "a re-crawled stored doc_id must not add corpus rows")
    assert(c.groupBy("doc_id").count().filter(col("count") > 1).count() == 0)
    val sigDup = spark.read.parquet(sigs).groupBy("doc_id").count()
      .filter(col("count") > 1).count()
    assert(sigDup == 0, "signature store must stay one row per doc_id")
    assert(spark.read.parquet(s"$sigs/batch=1").filter(col("doc_id") === 1L)
      .count() == 0, "the re-crawl batch must not re-write doc 1's signature")
    assert(ids(spark.read.parquet(sigs)).contains(5L),
      "the novel batch-mate must still be admitted to the store")
  }

  test("store probes read only the touched band and id buckets") {
    import graft.ops.Dedup
    import org.apache.spark.sql.execution.FileSourceScanExec
    val landing = Files.createTempDirectory("cur9-landing")
    val ckpt = Files.createTempDirectory("cur9-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur9-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur9-corpus").toString + "/corpus"
    land(landing, "b1.parquet", (1L to 8L).map(i => row(i, goodText(i.toInt))))
    IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    land(landing, "b2.parquet", (11L to 18L).map(i => row(i, goodText(100 + i.toInt))))
    IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)

    def parquetFiles(path: String): Seq[String] = {
      import scala.jdk.CollectionConverters._
      TempDirs.walkFiles(java.nio.file.Paths.get(path))
        .filter(java.nio.file.Files.isRegularFile(_))
        .map(_.toString).filter(_.endsWith(".parquet"))
    }
    def scanOf(df: org.apache.spark.sql.DataFrame): FileSourceScanExec = {
      df.collect() // populate the scan metrics
      df.queryExecution.executedPlan.collect {
        case s: FileSourceScanExec => s }.head
    }

    // the band probe: a re-crawl of doc 1's text shares all its buckets
    val probeSigs = Dedup.minhashSignatures(spark.createDataFrame(
      Seq(row(100L, goodText(1))).asJava, docSchema))
    val touched = IncrementalCuration.bandRowsOf(probeSigs)
      .select("band_idx", "band_val").distinct()
    val bandPath = IncrementalCuration.bandIndexPath(sigs)
    val bb = IncrementalCuration.bandBucketCount(spark, bandPath).get
    val touchedBuckets = touched.select(
      IncrementalCuration.bandBucket(col("band_idx"), col("band_val"), bb)
        .as("b")).distinct().collect().map(_.getInt(0)).toSet
    val bandFiles = parquetFiles(bandPath)
    val expectedBand = bandFiles.count(f =>
      touchedBuckets.exists(b => f.contains(s"/band_bucket=$b/")))
    assert(expectedBand < bandFiles.size,
      "fixture too narrow: the touched slice must be a strict subset")
    // the probe still surfaces the stored duplicate's band rows...
    assert(IncrementalCuration.priorBandRows(spark, sigs, touched, -999L)
      .filter(col("doc_id") === 1L).count() > 0)
    val bandScan = scanOf(
      IncrementalCuration.priorBandRows(spark, sigs, touched, -999L))
    // ...while the scan touches exactly the touched-bucket files (static
    // partition pruning, not a post-scan filter) and reads only the three
    // index columns — no minhash payload
    assert(bandScan.metrics("numFiles").value == expectedBand,
      s"band scan read ${bandScan.metrics("numFiles").value} files, " +
        s"expected $expectedBand of ${bandFiles.size}")
    assert(bandScan.toString.contains(
      "ReadSchema: struct<doc_id:bigint,band_idx:int,band_val:string>"),
      bandScan.toString.take(800))

    // the membership probe: only the batch ids' id buckets are scanned
    val probeIds = spark.range(1).select((col("id") + 1).as("doc_id"))
    val sb = graft.streaming.IncrementalAnnIndex.bucketCount(spark, sigs).get
    val touchedIdBuckets = probeIds.select(
      graft.streaming.IncrementalAnnIndex.idBucket(col("doc_id"), sb)
        .as("b")).distinct().collect().map(_.getInt(0)).toSet
    val sigFiles = parquetFiles(sigs)
    val expectedSig = sigFiles.count(f =>
      touchedIdBuckets.exists(b => f.contains(s"/id_bucket=$b/")))
    assert(expectedSig < sigFiles.size)
    // content on a fresh instance: a second collect on the same plan
    // resets the driver-side scan metrics the assertion below reads
    assert(IncrementalCuration.priorDocIds(spark, sigs, probeIds, -999L)
      .collect().map(_.getLong(0)).toSet.contains(1L))
    val idScan = scanOf(
      IncrementalCuration.priorDocIds(spark, sigs, probeIds, -999L))
    assert(idScan.metrics("numFiles").value == expectedSig,
      s"membership scan read ${idScan.metrics("numFiles").value} files, " +
        s"expected $expectedSig of ${sigFiles.size}\n${idScan.toString.take(1200)}\n" +
        idScan.metrics.map { case (k, m) => s"$k=${m.value}" }.mkString(", "))
    assert(idScan.toString.contains("ReadSchema: struct<doc_id:bigint>"),
      idScan.toString.take(800))
  }

  test("a legacy flat store migrates via rebuildBandIndex and stays complete") {
    val landing = Files.createTempDirectory("cur10-landing")
    val ckpt = Files.createTempDirectory("cur10-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur10-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur10-corpus").toString + "/corpus"
    // a LEGACY flat store: signature rows under batch=N, no markers — the
    // layout a plain (un-bucketed) compaction leaves behind
    land(landing, "b1.parquet", Seq(row(1L, goodText(1)), row(2L, goodText(2))))
    IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema)
    val flat = Files.createTempDirectory("cur10-flat").toString + "/sigs"
    graft.streaming.StoreMaintenance.compact(spark, sigs, flat, numFiles = 1)
    // migrate: rebuild the inverted sidecar beside the flat store
    IncrementalCuration.rebuildBandIndex(spark, flat)
    intercept[IllegalArgumentException] { // no double-build
      IncrementalCuration.rebuildBandIndex(spark, flat)
    }
    // the flat store keeps ingesting: batches append flat, the sidecar
    // stays complete, and BOTH pre- and post-migration content still
    // catches re-crawled duplicates through the pruned band probe
    val landing2 = Files.createTempDirectory("cur10-landing2")
    val ckpt2 = Files.createTempDirectory("cur10-ckpt2").toString + "/c"
    val corpus2 = Files.createTempDirectory("cur10-corpus2").toString + "/c2"
    land(landing2, "b2.parquet", Seq(row(5L, goodText(5))))
    IncrementalCuration.run(
      spark, landing2.toString, ckpt2, flat, corpus2, docSchema)
    land(landing2, "b3.parquet", Seq(
      row(10L, goodText(1)), // re-crawl of pre-migration doc 1
      row(11L, goodText(5)), // re-crawl of post-migration doc 5
      row(12L, goodText(9))))
    IncrementalCuration.run(
      spark, landing2.toString, ckpt2, flat, corpus2, docSchema)
    val sigIds = ids(spark.read.parquet(flat))
    assert(sigIds == Set(1L, 2L, 5L, 12L), s"store after migration: $sigIds")
  }

  test("a rejected document's later copy is still recognized as duplicate") {
    val landing = Files.createTempDirectory("cur2-landing")
    val ckpt = Files.createTempDirectory("cur2-ckpt").toString + "/c"
    val sigs = Files.createTempDirectory("cur2-sigs").toString + "/sigs"
    val corpus = Files.createTempDirectory("cur2-corpus").toString + "/corpus"

    // fails every quality band (short 2-char tokens, no stopwords) but has
    // enough tokens to shingle, so it lands in the signature store
    val junk = (1 to 10).map(i => ('a' + i % 26).toChar.toString + "q")
      .mkString(" ")
    land(landing, "b1.parquet", Seq(row(1L, junk), row(2L, goodText(2))))
    val c1 = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))
    assert(!c1.contains(1L), "gate-rejected doc must not be curated")

    // its signature persisted anyway, so a re-crawl copy is a duplicate,
    // not a fresh admission candidate
    land(landing, "b2.parquet", Seq(row(10L, junk)))
    val c2 = ids(IncrementalCuration.run(
      spark, landing.toString, ckpt, sigs, corpus, docSchema))
    assert(!c2.contains(10L))
    val sigIds = ids(spark.read.parquet(sigs))
    assert(sigIds.contains(1L) && !sigIds.contains(10L))
  }
}
