package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.streaming.IncrementalPacking

/** Incremental sequence packing: bins continue each shard's cursor so an
  * ordered drain reproduces the batch operator exactly, already-written
  * bins never move, replays are idempotent, and the shard count freezes
  * at bootstrap.
  */
class IncrementalPackingSpec extends SparkSpec {

  /** Deterministic corpus: ~(7 + id%5) tokens per doc. */
  private def corpus(lo: Long, hi: Long): DataFrame =
    spark.range(lo, hi).select(col("id").as("doc_id"),
      expr("""array_join(transform(sequence(0, CAST(6 + id % 5 AS INT)),
             |  i -> concat('tk', pmod(hash(id, i), 50))), ' ')"""
        .stripMargin.replaceAll("\n", " ")).as("text"))

  private def schema = corpus(0L, 1L).schema

  private def binTuples(df: DataFrame): Set[(Long, Long, Long, Long, Long)] =
    df.select("doc_id", "shard", "n_tokens", "bin", "bin_offset")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet

  private def deletePath(p: String): Unit =
    java.nio.file.Files.deleteIfExists(java.nio.file.Paths.get(p))

  test("a single drain reproduces the batch operator exactly") {
    val landing = Files.createTempDirectory("ipack-landing")
    val ckpt = Files.createTempDirectory("ipack-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack-root").toString + "/p"
    val docs = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", docs)
    val bins = IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema)
    assert(binTuples(bins) == binTuples(Packing.packBins(docs)))
    assert(IncrementalPacking.storedShards(spark, root)
      .contains(Packing.Shards))
  }

  test("a later batch continues the cursors; earlier bins never move") {
    val landing = Files.createTempDirectory("ipack2-landing")
    val ckpt = Files.createTempDirectory("ipack2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack2-root").toString + "/p"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    val firstEra = binTuples(
      spark.read.parquet(IncrementalPacking.binsPath(root)).drop("batch"))
    val b2 = corpus(300L, 500L)
    landParquet(landing, "b2.parquet", b2)
    val all = IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema)
    // batch-1 ids all precede batch-2 ids, so sequential packing equals
    // the batch operator over the union — the continuation is EXACT, not
    // merely consistent
    assert(binTuples(all) == binTuples(Packing.packBins(b1.unionAll(b2))))
    // and so does the accumulated fill/waste surface
    def statRows(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4), r.getLong(5))).toSet
    assert(statRows(IncrementalPacking.storeStats(spark, root)) ==
      statRows(Packing.stats(b1.unionAll(b2))))
    // and batch 1's rows are bit-identical to before batch 2 landed
    val b1After = binTuples(all.join(b1.select("doc_id"), Seq("doc_id")))
    assert(b1After == firstEra)
    // batch 2 genuinely continued mid-stream: at least one shard's first
    // batch-2 document starts past a non-zero offset or bin
    val continued = all.join(b2.select("doc_id"), Seq("doc_id"))
      .filter(col("bin") > 0 || col("bin_offset") > 0)
    assert(continued.count() > 0)
  }

  test("an at-least-once replay rewrites identical bin rows") {
    val landing = Files.createTempDirectory("ipack3-landing")
    val ckpt = Files.createTempDirectory("ipack3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack3-root").toString + "/p"
    landParquet(landing, "b1.parquet", corpus(0L, 200L))
    val first = binTuples(IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema))
    // crash-replay: the checkpoint survives but batch 0's commit (and
    // its crc sibling) is lost, so the restarted drain re-executes it
    // under its original id; the strictly-before cursor read reproduces
    // the pre-N state, so the overwrite lands byte-identical rows. (A
    // fresh checkpoint is NOT a replay — the era guard refuses it.)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "0"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".0.crc"))
    val second = binTuples(IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema))
    assert(second == first)
    // and the fresh-checkpoint spelling is refused outright
    val ckptF = Files.createTempDirectory("ipack3-ckptf").toString + "/c"
    val err = intercept[IllegalArgumentException] {
      IncrementalPacking.run(spark, landing.toString, ckptF, root, schema)
    }
    assert(err.getMessage.contains("compact first"), err.getMessage)
  }

  test("cursor snapshots survive compaction; the stream continues exactly") {
    val landing = Files.createTempDirectory("ipack5-landing")
    val ckpt = Files.createTempDirectory("ipack5-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack5-root").toString + "/p"
    val b1 = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    val before = IncrementalPacking.cursor(spark, root, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // fold the accumulated snapshots (all land at batch=-1, where batch
    // ids tie — the read must still resolve the LATEST state)
    val compacted = Files.createTempDirectory("ipack5-compact").toString + "/cur"
    graft.streaming.StoreMaintenance.compact(
      spark, IncrementalPacking.cursorPath(root), compacted, 1)
    val src = IncrementalPacking.cursorPath(root)
    val fs = new java.io.File(src.stripPrefix("file:"))
    org.apache.commons.io.FileUtils.deleteDirectory(fs)
    org.apache.commons.io.FileUtils.copyDirectory(
      new java.io.File(compacted.stripPrefix("file:")), fs)
    val after = IncrementalPacking.cursor(spark, root, Long.MaxValue)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(after == before)
    // and a post-compaction batch continues exactly where b1 ended
    val b2 = corpus(200L, 300L)
    landParquet(landing, "b2.parquet", b2)
    val all = IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema)
    assert(binTuples(all) == binTuples(Packing.packBins(b1.unionAll(b2))))
  }

  test("epoch plans pinned at a batch high-water mark are stable under appends") {
    val landing = Files.createTempDirectory("ipack6-landing")
    val ckpt = Files.createTempDirectory("ipack6-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack6-root").toString + "/p"
    val b1 = corpus(0L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    val pin = IncrementalPacking.latestBinsBatch(spark, root)
    assert(pin.nonEmpty)
    def rows(df: DataFrame) = df.collect().map(r => (
      r.getAs[Long]("shard"), r.getAs[Long]("bin")) -> (
      r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
      r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"))).toMap
    val planned = rows(IncrementalPacking.epochPlanAt(
      spark, root, epoch = 1, upToBatch = pin))
    // the pinned plan equals the batch operator over exactly the pinned
    // corpus — the seam and the sugar agree through the store
    assert(planned == rows(Packing.epochPlan(b1, 1)))
    // a trainer is mid-epoch when the crawl appends more documents…
    landParquet(landing, "b2.parquet", corpus(300L, 500L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    // …and re-deriving the SAME pinned plan is bit-identical: reader_pos
    // of bins already dealt cannot shift under the grown store
    assert(rows(IncrementalPacking.epochPlanAt(
      spark, root, epoch = 1, upToBatch = pin)) == planned)
    // the next epoch pins the new high-water mark and deals every bin,
    // including the boundary bin batch 2 extended (its token count grew,
    // so the live plan genuinely differs from the pinned one)
    val live = rows(IncrementalPacking.epochPlanAt(spark, root, epoch = 1))
    assert(live == rows(Packing.epochPlan(b1.unionAll(corpus(300L, 500L)), 1)))
    assert(live != planned)
  }

  test("the token budget freezes at bootstrap alongside the shard count") {
    val landing = Files.createTempDirectory("ipack7-landing")
    val ckpt = Files.createTempDirectory("ipack7-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack7-root").toString + "/p"
    landParquet(landing, "b1.parquet", corpus(0L, 100L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    assert(IncrementalPacking.storedBudget(spark, root)
      .contains(Packing.Budget))
    // simulate a binary rebuilt with a different Packing.Budget continuing
    // this store: the recorded budget disagrees with the live constant and
    // the drain must refuse rather than re-bin against mismatched history
    graft.streaming.StoragePaths.writeSmallFile(
      spark, IncrementalPacking.budgetMarker(root),
      (Packing.Budget / 2).toString)
    landParquet(landing, "b2.parquet", corpus(100L, 200L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    }
    assert(e.getMessage.contains("budget") ||
      e.getCause.getMessage.contains("budget"))
  }

  test("payload fragments concatenate to the batch operator's bin payloads") {
    import graft.ops.{Packing, Portable}
    val vocab = Portable.subwordVocab
    val b1 = corpus(0L, 180L)
    val b2 = corpus(180L, 300L)
    // an ordered two-batch drain's fragments: batch 1 from the empty
    // cursor, batch 2 from batch 1's post-state
    val cur0 = spark.createDataFrame(
      new java.util.ArrayList[org.apache.spark.sql.Row](),
      org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("shard",
          org.apache.spark.sql.types.LongType),
        org.apache.spark.sql.types.StructField("cum_tokens",
          org.apache.spark.sql.types.LongType))))
    val src = graft.ops.TextAnalysis.subwordCountSqlWith(vocab)
    val (_, cur1) = IncrementalPacking.packBatch(
      b1, cur0, Packing.Shards, src)
    val frag1 = IncrementalPacking.packBatchPayloads(
      b1, cur0, Packing.Shards, vocab).collect()
    val frag2 = IncrementalPacking.packBatchPayloads(
      b2, cur1.localCheckpoint(), Packing.Shards, vocab).collect()
    def byBin(rows: Array[org.apache.spark.sql.Row]) =
      rows.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    val (m1, m2) = (byBin(frag1), byBin(frag2))
    // fragments within one drain: batch 2 may EXTEND batch 1's boundary
    // bins but never rewrite them — concatenated in batch order, every
    // bin equals the batch operator over the union corpus
    val whole = byBin(Packing.binPayloads(
      b1.unionAll(b2), Packing.Shards, vocab).collect())
    val stitched = (m1.keySet ++ m2.keySet).map { k =>
      val (d1, t1, i1) = m1.getOrElse(k, (0L, 0L, Nil))
      val (d2, t2, i2) = m2.getOrElse(k, (0L, 0L, Nil))
      k -> (d1 + d2, t1 + t2, i1 ++ i2)
    }.toMap
    assert(stitched == whole,
      "fragment concatenation must reproduce the batch operator")
    // and at least one boundary bin was genuinely extended (both batches
    // contributed), so the stitching contract was actually exercised
    assert((m1.keySet & m2.keySet).nonEmpty)
    // replay determinism: the fragment relation is a pure function
    assert(byBin(IncrementalPacking.packBatchPayloads(
      b2, cur1, Packing.Shards, vocab).collect()) == m2)
  }

  test("a payload drain accumulates the trainer feed; unit mismatch refuses") {
    import graft.ops.{Packing, Portable, TextAnalysis}
    val vocab = Portable.subwordVocab
    val src = TextAnalysis.subwordCountSqlWith(vocab)
    val landing = Files.createTempDirectory("ipay-landing")
    val ckpt = Files.createTempDirectory("ipay-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipay-root").toString + "/p"
    val b1 = corpus(0L, 180L)
    val b2 = corpus(180L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    landParquet(landing, "b2.parquet", b2)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    def streams(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    // the accumulated feed equals the batch operator over the union
    assert(streams(IncrementalPacking.payloadStreams(spark, root)) ==
      streams(Packing.binPayloads(b1.unionAll(b2), Packing.Shards, vocab)))
    // …and so does the store-backed attention-mask surface: spans read
    // straight off the bins store, no text touched (offsets continued
    // the cursor, so boundary-bin spans stay stream-relative)
    def spans(df: org.apache.spark.sql.DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("span_start"), r.getAs[Long]("span_len"))).toMap
    assert(spans(IncrementalPacking.binManifest(spark, root)) ==
      spans(Packing.binManifest(b1.unionAll(b2), nTokensSql = src)))
    // a payload vocabulary that is NOT the run's token source refuses
    // before any write — one unit for bins and fragments
    val e = intercept[IllegalArgumentException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        payloadVocab = Some(vocab))
    }
    assert(e.getMessage.contains("token source"))
  }

  test("reader feed over a store ≡ the batch fetch; the pin holds under appends") {
    import graft.ops.{Packing, Portable, TextAnalysis}
    val vocab = Portable.subwordVocab
    val src = TextAnalysis.subwordCountSqlWith(vocab)
    val landing = Files.createTempDirectory("irf-landing")
    val ckpt = Files.createTempDirectory("irf-ckpt").toString + "/c"
    val root = Files.createTempDirectory("irf-root").toString + "/p"
    val b1 = corpus(0L, 180L)
    val b2 = corpus(180L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    landParquet(landing, "b2.parquet", b2)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    def rows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    // an ordered drain's feed equals the batch operator's fetch over the
    // union corpus — every bin exactly once, same deal, same payloads
    val storeFeed = rows(IncrementalPacking.readerFeed(spark, root, 1))
    val batchFeed = rows(Packing.readerFeed(
      b1.unionAll(b2), 1, vocab = vocab))
    assert(storeFeed == batchFeed)
    // the feed's deal is the pinned epoch plan's deal (the epochPlanAt
    // composition, derived here from the payload store's own stats)
    val plan = IncrementalPacking.epochPlanAt(spark, root, 1).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"))).toMap
    assert(storeFeed.view.mapValues(v => (v._1, v._2)).toMap == plan)
    // pin stability: a feed pinned at batch 0 ignores batch 1's
    // fragments — including the boundary-bin EXTENSIONS batch 1 wrote —
    // and re-deriving it after more data landed is bit-identical
    val pinned = rows(
      IncrementalPacking.readerFeed(spark, root, 1, upToBatch = Some(0L)))
    val b1Only = rows(Packing.readerFeed(b1, 1, vocab = vocab))
    assert(pinned == b1Only)
    // a root that never existed serves an empty feed, not a crash
    assert(IncrementalPacking.readerFeed(
      spark, root + "-nowhere", 1).count() == 0)
  }

  test("payload materialization freezes at bootstrap; flipping it refuses") {
    import graft.ops.{Portable, TextAnalysis}
    val vocab = Portable.subwordVocab
    val src = TextAnalysis.subwordCountSqlWith(vocab)
    // off→on: a store whose early batches drained WITHOUT fragments must
    // not start writing them mid-history — payloadStreams would silently
    // serve a feed missing those batches' tokens while bins include them
    val landing = Files.createTempDirectory("ipaym-landing")
    val ckpt = Files.createTempDirectory("ipaym-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipaym-root").toString + "/p"
    landParquet(landing, "b1.parquet", corpus(0L, 100L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src)
    assert(IncrementalPacking.storedPayloadsEnabled(spark, root)
      .contains(false))
    landParquet(landing, "b2.parquet", corpus(100L, 200L))
    val e1 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        nTokensSql = src, payloadVocab = Some(vocab))
    }
    assert(e1.getMessage.contains("froze payload mode '0'") ||
      e1.getCause.getMessage.contains("froze payload mode '0'"))
    // on→off: a store draining fragments from batch 0 must not stop — the
    // trainer feed would silently freeze while bins keep growing
    val landing2 = Files.createTempDirectory("ipaym2-landing")
    val ckpt2 = Files.createTempDirectory("ipaym2-ckpt").toString + "/c"
    val root2 = Files.createTempDirectory("ipaym2-root").toString + "/p"
    landParquet(landing2, "b1.parquet", corpus(0L, 100L))
    IncrementalPacking.run(spark, landing2.toString, ckpt2, root2, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    assert(IncrementalPacking.storedPayloadsEnabled(spark, root2)
      .contains(true))
    landParquet(landing2, "b2.parquet", corpus(100L, 200L))
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing2.toString, ckpt2, root2, schema,
        nTokensSql = src)
    }
    assert(e2.getMessage.contains("froze payload mode '1'") ||
      e2.getCause.getMessage.contains("froze payload mode '1'"))
    // pre-marker store: heal from the payloads store's own existence —
    // fragments present means every prior drain wrote them
    deletePath(IncrementalPacking.payloadsMarker(root2))
    IncrementalPacking.run(spark, landing2.toString, ckpt2, root2, schema,
      nTokensSql = src, payloadVocab = Some(vocab))
    assert(IncrementalPacking.storedPayloadsEnabled(spark, root2)
      .contains(true), "the heal path must infer '1' from the fragments")
  }

  test("an mm drain reproduces the batch operator, sidecar included; the mode freezes") {
    import graft.ops.{Packing, Portable}
    val vocab = Portable.subwordVocab
    val carriage = Packing.MediaCarriageSql
    val src = Packing.mmTokensSqlWith(vocab, carriage)
    val landing = Files.createTempDirectory("imm-landing")
    val ckpt = Files.createTempDirectory("imm-ckpt").toString + "/c"
    val root = Files.createTempDirectory("imm-root").toString + "/p"
    val b1 = corpus(0L, 180L)
    val b2 = corpus(180L, 300L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab),
      mmCarriageSql = Some(carriage))
    landParquet(landing, "b2.parquet", b2)
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab),
      mmCarriageSql = Some(carriage))
    assert(IncrementalPacking.storedPayloadsMode(spark, root).contains(
      IncrementalPacking.payloadsModeMm(carriage, Packing.MediaRefSql)))
    def mmRows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList,
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
            .map(s => (s.getLong(0), s.getLong(1))).toList)).toMap
    // ordered drain ≡ batch operator bin-for-bin, token-for-token,
    // INCLUDING the (slot, media_ref) sidecar
    val stored = mmRows(IncrementalPacking.payloadStreamsMm(spark, root))
    val whole = mmRows(Packing.binPayloadsMm(
      b1.unionAll(b2), Packing.Shards, vocab))
    assert(stored == whole)
    // the boundary-bin slot shift was genuinely exercised: some bin's
    // fragments span both batches AND its batch-2 fragment carries media
    // (whose slots only rebase correctly against batch 1's base offset)
    val frags = spark.read.parquet(IncrementalPacking.payloadsPath(root))
    val byBinBatches = frags.groupBy("shard", "bin")
      .agg(countDistinct(col("batch")).as("nb"),
        sum(expr("size(media_offs)")).as("slots"),
        max(when(col("batch").cast("long") === 1L,
          expr("size(media_offs)")).otherwise(0L)).as("late_slots"))
    assert(byBinBatches
      .filter(col("nb") > 1 && col("late_slots") > 0).count() > 0,
      "fixture must exercise a boundary bin with media in the later batch")
    // every slot indexes a placeholder cell of the concatenated stream
    val badSlots = IncrementalPacking.payloadStreamsMm(spark, root)
      .selectExpr("filter(media_slots, s -> " +
        s"element_at(input_ids, CAST(s.slot + 1 AS INT)) != " +
        s"${Packing.MediaSlotId}L) AS bad")
      .filter(expr("size(bad) > 0"))
    assert(badSlots.count() == 0)
    // the store-backed mm fetch ≡ the batch fetch, sidecar riding
    def feedRows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList,
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
            .map(s => (s.getLong(0), s.getLong(1))).toList)).toMap
    assert(feedRows(IncrementalPacking.readerFeedMm(spark, root, 1)) ==
      feedRows(Packing.readerFeedMm(b1.unionAll(b2), 1, vocab = vocab)))
    // replay: batch 1 re-executes from the strictly-before cursor and
    // rewrites identical fragments (sidecar included)
    java.nio.file.Files.delete(
      java.nio.file.Paths.get(ckpt, "commits", "1"))
    java.nio.file.Files.deleteIfExists(
      java.nio.file.Paths.get(ckpt, "commits", ".1.crc"))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
      nTokensSql = src, payloadVocab = Some(vocab),
      mmCarriageSql = Some(carriage))
    assert(mmRows(IncrementalPacking.payloadStreamsMm(spark, root)) == whole)
    // the mode froze: continuing WITHOUT the sidecar refuses loudly…
    landParquet(landing, "b3.parquet", corpus(300L, 350L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        nTokensSql = graft.ops.TextAnalysis.subwordCountSqlWith(vocab),
        payloadVocab = Some(vocab))
    }
    assert(e.getMessage.contains("token source") ||
      e.getCause.getMessage.contains("token source") ||
      e.getMessage.contains("froze payload mode") ||
      e.getCause.getMessage.contains("froze payload mode"))
    // …and so does a re-keyed catalog (same tokens, different media_ref)
    val e2 = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        nTokensSql = src, payloadVocab = Some(vocab),
        mmCarriageSql = Some(carriage), mmMediaRefSql = "doc_id + 1")
    }
    assert(e2.getMessage.contains("froze payload mode") ||
      e2.getCause.getMessage.contains("froze payload mode"))
    // the mode guard on the READ side: a text reader refuses this store
    val e3 = intercept[IllegalArgumentException] {
      IncrementalPacking.payloadStreams(spark, root)
    }
    assert(e3.getMessage.contains("multimodal"), e3.getMessage)
  }

  test("an mm era migration serves the combined feed with sidecars across eras") {
    import graft.ops.{Packing, Portable}
    val vocab = Portable.subwordVocab
    val vocab2 = Portable.trainedFixtureVocab
    val carriage = Packing.MediaCarriageSql
    val landing0 = Files.createTempDirectory("immera-l0")
    val ckpt0 = Files.createTempDirectory("immera-c0").toString + "/c"
    val root0 = Files.createTempDirectory("immera-r0").toString + "/p"
    val landing1 = Files.createTempDirectory("immera-l1")
    val ckpt1 = Files.createTempDirectory("immera-c1").toString + "/c"
    val root1 = Files.createTempDirectory("immera-r1").toString + "/p"
    val b0 = corpus(0L, 150L)
    val b1 = corpus(150L, 260L)
    landParquet(landing0, "b0.parquet", b0)
    IncrementalPacking.run(spark, landing0.toString, ckpt0, root0, schema,
      nTokensSql = Packing.mmTokensSqlWith(vocab, carriage),
      payloadVocab = Some(vocab), mmCarriageSql = Some(carriage))
    // the retrain ships vocab2; the successor inherits the mm mode but a
    // successor trying to DROP the sidecar refuses
    landParquet(landing1, "b1.parquet", b1)
    val eDrop = intercept[IllegalArgumentException] {
      graft.streaming.PackingMigration.repackUnderVocab(spark, root0,
        root1, landing1.toString, ckpt1, schema, vocab2)
    }
    assert(eDrop.getMessage.contains("SAME mmCarriageSql"), eDrop.getMessage)
    graft.streaming.PackingMigration.repackUnderVocab(spark, root0,
      root1, landing1.toString, ckpt1, schema, vocab2,
      mmCarriageSql = Some(carriage))
    // the combined mm feed: every era's bins exactly once, each equal to
    // its own batch operator under its own vocabulary, sidecars riding
    val feed = graft.streaming.PackingMigration.eraFeedMm(
      spark, Seq(root0, root1), epoch = 1)
    def byEraBin(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("era"), r.getAs[Long]("shard"),
        r.getAs[Long]("bin")) ->
        (r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList,
          r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
            .map(s => (s.getLong(0), s.getLong(1))).toList)).toMap
    val served = byEraBin(feed)
    def batchMm(docs: DataFrame, v: Seq[String], era: Long) =
      Packing.binPayloadsMm(docs, Packing.Shards, v).collect()
        .map(r => (era, r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
          (r.getAs[Long]("bin_tokens"),
            r.getSeq[Long](r.fieldIndex("input_ids")).toList,
            r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
              .map(s => (s.getLong(0), s.getLong(1))).toList)).toMap
    assert(served == batchMm(b0, vocab, 0L) ++ batchMm(b1, vocab2, 1L))
    // each era's bin_tokens is priced in its own unit and equals its
    // served stream's length (placeholders included)
    assert(feed.filter(expr("bin_tokens != size(input_ids)")).count() == 0)
    // a text root cannot sneak into the mm feed
    val landingT = Files.createTempDirectory("immera-lt")
    val ckptT = Files.createTempDirectory("immera-ct").toString + "/c"
    val rootT = Files.createTempDirectory("immera-rt").toString + "/p"
    landParquet(landingT, "b.parquet", corpus(0L, 50L))
    IncrementalPacking.run(spark, landingT.toString, ckptT, rootT, schema,
      nTokensSql = graft.ops.TextAnalysis.subwordCountSqlWith(vocab),
      payloadVocab = Some(vocab))
    val eMix = intercept[IllegalArgumentException] {
      graft.streaming.PackingMigration.eraFeedMm(
        spark, Seq(root0, rootT), 1).collect()
    }
    assert(eMix.getMessage.contains("not an interleaved-multimodal"),
      eMix.getMessage)
  }

  test("the token source freezes at bootstrap; a different source refuses") {
    val landing = Files.createTempDirectory("ipack8-landing")
    val ckpt = Files.createTempDirectory("ipack8-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack8-root").toString + "/p"
    val docs = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", docs)
    // drain under the SUBWORD source: bins equal the batch operator under
    // the same source, and the store records that source's identity
    val sub = graft.ops.TextAnalysis.subwordCountSql
    val bins = IncrementalPacking.run(
      spark, landing.toString, ckpt, root, schema, nTokensSql = sub)
    assert(binTuples(bins) == binTuples(
      Packing.packBins(docs, nTokensSql = sub)))
    assert(IncrementalPacking.storedTokensSource(spark, root)
      .contains(IncrementalPacking.tokensSourceId(sub)))
    // a rebuilt binary continuing this store on the whitespace default
    // would price future bins in a different unit than the cursor
    // history — the drain must refuse, loudly
    landParquet(landing, "b2.parquet", corpus(200L, 300L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    }
    assert(e.getMessage.contains("token source") ||
      e.getCause.getMessage.contains("token source"))
  }

  test("a pre-marker store heals to the whitespace identity and refuses a non-default source") {
    val landing = Files.createTempDirectory("ipack9-landing")
    val ckpt = Files.createTempDirectory("ipack9-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack9-root").toString + "/p"
    landParquet(landing, "b1.parquet", corpus(0L, 100L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    // simulate a store written before the marker existed: only the
    // whitespace default can ever have packed it
    deletePath(IncrementalPacking.tokensSourceMarker(root))
    landParquet(landing, "b2.parquet", corpus(100L, 200L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    assert(IncrementalPacking.storedTokensSource(spark, root)
      .contains(IncrementalPacking.tokensSourceId(
        Packing.WhitespaceTokensSql)),
      "the heal path must record the whitespace identity")
    deletePath(IncrementalPacking.tokensSourceMarker(root))
    landParquet(landing, "b3.parquet", corpus(200L, 300L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        nTokensSql = graft.ops.TextAnalysis.subwordCountSql)
    }
    assert(e.getMessage.contains("whitespace") ||
      e.getCause.getMessage.contains("whitespace"))
  }

  test("the shard count freezes at bootstrap") {
    val landing = Files.createTempDirectory("ipack4-landing")
    val ckpt = Files.createTempDirectory("ipack4-ckpt").toString + "/c"
    val root = Files.createTempDirectory("ipack4-root").toString + "/p"
    landParquet(landing, "b1.parquet", corpus(0L, 100L))
    IncrementalPacking.run(spark, landing.toString, ckpt, root, schema)
    landParquet(landing, "b2.parquet", corpus(100L, 200L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, landing.toString, ckpt, root, schema,
        shards = Packing.Shards * 2)
    }
    assert(e.getMessage.contains("frozen") ||
      e.getMessage.contains("stored count") ||
      e.getCause.getMessage.contains("stored count"))
  }
}
