package graft

import org.apache.spark.sql.functions._

import graft.ops.Packing
import graft.testdata.{TestFixtures => T}

/** Sequence packing (graft.ops.Packing) properties beyond the sf oracle:
  * agreement with an independent sequential packing per shard, the
  * bounded-overflow invariant, offset bounds, and token conservation.
  */
class PackingSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  test("bin assignment matches an independent per-shard sequential scan") {
    val rows = Packing.packBins(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"),
          r.getAs[Long]("bin_offset"))).toMap
    rows.keys.groupBy(_._1).foreach { case (shard, keys) =>
      var cum = 0L
      keys.toSeq.sortBy(_._2).foreach { case k @ (_, _) =>
        val (n, bin, off) = rows(k)
        val start = cum
        assert(bin == start / Packing.Budget, s"bin mismatch at $k")
        assert(off == start - bin * Packing.Budget, s"offset mismatch at $k")
        cum = start + n
      }
      assert(shard >= 0 && shard < Packing.Shards)
    }
  }

  test("packing on subword counts: the opt-in n_tokens source feeds the same math") {
    // the budget that matters to a trainer meters SUBWORD tokens — the
    // packing math is source-agnostic, so swapping the counter must keep
    // every bin/offset invariant while re-sizing each document
    val b = Packing.packBins(docs,
      nTokensSql = graft.ops.TextAnalysis.subwordCountSql)
    val subCounts = graft.ops.TextAnalysis.subwordTokens(docs)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    val rows = b.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("doc_id")) ->
        (r.getAs[Long]("n_tokens"), r.getAs[Long]("bin"),
          r.getAs[Long]("bin_offset"))).toMap
    assert(rows.nonEmpty)
    // every document is sized by its subword count, not the whitespace proxy
    rows.foreach { case ((_, id), (n, _, _)) =>
      assert(n == subCounts(id), s"doc $id not sized by subword count") }
    // and the sequential-scan invariant holds on the new sizes
    rows.keys.groupBy(_._1).foreach { case (_, keys) =>
      var cum = 0L
      keys.toSeq.sortBy(_._2).foreach { k =>
        val (n, bin, off) = rows(k)
        assert(bin == cum / Packing.Budget && off == cum - bin * Packing.Budget,
          s"invariant broke at $k")
        cum += n
      }
    }
  }

  test("bin payloads: sized by their own ids, concatenated in doc order") {
    import graft.ops.{Portable, TextAnalysis}
    val payloads = Packing.binPayloads(docs).collect()
    assert(payloads.nonEmpty)
    // the payload length IS the bin's token total (one kernel prices and
    // encodes), and bins agree with packBins under the same source
    payloads.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("input_ids")).size.toLong ==
        r.getAs[Long]("bin_tokens"), s"payload/size drift at $r")
    }
    val binsByKey = Packing.packBins(docs,
        nTokensSql = TextAnalysis.subwordCountSql)
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens"))
      .collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"))).toMap
    payloads.foreach { r =>
      val k = (r.getAs[Long]("shard"), r.getAs[Long]("bin"))
      assert(binsByKey(k) ==
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens")),
        s"payload bin $k disagrees with packBins")
    }
    // per-document concatenation order: a bin's stream equals its member
    // docs' own id streams joined in doc_id order
    val perDoc = docs.selectExpr("doc_id",
        s"${TextAnalysis.subwordIdsSqlWith(Portable.subwordVocab)} AS ids")
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1).toList).toMap
    val members = Packing.packBins(docs,
        nTokensSql = TextAnalysis.subwordCountSql)
      .collect()
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    payloads.foreach { r =>
      val k = (r.getAs[Long]("shard"), r.getAs[Long]("bin"))
      val want = members(k).map(_.getAs[Long]("doc_id")).sorted
        .flatMap(perDoc(_)).toList
      assert(r.getSeq[Long](r.fieldIndex("input_ids")).toList == want,
        s"payload order drift at bin $k")
    }
  }

  test("offsets stay inside the budget; bins are dense from 0 per shard") {
    val b = Packing.packBins(docs)
    assert(b.filter(col("bin_offset") < 0 ||
      col("bin_offset") >= Packing.Budget).count() == 0)
    // density needs every doc shorter than the budget (a budget-exceeding
    // doc's span can swallow a whole bin interval) — true of the fixture
    assert(b.agg(max("n_tokens")).head().getLong(0) < Packing.Budget)
    // then a span crosses every budget boundary, so bin ids per shard are
    // the contiguous range [0, max]
    b.groupBy("shard").agg(
        min("bin").as("lo"), max("bin").as("hi"),
        countDistinct("bin").as("nb"))
      .collect().foreach { r =>
        assert(r.getAs[Long]("lo") == 0L)
        assert(r.getAs[Long]("nb") == r.getAs[Long]("hi") + 1)
      }
  }

  test("epoch plan: a seeded permutation of the bins into contiguous reader streams") {
    val bins = Packing.packBins(docs).select("shard", "bin").distinct().collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def plan(epoch: Int) = Packing.epochPlan(docs, epoch).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("order_hash"),
          r.getAs[Long]("reader_pos"))).toMap
    val p1 = plan(1)
    // totality: every packed bin is dealt exactly once
    assert(p1.keySet == bins)
    // pure function of (epoch, shard, bin): re-planning is bit-identical
    assert(plan(1) == p1)
    // reader streams are contiguous 1..k and ordered by the salted hash
    p1.values.groupBy(_._1).foreach { case (reader, rows) =>
      assert(reader >= 0 && reader < Packing.Readers)
      val byPos = rows.toSeq.sortBy(_._3)
      assert(byPos.map(_._3) == (1L to rows.size.toLong))
      assert(byPos.map(_._2) == byPos.map(_._2).sorted)
    }
    // a different epoch draws a different permutation (same bins, at
    // least one moved position or reader) — the salt carries the epoch
    val p2 = plan(2)
    assert(p2.keySet == bins)
    assert(p1 != p2, "epochs must not repeat the same order")
    // the dealing is hash-spread, not degenerate: more than one reader
    // is actually used on the fixture
    assert(p1.values.map(_._1).toSet.size > 1)
  }

  test("epochPlanFrom over a materialized bin relation ≡ epochPlan(docs)") {
    // the bin seam: a multi-epoch run derives the bin relation once (the
    // only text pass) and plans every epoch from the stored rows — the
    // plan must be bit-identical to the one-shot sugar, for any epoch
    val dir = java.nio.file.Files.createTempDirectory("pack-binseam").toString
    Packing.packBins(docs).write.mode("overwrite").parquet(dir)
    val stored = spark.read.parquet(dir)
    def key(r: org.apache.spark.sql.Row) = (
      r.getAs[Long]("shard"), r.getAs[Long]("bin")) -> (
      r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
      r.getAs[Long]("reader"), r.getAs[Long]("order_hash"),
      r.getAs[Long]("reader_pos"))
    Seq(1, 2, 7).foreach { epoch =>
      val viaSeam = Packing.epochPlanFrom(stored, epoch).collect().map(key).toMap
      val viaDocs = Packing.epochPlan(docs, epoch).collect().map(key).toMap
      assert(viaSeam == viaDocs, s"epoch $epoch diverged across entry points")
    }
  }

  test("interleaved multimodal packing conserves slots and refs") {
    val rows = Packing.binPayloadsMm(docs).collect()
    val carriers = docs.filter(expr(Packing.MediaCarriageSql))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    var slotTotal = 0L
    val refs = scala.collection.mutable.Set.empty[Long]
    rows.foreach { r =>
      val ids = r.getSeq[Long](r.fieldIndex("input_ids"))
      val slots = r.getSeq[org.apache.spark.sql.Row](
        r.fieldIndex("media_slots"))
      // every sidecar slot indexes a placeholder cell of THIS bin's
      // concatenated stream — the stream-relative offset contract
      slots.foreach { s =>
        val off = s.getAs[Long]("slot")
        assert(off >= 0 && off < ids.size, s"slot $off out of stream")
        assert(ids(off.toInt) == Packing.MediaSlotId,
          s"slot $off does not point at a placeholder")
        refs += s.getAs[Long]("media_ref")
      }
      // slot conservation per bin: sidecar entries == placeholder cells
      assert(slots.size.toLong ==
        ids.count(_ == Packing.MediaSlotId).toLong,
        s"bin (${r.getAs[Long]("shard")},${r.getAs[Long]("bin")}) " +
          "sidecar != placeholders")
      // the budget prices the placeholders: stream length == bin_tokens
      assert(ids.size.toLong == r.getAs[Long]("bin_tokens"))
      slotTotal += slots.size
    }
    // global conservation: one slot per carrier document, refs exact
    assert(slotTotal == carriers.size.toLong)
    assert(refs.toSet == carriers)
    // every ref resolves in the media catalog (the payload fetch key)
    val catalog = graft.ops.Multimodal.catalog(docs)
      .select("media_id").collect().map(_.getLong(0)).toSet
    assert(refs.subsetOf(catalog))
  }

  test("reader feed: the fetch serves every planned bin its own payload") {
    val payloads = Packing.binPayloads(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    // the plan the feed must agree with: epochPlanFrom over the SAME
    // subword-sized bins the payloads were packed under
    val plan = Packing.epochPlanFrom(
      Packing.packBins(docs,
        nTokensSql = graft.ops.TextAnalysis.subwordCountSql), 1).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"))).toMap
    def feed(epoch: Int) = Packing.readerFeed(docs, epoch).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    val f1 = feed(1)
    // feed rows ≡ plan rows: every planned bin served exactly once, at
    // the plan's own (reader, reader_pos)
    assert(f1.keySet == plan.keySet)
    f1.foreach { case (k, (reader, pos, nDocs, binTokens, ids)) =>
      assert((reader, pos) == plan(k), s"deal diverged at $k")
      val (pDocs, pTokens, pIds) = payloads(k)
      assert((nDocs, binTokens, ids) == (pDocs, pTokens, pIds),
        s"payload diverged at $k")
      assert(ids.size.toLong == binTokens, s"id count != bin_tokens at $k")
    }
    // epoch independence: the served bytes are identical across epochs,
    // only (reader, reader_pos) re-deal
    val f2 = feed(2)
    assert(f2.keySet == f1.keySet)
    assert(f1.view.mapValues(v => (v._3, v._4, v._5)).toMap ==
      f2.view.mapValues(v => (v._3, v._4, v._5)).toMap)
    assert(f1.view.mapValues(v => (v._1, v._2)).toMap !=
      f2.view.mapValues(v => (v._1, v._2)).toMap)
  }

  test("multimodal reader feed serves ids and sidecar through one fetch") {
    def slotKey(r: org.apache.spark.sql.Row) =
      r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
        .map(s => (s.getAs[Long]("slot"), s.getAs[Long]("media_ref")))
        .toList
    val payloads = Packing.binPayloadsMm(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getSeq[Long](r.fieldIndex("input_ids")).toList, slotKey(r)))
      .toMap
    val feed = Packing.readerFeedMm(docs).collect()
    // the fetch serves every mm bin exactly once, ids AND sidecar
    // byte-identical to the payload relation's own rows
    assert(feed.map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
      .toSet == payloads.keySet)
    assert(feed.length == payloads.size)
    feed.foreach { r =>
      val k = (r.getAs[Long]("shard"), r.getAs[Long]("bin"))
      assert((r.getSeq[Long](r.fieldIndex("input_ids")).toList,
        slotKey(r)) == payloads(k), s"payload or sidecar diverged at $k")
    }
    // the deal is the SAME hash/deal as the text-only feed over the same
    // bin stats (mm bins differ from plain bins — the placeholders price
    // — so compare against dealEpoch over the mm relation via reader_pos
    // contiguity per reader)
    feed.groupBy(_.getAs[Long]("reader")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("reader_pos")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }
  }

  test("media byte fetch resolves every slot against the catalog; carriage is a parameter") {
    val media = graft.ops.Multimodal.media(docs)
    val feed = Packing.readerFeedMm(docs).localCheckpoint()
    val fetched = Packing.fetchMediaPayloads(feed, media).collect()
    // one byte-fetch row per sidecar slot, keyed exactly by the feed
    val slotCount = feed.agg(sum(size(col("media_slots")))).head().getLong(0)
    assert(fetched.length.toLong == slotCount)
    // the BYTES are the catalog's, slot-for-slot: fingerprint both sides
    val catMd5 = media.selectExpr("media_id",
      "md5(lower(hex(payload))) AS m").collect()
      .map(r => r.getLong(0) -> r.getString(1)).toMap
    fetched.foreach { r =>
      val got = java.security.MessageDigest.getInstance("MD5")
        .digest(org.apache.commons.codec.binary.Hex.encodeHexString(
          r.getAs[Array[Byte]]("payload")).getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(got == catMd5(r.getAs[Long]("media_ref")),
        s"bytes diverged for ref ${r.getAs[Long]("media_ref")}")
      assert(r.getAs[Long]("n_bytes") ==
        r.getAs[Array[Byte]]("payload").length.toLong)
    }
    // carriage is a PARAMETER, not the fixture rule: a data-driven
    // predicate + ref expression re-route the sidecar without edits
    val alt = Packing.binPayloadsMm(docs, vocab = graft.ops.Portable
      .subwordVocab, carriageSql = "doc_id % 5 = 1",
      mediaRefSql = "doc_id * 10")
    val altSlots = alt.select(explode(col("media_slots")).as("s"))
      .select("s.media_ref").collect().map(_.getLong(0)).toSet
    val altCarriers = docs.filter("doc_id % 5 = 1")
      .select((col("doc_id") * 10).as("r")).collect().map(_.getLong(0)).toSet
    assert(altSlots == altCarriers)
    // and the alternative carriage still prices its placeholders
    assert(alt.filter(expr("bin_tokens != size(input_ids)")).count() == 0)
  }

  test("bucketed catalog store: pruned fetch ≡ relation fetch") {
    import graft.streaming.MediaCatalogStore
    val root = java.nio.file.Files.createTempDirectory("mcat").toString
    val media = graft.ops.Multimodal.media(docs)
    MediaCatalogStore.write(media, root, buckets = 64)
    // a small position window of one reader — the loader shape the
    // pruning exists for (a full-epoch fetch reads every byte either way)
    val window = Packing.readerFeedMm(docs)
      .filter(col("reader") === 0 && col("reader_pos") <= 3)
      .localCheckpoint()
    def rows(df: org.apache.spark.sql.DataFrame) = df.selectExpr(
      "reader", "reader_pos", "slot", "media_ref", "media_type", "n_bytes",
      "md5(lower(hex(payload))) AS m").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getString(4), r.getLong(5), r.getString(6))).toSet
    val viaStore = MediaCatalogStore.fetch(spark, root, window)
    assert(rows(viaStore) == rows(
      Packing.fetchMediaPayloads(window, media)))
    // the store read is PRUNED: the window's refs touch a strict subset
    // of the catalog's bucket partitions (input_file_name reflects the
    // files actually scanned AFTER partition pruning; .inputFiles would
    // list the unpruned relation)
    def scannedBuckets(df: org.apache.spark.sql.DataFrame) =
      df.select(input_file_name().as("f")).distinct().collect()
        .map(_.getString(0).split("/id_bucket=")(1).split("/")(0)).toSet
    val touched = scannedBuckets(
      MediaCatalogStore.touchedCatalog(spark, root, window))
    val all = scannedBuckets(
      spark.read.parquet(MediaCatalogStore.mediaPath(root)))
    assert(touched.subsetOf(all) && touched.size < all.size,
      s"expected a pruned probe, touched ${touched.size}/${all.size}")
  }

  test("bin manifest: spans tile each bin's stream and carve the right ids") {
    val nTok = graft.ops.TextAnalysis.subwordCountSql
    val manifest = Packing.binManifest(docs, nTokensSql = nTok).collect()
      .groupBy(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")))
    val payloads = Packing.binPayloads(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    // the per-doc id streams, for carving checks
    val docIds = docs.selectExpr("doc_id",
      s"${graft.ops.TextAnalysis.subwordIdsSqlWith(
        graft.ops.Portable.subwordVocab)} AS ids").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("ids")).toList).toMap
    assert(manifest.keySet == payloads.keySet)
    manifest.foreach { case (k, rows) =>
      val (binTokens, ids) = payloads(k)
      val spans = rows.map(r => (r.getAs[Long]("span_start"),
        r.getAs[Long]("span_len"), r.getAs[Long]("doc_id")))
        .sortBy(_._1)
      // spans TILE the stream: contiguous from 0, summing to bin_tokens
      assert(spans.head._1 == 0L, s"first span of $k starts at 0")
      spans.sliding(2).foreach {
        case Array((s0, l0, _), (s1, _, _)) => assert(s0 + l0 == s1,
          s"spans of $k must be contiguous")
        case _ => ()
      }
      assert(spans.map(_._2).sum == binTokens)
      assert(binTokens.toInt == ids.size)
      // and each span carves exactly its document's id stream
      spans.foreach { case (start, len, docId) =>
        assert(ids.slice(start.toInt, (start + len).toInt) ==
          docIds(docId), s"span of doc $docId in $k carves wrong ids")
      }
    }
    // the mm sidecar is the manifest restricted to carriers: each
    // carrier's slot == its span_start under the mm pricing unit
    val mmManifest = Packing.binManifest(docs,
      nTokensSql = Packing.mmTokensSqlWith(graft.ops.Portable.subwordVocab))
      .filter(expr(Packing.MediaCarriageSql)).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[Long]("doc_id")) -> r.getAs[Long]("span_start")).toMap
    val mmSlots = Packing.binPayloadsMm(docs)
      .select(col("shard"), col("bin"), explode(col("media_slots")).as("s"))
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin"),
        r.getAs[org.apache.spark.sql.Row]("s").getAs[Long]("media_ref")) ->
        r.getAs[org.apache.spark.sql.Row]("s").getAs[Long]("slot")).toMap
    assert(mmManifest == mmSlots,
      "carrier span_starts must be exactly the mm sidecar's slots")
    // the composed fetch: spans ride the served rows — every feed row's
    // doc_spans tile ITS OWN input_ids (stream order, exact lengths)
    val feed = Packing.readerFeed(docs).localCheckpoint()
    val withSpans = Packing.feedWithSpans(feed,
      Packing.binManifest(docs, nTokensSql = nTok)).collect()
    assert(withSpans.length.toLong == feed.count())
    withSpans.foreach { r =>
      val ids = r.getSeq[Long](r.fieldIndex("input_ids"))
      val sp = r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("doc_spans"))
        .map(s => (s.getAs[Long]("span_start"), s.getAs[Long]("span_len")))
      assert(sp.head._1 == 0L && sp.map(_._2).sum == ids.size.toLong)
      sp.sliding(2).foreach {
        case Seq((s0, l0), (s1, _)) => assert(s0 + l0 == s1)
        case _ => ()
      }
    }
  }

  test("retraction spans mask exactly the retracted docs' ids in shipped bins") {
    import spark.implicits._
    val nTok = graft.ops.TextAnalysis.subwordCountSql
    val manifest = Packing.binManifest(docs, nTokensSql = nTok)
      .localCheckpoint()
    // ids 0, 9, 18, … retracted; 424242 never packed (the pre-crawl
    // takedown case — the byte ledger's job, zero mask rows here)
    val retract = docs.filter("doc_id % 9 = 0").select("doc_id")
      .unionByName(Seq(424242L).toDF("doc_id"))
    val mask = Packing.retractionSpans(manifest, retract).collect()
    val retractedIds = docs.filter("doc_id % 9 = 0")
      .select("doc_id").collect().map(_.getLong(0)).toSet
    // one mask row per retracted PACKED doc, none for the unpacked one
    assert(mask.map(_.getAs[Long]("doc_id")).toSet == retractedIds)
    // each mask carves exactly its document's id stream out of the
    // served payload — the slice the loader zeroes
    val payloads = Packing.binPayloads(docs).collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        r.getSeq[Long](r.fieldIndex("input_ids")).toList).toMap
    val docIds = docs.selectExpr("doc_id",
      s"${graft.ops.TextAnalysis.subwordIdsSqlWith(
        graft.ops.Portable.subwordVocab)} AS ids").collect()
      .map(r => r.getAs[Long]("doc_id") ->
        r.getSeq[Long](r.fieldIndex("ids")).toList).toMap
    mask.foreach { r =>
      val ids = payloads((r.getAs[Long]("shard"), r.getAs[Long]("bin")))
      val (s0, l0) = (r.getAs[Long]("span_start"), r.getAs[Long]("span_len"))
      assert(ids.slice(s0.toInt, (s0 + l0).toInt) ==
        docIds(r.getAs[Long]("doc_id")))
    }
    // masking never moves a bin: the payload relation is untouched by
    // construction (retractionSpans reads only the manifest)
    assert(mask.nonEmpty)
  }

  test("stats agrees with packBins and conserves tokens; overflow is bounded") {
    val bins = Packing.packBins(docs)
    val st = Packing.stats(docs).collect()
    assert(st.map(_.getAs[Long]("n_docs")).sum == docs.count())
    val totalTokens = bins.agg(sum("n_tokens")).head().getLong(0)
    assert(st.map(_.getAs[Long]("total_tokens")).sum == totalTokens)
    // bounded overflow: every bin holds < budget + its heaviest doc
    val maxDoc = bins.agg(max("n_tokens")).head().getLong(0)
    st.foreach { r =>
      assert(r.getAs[Long]("max_bin_tokens") < Packing.Budget + maxDoc)
    }
  }
}
