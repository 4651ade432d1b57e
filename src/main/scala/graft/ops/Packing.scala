package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Sequence packing — the "example packing" stage between curation and the
  * trainer (T5, Raffel et al. 2020 §2.2; every GPT-style pretraining stack
  * ships one): concatenate documents into fixed-token-budget training
  * sequences so the trainer sees dense batches instead of one padded
  * document per row.
  *
  * Exact first-fit bin packing is a sequential scan — a single stateful
  * pass no engine parallelizes. The distributed spelling here is
  * BOUNDED-OVERFLOW CONTIGUOUS packing:
  *
  *  1. hash-shard documents into [[Shards]] independent streams (the
  *     parallel unit — one window partition each, never a global sort);
  *  2. within a shard, order by `doc_id` and take the running token sum;
  *  3. a document lands in the bin where its span STARTS:
  *     `bin = floor((cum − n_tokens) / budget)`.
  *
  * Every bin then holds ≤ budget + (max document tokens − 1): a document
  * that straddles a boundary overflows its bin by less than its own length,
  * and [[stats]] reports exactly how many bins overflow and by how much —
  * the fill/waste calibration surface. This is the standard trade: exact
  * packing is O(corpus) sequential; bounded-overflow packing is one
  * partitioned window, and the trainer's loader clips or wraps the tail
  * tokens of an overflowing bin (the T5 "pack then split" recipe).
  *
  * Scale sizing: [[Shards]] is the knob a 100 TB run sets to
  * `corpus_tokens / tokens_per_shard_target` so one shard's id+length rows
  * (16 B/doc — the window never carries text) fit one task comfortably;
  * the fixture default keeps a few hundred docs per shard at sf0.01. The
  * window carries ONLY (doc_id, n_tokens) — text is projected away before
  * the shuffle, so the sort pays id-width bytes, not corpus bytes.
  *
  * Reference scope: the reference pipeline stops at mart tables; packing is
  * part of the LLM-training-data extension surface.
  */
object Packing {

  /** Token budget per packed sequence (a 2k-context trainer row). */
  val Budget = 2048
  /** Hash shards — the independent packing streams (see scale sizing). */
  val Shards = 8

  /** The default `n_tokens` source: whitespace token counts (the
    * [[TextAnalysis]] convention). A trainer whose budget meters SUBWORD
    * tokens — the count that actually prices CJK/code/URL-heavy documents
    * — passes [[TextAnalysis.subwordCountSql]] instead (the native greedy
    * WordPiece kernel); the packing math is source-agnostic.
    */
  val WhitespaceTokensSql: String = s"CAST(size($tokensSpark) AS BIGINT)"

  /** The shard-hash projection — the ONE spelling of how a document is
    * routed to its packing stream, shared by [[sized]] (and through it
    * every bin assignment, batch and incremental) and [[binPayloads]]'
    * payload leg. A salt or expression change here changes BOTH or
    * neither; a re-spelled copy could silently desync the payload feed
    * from the bin assignments with only test-level detection.
    */
  private def shardSql(shards: Int): String =
    s"${hexcastSpark("concat('pack:', CAST(doc_id AS STRING))")} % $shards"

  /** `(doc_id, shard, n_tokens)` — `nTokensSql` counts (see
    * [[WhitespaceTokensSql]]) and the md5 shard assignment. Text is
    * dropped HERE, before any shuffle.
    */
  private[graft] def sized(docs: DataFrame, shards: Int,
      nTokensSql: String = WhitespaceTokensSql): DataFrame =
    docs.selectExpr("doc_id",
      s"${shardSql(shards)} AS shard",
      s"CAST(($nTokensSql) AS BIGINT) AS n_tokens")

  /** Packed assignment `(doc_id, shard, n_tokens, bin, bin_offset)`:
    * `bin` is the shard-local sequence index, `bin_offset` the token
    * position where this document starts inside its bin (an overflowing
    * predecessor pushes it past `Budget` − that is the documented overflow,
    * visible in [[stats]]).
    */
  def packBins(docs: DataFrame, shards: Int = Shards,
      nTokensSql: String = WhitespaceTokensSql): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    sized(docs, shards, nTokensSql)
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / Budget).cast("long"))
      .withColumn("bin_offset",
        (col("cum_tokens") - col("n_tokens")) - col("bin") * Budget)
      .select("doc_id", "shard", "n_tokens", "bin", "bin_offset")
  }

  /** Reader streams per epoch plan (see [[epochPlan]] scale sizing). */
  val Readers = 4

  /** Deterministic EPOCH PLAN over the packed sequences — the serve-to-
    * trainer step every pretraining stack runs after packing (the
    * shard-then-shuffle recipe of tf.data / Megatron-LM data loaders):
    * each epoch, every packed bin is dealt to one of `readers` independent
    * reader streams and given a position inside that stream, with the
    * whole dealing a pure function of `(epoch, shard, bin)` — no RNG, no
    * state. Reproducibility is the point: any reader can be restarted at
    * `reader_pos` k on any host and see the same sequence order, and two
    * epochs draw independent permutations from the same corpus (the salt
    * carries the epoch).
    *
    * Scale sizing: like [[Shards]], `readers` is the knob a real run sets
    * to its data-loader worker count (thousands at 1000-GPU scale), so one
    * reader stream's id-width rows (the window partition) fit one task; a
    * 100 TB corpus at a 2k budget is ~10^10 bins, and 10^4 readers put
    * ~10^6 16-byte rows in a partition. The window input carries ONLY
    * (shard, bin, n_docs, bin_tokens, order_hash) — never documents.
    *
    * Output: `(shard, bin, n_docs, bin_tokens, reader, order_hash,
    * reader_pos)` — `bin_tokens` rides along so the loader can plan
    * clipping (overflow bins, see [[stats]]) without another join.
    */
  def epochPlan(docs: DataFrame, epoch: Int = 1, readers: Int = Readers,
      shards: Int = Shards): DataFrame =
    epochPlanFrom(packBins(docs, shards), epoch, readers)

  /** The bin-relation seam under [[epochPlan]]: plan an epoch from an
    * ALREADY-MATERIALIZED packed-assignment relation — [[packBins]] output
    * or the [[graft.streaming.IncrementalPacking]] bins store (`(doc_id,
    * shard, n_tokens, bin, …)` rows; only `shard`/`bin`/`n_tokens` are
    * consumed). This is the entry point a multi-epoch run uses: the bin
    * relation is derived ONCE per corpus (the only pass that tokenizes
    * text), and each epoch's plan is then a pure id-width aggregation +
    * hash deal over ~16-byte rows — five epochs over a 100 TB corpus pay
    * one text scan, not five. [[epochPlan]] stays as sugar for the
    * one-shot case.
    *
    * Stability contract: the plan is a pure function of (epoch, the bin
    * SET) — `reader_pos` is a row_number inside each reader's partition,
    * so the caller must pin the bin relation per epoch (a store that
    * grows mid-epoch would interleave new bins into the hash order and
    * shift positions of bins already dealt). The incremental store's
    * batch high-water mark is exactly that pin —
    * [[graft.streaming.IncrementalPacking.epochPlanAt]] applies it.
    */
  def epochPlanFrom(bins: DataFrame, epoch: Int = 1,
      readers: Int = Readers): DataFrame =
    dealEpoch(
      bins.groupBy("shard", "bin")
        .agg(count(lit(1)).as("n_docs"), sum("n_tokens").as("bin_tokens")),
      epoch, readers)

  /** The dealing step under [[epochPlanFrom]], over rows ALREADY per
    * (shard, bin) carrying `(n_docs, bin_tokens)` — the seam
    * [[readerFeedFrom]] uses so a plan can be derived from a payload
    * relation's own per-bin rows without re-aggregating doc-level bins.
    * ONE spelling of the salted hash + deal + position, so the plan a
    * trainer fetched payloads under is bit-identical to the plan derived
    * standalone.
    */
  private[graft] def dealEpoch(binStats: DataFrame, epoch: Int,
      readers: Int): DataFrame = {
    require(epoch >= 0, s"epochPlan: epoch must be non-negative, got $epoch")
    require(readers > 0, s"epochPlan: readers must be positive, got $readers")
    binStats
      .withColumn("order_hash", expr(hexcastSpark(
        s"concat('epoch:$epoch:', CAST(shard AS STRING), ':', CAST(bin AS STRING))")))
      .withColumn("reader", col("order_hash") % readers)
      .withColumn("reader_pos", row_number().over(
        Window.partitionBy("reader").orderBy("order_hash", "shard", "bin"))
        .cast("long"))
      .select("shard", "bin", "n_docs", "bin_tokens", "reader",
        "order_hash", "reader_pos")
  }

  /** The trainer-reader FETCH — the one join a training loop actually
    * issues: compose an epoch's plan with the bin payloads so each reader
    * stream serves `(reader, reader_pos) → input_ids` in plan order. The
    * planning side is ID-WIDTH throughout (the deal runs on the payload
    * relation's own `(shard, bin, n_docs, bin_tokens)` stats — never the
    * id streams), and the payload column crosses exactly ONE join: the
    * plan relation keyed back onto `payloads` by (shard, bin), where the
    * payload side's aggregation partitioning is reused (asserted in
    * `PlanSpec`). Epoch-independence is inherited from [[dealEpoch]]:
    * the fetched payload bytes are identical across epochs, only
    * (reader, reader_pos) re-deal.
    *
    * `payloads` is read twice (stats + fetch) — callers pass a persisted
    * or store-backed relation ([[binPayloads]] output or
    * [[graft.streaming.IncrementalPacking.payloadStreams]]).
    */
  def readerFeedFrom(payloads: DataFrame, epoch: Int = 1,
      readers: Int = Readers): DataFrame =
    dealEpoch(payloads.select("shard", "bin", "n_docs", "bin_tokens"),
      epoch, readers)
      .join(payloads.select("shard", "bin", "input_ids"), Seq("shard", "bin"))
      .select("reader", "reader_pos", "shard", "bin", "n_docs",
        "bin_tokens", "order_hash", "input_ids")

  /** Trainer-ready BIN PAYLOADS — the materialization a pretraining
    * loader actually reads: one row per (shard, bin) carrying the
    * concatenated subword token-id stream of its documents in doc_id
    * order, under ONE vocabulary. This is the end of the funnel: the same
    * kernel call prices AND encodes each document
    * (`size(ids)` IS the count — the shared-matchAt contract of
    * [[graft.functions.SubwordIds]]), so `bin_tokens ==
    * size(input_ids)` by construction, never by reconciliation.
    *
    * Scale shape — the payload moves ONCE: the id streams are produced in
    * a narrow projection, exchanged on `shard` for the packing window
    * (the one payload-width shuffle), and the per-bin assembly reuses
    * that exchange — `HashPartitioning(shard)` satisfies the aggregation's
    * `ClusteredDistribution(shard, bin)`, so no second payload movement
    * (asserted in `PlanSpec`). Per-bin state is bounded:
    * [[Budget]] + one document's overflow tokens, the collect-and-sort
    * inside each group is a ≤bin-sized array, and `shards` remains the
    * 100 TB parallelism knob.
    */
  def binPayloads(docs: DataFrame, shards: Int = Shards,
      vocab: Seq[String] = subwordVocab): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .selectExpr(
        "doc_id",
        // [[shardSql]] — the shared routing spelling; the token count is
        // derived from the SAME kernel call that produces the ids
        // (size(ids)), not a second sized() pass, so each document is
        // encoded exactly once
        s"${shardSql(shards)} AS shard",
        s"${TextAnalysis.subwordIdsSqlWith(vocab)} AS ids")
      .withColumn("n_tokens", expr("CAST(size(ids) AS BIGINT)"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / Budget).cast("long"))
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("bin_tokens"),
        // ordered concatenation: collect the bounded per-bin rows, sort
        // by the leading doc_id struct field, flatten the id streams
        flatten(transform(
          array_sort(collect_list(struct(col("doc_id"), col("ids")))),
          x => x.getField("ids"))).as("input_ids"))
  }

  /** [[binPayloads]] in the battery's checked form — the id stream as the
    * canonical '-'-joined string (the [[TextAnalysis.subwordIdsChecked]]
    * convention: the harness canonicalization cannot sort array cells;
    * the join is bijective over the sequence).
    */
  def binPayloadsChecked(docs: DataFrame): DataFrame =
    binPayloadsCheckedFrom(binPayloads(docs))

  /** [[binPayloadsChecked]] over an ALREADY-MATERIALIZED payload relation
    * — the share-one-encode seam for a battery that also serves the
    * trainer feed from the same payloads.
    */
  def binPayloadsCheckedFrom(payloads: DataFrame): DataFrame =
    payloads.selectExpr("shard", "bin", "n_docs", "bin_tokens",
      "array_join(input_ids, '-') AS input_ids_str")

  /** The DEFAULT carriage rule — which documents carry an interleavable
    * media payload — mirroring [[Multimodal.media]]'s type assignment
    * (`doc_id % 3 == 0` ⇒ 'image'): the image-typed documents are the
    * ones a vision-language trainer interleaves. It is a default, not
    * the only behavior: [[binPayloadsMm]] / [[readerFeedMm]] (and the
    * incremental drain) take `carriageSql` / `mediaRefSql` parameters,
    * so a corpus whose carriage is a data column (`media_id IS NOT
    * NULL`, a type flag, …) passes its own predicate and ref expression
    * without touching the operator. The packing math is rule-agnostic.
    */
  val MediaCarriageSql: String = "doc_id % 3 = 0"

  /** The default media-ref expression: the catalog key a bin's sidecar
    * carries per slot. The fixture catalog ([[Multimodal.media]]) keys
    * media by `doc_id`, so the default is the identity; a deployment
    * whose documents reference a separate asset table passes its own
    * BIGINT-valued column expression.
    */
  val MediaRefSql: String = "doc_id"

  /** The `n_tokens` source of an INTERLEAVED multimodal run — the subword
    * count plus one budget token per media placeholder. ONE spelling,
    * shared by [[binPayloadsMm]]'s pricing and
    * [[graft.streaming.IncrementalPacking]]'s mm drain (whose
    * `_tokens_source` marker freezes it, carriage predicate included):
    * media costs context, so a carrier document prices its placeholder
    * exactly as the interleaved id stream carries it.
    */
  def mmTokensSqlWith(vocab: Seq[String],
      carriageSql: String = MediaCarriageSql): String =
    s"(CASE WHEN ($carriageSql) THEN 1 ELSE 0 END) + " +
      s"(${TextAnalysis.subwordCountSqlWith(vocab)})"

  /** The reserved placeholder id marking a media slot inside an
    * interleaved id stream. Negative by design: real subword ids are
    * ≥ 0 (0 = [UNK]), so the sentinel can never collide and a loader
    * indexing a slot that is NOT `-1` knows the feed is corrupt.
    */
  val MediaSlotId: Long = -1L

  /** [[binPayloads]] with the MEDIA LEG — interleaved multimodal packing,
    * the trainer feed of a vision-language run: documents carrying media
    * ([[MediaCarriageSql]]) contribute one [[MediaSlotId]] placeholder at
    * the HEAD of their id stream (the image-first interleaving
    * convention), the placeholder occupies one token of the bin budget
    * (media costs context, so it must price), and each bin rides a
    * SIDECAR `media_slots` array of `(slot, media_ref)` structs — `slot`
    * indexes the bin's concatenated `input_ids` (always a [[MediaSlotId]]
    * cell), `media_ref` keys [[Multimodal.media]]'s catalog for the
    * payload fetch.
    *
    * The slot offset is STREAM-relative, not budget-relative: a bin whose
    * predecessor overflowed starts its stream at a non-zero span offset,
    * so `slot = bin_offset − min(bin_offset over the bin)` — the span
    * arithmetic stays id-width and the sidecar is derived in the SAME
    * one-exchange aggregation as the payload itself (asserted in
    * `PlanSpec`): no second payload movement, no media bytes moved at all
    * (the sidecar carries refs; payloads stay in the catalog).
    */
  def binPayloadsMm(docs: DataFrame, shards: Int = Shards,
      vocab: Seq[String] = subwordVocab,
      carriageSql: String = MediaCarriageSql,
      mediaRefSql: String = MediaRefSql): DataFrame = {
    val w = Window.partitionBy("shard").orderBy("doc_id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs
      .selectExpr(
        "doc_id",
        s"${shardSql(shards)} AS shard",
        s"${TextAnalysis.subwordIdsSqlWith(vocab)} AS raw_ids",
        s"CAST(($carriageSql) AS BOOLEAN) AS has_media",
        s"CAST(($mediaRefSql) AS BIGINT) AS media_ref")
      // the interleave: one kernel call (raw_ids is a column ref in both
      // branches), placeholder prepended only for carriers
      .withColumn("ids",
        when(col("has_media"),
          concat(array(lit(MediaSlotId)), col("raw_ids")))
          .otherwise(col("raw_ids")))
      .withColumn("n_tokens", expr("CAST(size(ids) AS BIGINT)"))
      .withColumn("cum_tokens", sum("n_tokens").over(w))
      .withColumn("bin",
        floor((col("cum_tokens") - col("n_tokens")) / Budget).cast("long"))
      .withColumn("bin_offset",
        (col("cum_tokens") - col("n_tokens")) - col("bin") * Budget)
      .groupBy("shard", "bin")
      .agg(
        count(lit(1)).as("n_docs"),
        sum("n_tokens").as("bin_tokens"),
        flatten(transform(
          array_sort(collect_list(struct(col("doc_id"), col("ids")))),
          x => x.getField("ids"))).as("input_ids"),
        min("bin_offset").as("base_off"),
        // collect_list drops the nulls the `when` leaves for non-carriers
        array_sort(collect_list(when(col("has_media"),
          struct(col("bin_offset").as("off"), col("media_ref")))))
          .as("raw_slots"))
      .withColumn("media_slots", expr(
        "transform(raw_slots, s -> named_struct(" +
          "'slot', s.off - base_off, 'media_ref', s.media_ref))"))
      .select("shard", "bin", "n_docs", "bin_tokens", "input_ids",
        "media_slots")
  }

  /** [[binPayloadsMm]] in the battery's checked string form — ids joined
    * '-', slots as '-'-joined `slot:media_ref` pairs in slot order.
    */
  def binPayloadsMmChecked(docs: DataFrame): DataFrame =
    binPayloadsMmCheckedFrom(binPayloadsMm(docs))

  /** [[binPayloadsMmChecked]] over an ALREADY-MATERIALIZED mm payload
    * relation (see [[binPayloadsCheckedFrom]]).
    */
  def binPayloadsMmCheckedFrom(payloads: DataFrame): DataFrame =
    payloads.selectExpr("shard", "bin", "n_docs", "bin_tokens",
      "array_join(input_ids, '-') AS input_ids_str",
      "array_join(transform(media_slots, s -> concat(" +
        "CAST(s.slot AS STRING), ':', CAST(s.media_ref AS STRING))), '-')" +
        " AS media_slots_str")

  /** [[readerFeedFrom]] over a corpus in one call — tokenize + pack +
    * deal + fetch. The payload relation is materialized ONCE (persist,
    * the [[graft.ops.Dedup.minhashPairs]] shared-relation discipline):
    * both the stats leg and the fetch leg read the cache, so the corpus
    * is encoded exactly once, not once per leg.
    */
  def readerFeed(docs: DataFrame, epoch: Int = 1, readers: Int = Readers,
      shards: Int = Shards, vocab: Seq[String] = subwordVocab): DataFrame = {
    val payloads = binPayloads(docs, shards, vocab).persist()
    payloads.count()
    Dedup.materializeFreeing(
      readerFeedFrom(payloads, epoch, readers), payloads)
  }

  /** [[readerFeed]] in the battery's checked string form. */
  def readerFeedChecked(docs: DataFrame): DataFrame =
    readerFeedCheckedFrom(readerFeed(docs))

  /** A text feed relation in the battery's checked string form — the
    * [[readerFeedMmCheckedFrom]] convention for the text feed.
    */
  def readerFeedCheckedFrom(feed: DataFrame): DataFrame =
    feed.selectExpr("reader", "reader_pos", "shard", "bin",
      "n_docs", "bin_tokens", "order_hash",
      "array_join(input_ids, '-') AS input_ids_str")

  /** The MULTIMODAL trainer-reader fetch — [[readerFeedFrom]]'s deal and
    * single payload join over [[binPayloadsMm]], with the media sidecar
    * riding the fetch: `(reader, reader_pos) → (input_ids, media_slots)`
    * is what a vision-language loader issues, resolving each slot's
    * `media_ref` against the catalog only for the bins it actually
    * fetches. Same discipline as [[readerFeed]]: the payload relation is
    * materialized once, the deal runs on its id-width stats, and ids +
    * sidecar cross the one fetch join together.
    */
  def readerFeedMm(docs: DataFrame, epoch: Int = 1, readers: Int = Readers,
      shards: Int = Shards, vocab: Seq[String] = subwordVocab,
      carriageSql: String = MediaCarriageSql,
      mediaRefSql: String = MediaRefSql): DataFrame = {
    val payloads =
      binPayloadsMm(docs, shards, vocab, carriageSql, mediaRefSql).persist()
    payloads.count()
    Dedup.materializeFreeing(
      readerFeedMmFrom(payloads, epoch, readers), payloads)
  }

  /** The mm fetch over an ALREADY-MATERIALIZED mm payload relation —
    * [[readerFeedFrom]]'s seam with the sidecar riding the one payload
    * join. ONE spelling, shared by the batch [[readerFeedMm]] and the
    * store-backed [[graft.streaming.IncrementalPacking.readerFeedMm]],
    * so the two feeds cannot drift.
    */
  def readerFeedMmFrom(payloads: DataFrame, epoch: Int = 1,
      readers: Int = Readers): DataFrame =
    dealEpoch(payloads.select("shard", "bin", "n_docs", "bin_tokens"),
      epoch, readers)
      .join(payloads.select("shard", "bin", "input_ids", "media_slots"),
        Seq("shard", "bin"))
      .select("reader", "reader_pos", "shard", "bin", "n_docs",
        "bin_tokens", "order_hash", "input_ids", "media_slots")

  /** An mm feed relation in the battery's checked string form — shared
    * by the one-call [[readerFeedMmChecked]] and the battery's memoized
    * feed (built once, read by the mm-feed row AND the byte-fetch rows).
    */
  def readerFeedMmCheckedFrom(feed: DataFrame): DataFrame =
    feed.selectExpr("reader", "reader_pos", "shard", "bin",
      "n_docs", "bin_tokens", "order_hash",
      "array_join(input_ids, '-') AS input_ids_str",
      "array_join(transform(media_slots, s -> concat(" +
        "CAST(s.slot AS STRING), ':', CAST(s.media_ref AS STRING))), '-')" +
        " AS media_slots_str")

  /** [[readerFeedMm]] in the battery's checked string form. */
  def readerFeedMmChecked(docs: DataFrame): DataFrame =
    readerFeedMmCheckedFrom(readerFeedMm(docs))

  /** The LAST MILE of the vision-language loader — resolve a fetched
    * feed's media refs against the catalog and serve the actual payload
    * BYTES per slot: `(reader, reader_pos, shard, bin, slot, media_ref,
    * media_type, n_bytes, payload)`. This is the join the trainer's data
    * worker issues after [[readerFeedMm]] (or the store-backed feed)
    * hands it `(slot, media_ref)` sidecars; until here the refs were
    * id-width and no media byte had moved.
    *
    * Scale shape: the ref side (the exploded sidecar) is id-width — the
    * feed's `input_ids` are dropped BEFORE the explode, so the join
    * moves media bytes and nothing else, exactly once. Only fetched
    * bins' refs reach the join (inner join on `media_ref`): a reader
    * fetching its own position range probes the catalog for exactly its
    * slots — at full-epoch scale the catalog is read once either way,
    * and AQE picks the broadcast side when the fetched window is small.
    *
    * `catalog` is [[Multimodal.media]]'s shape: `(media_id, media_type,
    * payload, n_bytes, …)` — payload stays an opaque binary column
    * (decode is [[Multimodal.decodeFeatures]]'s seam, downstream).
    */
  def fetchMediaPayloads(feed: DataFrame, catalog: DataFrame): DataFrame =
    feed
      // id-width refs only: the token ids never enter the byte fetch
      .select(col("reader"), col("reader_pos"), col("shard"), col("bin"),
        explode(col("media_slots")).as("s"))
      .select(col("reader"), col("reader_pos"), col("shard"), col("bin"),
        col("s.slot").as("slot"), col("s.media_ref").as("media_ref"))
      .join(catalog.select(col("media_id").as("media_ref"),
        col("media_type"), col("n_bytes"), col("payload")),
        Seq("media_ref"))
      .select("reader", "reader_pos", "shard", "bin", "slot", "media_ref",
        "media_type", "n_bytes", "payload")

  /** A fetched byte feed in the battery's checked form — the payload
    * reported as the md5 of its lowercase hex (the [[Multimodal.catalog]]
    * fingerprint convention: the catalog's payloads are deterministic md5
    * chunks, so the hash check proves the right BYTES landed on the right
    * slot cross-engine). ONE spelling shared by the relation-form row and
    * the store-backed row, so the two cannot drift.
    */
  def bytesChecked(fetched: DataFrame): DataFrame =
    fetched.selectExpr("reader", "reader_pos", "shard", "bin", "slot",
      "media_ref", "media_type", "n_bytes",
      "md5(lower(hex(payload))) AS payload_md5")

  /** [[fetchMediaPayloads]] over [[readerFeedMm]] in the battery's
    * checked form (see [[bytesChecked]]).
    */
  def readerFeedBytesChecked(docs: DataFrame): DataFrame =
    bytesChecked(
      fetchMediaPayloads(readerFeedMm(docs), Multimodal.media(docs)))

  /** The BIN MANIFEST — per-document span coordinates inside each bin's
    * concatenated stream: `(shard, bin, doc_id, span_start, span_len)`,
    * where `span_start` is the document's offset in the bin's
    * `input_ids` (stream-relative: `bin_offset − min(bin_offset over the
    * bin)`, the [[binPayloadsMm]] slot arithmetic applied to EVERY
    * document) and `span_len` its token count in the bin's pricing unit.
    * This is the attention-mask surface a packed trainer needs: cross-
    * document attention masking and per-example position reset both key
    * off exactly these boundaries (the T5 pack-then-mask recipe), and
    * without it a loader can only treat a bin as one undifferentiated
    * stream. The spans TILE the stream by construction — contiguous,
    * non-overlapping, summing to `bin_tokens` — asserted in
    * `PackingSpec` against the payload relation itself.
    *
    * Pass the SAME `nTokensSql` the payload feed prices with (the
    * subword source for [[binPayloads]]-backed feeds, [[mmTokensSqlWith]]
    * for interleaved ones — an mm carrier's span starts AT its
    * placeholder, so `media_slots` are exactly its carriers'
    * `span_start`s). Scale shape: one id-width window over (shard, bin)
    * groups — each group is budget-bounded by construction (a bin holds
    * ≤ budget + overflow tokens), so the per-group buffer is bounded the
    * way the per-query rank windows are, never a hot-key hazard.
    */
  def binManifest(docs: DataFrame, shards: Int = Shards,
      nTokensSql: String = WhitespaceTokensSql): DataFrame =
    manifestFromBins(packBins(docs, shards, nTokensSql))

  /** [[binManifest]] over an ALREADY-MATERIALIZED packed-assignment
    * relation ([[packBins]] output or the
    * [[graft.streaming.IncrementalPacking]] bins store) — the manifest is
    * a pure id-width derivation of the bin coordinates, so a store-backed
    * trainer gets it without touching text.
    */
  def manifestFromBins(bins: DataFrame): DataFrame =
    bins
      .withColumn("base_off", min("bin_offset").over(
        Window.partitionBy("shard", "bin")))
      .select(col("shard"), col("bin"), col("doc_id"),
        (col("bin_offset") - col("base_off")).as("span_start"),
        col("n_tokens").as("span_len"))

  /** The manifest RIDING a fetched feed — compose any reader-feed
    * relation (text or mm, batch or store-backed) with a [[binManifest]]
    * relation so each served row carries its own `doc_spans` array
    * (`(doc_id, span_start, span_len)` structs in stream order): the
    * loader's attention mask arrives WITH the tokens instead of through
    * a join the caller writes. Both sides are keyed by the same
    * (shard, bin) coordinates; the span aggregation is id-width (≤ bin
    * docs per group, budget-bounded), so the join adds no payload
    * movement — the feed's `input_ids` pass through untouched.
    */
  def feedWithSpans(feed: DataFrame, manifest: DataFrame): DataFrame =
    feed.join(
      manifest
        .groupBy("shard", "bin")
        .agg(array_sort(collect_list(struct(
          col("span_start"), col("span_len"), col("doc_id"))))
          .as("raw_spans"))
        .withColumn("doc_spans", expr(
          "transform(raw_spans, s -> named_struct('doc_id', s.doc_id, " +
            "'span_start', s.span_start, 'span_len', s.span_len))"))
        .select("shard", "bin", "doc_spans"),
      Seq("shard", "bin"))

  /** DOCUMENT retraction over SHIPPED bins — the span-side half of the
    * takedown story ([[graft.streaming.MediaCatalogMaintenance.retract]]
    * owns the byte side): packed bins are immutable by design (trainers
    * hold epoch plans over them), so removing a document from a shipped
    * corpus means MASKING its span, not re-packing — the loader zeroes
    * the attention/loss over `[span_start, span_start + span_len)` of
    * the affected (shard, bin) streams. This derives exactly those
    * coordinates from the manifest: one id-width semi-join, no text
    * touched, no bin moved, usable against the batch [[binManifest]] or
    * the store-backed [[graft.streaming.IncrementalPacking.binManifest]]
    * at any pin. Documents to retract that were never packed simply
    * produce no mask rows (the takedown-before-crawl case is the byte
    * ledger's job). Composes with [[feedWithSpans]]: serve the feed with
    * `doc_spans`, mask the rows this relation names.
    */
  def retractionSpans(manifest: DataFrame, ids: DataFrame): DataFrame =
    manifest.join(ids.select("doc_id").distinct(), Seq("doc_id"))
      .select("shard", "bin", "doc_id", "span_start", "span_len")

  /** Fill/waste calibration surface, one row per shard:
    * `(shard, n_docs, n_bins, total_tokens, max_bin_tokens,
    * overflow_bins)` — `overflow_bins` counts bins whose contents exceed
    * [[Budget]] (each by less than one document's length, by
    * construction). Order-independent aggregates only.
    */
  def stats(docs: DataFrame, shards: Int = Shards): DataFrame =
    statsFrom(packBins(docs, shards))

  /** [[stats]] over an ALREADY-MATERIALIZED packed-assignment relation —
    * the [[manifestFromBins]] convention.
    */
  def statsFrom(bins: DataFrame): DataFrame =
    bins
      .groupBy("shard", "bin")
      .agg(count(lit(1)).as("bin_docs"), sum("n_tokens").as("bin_tokens"))
      .groupBy("shard")
      .agg(
        sum("bin_docs").as("n_docs"),
        count(lit(1)).as("n_bins"),
        sum("bin_tokens").as("total_tokens"),
        max("bin_tokens").as("max_bin_tokens"),
        sum(when(col("bin_tokens") > Budget, 1L).otherwise(0L))
          .as("overflow_bins"))
}
