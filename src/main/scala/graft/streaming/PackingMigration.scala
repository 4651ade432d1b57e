package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

import graft.ops.{Packing, Portable, TextAnalysis}

/** The vocabulary-retrain → packing-root migration, OPERATED — the
  * deployment answer [[SubwordMaintenance]]'s re-pricing caveat names
  * ("a fresh packing root priced in the new unit") walked in code
  * instead of prose. When a retrain ships a new subword inventory, a
  * packing store priced in the old unit correctly REFUSES new batches
  * (the `_tokens_source` guard, [[IncrementalPacking.run]]); what a
  * 100 TB deployment then needs is exactly three moves, each with a
  * failure mode this module makes impossible to fumble:
  *
  *  1. **Stand up the successor root** under the retrained unit
  *     ([[repackUnderVocab]]): fresh root, fresh checkpoint, the NEW
  *     vocabulary as both `n_tokens` source and payload feed, the shard
  *     count and payload-materialization choice INHERITED from the old
  *     root (a migration that silently dropped payloads would starve the
  *     combined feed of the new era's tokens).
  *  2. **Leave the old root alone.** Its shipped bins stay servable
  *     forever — a trainer may hold epoch plans over them — and its
  *     markers keep refusing extension. Nothing here rewrites, re-bins,
  *     or re-prices history; "re-pricing" a corpus is re-CRAWLING it
  *     into the new era, never editing the old one.
  *  3. **Serve the combined trainer feed** ([[eraFeed]]): every bin of
  *     every era exactly once, each priced in its own era's unit
  *     (`bin_tokens` counts old-vocabulary tokens in era 0 rows and
  *     new-vocabulary tokens in era 1 rows — the id spaces are
  *     different languages and are never mixed inside one bin), dealt
  *     to readers by a hash salted with (epoch, era, shard, bin) so two
  *     eras' identical (shard, bin) coordinates never collide.
  *
  * Scale shape: [[eraFeed]] inherits [[Packing.readerFeedFrom]]'s
  * discipline per era — id-width planning stats (column pruning strips
  * the id streams from the deal), payloads crossing exactly ONE
  * exchange each (the per-era fragment concatenation), one id-width
  * union above them. Era count is small by construction (one per
  * retrain, and retrains are drift events, not routine).
  */
object PackingMigration {

  /** Stand up the successor packing root after a vocabulary retrain and
    * drain the landing into it. Refuses the three fumbles:
    *
    *  - a `newRoot` that already has history (this is a STAND-UP, not a
    *    continuation — continuing is [[IncrementalPacking.run]]'s job);
    *  - an `oldRoot` that doesn't exist (nothing to migrate from — a
    *    first root needs no runbook);
    *  - a vocabulary that prices IDENTICALLY to the old root's source
    *    (the retrain was a no-op for packing; a fresh era would split
    *    the corpus across two roots for nothing — keep draining the old
    *    one).
    *
    * The shard count and the payload-materialization choice are
    * inherited from the old root unless overridden, so the era boundary
    * changes exactly ONE thing: the token unit.
    */
  def repackUnderVocab(
      spark: SparkSession,
      oldRoot: String,
      newRoot: String,
      landingDir: String,
      checkpointDir: String,
      schema: StructType,
      vocab: Seq[String],
      shards: Option[Int] = None,
      mmCarriageSql: Option[String] = None,
      mmMediaRefSql: String = Packing.MediaRefSql): DataFrame = {
    val oldShards = IncrementalPacking.storedShards(spark, oldRoot)
    require(oldShards.isDefined,
      s"PackingMigration.repackUnderVocab: no packing store at $oldRoot " +
        "— a first root needs no migration; bootstrap it with " +
        "IncrementalPacking.run")
    require(IncrementalPacking.storedShards(spark, newRoot).isEmpty,
      s"PackingMigration.repackUnderVocab: $newRoot already holds a " +
        "packing store — the successor must be a FRESH root (continuing " +
        "an existing one is IncrementalPacking.run's job, under its own " +
        "markers)")
    // the era boundary changes exactly ONE thing — the token unit — so
    // the payload MODE (none / text / mm-with-this-carriage) must carry
    // over: a successor that silently dropped the sidecar (or sprouted
    // one, or re-keyed the catalog) would starve or desync the combined
    // feed. The old mode decides which run shape is legal here.
    val oldMode = IncrementalPacking.storedPayloadsMode(spark, oldRoot)
      // pre-marker old store: infer exactly as run()'s heal path does
      .getOrElse(if (StoragePaths.exists(
        spark, IncrementalPacking.payloadsPath(oldRoot))) "1" else "0")
    if (oldMode.startsWith("mm:")) {
      require(mmCarriageSql.isDefined &&
        IncrementalPacking.payloadsModeMm(
          mmCarriageSql.get, mmMediaRefSql) == oldMode,
        s"PackingMigration.repackUnderVocab: $oldRoot froze interleaved-" +
          s"multimodal payload mode '$oldMode' — the successor must pass " +
          "the SAME mmCarriageSql/mmMediaRefSql (an era re-prices the " +
          "token unit, it does not re-key the media catalog)")
    } else {
      require(mmCarriageSql.isEmpty,
        s"PackingMigration.repackUnderVocab: $oldRoot froze payload mode " +
          s"'$oldMode' (no media sidecar) — a successor must not sprout " +
          "one mid-corpus; stand up an mm deployment from its first root")
    }
    val newSrc = mmCarriageSql.fold(TextAnalysis.subwordCountSqlWith(vocab))(
      c => Packing.mmTokensSqlWith(vocab, c))
    val newId = IncrementalPacking.tokensSourceId(newSrc)
    require(!IncrementalPacking.storedTokensSource(spark, oldRoot)
      .contains(newId),
      s"PackingMigration.repackUnderVocab: the vocabulary prices " +
        s"identically to $oldRoot's stored token source ($newId) — " +
        "nothing re-priced, so keep draining the old root instead of " +
        "splitting the corpus across a pointless era boundary")
    IncrementalPacking.run(
      spark, landingDir, checkpointDir, newRoot, schema,
      shards = shards.orElse(oldShards).get,
      nTokensSql = newSrc,
      payloadVocab = if (oldMode != "0") Some(vocab) else None,
      mmCarriageSql = mmCarriageSql,
      mmMediaRefSql = mmMediaRefSql)
  }

  /** The era audit surface: one local row per root —
    * `(era, root, tokens_source, shards, budget, payloads_enabled,
    * latest_batch)` — what an operator reads before touching a
    * multi-era deployment. Driver-held (era count ≈ retrain count).
    */
  def eraManifest(spark: SparkSession, roots: Seq[String])
      : Seq[(Int, String, String, Int, Int, Boolean, Option[Long])] =
    roots.zipWithIndex.map { case (r, i) =>
      (i, r,
        IncrementalPacking.storedTokensSource(spark, r).getOrElse("?"),
        IncrementalPacking.storedShards(spark, r).getOrElse(-1),
        IncrementalPacking.storedBudget(spark, r).getOrElse(-1),
        IncrementalPacking.storedPayloadsEnabled(spark, r)
          .getOrElse(false),
        IncrementalPacking.latestBinsBatch(spark, r))
    }

  /** The combined multi-era payload relation: every era's
    * [[IncrementalPacking.payloadStreams]] pinned at its own latest bins
    * batch, keyed by the era index — `(era, shard, bin, n_docs,
    * bin_tokens, input_ids)`. Refuses a root without payload
    * materialization: its bins would silently vanish from the feed (the
    * exact desync the `_payloads` marker exists to make loud).
    */
  def eraPayloadStreams(spark: SparkSession, roots: Seq[String],
      pins: Seq[Option[Long]] = Seq.empty): DataFrame = {
    require(roots.nonEmpty, "PackingMigration.eraPayloadStreams: no roots")
    require(pins.isEmpty || pins.size == roots.size,
      "PackingMigration.eraPayloadStreams: pass one pin per root or none")
    roots.zipWithIndex.map { case (r, i) =>
      require(IncrementalPacking.storedPayloadsEnabled(spark, r)
        .contains(true) ||
        StoragePaths.exists(spark, IncrementalPacking.payloadsPath(r)),
        s"PackingMigration.eraPayloadStreams: root $r has no payload " +
          "fragments — its bins would silently vanish from the combined " +
          "feed; migrate payload-enabled roots only")
      val pin = if (pins.isEmpty) {
        IncrementalPacking.latestBinsBatch(spark, r)
      } else pins(i)
      IncrementalPacking.payloadStreams(spark, r, pin)
        .withColumn("era", lit(i.toLong))
    }.reduce(_.unionByName(_))
  }

  /** The combined trainer-reader fetch over every era: each era's bins
    * dealt and served exactly once, `(era, reader, reader_pos, shard,
    * bin, n_docs, bin_tokens, input_ids)`. The deal hash is salted with
    * the ERA as well as (epoch, shard, bin) — two eras hold overlapping
    * (shard, bin) coordinates by construction (each root's bins start at
    * 0), so an era-blind hash would deal colliding coordinates to the
    * same slot. `reader_pos` is a position in the MERGED stream: one
    * training loop reads all eras as one corpus, each row priced in its
    * own era's unit.
    */
  def eraFeed(spark: SparkSession, roots: Seq[String], epoch: Int,
      readers: Int = Packing.Readers,
      pins: Seq[Option[Long]] = Seq.empty): DataFrame =
    eraDealFetch(eraPayloadStreams(spark, roots, pins), epoch, readers,
      Seq("input_ids"))

  /** [[eraFeed]] in the battery's checked string form. */
  def eraFeedChecked(spark: SparkSession, roots: Seq[String], epoch: Int,
      readers: Int = Packing.Readers): DataFrame =
    eraFeed(spark, roots, epoch, readers)
      .selectExpr("era", "reader", "reader_pos", "shard", "bin", "n_docs",
        "bin_tokens", "order_hash",
        "array_join(input_ids, '-') AS input_ids_str")

  /** The combined MULTIMODAL multi-era payload relation —
    * [[eraPayloadStreams]] over mm roots, sidecar included. Each root's
    * own mode guard ([[IncrementalPacking.payloadStreamsMm]]) refuses a
    * text root: a feed mixing sidecar-less eras into a vision-language
    * loader would starve it silently.
    */
  def eraPayloadStreamsMm(spark: SparkSession, roots: Seq[String],
      pins: Seq[Option[Long]] = Seq.empty): DataFrame = {
    require(roots.nonEmpty, "PackingMigration.eraPayloadStreamsMm: no roots")
    require(pins.isEmpty || pins.size == roots.size,
      "PackingMigration.eraPayloadStreamsMm: pass one pin per root or none")
    roots.zipWithIndex.map { case (r, i) =>
      require(IncrementalPacking.storedPayloadsMode(spark, r)
        .exists(_.startsWith("mm:")),
        s"PackingMigration.eraPayloadStreamsMm: root $r is not an " +
          "interleaved-multimodal store — its bins carry no sidecar; " +
          "serve text roots with eraPayloadStreams")
      val pin = if (pins.isEmpty) {
        IncrementalPacking.latestBinsBatch(spark, r)
      } else pins(i)
      IncrementalPacking.payloadStreamsMm(spark, r, pin)
        .withColumn("era", lit(i.toLong))
    }.reduce(_.unionByName(_))
  }

  /** The MULTIMODAL combined trainer-reader fetch — [[eraFeed]] with the
    * `(slot, media_ref)` sidecar riding each era's one payload join:
    * `(era, reader, reader_pos, …, input_ids, media_slots)`, every era's
    * bins exactly once under the era-salted deal, each priced (and
    * placeholder-interleaved) in its own era's unit.
    */
  def eraFeedMm(spark: SparkSession, roots: Seq[String], epoch: Int,
      readers: Int = Packing.Readers,
      pins: Seq[Option[Long]] = Seq.empty): DataFrame =
    eraDealFetch(eraPayloadStreamsMm(spark, roots, pins), epoch, readers,
      Seq("input_ids", "media_slots"))

  /** [[eraFeedMm]] in the battery's checked string form — ids joined
    * '-', slots as '-'-joined `slot:media_ref` pairs in slot order (the
    * [[graft.ops.Packing.binPayloadsMmChecked]] convention).
    */
  def eraFeedMmChecked(spark: SparkSession, roots: Seq[String], epoch: Int,
      readers: Int = Packing.Readers): DataFrame =
    eraFeedMm(spark, roots, epoch, readers)
      .selectExpr("era", "reader", "reader_pos", "shard", "bin", "n_docs",
        "bin_tokens", "order_hash",
        "array_join(input_ids, '-') AS input_ids_str",
        "array_join(transform(media_slots, s -> concat(" +
          "CAST(s.slot AS STRING), ':', CAST(s.media_ref AS STRING))), " +
          "'-') AS media_slots_str")

  /** The era-salted deal + single payload fetch under [[eraFeed]] /
    * [[eraFeedMm]] — ONE spelling of the multi-era serving math, so the
    * text and mm feeds cannot drift. The planning leg is id-width (column
    * pruning strips `payloadCols` from the deal, exactly as in
    * [[Packing.readerFeedFrom]]); the payload columns cross the one fetch
    * join together.
    */
  private def eraDealFetch(payloads: DataFrame, epoch: Int, readers: Int,
      payloadCols: Seq[String]): DataFrame = {
    require(epoch >= 0, s"eraFeed: epoch must be non-negative, got $epoch")
    require(readers > 0, s"eraFeed: readers must be positive, got $readers")
    val plan = payloads
      .select("era", "shard", "bin", "n_docs", "bin_tokens")
      .withColumn("order_hash", expr(Portable.hexcastSpark(
        s"concat('epoch:$epoch:', CAST(era AS STRING), ':', " +
          "CAST(shard AS STRING), ':', CAST(bin AS STRING))")))
      .withColumn("reader", col("order_hash") % readers)
      .withColumn("reader_pos", row_number().over(
        Window.partitionBy("reader")
          .orderBy("order_hash", "era", "shard", "bin"))
        .cast("long"))
    plan
      .join(payloads.select(
        (Seq("era", "shard", "bin") ++ payloadCols).map(col): _*),
        Seq("era", "shard", "bin"))
      .select((Seq("era", "reader", "reader_pos", "shard", "bin", "n_docs",
        "bin_tokens", "order_hash") ++ payloadCols).map(col): _*)
  }
}
