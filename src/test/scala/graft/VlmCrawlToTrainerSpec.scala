package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Multimodal, Packing, Portable}
import graft.streaming.{IncrementalDecontamination, IncrementalPacking, IncrementalQualityFilter, MediaCatalogStore}

/** The VISION-LANGUAGE product claim, walked END TO END — the mm shape of
  * [[CrawlToTrainerSpec]]: one landing dir drains through decontamination
  * → NB quality admission → INTERLEAVED MULTIMODAL packing (placeholders
  * priced, sidecar per bin) in parallel with the media catalog's byte
  * drain, and the trainer's last mile — the store-backed mm feed plus the
  * byte fetch against the PRUNED catalog — equals the batch operators
  * composed over the union corpus, sidecar and bytes included, across two
  * batches plus a whole-pipeline replay. Each family proves drain ≡ batch
  * in isolation; this proves the mm COMPOSITION: the docs a stage admits
  * are exactly what both downstream stores (token bins AND byte catalog)
  * were fed, batch boundaries and all.
  *
  * Fixture constraints inherited from each stage's equality contract:
  * batch splits are doc_id-MONOTONE (packing's cursor continues the
  * shard streams in id order), and the NB twin scores under the STORE's
  * frozen tables (trained on batch 1 — the frozen-estimate contract).
  */
class VlmCrawlToTrainerSpec extends SparkSpec {

  private val Dim = 32
  private val EvalResidues = Seq(31L, 13L)
  private val vocab = Portable.subwordVocab
  private val SeedVocab = Seq("clean", "cite", "prose", "edit", "vet", "ref", "fact", "style")
  private val CrawlVocab = Seq("spam", "click", "win", "free", "buy", "now", "deal", "ad")

  /** One crawl doc: ids ≡ 0 (mod 5) are the curated seed drawing from the
    * seed vocabulary (the NB filter admits exactly these), the rest crawl
    * junk; a one-hot embedding whose residue keys the decontamination
    * eval set; media carriage is the default `doc_id % 3 = 0` rule, so
    * carriers among the admitted docs are the ids ≡ 0 (mod 15).
    */
  private def mkDocs(lo: Long, hi: Long): DataFrame = {
    def arr(ws: Seq[String]) =
      ws.map(w => s"'$w'").mkString("array(", ", ", ")")
    spark.range(lo, hi).select(
      col("id").as("doc_id"),
      col("id").as("vec_id"),
      expr(
        s"""array_join(transform(sequence(0, 5),
           |  i -> element_at(IF(id % 5 = 0, ${arr(SeedVocab)}, ${arr(CrawlVocab)}),
           |                  CAST(pmod(hash(id, i), 8) AS INT) + 1)), ' ')"""
          .stripMargin.replaceAll("\n", " ")).as("text"),
      expr("IF(id % 5 = 0, 'src0', 'srcX')").as("source"),
      expr(s"""transform(sequence(0, ${Dim - 1}),
              |  j -> CAST(CASE WHEN j = id % $Dim THEN 1.0 ELSE 0.0 END
              |       AS FLOAT))""".stripMargin).as("embedding"))
  }

  private def feedRows(df: DataFrame) = df.collect()
    .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
      (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"),
        r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
        r.getSeq[Long](r.fieldIndex("input_ids")).toList,
        r.getSeq[org.apache.spark.sql.Row](r.fieldIndex("media_slots"))
          .map(s => (s.getLong(0), s.getLong(1))).toList)).toMap

  private def byteRows(df: DataFrame) = df.selectExpr(
    "reader", "reader_pos", "shard", "bin", "slot", "media_ref",
    "media_type", "n_bytes", "md5(lower(hex(payload))) AS m").collect()
    .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
      r.getLong(4), r.getLong(5), r.getString(6), r.getLong(7),
      r.getString(8))).toSet

  test("the VLM funnel drains landing→feed→bytes; end state ≡ the composed batch operators") {
    val base = Files.createTempDirectory("vlm2t").toString
    def dir(n: String) = { val d = s"$base/$n"
      Files.createDirectories(java.nio.file.Paths.get(d)); d }
    val (landDc, landNb, landPack, landCat) =
      (dir("land-dc"), dir("land-nb"), dir("land-pack"), dir("land-cat"))
    val (ckDc, ckNb, ckPack, ckCat) =
      (s"$base/ck-dc", s"$base/ck-nb", s"$base/ck-pack", s"$base/ck-cat")
    val (evalPath, flagsPath, cleanPath) =
      (s"$base/eval", s"$base/flags", s"$base/clean")
    val (nbRoot, packRoot, catRoot) =
      (s"$base/nb", s"$base/pack", s"$base/cat")

    val b1 = mkDocs(0L, 180L)
    val b2 = mkDocs(180L, 300L)
    val union = b1.unionAll(b2).localCheckpoint()
    val docsSchema = b1.schema
    val nbSchema = b1.select("doc_id", "text", "source").schema
    val packSchema = b1.select("doc_id", "text").schema
    val nTok = Packing.mmTokensSqlWith(vocab)

    import scala.jdk.CollectionConverters._
    IncrementalDecontamination.registerEvalSet(
      spark.createDataFrame(EvalResidues.map(r =>
        org.apache.spark.sql.Row(9000000L + r,
          (0 until Dim).map(j => if (j == r) 1.0f else 0.0f))).asJava,
        org.apache.spark.sql.types.StructType(Seq(
          org.apache.spark.sql.types.StructField("vec_id",
            org.apache.spark.sql.types.LongType),
          org.apache.spark.sql.types.StructField("embedding",
            org.apache.spark.sql.types.ArrayType(
              org.apache.spark.sql.types.FloatType))))),
      evalPath)

    /** Drain one landed crawl batch through every stage. The admitted
      * stream forks to BOTH trainers' stores: token bins (mm packing)
      * and payload bytes (the media catalog, carriers only — the crawl
      * extracts media from the docs that carry it).
      */
    def drainChain(n: Long, docs: DataFrame): Unit = {
      landParquet(java.nio.file.Paths.get(landDc), s"b$n.parquet", docs)
      IncrementalDecontamination.run(spark, landDc, ckDc, evalPath,
        flagsPath, cleanPath, docsSchema)
      landParquet(java.nio.file.Paths.get(landNb), s"b$n.parquet",
        spark.read.parquet(s"$cleanPath/batch=$n")
          .select("doc_id", "text", "source"))
      IncrementalQualityFilter.run(spark, landNb, ckNb, nbRoot, nbSchema)
      val admitted = spark.read.parquet(
        s"${IncrementalQualityFilter.admittedPath(nbRoot)}/batch=$n")
      landParquet(java.nio.file.Paths.get(landPack), s"b$n.parquet",
        admitted.select("doc_id", "text"))
      IncrementalPacking.run(spark, landPack, ckPack, packRoot, packSchema,
        nTokensSql = nTok, payloadVocab = Some(vocab),
        mmCarriageSql = Some(Packing.MediaCarriageSql))
      landParquet(java.nio.file.Paths.get(landCat), s"b$n.parquet",
        Multimodal.media(admitted.select("doc_id", "text")
          .filter(Packing.MediaCarriageSql)))
      MediaCatalogStore.run(spark, landCat, ckCat, catRoot,
        MediaCatalogStore.CatalogSchema, buckets = 8)
    }

    drainChain(0L, b1)
    drainChain(1L, b2)

    // ---- the batch twin: the SAME funnel as composed batch operators
    // over the union corpus, the NB stage under the STORE's frozen
    // tables ----
    val evalEmb = IncrementalDecontamination.readEvalSet(spark, evalPath)
    val flagsTwin = IncrementalDecontamination.probeBatch(
      union.select("vec_id", "embedding"), evalEmb).localCheckpoint()
    val cleanTwin = union
      .join(flagsTwin.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("doc_id", "text", "source")
    val (nbModel, nbPrior) = IncrementalQualityFilter.readModel(spark, nbRoot)
    val nbTwin = IncrementalQualityFilter.scoreBatch(
      cleanTwin, nbModel, nbPrior).localCheckpoint()
    val admittedTwin = cleanTwin
      .join(nbTwin.filter(col("selected")).select("doc_id"), Seq("doc_id"))
      .select("doc_id", "text").localCheckpoint()
    val carrierTwin = Multimodal.media(
      admittedTwin.filter(Packing.MediaCarriageSql)).localCheckpoint()

    // ---- per-stage ledger reconciliation ----
    def ids(df: DataFrame, c: String = "doc_id") =
      df.select(c).collect().map(_.getLong(0)).toSet
    val flagsStore = spark.read.parquet(flagsPath)
    assert(ids(flagsStore, "vec_id") == ids(flagsTwin, "vec_id"))
    assert(flagsStore.count() > 0, "decontamination must bite")
    val nbLedger = spark.read.parquet(
      IncrementalQualityFilter.ledgerPath(nbRoot))
    def verdicts(df: DataFrame) = df.select("doc_id", "selected").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts(nbLedger) == verdicts(nbTwin))
    val admittedN = nbLedger.filter(col("selected")).count()
    assert(admittedN > 0 && admittedN < nbLedger.count(),
      s"the NB filter must admit a strict subset, got $admittedN/" +
        s"${nbLedger.count()}")
    // the byte catalog holds exactly the admitted carriers' media,
    // first-write-wins across the two batches
    def catRows(df: DataFrame) = df.selectExpr("media_id", "media_type",
      "n_bytes", "md5(lower(hex(payload))) AS m").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2),
        r.getString(3))).toSet
    assert(catRows(spark.read.parquet(MediaCatalogStore.mediaPath(catRoot))
      .drop("batch", "id_bucket")) == catRows(carrierTwin))
    assert(carrierTwin.count() > 0, "the crawl must land some media")

    // ---- the end state: the store-backed mm feed equals the batch mm
    // fetch over the twin corpus, sidecar included… ----
    val payloadsTwin = Packing.binPayloadsMm(admittedTwin, vocab = vocab)
      .localCheckpoint()
    val feedTwin = Packing.readerFeedMmFrom(payloadsTwin, epoch = 1)
      .localCheckpoint()
    val feedStore = IncrementalPacking.readerFeedMm(spark, packRoot, 1)
      .localCheckpoint()
    assert(feedRows(feedStore) == feedRows(feedTwin),
      "the served mm feed must equal the composed batch operators' fetch")
    assert(feedRows(feedStore).nonEmpty)
    assert(feedRows(feedStore).values.exists(_._6.nonEmpty),
      "some served bin must carry sidecar slots")

    // ---- …and the byte fetch against the PRUNED catalog serves the
    // twin's bytes, slot-for-slot ----
    val bytesStore = byteRows(
      MediaCatalogStore.fetch(spark, catRoot, feedStore))
    val bytesTwin = byteRows(
      Packing.fetchMediaPayloads(feedTwin, carrierTwin))
    assert(bytesStore == bytesTwin && bytesStore.nonEmpty,
      "the store-backed byte fetch must serve the twin's bytes")

    // ---- whole-pipeline replay: batch 1's commit is lost at EVERY
    // stage; re-running the chain re-executes it end to end and the
    // final feed AND bytes are bit-identical ----
    for (ck <- Seq(ckDc, ckNb, ckPack, ckCat)) {
      java.nio.file.Files.delete(java.nio.file.Paths.get(ck, "commits", "1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ck, "commits", ".1.crc"))
    }
    drainChain(1L, b2)
    val replayFeed = IncrementalPacking.readerFeedMm(spark, packRoot, 1)
      .localCheckpoint()
    assert(feedRows(replayFeed) == feedRows(feedTwin),
      "a replayed batch must rewrite the identical mm feed")
    assert(byteRows(MediaCatalogStore.fetch(spark, catRoot, replayFeed))
      == bytesTwin,
      "a replayed batch must serve the identical bytes")
  }
}
