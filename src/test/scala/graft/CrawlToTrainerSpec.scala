package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.{Curation, Dedup, Packing, Portable, Sampling, TextAnalysis}
import graft.streaming.{IncrementalChunkDedup, IncrementalDecontamination,
  IncrementalLearnedEnsemble, IncrementalPacking, IncrementalSourceCap}

/** The engine's actual product claim, walked END TO END: one landing dir
  * drains through the WHOLE crawl-to-trainer funnel — decontamination →
  * learned-ensemble admission → cross-document chunk dedup → source cap
  * → sequence packing → trainer-reader feed — across two batches plus a
  * whole-pipeline replay, and the final feed equals the BATCH operators
  * composed over the union corpus, with every stage's ledger reconciling
  * against its batch twin. Each family proves drain ≡ batch in isolation
  * in its own spec; this one proves the COMPOSITION: stage k's admitted
  * stream is exactly what stage k+1 was fed, batch boundaries and all.
  *
  * Fixture constraints the composition imposes (each stage's own
  * equality contract, inherited):
  *  - batch splits are doc_id-MONOTONE (chunk dedup's keep-first
  *    election is by doc_id, so batch order must agree with id order);
  *  - batch sources are DISJOINT (the source cap is first-arrival across
  *    batches — equality with the batch election holds per source only
  *    when no source's budget spans a batch boundary; crawls arriving as
  *    one dump per source are exactly this shape);
  *  - the ensemble's tables freeze on batch 1, so the batch twin scores
  *    the union under the STORE's tables, not tables retrained on the
  *    union (the frozen-estimate contract).
  */
class CrawlToTrainerSpec extends SparkSpec {

  private val Dim = 32
  private val EvalResidues = Seq(31L, 13L)
  private val Cap = 12
  private val vocab = Portable.subwordVocab

  /** One crawl doc: seed-vocabulary text for "good" docs (every third doc
    * is junk with all-unseen tokens), a shared 8-token boilerplate chunk
    * prepended to every fourth doc (cross-batch — the chunk stage's
    * bite), a unique token inside each 8-token chunk window so legitimate
    * chunks never collide, and a one-hot embedding whose residue keys the
    * decontamination eval set.
    */
  private def mkDocs(lo: Long, hi: Long, srcPrefix: String): DataFrame =
    spark.range(lo, hi).select(
      col("id").as("doc_id"),
      col("id").as("vec_id"),
      expr(
        """concat(
          |  CASE WHEN id % 4 = 0 THEN 'c0 c1 c2 c3 c4 c5 c6 c7 ' ELSE '' END,
          |  CASE WHEN id % 3 = 2 THEN
          |    concat_ws(' ', transform(sequence(0, 15),
          |      j -> concat('z', id, 't', j)))
          |  ELSE
          |    concat('alpha beta gamma u', id, 'a delta epsilon zeta eta ',
          |           'theta iota kappa u', id, 'b lam mu nu xi')
          |  END)""".stripMargin).as("text"),
      expr(s"""CASE WHEN '$srcPrefix' = 'a' AND id % 5 = 0 THEN 'src0'
              |     ELSE concat('$srcPrefix', 1 + id % 2) END""".stripMargin)
        .as("source"),
      expr("CASE WHEN id % 3 = 2 THEN 'xx' ELSE 'en' END").as("lang"),
      expr(s"""transform(sequence(0, ${Dim - 1}),
              |  j -> CAST(CASE WHEN j = id % $Dim THEN 1.0 ELSE 0.0 END
              |       AS FLOAT))""".stripMargin).as("embedding"))

  test("the whole funnel drains landing→feed; end state ≡ the composed batch operators") {
    val base = Files.createTempDirectory("c2t").toString
    def dir(n: String) = { val d = s"$base/$n"
      Files.createDirectories(java.nio.file.Paths.get(d)); d }
    val (landDc, landEns, landChunk, landCap, landPack) =
      (dir("land-dc"), dir("land-ens"), dir("land-chunk"),
        dir("land-cap"), dir("land-pack"))
    val (ckDc, ckEns, ckChunk, ckCap, ckPack) =
      (s"$base/ck-dc", s"$base/ck-ens", s"$base/ck-chunk",
        s"$base/ck-cap", s"$base/ck-pack")
    val (evalPath, flagsPath, cleanPath) =
      (s"$base/eval", s"$base/flags", s"$base/clean")
    val (ensRoot, chunkRoot, capRoot, packRoot) =
      (s"$base/ens", s"$base/chunk", s"$base/cap", s"$base/pack")

    val b1 = mkDocs(0L, 200L, "a")
    val b2 = mkDocs(200L, 330L, "b")
    val union = b1.unionAll(b2).localCheckpoint()
    val docsSchema = b1.schema
    val ensSchema = b1.select("doc_id", "text", "source", "lang").schema
    val capSchema = b1.selectExpr("doc_id", "text", "source").schema
    val packSchema = b1.select("doc_id", "text").schema
    val nTok = TextAnalysis.subwordCountSqlWith(vocab)

    // the frozen eval set: two one-hot directions — exactly the docs
    // whose residue matches are contaminated, nothing else (one-hot
    // cosines are exactly 0 or 1, so the verify is knife-edge-free)
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

    /** Drain one landed crawl batch through every stage, relaying each
      * stage's batch-N output as stage N+1's landed file — the composed
      * pipeline a deployment actually wires. `n` is the batch index each
      * stage's stream will assign (one file landed per run).
      */
    def drainChain(n: Long, docs: DataFrame): Unit = {
      landParquet(java.nio.file.Paths.get(landDc), s"b$n.parquet", docs)
      IncrementalDecontamination.run(spark, landDc, ckDc, evalPath,
        flagsPath, cleanPath, docsSchema)
      landParquet(java.nio.file.Paths.get(landEns), s"b$n.parquet",
        spark.read.parquet(s"$cleanPath/batch=$n")
          .select("doc_id", "text", "source", "lang"))
      IncrementalLearnedEnsemble.run(spark, landEns, ckEns, ensRoot,
        ensSchema)
      landParquet(java.nio.file.Paths.get(landChunk), s"b$n.parquet",
        spark.read.parquet(
          s"${IncrementalLearnedEnsemble.admittedPath(ensRoot)}/batch=$n"))
      IncrementalChunkDedup.runRoot(spark, landChunk, ckChunk, chunkRoot,
        ensSchema)
      // the chunk corpus carries (doc_id, clean_text, …); the cap keys on
      // source, an upstream attribute — rejoin it by doc_id (the funnel's
      // stable key) for the relay
      landParquet(java.nio.file.Paths.get(landCap), s"b$n.parquet",
        spark.read.parquet(
          s"${IncrementalChunkDedup.corpusPathOf(chunkRoot)}/batch=$n")
          .join(union.select("doc_id", "source"), Seq("doc_id"))
          .select(col("doc_id"), col("clean_text").as("text"),
            col("source")))
      IncrementalSourceCap.run(spark, landCap, ckCap, capRoot, capSchema,
        cap = Cap)
      landParquet(java.nio.file.Paths.get(landPack), s"b$n.parquet",
        spark.read.parquet(
          s"${IncrementalSourceCap.corpusPath(capRoot)}/batch=$n")
          .select("doc_id", "text"))
      IncrementalPacking.run(spark, landPack, ckPack, packRoot, packSchema,
        nTokensSql = nTok, payloadVocab = Some(vocab))
    }

    drainChain(0L, b1)
    drainChain(1L, b2)

    // ---- the batch twin: the SAME funnel as composed batch operators
    // over the union corpus ----
    val evalEmb = IncrementalDecontamination.readEvalSet(spark, evalPath)
    val flagsTwin = IncrementalDecontamination.probeBatch(
      union.select("vec_id", "embedding"), evalEmb).localCheckpoint()
    val cleanTwin = union
      .join(flagsTwin.select("vec_id"), Seq("vec_id"), "left_anti")
      .select("doc_id", "text", "source", "lang")
    val (nbM, nbP, lmM, lmC, lr) =
      IncrementalLearnedEnsemble.readTables(spark, ensRoot)
    val auditTwin = Curation.learnedAuditWith(cleanTwin, nbM, nbP, lmM,
      lmC, lr).localCheckpoint()
    val admittedTwin = cleanTwin
      .join(auditTwin.filter(col("kept")).select("doc_id"), Seq("doc_id"))
      .localCheckpoint()
    val chunkTwin = Dedup.chunkDedupDocs(admittedTwin).localCheckpoint()
    val capInTwin = chunkTwin
      .join(union.select("doc_id", "source"), Seq("doc_id"))
      .select(col("doc_id"), col("clean_text").as("text"), col("source"))
    // the batch election projects to its audit columns; rejoin the text
    // by the funnel's stable key for the packing twin
    val capTwin = Sampling.sourceCap(capInTwin, cap = Cap)
      .select("doc_id", "source")
      .join(capInTwin.select("doc_id", "text"), Seq("doc_id"))
      .localCheckpoint()

    // ---- per-stage ledger reconciliation: every stage's accumulated
    // store equals its batch twin, so the funnel counts are the batch
    // operator's, not merely plausible ----
    def ids(df: DataFrame, c: String = "doc_id") =
      df.select(c).collect().map(_.getLong(0)).toSet
    val flagsStore = spark.read.parquet(flagsPath)
    assert(ids(flagsStore, "vec_id") == ids(flagsTwin, "vec_id"))
    assert(flagsStore.count() > 0, "decontamination must bite")
    val ledgerStore = spark.read.parquet(
      IncrementalLearnedEnsemble.ledgerPath(ensRoot))
    def verdicts(df: DataFrame) = df.select("doc_id", "kept").collect()
      .map(r => r.getLong(0) -> r.getBoolean(1)).toMap
    assert(verdicts(ledgerStore) == verdicts(auditTwin))
    val keptN = ledgerStore.filter(col("kept")).count()
    assert(keptN > 0 && keptN < ledgerStore.count(),
      s"the ensemble must admit a strict subset, got $keptN/" +
        s"${ledgerStore.count()}")
    val chunkStore = spark.read.parquet(
      IncrementalChunkDedup.corpusPathOf(chunkRoot))
    def chunkRows(df: DataFrame) = df
      .select("doc_id", "clean_text", "n_chunks", "n_kept").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
      .toSet
    assert(chunkRows(chunkStore) == chunkRows(chunkTwin))
    assert(chunkStore.filter(col("n_kept") < col("n_chunks")).count() > 0,
      "the cross-batch boilerplate must have been deduped somewhere")
    val capStore = spark.read.parquet(IncrementalSourceCap.corpusPath(capRoot))
    assert(ids(capStore) == ids(capTwin))
    assert(capStore.count() < chunkStore.count(),
      "the source cap must bind")
    def bySource(df: DataFrame) = df.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySource(capStore) == bySource(capTwin))

    // ---- the end state: the trainer-reader feed over the store equals
    // the batch fetch over the batch-twin corpus, payload-for-payload ----
    def feedRows(df: DataFrame) = df.collect()
      .map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        (r.getAs[Long]("reader"), r.getAs[Long]("reader_pos"),
          r.getAs[Long]("n_docs"), r.getAs[Long]("bin_tokens"),
          r.getSeq[Long](r.fieldIndex("input_ids")).toList)).toMap
    val feedStore = feedRows(IncrementalPacking.readerFeed(spark, packRoot, 1))
    val feedTwin = feedRows(Packing.readerFeed(
      capTwin.select("doc_id", "text"), 1, vocab = vocab))
    assert(feedStore == feedTwin,
      "the served feed must equal the composed batch operators' fetch")
    assert(feedStore.nonEmpty)

    // ---- whole-pipeline replay: batch 1's commit is lost at EVERY
    // stage (the crash-at-the-worst-moment drill); re-running the chain
    // re-executes batch 1 end to end and the final feed is bit-identical
    // — the composed funnel is idempotent, not just its stages ----
    for (ck <- Seq(ckDc, ckEns, ckChunk, ckCap, ckPack)) {
      java.nio.file.Files.delete(java.nio.file.Paths.get(ck, "commits", "1"))
      java.nio.file.Files.deleteIfExists(
        java.nio.file.Paths.get(ck, "commits", ".1.crc"))
    }
    drainChain(1L, b2)
    assert(feedRows(IncrementalPacking.readerFeed(spark, packRoot, 1)) ==
      feedTwin, "a replayed batch must rewrite the identical feed")
  }

}
