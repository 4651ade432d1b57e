package graft

import java.nio.file.Files

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.streaming.{IncrementalSubword, SubwordMaintenance}

/** Incremental subword serving: the vocabulary trains at bootstrap and
  * freezes (store-absence keyed, the IncrementalDsir contract); every
  * later batch prices under it even when its inventory no longer fits; a
  * corrupt vocabulary store fails loudly; and an inventory-shifted window
  * trips [[SubwordMaintenance]]'s counterfactual, after which the [UNK]
  * rate recovers and the carried pricing history sits at `batch=-1`.
  */
class IncrementalSubwordSpec extends SparkSpec {

  private val LowerWords = Seq("the", "market", "data", "pipeline", "token",
    "budget", "merge", "round", "shard", "stream")
  private val UpperWords = Seq("QUANTUM", "FLUX", "VORTEX", "PRISM",
    "ZENITH", "KRYPTON", "JOVIAN", "WOMBAT", "GLYPH", "SPHINX")

  /** Deterministic corpus: 6 tokens per doc drawn hash-driven from the
    * word list. Lowercase trains the bootstrap inventory; the uppercase
    * list shares NO characters with it (bpe pre-tokens are case-split
    * runs), so under the frozen vocabulary every uppercase word
    * whole-word-collapses to [UNK] — the planted inventory shift.
    */
  private def corpus(lo: Long, hi: Long,
      words: Seq[String] = LowerWords): DataFrame = {
    val arr = words.map(w => s"'$w'").mkString("array(", ", ", ")")
    spark.range(lo, hi).toDF("doc_id").selectExpr(
      "doc_id",
      s"""array_join(transform(sequence(0, 5),
         |  i -> element_at($arr,
         |         CAST(pmod(hash(doc_id, i), ${words.size}) AS INT) + 1)),
         |  ' ') AS text""".stripMargin.replaceAll("\n", " "))
  }

  private def schema = corpus(0L, 1L).schema
  private val Merges = 12

  private def ledgerTuples(df: DataFrame): Set[(Long, Long, Long, Long)] =
    df.select("doc_id", "n_words", "n_subwords", "n_unk")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3))).toSet

  test("a single drain prices under the bootstrap-trained vocabulary") {
    val landing = Files.createTempDirectory("isw-landing")
    val ckpt = Files.createTempDirectory("isw-ckpt").toString + "/c"
    val root = Files.createTempDirectory("isw-root").toString + "/s"
    val docs = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", docs)
    val ledger = IncrementalSubword.run(
      spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    // the stored vocabulary IS the trainer's output over the bootstrap
    // batch, and the ledger equals batch pricing under it
    val stored = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(root))
    assert(stored ==
      graft.ops.SubwordTrain.trainedVocab(docs, Merges))
    assert(ledgerTuples(ledger) ==
      ledgerTuples(IncrementalSubword.scoreBatch(docs, stored)))
    // training words never hit [UNK] (the char-floor guarantee)
    assert(ledger.filter(col("n_unk") > 0).count() == 0)
    // the packing seam serves the STORED inventory
    assert(IncrementalSubword.nTokensSqlOf(spark, root) ==
      graft.ops.TextAnalysis.subwordCountSqlWith(stored))
  }

  test("later batches price under the FROZEN vocabulary") {
    val landing = Files.createTempDirectory("isw2-landing")
    val ckpt = Files.createTempDirectory("isw2-ckpt").toString + "/c"
    val root = Files.createTempDirectory("isw2-root").toString + "/s"
    val b1 = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", b1)
    IncrementalSubword.run(
      spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    val frozen = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(root))
    // batch 2 arrives with an unseen character inventory; the vocabulary
    // must NOT retrain mid-stream — every uppercase word collapses to one
    // [UNK], which is the loud-in-the-ledger signal the drift loop reads
    val b2 = corpus(200L, 400L, UpperWords)
    landParquet(landing, "b2.parquet", b2)
    IncrementalSubword.run(
      spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    assert(IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(root)) == frozen,
      "the vocabulary must stay frozen across batches")
    val era2 = spark.read.parquet(IncrementalSubword.ledgerPath(root))
      .filter(col("batch") >= 1)
    assert(era2.count() == 200L)
    assert(era2.filter(col("n_unk") =!= col("n_words")).count() == 0,
      "every unseen-inventory word must whole-word-collapse under the " +
        "frozen vocabulary")
  }

  test("quote/backslash-bearing corpora train and price without corruption") {
    // the character floor puts EVERY observed punctuation character into
    // the trained inventory — quote and backslash included — and pricing
    // splats that inventory into Spark SQL text: a wrong escape either
    // throws at parse or silently transforms pieces (probed: a lone
    // backslash eats the next character), which whole-word-collapses
    // every affected word to [UNK]. Zero [UNK] on the training corpus is
    // therefore the full round-trip proof.
    import spark.implicits._
    val docs = Seq(
      (0L, """it's a c:\path\to\file with 'quotes' and \\ slashes"""),
      (1L, """don't strip the \n or the \b sequences in code text"""),
      (2L, """plain words beside 'quoted' ones and trailing \"""))
      .toDF("doc_id", "text")
    val vocab = graft.ops.SubwordTrain.trainedVocab(docs, Merges)
    assert(vocab.exists(_.contains("'")) && vocab.exists(_.contains("\\")),
      "the fixture must actually exercise both hostile characters")
    val priced = IncrementalSubword.scoreBatch(docs, vocab).collect()
    assert(priced.length == 3)
    assert(priced.forall(_.getAs[Long]("n_unk") == 0L),
      "a training word hit [UNK] — the vocabulary splat corrupted a piece")
    assert(priced.forall(r =>
      r.getAs[Long]("n_subwords") >= r.getAs[Long]("n_words")))
  }

  test("the stored vocabulary feeds packing, and the marker freezes it") {
    // the deployment composition the family exists for: bootstrap the
    // vocabulary store, price a packing store in ITS unit via
    // nTokensSqlOf, and verify IncrementalPacking's _tokens_source marker
    // recorded THIS vocabulary's identity — after which the whitespace
    // default (a rebuilt binary losing the wiring) refuses to extend it
    val landing = Files.createTempDirectory("isw5-landing")
    val ckpt = Files.createTempDirectory("isw5-ckpt").toString + "/c"
    val root = Files.createTempDirectory("isw5-root").toString + "/s"
    val docs = corpus(0L, 150L)
    landParquet(landing, "b1.parquet", docs)
    IncrementalSubword.run(
      spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    val src = IncrementalSubword.nTokensSqlOf(spark, root)

    val pLanding = Files.createTempDirectory("isw5-planding")
    val pCkpt = Files.createTempDirectory("isw5-pckpt").toString + "/c"
    val pRoot = Files.createTempDirectory("isw5-proot").toString + "/p"
    landParquet(pLanding, "b1.parquet", docs)
    // the full composition: the STORED vocabulary prices the bins AND
    // feeds the payload fragments — one inventory end to end
    val storedVocab = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(root))
    val bins = graft.streaming.IncrementalPacking.run(
      spark, pLanding.toString, pCkpt, pRoot, schema, nTokensSql = src,
      payloadVocab = Some(storedVocab))
    // priced in the stored vocabulary's unit: bin n_tokens equals the
    // store's own per-doc subword counts
    val fromLedger = spark.read
      .parquet(IncrementalSubword.ledgerPath(root))
      .select("doc_id", "n_subwords").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    bins.select("doc_id", "n_tokens").collect().foreach { r =>
      assert(r.getLong(1) == fromLedger(r.getLong(0)),
        s"doc ${r.getLong(0)} priced off-unit")
    }
    assert(graft.streaming.IncrementalPacking
      .storedTokensSource(spark, pRoot)
      .contains(graft.streaming.IncrementalPacking.tokensSourceId(src)))
    // the payload feed is priced in the same unit: every bin's id stream
    // length equals its bin_tokens counter
    val feed = graft.streaming.IncrementalPacking
      .payloadStreams(spark, pRoot).collect()
    assert(feed.nonEmpty)
    feed.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("input_ids")).size.toLong ==
        r.getAs[Long]("bin_tokens"))
    }
    landParquet(pLanding, "b2.parquet", corpus(150L, 300L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      graft.streaming.IncrementalPacking.run(
        spark, pLanding.toString, pCkpt, pRoot, schema)
    }
    assert(e.getMessage.contains("token source") ||
      e.getCause.getMessage.contains("token source"))
  }

  test("a corrupt vocabulary store fails loudly") {
    val landing = Files.createTempDirectory("isw3-landing")
    val ckpt = Files.createTempDirectory("isw3-ckpt").toString + "/c"
    val root = Files.createTempDirectory("isw3-root").toString + "/s"
    landParquet(landing, "b1.parquet", corpus(0L, 100L))
    IncrementalSubword.run(
      spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    // simulate a partial bootstrap write: drop pid 2 from the store
    val path = IncrementalSubword.vocabPath(root)
    val gapped = spark.read.parquet(path).filter(col("pid") =!= 2L)
      .localCheckpoint()
    gapped.coalesce(1).write.mode("overwrite").parquet(path)
    landParquet(landing, "b2.parquet", corpus(100L, 200L))
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalSubword.run(
        spark, landing.toString, ckpt, root, schema, nMerges = Merges)
    }
    assert(e.getMessage.contains("pid gap") ||
      e.getCause.getMessage.contains("pid gap"))
  }

  test("inventory drift trips the counterfactual; the [UNK] rate recovers") {
    val landing = Files.createTempDirectory("isw4-landing")
    val ckpt = Files.createTempDirectory("isw4-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("isw4-root").toString + "/s"
    val genRoot = Files.createTempDirectory("isw4-gen").toString + "/g"
    val boot = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalSubword.run(
      spark, landing.toString, ckpt, flatRoot, schema, nMerges = Merges)

    val gen0 = SubwordMaintenance.adopt(spark, genRoot, flatRoot)
    assert(SubwordMaintenance.currentRoot(spark, genRoot) == gen0)
    // the adopt carried the model verbatim
    assert(IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(gen0)) ==
      IncrementalSubword.readVocab(
        spark, IncrementalSubword.vocabPath(flatRoot)))
    // below-threshold maintain is a pure read: the bootstrap window
    // prices identically under live and candidate — no [UNK], no
    // inflation — so nothing retrains
    val noop = SubwordMaintenance.maintain(
      spark, genRoot, boot, nMerges = Merges)
    assert(!noop.retrained && noop.generation.isEmpty)
    assert(noop.frozenUnkRate == 0.0)
    assert(SubwordMaintenance.currentRoot(spark, genRoot) == gen0)

    // DRIFT: the current window arrives in an unseen character
    // inventory — under the frozen vocabulary EVERY word is [UNK]
    // (id fidelity lost, budgets mispriced); under a window-trained
    // candidate none is. The window (not the all-time union) is the
    // measurement corpus — drift is a property of what arrives NOW
    val drifted = corpus(200L, 500L, UpperWords)
    val report = SubwordMaintenance.maintain(
      spark, genRoot, drifted, nMerges = Merges)
    assert(report.retrained,
      s"[UNK] drift ${report.frozenUnkRate} vs " +
        s"${report.candidateUnkRate} must trip the default threshold")
    assert(report.frozenUnkRate == 1.0 && report.candidateUnkRate == 0.0)
    val gen1 = report.generation.get
    assert(SubwordMaintenance.currentRoot(spark, genRoot) == gen1)
    // the carried pricing history survives intact, at batch=-1
    val carried = spark.read.parquet(IncrementalSubword.ledgerPath(gen1))
    assert(carried.count() ==
      spark.read.parquet(IncrementalSubword.ledgerPath(gen0)).count())
    assert(carried.filter(col("batch") =!= -1).count() == 0,
      "carried history must land at batch=-1, below every future epoch")

    // AFTER: the [UNK] rate under the retrained vocabulary recovers, and
    // the stream re-enters on the new generation under a fresh checkpoint
    val vocab1 = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(gen1))
    assert(SubwordMaintenance.windowRates(drifted, vocab1)._1 == 0.0)
    val landing2 = Files.createTempDirectory("isw4-landing2")
    val ckpt2 = Files.createTempDirectory("isw4-ckpt2").toString + "/c"
    landParquet(landing2, "b2.parquet", drifted)
    IncrementalSubword.run(
      spark, landing2.toString, ckpt2, gen1, schema, nMerges = Merges)
    val era = spark.read.parquet(IncrementalSubword.ledgerPath(gen1))
      .filter(col("batch") >= 0)
    assert(era.count() == drifted.count())
    assert(era.filter(col("n_unk") > 0).count() == 0,
      "post-retrain pricing must carry no [UNK] on the current window")
  }

  test("a retrain migrates packing to a fresh root; the era feed spans both units") {
    import graft.streaming.{IncrementalPacking, PackingMigration}
    // era 0: bootstrap the vocabulary, pack + feed a payload-enabled
    // root in ITS unit — the pre-drift deployment
    val landing = Files.createTempDirectory("ismg-landing")
    val ckpt = Files.createTempDirectory("ismg-ckpt").toString + "/c"
    val flatRoot = Files.createTempDirectory("ismg-root").toString + "/s"
    val genRoot = Files.createTempDirectory("ismg-gen").toString + "/g"
    val boot = corpus(0L, 200L)
    landParquet(landing, "b1.parquet", boot)
    IncrementalSubword.run(
      spark, landing.toString, ckpt, flatRoot, schema, nMerges = Merges)
    SubwordMaintenance.adopt(spark, genRoot, flatRoot)
    val gen0 = SubwordMaintenance.currentRoot(spark, genRoot)
    val vocab0 = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(gen0))
    val src0 = IncrementalSubword.nTokensSqlOf(spark, gen0)
    val pLanding = Files.createTempDirectory("ismg-planding")
    val pCkpt = Files.createTempDirectory("ismg-pckpt").toString + "/c"
    val root0 = Files.createTempDirectory("ismg-proot").toString + "/p0"
    landParquet(pLanding, "b1.parquet", boot)
    IncrementalPacking.run(spark, pLanding.toString, pCkpt, root0, schema,
      nTokensSql = src0, payloadVocab = Some(vocab0))

    // drift trips the retrain: the next window arrives in an unseen
    // character inventory and SubwordMaintenance ships generation 1
    val drifted = corpus(200L, 400L, UpperWords)
    val report = SubwordMaintenance.maintain(
      spark, genRoot, drifted, nMerges = Merges)
    assert(report.retrained)
    val gen1 = report.generation.get
    val vocab1 = IncrementalSubword.readVocab(
      spark, IncrementalSubword.vocabPath(gen1))

    // the old root REFUSES the new unit — the _tokens_source mismatch
    // stays loud (this is the guard the migration exists to answer)
    landParquet(pLanding, "b2.parquet", drifted)
    val e = intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      IncrementalPacking.run(spark, pLanding.toString, pCkpt, root0, schema,
        nTokensSql = IncrementalSubword.nTokensSqlOf(spark, gen1),
        payloadVocab = Some(vocab1))
    }
    assert(e.getMessage.contains("token source") ||
      e.getCause.getMessage.contains("token source"))

    // the runbook: stand up the successor root under the NEW unit — the
    // drifted window drains there; the old root's shipped bins and
    // fragments stay byte-identical (servable, untouched)
    val before = spark.read.parquet(IncrementalPacking.binsPath(root0))
      .collect().map(_.toString).sorted.toSeq
    val pLanding2 = Files.createTempDirectory("ismg-planding2")
    val pCkpt2 = Files.createTempDirectory("ismg-pckpt2").toString + "/c"
    val root1 = Files.createTempDirectory("ismg-proot1").toString + "/p1"
    landParquet(pLanding2, "b1.parquet", drifted)
    PackingMigration.repackUnderVocab(spark, root0, root1,
      pLanding2.toString, pCkpt2, schema, vocab1)
    assert(spark.read.parquet(IncrementalPacking.binsPath(root0))
      .collect().map(_.toString).sorted.toSeq == before,
      "the old root's shipped bins must not move")
    // the successor inherited the payload choice and shard count, and
    // froze the NEW unit
    assert(IncrementalPacking.storedPayloadsEnabled(spark, root1)
      .contains(true))
    assert(IncrementalPacking.storedShards(spark, root1) ==
      IncrementalPacking.storedShards(spark, root0))
    assert(IncrementalPacking.storedTokensSource(spark, root1).contains(
      IncrementalPacking.tokensSourceId(
        graft.ops.TextAnalysis.subwordCountSqlWith(vocab1))))

    // the combined trainer feed: every bin of every era exactly once,
    // each priced in its own era's unit
    val feed = PackingMigration.eraFeed(spark, Seq(root0, root1), 1)
      .collect()
    val byEra = feed.groupBy(_.getAs[Long]("era"))
    assert(byEra.keySet == Set(0L, 1L))
    val keys = feed.map(r => (r.getAs[Long]("era"), r.getAs[Long]("shard"),
      r.getAs[Long]("bin")))
    assert(keys.distinct.length == keys.length,
      "every (era, shard, bin) must be served exactly once")
    feed.foreach { r =>
      assert(r.getSeq[Long](r.fieldIndex("input_ids")).size.toLong ==
        r.getAs[Long]("bin_tokens"),
        "each era's id stream must match its own unit's bin_tokens")
    }
    // era payloads equal each root's own feed — the union adds nothing
    def own(root: String) = IncrementalPacking.payloadStreams(spark, root)
      .collect().map(r => (r.getAs[Long]("shard"), r.getAs[Long]("bin")) ->
        r.getSeq[Long](r.fieldIndex("input_ids")).toList).toMap
    assert(byEra(0L).map(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("bin")) ->
      r.getSeq[Long](r.fieldIndex("input_ids")).toList).toMap == own(root0))
    assert(byEra(1L).map(r => (r.getAs[Long]("shard"),
      r.getAs[Long]("bin")) ->
      r.getSeq[Long](r.fieldIndex("input_ids")).toList).toMap == own(root1))
    // reader positions are contiguous per reader across the MERGED stream
    feed.groupBy(_.getAs[Long]("reader")).foreach { case (_, rows) =>
      assert(rows.map(_.getAs[Long]("reader_pos")).sorted.toSeq ==
        (1L to rows.length.toLong))
    }

    // the runbook refuses a pointless era: a vocabulary pricing
    // identically to the old root's source must keep draining there
    val e2 = intercept[IllegalArgumentException] {
      PackingMigration.repackUnderVocab(spark, root0,
        Files.createTempDirectory("ismg-proot2").toString + "/p2",
        pLanding2.toString, pCkpt2 + "x", schema, vocab0)
    }
    assert(e2.getMessage.contains("prices identically"))
  }
}
