package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.ops._

/** Every operator must degrade to an empty (or self-trivial) result on
  * empty input — at scale, empty partitions/days/slices are routine and an
  * operator that throws on them takes the pipeline down. The sf oracles
  * can't see this class of bug (fixtures are never empty).
  */
class EmptyInputSpec extends SparkSpec {

  private def emptyDocs: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("doc_id", LongType),
        StructField("text", StringType),
        StructField("lang", StringType))))

  private def emptyEmb: DataFrame =
    spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("vec_id", LongType),
        StructField("embedding", ArrayType(FloatType)))))

  test("text + dedup + split operators return empty on an empty corpus") {
    val d = emptyDocs
    assert(TextAnalysis.tokenStats(d).count() == 0)
    assert(TextAnalysis.subwordTokens(d).count() == 0)
    assert(TextAnalysis.subwordIds(d).count() == 0)
    assert(TextAnalysis.subwordIdsChecked(d).count() == 0)
    assert(TextAnalysis.subwordTokensTrained(d).count() == 0)
    assert(graft.streaming.IncrementalSubword.scoreBatch(
      d, graft.ops.Portable.trainedFixtureVocab).count() == 0)
    assert(Packing.packBins(d,
      nTokensSql = TextAnalysis.subwordCountSql).count() == 0)
    assert(Packing.binPayloads(d).count() == 0)
    assert(TextAnalysis.qualityScore(d).count() == 0)
    assert(TextAnalysis.topTerms(d).count() == 0)
    assert(Retrieval.bm25TopK(d).count() == 0)
    assert(Dsir.weights(d).count() == 0)
    assert(Dsir.select(d).count() == 0)
    assert(Dedup.exact(d).count() == 0)
    assert(Dedup.minhashSignatures(d).count() == 0)
    assert(Dedup.minhashPairs(d).count() == 0)
    assert(Dedup.ngramJaccardPairs(d).count() == 0)
    assert(Dedup.simhashPairs(d).count() == 0)
    assert(Dedup.chunkDedup(d).count() == 0)
    assert(Dedup.chunkDedupDocs(d).count() == 0)
    assert(Dedup.winnowFingerprints(d).count() == 0)
    assert(Dedup.winnowOverlapPairs(d).count() == 0)
    assert(Dedup.winnowKeepDocs(d).count() == 0)
    assert(HashSplit.split(d).count() == 0)
    assert(HashSplit.tokenShards(d).count() == 0)
    assert(Curation.rowAudit(d).count() == 0)
    assert(Sampling.stratifiedSample(d).count() == 0)
    assert(Sampling.targetAssign(d, 10L).count() == 0)
    val ds = d.withColumn("source", lit("s"))
    assert(QualityClassifier.score(ds).count() == 0)
    assert(QualityClassifier.select(ds).count() == 0)
    assert(QualityClassifier.summary(ds).count() == 0)
    assert(LmPerplexity.modelTable(ds).count() == 0)
    assert(LmPerplexity.score(ds).count() == 0)
    assert(LmPerplexity.select(ds).count() == 0)
    assert(LmPerplexity.summary(ds).count() == 0)
    assert(Packing.packBins(d).count() == 0)
    assert(Packing.stats(d).count() == 0)
    assert(Packing.epochPlan(d).count() == 0)
    assert(Packing.binPayloadsMm(d).count() == 0)
    assert(Packing.readerFeed(d).count() == 0)
    assert(Packing.readerFeedMm(d).count() == 0)
    assert(Packing.binManifest(d).count() == 0)
    assert(Packing.fetchMediaPayloads(
      Packing.readerFeedMm(d), Multimodal.media(d)).count() == 0)
    // a store root that never existed serves empty mm relations, not a
    // crash (the text twins are covered in IncrementalPackingSpec)
    assert(graft.streaming.IncrementalPacking.payloadStreamsMm(
      spark, "/tmp/graft-nowhere-mm").count() == 0)
    assert(graft.streaming.IncrementalPacking.binManifest(
      spark, "/tmp/graft-nowhere-mm").count() == 0)
    // an EXPLICIT pin over the absent store takes the same empty-store
    // degrade as the defaulted one, never an AnalysisException from the
    // raw parquet read (both readers share the binsUpTo guard)
    assert(graft.streaming.IncrementalPacking.binManifest(
      spark, "/tmp/graft-nowhere-mm", upToBatch = Some(3L)).count() == 0)
    assert(graft.streaming.IncrementalPacking.epochPlanAt(
      spark, "/tmp/graft-nowhere-mm", 1, upToBatch = Some(3L)).count() == 0)
    assert(Dedup.boilerplateChunks(d).count() == 0)
    assert(Dedup.boilerplateDocs(d).count() == 0)
    // the one-row stats reports read 0, never NULL, on an occurrence-free
    // corpus (the coalesced-counter contract)
    for (st <- Seq(Dedup.boilerplateStats(d).head(),
        Dedup.chunkDedupStats(d).head())) {
      assert(st.getAs[Long]("n_dropped") == 0L)
      assert(st.getAs[Long]("chars_dropped") == 0L)
    }
    assert(Sampling.temperatureAssign(d).count() == 0)
    assert(Sampling.temperatureSummary(d).count() == 0)
    val audited = Curation.audit(d, Dedup.minhashDupClusters(d))
    assert(audited.count() == 0)
    assert(Curation.corpus(d.withColumn("source", lit("s"))
      .withColumn("n_chars", lit(0L)), audited).count() == 0)
    // the funnel is a global aggregate: one row of zero counts (sums are
    // null on empty input in BOTH engines — the count is the contract)
    assert(Curation.funnel(audited).head().getAs[Long]("n_total") == 0L)
  }

  test("CMS frequency ops degrade on an empty event stream") {
    val e = spark.createDataFrame(
      spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
      StructType(Seq(
        StructField("event_id", LongType),
        StructField("ts", TimestampType),
        StructField("user_id", LongType),
        StructField("event_type", StringType),
        StructField("value", DoubleType),
        StructField("props", StringType))))
    assert(Events.userCountsExact(e).count() == 0)
    // the gate's global agg still returns its constant zero row (the
    // null sketch is never dereferenced: no probe rows to estimate)
    assert(Events.userCountsCmsErr(e).head().getLong(0) == 0L)
  }

  test("cluster resolution on empty docs and empty pair graph is empty") {
    assert(Dedup.minhashDupClusters(emptyDocs).count() == 0)
    // non-empty docs, empty verified-pair graph: every doc self-clusters
    import spark.implicits._
    val docs = Seq(1L, 2L).toDF("doc_id")
    val noPairs = Seq.empty[(Long, Long)].toDF("a_id", "b_id")
    val out = Dedup.dupClusters(docs, noPairs).collect()
    assert(out.length == 2 && out.forall(r => r.getLong(0) == r.getLong(1)))
  }

  test("similarity operators return empty on an empty embedding table") {
    val e = emptyEmb
    assert(Similarity.signatures(e).count() == 0)
    assert(Similarity.bruteTopK(e).count() == 0)
    assert(Similarity.lshTopK(e).count() == 0)
    assert(Similarity.lshNearDup(e).count() == 0)
    assert(Similarity.ivfTopK(e).count() == 0)
    assert(Similarity.semDedup(e).count() == 0)
    assert(Pq.codes(e).count() == 0)
    assert(Pq.adcTopK(e).count() == 0)
    assert(Pq.ivfpqTopK(e).count() == 0)
    assert(Pq.adcRecallGate(e).count() == 0)
    assert(Similarity.crossSetContamination(e, e).count() == 0)
  }
}
