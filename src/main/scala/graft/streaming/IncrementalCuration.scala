package graft.streaming

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger
import org.apache.spark.sql.types.{DoubleType, LongType, StringType, StructField, StructType}

import graft.ops.{Curation, Dedup}

/** Incremental corpus curation — the ongoing-crawl shape of
  * [[graft.ops.Curation]]: new documents arrive continuously, and
  * re-clustering 100 TB of history per batch is not an option. Instead the
  * pipeline maintains a SIGNATURE STORE (one MinHash signature row per
  * admitted document, ~100 bytes/doc vs KBs for shingle sets) and, per
  * micro-batch:
  *
  *   1. signatures for the new documents ([[Dedup.minhashSignatures]] —
  *      batch-sized work);
  *   2. near-dup candidates via the LSH band join of new-side bands
  *      against store ∪ batch bands (only matching buckets materialize);
  *   3. candidate verification by the MinHash Jaccard ESTIMATE (fraction
  *      of agreeing signature components — Broder 1997's estimator). The
  *      batch path verifies against exact shingle sets; storing those for
  *      the whole corpus is what this path exists to avoid, and with
  *      [[Dedup.NumHashes]] components the estimate is exact at 1.0
  *      (identical docs) and unbiased elsewhere — the documented
  *      incremental approximation;
  *   4. survivors pass the corpus-state-free gates
  *      ([[Curation.rowAudit]]); curated rows append to the corpus store,
  *      and ALL non-duplicate signatures append to the signature store —
  *      including gate-rejected docs, so a future copy of a rejected
  *      document is recognized as a duplicate rather than re-admitted.
  *
  * Per-batch cost ∝ batch size + matched candidates, never ∝ corpus
  * history (the store side of the band join is a broadcast-or-shuffle
  * join on band value; at warehouse scale the store would be written
  * bucketed by `band_val` so the probe co-locates). Hot buckets stay
  * bounded because the store holds only near-dup SURVIVORS: an incoming
  * duplicate family collapses against its stored keeper instead of
  * accumulating.
  *
  * Exactly-once follows [[IncrementalMartStream]]: checkpointed file
  * tracking dedupes landed files, and both stores write per-batch
  * directories with overwrite, so an at-least-once replay rewrites
  * identical rows.
  */
object IncrementalCuration {

  /** Estimated Jaccard between two signature rows (prefixes `a`/`b`):
    * the fraction of the [[Dedup.NumHashes]] minhash components that
    * agree. Callers guarantee both sides have shingles (band rows exist
    * only for n_shingles > 0), so the components are non-null.
    */
  private def estJaccard(a: String, b: String): Column =
    (0 until Dedup.NumHashes)
      .map(j => when(col(s"$a.mh_$j") === col(s"$b.mh_$j"), 1).otherwise(0))
      .reduce(_ + _)
      .cast("double") / Dedup.NumHashes

  /** (doc_id, [extra...], band_idx, band_val) from stored signature rows —
    * the signature-store counterpart of the batch path's band explode.
    */
  private def bandsOf(sigs: DataFrame, extra: Seq[String] = Nil): DataFrame =
    sigs.filter(col("n_shingles") > 0)
      .select((col("doc_id") +: extra.map(col)) :+ posexplode(
        array((0 until Dedup.Bands).map(b => col(s"band_$b")): _*))
        .as(Seq("band_idx", "band_val")): _*)

  /** doc_ids of NEW documents that near-duplicate either a stored document
    * or an earlier document of the same batch (earlier = lower doc_id —
    * the same min-id keeper orientation as the batch path). One row per
    * duplicate new doc with its matched keeper and the estimate.
    *
    * Hot buckets: a borderline family (pairwise estimate just under the
    * duplicate threshold) is never collapsed, so its signatures accumulate
    * in the store and can concentrate in one band bucket across batches.
    * A reference-side bucket holding more than `maxBandOccupancy` rows
    * therefore degrades to its ROOT (min doc_id) — each new doc compares
    * against one representative instead of every member, the same star
    * trade as [[Dedup.MaxBandOccupancy]]: linear cost, and a true
    * duplicate of a non-root member no longer links via THAT bucket (its
    * other [[Dedup.Bands]]−1 buckets still can).
    */
  def newDuplicates(newSigs: DataFrame, storeSigs: DataFrame,
      maxBandOccupancy: Int = Dedup.MaxBandOccupancy): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val ref = storeSigs.withColumn("prior", lit(true))
      .unionByName(newSigs.withColumn("prior", lit(false)))
    // Only buckets the BATCH touches matter: occupancy of a bucket no new
    // doc probes is never consumed, so the store's band rows are
    // semi-joined to the batch's distinct bucket keys BEFORE the windows —
    // per-batch cost scales with the touched slice of the store, not with
    // total history.
    val touched = bandsOf(newSigs).select("band_idx", "band_val").distinct()
    // occupancy count + root election ride the same (band_idx, band_val)
    // partitioning the join shuffles on — no extra exchange. The root key
    // leads with the prior flag (stored docs sort first): a new doc with a
    // lower id than every stored member must NOT unseat the stored root,
    // or the whole stored family would be filtered from the bucket and
    // the new duplicate re-admitted.
    val wBucket = Window.partitionBy("band_idx", "band_val")
    val refB = bandsOf(ref, Seq("prior"))
      .join(touched, Seq("band_idx", "band_val"))
      .withColumn("bdf", count(lit(1)).over(wBucket))
      .withColumn("rk", min(struct(
        when(col("prior"), 0).otherwise(1).as("np"),
        col("doc_id"))).over(wBucket))
      .withColumn("broot", col("rk.doc_id"))
    val refKept = refB.filter(
      col("bdf") <= maxBandOccupancy || col("doc_id") === col("broot"))
    val cand = bandsOf(newSigs).as("n")
      .join(refKept.as("o"),
        col("n.band_idx") === col("o.band_idx") &&
          col("n.band_val") === col("o.band_val") &&
          col("n.doc_id") =!= col("o.doc_id"))
      // keeper orientation: a stored doc always beats a new one; within
      // the batch the lower doc_id survives
      .filter(col("o.prior") || col("o.doc_id") < col("n.doc_id"))
      .select(col("n.doc_id").as("new_id"), col("o.doc_id").as("ref_id"))
      .distinct()
    cand
      .join(newSigs.as("a"), col("new_id") === col("a.doc_id"))
      .join(ref.as("b"), col("ref_id") === col("b.doc_id"))
      .select(col("new_id"), col("ref_id"),
        estJaccard("a", "b").as("est_jaccard"))
      .filter(col("est_jaccard") >= Dedup.JaccardDupThreshold)
  }

  /** One batch's outcome: the rows to append plus the funnel counts —
    * captured from actions the batch already runs, so observability costs
    * nothing extra.
    */
  final case class BatchResult(
      curated: DataFrame,
      keptSigs: DataFrame,
      nLanded: Long,
      nUnique: Long,
      nDuplicates: Long,
      nCurated: Long)

  /** Curate one batch against the stores — separated from the streaming
    * loop so the logic is testable without a stream.
    *
    * `priorIds` is the first-write-wins membership relation: doc_ids the
    * store already owns, EXCLUDING the replaying batch's own partition
    * (see [[run]]). Without it a re-crawled document landing in a LATER
    * batch under its stored doc_id bypasses dedup entirely — the only
    * stored row with matching content is its own prior copy, which the
    * candidate join excludes via `n.doc_id =!= o.doc_id` (needed for
    * replay idempotence) — and duplicate doc_id rows would accumulate in
    * both stores, breaking the one-row-per-doc invariant.
    */
  def curateBatch(batch: DataFrame, storeSigs: DataFrame,
      priorIds: Option[DataFrame] = None): BatchResult = {
    // one row per doc_id even if a file and its re-crawl land in the SAME
    // drain (AvailableNow can pull both into one micro-batch): the
    // cross-batch anti-join can't see them, and the dedup self-join
    // excludes same-id matches, so without this guard both copies would
    // survive and multiply through the gate joins. A doc_id the store
    // already owns drops out at the same funnel stage (landed − unique),
    // the ledger's "not novel" bucket.
    val uniq0 = batch.dropDuplicates("doc_id")
    val uniq = priorIds.fold(uniq0)(p =>
      uniq0.join(p.select("doc_id"), Seq("doc_id"), "left_anti"))
    // persist + eager fill: the signature relation feeds the band join,
    // both estimate legs, and the kept-signature anti-join; dupIds (the
    // whole LSH join) feeds both output writes. Without materialization
    // every consumer would re-run tokenize→shingle→minhash from the raw
    // batch (the same reasoning as Dedup.minhashPairs' eager fill).
    val sigs = Dedup.minhashSignatures(uniq).persist()
    val nUnique = sigs.count()
    val dupIds = newDuplicates(sigs, storeSigs)
      .select(col("new_id").as("doc_id")).distinct().persist()
    val nDuplicates = dupIds.count()
    val survivors = uniq.join(dupIds, Seq("doc_id"), "left_anti")
    val gates = Curation.rowAudit(survivors)
    val curated = survivors.join(
      gates.filter(col("curated"))
        .select("doc_id", "quality_score", "split"), Seq("doc_id"))
      .select("doc_id", "lang", "source", "n_chars", "quality_score",
        "split")
    val keptSigs = sigs.join(dupIds, Seq("doc_id"), "left_anti")
    // cut both results loose from the caches (batch-sized blocks, freed by
    // the ContextCleaner once unreachable), then release the legs
    val curatedOut = curated.localCheckpoint()
    val keptOut = keptSigs.localCheckpoint()
    sigs.unpersist(blocking = false)
    dupIds.unpersist(blocking = false)
    BatchResult(curatedOut, keptOut,
      nLanded = batch.count(), nUnique = nUnique,
      nDuplicates = nDuplicates, nCurated = curatedOut.count())
  }

  /** Drain the landing dir (Trigger.AvailableNow), curating each
    * micro-batch against the accumulated stores. Returns the corpus store.
    *
    * @param metricsPath optional per-batch funnel ledger — one row per
    *                    drained batch (landed / unique / duplicate /
    *                    curated counts), the record an operator reads
    *                    before asking why a drain shrank; written with the
    *                    same idempotent per-batch overwrite as the stores
    */
  def run(
      spark: SparkSession,
      landingDir: String,
      checkpointDir: String,
      sigPath: String,
      corpusPath: String,
      docSchema: org.apache.spark.sql.types.StructType,
      metricsPath: Option[String] = None): DataFrame = {
    def exists(p: String): Boolean = StoragePaths.exists(spark, p)
    val emptySigs = Dedup.minhashSignatures(
      spark.createDataFrame(new java.util.ArrayList[Row](), docSchema))
    val q = spark.readStream.schema(docSchema).parquet(landingDir)
      .writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        if (!batch.isEmpty) {
          // drop the discovered batch=N partition column so the store
          // unions cleanly with fresh signature rows. The membership
          // relation EXCLUDES this batch's own partition (same reasoning
          // as IncrementalAnnIndex.run): foreachBatch is at-least-once,
          // and a replay after a crash-post-write must not anti-join the
          // batch against its own previously written rows — that would
          // overwrite batch=N with an empty directory, silent data loss.
          val (store, priorIds) =
            if (exists(sigPath)) {
              val s = spark.read.parquet(sigPath)
              (s.drop("batch"),
                Some(s.filter(col("batch").cast("long") =!= batchId)
                  .select("doc_id")))
            } else (emptySigs, None)
          val r = curateBatch(batch, store, priorIds)
          // per-batch overwrite = idempotent under foreachBatch replay
          r.curated.write.mode("overwrite")
            .parquet(s"$corpusPath/batch=$batchId")
          r.keptSigs.write.mode("overwrite")
            .parquet(s"$sigPath/batch=$batchId")
          metricsPath.foreach { mp =>
            import spark.implicits._
            Seq((batchId, r.nLanded, r.nUnique, r.nDuplicates, r.nCurated))
              .toDF("batch_id", "n_landed", "n_unique", "n_duplicates",
                "n_curated")
              .coalesce(1).write.mode("overwrite")
              .parquet(s"$mp/batch=$batchId")
          }
        }
        ()
      }
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()
    // a drain that landed nothing never creates the store: a legitimate
    // first run over an empty crawl returns an empty corpus, not a crash
    if (exists(corpusPath)) spark.read.parquet(corpusPath).drop("batch")
    else spark.createDataFrame(new java.util.ArrayList[Row](), CorpusSchema)
  }

  /** Schema of the curated corpus store. */
  val CorpusSchema: StructType = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType),
    StructField("quality_score", DoubleType),
    StructField("split", StringType)))
}
