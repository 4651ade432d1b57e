package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Deterministic content-hash sampling and dataset splits — the
  * reproducibility-critical operators of a training-data pipeline.
  * `DataFrame.sample`/`randomSplit` depend on partition layout and seed
  * plumbing; hashing the CONTENT gives splits that are stable across
  * cluster sizes, re-runs, and engines (the DuckDB oracle reproduces them
  * exactly), and automatically keep exact duplicates in the same split
  * (no train/test leakage between identical documents).
  */
object HashSplit {

  val Buckets = 100
  /** train/val/test bucket boundaries: [0,90) / [90,95) / [95,100). */
  val TrainUpper = 90
  val ValUpper = 95

  /** Stable bucket in [0, [[Buckets]]) from the document content — exposed
    * so composed pipelines ([[Curation]]) can evaluate the split in the
    * same scan as other row-level stages.
    */
  private[ops] def bucketExpr: String =
    s"CAST(${hexcastSpark("text")} % $Buckets AS INT)"

  /** train/val/test label from a content bucket column. */
  private[ops] def splitFromBucket(b: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    when(b < TrainUpper, "train").when(b < ValUpper, "val").otherwise("test")

  /** Reproducible p-percent sample (buckets [0, pct)). */
  def sampleByHash(docs: DataFrame, pct: Int): DataFrame =
    docs.withColumn("bucket", expr(bucketExpr))
      .filter(col("bucket") < pct)
      .select(col("doc_id"), col("bucket"))

  /** Train/val/test assignment per document. */
  def split(docs: DataFrame): DataFrame =
    docs.withColumn("bucket", expr(bucketExpr))
      .withColumn("split", splitFromBucket(col("bucket")))
      .select("doc_id", "bucket", "split")

  /** Split-size audit: counts and fractions per split. */
  def splitSummary(docs: DataFrame): DataFrame = {
    val total = docs.count()
    split(docs).groupBy("split")
      .agg(count(lit(1)).as("n_docs"))
      .withColumn("fraction", col("n_docs").cast("double") / total)
  }

  /** Train/test contamination: training-split documents whose word-3-gram
    * shingles overlap a test-split document (the GPT-3-style n-gram
    * decontamination check — Brown et al. 2020, appendix C). Joins through
    * the inverted hashed-shingle index, so only genuinely overlapping pairs
    * materialize; one row per contaminated train doc with the overlap
    * evidence.
    *
    * Shingles with document frequency > `maxDf` (over the WHOLE corpus,
    * before the split) are excluded: a boilerplate shingle present in every
    * document is not contamination evidence, and one such key joins every
    * train doc to every test doc — the quadratic hot-key blowup
    * ([[Dedup.MaxShingleDf]]; GPT-3's decontamination drops the most
    * frequent n-grams for the same reason). Mirrored in the DuckDB oracle.
    */
  def contaminatedTrainDocs(docs: DataFrame, minShared: Int = 1,
      maxDf: Int = Dedup.MaxShingleDf): DataFrame =
    contaminatedTrainDocsFrom(docs, Dedup.docShingles(docs), minShared, maxDf)

  /** [[contaminatedTrainDocs]] over an EXPLICIT shingle relation — the
    * [[Dedup.docShingles]] share seam (the battery memoizes ONE shingle
    * relation across the dedup/contamination consumers). Result is
    * eagerly materialized.
    */
  private[graft] def contaminatedTrainDocsFrom(docs: DataFrame,
      shingles: DataFrame, minShared: Int = 1,
      maxDf: Int = Dedup.MaxShingleDf): DataFrame = {
    // persist + eager materialize: the split-annotated shingle relation
    // feeds the df cap's two scans AND both self-join legs; without it
    // the split filters push into each leg and the whole pipeline runs
    // twice. The df cap itself is [[Dedup.dfCapped]] (groupBy partials +
    // broadcast anti-join), never a partitionBy(h) window: a corpus-wide
    // boilerplate shingle is exactly the mega-key a window would buffer
    // through one task.
    val raw = shingles
      .join(split(docs).select("doc_id", "split"), Seq("doc_id"))
      .persist()
    raw.count()
    val sh = Dedup.dfCapped(raw, "h", maxDf).persist()
    sh.count()
    raw.unpersist(blocking = false)
    val train = sh.filter(col("split") === "train").select("doc_id", "h")
    val test = sh.filter(col("split") === "test")
      .select(col("doc_id").as("test_doc_id"), col("h"))
    Dedup.materializeFreeing(
      train.join(test, Seq("h"))
        .groupBy(col("doc_id").as("train_doc_id"), col("test_doc_id"))
        .agg(count(lit(1)).as("n_shared"))
        .filter(col("n_shared") >= minShared)
        .groupBy("train_doc_id")
        .agg(countDistinct(col("test_doc_id")).as("n_test_docs"),
          max(col("n_shared")).as("max_shared_shingles"),
          min(col("test_doc_id")).as("example_test_doc")),
      sh)
  }

  /** SEMANTIC decontamination — the embedding-space complement of
    * [[contaminatedTrainDocs]]: a paraphrased or translated copy of a test
    * document shares no 3-gram shingles but sits next to it in embedding
    * space, so n-gram decontamination alone misses it (the eval-leakage
    * mode motivating cosine-based contamination checks). Flags TRAIN-split
    * documents whose embedding cosine against ANY test-split document
    * clears the near-dup threshold, via the banded cross-set probe of
    * [[Similarity.crossSetContamination]] (test side broadcast — eval sets
    * are orders of magnitude smaller than the corpus).
    *
    * `(doc_id, n_test_hits, max_cos)`, one row per contaminated train doc.
    */
  def semanticContamination(docs: DataFrame, emb: DataFrame): DataFrame = {
    val sp = split(docs).select("doc_id", "split")
    def side(name: String) = emb
      .join(sp.filter(col("split") === name), col("vec_id") === col("doc_id"))
      .select("vec_id", "embedding")
    Similarity.crossSetContamination(side("train"), side("test"))
      .select(col("vec_id").as("doc_id"),
        col("n_probe_hits").as("n_test_hits"), col("max_cos"))
  }

  val ShardTokenBudget = 20000L
  /** Floor on the range-partition width for the distributed prefix sum. */
  val ShardRangeParts = 32

  /** Pack documents into fixed-token-budget training shards, in doc_id
    * order: shard_id = (global token offset at the document's START) div
    * budget — every document lands in exactly one shard, shards are
    * contiguous in doc order, and a shard's total can exceed the budget by
    * at most one document (standard greedy packing).
    *
    * The global running sum is a two-phase DISTRIBUTED prefix sum, not a
    * single-partition global window (`Window.orderBy` with no partition
    * moves the whole corpus through one task — the classic scale trap):
    *  1. a range-bucket id is computed as a PURE EXPRESSION of doc_id,
    *     against approximate-quantile boundaries collected once (a tiny
    *     driver-side array) — both plan legs below derive identical
    *     buckets by construction, with no repartition sampling to pin down
    *     and no checkpoint blocks to leak;
    *  2. per-bucket running sums in parallel
    *     (`Window.partitionBy(bucket).orderBy(doc_id)`);
    *  3. per-bucket TOTALS — one row each — prefix-summed on a single tiny
    *     partition and broadcast back as offsets.
    * The result is invariant to boundary placement (only load balance
    * depends on it), so re-runs at any parallelism produce identical
    * shards, and the DuckDB oracle's plain cumulative window reproduces
    * them exactly.
    */
  def tokenShards(docs: DataFrame,
      budget: Long = ShardTokenBudget,
      numParts: Int = 0): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val t = docs.select(col("doc_id"),
      expr(s"CAST(size($tokensSpark) AS BIGINT)").as("n_tok"))
    // partition width scales with the input/cluster (caller-overridable) —
    // a fixed width would turn back into a constant-parallelism funnel
    val parts =
      if (numParts > 0) numParts
      else math.max(math.max(ShardRangeParts, t.rdd.getNumPartitions),
        docs.sparkSession.sparkContext.defaultParallelism)
    val bounds = docs.select(col("doc_id").cast("double").as("d"))
      .stat.approxQuantile("d",
        (1 until parts).map(_.toDouble / parts).toArray, 0.001)
      .map(_.toLong).distinct.sorted
    val pid = bounds.foldLeft(lit(0))((acc, b) =>
      acc + when(col("doc_id") > b, 1).otherwise(0))
    val bucketed = t.withColumn("pid", pid)
    val local = bucketed.withColumn("local_cum",
      sum(col("n_tok")).over(Window.partitionBy("pid").orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, 0)))
    val offsets = bucketed.groupBy("pid").agg(sum(col("n_tok")).as("ptot"))
      .withColumn("offset",
        coalesce(sum(col("ptot")).over(Window.orderBy("pid")
          .rowsBetween(Window.unboundedPreceding, -1)), lit(0L)))
      .select("pid", "offset") // one row per range partition — broadcast side
    local.join(broadcast(offsets), Seq("pid"))
      .withColumn("cum_tokens", col("local_cum") + col("offset"))
      .withColumn("shard_id",
        expr(s"CAST((cum_tokens - n_tok) DIV $budget AS BIGINT)"))
      .select("doc_id", "n_tok", "cum_tokens", "shard_id")
  }
}
