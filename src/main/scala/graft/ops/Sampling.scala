package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Deterministic stratified sampling — the corpus-mixing stage of a
  * training-data pipeline (down-weight the over-represented stratum,
  * up-weight the rare one; the CCNet/Brown-et-al. language-rebalancing
  * shape). Membership is a pure function of the row key: the portable
  * 60-bit md5 hash mod 1e6 compared against an integerized per-stratum
  * threshold ([[Portable.sampleRates]]). No RNG, no state — the same row
  * lands in the same side on every run, on any cluster, in any engine,
  * which is what makes a 100 TB sample reproducible, resumable after
  * partial failure, and auditable. A narrow projection: no shuffle for
  * assignment; one hash aggregation for the summary.
  */
object Sampling {

  /** Hash bucket in [0, [[Portable.SampleMod]]) for the sampling decision —
    * exposed so composed pipelines ([[Curation]]) can evaluate the gate in
    * the same scan as other row-level stages.
    */
  private[ops] def bucketExpr(stratumCol: String): String =
    s"${hexcastSpark(s"concat('sample:', $stratumCol, ':', CAST(doc_id AS STRING))")} % $SampleMod"

  private[ops] def thresholdExpr(stratumCol: String): String =
    s"CAST(${sampleThresholdCase(stratumCol)} AS BIGINT)"

  /** Per-row assignment: stratum, hash bucket, threshold, and the keep flag.
    * Emitting the bucket (not just the flag) keeps the decision auditable —
    * a reader can verify `kept = bucket < threshold` row by row.
    */
  def stratifiedAssign(docs: DataFrame, stratumCol: String = "lang"): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"$stratumCol AS stratum",
      s"${bucketExpr(stratumCol)} AS bucket",
      s"${thresholdExpr(stratumCol)} AS threshold")
      .withColumn("kept", col("bucket") < col("threshold"))

  /** The sampled corpus itself: input rows whose hash falls under the
    * stratum threshold. The keep decision is row-local, so membership is a
    * WHERE over one narrow scan — joining back through the assignment
    * relation would shuffle the corpus on doc_id just to re-attach rows to
    * their own flag.
    */
  def stratifiedSample(docs: DataFrame, stratumCol: String = "lang"): DataFrame =
    docs.where(expr(
      s"${bucketExpr(stratumCol)} < ${thresholdExpr(stratumCol)}"))

  /** Realized-vs-target mix per stratum: total rows, kept rows, the target
    * rate, and the realized rate. One hash agg; the realized/target gap is
    * the binomial noise a reviewer checks before a 100 TB run.
    */
  def sampleSummary(docs: DataFrame, stratumCol: String = "lang"): DataFrame =
    stratifiedAssign(docs, stratumCol)
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        (max("threshold").cast("double") / lit(SampleMod.toDouble)).as("target_rate"))
      .withColumn("realized_rate",
        col("n_kept").cast("double") / col("n_total"))
      .orderBy("stratum")

  /** Thresholds DERIVED from a target size per stratum — the "give me N
    * docs per language" mix, where the rate is a function of the observed
    * stratum count instead of a fixed table. Integer ceiling division
    * (`(target·mod + n − 1) div n`, capped at the modulus) keeps the
    * boundary float-free in both engines; ceiling biases toward AT LEAST
    * the expected target under hash-bucket noise. One tiny aggregate —
    * [[Portable.SampleMod]] buckets mean the threshold relation is one row
    * per stratum, broadcast back onto the corpus.
    */
  def targetThresholds(docs: DataFrame, targetPerStratum: Long,
      stratumCol: String = "lang"): DataFrame = {
    require(targetPerStratum > 0,
      s"targetThresholds: target must be positive, got $targetPerStratum")
    docs.groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_total"))
      .withColumn("threshold", least(lit(SampleMod), expr(
        s"(${targetPerStratum * SampleMod}L + n_total - 1) div n_total")))
      .select("stratum", "n_total", "threshold")
  }

  /** Per-source document cap in [[sourceCap]]: 10 fits the driver corpus
    * (20 sources × 25 docs at sf0.01 — a real cut); production crawls run
    * thousands per domain.
    */
  val SourceCapK = 10

  /** Per-source document cap (the RefinedWeb/Dolma domain-cap stage): keep
    * at most `cap` documents per source, elected in deterministic
    * pseudo-random order — the portable hash of `cap:<source>:<doc_id>`,
    * ties broken by doc_id — so the SAME documents survive on every run
    * and engine: a hash-ordered reservoir with no RNG and no state. This
    * runs before corpus assembly so a single hot domain (a boilerplate
    * mill, a link farm) cannot dominate the training mix regardless of
    * how many documents it contributes.
    *
    * Scale shape: the rank input is a narrow `(doc_id, source, hash)`
    * projection (the scan prunes to two columns) and the rank-limit plans
    * as a partial-then-final WindowGroupLimit — each partition sheds
    * beyond-cap rows locally before the shuffle, so a 10⁹-document
    * domain crosses the wire as ~`cap` rows per input partition, never
    * 10⁹. The emitted `cap_hash` keeps the election auditable row by row
    * (same contract as [[stratifiedAssign]]'s bucket).
    */
  def sourceCap(docs: DataFrame, cap: Int = SourceCapK): DataFrame = {
    require(cap > 0, s"sourceCap: cap must be positive, got $cap")
    docs.selectExpr("doc_id", "source",
        s"${hexcastSpark("concat('cap:', source, ':', CAST(doc_id AS STRING))")} AS cap_hash")
      .withColumn("src_rank", row_number().over(
        Window.partitionBy("source").orderBy("cap_hash", "doc_id")))
      .filter(col("src_rank") <= cap)
      .select(col("doc_id"), col("source"), col("cap_hash"),
        col("src_rank").cast("long").as("src_rank"))
  }

  /** Per-stratum thresholds for TEMPERATURE rebalancing (the multilingual
    * pretraining mix of XLM-R, Conneau et al. 2020 §5.1, and mT5, Xue et
    * al. 2021: sample stratum s with probability ∝ p_s^α). As a
    * deterministic THINNING — no stratum can be upsampled by dropping
    * rows — the rate normalizes so the rarest stratum keeps everything:
    * `rate_s = (n_min / n_s)^(1−α)`, which realizes q ∝ p^α exactly.
    *
    * α is pinned to 1/2, spelled `sqrt(n_min / n_s)` in BOTH engines:
    * integer-exact counts, one correctly-rounded IEEE division, one
    * correctly-rounded IEEE sqrt, one multiply by the exact 1e6 modulus,
    * then floor — every step is bit-reproducible across engines, which a
    * `pow(x, 0.3)` (implementation-defined rounding) is not. One tiny
    * aggregate per stratum plus a 1-row broadcast for the minimum; the
    * threshold relation is one row per stratum.
    */
  def temperatureThresholds(docs: DataFrame,
      stratumCol: String = "lang"): DataFrame =
    docs
      // the mix estimate is over REAL strata: a NULL stratum is a data
      // defect (its rows keep NULL assignments downstream), and letting
      // it form a group could make it the "rarest stratum" and silently
      // thin every real one
      .filter(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol).as("stratum"))
      .agg(count(lit(1)).as("n_total"))
      // corpus-wide minimum via a global window over the PER-STRATUM
      // relation — one row per stratum (a mixing config's cardinality,
      // bounded-small by definition), so the single-partition window costs
      // nothing and the corpus is scanned exactly ONCE (a second
      // `docs.groupBy().agg(min)` leg would re-scan 100 TB for one number)
      .withColumn("n_min", min("n_total").over(
        Window.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)))
      .withColumn("threshold",
        floor(lit(SampleMod.toDouble) *
          sqrt(col("n_min").cast("double") / col("n_total"))).cast("long"))
      .select("stratum", "n_total", "threshold")

  /** Per-row temperature-sampling assignment — the auditable
    * (bucket, threshold, kept) contract of [[stratifiedAssign]], with the
    * threshold joined from [[temperatureThresholds]] (broadcast: one row
    * per stratum) and an independent hash salt so the temperature decision
    * is uncorrelated with the fixed-rate sampler's. LEFT join: a NULL
    * stratum keeps its audit row with NULL threshold/kept.
    */
  def temperatureAssign(docs: DataFrame,
      stratumCol: String = "lang"): DataFrame =
    temperatureAssignWith(docs,
      temperatureThresholds(docs, stratumCol), stratumCol)

  /** [[temperatureAssign]] against an EXPLICIT threshold table — the
    * frozen-seam entry point ([[graft.streaming.IncrementalTemperature]]
    * scores every batch against the bootstrap table). Unseen-stratum
    * convention: a stratum absent from the table is RARER than anything
    * the table saw, and the α-mix keeps its rarest stratum whole — so
    * absent strata coalesce to the keep-everything threshold
    * ([[Portable.SampleMod]]) rather than silently dropping (the
    * complete-bucket-table discipline of [[Dsir]]/[[QualityClassifier]],
    * transposed to a seam whose row space cannot be enumerated up front).
    * A NULL stratum still propagates NULL bucket/kept — that is a data
    * defect to surface, not a rare stratum.
    */
  def temperatureAssignWith(docs: DataFrame, thresholds: DataFrame,
      stratumCol: String = "lang"): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"$stratumCol AS stratum",
      s"${hexcastSpark(s"concat('temp:', $stratumCol, ':', CAST(doc_id AS STRING))")} % $SampleMod AS bucket")
      .join(broadcast(thresholds.select("stratum", "threshold")),
        Seq("stratum"), "left")
      .withColumn("threshold", when(col("stratum").isNotNull,
        coalesce(col("threshold"), lit(SampleMod))))
      .withColumn("kept", col("bucket") < col("threshold"))
      .select("doc_id", "stratum", "bucket", "threshold", "kept")

  /** Realized-vs-target temperature mix per stratum — same report shape as
    * [[sampleSummary]]; the reviewer's check that the α=1/2 rebalance hit
    * its rates before a 100 TB run commits to them.
    */
  def temperatureSummary(docs: DataFrame,
      stratumCol: String = "lang"): DataFrame =
    temperatureSummaryOf(temperatureAssign(docs, stratumCol))

  /** Summary tail over an assignment relation — shared with the
    * incremental twin's ledger report so the two cannot diverge.
    */
  private[graft] def temperatureSummaryOf(assign: DataFrame): DataFrame =
    assign
      .groupBy("stratum")
      .agg(
        count(lit(1)).as("n_total"),
        sum(when(col("kept"), 1L).otherwise(0L)).as("n_kept"),
        (max("threshold").cast("double") / lit(SampleMod.toDouble)).as("target_rate"))
      .withColumn("realized_rate",
        col("n_kept").cast("double") / col("n_total"))
      .orderBy("stratum")

  /** Per-row assignment against [[targetThresholds]] — same auditable
    * (bucket, threshold, kept) contract as [[stratifiedAssign]], with the
    * threshold joined from the derived per-stratum relation (broadcast: one
    * row per stratum). LEFT join: a NULL stratum never equi-joins, and the
    * one-row-per-input-doc audit invariant must survive it (such rows keep
    * a NULL threshold and NULL kept, exactly like [[stratifiedAssign]]'s
    * null-propagating bucket).
    */
  def targetAssign(docs: DataFrame, targetPerStratum: Long,
      stratumCol: String = "lang"): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"$stratumCol AS stratum",
      s"${bucketExpr(stratumCol)} AS bucket")
      .join(broadcast(
        targetThresholds(docs, targetPerStratum, stratumCol)
          .select("stratum", "threshold")), Seq("stratum"), "left")
      .withColumn("kept", col("bucket") < col("threshold"))
      .select("doc_id", "stratum", "bucket", "threshold", "kept")
}
