package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** DSIR — data selection with importance resampling (Xie, Santurkar, Ma,
  * Liang; NeurIPS 2023): select raw-corpus documents whose hashed n-gram
  * distribution resembles a TARGET distribution, by scoring each document
  * with the log importance weight
  *
  *   log w(d) = Σ_f n_f(d) · (log p_target(f) − log p_raw(f))
  *
  * over hashed unigram+bigram features f with add-1 smoothing. Here the
  * target is the corpus' own `lang = 'en'` slice (the "looks like the
  * high-resource target domain" selection); the raw distribution is the
  * whole corpus. [[select]] applies the paper's Gumbel perturbation, so
  * selection is importance *resampling*, not a hard top-cut.
  *
  * Determinism/scale choices:
  *
  *  - Per-feature log-ratios are integerized ONCE in the ≤[[Buckets]]-row
  *    ratio table (`floor(lr × 1e6)`), so every per-document weight is an
  *    exact integer sum — order-independent, hash-comparable across
  *    engines, and safe under any aggregation tree. (A float Σ over
  *    hundreds of ±log-ratios re-associates differently per engine and can
  *    cancel catastrophically.)
  *  - The ratio table is a broadcast constant (the feature space is hashed
  *    into [[Buckets]] buckets precisely so this is true at ANY corpus
  *    size — Xie et al. hash into 10^4 buckets for the same reason); the
  *    corpus-side cost is one gram explode + two hash aggregates.
  *  - Selection is a PER-ROW threshold on the Gumbel-perturbed weight —
  *    no global sort/rank anywhere (an exact global top-fraction would
  *    funnel 10^10 id-width rows through one ranking task). The threshold
  *    [[SelectTauMicro]] is the calibration knob; [[summary]] reports the
  *    achieved fraction, which is how a 100 TB run tunes τ offline.
  */
object Dsir {

  /** Hashed feature buckets (unigram+bigram space → 2^10). */
  val Buckets = 1024
  /** The target slice: documents whose lang marks them as the domain to
    * resemble.
    */
  val TargetLang = "en"
  /** Additive-smoothing pseudo-count (add-1 / Laplace). */
  val Alpha = 1
  /** Selection threshold on `logweight_micro + gumbel_micro` — calibrated
    * on the sf corpora to admit roughly the en-like quarter of documents.
    */
  val SelectTauMicro: Long = 0L
  /** Micro fixed-point scale shared by the ratio table and the Gumbel
    * perturbation.
    */
  val Micro: Long = 1000000L

  /** `(doc_id, [lang,] bucket, n)` hashed n-gram counts per document.
    * Bucket = 60-bit md5 of the `<n>:`-prefixed gram, mod [[Buckets]] —
    * the literal prefix keeps unigram and bigram spaces disjoint without
    * any dialect-specific integer→string cast. The `lang` label is a
    * TRAINING-time input (the ratio table needs the target slice);
    * scoring does NOT require it — a post-bootstrap crawl batch under the
    * frozen-table seam is scored on `doc_id, text` alone.
    */
  private[graft] def featureCounts(docs: DataFrame,
      labeled: Boolean = true): DataFrame = {
    val keys = if (labeled) Seq("doc_id", "lang") else Seq("doc_id")
    val base = docs.selectExpr(keys :+ s"$tokensSpark AS toks": _*)
    val uni = base.selectExpr(keys :+ "explode(toks) AS gram": _*)
      .selectExpr(keys :+
        s"${hexcastSpark("concat('1:', gram)")} % $Buckets AS bucket": _*)
    // sequence(1, 0) DESCENDS in Spark — the size guard is load-bearing
    // (the graft.ops.TextAnalysis.repetition convention)
    val bi = base.selectExpr(keys :+
      s"""explode(IF(size(toks) >= 2,
         |  transform(sequence(1, size(toks) - 1),
         |            i -> array_join(slice(toks, i, 2), ' ')),
         |  array())) AS gram""".stripMargin: _*)
      .selectExpr(keys :+
        s"${hexcastSpark("concat('2:', gram)")} % $Buckets AS bucket": _*)
    uni.unionAll(bi)
      .groupBy((keys :+ "bucket").map(col): _*)
      .agg(count(lit(1)).as("n"))
  }

  /** The [[Buckets]]-row integerized log-ratio table
    * `(bucket, ct, cr, lr_micro)`: raw and target occurrence totals plus
    * `floor((ln p_target − ln p_raw) × 1e6)` with add-[[Alpha]] smoothing.
    *
    * COMPLETE over the hashed feature space: buckets the training corpus
    * never produced still get their smoothed estimate
    * `ln(α/(tot_ct+αB)) − ln(α/(tot_cr+αB))` — that is what the paper's
    * estimator assigns them, and under the frozen-table seam a
    * post-bootstrap gram in an unseen bucket must weigh that constant,
    * not silently vanish from the document's sum. (Batch mode is
    * unaffected: the scoring join only ever matches observed buckets.)
    * An empty feature relation still yields an EMPTY table (the `tot_cr
    * > 0` guard), so a text-less bootstrap batch cannot freeze a vacuous
    * all-zero table.
    */
  private[graft] def ratioTable(feats: DataFrame): DataFrame = {
    val observed = feats.groupBy("bucket").agg(
      sum("n").as("cr"),
      coalesce(sum(when(col("lang") === TargetLang, col("n"))), lit(0L))
        .as("ct"))
    val perBucket = feats.sparkSession.range(Buckets).toDF("bucket")
      .join(observed, Seq("bucket"), "left")
      .select(col("bucket"),
        coalesce(col("ct"), lit(0L)).as("ct"),
        coalesce(col("cr"), lit(0L)).as("cr"))
    val totals = perBucket.agg(
      sum("cr").as("tot_cr"), sum("ct").as("tot_ct"))
    perBucket.crossJoin(broadcast(totals))
      .filter(col("tot_cr") > 0)
      .selectExpr("bucket", "ct", "cr",
        s"""CAST(floor((ln(CAST(ct + $Alpha AS DOUBLE) / (tot_ct + ${Alpha * Buckets}))
           |  - ln(CAST(cr + $Alpha AS DOUBLE) / (tot_cr + ${Alpha * Buckets}))) * $Micro) AS BIGINT)
           |  AS lr_micro""".stripMargin)
  }

  /** Per-document DSIR log importance weight:
    * `(doc_id, n_grams, logweight_micro)` — an exact integer Σ n·lr over
    * the broadcast ratio table; documents with no grams weight 0.
    *
    * Deliberately TWO passes over the gram relation (one aggregating the
    * ratio table, one scoring): DSIR needs global target/raw statistics
    * before any document can be scored, so a second scan is inherent —
    * and re-tokenizing is cheaper at corpus scale than materializing the
    * ~10²-rows-per-document feature relation just to read it twice.
    */
  def weights(docs: DataFrame): DataFrame =
    weightsWith(docs, ratioTable(featureCounts(docs)))

  /** [[weights]] against an EXPLICIT ratio table `(bucket, lr_micro)` —
    * the FROZEN-table seam: [[graft.streaming.IncrementalDsir]] scores
    * each arriving batch against the table its bootstrap froze (scoring
    * drift is silent selection drift), exactly as
    * [[graft.streaming.IncrementalPqIndex]] encodes against its frozen
    * codebook.
    */
  def weightsWith(docs: DataFrame, lrTable: DataFrame): DataFrame = {
    val lr = lrTable.select("bucket", "lr_micro")
    val perDoc = featureCounts(docs, labeled = false)
      .join(broadcast(lr), Seq("bucket"))
      .groupBy("doc_id")
      .agg(sum("n").as("n_grams"),
        sum(col("n") * col("lr_micro")).as("logweight_micro"))
    docs.select("doc_id").join(perDoc, Seq("doc_id"), "left")
      .select(col("doc_id"),
        coalesce(col("n_grams"), lit(0L)).as("n_grams"),
        coalesce(col("logweight_micro"), lit(0L)).as("logweight_micro"))
  }

  /** Per-token-row DSIR contribution over a shared `(doc_id, tok, tok2)`
    * pair relation — the ONE-SCAN ensemble seam
    * ([[Curation.learnedAuditWith]]): each row carries its unigram bucket
    * (`1:` salt) and, when a successor token exists, the consecutive
    * bigram bucket (`2:` salt over the space-joined pair — the exact
    * [[featureCounts]] gram string; the concat null-propagates on the
    * last token row). Two left joins against the broadcast ratio table.
    */
  private[graft] def pairScore(pairs: DataFrame, lrTable: DataFrame): DataFrame = {
    val lr = lrTable.select("bucket", "lr_micro")
    pairs
      .withColumn("_d1",
        expr(s"${hexcastSpark("concat('1:', tok)")} % $Buckets"))
      .withColumn("_d2",
        expr(s"${hexcastSpark("concat('2:', concat(tok, ' ', tok2))")} % $Buckets"))
      .join(broadcast(lr.select(col("bucket").as("_d1"),
        col("lr_micro").as("_dsir_lr1"))), Seq("_d1"), "left")
      .join(broadcast(lr.select(col("bucket").as("_d2"),
        col("lr_micro").as("_dsir_lr2"))), Seq("_d2"), "left")
      .drop("_d1", "_d2")
  }

  /** The aggregate legs reading [[pairScore]]'s columns inside the shared
    * `groupBy(doc_id)`: gram count (unigrams + consecutive bigrams) and
    * the exact integer Σ lr. Identical to [[weightsWith]]'s per-bucket
    * formulation over a COMPLETE ratio table (the only kind the frozen
    * seam admits): every non-null bucket matches, so the left-join
    * coalesce is the inner join's arithmetic.
    */
  private[graft] def pairAggs: Seq[org.apache.spark.sql.Column] = Seq(
    (count(lit(1)) + sum(when(col("tok2").isNotNull, 1L).otherwise(0L)))
      .as("n_grams"),
    (sum(coalesce(col("_dsir_lr1"), lit(0L))) +
      sum(when(col("tok2").isNotNull, coalesce(col("_dsir_lr2"), lit(0L)))
        .otherwise(0L))).as("logweight_micro"))

  /** Deterministic per-document Gumbel noise in micro fixed-point:
    * `g = −ln(−ln(u))` with `u = (md5₆₀("dsir:" + doc_id) mod 1e6 + 0.5) /
    * 1e6` — the hashed stand-in for the i.i.d. Gumbel draw of the paper's
    * top-k sampling, reproducible across engines and re-runs.
    */
  private def gumbelMicroSql(castStr: String => String): String =
    s"""CAST(floor(-ln(-ln(
       |  (CAST(${hexcastSpark(s"concat('dsir:', ${castStr("doc_id")})")} % $Micro AS DOUBLE)
       |    + CAST(0.5 AS DOUBLE)) / $Micro)) * $Micro) AS BIGINT)""".stripMargin

  /** Importance-resampled selection: documents whose Gumbel-perturbed
    * log-weight clears [[SelectTauMicro]] —
    * `(doc_id, logweight_micro, gumbel_micro, key_micro)`.
    */
  def select(docs: DataFrame): DataFrame =
    selectWith(docs, ratioTable(featureCounts(docs)))

  /** [[select]] against an EXPLICIT ratio table — the frozen-table seam
    * (see [[weightsWith]]).
    */
  def selectWith(docs: DataFrame, lrTable: DataFrame): DataFrame =
    selectFromWeights(weightsWith(docs, lrTable))

  /** The resampled selection over an ALREADY-WEIGHTED relation — the
    * seam a battery memoizing [[weightsWith]]'s output reads (one
    * weighting pass feeds weights, select, and summary rows).
    */
  private[graft] def selectFromWeights(w: DataFrame): DataFrame =
    keyed(w)
      .filter(col("key_micro") >= SelectTauMicro)
      .select("doc_id", "logweight_micro", "gumbel_micro", "key_micro")

  /** The Gumbel-perturbed selection key over a weight relation —
    * `(…, gumbel_micro, key_micro)`.
    */
  private[graft] def keyed(w: DataFrame): DataFrame =
    w.withColumn("gumbel_micro",
        expr(gumbelMicroSql(c => s"CAST($c AS STRING)")))
      .withColumn("key_micro", col("logweight_micro") + col("gumbel_micro"))

  /** The trained ratio table over a corpus — [[ratioTable]] ∘
    * [[featureCounts]] named as the train step, so a battery can
    * materialize it ONCE and feed every consumer through the frozen-table
    * seams ([[weightsWith]]/[[selectWith]]/[[summaryWith]]), exactly as
    * [[graft.streaming.IncrementalDsir]] freezes it at bootstrap.
    */
  def trainedRatioTable(docs: DataFrame): DataFrame =
    ratioTable(featureCounts(docs))

  /** Calibration surface: corpus size, selected count, and the weight
    * envelope — order-independent aggregates only.
    */
  def summary(docs: DataFrame): DataFrame =
    summaryWith(docs, trainedRatioTable(docs))

  /** [[summary]] against an EXPLICIT ratio table — the frozen-table seam
    * (see [[weightsWith]]).
    */
  def summaryWith(docs: DataFrame, lrTable: DataFrame): DataFrame =
    summaryFromWeights(weightsWith(docs, lrTable))

  /** [[summary]] over an already-weighted relation (see
    * [[selectFromWeights]]).
    */
  private[graft] def summaryFromWeights(weights: DataFrame): DataFrame = {
    val w = keyed(weights)
    w.agg(
      count(lit(1)).as("n_docs"),
      sum(when(col("key_micro") >= SelectTauMicro, 1L).otherwise(0L))
        .as("n_selected"),
      min("logweight_micro").as("min_logweight_micro"),
      max("logweight_micro").as("max_logweight_micro"))
  }
}
