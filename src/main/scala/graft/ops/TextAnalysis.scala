package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** Text-analysis operators over the `documents` table (doc_id, text, lang,
  * source, n_chars) — the per-document scoring stage of a training-data
  * curation pipeline (beyond the reference's stock models; mandated
  * extension). Everything is built from codegen'd built-ins — tokenization
  * via `regexp_extract_all`, per-document reductions via higher-order array
  * functions — so the whole stage is a single narrow projection: no shuffle,
  * no UDF, embarrassingly parallel over document partitions at 100 TB.
  */
object TextAnalysis {

  /** Token counting: whitespace tokens, BPE-ish pre-tokens, char stats. */
  def tokenStats(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokensSpark))
      .withColumn("nonspace",
        expr("CAST(length(regexp_replace(text, '\\\\s', '')) AS BIGINT)"))
      .selectExpr(
        "doc_id",
        "CAST(length(text) AS BIGINT) AS n_chars",
        "nonspace AS n_nonspace_chars",
        "CAST(size(toks) AS BIGINT) AS n_ws_tokens",
        s"CAST(size($bpeSpark) AS BIGINT) AS n_bpe_tokens",
        "CAST(size(array_distinct(toks)) AS BIGINT) AS n_distinct_tokens",
        "CAST(nonspace AS DOUBLE) / nullif(size(toks), 0) AS avg_token_len")

  /** SQL array literal of a vocabulary — splatted into the expression
    * call so the vocabulary folds at plan build. Escaped for SPARK's
    * lexer (backslash doubled FIRST, then quote doubled — probed: a lone
    * backslash silently transforms the literal, `''` works): a TRAINED
    * vocabulary's character floor contains every punctuation character
    * the corpus used, quote and backslash included, so unescaped splats
    * corrupt exactly the code/URL-heavy corpora subword pricing targets.
    * Spark-side only — the DuckDB oracle mirror has DIFFERENT rules
    * (backslash is literal there) and builds its own literals.
    */
  private[graft] def vocabSqlOf(vocab: Seq[String]): String =
    vocab.map(p =>
      "'" + p.replace("\\", "\\\\").replace("'", "''") + "'")
      .mkString("array(", ", ", ")")

  private[graft] val subwordVocabSql: String = vocabSqlOf(subwordVocab)

  /** The subword token count of a document's text as a SQL expression —
    * [[Portable.bpeSpark]] pre-tokens through the native
    * `graft_subword_count` kernel (greedy longest-match WordPiece over
    * the folded [[Portable.subwordVocab]]). The opt-in `n_tokens` source
    * for [[Packing]] / token shards: subword counts are what a trainer's
    * budget actually meters.
    */
  val subwordCountSql: String =
    s"graft_subword_count($bpeSpark, $subwordVocabSql, $SubwordMaxWordLen)"

  /** [[subwordCountSql]] under an arbitrary vocabulary — what a deployment
    * passes once it has TRAINED one ([[graft.ops.SubwordTrain]]).
    */
  def subwordCountSqlWith(vocab: Seq[String]): String =
    s"graft_subword_count($bpeSpark, ${vocabSqlOf(vocab)}, $SubwordMaxWordLen)"

  /** Per-document subword token counts beside the proxy counts they
    * correct: `(doc_id, n_bpe_tokens, n_subwords)` — `n_subwords ≥
    * n_bpe_tokens` except where [UNK] collapses a word (asserted in the
    * spec). One narrow projection, no shuffle, like every operator here.
    */
  def subwordTokens(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"CAST(size($bpeSpark) AS BIGINT) AS n_bpe_tokens",
      s"$subwordCountSql AS n_subwords")

  /** [[subwordTokens]] under the LEARNED fixture vocabulary
    * ([[Portable.trainedFixtureVocab]] — the distributed BPE trainer's
    * pinned output): the battery leg proving a TRAINED inventory — the
    * one a real deployment serves — round-trips the cross-engine kernel,
    * not just the hand-built fixture.
    */
  def subwordTokensTrained(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"CAST(size($bpeSpark) AS BIGINT) AS n_bpe_tokens",
      s"${subwordCountSqlWith(trainedFixtureVocab)} AS n_subwords")

  /** The trainer-ready token-id stream as a SQL expression — the
    * `graft_subword_ids` kernel over the same pre-tokens and folded
    * vocabulary as [[subwordCountSql]] (ONE shared matching routine in
    * the kernel, so `size(ids) == count` by construction).
    */
  val subwordIdsSql: String =
    s"graft_subword_ids($bpeSpark, $subwordVocabSql, $SubwordMaxWordLen)"

  /** [[subwordIdsSql]] under an arbitrary vocabulary. */
  def subwordIdsSqlWith(vocab: Seq[String]): String =
    s"graft_subword_ids($bpeSpark, ${vocabSqlOf(vocab)}, $SubwordMaxWordLen)"

  /** Per-document token ids `(doc_id, input_ids, n_subwords)` — what a
    * packing/shard stage ships to a trainer: piece ids are the 1-based
    * vocabulary position, [UNK] = 0 per unrepresentable word, word order
    * preserved. Still one narrow projection, no shuffle.
    */
  def subwordIds(docs: DataFrame): DataFrame =
    docs.selectExpr(
      "doc_id",
      s"$subwordIdsSql AS input_ids",
      s"$subwordCountSql AS n_subwords")

  /** [[subwordIds]] with the id stream rendered as a canonical '-'-joined
    * string — the battery's CHECKED form. The cross-engine harness
    * canonicalizes results by sorting columns, which array-typed cells
    * cannot support, so the checked row carries `input_ids_str` (a
    * bijective rendering of the id sequence: order and multiplicity
    * preserved) while callers keep the array-valued [[subwordIds]]
    * surface.
    */
  def subwordIdsChecked(docs: DataFrame): DataFrame =
    checkedIds(subwordIds(docs))

  /** The id stream under the LEARNED fixture vocabulary, in the checked
    * string form — completes [[subwordTokensTrained]]: the trained
    * inventory's COUNTS and its ID ASSIGNMENT both round-trip the
    * cross-engine kernel (ids are the 1-based pinned-vocabulary
    * position, so a pin permutation that counts identically would still
    * hash-mismatch here).
    */
  def subwordIdsTrainedChecked(docs: DataFrame): DataFrame =
    checkedIds(docs.selectExpr(
      "doc_id",
      s"${subwordIdsSqlWith(trainedFixtureVocab)} AS input_ids",
      s"${subwordCountSqlWith(trainedFixtureVocab)} AS n_subwords"))

  private def checkedIds(df: DataFrame): DataFrame =
    df.selectExpr(
      "doc_id",
      "array_join(input_ids, '-') AS input_ids_str",
      "n_subwords")

  /** N-gram-profile language ID: score = marker-token hit-rate per language,
    * prediction = argmax with fixed tie order (en,de,es,fr,zh), 'und' when
    * no marker hits at all.
    */
  def languageId(docs: DataFrame): DataFrame = {
    val hits = langMarkers.map { case (l, ws) =>
      s"CAST(size(filter(toks, t -> t IN ${inList(ws)})) AS DOUBLE) / nullif(size(toks), 0) AS score_$l"
    }
    val Seq(en, de, es, fr, zh) = langMarkers.map(m => s"score_${m._1}")
    docs
      .withColumn("toks", expr(tokensSpark))
      .selectExpr(Seq("doc_id", "lang") ++ hits: _*)
      .withColumn("predicted_lang", expr(
        s"""CASE WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 AND $zh = 0 THEN 'und'
           |     WHEN $en >= $de AND $en >= $es AND $en >= $fr AND $en >= $zh THEN 'en'
           |     WHEN $de >= $es AND $de >= $fr AND $de >= $zh THEN 'de'
           |     WHEN $es >= $fr AND $es >= $zh THEN 'es'
           |     WHEN $fr >= $zh THEN 'fr'
           |     ELSE 'zh' END""".stripMargin))
  }

  /** Heuristic quality score in [0,1]: length band + mean-token-length band
    * + stopword presence + long-token ratio (Gopher/C4-style filters,
    * arithmetic only).
    */
  def qualityScore(docs: DataFrame): DataFrame =
    docs
      .withColumn("toks", expr(tokensSpark))
      .withColumn("n_tok", expr("CAST(size(toks) AS BIGINT)"))
      .withColumn("mean_len", expr(
        "CAST(length(regexp_replace(text, '\\\\s', '')) AS DOUBLE) / nullif(n_tok, 0)"))
      .withColumn("stop_ratio", expr(
        s"CAST(size(filter(toks, t -> t IN ${inList(enStopwords)})) AS DOUBLE) / nullif(n_tok, 0)"))
      .withColumn("short_ratio", expr(
        "CAST(size(filter(toks, t -> length(t) <= 2)) AS DOUBLE) / nullif(n_tok, 0)"))
      .withColumn("alpha_ratio", expr(
        "CAST(length(regexp_replace(text, '[^A-Za-z]', '')) AS DOUBLE) / nullif(length(text), 0)"))
      .withColumn("quality_score", expr(
        """CAST(CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
          |   + CASE WHEN mean_len BETWEEN 3 AND 8 THEN 0.25 ELSE 0.0 END
          |   + CASE WHEN stop_ratio >= 0.02 THEN 0.25 ELSE 0.0 END
          |   + 0.25 * (1.0 - short_ratio) AS DOUBLE)""".stripMargin))
      .select("doc_id", "n_tok", "mean_len", "stop_ratio", "short_ratio",
        "alpha_ratio", "quality_score")

  /** Document fingerprinting: md5 of the whitespace-normalized text, plus a
    * rolling char-5-gram hash profile (min hash + distinct count — the
    * winnowing building blocks). The 5-gram hashes are a rolling window over
    * the char stream, computed vectorized per document.
    */
  def fingerprint(docs: DataFrame): DataFrame =
    docs
      .withColumn("norm", expr(s"concat_ws(' ', $tokensSpark)"))
      .withColumn("shingle_hashes", expr(
        s"""IF(length(norm) >= 5,
           |   transform(sequence(1, length(norm) - 4),
           |             i -> ${hexcastSpark("substr(norm, i, 5)")}),
           |   array())""".stripMargin))
      .selectExpr(
        "doc_id",
        "md5(norm) AS fp_md5",
        "array_min(shingle_hashes) AS min_shingle_hash",
        "CAST(size(array_distinct(shingle_hashes)) AS BIGINT) AS n_distinct_shingles")

  /** Gopher-style repetition metrics (Rae et al. 2021, "Scaling Language
    * Models", Table A1): per document, the char coverage of the heaviest
    * word 2-gram and 3-gram, and the char fraction occupied by duplicated
    * 5-grams. Coverage is a documented proxy — `count × gram_length` over
    * `length(text)`, overlapping occurrences counted fully — chosen because
    * both engines compute it bit-identically (position-coverage dedup would
    * need per-char bookkeeping for no extra discriminating power).
    *
    * Shape: explode n-grams → (doc, n, gram) counts → per-(doc, n) maxima →
    * per-doc pivot. Every stage is a hash aggregation with map-side partial
    * combine over the same doc-keyed distribution; no windows, no UDFs —
    * linear in corpus size at 100 TB.
    */
  def repetition(docs: DataFrame): DataFrame = {
    val base = docs.selectExpr("doc_id",
      "CAST(length(text) AS DOUBLE) AS n_chars", s"$tokensSpark AS toks")
    // sequence(1, 0) DESCENDS in Spark — the size guard is load-bearing
    def gramRel(n: Int) = base.selectExpr("doc_id", s"$n AS n",
      s"""explode(IF(size(toks) >= $n,
         |  transform(sequence(1, size(toks) - ${n - 1}),
         |            i -> array_join(slice(toks, i, $n), ' ')),
         |  array())) AS gram""".stripMargin)
    val counts = gramRel(2).unionAll(gramRel(3)).unionAll(gramRel(5))
      .groupBy("doc_id", "n", "gram").agg(count(lit(1)).as("c"))
      .withColumn("cov", col("c") * length(col("gram")).cast("long"))
    val perN = counts.groupBy("doc_id", "n").agg(
      max("cov").as("top_cov"),
      sum(when(col("c") > 1, col("cov"))).as("dup_cov"))
    val piv = perN.groupBy("doc_id").agg(
      max(when(col("n") === 2, col("top_cov"))).as("top2"),
      max(when(col("n") === 3, col("top_cov"))).as("top3"),
      max(when(col("n") === 5, col("dup_cov"))).as("dup5"))
    base.select("doc_id", "n_chars").join(piv, Seq("doc_id"), "left")
      .selectExpr(
        "doc_id",
        "COALESCE(top2 / nullif(n_chars, 0), 0.0) AS top_bigram_char_frac",
        "COALESCE(top3 / nullif(n_chars, 0), 0.0) AS top_trigram_char_frac",
        "COALESCE(dup5 / nullif(n_chars, 0), 0.0) AS dup_5gram_char_frac")
      .withColumn("flagged_repetitive", expr(
        """top_bigram_char_frac > 0.20 OR top_trigram_char_frac > 0.18
          |OR dup_5gram_char_frac > 0.15""".stripMargin))
  }

  /** PII scan + redaction: counts and masks emails, IPv4 addresses, and
    * NANP-style phone numbers ([[Portable.piiPatterns]] — the regex subset
    * Java and RE2 agree on). A pure narrow projection: `regexp_extract_all`
    * for counts, chained `regexp_replace` for the redacted text, no shuffle
    * — embarrassingly parallel over document partitions at 100 TB.
    */
  def piiScan(docs: DataFrame): DataFrame = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      s"CAST(size(regexp_extract_all(text, ${regexLitSpark(pat)}, 0)) AS BIGINT) AS n_${name}s"
    }
    val redacted = piiPatterns.foldLeft("text") { case (acc, (_, pat, mask)) =>
      s"regexp_replace($acc, ${regexLitSpark(pat)}, '$mask')"
    }
    docs.selectExpr(Seq("doc_id") ++ counts ++ Seq(s"$redacted AS redacted_text"): _*)
      .withColumn("has_pii",
        expr("n_emails > 0 OR n_ipv4s > 0 OR n_phones > 0"))
  }

  /** Corpus-weighted top terms per document: term frequency × rarity
    * (tf / document-frequency — the TF-IDF shape with a rational weight
    * instead of a log, so the score is bit-identical across engines; libm
    * `ln` can differ by an ulp and flip near-tie rankings). Two shuffles:
    * (doc, term) counts and term document frequency.
    */
  def topTerms(docs: DataFrame, k: Int = 5): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val toks = docs.select(col("doc_id"), explode(expr(tokensSpark)).as("term"))
    val tf = toks.groupBy("doc_id", "term").agg(count(lit(1)).as("tf"))
    val df = toks.groupBy("term")
      .agg(countDistinct(col("doc_id")).as("df"))
    tf.join(df, Seq("term"))
      .withColumn("score", col("tf").cast("double") / col("df"))
      .withColumn("rank", row_number().over(Window.partitionBy("doc_id")
        .orderBy(col("score").desc, col("term"))))
      .filter(col("rank") <= k)
      .select("doc_id", "term", "tf", "df", "score", "rank")
  }
}
