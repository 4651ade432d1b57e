package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Lexical retrieval scoring over the document corpus — the ranking stage a
  * training-data pipeline runs when it selects documents RELEVANT to a
  * fixed target (RAG corpus construction, domain-targeted data selection,
  * eval-set mining). BM25 is the classic probabilistic ranking function
  * (Robertson & Spärck Jones; the Okapi/Lucene spelling — see
  * [[Portable.bm25TermScore]]).
  *
  * Shape for a 10^10-document corpus with a FIXED query batch:
  *
  *  - one scan computes per-doc length and explodes ONLY tokens in the
  *    query vocabulary (`term IN (...)` sits under the explode, so the
  *    posting relation is bounded by the query terms' corpus frequency,
  *    not the token count);
  *  - the query relation (a VALUES constant) and the per-term df relation
  *    (≤ |vocabulary| rows) broadcast; corpus stats (N, Σdl) are a 1-row
  *    aggregate cross-joined in lazily (the scalar-subquery convention of
  *    [[graft.api.Queries.latestGoldenCrosses]]);
  *  - per-(query, doc) scores come from ONE hash aggregate whose
  *    conditional-max pivot sums term contributions in FIXED term order —
  *    float addition never re-associates across engines;
  *  - the ranking key is `floor(score × 1e6)` (BIGINT), so the final
  *    per-query top-k is integer-deterministic even if `ln` differs in the
  *    last ulp between engines. The top-k window runs over id-width rows.
  *
  * Docs matching no query term score no rows (BM25 gives them 0; a
  * 10^10-doc result of zeros is not a useful relation).
  */
object Retrieval {

  /** BM25 top-[[Portable.Bm25TopK]] per query of [[Portable.bm25Queries]]:
    * `(query_id, doc_id, n_hit_terms, score_micro, rank)` — the battery's
    * fixed batch through [[bm25TopKWith]].
    */
  def bm25TopK(docs: DataFrame, k: Int = Bm25TopK): DataFrame =
    bm25TopKWith(docs,
      bm25Queries.map { case (q, ts) => (q.toLong, ts) }, k)

  /** BM25 top-k for an ARBITRARY query batch — what a library user points
    * at their own target query set (the module header's RAG/data-selection
    * use-case; the batch is a driver-side constant by that framing, which
    * is exactly what lets the vocabulary IN-filter sit UNDER the explode
    * and the query relation broadcast). The pivot width follows the
    * batch's own longest query, so the fixed-order sum stays exact.
    */
  def bm25TopKWith(docs: DataFrame, queryBatch: Seq[(Long, Seq[String])],
      k: Int = Bm25TopK): DataFrame = {
    require(queryBatch.nonEmpty && queryBatch.forall(_._2.nonEmpty),
      "bm25TopKWith: every query needs at least one term")
    val base = docs.select(col("doc_id"), expr(tokensSpark).as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("CAST(size(toks) AS BIGINT)").as("dl"))
    // corpus stats: one row, joined lazily
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    // postings for the query vocabulary only — the IN filter runs under
    // the explode, before any shuffle. Built as a Column In-expression,
    // NOT splatted SQL text: query terms are arbitrary user strings
    // (code/URLs with backslashes are the stated use-case) and SQL-literal
    // escaping under Spark's backslash rules would silently transform or
    // reject them.
    val terms = queryBatch.flatMap(_._2).distinct
    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(col("term").isin(terms: _*))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    scoreTf(tf, df, stats, queriesDfOf(docs.sparkSession, queryBatch), k,
      queryBatch.map(_._2.size).max)
  }

  /** A query batch as a `(query_id, pos, term)` relation. */
  private[graft] def queriesDfOf(spark: org.apache.spark.sql.SparkSession,
      batch: Seq[(Long, Seq[String])]): DataFrame = {
    import spark.implicits._
    batch
      .flatMap { case (qid, terms) =>
        terms.zipWithIndex.map { case (t, pos) => (qid, pos, t) } }
      .toDF("query_id", "pos", "term")
  }

  /** The fixed query batch as a `(query_id, pos, term)` relation. */
  private[graft] def queriesDf(
      spark: org.apache.spark.sql.SparkSession): DataFrame =
    queriesDfOf(spark, bm25Queries.map { case (q, ts) => (q.toLong, ts) })

  /** BM25 scoring over explicit `tf (doc_id, dl, term, tf)` /
    * `df (term, df)` / 1-row `stats (n_docs, avgdl)` relations — the seam
    * shared with [[graft.streaming.IncrementalBm25]]'s store-backed
    * search, so the two paths CANNOT diverge: same term formula, same
    * fixed-order pivot-sum, same integerized rank.
    */
  private[graft] def scoreTf(tf: DataFrame, df: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int,
      maxTerms: Int = Bm25MaxTerms): DataFrame = {
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(broadcast(queries), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("pos"), col("doc_id"),
        expr(bm25TermScore("tf", "df", "dl", "n_docs", "avgdl")).as("tscore"))
    // fixed-order pivot-sum: s_0 + s_1 + … in term position order
    val pivots = (0 until maxTerms).map(p =>
      max(when(col("pos") === p, col("tscore"))).as(s"s_$p"))
    scored.groupBy("query_id", "doc_id")
      .agg(pivots.head, (pivots.tail :+ count(lit(1)).as("n_hit_terms")): _*)
      .select(col("query_id"), col("doc_id"), col("n_hit_terms"),
        expr(s"CAST(floor((${totalSql(maxTerms)}) * $Bm25Micro) AS BIGINT)")
          .as("score_micro"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** The fixed-order total as SQL text (matches the oracle spelling). */
  private def totalSql(maxTerms: Int): String =
    (0 until maxTerms)
      .map(p => s"COALESCE(s_$p, CAST(0 AS DOUBLE))")
      .reduce((a, b) => s"($a + $b)")
}
