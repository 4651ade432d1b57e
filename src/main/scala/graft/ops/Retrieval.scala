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
    * `(query_id, doc_id, n_hit_terms, score_micro, rank)`.
    */
  def bm25TopK(docs: DataFrame, k: Int = Bm25TopK): DataFrame = {
    val base = docs.select(col("doc_id"), expr(tokensSpark).as("toks"))
      .select(col("doc_id"), col("toks"),
        expr("CAST(size(toks) AS BIGINT)").as("dl"))
    // corpus stats: one row, joined lazily
    val stats = base.agg(
      count(lit(1)).as("n_docs"),
      (sum("dl").cast("double") / count(lit(1))).as("avgdl"))
    // postings for the query vocabulary only — the IN filter runs under
    // the explode, before any shuffle
    val termList = bm25AllTerms.map(t => s"'$t'").mkString("(", ", ", ")")
    val tf = base.select(col("doc_id"), col("dl"),
        explode(col("toks")).as("term"))
      .filter(expr(s"term IN $termList"))
      .groupBy("doc_id", "dl", "term")
      .agg(count(lit(1)).as("tf"))
    val df = tf.groupBy("term").agg(count(lit(1)).as("df"))
    scoreTf(tf, df, stats, queriesDf(docs.sparkSession), k)
  }

  /** The fixed query batch as a `(query_id, pos, term)` relation. */
  private[graft] def queriesDf(
      spark: org.apache.spark.sql.SparkSession): DataFrame = {
    import spark.implicits._
    bm25Queries
      .flatMap { case (qid, terms) =>
        terms.zipWithIndex.map { case (t, pos) => (qid.toLong, pos, t) } }
      .toDF("query_id", "pos", "term")
  }

  /** BM25 scoring over explicit `tf (doc_id, dl, term, tf)` /
    * `df (term, df)` / 1-row `stats (n_docs, avgdl)` relations — the seam
    * shared with [[graft.streaming.IncrementalBm25]]'s store-backed
    * search, so the two paths CANNOT diverge: same term formula, same
    * fixed-order pivot-sum, same integerized rank.
    */
  private[graft] def scoreTf(tf: DataFrame, df: DataFrame, stats: DataFrame,
      queries: DataFrame, k: Int): DataFrame = {
    val scored = tf
      .join(broadcast(df), Seq("term"))
      .join(broadcast(queries), Seq("term"))
      .crossJoin(broadcast(stats))
      .select(col("query_id"), col("pos"), col("doc_id"),
        expr(bm25TermScore("tf", "df", "dl", "n_docs", "avgdl")).as("tscore"))
    // fixed-order pivot-sum: s_0 + s_1 + … in term position order
    val pivots = (0 until Bm25MaxTerms).map(p =>
      max(when(col("pos") === p, col("tscore"))).as(s"s_$p"))
    scored.groupBy("query_id", "doc_id")
      .agg(pivots.head, (pivots.tail :+ count(lit(1)).as("n_hit_terms")): _*)
      .select(col("query_id"), col("doc_id"), col("n_hit_terms"),
        expr(s"CAST(floor((${totalSql}) * $Bm25Micro) AS BIGINT)")
          .as("score_micro"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("score_micro").desc, col("doc_id"))))
      .filter(col("rank") <= k)
  }

  /** The fixed-order total as SQL text (matches the oracle spelling). */
  private def totalSql: String =
    (0 until Bm25MaxTerms)
      .map(p => s"COALESCE(s_$p, CAST(0 AS DOUBLE))")
      .reduce((a, b) => s"($a + $b)")
}
