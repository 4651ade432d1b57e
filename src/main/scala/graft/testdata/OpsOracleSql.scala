package graft.testdata

import graft.ops.Portable._

/** DuckDB oracle SQL for the training-data operators (graft.ops.*), mirrored
  * expression-by-expression against the Spark builds. Shared vocabulary
  * (marker lists, hash construction) comes from [[graft.ops.Portable]] so the
  * two dialects cannot drift on data; structural drift is caught by the
  * oracle gate (tools/oracle_check.py).
  *
  * DuckDB dialect notes vs Spark:
  *  - `len`/`list_filter`/`list_transform`/`list_min`/`list_distinct` for
  *    `size`/`filter`/`transform`/`array_min`/`array_distinct`;
  *  - 1-based list indexing `l[i]` for `element_at(l, i)`;
  *  - `generate_series(1, n)` (inclusive, empty when n<1) for Spark's
  *    guarded `sequence`;
  *  - regexp literals are NOT backslash-escaped;
  *  - int/int division is true division in both (→ DOUBLE), but float
  *    literals parse as DECIMAL in DuckDB, so computed numerics are
  *    explicitly CAST to DOUBLE.
  */
object OpsOracleSql {

  val TEXT_TOKENS =
    s"""SELECT doc_id,
       |  CAST(length(text) AS BIGINT) AS n_chars,
       |  nonspace AS n_nonspace_chars,
       |  CAST(len(toks) AS BIGINT) AS n_ws_tokens,
       |  CAST(len($bpeDuck) AS BIGINT) AS n_bpe_tokens,
       |  CAST(len(list_distinct(toks)) AS BIGINT) AS n_distinct_tokens,
       |  CAST(nonspace AS DOUBLE) / nullif(len(toks), 0) AS avg_token_len
       |FROM (SELECT *, $tokensDuck AS toks,
       |        CAST(length(regexp_replace(text, '\\s', '', 'g')) AS BIGINT) AS nonspace
       |      FROM documents)""".stripMargin

  val TEXT_LANGID: String = {
    val hits = langMarkers.map { case (l, ws) =>
      s"CAST(len(list_filter(toks, t -> t IN ${inList(ws)})) AS DOUBLE) / nullif(len(toks), 0) AS score_$l"
    }
    val Seq(en, de, es, fr, zh) = langMarkers.map(m => s"score_${m._1}")
    s"""SELECT doc_id, lang, ${langMarkers.map(m => s"score_${m._1}").mkString(", ")},
       |  CASE WHEN $en = 0 AND $de = 0 AND $es = 0 AND $fr = 0 AND $zh = 0 THEN 'und'
       |       WHEN $en >= $de AND $en >= $es AND $en >= $fr AND $en >= $zh THEN 'en'
       |       WHEN $de >= $es AND $de >= $fr AND $de >= $zh THEN 'de'
       |       WHEN $es >= $fr AND $es >= $zh THEN 'es'
       |       WHEN $fr >= $zh THEN 'fr'
       |       ELSE 'zh' END AS predicted_lang
       |FROM (SELECT doc_id, lang, ${hits.mkString(",\n  ")}
       |      FROM (SELECT *, $tokensDuck AS toks FROM documents))""".stripMargin
  }

  val TEXT_QUALITY =
    s"""SELECT doc_id, n_tok, mean_len, stop_ratio, short_ratio, alpha_ratio,
       |  CAST(CASE WHEN n_tok BETWEEN 20 AND 1000 THEN 0.25 ELSE 0.0 END
       |     + CASE WHEN mean_len BETWEEN 3 AND 8 THEN 0.25 ELSE 0.0 END
       |     + CASE WHEN stop_ratio >= 0.02 THEN 0.25 ELSE 0.0 END
       |     + 0.25 * (1.0 - short_ratio) AS DOUBLE) AS quality_score
       |FROM (
       |  SELECT doc_id,
       |    CAST(len(toks) AS BIGINT) AS n_tok,
       |    CAST(length(regexp_replace(text, '\\s', '', 'g')) AS DOUBLE) / nullif(len(toks), 0) AS mean_len,
       |    CAST(len(list_filter(toks, t -> t IN ${inList(enStopwords)})) AS DOUBLE) / nullif(len(toks), 0) AS stop_ratio,
       |    CAST(len(list_filter(toks, t -> length(t) <= 2)) AS DOUBLE) / nullif(len(toks), 0) AS short_ratio,
       |    CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / nullif(length(text), 0) AS alpha_ratio
       |  FROM (SELECT *, $tokensDuck AS toks FROM documents))""".stripMargin

  val TEXT_FINGERPRINT =
    s"""SELECT doc_id,
       |  md5(norm) AS fp_md5,
       |  list_min(shingle_hashes) AS min_shingle_hash,
       |  CAST(len(list_distinct(shingle_hashes)) AS BIGINT) AS n_distinct_shingles
       |FROM (
       |  SELECT doc_id, norm,
       |    CASE WHEN length(norm) >= 5
       |         THEN list_transform(generate_series(1, length(norm) - 4),
       |                             i -> ${hexcastDuck("substr(norm, CAST(i AS INT), 5)")})
       |         ELSE [] END AS shingle_hashes
       |  FROM (SELECT doc_id, array_to_string($tokensDuck, ' ') AS norm
       |        FROM documents))""".stripMargin
}
