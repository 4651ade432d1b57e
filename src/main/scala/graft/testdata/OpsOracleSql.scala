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

  /** Greedy longest-match WordPiece, mirrored as set-based SQL: the
    * per-(word, pos) LONGEST matching vocabulary piece is precomputed
    * non-recursively (distinct words × positions × vocab — bounded by
    * [[SubwordMaxWordLen]]), then a recursive walk advances each word's
    * cursor by its match, one deterministic successor per row. A word
    * whose walk never reaches the end (no piece matched somewhere) or
    * that is over-length never lands in `word_n` and coalesces to the
    * 1-token [UNK] — exactly the Spark kernel's whole-word collapse.
    * Vocabulary comes verbatim from [[graft.ops.Portable.subwordVocab]]
    * (the shared-data discipline of the header note).
    */
  private def subwordChainFor(vocabPieces: Seq[String], cp: String = "",
      docsRel: String = "documents"): String = {
    // pid = 1-based position in the shared vocabulary literal; 0 is the
    // reserved [UNK] — the exact id assignment the Spark kernel makes.
    // Backslashes are rejected rather than escaped: the two dialects
    // disagree on them (Spark doubles, DuckDB is literal), so only
    // backslash-free vocabularies are oracle-mirrorable — true of both
    // shipped inventories, asserted in SubwordTrainSpec for the pin.
    // `cp` prefixes every CTE name so two chains (e.g. two ERAS under
    // different vocabularies) compose in one WITH RECURSIVE; `docsRel`
    // narrows the corpus (an era packs its own admission slice).
    val vocabRows = vocabPieces.zipWithIndex.map { case (p, i) =>
      require(!p.contains("\\"),
        s"oracle-mirrored vocabularies must be backslash-free, got: $p")
      val cont = p.startsWith("##")
      val piece = (if (cont) p.substring(2) else p).replace("'", "''")
      val plen = (if (cont) p.substring(2) else p).length
      s"('$piece', $cont, $plen, ${i + 1})"
    }.mkString(", ")
    val maxLen = SubwordMaxWordLen
    s"""${cp}vocab(piece, is_cont, plen, pid) AS (VALUES $vocabRows),
       |${cp}dw AS (
       |  SELECT doc_id, unnest($bpeDuck) AS word FROM $docsRel
       |),
       |${cp}dwc AS (SELECT doc_id, word, count(*) AS cnt FROM ${cp}dw GROUP BY 1, 2),
       |${cp}words AS (
       |  SELECT DISTINCT word FROM ${cp}dwc WHERE length(word) <= $maxLen
       |),
       |${cp}matches AS (
       |  SELECT w.word, p.pos,
       |    max(CASE WHEN substr(w.word, p.pos, v.plen) = v.piece
       |        THEN v.plen END) AS mlen
       |  FROM ${cp}words w
       |  JOIN (SELECT unnest(range(1, ${maxLen + 1})) AS pos) p
       |    ON p.pos <= length(w.word)
       |  JOIN ${cp}vocab v ON v.is_cont = (p.pos > 1)
       |  GROUP BY w.word, p.pos
       |),
       |${cp}walk(word, pos, n, ids) AS (
       |  SELECT word, 1, 0, CAST([] AS BIGINT[]) FROM ${cp}words
       |  UNION ALL
       |  SELECT wk.word, wk.pos + m.mlen, wk.n + 1,
       |         list_append(wk.ids, CAST(v2.pid AS BIGINT))
       |  FROM ${cp}walk wk
       |  JOIN ${cp}matches m ON m.word = wk.word AND m.pos = wk.pos
       |  JOIN ${cp}vocab v2 ON v2.is_cont = (wk.pos > 1) AND v2.plen = m.mlen
       |    AND v2.piece = substr(wk.word, wk.pos, m.mlen)
       |  WHERE m.mlen IS NOT NULL
       |),
       |${cp}word_n AS (SELECT word, n FROM ${cp}walk WHERE pos = length(word) + 1),
       |${cp}word_ids AS (SELECT word, ids FROM ${cp}walk WHERE pos = length(word) + 1),
       |${cp}doc_counts AS (
       |  SELECT dwc.doc_id,
       |    sum(dwc.cnt * coalesce(wn.n, 1)) AS n_subwords
       |  FROM ${cp}dwc dwc
       |  LEFT JOIN ${cp}word_n wn USING (word)
       |  GROUP BY dwc.doc_id
       |)""".stripMargin
  }

  /** The chain under the FIXTURE vocabulary — the default serving path. */
  private val subwordChain: String = subwordChainFor(subwordVocab)

  val TEXT_SUBWORD_TOKENS: String =
    s"""WITH RECURSIVE $subwordChain
       |SELECT d.doc_id,
       |  CAST(len($bpeDuck) AS BIGINT) AS n_bpe_tokens,
       |  CAST(coalesce(dc.n_subwords, 0) AS BIGINT) AS n_subwords
       |FROM documents d
       |LEFT JOIN doc_counts dc USING (doc_id)""".stripMargin

  /** Mirrors `TextAnalysis.subwordTokensTrained`: the same walk under the
    * LEARNED vocabulary (`Portable.trainedFixtureVocab`, the distributed
    * BPE trainer's pinned output) — proves the trained inventory, not
    * just the hand-built fixture, round-trips the cross-engine kernel.
    */
  val TEXT_SUBWORD_TOKENS_TRAINED: String =
    s"""WITH RECURSIVE ${subwordChainFor(trainedFixtureVocab)}
       |SELECT d.doc_id,
       |  CAST(len($bpeDuck) AS BIGINT) AS n_bpe_tokens,
       |  CAST(coalesce(dc.n_subwords, 0) AS BIGINT) AS n_subwords
       |FROM documents d
       |LEFT JOIN doc_counts dc USING (doc_id)""".stripMargin

  /** Mirrors `TextAnalysis.subwordIdsChecked`: per-word id lists from the
    * recursive walk, re-assembled in DOCUMENT WORD ORDER via the
    * ordinality-carrying unnest + an ordered list-of-lists flatten —
    * [UNK]=0 per unrepresentable/over-length word, ids 1-based in the
    * shared vocabulary literal. The checked column is the '-'-joined
    * string form (`input_ids_str`): the harness canonicalization sorts
    * columns, which array-typed cells cannot support; the join is
    * bijective so the hash check still proves the full id sequence.
    */
  val TEXT_SUBWORD_IDS: String = subwordIdsQueryFor(subwordVocab)

  /** The id stream under the LEARNED pinned vocabulary — completes the
    * trained-inventory check: counts AND id assignment round-trip.
    */
  val TEXT_SUBWORD_IDS_TRAINED: String =
    subwordIdsQueryFor(trainedFixtureVocab)

  /** Per-document id-stream CTEs (assume a `subwordChainFor` vocabulary
    * is installed above): `doc_ids (doc_id, input_ids)` — word id lists
    * reassembled in DOCUMENT WORD ORDER, [UNK]=[0] per word absent from
    * the walk (unrepresentable or over-length).
    */
  private def subwordDocIdsCtes(cp: String = "",
      docsRel: String = "documents"): String =
    s"""${cp}dwo AS (
       |  SELECT doc_id, unnest(ws) AS word, generate_subscripts(ws, 1) AS idx
       |  FROM (SELECT doc_id, $bpeDuck AS ws FROM $docsRel)
       |),
       |${cp}wia AS (
       |  SELECT w.word, coalesce(wi.ids, [CAST(0 AS BIGINT)]) AS ids
       |  FROM (SELECT DISTINCT word FROM ${cp}dwo) w
       |  LEFT JOIN ${cp}word_ids wi USING (word)
       |),
       |${cp}doc_ids AS (
       |  SELECT dwo.doc_id, flatten(list(wia.ids ORDER BY dwo.idx)) AS input_ids
       |  FROM ${cp}dwo dwo JOIN ${cp}wia wia USING (word)
       |  GROUP BY dwo.doc_id
       |)""".stripMargin

  private def subwordIdsQueryFor(vocab: Seq[String]): String =
    s"""WITH RECURSIVE ${subwordChainFor(vocab)},
       |${subwordDocIdsCtes()}
       |SELECT d.doc_id,
       |  array_to_string(coalesce(di.input_ids, CAST([] AS BIGINT[])), '-')
       |    AS input_ids_str,
       |  CAST(coalesce(dc.n_subwords, 0) AS BIGINT) AS n_subwords
       |FROM documents d
       |LEFT JOIN doc_ids di USING (doc_id)
       |LEFT JOIN doc_counts dc USING (doc_id)""".stripMargin

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

  // ---- dedup over documents/embeddings (graft.ops.Dedup) ----

  import graft.ops.Dedup.{BandBits, BandMask, Bands, ChunkTokens,
    CosineDupThreshold, HammingThreshold, JaccardDupThreshold,
    JaccardReportThreshold, MaxBandOccupancy, MaxShingleDf, NumHashes,
    RowsPerBand, SimhashBands, SimhashBits, WinnowK, WinnowOverlapThreshold,
    WinnowPosMod, WinnowReportThreshold, WinnowSelMod, WinnowWindow}

  val DEDUP_EXACT =
    """SELECT md5(text) AS text_hash, MIN(doc_id) AS keeper_doc_id,
      |       CAST(COUNT(*) AS BIGINT) AS n_copies
      |FROM documents GROUP BY 1""".stripMargin

  /** Shared CTE chain mirroring the exploded-relation Spark design: tokens
    * → distinct exploded 3-gram shingles → one md5 per shingle → universal-
    * hash MinHash aggregate → signature/bands (left-joined so shingle-free
    * docs keep a row).
    */
  private val ddToks = s"dd_toks AS (SELECT doc_id, $tokensDuck AS toks FROM documents)"

  // shingles are digested to the 60-bit hash BEFORE the distinct, mirroring
  // the engine: the dedup shuffle and all downstream joins carry (long, long)
  private val ddDocsh =
    s"""dd_docsh AS (
      |  SELECT DISTINCT doc_id, ${hexcastDuck("shingle")} AS h
      |  FROM (SELECT doc_id,
      |          unnest(CASE WHEN len(toks) >= 3
      |                 THEN list_transform(generate_series(1, len(toks) - 2),
      |                        i -> toks[i] || ' ' || toks[i+1] || ' ' || toks[i+2])
      |                 ELSE [] END) AS shingle
      |        FROM dd_toks))""".stripMargin

  private val ddAgg: String = {
    val mh = (0 until NumHashes).map(j => s"min(${minhashExpr(j)}) AS mh_$j")
    s"""dd_agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_shingles,
       |    ${mh.mkString(",\n    ")}
       |  FROM dd_docsh
       |  GROUP BY doc_id)""".stripMargin
  }

  private val ddSig: String = {
    val bands = (0 until Bands).map { b =>
      val parts = (RowsPerBand * b until RowsPerBand * (b + 1))
        .map(j => s"CAST(mh_$j AS VARCHAR)").mkString(", ")
      s"md5(concat_ws(',', $parts)) AS band_$b"
    }
    s"""dd_sig AS (
       |  SELECT doc_id, COALESCE(n_shingles, 0) AS n_shingles,
       |         ${(0 until NumHashes).map(j => s"mh_$j").mkString(", ")},
       |         ${bands.mkString(", ")}
       |  FROM documents LEFT JOIN dd_agg USING (doc_id))""".stripMargin
  }

  private val ddBands: String = {
    val cases = (0 until Bands).map(b => s"WHEN $b THEN band_$b").mkString(" ")
    s"""dd_bands AS (
       |  SELECT doc_id, band_idx, CASE band_idx $cases END AS band_val
       |  FROM dd_sig, (VALUES ${(0 until Bands).map(b => s"($b)").mkString(", ")}) t(band_idx)
       |  WHERE n_shingles > 0)""".stripMargin
  }

  /** Band-occupancy cap mirror (Dedup.MaxBandOccupancy): buckets hotter
    * than the cap degrade to STAR candidates (bucket-min doc_id → member)
    * instead of full pairwise — exactly Dedup.minhashPairs' hot-bucket
    * branch.
    */
  private val ddBandsKept =
    s"""dd_bandsx AS (
       |  SELECT doc_id, band_idx, band_val,
       |         count(*) OVER (PARTITION BY band_idx, band_val) AS bdf,
       |         min(doc_id) OVER (PARTITION BY band_idx, band_val) AS broot
       |  FROM dd_bands)""".stripMargin

  private val ddCand =
    s"""dd_cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT a.doc_id AS a_id, b.doc_id AS b_id
       |    FROM (SELECT doc_id, band_idx, band_val FROM dd_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) a
       |    JOIN (SELECT doc_id, band_idx, band_val FROM dd_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) b
       |      ON a.band_idx = b.band_idx AND a.band_val = b.band_val
       |     AND a.doc_id < b.doc_id
       |    UNION ALL
       |    SELECT broot AS a_id, doc_id AS b_id FROM dd_bandsx
       |    WHERE bdf > $MaxBandOccupancy AND doc_id <> broot))""".stripMargin

  private val ddSizes =
    "dd_sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM dd_docsh GROUP BY doc_id)"

  private val ddShingleChain =
    Seq(ddToks, ddDocsh, ddAgg, ddSig, ddBands, ddBandsKept, ddCand, ddSizes)

  val DEDUP_MINHASH_SIG: String = {
    val cols = (0 until NumHashes).map(j => s"mh_$j") ++
      (0 until Bands).map(b => s"band_$b")
    s"WITH $ddToks, $ddDocsh, $ddAgg, $ddSig\n" +
      s"SELECT doc_id, n_shingles, ${cols.mkString(", ")} FROM dd_sig"
  }

  val DEDUP_MINHASH_PAIRS: String =
    s"""WITH ${ddShingleChain.mkString(",\n")},
       |dd_mh_pairs AS (
       |  SELECT c.a_id, c.b_id, COALESCE(cm.n_common, 0) AS n_common,
       |         na.n AS n_a, nb.n AS n_b,
       |         CAST(COALESCE(cm.n_common, 0) AS DOUBLE)
       |           / (na.n + nb.n - COALESCE(cm.n_common, 0)) AS jaccard
       |  FROM dd_cand c
       |  LEFT JOIN (
       |    SELECT c2.a_id, c2.b_id, CAST(count(*) AS BIGINT) AS n_common
       |    FROM dd_cand c2
       |    JOIN dd_docsh sa ON sa.doc_id = c2.a_id
       |    JOIN dd_docsh sb ON sb.doc_id = c2.b_id AND sb.h = sa.h
       |    GROUP BY 1, 2) cm USING (a_id, b_id)
       |  JOIN dd_sizes na ON na.doc_id = c.a_id
       |  JOIN dd_sizes nb ON nb.doc_id = c.b_id)
       |SELECT *, CASE WHEN jaccard >= $JaccardDupThreshold THEN 1 ELSE 0 END AS is_duplicate
       |FROM dd_mh_pairs""".stripMargin

  /** Shingle-df cap mirror (Dedup.MaxShingleDf) for the inverted-index
    * Jaccard: the capped relation feeds common counts AND sizes.
    */
  private val ngDocsh =
    s"""ng_docsh AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
       |    FROM dd_docsh)
       |  WHERE df <= $MaxShingleDf)""".stripMargin

  private val ngSizes =
    "ng_sizes AS (SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM ng_docsh GROUP BY doc_id)"

  val DEDUP_NGRAM_JACCARD: String =
    s"""WITH $ddToks, $ddDocsh, $ngDocsh, $ngSizes
       |SELECT * FROM (
       |  SELECT cm.a_id, cm.b_id, cm.n_common, na.n AS n_a, nb.n AS n_b,
       |         CAST(cm.n_common AS DOUBLE) / (na.n + nb.n - cm.n_common) AS jaccard
       |  FROM (
       |    SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
       |           CAST(count(*) AS BIGINT) AS n_common
       |    FROM ng_docsh sa JOIN ng_docsh sb
       |      ON sa.h = sb.h AND sa.doc_id < sb.doc_id
       |    GROUP BY 1, 2) cm
       |  JOIN ng_sizes na ON na.doc_id = cm.a_id
       |  JOIN ng_sizes nb ON nb.doc_id = cm.b_id)
       |WHERE jaccard >= $JaccardReportThreshold""".stripMargin

  /** Winnowing mirror (Dedup.winnowFingerprints): positional k-grams by
    * direct list indexing (same strings as the engine's lead-concat), the
    * packed (32-bit hash, pos) selection key, a min over each w-gram
    * window computed BEFORE the window-start validity filter, and the
    * 60-bit digest recovered at the distinct selected positions.
    */
  private val wfGrams: String = {
    val gram = (0 until WinnowK).map(i => s"toks[i+$i]").mkString(" || ' ' || ")
    s"""wf_grams AS (
       |  SELECT doc_id, CAST(i - 1 AS BIGINT) AS pos,
       |         ${hexcastDuck(gram)} AS h
       |  FROM (SELECT doc_id, toks,
       |          unnest(CASE WHEN len(toks) >= $WinnowK
       |                 THEN generate_series(1, len(toks) - ${WinnowK - 1})
       |                 ELSE [] END) AS i
       |        FROM dd_toks))""".stripMargin
  }

  private val wfSelected: String =
    s"""wf_win AS (
       |  SELECT doc_id, pos, count(*) OVER (PARTITION BY doc_id) AS n_grams,
       |         min((h % $WinnowSelMod) * $WinnowPosMod + pos)
       |           OVER (PARTITION BY doc_id ORDER BY pos
       |                 ROWS BETWEEN CURRENT ROW AND ${WinnowWindow - 1} FOLLOWING)
       |           AS win_min
       |  FROM wf_grams),
       |wf_sel AS (
       |  SELECT DISTINCT doc_id, win_min % $WinnowPosMod AS pos
       |  FROM wf_win
       |  WHERE pos <= greatest(n_grams - $WinnowWindow, 0)),
       |wf_fps AS (
       |  SELECT s.doc_id, s.pos, g.h
       |  FROM wf_sel s JOIN wf_grams g
       |    ON g.doc_id = s.doc_id AND g.pos = s.pos)""".stripMargin

  val DEDUP_WINNOW_FPS: String =
    s"WITH $ddToks, $wfGrams, $wfSelected\n" +
      "SELECT doc_id, pos, h FROM wf_fps"

  /** Containment-dedup survivors: documents whose winnow containment
    * against a lower-id document clears the duplicate threshold drop; the
    * rest keep every column.
    */
  val DEDUP_WINNOW_DOCS: String =
    s"""WITH $ddToks, $wfGrams, $wfSelected,
       |wf_kept AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
       |    FROM (SELECT DISTINCT doc_id, h FROM wf_fps))
       |  WHERE df <= $MaxShingleDf),
       |wf_sizes AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM wf_kept GROUP BY doc_id),
       |wf_dropped AS (
       |  SELECT DISTINCT cm.b_id AS doc_id
       |  FROM (
       |    SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
       |           CAST(count(*) AS BIGINT) AS n_common
       |    FROM wf_kept sa JOIN wf_kept sb
       |      ON sa.h = sb.h AND sa.doc_id < sb.doc_id
       |    GROUP BY 1, 2) cm
       |  JOIN wf_sizes na ON na.doc_id = cm.a_id
       |  JOIN wf_sizes nb ON nb.doc_id = cm.b_id
       |  WHERE CAST(cm.n_common AS DOUBLE) / least(na.n, nb.n)
       |        >= $WinnowOverlapThreshold)
       |SELECT d.* FROM documents d
       |WHERE d.doc_id NOT IN (SELECT doc_id FROM wf_dropped)""".stripMargin

  val DEDUP_WINNOW_OVERLAP: String =
    s"""WITH $ddToks, $wfGrams, $wfSelected,
       |wf_kept AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
       |    FROM (SELECT DISTINCT doc_id, h FROM wf_fps))
       |  WHERE df <= $MaxShingleDf),
       |wf_sizes AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n FROM wf_kept GROUP BY doc_id),
       |wf_pairs AS (
       |  SELECT cm.a_id, cm.b_id, cm.n_common, na.n AS n_a, nb.n AS n_b,
       |         CAST(cm.n_common AS DOUBLE) / least(na.n, nb.n) AS containment
       |  FROM (
       |    SELECT sa.doc_id AS a_id, sb.doc_id AS b_id,
       |           CAST(count(*) AS BIGINT) AS n_common
       |    FROM wf_kept sa JOIN wf_kept sb
       |      ON sa.h = sb.h AND sa.doc_id < sb.doc_id
       |    GROUP BY 1, 2) cm
       |  JOIN wf_sizes na ON na.doc_id = cm.a_id
       |  JOIN wf_sizes nb ON nb.doc_id = cm.b_id)
       |SELECT *, CASE WHEN containment >= $WinnowOverlapThreshold THEN 1 ELSE 0 END AS is_overlap
       |FROM wf_pairs WHERE containment >= $WinnowReportThreshold""".stripMargin

  private val dsSig: String = {
    val ones = (0 until SimhashBits).map(b => s"CAST(sum((h >> $b) & 1) AS BIGINT) AS ones_$b")
    val shSum = (0 until SimhashBits)
      .map(b => s"CASE WHEN 2 * COALESCE(ones_$b, 0) > n_tok THEN ${1L << b} ELSE 0 END")
      .mkString(" + ")
    s"""ds_agg AS (
       |  SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tok,
       |    ${ones.mkString(",\n    ")}
       |  FROM (SELECT doc_id, ${hexcastDuck("tok")} AS h
       |        FROM (SELECT doc_id, unnest(toks) AS tok FROM dd_toks))
       |  GROUP BY doc_id),
       |ds_sig AS (
       |  SELECT doc_id, COALESCE(n_tok, 0) AS n_tok,
       |         CAST($shSum AS BIGINT) AS simhash_sig
       |  FROM documents LEFT JOIN ds_agg USING (doc_id))""".stripMargin
  }

  val DEDUP_SIMHASH: String = {
    val nibs = (0 until SimhashBands).map(q => s"(simhash_sig >> ${BandBits * q}) & $BandMask AS nib_$q")
    s"WITH $ddToks, $dsSig\n" +
      s"SELECT doc_id, n_tok, simhash_sig, ${nibs.mkString(", ")} FROM ds_sig"
  }

  val DEDUP_SIMHASH_PAIRS: String = {
    val cases = (0 until SimhashBands)
      .map(q => s"WHEN $q THEN (simhash_sig >> ${BandBits * q}) & $BandMask").mkString(" ")
    // occupancy-cap mirror (Dedup.simhashPairs): hot nibble buckets degrade
    // to star candidates rooted at the bucket's min doc_id
    s"""WITH $ddToks, $dsSig,
       |ds_nib AS (
       |  SELECT doc_id, simhash_sig, q, CASE q $cases END AS nib
       |  FROM ds_sig, (VALUES ${(0 until SimhashBands).map(q => s"($q)").mkString(", ")}) t(q)),
       |ds_nibx AS (
       |  SELECT *, count(*) OVER (PARTITION BY q, nib) AS bdf,
       |         min(doc_id) OVER (PARTITION BY q, nib) AS broot,
       |         arg_min(simhash_sig, doc_id) OVER (PARTITION BY q, nib) AS broot_sig
       |  FROM ds_nib)
       |SELECT * FROM (
       |  SELECT *, CAST(bit_count(xor(sh_a, sh_b)) AS BIGINT) AS hamming FROM (
       |    SELECT DISTINCT a_id, b_id, sh_a, sh_b FROM (
       |      SELECT a.doc_id AS a_id, b.doc_id AS b_id,
       |             a.simhash_sig AS sh_a, b.simhash_sig AS sh_b
       |      FROM (SELECT * FROM ds_nibx WHERE bdf <= $MaxBandOccupancy) a
       |      JOIN (SELECT * FROM ds_nibx WHERE bdf <= $MaxBandOccupancy) b
       |        ON a.q = b.q AND a.nib = b.nib AND a.doc_id < b.doc_id
       |      UNION ALL
       |      SELECT broot AS a_id, doc_id AS b_id,
       |             broot_sig AS sh_a, simhash_sig AS sh_b
       |      FROM ds_nibx WHERE bdf > $MaxBandOccupancy AND doc_id <> broot)))
       |WHERE hamming <= $HammingThreshold""".stripMargin
  }

  /** Left-fold dot product — replicates Spark's `aggregate` fold order so
    * doubles are bit-identical (see graft.ops.Dedup.dot).
    */
  def dotDuck(a: String, b: String): String =
    s"""list_reduce(list_transform(list_zip($a, $b),
       |  p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)), (x, y) -> x + y)""".stripMargin

  val normedEmb: String =
    s"""de_e AS (SELECT vec_id, embedding,
       |  sqrt(${dotDuck("embedding", "embedding")}) AS norm FROM embeddings)""".stripMargin

  val DEDUP_EMB_COSINE: String =
    s"""WITH $normedEmb
       |SELECT * FROM (
       |  SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
       |  FROM de_e a JOIN de_e b ON a.vec_id < b.vec_id)
       |WHERE cos_sim >= $CosineDupThreshold""".stripMargin

  /** Mirrors [[graft.ops.Dedup.chunkRows]] + first-occurrence flagging:
    * DuckDB's 1-based inclusive list slice `toks[a : a+w-1]` ≡ Spark's
    * `slice(toks, a, w)` (both clamp past the end), and `generate_series`
    * is endpoint-inclusive like Spark's `sequence`. First occurrence via
    * a window rank; the Spark side uses min-struct aggregation — same
    * relation, skew-safe plan.
    */
  private def chunkChainFrom(src: String): String = {
    val W = ChunkTokens
    s"""ck_tok AS (
       |  SELECT doc_id, $tokensDuck AS toks FROM $src
       |  WHERE len($tokensDuck) > 0),
       |ck_chunk AS (
       |  SELECT doc_id, chunk_idx,
       |         array_to_string(
       |           toks[CAST(chunk_idx * $W + 1 AS INT)
       |                : CAST(chunk_idx * $W + $W AS INT)], ' ') AS chunk_text
       |  FROM (
       |    SELECT doc_id, toks,
       |           CAST(unnest(generate_series(0, (len(toks) - 1) // $W)) AS BIGINT)
       |             AS chunk_idx
       |    FROM ck_tok)),
       |ck_flag AS (
       |  -- identity = the 120-bit digest pair, mirroring Dedup.chunkRows
       |  SELECT doc_id, chunk_idx, chunk_text,
       |         ${hexcastDuck("chunk_text")} AS chunk_hash,
       |         row_number() OVER (PARTITION BY ${hexcastDuck("chunk_text")},
       |             ${hexcastDuck2("chunk_text")}
       |           ORDER BY doc_id, chunk_idx) = 1 AS kept,
       |         CAST(count(*) OVER (PARTITION BY ${hexcastDuck("chunk_text")},
       |             ${hexcastDuck2("chunk_text")})
       |           AS BIGINT) AS n_copies
       |  FROM ck_chunk)""".stripMargin
  }

  private val chunkChain: String = chunkChainFrom("documents")

  val DEDUP_CHUNKS: String =
    s"""WITH $chunkChain
       |SELECT doc_id, chunk_idx, chunk_hash, n_copies, kept FROM ck_flag""".stripMargin

  val DEDUP_CHUNK_STATS: String =
    s"""WITH $chunkChain
       |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occurrences,
       |       CAST(count(DISTINCT (chunk_hash, ${hexcastDuck2("chunk_text")}))
       |              AS BIGINT) AS n_distinct_chunks,
       |       CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_dropped,
       |       CAST(coalesce(sum(length(chunk_text))
       |              FILTER (WHERE NOT kept), 0) AS BIGINT) AS chars_dropped
       |FROM ck_flag""".stripMargin

  val DEDUP_CHUNK_DOCS: String =
    s"""WITH $chunkChain
       |SELECT doc_id,
       |       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
       |                  FILTER (WHERE kept), '') AS clean_text,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept
       |FROM ck_flag GROUP BY doc_id""".stripMargin

  /** Boilerplate flagging over the shared chunk chain — document frequency
    * on the 120-bit digest pair, kept iff df < minDf (drop-ALL policy;
    * mirrors [[graft.ops.Dedup.dfFlaggedChunks]]).
    */
  private val boilerplateChain: String = {
    val minDf = graft.ops.Dedup.BoilerplateMinDf
    s"""$chunkChain,
       |bp_occ AS (
       |  SELECT doc_id, chunk_idx, chunk_text,
       |         ${hexcastDuck("chunk_text")} AS chunk_hash,
       |         ${hexcastDuck2("chunk_text")} AS chunk_hash2
       |  FROM ck_chunk),
       |bp_df AS (
       |  SELECT chunk_hash, chunk_hash2,
       |         CAST(count(DISTINCT doc_id) AS BIGINT) AS df_docs
       |  FROM bp_occ GROUP BY 1, 2),
       |bp_flag AS (
       |  SELECT o.doc_id, o.chunk_idx, o.chunk_text, o.chunk_hash,
       |         o.chunk_hash2, d.df_docs, d.df_docs < $minDf AS kept
       |  FROM bp_occ o JOIN bp_df d
       |    ON o.chunk_hash = d.chunk_hash AND o.chunk_hash2 = d.chunk_hash2)""".stripMargin
  }

  val DEDUP_BOILERPLATE: String =
    s"""WITH $boilerplateChain
       |SELECT doc_id, chunk_idx, chunk_hash, df_docs, kept FROM bp_flag""".stripMargin

  val DEDUP_BOILERPLATE_DOCS: String =
    s"""WITH $boilerplateChain
       |SELECT doc_id,
       |       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
       |                  FILTER (WHERE kept), '') AS clean_text,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept
       |FROM bp_flag GROUP BY doc_id""".stripMargin

  val DEDUP_BOILERPLATE_STATS: String =
    s"""WITH $boilerplateChain
       |SELECT CAST(count(DISTINCT doc_id) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_occurrences,
       |       CAST(count(DISTINCT (chunk_hash, chunk_hash2)) AS BIGINT)
       |         AS n_distinct_chunks,
       |       CAST(count(DISTINCT CASE WHEN NOT kept
       |              THEN (chunk_hash, chunk_hash2) END) AS BIGINT)
       |         AS n_boilerplate_chunks,
       |       CAST(count(*) FILTER (WHERE NOT kept) AS BIGINT) AS n_dropped,
       |       CAST(coalesce(sum(length(chunk_text))
       |              FILTER (WHERE NOT kept), 0) AS BIGINT) AS chars_dropped
       |FROM bp_flag""".stripMargin

  /** Connected components by transitive closure (recursive CTE) — cluster
    * id = min reachable doc_id; mirrors Dedup.dupClusters' fixpoint.
    */
  /** Verified-pair graph → transitive closure → per-doc cluster id CTE
    * (`dd_clusters`), shared by the cluster-resolution and keeper-selection
    * oracles. Requires WITH RECURSIVE at the query head.
    */
  private val ddClusterChain: String =
    s"""dd_pairs AS (
       |  SELECT c.a_id, c.b_id
       |  FROM dd_cand c
       |  JOIN (
       |    SELECT c2.a_id, c2.b_id, CAST(count(*) AS BIGINT) AS n_common
       |    FROM dd_cand c2
       |    JOIN dd_docsh sa ON sa.doc_id = c2.a_id
       |    JOIN dd_docsh sb ON sb.doc_id = c2.b_id AND sb.h = sa.h
       |    GROUP BY 1, 2) cm USING (a_id, b_id)
       |  JOIN dd_sizes na ON na.doc_id = c.a_id
       |  JOIN dd_sizes nb ON nb.doc_id = c.b_id
       |  WHERE CAST(cm.n_common AS DOUBLE) / (na.n + nb.n - cm.n_common)
       |        >= $JaccardDupThreshold),
       |dd_edges AS (
       |  SELECT a_id AS src, b_id AS dst FROM dd_pairs
       |  UNION ALL SELECT b_id, a_id FROM dd_pairs),
       |dd_reach(node, reached) AS (
       |  SELECT src, dst FROM dd_edges
       |  UNION
       |  SELECT r.node, e.dst FROM dd_reach r JOIN dd_edges e ON r.reached = e.src),
       |dd_clusters AS (
       |  SELECT d.doc_id,
       |         least(d.doc_id, COALESCE(m.min_reached, d.doc_id)) AS cluster_id
       |  FROM documents d
       |  LEFT JOIN (SELECT node, min(reached) AS min_reached
       |             FROM dd_reach GROUP BY node) m ON m.node = d.doc_id)""".stripMargin

  val DEDUP_CLUSTERS: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain
       |SELECT doc_id, cluster_id,
       |       CASE WHEN cluster_id = doc_id THEN 1 ELSE 0 END AS is_keeper
       |FROM dd_clusters""".stripMargin

  /** Keeper selection by quality: within each near-dup cluster the highest
    * quality_score survives (ties → lowest doc_id) — the CCNet-style
    * curation policy, replacing min-id keeper choice.
    */
  val DEDUP_KEEPER_QUALITY: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |dd_quality AS (SELECT doc_id, quality_score FROM ($TEXT_QUALITY))
       |SELECT doc_id, cluster_id, quality_score,
       |       CASE WHEN row_number() OVER (
       |              PARTITION BY cluster_id
       |              ORDER BY quality_score DESC, doc_id) = 1
       |            THEN 1 ELSE 0 END AS is_keeper
       |FROM dd_clusters JOIN dd_quality USING (doc_id)""".stripMargin

  // ---- similarity search over embeddings (graft.ops.Similarity) ----

  import graft.ops.Similarity.{Dim, NProbe, NearDupCosine, NibbleBands,
    NumLists, Planes, QueryStride, TopK}

  private val simSig: String = {
    val projs = (0 until Planes).map { p =>
      s"${dotDuck("embedding", planeLitDuck(p, Dim))} AS proj_$p"
    }
    val sigSum = (0 until Planes)
      .map(p => s"CASE WHEN proj_$p > 0 THEN ${1 << p} ELSE 0 END")
      .mkString(" + ")
    s"""sim_sig AS (
       |  SELECT vec_id, CAST($sigSum AS BIGINT) AS sig16 FROM (
       |    SELECT vec_id, ${projs.mkString(",\n      ")}
       |    FROM embeddings))""".stripMargin
  }

  private val simBands: String = {
    val cases = (0 until NibbleBands)
      .map(q => s"WHEN $q THEN (sig16 >> ${4 * q}) & 15").mkString(" ")
    s"""sim_bands AS (
       |  SELECT vec_id, q, CASE q $cases END AS nib
       |  FROM sim_sig, (VALUES ${(0 until NibbleBands).map(q => s"($q)").mkString(", ")}) t(q))""".stripMargin
  }

  val SIM_SIGNATURES: String = {
    val nibs = (0 until NibbleBands).map(q => s"(sig16 >> ${4 * q}) & 15 AS nib_$q")
    s"WITH $simSig\nSELECT vec_id, sig16, ${nibs.mkString(", ")} FROM sim_sig"
  }

  /** Band-occupancy cap mirror (Similarity band joins): buckets hotter than
    * Dedup.MaxBandOccupancy degrade to STAR candidates rooted at the
    * bucket-min vec_id — exactly Dedup.minhashPairs' hot-bucket branch.
    */
  private val simBandsX =
    s"""sim_bandsx AS (
       |  SELECT vec_id, q, nib,
       |         count(*) OVER (PARTITION BY q, nib) AS bdf,
       |         min(vec_id) OVER (PARTITION BY q, nib) AS broot
       |  FROM sim_bands)""".stripMargin

  val SIM_BRUTE_TOPK: String =
    s"""WITH $normedEmb
       |SELECT * FROM (
       |  SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim,
       |         row_number() OVER (PARTITION BY a.vec_id
       |           ORDER BY ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) DESC,
       |                    b.vec_id) AS "rank"
       |  FROM de_e a JOIN de_e b ON a.vec_id <> b.vec_id
       |  WHERE a.vec_id % $QueryStride = 0)
       |WHERE "rank" <= $TopK""".stripMargin

  val SIM_LSH_TOPK: String =
    s"""WITH $normedEmb, $simSig, $simBands, $simBandsX,
       |sim_cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT qa.vec_id AS a_id, qb.vec_id AS b_id
       |    FROM (SELECT vec_id, q, nib FROM sim_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) qa
       |    JOIN (SELECT vec_id, q, nib FROM sim_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) qb
       |      ON qa.q = qb.q AND qa.nib = qb.nib AND qa.vec_id <> qb.vec_id
       |    WHERE qa.vec_id % $QueryStride = 0
       |    UNION ALL
       |    SELECT broot AS a_id, vec_id AS b_id FROM sim_bandsx
       |    WHERE bdf > $MaxBandOccupancy AND vec_id <> broot
       |      AND broot % $QueryStride = 0
       |    UNION ALL
       |    SELECT vec_id AS a_id, broot AS b_id FROM sim_bandsx
       |    WHERE bdf > $MaxBandOccupancy AND vec_id <> broot
       |      AND vec_id % $QueryStride = 0))
       |SELECT * FROM (
       |  SELECT c.a_id AS query_id, c.b_id AS neighbor_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim,
       |         row_number() OVER (PARTITION BY c.a_id
       |           ORDER BY ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) DESC,
       |                    c.b_id) AS "rank"
       |  FROM sim_cand c
       |  JOIN de_e a ON c.a_id = a.vec_id
       |  JOIN de_e b ON c.b_id = b.vec_id)
       |WHERE "rank" <= $TopK""".stripMargin

  // ---- deterministic hash splits (graft.ops.HashSplit) ----

  import graft.ops.HashSplit.{Buckets, TrainUpper, ValUpper}

  private val hsBucket = s"CAST(${hexcastDuck("text")} % $Buckets AS INT)"

  val SPLIT_ASSIGN: String =
    s"""SELECT doc_id, $hsBucket AS bucket,
       |       CASE WHEN $hsBucket < $TrainUpper THEN 'train'
       |            WHEN $hsBucket < $ValUpper THEN 'val'
       |            ELSE 'test' END AS split
       |FROM documents""".stripMargin

  val SPLIT_SUMMARY: String =
    s"""SELECT split, CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS DOUBLE) / (SELECT count(*) FROM documents) AS fraction
       |FROM (SELECT CASE WHEN $hsBucket < $TrainUpper THEN 'train'
       |                  WHEN $hsBucket < $ValUpper THEN 'val'
       |                  ELSE 'test' END AS split
       |      FROM documents)
       |GROUP BY 1""".stripMargin

  /** Token-budget shard packing: the engine's two-phase distributed prefix
    * sum is value-identical to a plain cumulative window in doc_id order.
    */
  val SPLIT_TOKEN_SHARDS: String = {
    import graft.ops.HashSplit.ShardTokenBudget
    s"""SELECT doc_id, n_tok,
       |       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tokens,
       |       CAST((sum(n_tok) OVER w - n_tok) // $ShardTokenBudget AS BIGINT)
       |         AS shard_id
       |FROM (SELECT doc_id, CAST(len($tokensDuck) AS BIGINT) AS n_tok
       |      FROM documents)
       |WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |             AND CURRENT ROW)""".stripMargin
  }

  /** Train/test contamination via the hashed-shingle inverted index, with
    * the shingle-df cap mirror (`ct_docsh` — Dedup.MaxShingleDf over the
    * whole corpus, before the split).
    */
  val SPLIT_CONTAMINATION: String =
    s"""WITH $ddToks, $ddDocsh,
       |ct_docsh AS (
       |  SELECT doc_id, h FROM (
       |    SELECT doc_id, h, count(*) OVER (PARTITION BY h) AS df
       |    FROM dd_docsh)
       |  WHERE df <= ${graft.ops.Dedup.MaxShingleDf}),
       |sp AS (SELECT doc_id,
       |         CASE WHEN $hsBucket < $TrainUpper THEN 'train'
       |              WHEN $hsBucket < $ValUpper THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM documents),
       |pairs AS (
       |  SELECT tr.doc_id AS train_doc_id, te.doc_id AS test_doc_id,
       |         CAST(count(*) AS BIGINT) AS n_shared
       |  FROM ct_docsh tr
       |  JOIN sp str ON str.doc_id = tr.doc_id AND str.split = 'train'
       |  JOIN ct_docsh te ON te.h = tr.h
       |  JOIN sp ste ON ste.doc_id = te.doc_id AND ste.split = 'test'
       |  GROUP BY 1, 2)
       |SELECT train_doc_id,
       |       CAST(count(DISTINCT test_doc_id) AS BIGINT) AS n_test_docs,
       |       CAST(max(n_shared) AS BIGINT) AS max_shared_shingles,
       |       min(test_doc_id) AS example_test_doc
       |FROM pairs WHERE n_shared >= 1
       |GROUP BY 1""".stripMargin

  /** Mirrors [[graft.ops.HashSplit.semanticContamination]]: the same
    * sign-LSH signatures as the sim_* family (band values depend only on
    * the vector, so per-side band relations are FILTERS of the shared
    * sim_bands CTE), test-side occupancy cap with bucket-min star
    * degradation, exact-cosine verify, per-train-doc evidence aggregate.
    */
  val SPLIT_SEMANTIC_DECONTAM: String =
    s"""WITH $normedEmb, $simSig, $simBands,
       |sp AS (SELECT doc_id,
       |         CASE WHEN $hsBucket < $TrainUpper THEN 'train'
       |              WHEN $hsBucket < $ValUpper THEN 'val'
       |              ELSE 'test' END AS split
       |       FROM documents),
       |sd_tr AS (
       |  SELECT b.vec_id, q, nib FROM sim_bands b
       |  JOIN sp ON sp.doc_id = b.vec_id AND sp.split = 'train'),
       |sd_tex AS (
       |  SELECT vec_id, q, nib,
       |         count(*) OVER (PARTITION BY q, nib) AS bdf,
       |         min(vec_id) OVER (PARTITION BY q, nib) AS broot
       |  FROM (SELECT b.vec_id, q, nib FROM sim_bands b
       |        JOIN sp ON sp.doc_id = b.vec_id AND sp.split = 'test')),
       |sd_cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT t.vec_id AS a_id, p.vec_id AS b_id
       |    FROM sd_tr t
       |    JOIN (SELECT vec_id, q, nib FROM sd_tex
       |          WHERE bdf <= $MaxBandOccupancy) p USING (q, nib)
       |    UNION ALL
       |    SELECT t.vec_id AS a_id, x.broot AS b_id
       |    FROM sd_tr t
       |    JOIN (SELECT DISTINCT q, nib, broot FROM sd_tex
       |          WHERE bdf > $MaxBandOccupancy) x USING (q, nib)))
       |SELECT a_id AS doc_id, CAST(count(*) AS BIGINT) AS n_test_hits,
       |       CAST(max(cos_sim) AS DOUBLE) AS max_cos
       |FROM (
       |  SELECT c.a_id, c.b_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
       |  FROM sd_cand c
       |  JOIN de_e a ON c.a_id = a.vec_id
       |  JOIN de_e b ON c.b_id = b.vec_id)
       |WHERE cos_sim >= $NearDupCosine
       |GROUP BY 1""".stripMargin

  // ---- multimodal media plumbing (graft.ops.Multimodal) ----

  import graft.ops.Multimodal.{ChunkHexChars, FrameStride, MaxChunks}

  /** Hex-domain mirror of Multimodal.media (payload as lowercase hex). */
  private val mmBase =
    s"""mm AS (
       |  SELECT doc_id AS media_id,
       |         CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio'
       |              ELSE 'video' END AS media_type,
       |         array_to_string(list_transform(
       |           generate_series(0, CAST(doc_id % $MaxChunks AS INT)),
       |           i -> md5(text || ':' || i)), '') AS payload_hex,
       |         16 * (1 + doc_id % 20) AS width,
       |         16 * (1 + doc_id % 12) AS height,
       |         8000 * (1 + doc_id % 3) AS sample_rate
       |  FROM documents)""".stripMargin

  val MEDIA_CATALOG: String =
    s"""WITH $mmBase
       |SELECT media_id, media_type,
       |       CAST(length(payload_hex) / 2 AS BIGINT) AS n_bytes,
       |       md5(payload_hex) AS payload_md5,
       |       CAST(width AS INT) AS width, CAST(height AS INT) AS height,
       |       CAST(sample_rate AS INT) AS sample_rate,
       |       CAST(length(payload_hex) / $ChunkHexChars AS INT) AS n_frames
       |FROM mm""".stripMargin

  val MEDIA_BYTE_STATS: String =
    s"""WITH $mmBase,
       |mb AS (
       |  SELECT *, list_transform(generate_series(1, CAST(length(payload_hex) / 2 AS INT)),
       |           i -> CAST('0x' || substr(payload_hex, 2 * i - 1, 2) AS BIGINT)) AS bytes,
       |         CAST(length(payload_hex) / 2 AS BIGINT) AS n_bytes
       |  FROM mm)
       |SELECT media_id, media_type, n_bytes,
       |       CAST(list_aggregate(bytes, 'sum') AS DOUBLE) / n_bytes AS mean_byte,
       |       CAST(list_min(bytes) AS INT) AS min_byte,
       |       CAST(list_max(bytes) AS INT) AS max_byte,
       |       CAST(len(list_distinct(bytes)) AS INT) AS n_distinct_bytes
       |FROM mb""".stripMargin

  val MEDIA_FRAME_SAMPLE: String =
    s"""WITH $mmBase
       |SELECT media_id, CAST(frame_idx AS BIGINT) AS frame_idx,
       |       md5(substr(payload_hex, CAST(frame_idx * $ChunkHexChars + 1 AS INT), $ChunkHexChars)) AS frame_md5
       |FROM (SELECT media_id, payload_hex,
       |             unnest(generate_series(0, CAST(length(payload_hex) / $ChunkHexChars AS INT) - 1, $FrameStride)) AS frame_idx
       |      FROM mm WHERE media_type = 'video')""".stripMargin

  val MEDIA_RESIZE: String =
    s"""WITH $mmBase
       |SELECT media_id,
       |       CAST(width / 2 AS INT) AS new_width,
       |       CAST(height / 2 AS INT) AS new_height,
       |       CAST(length(payload_hex) / 4 AS BIGINT) AS thumb_bytes,
       |       md5(substr(payload_hex, 1, CAST(length(payload_hex) / 4 AS INT) * 2)) AS thumb_md5
       |FROM mm WHERE media_type = 'image'""".stripMargin

  // ---- event-stream operators (graft.ops.Events) ----

  import graft.ops.Events.{DailyTopK, SessionGapMinutes}

  /** µs-truncated view of the ns-precision events table (mirrors
    * TestFixtures.events).
    */
  private val evBase =
    """ev AS (SELECT event_id, CAST(ts AS TIMESTAMP) AS ts, user_id,
      |             event_type, value, props FROM events)""".stripMargin

  val EVENTS_HOURLY: String =
    s"""WITH $evBase
       |SELECT date_trunc('hour', ts) AS hour_start,
       |       date_trunc('hour', ts) + INTERVAL 1 HOUR AS hour_end,
       |       event_type,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users,
       |       sum(value) AS sum_value
       |FROM ev GROUP BY 1, 2, 3""".stripMargin

  val EVENTS_HOPPING: String =
    s"""WITH $evBase
       |SELECT make_timestamp((epoch_us(ts) // 1800000000 - i) * 1800000000) AS win_start,
       |       make_timestamp((epoch_us(ts) // 1800000000 - i + 2) * 1800000000) AS win_end,
       |       CAST(count(*) AS BIGINT) AS n_events,
       |       sum(value) AS sum_value
       |FROM ev, (VALUES (0), (1)) t(i) GROUP BY 1, 2""".stripMargin

  val EVENTS_SESSIONS: String =
    s"""WITH $evBase,
       |es_lag AS (
       |  SELECT *, epoch_us(ts) AS us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM ev),
       |es_idx AS (
       |  SELECT *, sum(CASE WHEN prev_us IS NULL
       |                       OR us - prev_us > ${SessionGapMinutes * 60L * 1000000L}
       |                     THEN 1 ELSE 0 END)
       |         OVER (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM es_lag)
       |SELECT user_id, CAST(session_idx AS BIGINT) AS session_idx,
       |       min(ts) AS session_start, max(ts) AS session_end,
       |       CAST(count(*) AS BIGINT) AS n_events, sum(value) AS sum_value,
       |       CAST(count(DISTINCT event_type) AS BIGINT) AS n_event_types
       |FROM es_idx GROUP BY 1, 2""".stripMargin

  /** Mirrors Spark's session_window merge rule: a new session starts when
    * the gap is >= the window gap (half-open [start, end) windows), and the
    * reported window end is last_event + gap.
    */
  val EVENTS_SESSION_WINDOW: String =
    s"""WITH $evBase,
       |sw_lag AS (
       |  SELECT *, epoch_us(ts) AS us,
       |         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
       |  FROM ev),
       |sw_idx AS (
       |  SELECT *, sum(CASE WHEN prev_us IS NULL
       |                       OR us - prev_us >= ${SessionGapMinutes * 60L * 1000000L}
       |                     THEN 1 ELSE 0 END)
       |         OVER (PARTITION BY user_id ORDER BY ts, event_id
       |               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS session_idx
       |  FROM sw_lag)
       |SELECT user_id, min(ts) AS session_start,
       |       max(ts) + INTERVAL $SessionGapMinutes MINUTE AS window_end,
       |       CAST(count(*) AS BIGINT) AS n_events, sum(value) AS sum_value
       |FROM sw_idx GROUP BY user_id, session_idx""".stripMargin

  val EVENTS_FUNNEL: String =
    s"""WITH $evBase,
       |fv AS (SELECT user_id, min(ts) AS view_ts FROM ev
       |       WHERE event_type = 'view' GROUP BY 1),
       |fc AS (SELECT e.user_id, min(e.ts) AS click_ts FROM ev e
       |       JOIN fv ON e.user_id = fv.user_id AND e.ts > fv.view_ts
       |       WHERE e.event_type = 'click' GROUP BY 1),
       |fp AS (SELECT e.user_id, min(e.ts) AS purchase_ts FROM ev e
       |       JOIN fc ON e.user_id = fc.user_id AND e.ts > fc.click_ts
       |       WHERE e.event_type = 'purchase' GROUP BY 1)
       |SELECT u.user_id, fv.view_ts, fc.click_ts, fp.purchase_ts,
       |       CASE WHEN fp.purchase_ts IS NOT NULL THEN 3
       |            WHEN fc.click_ts IS NOT NULL THEN 2
       |            WHEN fv.view_ts IS NOT NULL THEN 1
       |            ELSE 0 END AS reached_stage
       |FROM (SELECT DISTINCT user_id FROM ev) u
       |LEFT JOIN fv ON u.user_id = fv.user_id
       |LEFT JOIN fc ON u.user_id = fc.user_id
       |LEFT JOIN fp ON u.user_id = fp.user_id""".stripMargin

  val EVENTS_DAILY_TOPK: String =
    s"""WITH $evBase
       |SELECT * FROM (
       |  SELECT day, event_type, n_events,
       |         row_number() OVER (PARTITION BY day
       |           ORDER BY n_events DESC, event_type) AS "rank"
       |  FROM (SELECT CAST(ts AS DATE) AS day, event_type,
       |               CAST(count(*) AS BIGINT) AS n_events
       |        FROM ev GROUP BY 1, 2))
       |WHERE "rank" <= $DailyTopK""".stripMargin

  /** Native ASOF LEFT JOIN mirrors AsOfJoin's union-window carry-forward;
    * the right side is deduped per (user, ts) so the match is
    * deterministic on both engines.
    */
  val EVENTS_ASOF_ATTRIBUTION: String =
    s"""WITH $evBase,
       |ap AS (SELECT event_id, ts, user_id, value FROM ev
       |       WHERE event_type = 'purchase'),
       |av AS (SELECT user_id, ts AS vts, max(event_id) AS view_event_id
       |       FROM ev WHERE event_type = 'view' GROUP BY 1, 2)
       |SELECT ap.event_id, ap.ts, ap.user_id, ap.value, av.view_event_id
       |FROM ap ASOF LEFT JOIN av
       |  ON ap.user_id = av.user_id AND ap.ts >= av.vts""".stripMargin

  /** Exact twin of the HLL daily-users sketch (the sketch itself has no
    * oracle: estimates are implementation-defined).
    */
  val EVENTS_DAILY_USERS_EXACT: String =
    s"""WITH $evBase
       |SELECT CAST(ts AS DATE) AS day,
       |       CAST(count(DISTINCT user_id) AS BIGINT) AS n_users_exact
       |FROM ev GROUP BY 1""".stripMargin

  /** Exact twin of the Count-Min frequency sketch over the probe
    * stride — mirrors `Events.userCountsExact` expression-by-expression.
    */
  val EVENTS_USER_COUNTS_EXACT: String =
    s"""WITH $evBase
       |SELECT user_id, CAST(count(*) AS BIGINT) AS n_events
       |FROM ev WHERE user_id % ${graft.ops.Events.CmsProbeStride} = 0
       |GROUP BY 1""".stripMargin

  /** Exact twin of the GK value-quantile sketch: DuckDB's `quantile_cont`
    * and Spark's `percentile` both interpolate at rank (n-1)·q over the
    * sorted values (R type-7), so the doubles agree.
    */
  val EVENTS_VALUE_QUANTILES_EXACT: String = {
    val cols = graft.ops.Events.QuantilePoints.map(q =>
      s"CAST(quantile_cont(value, $q) AS DOUBLE) AS p${(q * 100).toInt}_exact")
    s"""WITH $evBase
       |SELECT event_type, ${cols.mkString(", ")}
       |FROM ev GROUP BY event_type""".stripMargin
  }

  /** Oracle for the sketch accuracy gates: the gate queries compare a
    * sketch against its exact twin IN-ENGINE and emit the violation
    * count, which is deterministically zero when the sketch honors its
    * bound — so the oracle is the constant, and the driver's hash-compare
    * becomes the accuracy assertion (DuckDB cannot reproduce the sketch
    * estimates themselves; they are implementation-defined).
    */
  val EVENTS_APPROX_ERR_ZERO: String =
    "SELECT CAST(0 AS BIGINT) AS n_violations"

  val EVENTS_RETENTION: String =
    s"""WITH $evBase,
       |rt_first AS (
       |  SELECT user_id, min(CAST(ts AS DATE)) AS cohort_day FROM ev GROUP BY 1),
       |rt_sizes AS (
       |  SELECT cohort_day, CAST(count(DISTINCT user_id) AS BIGINT) AS cohort_size
       |  FROM rt_first GROUP BY 1),
       |rt_active AS (
       |  SELECT DISTINCT user_id, CAST(ts AS DATE) AS activity_day FROM ev)
       |SELECT f.cohort_day,
       |       CAST(date_diff('day', f.cohort_day, a.activity_day) AS BIGINT) AS day_offset,
       |       CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active,
       |       s.cohort_size,
       |       CAST(count(DISTINCT a.user_id) AS DOUBLE) / s.cohort_size AS retention_rate
       |FROM rt_active a
       |JOIN rt_first f ON a.user_id = f.user_id
       |JOIN rt_sizes s ON s.cohort_day = f.cohort_day
       |GROUP BY 1, 2, 4""".stripMargin

  val TEXT_TOP_TERMS: String =
    """WITH tt_tok AS (
      |  SELECT doc_id, unnest(regexp_extract_all(text, '\S+')) AS term
      |  FROM documents),
      |tt_tf AS (
      |  SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf
      |  FROM tt_tok GROUP BY 1, 2),
      |tt_df AS (
      |  SELECT term, CAST(count(DISTINCT doc_id) AS BIGINT) AS df
      |  FROM tt_tok GROUP BY 1)
      |SELECT doc_id, term, tf, df, score, "rank" FROM (
      |  SELECT tt_tf.doc_id, tt_tf.term, tf, df,
      |         CAST(tf AS DOUBLE) / df AS score,
      |         row_number() OVER (PARTITION BY tt_tf.doc_id
      |           ORDER BY CAST(tf AS DOUBLE) / df DESC, tt_tf.term) AS "rank"
      |  FROM tt_tf JOIN tt_df ON tt_tf.term = tt_df.term)
      |WHERE "rank" <= 5""".stripMargin

  val EVENTS_JSON: String =
    """SELECT event_id,
      |       CAST(json_extract_string(props, '$.k') AS BIGINT) AS prop_k
      |FROM events""".stripMargin

  private val ivfChain: String =
    s"""$normedEmb,
       |iv_lead AS (
       |  SELECT vec_id AS list_id, embedding AS lvec, norm AS lnorm
       |  FROM de_e WHERE vec_id < $NumLists),
       |iv_assign AS (
       |  SELECT vec_id, list_id, list_cos FROM (
       |    SELECT e.vec_id, l.list_id,
       |           ${dotDuck("e.embedding", "l.lvec")} / (e.norm * l.lnorm) AS list_cos,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${dotDuck("e.embedding", "l.lvec")} / (e.norm * l.lnorm) DESC,
       |                      l.list_id) AS rnk
       |    FROM de_e e CROSS JOIN iv_lead l)
       |  WHERE rnk = 1)""".stripMargin

  val SIM_IVF_ASSIGN: String =
    s"WITH $ivfChain\nSELECT vec_id, list_id, list_cos FROM iv_assign"

  /** Capped-list + probe CTEs shared by [[SIM_IVF_TOPK]] and
    * [[SIM_IVFPQ_TOPK]]: lists keep their `MaxListOccupancy` lowest
    * vec_ids; queries probe their `NProbe` max-cosine lists.
    */
  private val ivfSearchChain: String =
    s"""iv_kept AS (
       |  SELECT vec_id, list_id FROM (
       |    SELECT vec_id, list_id,
       |           row_number() OVER (PARTITION BY list_id ORDER BY vec_id) AS lrnk
       |    FROM iv_assign)
       |  WHERE lrnk <= ${graft.ops.Similarity.MaxListOccupancy}),
       |iv_probe AS (
       |  SELECT query_id, list_id FROM (
       |    SELECT e.vec_id AS query_id, l.list_id,
       |           row_number() OVER (PARTITION BY e.vec_id
       |             ORDER BY ${dotDuck("e.embedding", "l.lvec")} / (e.norm * l.lnorm) DESC,
       |                      l.list_id) AS rnk
       |    FROM de_e e CROSS JOIN iv_lead l
       |    WHERE e.vec_id % $QueryStride = 0)
       |  WHERE rnk <= $NProbe),
       |iv_cand AS (
       |  SELECT DISTINCT p.query_id AS a_id, a.vec_id AS b_id
       |  FROM iv_probe p JOIN iv_kept a USING (list_id)
       |  WHERE p.query_id <> a.vec_id)""".stripMargin

  val SIM_IVF_TOPK: String =
    s"""WITH $ivfChain,
       |$ivfSearchChain
       |SELECT * FROM (
       |  SELECT c.a_id AS query_id, c.b_id AS neighbor_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim,
       |         row_number() OVER (PARTITION BY c.a_id
       |           ORDER BY ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) DESC,
       |                    c.b_id) AS "rank"
       |  FROM iv_cand c
       |  JOIN de_e a ON c.a_id = a.vec_id
       |  JOIN de_e b ON c.b_id = b.vec_id)
       |WHERE "rank" <= $TopK""".stripMargin

  /** Mirrors [[graft.ops.Similarity.semDedup]]: same iv_assign quantizer,
    * head side capped at MaxListOccupancy by vec_id rank, drop iff an
    * earlier-id head vector in the list clears the cosine threshold,
    * keeper = lowest such id.
    */
  val SIM_SEMDEDUP: String =
    s"""WITH $ivfChain,
       |sd_head AS (
       |  SELECT list_id, vec_id AS h_id, embedding AS h_emb, norm AS h_norm
       |  FROM (
       |    SELECT a.vec_id, a.list_id, e.embedding, e.norm,
       |           row_number() OVER (PARTITION BY a.list_id ORDER BY a.vec_id) AS lrnk
       |    FROM iv_assign a JOIN de_e e USING (vec_id))
       |  WHERE lrnk <= ${graft.ops.Similarity.MaxListOccupancy}),
       |sd_dup AS (
       |  SELECT a.vec_id, min(h.h_id) AS dup_of
       |  FROM iv_assign a
       |  JOIN de_e e ON e.vec_id = a.vec_id
       |  JOIN sd_head h ON h.list_id = a.list_id AND h.h_id < a.vec_id
       |    AND ${dotDuck("e.embedding", "h.h_emb")} / (e.norm * h.h_norm)
       |          >= $CosineDupThreshold
       |  GROUP BY a.vec_id)
       |SELECT a.vec_id, a.list_id, d.dup_of, d.dup_of IS NULL AS kept
       |FROM iv_assign a LEFT JOIN sd_dup d ON d.vec_id = a.vec_id""".stripMargin

  // ---- product quantization (graft.ops.Pq) ----

  import graft.ops.Pq.{CodeBits, CodebookSize, NumSubspaces, SubDim}

  private val pqSubspaces: String =
    s"(VALUES ${(0 until NumSubspaces).map(m => s"($m)").mkString(", ")}) t(m)"

  /** 1-based inclusive DuckDB slice of subspace `m` (a column). */
  private def pqSliceDuck(embCol: String): String =
    s"$embCol[(m * $SubDim + 1):((m + 1) * $SubDim)]"

  /** Mirrors [[graft.ops.Pq.codes]]: sampled-leaders codebook (sub-vectors
    * of the [[CodebookSize]] lowest vec_ids), per-(vector, subspace) argmin
    * by the rank key ‖c‖² − 2⟨x_m, c⟩ with ties to the lowest code, then
    * pivot wide + bit-pack. The engine kernel's strict-less argmin keeps
    * the first minimum — value-identical to `row_number() ORDER BY
    * (edist, k)`.
    */
  private val pqChain: String =
    s"""pq_cb AS (
       |  SELECT m, vec_id AS k, ${pqSliceDuck("embedding")} AS cvec
       |  FROM embeddings, $pqSubspaces
       |  WHERE vec_id < $CodebookSize),
       |pq_cb2 AS (
       |  SELECT m, k, cvec, ${dotDuck("cvec", "cvec")} AS cnorm2 FROM pq_cb),
       |pq_sub AS (
       |  SELECT vec_id, m, ${pqSliceDuck("embedding")} AS sub
       |  FROM embeddings, $pqSubspaces),
       |pq_enc AS (
       |  SELECT vec_id, m, k,
       |         cnorm2 - 2 * ${dotDuck("sub", "cvec")} AS edist
       |  FROM pq_sub JOIN pq_cb2 USING (m)),
       |pq_code AS (
       |  SELECT vec_id, m, k AS code FROM (
       |    SELECT vec_id, m, k,
       |           row_number() OVER (PARTITION BY vec_id, m
       |             ORDER BY edist, k) AS rn
       |    FROM pq_enc)
       |  WHERE rn = 1),
       |pq_wide AS (
       |  SELECT vec_id,
       |         ${(0 until NumSubspaces).map(m =>
              s"max(CASE WHEN m = $m THEN code END) AS code_$m").mkString(",\n       |         ")}
       |  FROM pq_code GROUP BY vec_id)""".stripMargin

  private val pqPacked: String =
    (0 until NumSubspaces).map(m => s"code_$m * ${1L << (CodeBits * m)}").mkString(" + ")

  val SIM_PQ_CODES: String =
    s"""WITH $pqChain
       |SELECT vec_id, ${(0 until NumSubspaces).map(m => s"code_$m").mkString(", ")},
       |       $pqPacked AS pq_code
       |FROM pq_wide""".stripMargin

  /** Mirrors [[graft.ops.Pq.adcTopK]]: per-query subspace distance table
    * (full ‖q_m‖² − 2⟨q_m, c⟩ + ‖c‖²), ADC sum in fixed subspace order
    * ((d0 + d1) + d2) + d3, rank by (adc, neighbor_id), self excluded.
    */
  /** Per-query ADC distance-table CTEs shared by [[SIM_PQ_TOPK]] and
    * [[SIM_IVFPQ_TOPK]].
    */
  private val pqDtabChain: String =
    s"""pq_q AS (
       |  SELECT vec_id AS query_id, m, ${pqSliceDuck("embedding")} AS qsub
       |  FROM embeddings, $pqSubspaces
       |  WHERE vec_id % $QueryStride = 0),
       |pq_q2 AS (
       |  SELECT query_id, m, qsub, ${dotDuck("qsub", "qsub")} AS qsub2 FROM pq_q),
       |pq_dtab AS (
       |  SELECT query_id, m, k,
       |         (qsub2 - 2 * ${dotDuck("qsub", "cvec")}) + cnorm2 AS dd
       |  FROM pq_q2 JOIN pq_cb2 USING (m))""".stripMargin

  val SIM_PQ_TOPK: String = {
    // ONE long-form join (code row → its distance entry) + fixed-order
    // pivot sum — the [[SIM_IVFPQ_TOPK]] spelling. The former 8
    // table-aliased pq_dtab joins left DuckDB's optimizer free to join
    // the d_m aliases against each other on query_id alone (64² k-pairs
    // per query per alias pair) before any code constraint pruned them
    // — measured 52.8 s at sf0.01 vs 0.3 s for this shape, identical
    // rows. The pivot keeps the ((d0+d1)+d2)… double fold bit-identical
    // to the engine's, and HAVING count(*) = M preserves the old inner
    // joins' all-8-codes-present semantics.
    val pivots = (0 until NumSubspaces)
      .map(m => s"max(CASE WHEN m = $m THEN dd END) AS dd_$m")
      .mkString(",\n       |           ")
    val adcSum = (1 until NumSubspaces)
      .foldLeft("dd_0")((acc, m) => s"($acc + dd_$m)")
    s"""WITH $pqChain,
       |$pqDtabChain,
       |pq_dd AS (
       |  SELECT d.query_id, c.vec_id AS neighbor_id, c.m, d.dd
       |  FROM pq_code c
       |  JOIN pq_dtab d ON d.m = c.m AND d.k = c.code
       |  WHERE c.vec_id <> d.query_id),
       |pq_adc AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adc_dist FROM (
       |    SELECT query_id, neighbor_id,
       |           $pivots
       |    FROM pq_dd GROUP BY query_id, neighbor_id
       |    HAVING count(*) = $NumSubspaces))
       |SELECT query_id, neighbor_id, adc_dist, "rank" FROM (
       |  SELECT query_id, neighbor_id, adc_dist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adc_dist, neighbor_id) AS "rank"
       |  FROM pq_adc)
       |WHERE "rank" <= $TopK""".stripMargin
  }

  /** Element-wise FLOAT residual `x − l` — the indexed-`list_transform`
    * twin of the engine's `zip_with`; the FLOAT cast pins both engines to
    * the identical single-rounded IEEE subtraction.
    */
  private def residDuck(embCol: String, leadCol: String): String =
    s"list_transform(range(1, ${Dim + 1}), " +
      s"i -> CAST($embCol[i] - $leadCol[i] AS FLOAT))"

  /** Residual-PQ CTEs mirroring [[graft.ops.Pq.residualCodebook]] /
    * `residualCodesFor` / `residualDistanceTable` (FAISS
    * `by_residual=true`): the codebook seeds are residuals of the
    * [[CodebookSize]] lowest vec_ids ABOVE the leader range (a leader's
    * own residual is the zero vector), corpus codes quantize
    * `x − lvec(list(x))` over the capped lists and carry `list_id`, and
    * distance tables are per (query, probed list) from the query's
    * residual against THAT list's leader.
    */
  private val rpqChain: String =
    s"""rpq_seed AS (
       |  SELECT a.vec_id - $NumLists AS k,
       |         ${residDuck("e.embedding", "l.lvec")} AS rvec
       |  FROM iv_assign a JOIN de_e e USING (vec_id)
       |  JOIN iv_lead l USING (list_id)
       |  WHERE a.vec_id >= $NumLists
       |    AND a.vec_id < ${NumLists + CodebookSize}),
       |rpq_cb2 AS (
       |  SELECT m, k, cvec, ${dotDuck("cvec", "cvec")} AS cnorm2 FROM (
       |    SELECT m, k, ${pqSliceDuck("rvec")} AS cvec
       |    FROM rpq_seed, $pqSubspaces)),
       |rpq_res AS (
       |  SELECT kk.vec_id, kk.list_id,
       |         ${residDuck("e.embedding", "l.lvec")} AS rvec
       |  FROM iv_kept kk JOIN de_e e USING (vec_id)
       |  JOIN iv_lead l USING (list_id)),
       |rpq_sub AS (
       |  SELECT vec_id, list_id, m, ${pqSliceDuck("rvec")} AS sub
       |  FROM rpq_res, $pqSubspaces),
       |rpq_enc AS (
       |  SELECT vec_id, list_id, m, k,
       |         cnorm2 - 2 * ${dotDuck("sub", "cvec")} AS edist
       |  FROM rpq_sub JOIN rpq_cb2 USING (m)),
       |rpq_code AS (
       |  SELECT vec_id, list_id, m, k AS code FROM (
       |    SELECT vec_id, list_id, m, k,
       |           row_number() OVER (PARTITION BY vec_id, m
       |             ORDER BY edist, k) AS rn
       |    FROM rpq_enc)
       |  WHERE rn = 1),
       |rpq_wide AS (
       |  SELECT vec_id, list_id,
       |         ${(0 until NumSubspaces).map(m =>
              s"max(CASE WHEN m = $m THEN code END) AS code_$m").mkString(",\n       |         ")}
       |  FROM rpq_code GROUP BY vec_id, list_id),
       |rpq_q AS (
       |  SELECT p.query_id, p.list_id,
       |         ${residDuck("e.embedding", "l.lvec")} AS qres
       |  FROM iv_probe p JOIN de_e e ON e.vec_id = p.query_id
       |  JOIN iv_lead l ON l.list_id = p.list_id),
       |rpq_qsub AS (
       |  SELECT query_id, list_id, m, ${pqSliceDuck("qres")} AS qsub
       |  FROM rpq_q, $pqSubspaces),
       |rpq_dtab AS (
       |  SELECT query_id, list_id, m, k,
       |         (${dotDuck("qsub", "qsub")} - 2 * ${dotDuck("qsub", "cvec")}) + cnorm2 AS dd
       |  FROM rpq_qsub JOIN rpq_cb2 USING (m))""".stripMargin

  /** Mirrors [[graft.ops.Pq.ivfpqCodes]] — the residual code STORE view:
    * `(vec_id, list_id, code_0 … code_7, pq_code)` over the capped lists.
    */
  val SIM_IVFPQ_CODES: String =
    s"""WITH $ivfChain,
       |$ivfSearchChain,
       |$rpqChain
       |SELECT vec_id, list_id,
       |       ${(0 until NumSubspaces).map(m => s"code_$m").mkString(", ")},
       |       $pqPacked AS pq_code
       |FROM rpq_wide""".stripMargin

  /** Mirrors [[graft.ops.Pq.ivfpqTopK]] — the IVFPQ composition, residual
    * form (FAISS `by_residual=true`, its billion-scale default): the IVF
    * coarse quantizer prunes candidates to the probed (capped) lists;
    * residual PQ codes score them by ADC against the per-(query, list)
    * residual distance tables.
    *
    * The ADC sum is spelled as ONE long-form join (candidate × its 8 code
    * rows → the matching distance entry) plus a fixed-order pivot sum,
    * NOT the 8 table-aliased joins [[SIM_PQ_TOPK]] uses: with the
    * (query_id, list_id)-keyed residual tables the optimizer is free to
    * join the d_m aliases against each other first — 64⁸ k-combinations
    * per (query, list) before any code constraint prunes them — and
    * DuckDB does exactly that, spilling unboundedly. The pivot keeps the
    * ((d0+d1)+d2)… double arithmetic bit-identical to the engine's fold.
    */
  val SIM_IVFPQ_TOPK: String = {
    val pivots = (0 until NumSubspaces)
      .map(m => s"max(CASE WHEN m = $m THEN dd END) AS dd_$m")
      .mkString(",\n       |         ")
    val adcSum = (1 until NumSubspaces)
      .foldLeft("dd_0")((acc, m) => s"($acc + dd_$m)")
    s"""WITH $ivfChain,
       |$ivfSearchChain,
       |$rpqChain,
       |ipq_dd AS (
       |  SELECT c.a_id AS query_id, c.b_id AS neighbor_id, pc.m, d.dd
       |  FROM iv_cand c
       |  JOIN rpq_code pc ON pc.vec_id = c.b_id
       |  JOIN rpq_dtab d ON d.query_id = c.a_id AND d.list_id = pc.list_id
       |    AND d.m = pc.m AND d.k = pc.code),
       |ipq_adc AS (
       |  SELECT query_id, neighbor_id, $adcSum AS adc_dist FROM (
       |    SELECT query_id, neighbor_id,
       |         $pivots
       |    FROM ipq_dd GROUP BY query_id, neighbor_id))
       |SELECT query_id, neighbor_id, adc_dist, "rank" FROM (
       |  SELECT query_id, neighbor_id, adc_dist,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY adc_dist, neighbor_id) AS "rank"
       |  FROM ipq_adc)
       |WHERE "rank" <= $TopK""".stripMargin
  }

  // ---- DSIR importance weighting (graft.ops.Dsir) ----

  private val DsirB = graft.ops.Dsir.Buckets
  private val DsirMicro = graft.ops.Dsir.Micro
  private val DsirTau = graft.ops.Dsir.SelectTauMicro
  private val DsirLang = graft.ops.Dsir.TargetLang

  /** Mirrors [[graft.ops.Dsir.weights]]: hashed `<n>:`-prefixed
    * unigram+bigram buckets, add-1-smoothed target/raw log-ratio table
    * integerized at 1e6, exact integer Σ n·lr per document.
    */
  private val dsirChain: String =
    s"""ds_base AS (SELECT doc_id, lang, $tokensDuck AS toks FROM documents),
       |ds_gram AS (
       |  SELECT doc_id, lang, ${hexcastDuck("'1:' || gram")} % $DsirB AS bucket
       |  FROM (SELECT doc_id, lang, unnest(toks) AS gram FROM ds_base)
       |  UNION ALL
       |  SELECT doc_id, lang, ${hexcastDuck("'2:' || gram")} % $DsirB AS bucket
       |  FROM (
       |    SELECT doc_id, lang,
       |           unnest(list_transform(generate_series(1, len(toks) - 1),
       |             i -> array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + 1], ' '))) AS gram
       |    FROM ds_base)),
       |ds_feat AS (
       |  SELECT doc_id, lang, bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM ds_gram GROUP BY 1, 2, 3),
       |ds_obs AS (
       |  SELECT bucket, CAST(sum(n) AS BIGINT) AS cr,
       |         CAST(COALESCE(sum(CASE WHEN lang = '$DsirLang' THEN n END), 0) AS BIGINT) AS ct
       |  FROM ds_feat GROUP BY 1),
       |ds_pb AS (
       |  SELECT a.bucket, CAST(COALESCE(o.ct, 0) AS BIGINT) AS ct,
       |         CAST(COALESCE(o.cr, 0) AS BIGINT) AS cr
       |  FROM (SELECT unnest(range(0, $DsirB)) AS bucket) a
       |  LEFT JOIN ds_obs o USING (bucket)),
       |ds_tot AS (
       |  SELECT CAST(sum(cr) AS BIGINT) AS tot_cr,
       |         CAST(sum(ct) AS BIGINT) AS tot_ct
       |  FROM ds_pb),
       |ds_lr AS (
       |  SELECT bucket,
       |         CAST(floor((ln(CAST(ct + 1 AS DOUBLE) / (tot_ct + $DsirB))
       |           - ln(CAST(cr + 1 AS DOUBLE) / (tot_cr + $DsirB))) * $DsirMicro) AS BIGINT) AS lr_micro
       |  FROM ds_pb CROSS JOIN ds_tot WHERE tot_cr > 0),
       |ds_w AS (
       |  SELECT d.doc_id,
       |         CAST(COALESCE(f.n_grams, 0) AS BIGINT) AS n_grams,
       |         CAST(COALESCE(f.lw, 0) AS BIGINT) AS logweight_micro
       |  FROM documents d
       |  LEFT JOIN (
       |    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_grams,
       |           CAST(sum(n * lr_micro) AS BIGINT) AS lw
       |    FROM ds_feat JOIN ds_lr USING (bucket) GROUP BY 1) f
       |  USING (doc_id))""".stripMargin

  val CURATE_DSIR_WEIGHTS: String =
    s"WITH $dsirChain\nSELECT doc_id, n_grams, logweight_micro FROM ds_w"

  /** Mirrors SparkEntry's ad-hoc `sql_dsir_by_lang` over the registered
    * weight view — order-independent aggregates only.
    */
  val SQL_DSIR_BY_LANG: String =
    s"""WITH $dsirChain
       |SELECT lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(logweight_micro) AS BIGINT) AS total_logweight_micro,
       |       CAST(min(logweight_micro) AS BIGINT) AS min_logweight_micro,
       |       CAST(max(logweight_micro) AS BIGINT) AS max_logweight_micro
       |FROM ds_w JOIN documents USING (doc_id)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** Mirrors the hashed-Gumbel perturbation of [[graft.ops.Dsir.select]]. */
  private val dsirKeyed: String =
    s"""ds_key AS (
       |  SELECT doc_id, logweight_micro, gumbel_micro,
       |         logweight_micro + gumbel_micro AS key_micro
       |  FROM (
       |    SELECT doc_id, logweight_micro,
       |           CAST(floor(-ln(-ln(
       |             (CAST(${hexcastDuck("'dsir:' || CAST(doc_id AS VARCHAR)")} % $DsirMicro AS DOUBLE)
       |               + CAST(0.5 AS DOUBLE)) / $DsirMicro)) * $DsirMicro) AS BIGINT) AS gumbel_micro
       |    FROM ds_w))""".stripMargin

  val CURATE_DSIR_SELECT: String =
    s"""WITH $dsirChain, $dsirKeyed
       |SELECT doc_id, logweight_micro, gumbel_micro, key_micro
       |FROM ds_key WHERE key_micro >= $DsirTau""".stripMargin

  val CURATE_DSIR_SUMMARY: String =
    s"""WITH $dsirChain, $dsirKeyed
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN key_micro >= $DsirTau THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |       CAST(min(logweight_micro) AS BIGINT) AS min_logweight_micro,
       |       CAST(max(logweight_micro) AS BIGINT) AS max_logweight_micro
       |FROM ds_key""".stripMargin

  // ---- BM25 retrieval (graft.ops.Retrieval) ----

  /** Mirrors [[graft.ops.Retrieval.bm25TopK]]: query-vocabulary postings,
    * broadcast-shaped df/query relations, the SHARED dialect-free term
    * formula ([[Portable.bm25TermScore]]), fixed-order pivot-sum, and the
    * integerized `floor(score × 1e6)` ranking key.
    */
  val TEXT_BM25_TOPK: String = {
    val termList = bm25AllTerms.map(t => s"'$t'").mkString("(", ", ", ")")
    val pivs = (0 until Bm25MaxTerms)
      .map(p => s"max(CASE WHEN pos = $p THEN tscore END) AS s_$p")
      .mkString(",\n       |         ")
    val total = (0 until Bm25MaxTerms)
      .map(p => s"COALESCE(s_$p, CAST(0 AS DOUBLE))")
      .reduce((a, b) => s"($a + $b)")
    s"""WITH bm_dl AS (
       |  SELECT doc_id, toks, CAST(len(toks) AS BIGINT) AS dl
       |  FROM (SELECT doc_id, $tokensDuck AS toks FROM documents)),
       |bm_stats AS (
       |  SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(dl) AS DOUBLE) / count(*) AS avgdl
       |  FROM bm_dl),
       |bm_tf AS (
       |  SELECT doc_id, dl, term, CAST(count(*) AS BIGINT) AS tf
       |  FROM (SELECT doc_id, dl, unnest(toks) AS term FROM bm_dl)
       |  WHERE term IN $termList
       |  GROUP BY 1, 2, 3),
       |bm_df AS (
       |  SELECT term, CAST(count(*) AS BIGINT) AS df FROM bm_tf GROUP BY 1),
       |bm_scored AS (
       |  SELECT bq.query_id, bq.pos, t.doc_id,
       |         ${bm25TermScore("tf", "df", "dl", "n_docs", "avgdl")} AS tscore
       |  FROM bm_tf t
       |  JOIN bm_df USING (term)
       |  JOIN $bm25QueryValues ON bq.term = t.term
       |  CROSS JOIN bm_stats),
       |bm_piv AS (
       |  SELECT query_id, doc_id,
       |         $pivs,
       |         CAST(count(*) AS BIGINT) AS n_hit_terms
       |  FROM bm_scored GROUP BY 1, 2)
       |SELECT query_id, doc_id, n_hit_terms, score_micro, "rank" FROM (
       |  SELECT query_id, doc_id, n_hit_terms, score_micro,
       |         row_number() OVER (PARTITION BY query_id
       |           ORDER BY score_micro DESC, doc_id) AS "rank"
       |  FROM (
       |    SELECT CAST(query_id AS BIGINT) AS query_id, doc_id, n_hit_terms,
       |           CAST(floor(($total) * $Bm25Micro) AS BIGINT) AS score_micro
       |    FROM bm_piv))
       |WHERE "rank" <= $Bm25TopK""".stripMargin
  }

  /** Mirrors [[graft.ops.Pq.adcRecallGate]]: recall@k of the ADC and
    * IVFPQ searches against the exact brute-force cosine top-k,
    * integerized and gated on the declared floors — the sketch-`_err`
    * pattern, so the driver hash-checks PQ ACCURACY, not just PQ values.
    */
  val SIM_PQ_RECALL_ERR: String = {
    def leg(method: String, approxSql: String, floorMicro: Long): String = {
      val recall =
        "CAST(floor((n_overlap * CAST(1000000 AS DOUBLE)) / n_exact) AS BIGINT)"
      s"""SELECT '$method' AS method, n_exact, n_overlap,
         |       $recall AS recall_micro,
         |       CAST($floorMicro AS BIGINT) AS floor_micro,
         |       CAST(CASE WHEN $recall >= $floorMicro THEN 0 ELSE 1 END AS BIGINT)
         |         AS violations
         |FROM (
         |  SELECT (SELECT CAST(count(*) AS BIGINT)
         |          FROM ($SIM_BRUTE_TOPK) e) AS n_exact,
         |         (SELECT CAST(count(*) AS BIGINT)
         |          FROM ($SIM_BRUTE_TOPK) e
         |          JOIN ($approxSql) a
         |            ON e.query_id = a.query_id
         |           AND e.neighbor_id = a.neighbor_id) AS n_overlap)""".stripMargin
    }
    leg("adc", SIM_PQ_TOPK, graft.ops.Pq.AdcRecallFloorMicro) +
      "\nUNION ALL\n" +
      leg("ivfpq", SIM_IVFPQ_TOPK, graft.ops.Pq.IvfpqRecallFloorMicro)
  }

  /** Mirrors [[graft.ops.TextAnalysis.repetition]]: same n-gram explode →
    * (doc, n, gram) counts → per-(doc, n) maxima → per-doc pivot. DuckDB
    * list slices are 1-based inclusive; `generate_series(1, n)` is empty for
    * n < 1, matching Spark's guarded `sequence`.
    */
  val TEXT_REPETITION: String = {
    def gramSel(n: Int) =
      s"""SELECT doc_id, $n AS n,
         |  unnest(list_transform(generate_series(1, len(toks) - ${n - 1}),
         |    i -> array_to_string(toks[CAST(i AS INT):CAST(i AS INT) + ${n - 1}], ' '))) AS gram
         |FROM rep_base""".stripMargin
    s"""WITH rep_base AS (
       |  SELECT doc_id, CAST(length(text) AS DOUBLE) AS n_chars,
       |         $tokensDuck AS toks
       |  FROM documents),
       |rep_grams AS (
       |${gramSel(2)}
       |UNION ALL
       |${gramSel(3)}
       |UNION ALL
       |${gramSel(5)}),
       |rep_counts AS (
       |  SELECT doc_id, n, gram, COUNT(*) AS c,
       |         COUNT(*) * length(gram) AS cov
       |  FROM rep_grams GROUP BY 1, 2, 3),
       |rep_pern AS (
       |  SELECT doc_id, n, MAX(cov) AS top_cov,
       |         SUM(CASE WHEN c > 1 THEN cov END) AS dup_cov
       |  FROM rep_counts GROUP BY 1, 2),
       |rep_piv AS (
       |  SELECT doc_id,
       |    MAX(CASE WHEN n = 2 THEN top_cov END) AS top2,
       |    MAX(CASE WHEN n = 3 THEN top_cov END) AS top3,
       |    MAX(CASE WHEN n = 5 THEN dup_cov END) AS dup5
       |  FROM rep_pern GROUP BY 1)
       |SELECT doc_id, top_bigram_char_frac, top_trigram_char_frac,
       |       dup_5gram_char_frac,
       |       (top_bigram_char_frac > 0.20 OR top_trigram_char_frac > 0.18
       |        OR dup_5gram_char_frac > 0.15) AS flagged_repetitive
       |FROM (
       |  SELECT b.doc_id,
       |    CAST(COALESCE(top2 / nullif(b.n_chars, 0), 0.0) AS DOUBLE) AS top_bigram_char_frac,
       |    CAST(COALESCE(top3 / nullif(b.n_chars, 0), 0.0) AS DOUBLE) AS top_trigram_char_frac,
       |    CAST(COALESCE(dup5 / nullif(b.n_chars, 0), 0.0) AS DOUBLE) AS dup_5gram_char_frac
       |  FROM rep_base b LEFT JOIN rep_piv USING (doc_id))""".stripMargin
  }

  /** Mirrors [[graft.ops.TextAnalysis.piiScan]] over the injected corpus
    * ([[graft.ops.Portable.piiInjectDuck]]). DuckDB `regexp_replace` is
    * first-match-only without the 'g' flag.
    */
  val TEXT_PII: String = {
    val counts = piiPatterns.map { case (name, pat, _) =>
      s"CAST(len(regexp_extract_all(text, ${regexLitDuck(pat)})) AS BIGINT) AS n_${name}s"
    }
    val redacted = piiPatterns.foldLeft("text") { case (acc, (_, pat, mask)) =>
      s"regexp_replace($acc, ${regexLitDuck(pat)}, '$mask', 'g')"
    }
    s"""SELECT doc_id, ${piiPatterns.map { case (n, _, _) => s"n_${n}s" }.mkString(", ")},
       |       redacted_text,
       |       (n_emails > 0 OR n_ipv4s > 0 OR n_phones > 0) AS has_pii
       |FROM (
       |  SELECT doc_id,
       |    ${counts.mkString(",\n    ")},
       |    $redacted AS redacted_text
       |  FROM (SELECT doc_id, $piiInjectDuck AS text FROM documents))""".stripMargin
  }

  /** Mirrors [[graft.ops.Sampling.stratifiedAssign]] — same portable hash,
    * same integerized thresholds ([[graft.ops.Portable.sampleThresholdCase]]
    * is dialect-free and splatted verbatim into both engines).
    */
  val SAMPLE_ASSIGN: String =
    s"""SELECT doc_id, stratum, bucket, threshold, bucket < threshold AS kept
       |FROM (
       |  SELECT doc_id, lang AS stratum,
       |    ${hexcastDuck("'sample:' || lang || ':' || CAST(doc_id AS VARCHAR)")} % $SampleMod AS bucket,
       |    CAST(${sampleThresholdCase("lang")} AS BIGINT) AS threshold
       |  FROM documents)""".stripMargin

  /** Mirrors [[graft.ops.Sampling.targetAssign]] at the spec'd fixture
    * target — same integer ceiling division, `//` in DuckDB, `div` in
    * Spark. LEFT join like the engine: a NULL-lang doc keeps its audit row
    * (NULL threshold / kept) instead of being dropped — the engines must
    * agree on NULL-stratum rows the moment the fixture grows one.
    */
  def SAMPLE_TARGET_ASSIGN(target: Long): String =
    s"""SELECT doc_id, stratum, bucket, threshold, bucket < threshold AS kept
       |FROM (
       |  SELECT d.doc_id, d.lang AS stratum,
       |    ${hexcastDuck("'sample:' || lang || ':' || CAST(doc_id AS VARCHAR)")} % $SampleMod AS bucket,
       |    t.threshold
       |  FROM documents d
       |  LEFT JOIN (
       |    SELECT lang AS stratum,
       |           CAST(least($SampleMod, (${target * SampleMod} + COUNT(*) - 1) // COUNT(*)) AS BIGINT) AS threshold
       |    FROM documents GROUP BY lang) t ON t.stratum = d.lang)""".stripMargin

  val SAMPLE_CORPUS: String =
    s"""SELECT d.* FROM documents d
       |JOIN ($SAMPLE_ASSIGN) a ON d.doc_id = a.doc_id AND a.kept""".stripMargin

  val SAMPLE_SUMMARY: String =
    s"""SELECT stratum,
       |  CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(MAX(threshold) AS DOUBLE) / CAST($SampleMod AS DOUBLE) AS target_rate,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS realized_rate
       |FROM ($SAMPLE_ASSIGN) GROUP BY 1""".stripMargin

  /** Mirrors [[graft.ops.Sampling.temperatureAssign]] — the same α=1/2
    * arithmetic step for step: exact integer counts, ONE division, ONE
    * sqrt, ONE multiply by the exact 1e6 modulus, floor. Every step is
    * IEEE-correctly-rounded in both engines, so the thresholds are
    * bit-identical (the reason α is pinned to 1/2 rather than an
    * implementation-rounded `pow`).
    */
  private val temperatureChain: String =
    s"""tm_counts AS (
       |  SELECT lang AS stratum, CAST(count(*) AS BIGINT) AS n_total
       |  FROM documents WHERE lang IS NOT NULL GROUP BY lang),
       |tm_thresholds AS (
       |  SELECT stratum, n_total,
       |         CAST(floor(CAST($SampleMod AS DOUBLE) *
       |           sqrt(CAST(min(n_total) OVER () AS DOUBLE) / n_total))
       |           AS BIGINT) AS threshold
       |  FROM tm_counts)""".stripMargin

  val SAMPLE_TEMPERATURE_ASSIGN: String =
    s"""WITH $temperatureChain
       |SELECT doc_id, stratum, bucket, threshold, bucket < threshold AS kept
       |FROM (
       |  SELECT d.doc_id, d.lang AS stratum,
       |    ${hexcastDuck("'temp:' || lang || ':' || CAST(doc_id AS VARCHAR)")} % $SampleMod AS bucket,
       |    t.threshold
       |  FROM documents d
       |  LEFT JOIN tm_thresholds t ON t.stratum = d.lang)""".stripMargin

  /** Mirrors [[graft.ops.LmPerplexity]] — the bigram-LM chain integerized
    * at train time exactly like the Spark build (one `ln` per model row,
    * the unseen-context fallback a driver-splatted constant shared by
    * both dialects). Bigrams assemble positionally via zipped
    * `unnest(list_transform(generate_series(...)))` — DuckDB's spelling
    * of the Spark side's posexplode + window lead.
    */
  private val lmChain: String = {
    import graft.ops.LmPerplexity.{Alpha, Buckets, Micro, OovMicro, SeedSource}
    val AB = Alpha * Buckets
    def h(e: String) = s"${hexcastDuck(s"'lm:' || $e")} % $Buckets"
    s"""lm_tok AS (
       |  SELECT doc_id, source, $tokensDuck AS toks FROM documents),
       |lm_big AS (
       |  SELECT doc_id, source,
       |         unnest(list_transform(generate_series(1, len(toks) - 1),
       |           i -> ${h("toks[CAST(i AS INT)]")})) AS b1,
       |         unnest(list_transform(generate_series(1, len(toks) - 1),
       |           i -> ${h("toks[CAST(i AS INT) + 1]")})) AS b2
       |  FROM lm_tok WHERE len(toks) >= 2),
       |lm_counts AS (
       |  SELECT b1, b2, CAST(count(*) AS BIGINT) AS c2
       |  FROM lm_big WHERE source = '$SeedSource' GROUP BY 1, 2),
       |lm_ctx AS (
       |  SELECT b1, c1,
       |         CAST(floor(ln(CAST($Alpha AS DOUBLE) / (c1 + $AB)) * $Micro) AS BIGINT) AS oov_micro
       |  FROM (SELECT b1, CAST(sum(c2) AS BIGINT) AS c1
       |        FROM lm_counts GROUP BY b1)),
       |lm_model AS (
       |  SELECT c.b1, c.b2, c.c2,
       |         CAST(floor(ln(CAST(c.c2 + $Alpha AS DOUBLE) / (x.c1 + $AB)) * $Micro) AS BIGINT) AS lp_micro
       |  FROM lm_counts c JOIN lm_ctx x USING (b1)),
       |lm_scored AS (
       |  SELECT d.doc_id,
       |         CAST(coalesce(s.n_bigrams, 0) AS BIGINT) AS n_bigrams,
       |         CAST(coalesce(s.logprob_micro, 0) AS BIGINT) AS logprob_micro
       |  FROM documents d
       |  LEFT JOIN (
       |    SELECT g.doc_id, CAST(count(*) AS BIGINT) AS n_bigrams,
       |           CAST(sum(coalesce(m.lp_micro, x.oov_micro, $OovMicro)) AS BIGINT) AS logprob_micro
       |    FROM lm_big g
       |    LEFT JOIN lm_model m ON g.b1 = m.b1 AND g.b2 = m.b2
       |    LEFT JOIN lm_ctx x ON g.b1 = x.b1
       |    GROUP BY g.doc_id) s ON d.doc_id = s.doc_id)""".stripMargin
  }

  val QUALITY_LM_MODEL: String =
    s"""WITH $lmChain
       |SELECT b1, b2, c2, lp_micro FROM lm_model""".stripMargin

  val QUALITY_LM_PPL: String =
    s"""WITH $lmChain
       |SELECT doc_id, n_bigrams, logprob_micro FROM lm_scored""".stripMargin

  val QUALITY_LM_SELECT: String =
    s"""WITH $lmChain
       |SELECT doc_id, n_bigrams, logprob_micro FROM lm_scored
       |WHERE n_bigrams >= 1
       |  AND logprob_micro >= ${graft.ops.LmPerplexity.SelectTauMicro} * n_bigrams""".stripMargin

  val QUALITY_LM_SUMMARY: String = {
    val tau = graft.ops.LmPerplexity.SelectTauMicro
    s"""WITH $lmChain
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN n_bigrams >= 1 AND logprob_micro >= $tau * n_bigrams
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |       CAST(min(logprob_micro) AS BIGINT) AS min_logprob_micro,
       |       CAST(max(logprob_micro) AS BIGINT) AS max_logprob_micro
       |FROM lm_scored JOIN documents USING (doc_id)
       |GROUP BY source""".stripMargin
  }

  /** Mirrors SparkEntry's ad-hoc `sql_temperature_by_source` over the
    * registered assignment view — order-independent aggregates only.
    */
  val SQL_TEMPERATURE_BY_SOURCE: String =
    s"""SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |       CAST(min(threshold) AS BIGINT) AS min_threshold,
       |       CAST(max(threshold) AS BIGINT) AS max_threshold
       |FROM ($SAMPLE_TEMPERATURE_ASSIGN) JOIN documents USING (doc_id)
       |GROUP BY source
       |ORDER BY source""".stripMargin

  val SAMPLE_TEMPERATURE_SUMMARY: String =
    s"""SELECT stratum,
       |  CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
       |  CAST(MAX(threshold) AS DOUBLE) / CAST($SampleMod AS DOUBLE) AS target_rate,
       |  CAST(SUM(CASE WHEN kept THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) AS realized_rate
       |FROM ($SAMPLE_TEMPERATURE_ASSIGN) GROUP BY 1""".stripMargin

  /** Mirrors [[graft.ops.Sampling.sourceCap]]: same salted portable hash,
    * same (hash, doc_id) election order, same cap constant.
    */
  val SAMPLE_SOURCE_CAP: String =
    s"""SELECT doc_id, source, cap_hash, CAST(src_rank AS BIGINT) AS src_rank
       |FROM (
       |  SELECT doc_id, source, cap_hash,
       |         row_number() OVER (PARTITION BY source
       |           ORDER BY cap_hash, doc_id) AS src_rank
       |  FROM (
       |    SELECT doc_id, source,
       |      ${hexcastDuck("'cap:' || source || ':' || CAST(doc_id AS VARCHAR)")} AS cap_hash
       |    FROM documents))
       |WHERE src_rank <= ${graft.ops.Sampling.SourceCapK}""".stripMargin

  val SIM_LSH_NEARDUP: String =
    s"""WITH $normedEmb, $simSig, $simBands, $simBandsX,
       |sim_cand AS (
       |  SELECT DISTINCT a_id, b_id FROM (
       |    SELECT qa.vec_id AS a_id, qb.vec_id AS b_id
       |    FROM (SELECT vec_id, q, nib FROM sim_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) qa
       |    JOIN (SELECT vec_id, q, nib FROM sim_bandsx
       |          WHERE bdf <= $MaxBandOccupancy) qb
       |      ON qa.q = qb.q AND qa.nib = qb.nib AND qa.vec_id < qb.vec_id
       |    UNION ALL
       |    SELECT broot AS a_id, vec_id AS b_id FROM sim_bandsx
       |    WHERE bdf > $MaxBandOccupancy AND vec_id <> broot))
       |SELECT * FROM (
       |  SELECT c.a_id, c.b_id,
       |         ${dotDuck("a.embedding", "b.embedding")} / (a.norm * b.norm) AS cos_sim
       |  FROM sim_cand c
       |  JOIN de_e a ON c.a_id = a.vec_id
       |  JOIN de_e b ON c.b_id = b.vec_id)
       |WHERE cos_sim >= $NearDupCosine""".stripMargin

  // ---- composed curation funnel (graft.ops.Curation) ----

  private val curQualityMin = graft.ops.Curation.QualityMin

  /** Mirrors [[graft.ops.Curation.audit]]: the keeper election of
    * [[DEDUP_KEEPER_QUALITY]] joined with the repetition, sampling, and
    * split stage decisions, all keyed on doc_id. The engine's `max_by`
    * election over (has_score, score, −id) is value-identical to the
    * window rank here (quality DESC nulls-last, doc_id ASC) — the same
    * equivalence [[DEDUP_KEEPER_QUALITY]] verifies.
    */
  private val curAuditChain: String =
    s"""cur_quality AS (SELECT doc_id, quality_score FROM ($TEXT_QUALITY)),
       |cur_keeper AS (
       |  SELECT doc_id, cluster_id, quality_score,
       |         CASE WHEN row_number() OVER (
       |                PARTITION BY cluster_id
       |                ORDER BY quality_score DESC, doc_id) = 1
       |              THEN 1 ELSE 0 END AS is_keeper
       |  FROM dd_clusters JOIN cur_quality USING (doc_id)),
       |cur_audit AS (
       |  SELECT k.doc_id, k.cluster_id, k.quality_score, k.is_keeper,
       |         k.quality_score >= $curQualityMin AS passes_quality,
       |         r.flagged_repetitive, s.stratum AS lang,
       |         s.kept AS sample_kept, p.split,
       |         (k.is_keeper = 1 AND k.quality_score >= $curQualityMin
       |          AND NOT r.flagged_repetitive AND s.kept) AS curated
       |  FROM cur_keeper k
       |  JOIN (SELECT doc_id, flagged_repetitive
       |        FROM ($TEXT_REPETITION)) r USING (doc_id)
       |  JOIN ($SAMPLE_ASSIGN) s USING (doc_id)
       |  JOIN ($SPLIT_ASSIGN) p USING (doc_id))""".stripMargin

  val CURATE_AUDIT: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain
       |SELECT * FROM cur_audit""".stripMargin

  /** Mirrors [[graft.ops.Curation.corpus]]. */
  val CURATE_CORPUS: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain
       |SELECT d.doc_id, d.lang, d.source, d.n_chars,
       |       a.quality_score, a.split
       |FROM documents d
       |JOIN (SELECT doc_id, quality_score, split FROM cur_audit
       |      WHERE curated) a USING (doc_id)""".stripMargin

  /** Composition: chunk dedup over the CURATED corpus — the C4 ordering
    * (document-level curation, then cross-document span dedup). The
    * keep-first election runs on the curated subset only, mirroring the
    * Spark side's curated-ids join, so a chunk whose first occurrence was
    * in a REJECTED document survives in its first curated holder.
    */
  val CURATE_CHUNK_CORPUS: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain,
       |cur_docs AS (
       |  SELECT d.doc_id, d.text FROM documents d
       |  JOIN (SELECT doc_id FROM cur_audit WHERE curated) c USING (doc_id)),
       |${chunkChainFrom("cur_docs")}
       |SELECT doc_id,
       |       coalesce(string_agg(chunk_text, ' ' ORDER BY chunk_idx)
       |                  FILTER (WHERE kept), '') AS clean_text,
       |       CAST(count(*) AS BIGINT) AS n_chunks,
       |       CAST(count(*) FILTER (WHERE kept) AS BIGINT) AS n_kept
       |FROM ck_flag GROUP BY doc_id""".stripMargin

  private val curFunnelCounters: String =
    s"""CAST(COUNT(*) AS BIGINT) AS n_total,
       |  CAST(SUM(CASE WHEN is_keeper = 1 THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_after_dedup,
       |  CAST(SUM(CASE WHEN is_keeper = 1 AND passes_quality
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_quality,
       |  CAST(SUM(CASE WHEN is_keeper = 1 AND passes_quality
       |                     AND NOT flagged_repetitive
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_after_repetition,
       |  CAST(SUM(CASE WHEN curated THEN 1 ELSE 0 END) AS BIGINT)
       |    AS n_curated,
       |  CAST(SUM(CASE WHEN curated AND split = 'train' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_train,
       |  CAST(SUM(CASE WHEN curated AND split = 'val' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_val,
       |  CAST(SUM(CASE WHEN curated AND split = 'test' THEN 1 ELSE 0 END)
       |    AS BIGINT) AS n_test""".stripMargin

  /** Mirrors [[graft.ops.Curation.funnel]]. */
  val CURATE_FUNNEL: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain
       |SELECT $curFunnelCounters
       |FROM cur_audit""".stripMargin

  /** Mirrors the `curate_token_shards` composition: [[SPLIT_TOKEN_SHARDS]]
    * over only the curated documents — the funnel's output artifact packed
    * into training shards.
    */
  val CURATE_TOKEN_SHARDS: String = {
    import graft.ops.HashSplit.ShardTokenBudget
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain
       |SELECT doc_id, n_tok,
       |       CAST(sum(n_tok) OVER w AS BIGINT) AS cum_tokens,
       |       CAST((sum(n_tok) OVER w - n_tok) // $ShardTokenBudget AS BIGINT)
       |         AS shard_id
       |FROM (SELECT doc_id, CAST(len($tokensDuck) AS BIGINT) AS n_tok
       |      FROM documents
       |      WHERE doc_id IN (SELECT doc_id FROM cur_audit WHERE curated))
       |WINDOW w AS (ORDER BY doc_id ROWS BETWEEN UNBOUNDED PRECEDING
       |             AND CURRENT ROW)""".stripMargin
  }

  /** Mirrors the `sql_curation_by_source` view query — plain SQL over the
    * curated-corpus view, aggregated with order-independent functions
    * only.
    */
  val SQL_CURATION_BY_SOURCE: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain,
       |cur_corpus AS (
       |  SELECT d.doc_id, d.lang, d.source, d.n_chars,
       |         a.quality_score, a.split
       |  FROM documents d
       |  JOIN (SELECT doc_id, quality_score, split FROM cur_audit
       |        WHERE curated) a USING (doc_id))
       |SELECT source, split,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(n_chars) AS BIGINT) AS total_chars,
       |       CAST(min(quality_score) AS DOUBLE) AS min_quality,
       |       CAST(max(quality_score) AS DOUBLE) AS max_quality
       |FROM cur_corpus
       |GROUP BY source, split""".stripMargin

  /** Mirrors [[graft.ops.Curation.funnelByLang]]. */
  val CURATE_FUNNEL_LANG: String =
    s"""WITH RECURSIVE ${ddShingleChain.mkString(",\n")},
       |$ddClusterChain,
       |$curAuditChain
       |SELECT lang, $curFunnelCounters
       |FROM cur_audit GROUP BY lang""".stripMargin

  // ---- NB quality classifier (graft.ops.QualityClassifier) ----

  private val NbB = graft.ops.QualityClassifier.Buckets
  private val NbMicro = graft.ops.QualityClassifier.Micro
  private val NbTau = graft.ops.QualityClassifier.SelectTauMicro
  private val NbSeed = graft.ops.QualityClassifier.SeedSource

  /** Mirrors [[graft.ops.QualityClassifier.modelTable]]: hashed
    * `q:`-prefixed unigram buckets, per-class token totals, add-1-smoothed
    * seed/crawl log-odds integerized at 1e6.
    */
  private val nbModelChain: String =
    s"""nb_tok AS (
       |  SELECT doc_id, source, ${hexcastDuck("'q:' || tok")} % $NbB AS bucket
       |  FROM (SELECT doc_id, source, unnest($tokensDuck) AS tok
       |        FROM documents)),
       |nb_feat AS (
       |  SELECT doc_id, source, bucket, CAST(count(*) AS BIGINT) AS n
       |  FROM nb_tok GROUP BY 1, 2, 3),
       |nb_pb AS (
       |  SELECT bucket,
       |         CAST(COALESCE(sum(CASE WHEN source = '$NbSeed' THEN n END), 0) AS BIGINT) AS n_seed,
       |         CAST(COALESCE(sum(CASE WHEN source <> '$NbSeed' THEN n END), 0) AS BIGINT) AS n_crawl
       |  FROM nb_feat GROUP BY 1),
       |nb_tot AS (
       |  SELECT CAST(sum(n_seed) AS BIGINT) AS tot_seed,
       |         CAST(sum(n_crawl) AS BIGINT) AS tot_crawl
       |  FROM nb_pb),
       |nb_model AS (
       |  SELECT bucket, n_seed, n_crawl,
       |         CAST(floor((ln(CAST(n_seed + 1 AS DOUBLE) / (tot_seed + $NbB))
       |           - ln(CAST(n_crawl + 1 AS DOUBLE) / (tot_crawl + $NbB))) * $NbMicro) AS BIGINT) AS w_micro
       |  FROM nb_pb CROSS JOIN nb_tot)""".stripMargin

  /** Mirrors [[graft.ops.QualityClassifier.score]]: exact integer Σ n·w
    * plus the document-count class prior.
    */
  private val nbScoreChain: String =
    s"""$nbModelChain,
       |nb_prior AS (
       |  SELECT CAST(floor(ln(CAST(n_docs_seed + 1 AS DOUBLE)
       |           / (n_docs_crawl + 1)) * $NbMicro) AS BIGINT) AS prior_micro
       |  FROM (
       |    SELECT CAST(COALESCE(sum(CASE WHEN source = '$NbSeed' THEN 1 END), 0) AS BIGINT) AS n_docs_seed,
       |           CAST(COALESCE(sum(CASE WHEN source <> '$NbSeed' THEN 1 END), 0) AS BIGINT) AS n_docs_crawl
       |    FROM documents)),
       |nb_score AS (
       |  SELECT d.doc_id,
       |         CAST(COALESCE(f.n_tokens, 0) AS BIGINT) AS n_tokens,
       |         CAST(COALESCE(f.lk, 0) AS BIGINT) AS like_micro,
       |         CAST(COALESCE(f.lk, 0) + p.prior_micro AS BIGINT) AS score_micro
       |  FROM documents d
       |  CROSS JOIN nb_prior p
       |  LEFT JOIN (
       |    SELECT doc_id, CAST(sum(n) AS BIGINT) AS n_tokens,
       |           CAST(sum(n * COALESCE(w_micro, 0)) AS BIGINT) AS lk
       |    FROM nb_feat LEFT JOIN nb_model USING (bucket) GROUP BY 1) f
       |  USING (doc_id))""".stripMargin

  val QUALITY_NB_MODEL: String =
    s"WITH $nbModelChain\nSELECT bucket, n_seed, n_crawl, w_micro FROM nb_model"

  val QUALITY_NB_SCORE: String =
    s"WITH $nbScoreChain\nSELECT doc_id, n_tokens, like_micro, score_micro FROM nb_score"

  val QUALITY_NB_SELECT: String =
    s"""WITH $nbScoreChain
       |SELECT doc_id, n_tokens, like_micro, score_micro
       |FROM nb_score
       |WHERE n_tokens >= 1 AND like_micro >= $NbTau * n_tokens""".stripMargin

  // ---- sequence packing (graft.ops.Packing) ----

  private val PackBudget = graft.ops.Packing.Budget
  private val PackShards = graft.ops.Packing.Shards

  /** Mirrors [[graft.ops.Packing.packBins]] over an explicit sized CTE:
    * md5 shard, per-shard running token sum ordered by doc_id,
    * bin = floor(span-start / budget).
    */
  private def packChainFrom(sized: String, cp: String = ""): String =
    s"""${cp}pk_sized AS ($sized),
       |${cp}pk_cum AS (
       |  SELECT doc_id, shard, n_tokens,
       |         CAST(sum(n_tokens) OVER (PARTITION BY shard ORDER BY doc_id
       |           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_tokens
       |  FROM ${cp}pk_sized),
       |${cp}pk_bins AS (
       |  SELECT doc_id, shard, n_tokens,
       |         CAST(floor((cum_tokens - n_tokens) / $PackBudget) AS BIGINT) AS bin,
       |         CAST((cum_tokens - n_tokens)
       |           - CAST(floor((cum_tokens - n_tokens) / $PackBudget) AS BIGINT) * $PackBudget
       |           AS BIGINT) AS bin_offset
       |  FROM ${cp}pk_cum)""".stripMargin

  /** The default whitespace-count sizing. */
  private val packChain: String = packChainFrom(
    s"""
       |  SELECT doc_id,
       |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
       |         CAST(len($tokensDuck) AS BIGINT) AS n_tokens
       |  FROM documents""".stripMargin)

  val CURATE_PACK_BINS: String =
    s"WITH $packChain\nSELECT doc_id, shard, n_tokens, bin, bin_offset FROM pk_bins"

  /** Mirrors `Packing.packBins(docs, nTokensSql = TextAnalysis
    * .subwordCountSql)` — the opt-in SUBWORD `n_tokens` source composed
    * with the packing math: the greedy-WordPiece chain sizes each
    * document, the pack chain bins it. Cross-engine proof that the
    * trainer-budget counts feed the same packing invariants.
    */
  val CURATE_PACK_BINS_SUBWORD: String =
    s"""WITH RECURSIVE $subwordChain,
       |${packChainFrom(
      s"""
         |  SELECT d.doc_id,
         |         ${hexcastDuck("'pack:' || CAST(d.doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(coalesce(dc.n_subwords, 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN doc_counts dc USING (doc_id)""".stripMargin)}
       |SELECT doc_id, shard, n_tokens, bin, bin_offset FROM pk_bins""".stripMargin

  /** Mirrors `Packing.binManifest(docs, nTokensSql = subwordCountSql)` —
    * the attention-mask surface: per-document span coordinates inside
    * each bin's concatenated stream, sized in the SAME subword unit the
    * payload feed prices with (`span_start` = the mm slot arithmetic
    * applied to every document, `span_len` = the doc's token count).
    */
  val CURATE_BIN_MANIFEST: String =
    s"""WITH RECURSIVE $subwordChain,
       |${packChainFrom(
      s"""
         |  SELECT d.doc_id,
         |         ${hexcastDuck("'pack:' || CAST(d.doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(coalesce(dc.n_subwords, 0) AS BIGINT) AS n_tokens
         |  FROM documents d LEFT JOIN doc_counts dc USING (doc_id)""".stripMargin)}
       |SELECT shard, bin, doc_id,
       |       CAST(bin_offset - min(bin_offset)
       |         OVER (PARTITION BY shard, bin) AS BIGINT) AS span_start,
       |       CAST(n_tokens AS BIGINT) AS span_len
       |FROM pk_bins""".stripMargin

  /** Mirrors `Packing.binPayloadsChecked`: per-(shard, bin) concatenated
    * id streams in doc_id order, sized by the SAME per-doc id lengths the
    * payloads carry, checked as the '-'-joined string form.
    */
  val CURATE_BIN_PAYLOADS: String =
    s"""WITH RECURSIVE $subwordChain,
       |${subwordDocIdsCtes()},
       |per_doc AS (
       |  SELECT d.doc_id,
       |         coalesce(di.input_ids, CAST([] AS BIGINT[])) AS input_ids
       |  FROM documents d LEFT JOIN doc_ids di USING (doc_id)
       |),
       |${packChainFrom(
      s"""
         |  SELECT doc_id,
         |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(len(input_ids) AS BIGINT) AS n_tokens
         |  FROM per_doc""".stripMargin)}
       |SELECT pb.shard, pb.bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(pb.n_tokens) AS BIGINT) AS bin_tokens,
       |  array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
       |    AS input_ids_str
       |FROM pk_bins pb JOIN per_doc pd USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Mirrors `Packing.binPayloadsMmChecked` — interleaved multimodal
    * packing: image-carrying docs (`doc_id % 3 = 0`, the
    * [[graft.ops.Multimodal]] type rule) prepend one `-1` placeholder to
    * their id stream (the placeholder prices one budget token), and each
    * bin's sidecar lists `(stream-slot, media_ref)` pairs where the slot
    * is the span offset relative to the bin's FIRST span (a predecessor's
    * overflow shifts the stream start).
    */
  val CURATE_BIN_PAYLOADS_MM: String =
    s"""WITH RECURSIVE $subwordChain,
       |${subwordDocIdsCtes()},
       |per_doc AS (
       |  SELECT d.doc_id,
       |         CASE WHEN d.doc_id % 3 = 0
       |              THEN [CAST(-1 AS BIGINT)] ||
       |                   coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |              ELSE coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |         END AS input_ids
       |  FROM documents d LEFT JOIN doc_ids di USING (doc_id)
       |),
       |${packChainFrom(
      s"""
         |  SELECT doc_id,
         |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(len(input_ids) AS BIGINT) AS n_tokens
         |  FROM per_doc""".stripMargin)},
       |mm_based AS (
       |  SELECT pb.*,
       |         pb.bin_offset - min(pb.bin_offset)
       |           OVER (PARTITION BY pb.shard, pb.bin) AS slot
       |  FROM pk_bins pb)
       |SELECT mb.shard, mb.bin,
       |  CAST(count(*) AS BIGINT) AS n_docs,
       |  CAST(sum(mb.n_tokens) AS BIGINT) AS bin_tokens,
       |  array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
       |    AS input_ids_str,
       |  coalesce(array_to_string(
       |    list(CAST(mb.slot AS VARCHAR) || ':' || CAST(mb.doc_id AS VARCHAR)
       |         ORDER BY mb.slot, mb.doc_id)
       |      FILTER (WHERE mb.doc_id % 3 = 0), '-'), '') AS media_slots_str
       |FROM mm_based mb JOIN per_doc pd USING (doc_id)
       |GROUP BY 1, 2""".stripMargin

  /** Mirrors `Packing.readerFeedMmChecked` — the [[CURATE_BIN_PAYLOADS_MM]]
    * per-bin rows dealt by the epoch-1 salted hash, ids and media sidecar
    * riding the same fetch.
    */
  val CURATE_READER_FEED_MM: String = {
    val readers = graft.ops.Packing.Readers
    s"""WITH RECURSIVE $subwordChain,
       |${subwordDocIdsCtes()},
       |per_doc AS (
       |  SELECT d.doc_id,
       |         CASE WHEN d.doc_id % 3 = 0
       |              THEN [CAST(-1 AS BIGINT)] ||
       |                   coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |              ELSE coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |         END AS input_ids
       |  FROM documents d LEFT JOIN doc_ids di USING (doc_id)
       |),
       |${packChainFrom(
      s"""
         |  SELECT doc_id,
         |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(len(input_ids) AS BIGINT) AS n_tokens
         |  FROM per_doc""".stripMargin)},
       |mm_based AS (
       |  SELECT pb.*,
       |         pb.bin_offset - min(pb.bin_offset)
       |           OVER (PARTITION BY pb.shard, pb.bin) AS slot
       |  FROM pk_bins pb),
       |mm_payloads AS (
       |  SELECT mb.shard, mb.bin,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(mb.n_tokens) AS BIGINT) AS bin_tokens,
       |    array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
       |      AS input_ids_str,
       |    coalesce(array_to_string(
       |      list(CAST(mb.slot AS VARCHAR) || ':' || CAST(mb.doc_id AS VARCHAR)
       |           ORDER BY mb.slot, mb.doc_id)
       |        FILTER (WHERE mb.doc_id % 3 = 0), '-'), '') AS media_slots_str
       |  FROM mm_based mb JOIN per_doc pd USING (doc_id)
       |  GROUP BY 1, 2),
       |mm_hash AS (
       |  SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |  FROM mm_payloads)
       |SELECT order_hash % $readers AS reader,
       |       CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |         ORDER BY order_hash, shard, bin) AS BIGINT) AS reader_pos,
       |       shard, bin, n_docs, bin_tokens, order_hash, input_ids_str,
       |       media_slots_str
       |FROM mm_hash""".stripMargin
  }

  /** Mirrors `Packing.readerFeedChecked`: the trainer-reader fetch —
    * the bin-payload chain's per-bin rows dealt by the epoch-1 salted
    * hash into reader streams (the [[CURATE_EPOCH_PLAN]] dealing over
    * the PAYLOAD relation's own stats), each row carrying its
    * concatenated id stream in the checked string form.
    */
  val CURATE_READER_FEED: String = {
    val readers = graft.ops.Packing.Readers
    s"""WITH RECURSIVE $subwordChain,
       |${subwordDocIdsCtes()},
       |per_doc AS (
       |  SELECT d.doc_id,
       |         coalesce(di.input_ids, CAST([] AS BIGINT[])) AS input_ids
       |  FROM documents d LEFT JOIN doc_ids di USING (doc_id)
       |),
       |${packChainFrom(
      s"""
         |  SELECT doc_id,
         |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(len(input_ids) AS BIGINT) AS n_tokens
         |  FROM per_doc""".stripMargin)},
       |rf_payloads AS (
       |  SELECT pb.shard, pb.bin,
       |    CAST(count(*) AS BIGINT) AS n_docs,
       |    CAST(sum(pb.n_tokens) AS BIGINT) AS bin_tokens,
       |    array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
       |      AS input_ids_str
       |  FROM pk_bins pb JOIN per_doc pd USING (doc_id)
       |  GROUP BY 1, 2),
       |rf_hash AS (
       |  SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |  FROM rf_payloads)
       |SELECT order_hash % $readers AS reader,
       |       CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |         ORDER BY order_hash, shard, bin) AS BIGINT) AS reader_pos,
       |       shard, bin, n_docs, bin_tokens, order_hash, input_ids_str
       |FROM rf_hash""".stripMargin
  }

  /** Mirrors [[graft.ops.Packing.stats]]. */
  val CURATE_PACK_STATS: String =
    s"""WITH $packChain,
       |pk_per_bin AS (
       |  SELECT shard, bin, CAST(count(*) AS BIGINT) AS bin_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |  FROM pk_bins GROUP BY 1, 2)
       |SELECT shard,
       |       CAST(sum(bin_docs) AS BIGINT) AS n_docs,
       |       CAST(count(*) AS BIGINT) AS n_bins,
       |       CAST(sum(bin_tokens) AS BIGINT) AS total_tokens,
       |       CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
       |       CAST(sum(CASE WHEN bin_tokens > $PackBudget THEN 1 ELSE 0 END) AS BIGINT) AS overflow_bins
       |FROM pk_per_bin GROUP BY shard""".stripMargin

  /** Mirrors [[graft.ops.Packing.epochPlan]] at the battery's epoch=1,
    * readers=[[graft.ops.Packing.Readers]]: same salted hash, same
    * (order_hash, shard, bin) tie-break order.
    */
  val CURATE_EPOCH_PLAN: String = {
    val readers = graft.ops.Packing.Readers
    s"""WITH $packChain,
       |ep_bins AS (
       |  SELECT shard, bin, CAST(count(*) AS BIGINT) AS n_docs,
       |         CAST(sum(n_tokens) AS BIGINT) AS bin_tokens
       |  FROM pk_bins GROUP BY 1, 2),
       |ep_hash AS (
       |  SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |  FROM ep_bins)
       |SELECT shard, bin, n_docs, bin_tokens,
       |       order_hash % $readers AS reader, order_hash,
       |       CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |         ORDER BY order_hash, shard, bin) AS BIGINT) AS reader_pos
       |FROM ep_hash""".stripMargin
  }

  /** Mirrors `Packing.readerFeedBytesChecked` — the vision-language
    * loader's LAST MILE: the [[CURATE_READER_FEED_MM]] deal joined back
    * onto the per-carrier slot rows and the media catalog's payload
    * bytes, one row per `(reader, reader_pos, slot)` fingerprinted by
    * the payload's md5 (the [[MEDIA_CATALOG]] convention — the catalog's
    * payloads are deterministic md5 chunks of the text).
    */
  val CURATE_READER_FEED_BYTES: String = {
    val readers = graft.ops.Packing.Readers
    s"""WITH RECURSIVE $subwordChain,
       |${subwordDocIdsCtes()},
       |per_doc AS (
       |  SELECT d.doc_id,
       |         CASE WHEN d.doc_id % 3 = 0
       |              THEN [CAST(-1 AS BIGINT)] ||
       |                   coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |              ELSE coalesce(di.input_ids, CAST([] AS BIGINT[]))
       |         END AS input_ids
       |  FROM documents d LEFT JOIN doc_ids di USING (doc_id)
       |),
       |${packChainFrom(
      s"""
         |  SELECT doc_id,
         |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
         |         CAST(len(input_ids) AS BIGINT) AS n_tokens
         |  FROM per_doc""".stripMargin)},
       |mm_based AS (
       |  SELECT pb.*,
       |         pb.bin_offset - min(pb.bin_offset)
       |           OVER (PARTITION BY pb.shard, pb.bin) AS slot
       |  FROM pk_bins pb),
       |mm_stats AS (
       |  SELECT shard, bin FROM pk_bins GROUP BY 1, 2),
       |mm_plan AS (
       |  SELECT shard, bin, order_hash % $readers AS reader,
       |         CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |           ORDER BY order_hash, shard, bin) AS BIGINT) AS reader_pos
       |  FROM (SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |    FROM mm_stats)),
       |$mmBase
       |SELECT p.reader, p.reader_pos, p.shard, p.bin,
       |       CAST(mb.slot AS BIGINT) AS slot, mb.doc_id AS media_ref,
       |       m.media_type,
       |       CAST(length(m.payload_hex) / 2 AS BIGINT) AS n_bytes,
       |       md5(m.payload_hex) AS payload_md5
       |FROM mm_plan p
       |JOIN mm_based mb USING (shard, bin)
       |JOIN mm m ON m.media_id = mb.doc_id
       |WHERE mb.doc_id % 3 = 0""".stripMargin
  }

  /** Mirrors the battery's WINDOW byte fetch — one reader's first five
    * positions through the serving store. The window predicate wraps the
    * full [[CURATE_READER_FEED_BYTES]] derivation (DuckDB allows CTEs
    * inside a derived table), so the two rows cannot drift.
    */
  val CURATE_READER_FEED_BYTES_WINDOW: String =
    s"""SELECT * FROM (
       |$CURATE_READER_FEED_BYTES
       |) w WHERE reader = 0 AND reader_pos <= 5""".stripMargin

  /** Mirrors `PackingMigration.eraFeedChecked` over the battery's
    * two-era stand-up (even doc_ids packed under the FIXTURE vocabulary,
    * odd doc_ids under the TRAINED successor via `repackUnderVocab`):
    * each era's packing chain runs under its own vocabulary and corpus
    * slice, the combined deal is salted with (epoch, era, shard, bin),
    * and every bin's `bin_tokens` is priced in its own era's unit.
    */
  val CURATE_ERA_FEED: String = {
    val readers = graft.ops.Packing.Readers
    def eraChain(cp: String, vocab: Seq[String], filt: String): String = {
      val rel = s"(SELECT * FROM documents WHERE $filt)"
      s"""${subwordChainFor(vocab, cp, rel)},
         |${subwordDocIdsCtes(cp, rel)},
         |${cp}per_doc AS (
         |  SELECT d.doc_id,
         |         coalesce(di.input_ids, CAST([] AS BIGINT[])) AS input_ids
         |  FROM $rel d LEFT JOIN ${cp}doc_ids di USING (doc_id)
         |),
         |${packChainFrom(
        s"""
           |  SELECT doc_id,
           |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
           |         CAST(len(input_ids) AS BIGINT) AS n_tokens
           |  FROM ${cp}per_doc""".stripMargin, cp)},
         |${cp}pay AS (
         |  SELECT pb.shard, pb.bin,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(pb.n_tokens) AS BIGINT) AS bin_tokens,
         |    array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
         |      AS input_ids_str
         |  FROM ${cp}pk_bins pb JOIN ${cp}per_doc pd USING (doc_id)
         |  GROUP BY 1, 2)""".stripMargin
    }
    s"""WITH RECURSIVE ${eraChain("e0", subwordVocab, "doc_id % 2 = 0")},
       |${eraChain("e1", trainedFixtureVocab, "doc_id % 2 = 1")},
       |eras AS (
       |  SELECT CAST(0 AS BIGINT) AS era, * FROM e0pay
       |  UNION ALL
       |  SELECT CAST(1 AS BIGINT) AS era, * FROM e1pay),
       |eh AS (
       |  SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(era AS VARCHAR), ':', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |  FROM eras)
       |SELECT era, order_hash % $readers AS reader,
       |       CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |         ORDER BY order_hash, era, shard, bin) AS BIGINT) AS reader_pos,
       |       shard, bin, n_docs, bin_tokens, order_hash, input_ids_str
       |FROM eh""".stripMargin
  }

  /** Mirrors `PackingMigration.eraFeedMmChecked` over the battery's mm
    * two-era stand-up — the [[CURATE_ERA_FEED]] walk with the media
    * sidecar riding every stage: per era, image-carrying docs
    * (`doc_id % 3 = 0`) prepend one `-1` placeholder that prices one
    * budget token, the sidecar lists stream-relative `(slot, media_ref)`
    * pairs, and the combined deal is salted with (epoch, era, shard,
    * bin). `bin_tokens` and the slots are priced/positioned in each
    * era's own unit — the id spaces are different languages and never
    * mix inside one bin.
    */
  val CURATE_ERA_FEED_MM: String = {
    val readers = graft.ops.Packing.Readers
    def eraChainMm(cp: String, vocab: Seq[String], filt: String): String = {
      val rel = s"(SELECT * FROM documents WHERE $filt)"
      s"""${subwordChainFor(vocab, cp, rel)},
         |${subwordDocIdsCtes(cp, rel)},
         |${cp}per_doc AS (
         |  SELECT d.doc_id,
         |         CASE WHEN d.doc_id % 3 = 0
         |              THEN [CAST(-1 AS BIGINT)] ||
         |                   coalesce(di.input_ids, CAST([] AS BIGINT[]))
         |              ELSE coalesce(di.input_ids, CAST([] AS BIGINT[]))
         |         END AS input_ids
         |  FROM $rel d LEFT JOIN ${cp}doc_ids di USING (doc_id)
         |),
         |${packChainFrom(
        s"""
           |  SELECT doc_id,
           |         ${hexcastDuck("'pack:' || CAST(doc_id AS VARCHAR)")} % $PackShards AS shard,
           |         CAST(len(input_ids) AS BIGINT) AS n_tokens
           |  FROM ${cp}per_doc""".stripMargin, cp)},
         |${cp}mm_based AS (
         |  SELECT pb.*,
         |         pb.bin_offset - min(pb.bin_offset)
         |           OVER (PARTITION BY pb.shard, pb.bin) AS slot
         |  FROM ${cp}pk_bins pb),
         |${cp}pay AS (
         |  SELECT mb.shard, mb.bin,
         |    CAST(count(*) AS BIGINT) AS n_docs,
         |    CAST(sum(mb.n_tokens) AS BIGINT) AS bin_tokens,
         |    array_to_string(flatten(list(pd.input_ids ORDER BY pd.doc_id)), '-')
         |      AS input_ids_str,
         |    coalesce(array_to_string(
         |      list(CAST(mb.slot AS VARCHAR) || ':' || CAST(mb.doc_id AS VARCHAR)
         |           ORDER BY mb.slot, mb.doc_id)
         |        FILTER (WHERE mb.doc_id % 3 = 0), '-'), '') AS media_slots_str
         |  FROM ${cp}mm_based mb JOIN ${cp}per_doc pd USING (doc_id)
         |  GROUP BY 1, 2)""".stripMargin
    }
    s"""WITH RECURSIVE ${eraChainMm("e0", subwordVocab, "doc_id % 2 = 0")},
       |${eraChainMm("e1", trainedFixtureVocab, "doc_id % 2 = 1")},
       |eras AS (
       |  SELECT CAST(0 AS BIGINT) AS era, * FROM e0pay
       |  UNION ALL
       |  SELECT CAST(1 AS BIGINT) AS era, * FROM e1pay),
       |eh AS (
       |  SELECT *,
       |    ${hexcastDuck("concat('epoch:1:', CAST(era AS VARCHAR), ':', CAST(shard AS VARCHAR), ':', CAST(bin AS VARCHAR))")} AS order_hash
       |  FROM eras)
       |SELECT era, order_hash % $readers AS reader,
       |       CAST(row_number() OVER (PARTITION BY order_hash % $readers
       |         ORDER BY order_hash, era, shard, bin) AS BIGINT) AS reader_pos,
       |       shard, bin, n_docs, bin_tokens, order_hash, input_ids_str,
       |       media_slots_str
       |FROM eh""".stripMargin
  }

  /** Mirrors SparkEntry's ad-hoc `sql_nb_by_lang` over the registered
    * score view — order-independent aggregates only.
    */
  val SQL_NB_BY_LANG: String =
    s"""WITH $nbScoreChain
       |SELECT lang,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(like_micro) AS BIGINT) AS total_like_micro,
       |       CAST(sum(CASE WHEN n_tokens >= 1 AND like_micro >= $NbTau * n_tokens
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_admitted
       |FROM nb_score JOIN documents USING (doc_id)
       |GROUP BY lang
       |ORDER BY lang""".stripMargin

  /** Mirrors [[graft.ops.QualityClassifier.summary]]. */
  val QUALITY_NB_SUMMARY: String =
    s"""WITH $nbScoreChain
       |SELECT source,
       |       CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN n_tokens >= 1 AND like_micro >= $NbTau * n_tokens
       |                     THEN 1 ELSE 0 END) AS BIGINT) AS n_selected,
       |       CAST(min(like_micro) AS BIGINT) AS min_like_micro,
       |       CAST(max(like_micro) AS BIGINT) AS max_like_micro
       |FROM nb_score JOIN documents USING (doc_id)
       |GROUP BY source""".stripMargin

  /** Mirrors [[graft.ops.Curation.learnedAudit]] — the three learned
    * filters' chains composed in one WITH (their CTE name spaces are
    * disjoint: `nb_*`, `lm_*`, `ds_*`), each verdict the same per-row
    * threshold its own oracle applies. Defined LAST in this object so the
    * referenced chain vals are initialized.
    */
  private val learnedAuditChain: String = {
    val lmTau = graft.ops.LmPerplexity.SelectTauMicro
    s"""$nbScoreChain, $lmChain, $dsirChain, $dsirKeyed,
       |lrn_audit AS (
       |  SELECT d.doc_id,
       |         (n.n_tokens >= 1 AND n.like_micro >= $NbTau * n.n_tokens) AS nb_selected,
       |         (l.n_bigrams >= 1 AND l.logprob_micro >= $lmTau * l.n_bigrams) AS lm_selected,
       |         (k.key_micro >= $DsirTau) AS dsir_selected
       |  FROM documents d
       |  JOIN nb_score n USING (doc_id)
       |  JOIN lm_scored l USING (doc_id)
       |  JOIN ds_key k USING (doc_id))""".stripMargin
  }

  val CURATE_LEARNED_AUDIT: String =
    s"""WITH $learnedAuditChain
       |SELECT doc_id, nb_selected, lm_selected, dsir_selected,
       |       nb_selected AND lm_selected AND dsir_selected AS kept
       |FROM lrn_audit""".stripMargin

  /** Mirrors [[graft.ops.Curation.learnedFunnel]]. */
  val CURATE_LEARNED_FUNNEL: String =
    s"""WITH $learnedAuditChain
       |SELECT CAST(count(*) AS BIGINT) AS n_docs,
       |       CAST(sum(CASE WHEN nb_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_nb,
       |       CAST(sum(CASE WHEN lm_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_lm,
       |       CAST(sum(CASE WHEN dsir_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_dsir,
       |       CAST(sum(CASE WHEN nb_selected AND lm_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_nb_lm,
       |       CAST(sum(CASE WHEN nb_selected AND dsir_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_nb_dsir,
       |       CAST(sum(CASE WHEN lm_selected AND dsir_selected THEN 1 ELSE 0 END) AS BIGINT) AS n_lm_dsir,
       |       CAST(sum(CASE WHEN nb_selected AND lm_selected AND dsir_selected
       |                THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
       |FROM lrn_audit""".stripMargin
}
