package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import Portable._

/** Deduplication operators over the `documents` and `embeddings` tables —
  * the dedup stage of a training-data curation pipeline (exact, MinHash-LSH,
  * SimHash, n-gram Jaccard, embedding cosine).
  *
  * Scale shape (the part that matters at 100 TB):
  *  - exact dedup is one hash-aggregate — shuffles once on a 128-bit digest,
  *    never on document text;
  *  - MinHash signatures are computed per-document with higher-order array
  *    functions (no explode, no shuffle), then candidate generation shuffles
  *    only (band_idx, band_hash) — the classic shingle→minhash→band→bucket
  *    join, linear in corpus size for near-constant bucket occupancy;
  *  - SimHash candidates join on 4-bit sub-bands of the 16-bit signature
  *    (pigeonhole: hamming ≤ 3 ⇒ at least one of 4 nibbles equal);
  *  - n-gram Jaccard joins through the inverted (shingle → doc) index, so
  *    only pairs sharing ≥ 1 shingle are ever materialized;
  *  - only the exact embedding pass is quadratic (it is the correctness
  *    baseline; the sub-quadratic path is [[Similarity.lshNearDup]]).
  */
object Dedup {

  val NumHashes = 16
  val Bands = 4
  val RowsPerBand: Int = NumHashes / Bands
  val JaccardDupThreshold = 0.7
  val JaccardReportThreshold = 0.05
  val HammingThreshold = 3
  val CosineDupThreshold = 0.3

  /** Exact dedup: one row per distinct text digest with the surviving doc id
    * (min) and the multiplicity. SURVEY §2.7-style dedup generalized to
    * content hashing.
    */
  def exact(docs: DataFrame): DataFrame =
    docs.groupBy(expr("md5(text)").as("text_hash"))
      .agg(min("doc_id").as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))

  /** doc_id + distinct word-3-gram shingle array. */
  private def withShingles(docs: DataFrame): DataFrame =
    docs.withColumn("toks", expr(tokensSpark))
      .withColumn("shingles", expr(
        """IF(size(toks) >= 3,
          |   array_distinct(transform(sequence(1, size(toks) - 2),
          |     i -> concat(element_at(toks, i), ' ', element_at(toks, i + 1),
          |                 ' ', element_at(toks, i + 2)))),
          |   array())""".stripMargin))

  /** Per-document MinHash signature (16 hashes from the seeded md5 family)
    * plus 4 LSH band digests (4 rows per band).
    */
  def minhashSignatures(docs: DataFrame): DataFrame = {
    val mh = (0 until NumHashes).map { j =>
      expr(s"array_min(transform(shingles, s -> ${hexcastSpark(s"concat('$j:', s)")}))")
        .as(s"mh_$j")
    }
    val sig = withShingles(docs).select(
      col("doc_id") +: expr("CAST(size(shingles) AS BIGINT)").as("n_shingles") +: mh: _*)
    val bands = (0 until Bands).map { b =>
      val parts = (RowsPerBand * b until RowsPerBand * (b + 1))
        .map(j => s"CAST(mh_$j AS STRING)").mkString(", ")
      expr(s"md5(concat_ws(',', $parts))").as(s"band_$b")
    }
    sig.select(col("*") +: bands: _*)
  }

  /** (doc_id, band_idx, band_val) rows for the bucket join; documents with
    * zero shingles are excluded (their empty-signature bands would bucket
    * all degenerate docs together).
    */
  private def bandRows(docs: DataFrame): DataFrame =
    minhashSignatures(docs).filter(col("n_shingles") > 0)
      .select(col("doc_id"), posexplode(
        array((0 until Bands).map(b => col(s"band_$b")): _*))
        .as(Seq("band_idx", "band_val")))

  /** Exploded distinct (doc_id, shingle) inverted-index rows. */
  private def docShingles(docs: DataFrame): DataFrame =
    withShingles(docs).select(col("doc_id"), explode(col("shingles")).as("shingle"))

  private def jaccardOf(common: Column, na: Column, nb: Column): Column =
    (common.cast("double") / (na + nb - common)).as("jaccard")

  /** MinHash-LSH near-duplicate pairs: bucket-join candidates, then exact
    * Jaccard verification over the shingle sets.
    */
  def minhashPairs(docs: DataFrame): DataFrame = {
    val bands = bandRows(docs)
    val cand = bands.as("a")
      .join(bands.as("b"),
        col("a.band_idx") === col("b.band_idx") &&
          col("a.band_val") === col("b.band_val") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"))
      .distinct()
    verifyJaccard(cand, docs)
  }

  /** Exact n-gram Jaccard pairs through the inverted index — every pair
    * sharing at least one shingle, reported above a noise floor.
    */
  def ngramJaccardPairs(docs: DataFrame): DataFrame = {
    val ds = docShingles(docs)
    val common = ds.as("sa")
      .join(ds.as("sb"),
        col("sa.shingle") === col("sb.shingle") &&
          col("sa.doc_id") < col("sb.doc_id"))
      .groupBy(col("sa.doc_id").as("a_id"), col("sb.doc_id").as("b_id"))
      .agg(count(lit(1)).as("n_common"))
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
    common
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .select(col("a_id"), col("b_id"), col("n_common"),
        col("na.n").as("n_a"), col("nb.n").as("n_b"),
        jaccardOf(col("n_common"), col("na.n"), col("nb.n")))
      .filter(col("jaccard") >= JaccardReportThreshold)
  }

  /** Candidate pairs → exact Jaccard + duplicate verdict. */
  private def verifyJaccard(cand: DataFrame, docs: DataFrame): DataFrame = {
    val ds = docShingles(docs)
    val sizes = ds.groupBy("doc_id").agg(count(lit(1)).as("n"))
    val common = cand
      .join(ds.as("sa"), col("a_id") === col("sa.doc_id"))
      .join(ds.as("sb"),
        col("b_id") === col("sb.doc_id") && col("sa.shingle") === col("sb.shingle"))
      .groupBy("a_id", "b_id").agg(count(lit(1)).as("n_common"))
    cand
      .join(common, Seq("a_id", "b_id"), "left")
      .withColumn("n_common", coalesce(col("n_common"), lit(0L)))
      .join(sizes.as("na"), col("a_id") === col("na.doc_id"))
      .join(sizes.as("nb"), col("b_id") === col("nb.doc_id"))
      .select(col("a_id"), col("b_id"), col("n_common"),
        col("na.n").as("n_a"), col("nb.n").as("n_b"),
        jaccardOf(col("n_common"), col("na.n"), col("nb.n")))
      .withColumn("is_duplicate",
        when(col("jaccard") >= JaccardDupThreshold, 1).otherwise(0))
  }

  /** Per-document 16-bit SimHash (term-frequency-weighted bit majority over
    * token hashes) + 4-bit sub-bands for the pigeonhole candidate join.
    */
  def simhash(docs: DataFrame): DataFrame = {
    val ones = (0 until 16).map { b =>
      expr(s"CAST(size(filter(th, h -> (shiftright(h, $b) & 1) = 1)) AS BIGINT)")
        .as(s"ones_$b")
    }
    val shSum = (0 until 16)
      .map(b => s"CASE WHEN 2 * ones_$b > n_tok THEN ${1 << b} ELSE 0 END")
      .mkString(" + ")
    val nibs = (0 until 4).map(q =>
      expr(s"shiftright(simhash16, ${4 * q}) & 15").as(s"nib_$q"))
    docs.withColumn("toks", expr(tokensSpark))
      .withColumn("th", expr(s"transform(toks, t -> ${hexcastSpark("t")})"))
      .withColumn("n_tok", expr("CAST(size(toks) AS BIGINT)"))
      .select(col("doc_id") +: col("n_tok") +: ones: _*)
      .withColumn("simhash16", expr(s"CAST($shSum AS BIGINT)"))
      .select(col("doc_id") +: col("n_tok") +: col("simhash16") +: nibs: _*)
  }

  /** SimHash near-duplicate pairs: candidates share at least one of the 4
    * nibble bands (necessary for hamming ≤ 3 by pigeonhole), verified by
    * popcount of the XOR.
    */
  def simhashPairs(docs: DataFrame): DataFrame = {
    val sig = simhash(docs)
    val nibRows = sig.select(col("doc_id"), col("simhash16"), posexplode(
      array((0 until 4).map(q => col(s"nib_$q")): _*)).as(Seq("q", "nib")))
    nibRows.as("a")
      .join(nibRows.as("b"),
        col("a.q") === col("b.q") && col("a.nib") === col("b.nib") &&
          col("a.doc_id") < col("b.doc_id"))
      .select(col("a.doc_id").as("a_id"), col("b.doc_id").as("b_id"),
        col("a.simhash16").as("sh_a"), col("b.simhash16").as("sh_b"))
      .distinct()
      .withColumn("hamming", expr("CAST(bit_count(sh_a ^ sh_b) AS BIGINT)"))
      .filter(col("hamming") <= HammingThreshold)
  }

  /** Left-fold dot product — the fold order is replicated exactly by the
    * DuckDB oracle (list_reduce), keeping doubles bit-identical.
    */
  def dot(a: String, b: String): String =
    s"""aggregate(zip_with($a, $b, (x, y) -> CAST(x AS DOUBLE) * CAST(y AS DOUBLE)),
       |          CAST(0 AS DOUBLE), (acc, z) -> acc + z)""".stripMargin

  /** Embedding near-duplicates: exact pairwise cosine ≥ threshold. This is
    * the quadratic correctness baseline (fine at verification scale); the
    * production-scale path is the sign-LSH bucketed [[Similarity.lshNearDup]].
    */
  def embeddingNearDup(emb: DataFrame): DataFrame = {
    val e = emb.select(col("vec_id"), col("embedding"),
      expr(s"sqrt(${dot("embedding", "embedding")})").as("norm"))
    e.as("a").join(e.as("b"), col("a.vec_id") < col("b.vec_id"))
      .select(col("a.vec_id").as("a_id"), col("b.vec_id").as("b_id"),
        (expr(s"${dot("a.embedding", "b.embedding")}") /
          (col("a.norm") * col("b.norm"))).as("cos_sim"))
      .filter(col("cos_sim") >= CosineDupThreshold)
  }
}
