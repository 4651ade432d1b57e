package graft

import org.apache.spark.sql.functions._

import graft.ops.{Pq, Similarity}
import graft.testdata.{TestFixtures => T}

/** Product-quantization (graft.ops.Pq) behavior the sf oracle can't see:
  * self-encoding of codebook vectors, pack/unpack consistency, ADC recall
  * against the exact baseline, and the training seam.
  */
class PqSpec extends SparkSpec {

  private lazy val emb = T.table(spark, sf, "embeddings")

  test("codebook vectors encode to their own code in every subspace") {
    // centroid k IS vec k's sub-vector, so ‖x_m − c_k‖² = 0 — any other
    // centroid at distance 0 would be bit-identical, which the synthetic
    // corpus doesn't contain
    val own = Pq.codes(emb).filter(col("vec_id") < Pq.CodebookSize)
      .filter((0 until Pq.NumSubspaces)
        .map(m => col(s"code_$m") === col("vec_id"))
        .reduce(_ && _))
    assert(own.count() == Pq.CodebookSize.min(emb.count().toInt))
  }

  test("pq_code bit-pack round-trips the per-subspace codes") {
    val bad = Pq.codes(emb).filter(
      (0 until Pq.NumSubspaces)
        .map(m => expr(s"(pq_code >> ${Pq.CodeBits * m}) & ${Pq.CodebookSize - 1}") =!= col(s"code_$m"))
        .reduce(_ || _))
    assert(bad.count() == 0)
    val range = Pq.codes(emb).filter(
      (0 until Pq.NumSubspaces)
        .map(m => col(s"code_$m") < 0 || col(s"code_$m") >= Pq.CodebookSize)
        .reduce(_ || _))
    assert(range.count() == 0)
  }

  test("ADC top-k recalls the exact cosine top-k above the floor") {
    // the corpus is unit-norm, so the exact-cosine and exact-L2 rankings
    // coincide and recall@10 measures pure quantization loss. The synthetic
    // vectors are i.i.d. near-orthogonal — PQ's worst case — so the floor
    // is loose: it catches broken encode/ADC math (recall would drop to
    // chance ≈ k/N = 0.02), not quantization noise.
    val exact = Similarity.bruteTopK(emb)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val approx = Pq.adcTopK(emb)
      .select(col("query_id"), col("neighbor_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(exact.nonEmpty)
    val recall = (exact & approx).size.toDouble / exact.size
    assert(recall >= 0.15, s"ADC recall@10 $recall below floor")
  }

  test("adcTopK returns exactly k ranked rows per query, self excluded") {
    val perQuery = Pq.adcTopK(emb)
      .groupBy("query_id")
      .agg(count(lit(1)).as("n"), max("rank").as("maxr"),
        sum(when(col("neighbor_id") === col("query_id"), 1)
          .otherwise(0)).as("selfs"))
      .collect()
    assert(perQuery.nonEmpty)
    perQuery.foreach { r =>
      assert(r.getAs[Long]("n") == Similarity.TopK)
      assert(r.getAs[Int]("maxr") == Similarity.TopK)
      assert(r.getAs[Long]("selfs") == 0L)
    }
  }

  test("raw IVFPQ prunes candidates but never changes the ADC math") {
    // the by_residual=false form shares its code relation with the
    // full-scan ADC path, so a pair surviving both carries the IDENTICAL
    // distance — pruning changes the candidate set, never the scoring.
    // (The residual default scores in residual space; its arithmetic is
    // pinned by the sim_ivfpq_* oracle rows and the clustered test below.)
    val full = Pq.adcTopK(emb).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    val rows = Pq.ivfpqTopK(emb, byResidual = false).collect()
    assert(rows.nonEmpty)
    var shared = 0
    rows.foreach { r =>
      val (q, n) = (r.getAs[Long]("query_id"), r.getAs[Long]("neighbor_id"))
      assert(q != n)
      full.get((q, n)).foreach { d =>
        assert(d == r.getAs[Double]("adc_dist")); shared += 1
      }
    }
    assert(shared > 0, "no overlap between IVFPQ and full-scan ADC top-k")
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { qs =>
      assert(qs.length <= Similarity.TopK)
      assert(qs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to qs.length))
    }
  }

  test("residual IVFPQ rank/self/cap contract holds on the sf corpus") {
    val rows = Pq.ivfpqTopK(emb).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getAs[Long]("query_id") != r.getAs[Long]("neighbor_id"))
    }
    rows.groupBy(_.getAs[Long]("query_id")).values.foreach { qs =>
      assert(qs.length <= Similarity.TopK)
      assert(qs.map(_.getAs[Int]("rank")).sorted.toSeq == (1 to qs.length))
    }
    // the residual code store carries each vector's assigned list and
    // in-range codes
    val codes = Pq.ivfpqCodes(emb)
    val badRange = codes.filter(
      (0 until Pq.NumSubspaces)
        .map(m => col(s"code_$m") < 0 || col(s"code_$m") >= Pq.CodebookSize)
        .reduce(_ || _))
    assert(badRange.count() == 0)
    assert(codes.groupBy("vec_id").count()
      .filter(col("count") > 1).count() == 0)
  }

  /** Clustered corpus — the geometry residual encoding exists for: 16
    * tight clusters around DENSE pseudo-random centers (dense, so the
    * coarse component carries energy in EVERY subspace — axis-aligned
    * centers would leave 7 of 8 subspaces identical between raw and
    * residual codes). Ids < 16 are the exact centers and become the IVF
    * leaders; every other id sits on center `id % 16` plus small
    * deterministic noise, so the coarse quantizer explains ~95% of the
    * energy and the residual codebook spends its 6 bits entirely on the
    * fine structure raw codes must share with cluster identity.
    */
  private def clustered(n: Long) = {
    val df = spark.range(0L, n).toDF("id")
    df.select(col("id").as("vec_id"), expr(
      """transform(sequence(0, 63), d -> CAST(
        |  (pmod(hash(CAST(id % 16 AS INT), d), 201) - 100) * 0.00217
        |  + (CASE WHEN id >= 16
        |     THEN (pmod(hash(id, d, 3), 201) - 100) * 0.0005 ELSE 0.0 END)
        |  AS FLOAT))""".stripMargin.replaceAll("\n", " ")).as("embedding"))
  }

  test("residual encoding beats raw codes where the corpus clusters") {
    val cemb = clustered(2000L)
    val exact = Similarity.bruteTopK(cemb)
      .select("query_id", "neighbor_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    def recall(df: org.apache.spark.sql.DataFrame): Double = {
      val approx = df.select("query_id", "neighbor_id").collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & approx).size.toDouble / exact.size
    }
    val resid = recall(Pq.ivfpqTopK(cemb))
    val raw = recall(Pq.ivfpqTopK(cemb, byResidual = false))
    info(f"clustered recall@10: residual $resid%.4f raw $raw%.4f")
    assert(resid >= raw + 0.1,
      s"residual recall $resid must clearly beat raw $raw on the " +
        s"clustered corpus")
    assert(resid >= 0.3,
      s"residual recall $resid too low for a coarse-explained corpus")
  }

  test("the recall gate reports zero violations for both search paths") {
    val rows = Pq.adcRecallGate(emb).collect()
    assert(rows.map(_.getAs[String]("method")).toSet == Set("adc", "ivfpq"))
    rows.foreach { r =>
      assert(r.getAs[Long]("violations") == 0L,
        s"${r.getAs[String]("method")} recall " +
          s"${r.getAs[Long]("recall_micro")} under floor " +
          s"${r.getAs[Long]("floor_micro")}")
      assert(r.getAs[Long]("n_overlap") <= r.getAs[Long]("n_exact"))
    }
  }

  test("codebookFrom is the training seam: explicit seeds change the codes") {
    import spark.implicits._
    val seeds = emb.filter(col("vec_id") >= 100 && col("vec_id") < 100 + Pq.CodebookSize)
      .select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])].collect().sortBy(_._1)
      .zipWithIndex.map { case ((_, v), i) => (i, v) }.toSeq
    val book = Pq.codebookFrom(seeds)
    assert(book.size == Pq.NumSubspaces * Pq.CodebookSize)
    val retrained = Pq.codesWith(emb, book)
    // retrained codebook's own seed vectors (ids 100..115) self-encode
    val own = retrained.filter(col("vec_id") >= 100 && col("vec_id") < 100 + Pq.CodebookSize)
      .filter((0 until Pq.NumSubspaces)
        .map(m => col(s"code_$m") === col("vec_id") - 100)
        .reduce(_ && _))
    assert(own.count() == Pq.CodebookSize)
  }
}
