package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.ops.LmPerplexity

/** Bigram-LM perplexity filtering (graft.ops.LmPerplexity) beyond the sf
  * oracle: agreement with an independent driver-side computation of the
  * smoothed log-probabilities, the full OOV ladder under the frozen-model
  * seam, fluency discrimination, and evidence-free document handling.
  */
class LmPerplexitySpec extends SparkSpec {

  import spark.implicits._

  private val B = LmPerplexity.Buckets
  private val Micro = LmPerplexity.Micro

  private def bucket(tok: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s"lm:$tok".getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.substring(0, 15), 16) % B
  }

  private def lp(c2: Long, c1: Long): Long =
    math.floor(math.log((c2 + 1.0) / (c1 + B)) * Micro).toLong

  test("model and scores agree with an independent driver-side computation") {
    // seed: "a b a b a c" → bigrams ab, ba, ab, ba, ac
    val d = Seq(
      (1L, "a b a b a c", "src0"),
      (2L, "a b x", "src9"),
      (3L, "z z", "src9")).toDF("doc_id", "text", "source")
    val model = LmPerplexity.modelTable(d).collect()
      .map(r => (r.getLong(0), r.getLong(1)) -> (r.getLong(2), r.getLong(3)))
      .toMap
    val (ba_, bb, bc) = (bucket("a"), bucket("b"), bucket("c"))
    // observed seed bigram counts and contexts: c1(a)=3 (ab,ab,ac), c1(b)=2
    assert(model((ba_, bb)) == (2L, lp(2, 3)))
    assert(model((ba_, bc)) == (1L, lp(1, 3)))
    assert(model((bb, ba_)) == (2L, lp(2, 2)))
    assert(model.size == 3)
    val scores = LmPerplexity.score(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    // doc 1: ab + ba + ab + ba + ac, all in-model
    assert(scores(1L) ==
      (5L, 2 * lp(2, 3) + 2 * lp(2, 2) + lp(1, 3)))
    // doc 2: ab (in-model) + bx (unseen continuation of SEEN context b →
    // the context's smoothed OOV mass floor(ln(1/(c1+B))·1e6))
    val oovB = math.floor(math.log(1.0 / (2 + B)) * Micro).toLong
    assert(scores(2L) == (2L, lp(2, 3) + oovB))
    // doc 3: zz — UNSEEN context → the driver-splatted uniform constant
    assert(scores(3L) == (1L, LmPerplexity.OovMicro))
  }

  test("frozen-model seam scores label-free and ranks fluent text above junk") {
    // fluent seed: a strongly patterned token cycle; junk: disjoint vocab
    val cycle = Seq.tabulate(40)(i => s"w${i % 4}").mkString(" ")
    val train = (Seq((0L, cycle, "src0")) ++
      (1L to 5L).map(i => (i, s"j${i}a j${i}b j${i}c j${i}d", "crawl")))
      .toDF("doc_id", "text", "source")
    val model = LmPerplexity.modelTable(train).localCheckpoint()
    val ctx = LmPerplexity.contextTable(train).localCheckpoint()
    // scoring takes (doc_id, text) ONLY — the arriving-crawl shape
    val batch = Seq(
      (100L, cycle),                         // fluent under the seed LM
      (101L, "q1 q2 q3 q4 q5 q6 q7 q8")      // junk: every context unseen
    ).toDF("doc_id", "text")
    val s = LmPerplexity.scoreWith(batch, model, ctx).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    def perBigram(t: (Long, Long)): Double = t._2.toDouble / t._1
    assert(perBigram(s(100L)) > perBigram(s(101L)),
      s"fluent text must out-score junk: $s")
    // the junk doc is the pure unseen-context ladder rung
    assert(s(101L)._2 == s(101L)._1 * LmPerplexity.OovMicro)
  }

  test("evidence-free documents carry (0,0) and are rejected by select") {
    val d = Seq(
      (1L, "only", "src0"),
      (2L, "", "src0"),
      (3L, "a b a b", "src0")).toDF("doc_id", "text", "source")
    val scores = LmPerplexity.score(d).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(scores(1L) == (0L, 0L) && scores(2L) == (0L, 0L))
    val sel = LmPerplexity.select(d).collect().map(_.getLong(0)).toSet
    assert(!sel.contains(1L) && !sel.contains(2L))
    // summary is total over the input — one row per source, all docs
    val sm = LmPerplexity.summary(d).collect()
    assert(sm.map(_.getAs[Long]("n_docs")).sum == 3L)
  }

  test("corpus admission matches the per-row threshold rule exactly") {
    val docs: DataFrame = graft.testdata.TestFixtures
      .table(spark, sf, "documents")
    val scored = LmPerplexity.score(docs)
    val want = scored.filter(col("n_bigrams") >= 1 &&
      col("logprob_micro") >= lit(LmPerplexity.SelectTauMicro) * col("n_bigrams"))
      .select("doc_id").collect().map(_.getLong(0)).toSet
    val got = LmPerplexity.select(docs)
      .select("doc_id").collect().map(_.getLong(0)).toSet
    assert(got == want && got.nonEmpty && got.size < docs.count(),
      s"selection must be a real cut: ${got.size} of ${docs.count()}")
  }
}
