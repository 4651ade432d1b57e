package graft

import org.apache.spark.sql.functions._

import graft.ops.{Portable, SubwordTrain, TextAnalysis}
import graft.testdata.{TestFixtures => T}

/** BPE merge learning (graft.ops.SubwordTrain): the distributed trainer
  * reproduces an independent driver-side reference implementation of
  * Sennrich et al.'s algorithm merge-for-merge, the learned inventory
  * feeds the serving kernel with no [UNK] on the training corpus, and
  * training is deterministic (the replayability contract).
  */
class SubwordTrainSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  // -- independent reference: plain-Scala BPE over the same word counts,
  //    written against the paper, not against the operator --
  private val pre = java.util.regex.Pattern
    .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")

  private def refWordCounts(texts: Seq[String]): Map[String, Long] = {
    val m = scala.collection.mutable.Map[String, Long]().withDefaultValue(0L)
    texts.foreach { t =>
      val it = pre.matcher(t)
      while (it.find()) {
        val w = it.group()
        if (w.length <= Portable.SubwordMaxWordLen) m(w) += 1L
      }
    }
    m.toMap
  }

  private def refMerges(wc: Map[String, Long],
      n: Int): Seq[(String, String)] = {
    var state: Map[Vector[String], Long] =
      wc.map { case (w, c) => w.split("").toVector -> c }
    val out = scala.collection.mutable.ArrayBuffer[(String, String)]()
    while (out.size < n) {
      val pairs = scala.collection.mutable
        .Map[(String, String), Long]().withDefaultValue(0L)
      state.foreach { case (syms, c) =>
        syms.sliding(2).foreach {
          case Vector(a, b) => pairs((a, b)) += c
          case _ => ()
        }
      }
      if (pairs.isEmpty) return out.toSeq
      val best = pairs.toSeq.minBy { case ((a, b), c) => (-c, a, b) }._1
      out += best
      state = state.groupMapReduce { case (syms, _) =>
        // left-to-right non-overlapping replacement
        val b = Vector.newBuilder[String]
        var i = 0
        while (i < syms.length) {
          if (i + 1 < syms.length &&
            syms(i) == best._1 && syms(i + 1) == best._2) {
            b += (best._1 + best._2); i += 2
          } else { b += syms(i); i += 1 }
        }
        b.result()
      }(_._2)(_ + _)
    }
    out.toSeq
  }

  test("distributed merges reproduce the reference merge-for-merge") {
    val texts = docs.select("text").collect().map(_.getString(0)).toSeq
    val want = refMerges(refWordCounts(texts), 40)
    val got = SubwordTrain.bpeMerges(docs, 40)
    assert(want.nonEmpty)
    assert(got == want, s"first divergence at merge ${
      got.zip(want).indexWhere { case (a, b) => a != b }}")
    // determinism: a replay elects the identical sequence
    assert(SubwordTrain.bpeMerges(docs, 40) == got)
  }

  test("the learned inventory serves the kernel with no [UNK] on training words") {
    val vocab = SubwordTrain.trainedVocab(docs, nMerges = 30)
    assert(vocab.nonEmpty && vocab == vocab.sorted && vocab == vocab.distinct)
    // feed the learned vocabulary through the SAME serving kernel the
    // fixture vocabulary uses, via the shared Spark-correct splat
    val vocabSql = TextAnalysis.vocabSqlOf(vocab)
    val counted = docs.selectExpr(
      "doc_id",
      s"CAST(size(${Portable.bpeSpark}) AS BIGINT) AS n_words",
      s"graft_subword_count(${Portable.bpeSpark}, $vocabSql, " +
        s"${Portable.SubwordMaxWordLen}) AS n_subwords",
      s"graft_subword_ids(${Portable.bpeSpark}, $vocabSql, " +
        s"${Portable.SubwordMaxWordLen}) AS ids")
    // the char floor covers every observed character positionally, so no
    // training pre-token may collapse to [UNK] (id 0) except over-length
    // ones — the fixture corpus has none (asserted)
    val maxLen = docs.selectExpr(
      s"max(array_max(transform(${Portable.bpeSpark}, w -> length(w)))) AS m")
      .head().getInt(0)
    assert(maxLen <= Portable.SubwordMaxWordLen, s"fixture maxlen $maxLen")
    assert(counted.filter(array_contains(col("ids"), 0L)).count() == 0,
      "a training word hit [UNK] despite the char floor")
    // merges compress: strictly fewer subwords than characters-as-pieces,
    // and at least one word-count's worth of tokens (every word >= 1)
    val agg = counted.agg(sum("n_subwords"), sum("n_words")).head()
    val nChars = docs.selectExpr(
      s"CAST(aggregate(transform(${Portable.bpeSpark}, w -> length(w)), " +
        "0L, (a, x) -> a + x) AS BIGINT) AS c")
      .agg(sum("c")).head().getLong(0)
    assert(agg.getLong(0) >= agg.getLong(1),
      "every pre-token must emit at least one piece")
    assert(agg.getLong(0) < nChars,
      "the learned inventory must beat character-level tokenization")
  }

  test("the pinned fixture vocabulary IS the trainer's output") {
    // Portable.trainedFixtureVocab is a literal only because the oracle
    // SQL is static text — this derivation through the DISTRIBUTED
    // trainer is the ground truth, and the pin must never drift from it
    import spark.implicits._
    val fixture = Portable.subwordFixtureCorpus.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val derived = SubwordTrain.trainedVocab(
      fixture, Portable.TrainedFixtureMerges)
    assert(derived == Portable.trainedFixtureVocab,
      s"pin drift: derived ${derived.size} pieces, pinned " +
        s"${Portable.trainedFixtureVocab.size}; first diff at index ${
          derived.zipAll(Portable.trainedFixtureVocab, "∅", "∅")
            .indexWhere { case (a, b) => a != b }}")
    // and the pinned pieces splat safely into both SQL dialects
    assert(Portable.trainedFixtureVocab.forall(p =>
      !p.contains("'") && !p.contains("\\")))
  }

  test("greedy serving may legitimately differ from the BPE merge state") {
    // the documented serving convention: greedy longest-match over the
    // learned inventory can cross a merge boundary. Construct it
    // explicitly: merges learned on a corpus where 'ab' and 'abc' both
    // exist as symbols make greedy('abc…') take 'abc' whole even when the
    // word's own BPE state split differently — assert the two
    // decompositions are BOTH lossless (piece concatenation round-trips)
    val vocab = SubwordTrain.trainedVocab(docs, nMerges = 30)
    val heads = vocab.filterNot(_.startsWith("##")).toSet
    val conts = vocab.filter(_.startsWith("##")).map(_.substring(2)).toSet
    def greedy(w: String): Seq[String] = {
      var start = 0
      val out = scala.collection.mutable.ArrayBuffer[String]()
      while (start < w.length) {
        val hit = (w.length to (start + 1) by -1).map(w.substring(start, _))
          .find(c => if (start == 0) heads.contains(c) else conts.contains(c))
        hit match {
          case None => return Seq(w) // [UNK]: cannot happen on training words
          case Some(p) => out += p; start += p.length
        }
      }
      out.toSeq
    }
    val words = refWordCounts(
      docs.select("text").collect().map(_.getString(0)).toSeq).keys.toSeq
    assert(words.nonEmpty)
    words.foreach { w =>
      assert(greedy(w).mkString == w, s"greedy('$w') does not round-trip")
    }
  }
}
