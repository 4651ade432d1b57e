package graft

import org.apache.spark.sql.functions._

import graft.ops.{Portable, TextAnalysis}
import graft.testdata.{TestFixtures => T}

/** Greedy longest-match WordPiece counting (graft.functions.SubwordCount):
  * bit-identical to an independent driver-side reference tokenizer over
  * the whole fixture corpus, the published algorithm's edge cases
  * (longest-match wins, whole-word [UNK] collapse, over-length guard),
  * and the codegen contract (the kernel runs inside whole-stage codegen).
  */
class SubwordSpec extends SparkSpec {

  private lazy val docs = T.table(spark, sf, "documents")

  // -- independent reference: plain-Scala greedy WordPiece over the same
  //    vocabulary, written against the paper, not against the kernel --
  private val pre = java.util.regex.Pattern
    .compile("[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]")
  private val headSet =
    Portable.subwordVocab.filterNot(_.startsWith("##")).toSet
  private val contSet = Portable.subwordVocab
    .filter(_.startsWith("##")).map(_.substring(2)).toSet

  private def refWord(w: String): Long = {
    if (w.length > Portable.SubwordMaxWordLen) return 1L
    var start = 0
    var n = 0L
    while (start < w.length) {
      val candidates = (start + 1 to w.length).reverse.map(w.substring(start, _))
      val hit = candidates.find(c =>
        if (start == 0) headSet.contains(c) else contSet.contains(c))
      hit match {
        case None => return 1L
        case Some(p) => n += 1; start += p.length
      }
    }
    n
  }

  private def refCount(text: String): Long = {
    val m = pre.matcher(text)
    var acc = 0L
    while (m.find()) acc += refWord(m.group())
    acc
  }

  test("kernel counts are bit-identical to the driver reference corpus-wide") {
    val got = TextAnalysis.subwordTokens(docs)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      assert(got(id)._2 == refCount(text), s"doc $id diverged")
    }
    // the proxy-correction direction: a fully-in-vocab word is >= 1 piece,
    // so subword counts dominate the pre-token count except where [UNK]
    // collapses — which single-char pre-tokens cannot trigger
    assert(got.values.count { case (bpe, sub) => sub >= bpe } > 0)
  }

  test("published edge cases: longest match, [UNK] collapse, over-length") {
    import spark.implicits._
    // "joining" = join + ##ing (longest-match wins over j-o-i-n-i-n-g);
    // "the" is one head piece; "zzz" falls back to singles z ##z ##z;
    // "naïve" PRE-tokenizes as na|ï|ve (the bpe regex treats non-ASCII as
    // punctuation-class singles): n ##a → 2, ï → [UNK] 1, v ##e → 2;
    // an over-length letter run collapses to 1
    val cases = Seq(
      ("joining", 2L), ("the", 1L), ("zzz", 3L),
      ("streaming", 2L), ("windowed", 2L), ("naïve", 5L),
      ("z" * (Portable.SubwordMaxWordLen + 1), 1L))
    val df = cases.zipWithIndex
      .map { case ((w, _), i) => (i.toLong, w) }.toDF("doc_id", "text")
    val got = TextAnalysis.subwordTokens(df)
      .collect().map(r => r.getLong(0) -> r.getLong(2)).toMap
    cases.zipWithIndex.foreach { case ((w, want), i) =>
      assert(got(i.toLong) == want, s"'${w.take(20)}' expected $want")
      assert(refCount(w) == want, s"reference disagrees on '${w.take(20)}'")
    }
    // fed as a SINGLE word (no pre-tokenizer), the non-ASCII char makes
    // the whole word unrepresentable → one [UNK], the BERT convention
    assert(refWord("naïve") == 1L)
    // null text → null count (nullSafeCodeGen), not a crash
    val withNull = Seq((0L, "the")).toDF("doc_id", "text")
      .unionByName(Seq(1L).toDF("doc_id").withColumn("text",
        lit(null).cast("string")))
    val nulls = TextAnalysis.subwordTokens(withNull).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(2)) None else Some(r.getLong(2))))
      .toMap
    assert(nulls(0L).contains(1L) && nulls(1L).isEmpty)
  }

  private val pieceId: Map[String, Long] =
    Portable.subwordVocab.zipWithIndex
      .map { case (p, i) => p -> (i + 1L) }.toMap

  private def refWordIds(w: String): Seq[Long] = {
    if (w.length > Portable.SubwordMaxWordLen) return Seq(0L)
    var start = 0
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    while (start < w.length) {
      val candidates = (start + 1 to w.length).reverse.map(w.substring(start, _))
      val hit = candidates.find(c =>
        if (start == 0) headSet.contains(c) else contSet.contains(c))
      hit match {
        case None => return Seq(0L)
        case Some(p) =>
          out += pieceId(if (start == 0) p else "##" + p)
          start += p.length
      }
    }
    out.toSeq
  }

  private def refIds(text: String): Seq[Long] = {
    val m = pre.matcher(text)
    val out = scala.collection.mutable.ArrayBuffer[Long]()
    while (m.find()) out ++= refWordIds(m.group())
    out.toSeq
  }

  test("id streams are bit-identical to the driver reference corpus-wide") {
    val got = TextAnalysis.subwordIds(docs).collect()
      .map(r => r.getLong(0) -> (r.getSeq[Long](1), r.getLong(2))).toMap
    val texts = docs.select("doc_id", "text").collect()
      .map(r => r.getLong(0) -> r.getString(1))
    assert(texts.nonEmpty)
    texts.foreach { case (id, text) =>
      val (ids, n) = got(id)
      assert(ids == refIds(text), s"doc $id ids diverged")
      // the one-matching-routine contract: size(ids) == n_subwords
      assert(ids.size.toLong == n, s"doc $id count/ids diverged")
      assert(n == refCount(text), s"doc $id count diverged")
    }
    // ids decode: every non-UNK id indexes the shared vocabulary
    val maxId = Portable.subwordVocab.size.toLong
    assert(got.values.flatMap(_._1).forall(i => i >= 0L && i <= maxId))
    // "joining" decodes to exactly (join, ##ing) through the id map
    assert(refWordIds("joining") ==
      Seq(pieceId("join"), pieceId("##ing")))
  }

  test("the kernel stays inside whole-stage codegen") {
    spark.catalog.clearCache()
    val p = TextAnalysis.subwordTokens(docs).queryExecution.executedPlan
    import org.apache.spark.sql.execution.{ProjectExec, WholeStageCodegenExec}
    def kernelProjects(t: org.apache.spark.sql.execution.SparkPlan) =
      t.collect {
        case pr: ProjectExec if pr.projectList
            .exists(_.toString.contains("graft_subword_count")) => pr }
    val all = kernelProjects(p)
    val inCodegen = p.collect { case w: WholeStageCodegenExec => w }
      .flatMap(kernelProjects)
    assert(all.nonEmpty, p.toString)
    // every projection carrying the kernel sits INSIDE a codegen span — a
    // non-codegen Expression would surface it in a bare ProjectExec
    assert(all.size == inCodegen.size, s"kernel fell out of codegen:\n$p")
    // and the scan sheds every other document column
    assert(p.toString.contains("ReadSchema: struct<doc_id:bigint,text:string>"),
      p.toString)
  }
}
