package graft.functions

import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, TernaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._

/** Greedy longest-match WordPiece vocabulary — the per-plan constant
  * behind [[SubwordCount]], folded once from the vocabulary literal and
  * shared by the interpreted and generated eval paths (the
  * [[PqEncode]] reference-object discipline: the loop is data, not
  * generated code, so whole-stage codegen size is constant in vocabulary
  * size).
  *
  * Pieces follow the BERT convention: a piece starting with `##` may only
  * continue a word; any other piece may only start one. Matching is the
  * published WordPiece algorithm (Schuster & Nakajima, ICASSP 2012):
  * repeatedly take the LONGEST vocabulary piece matching at the cursor;
  * if no piece matches at any cursor position — or the word is longer
  * than `maxWordLen` — the WHOLE word collapses to one [UNK] token.
  */
final class SubwordVocab(pieces: Array[String], val maxWordLen: Int)
    extends Serializable {
  private val heads = new java.util.HashSet[String]()
  private val conts = new java.util.HashSet[String]()
  private var maxHead = 0
  private var maxCont = 0
  pieces.foreach { p =>
    if (p.startsWith("##")) {
      val s = p.substring(2)
      if (s.nonEmpty) {
        conts.add(s)
        if (s.length > maxCont) maxCont = s.length
      }
    } else if (p.nonEmpty) {
      heads.add(p)
      if (p.length > maxHead) maxHead = p.length
    }
  }

  /** Subword token count of ONE pre-token. Called from generated code. */
  def countWord(w: String): Long = {
    val len = w.length
    if (len == 0) return 0L
    if (len > maxWordLen) return 1L // [UNK]: over-length guard
    var start = 0
    var n = 0L
    while (start < len) {
      val set = if (start == 0) heads else conts
      val cap = if (start == 0) maxHead else maxCont
      var end = math.min(len, start + cap)
      var found = -1
      while (end > start && found < 0) {
        if (set.contains(w.substring(start, end))) found = end
        else end -= 1
      }
      if (found < 0) return 1L // [UNK]: unrepresentable word, whole
      n += 1
      start = found
    }
    n
  }
}

/** Native codegen subword token counter —
  * `graft_subword_count(words, vocab, maxWordLen)` → `bigint`: the total
  * greedy longest-match WordPiece token count of a pre-tokenized word
  * array (Schuster & Nakajima ICASSP 2012; budget relevance per Sennrich
  * et al. ACL 2016). This is what makes `n_tokens` REAL for training-data
  * budgets: a whitespace proxy misprices CJK, code, and URL-heavy
  * documents by 2–5×, which at 100 TB mis-sizes every shipped shard.
  *
  * `vocab` is a FOLDABLE `array<string>` literal (the `##` continuation
  * convention) and `maxWordLen` a foldable INT — both evaluate ONCE at
  * plan build into a [[SubwordVocab]] hash table carried as a codegen
  * reference object, so the generated per-row code is a bare loop over
  * the word array calling the compiled matcher: constant generated-code
  * size in vocabulary size (the [[PqEncode]] rationale — inlining a
  * vocabulary-sized match would blow the JVM's 64 KB method limit and
  * fall back to interpreted eval).
  *
  * Null semantics: a null word array yields NULL; null ELEMENTS are
  * skipped (the pre-tokenizer regexes never produce them).
  */
case class SubwordCount(words: Expression, vocab: Expression,
    maxWordLen: Expression) extends TernaryExpression {

  override def first: Expression = words
  override def second: Expression = vocab
  override def third: Expression = maxWordLen

  override def prettyName: String = "graft_subword_count"
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = {
    def strArr(e: Expression) = e.dataType match {
      case ArrayType(StringType, _) => true
      case _ => false
    }
    if (!strArr(words) || !strArr(vocab))
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires array<string> words and vocab")
    else if (!vocab.foldable || !maxWordLen.foldable)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: vocab and maxWordLen must be foldable literals")
    else if (maxWordLen.dataType != IntegerType)
      TypeCheckResult.TypeCheckFailure(
        s"$prettyName: maxWordLen must be an INT literal")
    else TypeCheckResult.TypeCheckSuccess
  }

  /** The vocabulary table, folded once per plan (both eval paths). */
  @transient private lazy val table: SubwordVocab = {
    val a = vocab.eval(null).asInstanceOf[ArrayData]
    val pieces = new Array[String](a.numElements())
    var i = 0
    while (i < pieces.length) {
      pieces(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      i += 1
    }
    new SubwordVocab(pieces, maxWordLen.eval(null).asInstanceOf[Int])
  }

  override def eval(input: InternalRow): Any = {
    val w = words.eval(input)
    if (w == null) return null
    val a = w.asInstanceOf[ArrayData]
    var acc = 0L
    var i = 0
    val n = a.numElements()
    while (i < n) {
      if (!a.isNullAt(i)) acc += table.countWord(a.getUTF8String(i).toString)
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      val ref = ctx.addReferenceObj("subwordVocab", table,
        classOf[SubwordVocab].getName)
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      s"""
         |int $n = $w.numElements();
         |long $acc = 0L;
         |for (int $i = 0; $i < $n; $i++) {
         |  if (!$w.isNullAt($i)) {
         |    $acc += $ref.countWord($w.getUTF8String($i).toString());
         |  }
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SubwordCount =
    copy(words = newFirst, vocab = newSecond, maxWordLen = newThird)
}

object SubwordCount {
  def fromChildren(children: Seq[Expression]): SubwordCount = {
    require(children.length == 3,
      "graft_subword_count(words, vocab, maxWordLen) takes three arguments")
    SubwordCount(children.head, children(1), children(2))
  }
}
