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

  // matchAt packs the match end into the low byte of (id << 8) | end, so
  // the walk is only correct when every cursor position fits in 8 bits.
  require(maxWordLen >= 1 && maxWordLen <= 255,
    s"maxWordLen must be in [1, 255] (packed-match invariant), got $maxWordLen")

  /** The reserved [UNK] id — vocabulary pieces are 1-based, in their
    * literal order, so the id assignment is a pure function of the
    * splatted vocabulary both engines share.
    */
  val UnkId = 0L

  private val headIds = new java.util.HashMap[String, java.lang.Long]()
  private val contIds = new java.util.HashMap[String, java.lang.Long]()
  private var maxHead = 0
  private var maxCont = 0
  pieces.zipWithIndex.foreach { case (p, i) =>
    val id = java.lang.Long.valueOf(i + 1L)
    if (p.startsWith("##")) {
      val s = p.substring(2)
      if (s.nonEmpty) {
        contIds.put(s, id)
        if (s.length > maxCont) maxCont = s.length
      }
    } else if (p.nonEmpty) {
      headIds.put(p, id)
      if (p.length > maxHead) maxHead = p.length
    }
  }

  /** Longest vocabulary piece matching `w` at `start`, packed as
    * `(id << 8) | matchEnd` (maxWordLen < 256 keeps the end in the low
    * byte), or −1 when nothing matches — the ONE matching routine both
    * [[countWord]] and [[appendIds]] walk, so count and ids cannot
    * diverge.
    */
  private def matchAt(w: String, start: Int): Long = {
    val map = if (start == 0) headIds else contIds
    val cap = if (start == 0) maxHead else maxCont
    var end = math.min(w.length, start + cap)
    while (end > start) {
      val id = map.get(w.substring(start, end))
      if (id != null) return (id.longValue() << 8) | end.toLong
      end -= 1
    }
    -1L
  }

  /** Subword token count of ONE pre-token. Called from generated code. */
  def countWord(w: String): Long = {
    val len = w.length
    if (len == 0) return 0L
    if (len > maxWordLen) return 1L // [UNK]: over-length guard
    var start = 0
    var n = 0L
    while (start < len) {
      val m = matchAt(w, start)
      if (m < 0) return 1L // [UNK]: unrepresentable word, whole
      n += 1
      start = (m & 0xffL).toInt
    }
    n
  }

  /** Append ONE pre-token's piece ids ([UNK] = [[UnkId]], whole-word). */
  private def appendIds(w: String,
      out: scala.collection.mutable.ArrayBuffer[Long]): Unit = {
    val len = w.length
    if (len == 0) return
    if (len > maxWordLen) { out += UnkId; return }
    val mark = out.length
    var start = 0
    while (start < len) {
      val m = matchAt(w, start)
      if (m < 0) { // unrepresentable: the whole word collapses to [UNK]
        out.dropRightInPlace(out.length - mark)
        out += UnkId
        return
      }
      out += (m >>> 8)
      start = (m & 0xffL).toInt
    }
  }

  /** The trainer-ready id stream of a pre-tokenized word array — word
    * order preserved, [UNK] whole-word collapses inline. Called from
    * generated code (one call per row, the loop lives here).
    */
  def idsOf(words: org.apache.spark.sql.catalyst.util.ArrayData)
      : org.apache.spark.sql.catalyst.util.ArrayData = {
    val n = words.numElements()
    val buf = new scala.collection.mutable.ArrayBuffer[Long](n * 2)
    var i = 0
    while (i < n) {
      if (!words.isNullAt(i)) appendIds(words.getUTF8String(i).toString, buf)
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(buf.toArray)
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

  override def checkInputDataTypes(): TypeCheckResult =
    SubwordCount.checkSubwordInputs(prettyName, words, vocab, maxWordLen)

  /** The vocabulary table, folded once per plan (both eval paths). */
  @transient private lazy val table: SubwordVocab =
    SubwordCount.foldVocab(vocab, maxWordLen)

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

  private[functions] def checkSubwordInputs(prettyName: String,
      words: Expression, vocab: Expression,
      maxWordLen: Expression): TypeCheckResult = {
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
    else {
      // Registered SQL surface: enforce the packed-match invariant here so
      // an out-of-range bound is an analysis error, not a hung executor.
      val m = maxWordLen.eval(null)
      if (m == null || m.asInstanceOf[Int] < 1 || m.asInstanceOf[Int] > 255)
        TypeCheckResult.TypeCheckFailure(
          s"$prettyName: maxWordLen must be in [1, 255], got $m")
      else TypeCheckResult.TypeCheckSuccess
    }
  }

  private[functions] def foldVocab(vocab: Expression,
      maxWordLen: Expression): SubwordVocab = {
    val a = vocab.eval(null).asInstanceOf[ArrayData]
    val pieces = new Array[String](a.numElements())
    var i = 0
    while (i < pieces.length) {
      pieces(i) = if (a.isNullAt(i)) "" else a.getUTF8String(i).toString
      i += 1
    }
    new SubwordVocab(pieces, maxWordLen.eval(null).asInstanceOf[Int])
  }
}

/** Native codegen subword ENCODER —
  * `graft_subword_ids(words, vocab, maxWordLen)` → `array<bigint>`: the
  * trainer-ready token-id stream of a pre-tokenized word array under the
  * same greedy longest-match WordPiece walk as [[SubwordCount]] (one
  * shared matching routine — count and ids cannot diverge). Piece ids
  * are the 1-based position in the vocabulary literal; an
  * unrepresentable or over-length word collapses to ONE
  * [[SubwordVocab.UnkId]] (= 0), the BERT whole-word convention. Word
  * order is preserved, so `input_ids` is the sequence a packing/shard
  * stage ships to a trainer. Same codegen discipline as [[SubwordCount]]:
  * the vocabulary folds once into a reference object and the generated
  * per-row code is a single kernel call.
  */
case class SubwordIds(words: Expression, vocab: Expression,
    maxWordLen: Expression) extends TernaryExpression {

  override def first: Expression = words
  override def second: Expression = vocab
  override def third: Expression = maxWordLen

  override def prettyName: String = "graft_subword_ids"
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult =
    SubwordCount.checkSubwordInputs(prettyName, words, vocab, maxWordLen)

  @transient private lazy val table: SubwordVocab =
    SubwordCount.foldVocab(vocab, maxWordLen)

  override def eval(input: InternalRow): Any = {
    val w = words.eval(input)
    if (w == null) return null
    table.idsOf(w.asInstanceOf[ArrayData])
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (w, _, _) => {
      val ref = ctx.addReferenceObj("subwordVocab", table,
        classOf[SubwordVocab].getName)
      s"${ev.value} = $ref.idsOf($w);"
    })

  override protected def withNewChildrenInternal(
      newFirst: Expression, newSecond: Expression,
      newThird: Expression): SubwordIds =
    copy(words = newFirst, vocab = newSecond, maxWordLen = newThird)
}

object SubwordIds {
  def fromChildren(children: Seq[Expression]): SubwordIds = {
    require(children.length == 3,
      "graft_subword_ids(words, vocab, maxWordLen) takes three arguments")
    SubwordIds(children.head, children(1), children(2))
  }
}
