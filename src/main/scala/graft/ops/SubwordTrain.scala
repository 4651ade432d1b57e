package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import Portable._

/** Subword vocabulary TRAINING — byte-pair-encoding merge learning
  * (Sennrich, Haddow & Birch, "Neural machine translation of rare words
  * with subword units", ACL 2016), so the greedy-WordPiece serving kernel
  * ([[graft.functions.SubwordCount]] / [[graft.functions.SubwordIds]])
  * can run on a vocabulary learned FROM the corpus instead of the
  * [[Portable.subwordVocab]] fixture.
  *
  * The algorithm is the paper's, distributed over the DISTINCT-WORD
  * relation (corpus-sublinear: pair statistics are a pure function of
  * `(word, count)`, so the corpus text is scanned ONCE and every merge
  * round works on words):
  *
  *  1. one corpus scan builds `(word, cnt, syms)` — [[Portable.bpeSpark]]
  *     pre-tokens, each word initially its character sequence;
  *  2. per round: count adjacent symbol pairs weighted by word count
  *     (one hash aggregate — map-side partial absorbs hot pairs), elect
  *     the most frequent pair with a DETERMINISTIC tie-break
  *     (count desc, then lexicographic — the spec's replayability
  *     contract, where the paper leaves ties unspecified), and apply the
  *     merge to every word's symbol sequence via a left-to-right
  *     non-overlapping `aggregate(...)` fold (a built-in higher-order
  *     function — codegen-friendly, no UDF);
  *  3. the working relation is localCheckpointed each round: merge
  *     rounds are SEQUENTIAL by construction (each round's statistics
  *     depend on the previous merge — the published algorithm's shape,
  *     which is why real stacks train on a bounded sample), so the
  *     checkpoint keeps round k's plan O(1) instead of O(k).
  *
  * Scale shape: the driver holds one elected pair per round and the
  * final vocabulary (≤ observed symbols) — never word rows; executor
  * work per round is one scan + one partial-aggregated count of the
  * distinct-word relation. At 100 TB the distinct-word relation is the
  * classic heavy-tail (~10^8–10^9 rows), and the published practice this
  * module mirrors is to train merges on a corpus sample while ENCODING
  * runs on everything — the encode kernel takes whatever vocabulary this
  * trainer emits.
  *
  * Serving convention: [[trainedVocab]] converts the post-merge symbol
  * states into the WordPiece-style inventory the kernel consumes — a
  * word-INITIAL symbol becomes a head piece, a word-internal symbol a
  * `##` continuation, plus every observed character both ways as the
  * fallback floor (so no letter/digit run of observed characters can hit
  * [UNK]). Greedy longest-match over a learned inventory is the standard
  * BERT deployment; the greedy decomposition of a training word may
  * legitimately differ from its BPE merge state (longest-match can cross
  * a merge boundary), which the spec documents and asserts.
  */
object SubwordTrain {

  /** Default merge budget — fixture-sized; a real run passes its own. */
  val DefaultMerges = 50

  /** The distinct-word relation `(word, cnt, syms)` — ONE corpus scan;
    * every merge round works on this, never on documents.
    */
  private[graft] def wordTable(docs: DataFrame, maxWordLen: Int): DataFrame =
    docs.selectExpr(s"explode($bpeSpark) AS word")
      .filter(length(col("word")) <= maxWordLen)
      .groupBy("word").agg(count(lit(1)).as("cnt"))
      .selectExpr("word", "cnt", "split(word, '') AS syms")

  /** Adjacent-pair counts of the current symbol state, weighted by word
    * count — one partially-aggregated hash aggregate.
    */
  private[graft] def pairCounts(words: DataFrame): DataFrame =
    words
      .selectExpr("cnt",
        "posexplode(slice(syms, 1, size(syms) - 1)) AS (i, s1)", "syms")
      .selectExpr("cnt", "s1", "element_at(syms, i + 2) AS s2")
      .groupBy("s1", "s2").agg(sum("cnt").as("n"))

  /** Apply ONE merge left-to-right, non-overlapping (the paper's
    * replacement semantics: a just-merged symbol is not reconsidered
    * within the same pass) — a built-in `aggregate` fold, no UDF. The
    * merge pair is bound as Column LITERALS, never SQL text: symbols come
    * from the corpus (the [[Portable.bpeSpark]] punctuation alternative
    * matches ANY non-alnum character, backslash and quote included), so a
    * text splat would hit Spark's literal-escape rules on exactly the
    * code/URL-heavy corpora this trainer targets.
    */
  private[graft] def applyMerge(words: DataFrame, s1: String,
      s2: String): DataFrame = {
    val a = lit(s1)
    val b = lit(s2)
    val merged = lit(s1 + s2)
    val nullStr = lit(null).cast("string")
    val folded = aggregate(
      col("syms"),
      struct(lit(Array.empty[String]).as("o"), nullStr.as("p")),
      (acc, x) => when(acc.getField("p").isNull,
          struct(acc.getField("o").as("o"), x.as("p")))
        .when(acc.getField("p") === a && x === b,
          struct(array_append(acc.getField("o"), merged).as("o"),
            nullStr.as("p")))
        .otherwise(
          struct(array_append(acc.getField("o"), acc.getField("p")).as("o"),
            x.as("p"))),
      acc => when(acc.getField("p").isNull, acc.getField("o"))
        .otherwise(array_append(acc.getField("o"), acc.getField("p"))))
    words.select(col("word"), col("cnt"), folded.as("syms"))
  }

  /** Learn up to `nMerges` BPE merges from the corpus. Returns the merge
    * list in election order (possibly shorter: training stops when no
    * adjacent pair remains). Deterministic: the election tie-break is
    * total, so the same corpus always yields the same merges.
    */
  def bpeMerges(docs: DataFrame, nMerges: Int = DefaultMerges,
      maxWordLen: Int = SubwordMaxWordLen): Seq[(String, String)] = {
    require(nMerges >= 0, s"bpeMerges: nMerges must be >= 0, got $nMerges")
    var words = wordTable(docs, maxWordLen).localCheckpoint()
    val merges = scala.collection.mutable.ArrayBuffer[(String, String)]()
    var done = false
    while (merges.size < nMerges && !done) {
      val top = pairCounts(words)
        .orderBy(col("n").desc, col("s1"), col("s2")).limit(1).collect()
      if (top.isEmpty) done = true
      else {
        val (s1, s2) = (top.head.getString(0), top.head.getString(1))
        merges += ((s1, s2))
        // checkpoint per round: merge k's plan must not stack k folds
        val next = applyMerge(words, s1, s2).localCheckpoint()
        words.unpersist(blocking = false)
        words = next
      }
    }
    words.unpersist(blocking = false)
    merges.toSeq
  }

  /** The final symbol states under a learned merge list, as the relation
    * `(word, cnt, syms)` — [[bpeMerges]] re-derivation seam for the
    * vocabulary builder and the spec.
    */
  private[graft] def mergedWords(docs: DataFrame,
      merges: Seq[(String, String)],
      maxWordLen: Int = SubwordMaxWordLen): DataFrame = {
    var words = wordTable(docs, maxWordLen).localCheckpoint()
    merges.foreach { case (s1, s2) =>
      val next = applyMerge(words, s1, s2).localCheckpoint()
      words.unpersist(blocking = false)
      words = next
    }
    words
  }

  /** The WordPiece-style inventory for the serving kernel: every
    * post-merge symbol observed word-INITIAL as a head piece, every
    * word-internal one as a `##` continuation, plus every observed
    * CHARACTER both ways (the fallback floor — no letter/digit run of
    * observed characters can collapse to [UNK]). Deterministically
    * ordered (pieces sorted), so piece ids are a pure function of the
    * corpus + merge budget.
    */
  def trainedVocab(docs: DataFrame, nMerges: Int = DefaultMerges,
      maxWordLen: Int = SubwordMaxWordLen): Seq[String] = {
    val merges = bpeMerges(docs, nMerges, maxWordLen)
    val words = mergedWords(docs, merges, maxWordLen)
    val pieces = words
      .selectExpr("posexplode(syms) AS (i, sym)", "word")
      .selectExpr("IF(i = 0, sym, '##' || sym) AS piece",
        "word")
      .select("piece")
      // the char floor: every observed character BOTH ways (head and
      // continuation), so a held-out word built from observed characters
      // can never collapse to [UNK] regardless of where the character was
      // seen during training — the train-on-sample/encode-everything
      // deployment's guarantee.
      .unionAll(words.selectExpr("explode(split(word, '')) AS c")
        .selectExpr("explode(array(c, '##' || c)) AS piece"))
      .distinct()
      .collect().map(_.getString(0))
    words.unpersist(blocking = false)
    pieces.sorted.toSeq
  }
}
