package graft

import org.apache.spark.sql.functions._

import graft.ops.Dedup

/** Winnowing fingerprints (Dedup.winnowFingerprints / winnowOverlapPairs)
  * against a driver-side reference implementation of the SIGMOD 2003
  * algorithm, plus the published guarantee: any shared token run of length
  * ≥ w + k − 1 shares a fingerprint.
  */
class WinnowSpec extends SparkSpec {
  import spark.implicits._

  private val k = Dedup.WinnowK
  private val w = Dedup.WinnowWindow

  /** 60-bit digest of a gram — the first 15 hex chars of its md5, exactly
    * Portable.hexcastSpark's arithmetic.
    */
  private def h60(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8"))
      .map(b => f"$b%02x").mkString.take(15)
    java.lang.Long.parseLong(hex, 16)
  }

  /** Reference winnow: grams → packed (h32, pos) keys → min per w-window
    * (every full window; the single clipped window when n_grams < w) →
    * distinct selected (pos, h60).
    */
  private def refWinnow(text: String): Seq[(Long, Long)] = {
    val toks = "\\S+".r.findAllIn(text).toVector
    if (toks.size < k) return Seq.empty
    val grams = (0 to toks.size - k).map(i => toks.slice(i, i + k).mkString(" "))
    val keys = grams.zipWithIndex.map { case (g, p) =>
      (h60(g) % Dedup.WinnowSelMod) * Dedup.WinnowPosMod + p
    }
    val starts = 0 to math.max(grams.size - w, 0)
    starts.map(j => keys.slice(j, j + w).min).distinct
      .map { key =>
        val pos = key % Dedup.WinnowPosMod
        (pos, h60(grams(pos.toInt)))
      }.sorted
  }

  private val fixture = Seq(
    // long doc: enough grams for several full windows
    (1L, "the quick brown fox jumps over the lazy dog while the quick brown cat sleeps under the old oak tree near the river bank today"),
    // exact copy of doc 1 — full containment both ways
    (2L, "the quick brown fox jumps over the lazy dog while the quick brown cat sleeps under the old oak tree near the river bank today"),
    // short doc pasted INSIDE a long unrelated doc (containment, low Jaccard)
    (3L, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (4L, "one two three four five six seven eight nine ten alpha beta gamma delta epsilon zeta eta theta iota kappa eleven twelve thirteen fourteen fifteen sixteen seventeen eighteen nineteen twenty"),
    // fewer than w grams: exactly one fingerprint
    (5L, "just four little tokens"),
    // fewer than k tokens: no fingerprints
    (6L, "too short"),
    // unrelated doc — must pair with nobody
    (7L, "completely different vocabulary here with nothing shared at all among these particular words whatsoever in any respect")
  ).toDF("doc_id", "text")

  test("winnowFingerprints matches the driver-side reference on every doc") {
    val got = Dedup.winnowFingerprints(fixture)
      .select("doc_id", "pos", "h").as[(Long, Long, Long)]
      .collect().groupBy(_._1)
      .map { case (d, rows) => d -> rows.map(r => (r._2, r._3)).toSeq.sorted }
    val texts = fixture.as[(Long, String)].collect().toMap
    texts.foreach { case (d, text) =>
      val want = refWinnow(text)
      assert(got.getOrElse(d, Seq.empty) == want, s"doc $d")
    }
    // structural edges: <k tokens → none; <w grams → exactly one
    assert(!got.contains(6L))
    assert(got(5L).size == 1)
  }

  test("guarantee: a shared run of ≥ w+k-1 tokens yields a shared fingerprint") {
    // doc 3 (10 tokens, all inside doc 4) ≥ w + k − 1 = 10 ⇒ guaranteed hit
    val pairs = Dedup.winnowOverlapPairs(fixture)
      .select("a_id", "b_id", "n_common", "containment", "is_overlap")
      .as[(Long, Long, Long, Double, Int)].collect()
      .map(r => (r._1, r._2) -> r).toMap
    val contained = pairs.get((3L, 4L))
    assert(contained.isDefined, "pasted doc must share a fingerprint")
    assert(contained.get._3 >= 1L)
    // identical docs: full containment, every fingerprint common
    val dup = pairs((1L, 2L))
    assert(dup._4 == 1.0 && dup._5 == 1)
    // the unrelated doc pairs with nobody
    assert(!pairs.keys.exists { case (a, b) => a == 7L || b == 7L })
  }

  test("winnowKeepDocs drops exactly the higher-id side of overlap pairs") {
    val dropped = Dedup.winnowOverlapPairs(fixture)
      .filter(col("is_overlap") === 1)
      .select("b_id").as[Long].collect().toSet
    val kept = Dedup.winnowKeepDocs(fixture)
      .select("doc_id").as[Long].collect().toSet
    assert(kept == Set(1L, 2L, 3L, 4L, 5L, 6L, 7L).diff(dropped))
    // the exact copy (2) and the pasted doc... the CONTAINED side keeps
    // only when it is the lower id: 3 < 4, so 3 survives and 4 drops
    assert(!kept.contains(2L) && kept.contains(3L) && !kept.contains(4L))
    // survivors keep every input column
    assert(Dedup.winnowKeepDocs(fixture).columns.toSeq ==
      Seq("doc_id", "text"))
  }

  test("containment catches what whole-doc Jaccard misses") {
    // doc 3 inside doc 4: winnow containment is high while the doc-level
    // shingle Jaccard stays low (the containment-vs-resemblance split that
    // motivates carrying BOTH families)
    val cont = Dedup.winnowOverlapPairs(fixture)
      .filter(col("a_id") === 3L && col("b_id") === 4L)
      .select("containment").as[Double].head()
    val jac = Dedup.ngramJaccardPairs(fixture)
      .filter(col("a_id") === 3L && col("b_id") === 4L)
      .select("jaccard").as[Double].collect().headOption.getOrElse(0.0)
    assert(cont >= 0.5, s"containment $cont")
    assert(jac < 0.5, s"jaccard $jac")
  }
}
