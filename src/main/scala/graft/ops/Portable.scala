package graft.ops

/** Dialect helpers shared by the Spark operators and their DuckDB oracle SQL.
  *
  * The training-data operators (dedup / similarity / text analysis) need
  * hashing that BOTH engines compute bit-identically, or the driver's
  * hash-compare would flag false mismatches. `md5` of a UTF-8 string yields
  * the same lowercase hex in Spark and DuckDB, so every derived hash funnels
  * through it:
  *
  *  - 60-bit integer hash: first 15 hex chars of md5, parsed base-16.
  *    Spark spells that `conv(substr(md5(x),1,15),16,10)`, DuckDB
  *    `CAST('0x'||substr(md5(x),1,15) AS BIGINT)`. 15 nibbles = 60 bits,
  *    always positive, fits a signed 64-bit long in both engines.
  *  - seeded hash family (MinHash): md5 of `"<seed>:" || value`.
  *
  * Marker/stopword lists are defined once here and splatted into BOTH
  * dialects' SQL, so the language-ID and quality heuristics cannot drift.
  */
object Portable {

  /** 60-bit non-negative integer hash of a string SQL expression. */
  def hexcastSpark(x: String): String =
    s"CAST(conv(substr(md5($x), 1, 15), 16, 10) AS BIGINT)"

  def hexcastDuck(x: String): String =
    s"CAST('0x' || substr(md5($x), 1, 15) AS BIGINT)"

  /** Whitespace tokenization — `\S+` runs (not split, which emits empty
    * strings on doubled separators). Spark string literals escape the
    * backslash; DuckDB's do not.
    */
  val tokensSpark = "regexp_extract_all(text, '\\\\S+', 0)"
  val tokensDuck = "regexp_extract_all(text, '\\S+')"

  /** BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation —
    * the coarse shape GPT-2's pre-tokenizer produces, minus byte-level
    * merges (public pattern; no tokenizer library in this container).
    */
  val bpeSpark = "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\\\s]', 0)"
  val bpeDuck = "regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\\s]')"

  /** Language marker words (tiny public stopword cores). Overlaps between
    * romance languages are fine — scoring is argmax with a fixed tie order.
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "a", "of", "and", "to", "in", "is", "it", "that", "for"),
    "de" -> Seq("der", "die", "das", "und", "ist", "mit", "ein", "zu", "den", "nicht"),
    "es" -> Seq("el", "la", "que", "de", "y", "en", "un", "los", "se", "no"),
    "fr" -> Seq("le", "les", "et", "une", "des", "est", "dans", "il", "au", "pas"),
    "zh" -> Seq("的", "是", "在", "了", "和",
      "有", "我", "不", "人", "这"),
  )

  def inList(words: Seq[String]): String =
    words.map(w => s"'$w'").mkString("(", ", ", ")")

  /** English stopword core for quality scoring. */
  val enStopwords: Seq[String] =
    langMarkers.head._2 ++ Seq("on", "with", "as", "at", "by", "an", "be", "this")

  /** Deterministic ±1 random-hyperplane matrix for sign-LSH, derived from
    * md5 parity of "plane:<p>:<i>". Generated ONCE driver-side and splatted
    * as array literals into both dialects' SQL — at scale this is a
    * broadcast constant, not a per-row hash.
    */
  def lshPlane(p: Int, dim: Int): Seq[Int] = {
    val md = java.security.MessageDigest.getInstance("MD5")
    (0 until dim).map { i =>
      val d = md.digest(s"plane:$p:$i".getBytes("UTF-8"))
      if ((d(0) & 1) == 0) 1 else -1
    }
  }

  def planeLitSpark(p: Int, dim: Int): String =
    lshPlane(p, dim).map(w => s"${w}D").mkString("array(", ", ", ")")

  def planeLitDuck(p: Int, dim: Int): String =
    lshPlane(p, dim).map(w => s"CAST($w AS DOUBLE)").mkString("[", ", ", "]")

  /** MinHash universal-hash family over the 60-bit base hash `h`:
    * `mh_j = (A_j * (h mod P) + B_j) mod P`, P = 2^31 − 1. One md5 per
    * shingle total (vs one per shingle per hash), then pure 64-bit integer
    * arithmetic that Spark codegen and DuckDB evaluate identically —
    * `A_j * (h mod P) < 2^62` never overflows a signed long, and both
    * engines' `%` on non-negative longs agree. Coefficients derive from md5
    * parity of the family index, generated driver-side like [[lshPlane]].
    */
  val MinhashP: Long = 2147483647L

  private def md5Long(s: String): Long = {
    val md = java.security.MessageDigest.getInstance("MD5")
    val hex = md.digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString
    java.lang.Long.parseLong(hex.take(15), 16)
  }

  def minhashA(j: Int): Long = md5Long(s"mh_a:$j") % (MinhashP - 1) + 1
  def minhashB(j: Int): Long = md5Long(s"mh_b:$j") % MinhashP

  /** `mh_j` expression over a 60-bit hash column named `h` (both dialects —
    * the arithmetic is dialect-free).
    */
  def minhashExpr(j: Int): String =
    s"(${minhashA(j)} * (h % $MinhashP) + ${minhashB(j)}) % $MinhashP"

  /** Wilder smoothing factor 1/14; splatted as its shortest round-trip
    * decimal into BOTH dialects so each parses back the identical double.
    */
  val wilderAlpha: Double = 1.0 / 14
}
