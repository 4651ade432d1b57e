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

  /** Companion 60-bit hash from the OTHER end of the same md5 (hex chars
    * 17–31 — disjoint from [[hexcastSpark]]'s 1–15), for identities that
    * need more than 60 bits without leaving integer width: the digest
    * PAIR is 120 bits, pushing the birthday bound from ~2^30 items (real
    * web-crawl chunk counts) to ~2^60, at one md5 per row total.
    */
  def hexcastSpark2(x: String): String =
    s"CAST(conv(substr(md5($x), 17, 15), 16, 10) AS BIGINT)"

  def hexcastDuck2(x: String): String =
    s"CAST('0x' || substr(md5($x), 17, 15) AS BIGINT)"

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

  /** PII patterns, written in the regex subset Java (Spark) and RE2 (DuckDB)
    * evaluate identically — character classes, bounded repetition, no
    * lookaround, no backreferences. One raw spelling; each dialect helper
    * escapes it for that engine's string literal (Spark SQL literals eat one
    * level of backslash, DuckDB's do not).
    */
  val piiPatterns: Seq[(String, String, String)] = Seq(
    ("email", """[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}""", "<EMAIL>"),
    ("ipv4", """[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}""", "<IP>"),
    ("phone", """[0-9]{3}[-.][0-9]{3}[-.][0-9]{4}""", "<PHONE>"))

  def regexLitSpark(pat: String): String = s"'${pat.replace("\\", "\\\\")}'"
  def regexLitDuck(pat: String): String = s"'$pat'"

  /** In-query PII fixture for the differential oracle: the synthetic corpus
    * carries no PII (words only), so the oracle row would compare constant
    * zeros and never exercise the regexes. Appending deterministic,
    * doc_id-derived PII in BOTH dialects turns the driver's hash-compare
    * into a real cross-engine regex-parity test. Visible fixture, not
    * hidden data: the injection is part of the query text in both engines.
    */
  private def piiInject(castStr: String => String, iff: (String, String) => String): String =
    "concat(text, " +
      iff("doc_id % 7 = 0", s"concat(' user', ${castStr("doc_id")}, '@example.com')") + ", " +
      iff("doc_id % 11 = 0", s"concat(' from 10.0.', ${castStr("doc_id % 256")}, '.7')") + ", " +
      iff("doc_id % 13 = 0", "' call 555-867-5309'") + ")"

  val piiInjectSpark: String =
    piiInject(c => s"CAST($c AS STRING)", (p, v) => s"IF($p, $v, '')")
  val piiInjectDuck: String =
    piiInject(c => s"CAST($c AS VARCHAR)", (p, v) => s"CASE WHEN $p THEN $v ELSE '' END")

  /** BM25 retrieval (Robertson/Spärck Jones probabilistic relevance — the
    * Okapi BM25 ranking function, as spelled in Lucene: idf = ln(1 + (N −
    * df + 0.5)/(df + 0.5))). Parameters are EXACTLY-REPRESENTABLE doubles
    * (k1 = 1.25 in the standard 1.2–2.0 range, b = 0.75 the classic
    * default): any parse path in either engine yields the identical bits,
    * so no decimal-literal semantics can drift the scores.
    *
    * The query batch is fixed and splatted into both dialects — the
    * corpus-scoring use-case of a data pipeline (rank 10^10 documents
    * against a target query set), not an interactive search box.
    */
  val Bm25K1 = "CAST(1.25 AS DOUBLE)"
  val Bm25B = "CAST(0.75 AS DOUBLE)"
  val bm25Queries: Seq[(Int, Seq[String])] = Seq(
    0 -> Seq("join", "hash"),
    1 -> Seq("spark", "stream", "window"),
    2 -> Seq("vector", "scan", "merge"))
  val Bm25MaxTerms: Int = bm25Queries.map(_._2.size).max
  val Bm25TopK = 10
  /** Micro-integerization scale for the ranking key: ranking on
    * `floor(score × 1e6)` makes the top-k deterministic across engines even
    * if `ln` differs in the last ulp.
    */
  val Bm25Micro = 1000000L

  /** `(query_id, pos, term)` VALUES relation — dialect-free. */
  val bm25QueryValues: String = {
    val rows = for ((qid, terms) <- bm25Queries; (t, pos) <- terms.zipWithIndex)
      yield s"($qid, $pos, '$t')"
    s"(VALUES ${rows.mkString(", ")}) bq(query_id, pos, term)"
  }

  val bm25AllTerms: Seq[String] = bm25Queries.flatMap(_._2).distinct

  /** Greedy longest-match WordPiece vocabulary (Schuster & Nakajima,
    * "Japanese and Korean voice search", ICASSP 2012; the BERT `##`
    * continuation convention; subword budgeting per Sennrich et al.,
    * "Neural machine translation of rare words with subword units",
    * ACL 2016). A fixture vocabulary, not a trained artifact: every ASCII
    * letter/digit is present as BOTH a head piece and a `##` continuation,
    * so any [[bpeSpark]] letter/digit pre-token tokenizes without [UNK]
    * (non-ASCII pre-tokens collapse to one [UNK], the BERT whole-word
    * convention), while the multi-character pieces exercise real
    * longest-match behavior. Splatted verbatim into BOTH dialects — the
    * [[bm25Queries]] discipline.
    */
  val subwordVocab: Seq[String] = {
    val singles = (('a' to 'z') ++ ('A' to 'Z') ++ ('0' to '9'))
      .map(_.toString)
    val words = Seq("the", "and", "for", "with", "data", "join", "hash",
      "spark", "stream", "window", "vector", "scan", "merge", "table",
      "query", "index", "shuffle", "batch")
    val suffixes = Seq("##ing", "##ed", "##er", "##es", "##ion", "##ly",
      "##s", "##able", "##ment")
    (singles ++ singles.map("##" + _) ++ words ++ suffixes).distinct
  }

  /** Pre-tokens longer than this collapse to one [UNK] (BERT's
    * max_input_chars_per_word guard — bounds the per-word matching loop).
    */
  val SubwordMaxWordLen = 48

  /** The BPE training fixture: a small corpus LITERAL (deliberately not a
    * testdata table, so the pinned vocabulary below cannot drift when the
    * driver regenerates parquet) with repeated stems, digits, and
    * punctuation so the learned merges exercise real head/continuation
    * structure. Quote/backslash-free by construction — its derived pieces
    * splat safely into both SQL dialects.
    */
  val subwordFixtureCorpus: Seq[String] = Seq(
    "the market data pipeline packs training tokens into fixed budget bins",
    "the trainer meters subword tokens, not whitespace tokens.",
    "merge the most frequent pair of adjacent symbols each round.",
    "deterministic tie break on count, then lexicographic order.",
    "documents arrive continuously and land in training shards.",
    "the vocabulary learned from the corpus replaces the fixture.",
    "token budgets price code and url heavy documents correctly.",
    "12345 67890 12345 tokens counted 99 times in 2048 token bins.",
    "greedy longest match wordpiece over the learned inventory.",
    "the serving kernel folds the vocabulary once per plan.")

  /** Merge budget the pinned fixture vocabulary was trained at. */
  val TrainedFixtureMerges = 25

  /** The LEARNED vocabulary: `SubwordTrain.trainedVocab` over
    * [[subwordFixtureCorpus]] at [[TrainedFixtureMerges]] merges, PINNED
    * as a literal so the oracle SQL (a static text, no engine at build
    * time) can splat the identical inventory into both dialects.
    * `SubwordTrainSpec` re-derives it through the distributed trainer and
    * asserts equality — the pin cannot drift from the training path it
    * claims to capture.
    */
  val trainedFixtureVocab: Seq[String] = TrainedFixtureVocabPin.pieces

  /** One term's BM25 contribution — dialect-free arithmetic over BIGINT
    * `tf`/`df`/`dl`, BIGINT `n`, DOUBLE `avgdl` columns. Parenthesized
    * fully so both engines associate identically.
    */
  def bm25TermScore(tf: String, df: String, dl: String, n: String,
      avgdl: String): String = {
    // 0.5 forced to DOUBLE: a bare decimal literal would pull the BIGINT
    // df/n into DECIMAL arithmetic, whose precision/rounding rules differ
    // between the engines; in pure double space both are IEEE-identical
    val half = "CAST(0.5 AS DOUBLE)"
    s"(ln(1 + ((($n - $df) + $half) / ($df + $half))) * " +
      s"(($tf * ($Bm25K1 + 1)) / ($tf + ($Bm25K1 * ((1 - $Bm25B) + ($Bm25B * ($dl / $avgdl)))))))"
  }

  /** Per-stratum sampling thresholds: keep a row iff its 60-bit sample hash
    * mod 1e6 falls under `round(rate * 1e6)`. Thresholds are integerized
    * driver-side and splatted into BOTH dialects, so no float multiply can
    * disagree at the boundary. Strata are the corpus languages (the classic
    * low-resource up-/high-resource down-weighting mix).
    */
  val SampleMod: Long = 1000000L
  val sampleRates: Seq[(String, Double)] = Seq(
    "en" -> 0.5, "de" -> 0.8, "es" -> 0.9, "fr" -> 0.9, "zh" -> 1.0)
  val sampleDefaultRate: Double = 0.25

  def sampleThreshold(rate: Double): Long = math.round(rate * SampleMod)

  /** CASE expression mapping the stratum column to its integer threshold —
    * dialect-free SQL (shared verbatim by Spark and DuckDB).
    */
  def sampleThresholdCase(stratumCol: String): String = {
    val whens = sampleRates
      .map { case (s, r) => s"WHEN $stratumCol = '$s' THEN ${sampleThreshold(r)}" }
      .mkString(" ")
    s"CASE $whens ELSE ${sampleThreshold(sampleDefaultRate)} END"
  }
}
