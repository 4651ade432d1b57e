package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import Portable._

/** Approximate-nearest-neighbor / similarity search over an embedding column
  * (`Array[Float]`, 64-dim in the driver testdata) — the retrieval stage of a
  * training-data curation pipeline.
  *
  * Two paths, per the standard ANN playbook:
  *
  *  - [[bruteTopK]] — exact cosine top-k. Quadratic in (queries × corpus);
  *    the CORRECTNESS baseline, and still the right physical plan when the
  *    query set is small: Spark broadcasts the query side and the scan is
  *    one pass over the corpus, no shuffle except the final per-query top-k
  *    (k rows/query).
  *  - [[lshNearDup]] / [[lshTopK]] — sign-LSH (random hyperplane) bucketing.
  *    A 16-bit signature from a FIXED ±1 plane matrix (a driver-side
  *    constant — zero per-row hashing; at cluster scale a broadcast
  *    matrix), banded into 4 nibbles; candidates share ≥1 nibble band
  *    (pigeonhole: hamming ≤ 3 ⇒ some nibble equal), then exact-cosine
  *    verified. The band explode and bucket join carry ONLY (vec_id, band)
  *    — embeddings rejoin after candidate dedup, so shuffle volume is ids,
  *    not vectors. Linear in corpus size for well-spread signatures — this
  *    is the 100 TB path.
  *
  * Dot products use the same left-fold as [[Dedup.dot]] so the DuckDB oracle
  * reproduces doubles bit-identically.
  *
  * Sign-LSH is Charikar's random-hyperplane rounding (STOC 2002); the
  * inverted-file (IVF-flat) coarse-quantize-then-probe layout follows
  * Jégou/Douze/Schmid, "Product quantization for nearest neighbor search"
  * (TPAMI 2011) as popularized by FAISS, with deterministic leaders in
  * place of k-means so the oracle replays assignment bit-for-bit.
  */
object Similarity {

  val Dim = 64
  val Planes = 16
  val NibbleBands = 4
  val TopK = 10
  /** Every 50th vec_id acts as a query point in the driver testdata. */
  val QueryStride = 50
  val NearDupCosine: Double = Dedup.CosineDupThreshold

  private def withNorm(emb: DataFrame): DataFrame =
    emb.select(col("vec_id"), col("embedding"),
      expr(s"sqrt(${Dedup.dot("embedding", "embedding")})").as("norm"))

  private def cosine(a: String, b: String): Column =
    (expr(Dedup.dot(s"$a.embedding", s"$b.embedding")) /
      (col(s"$a.norm") * col(s"$b.norm"))).as("cos_sim")

  /** Sign-LSH signature (default 16 bits) + per-band sub-keys per vector.
    *
    * `planes`/`bands` are the CAPACITY knobs: buckets per band =
    * 2^(planes/bands), and expected bucket occupancy = corpus /
    * 2^(planes/bands) — the unit of candidate-join cost. The 16/4 default
    * (16 buckets/band) fits the driver testdata and its low 0.3 cosine
    * threshold; a billion-vector corpus wants wider signatures AND more
    * bands to hold recall while shrinking buckets (e.g. 48 planes / 8
    * six-bit bands ⇒ 64 buckets/band, recall per band falls but 8 chances
    * compensate). planes ≤ 62 (the signature packs into one BIGINT on both
    * engines).
    */
  def signatures(emb: DataFrame, planes: Int = Planes,
      bands: Int = NibbleBands): DataFrame = {
    // bands > 0 must short-circuit first: bands = 0 would raise
    // ArithmeticException from the modulo instead of the promised
    // IllegalArgumentException, and a negative bands could pass it
    require(planes > 0 && planes <= 62 && bands > 0 && planes % bands == 0,
      s"signatures: need 0 < planes <= 62, bands > 0, planes % bands == 0, got $planes/$bands")
    val bandBits = planes / bands
    // Long shift: an Int (1 << 32) wraps to 1 and a 32-bit band would mask
    // every bucket key to 0 — one bucket, full quadratic join, silently
    val bandMask = (1L << bandBits) - 1
    val projs = (0 until planes).map { p =>
      expr(Dedup.dot("embedding", planeLitSpark(p, Dim))).as(s"proj_$p")
    }
    val sigSum = (0 until planes)
      .map(p => s"CASE WHEN proj_$p > 0 THEN ${1L << p} ELSE 0 END")
      .mkString(" + ")
    val nibs = (0 until bands).map(q =>
      expr(s"shiftright(sig16, ${bandBits * q}) & $bandMask").as(s"nib_$q"))
    emb.select(col("vec_id") +: projs: _*)
      .withColumn("sig16", expr(s"CAST($sigSum AS BIGINT)"))
      .select(col("vec_id") +: col("sig16") +: nibs: _*)
  }

  /** (vec_id, q, nib) exploded band rows — ids only, no vector payload. */
  private def bandRows(emb: DataFrame, planes: Int = Planes,
      bands: Int = NibbleBands): DataFrame =
    signatures(emb, planes, bands).select(col("vec_id"), posexplode(
      array((0 until bands).map(q => col(s"nib_$q")): _*))
      .as(Seq("q", "nib")))

  /** Band rows + over-cap bucket root (`hot_root` = bucket-min vec_id when
    * the bucket exceeds `cap`, NULL when cold), PERSISTED and eagerly
    * filled — the candidate legs below read it 2-3 times, and racing AQE
    * stages would each recompute an unfilled cache (the shared-relation
    * discipline of [[Dedup.minhashPairs]]). The degrade is
    * [[Dedup.hotBucketRoots]] (groupBy partials + broadcast left join),
    * never a bucket window: a giant family of near-identical embeddings —
    * exactly dedup's target input — lands in ONE bucket per band, and a
    * window would buffer that mega-bucket's every row in one task before
    * the degrade could apply. Callers must free via
    * [[Dedup.materializeFreeing]].
    *
    * Why a cap at all: `planes`/`bands` size EXPECTED occupancy; they cannot
    * bound a data-dependent hot bucket. An uncapped self-join yields df²
    * candidates from the hot bucket; buckets over `cap` degrade to STAR
    * candidates (bucket-min vec_id → member): df−1 pairs, family stays
    * discoverable through its root.
    */
  private def bandRowsWithOccupancy(emb: DataFrame, planes: Int,
      bands: Int, cap: Int): DataFrame = {
    val raw = bandRows(emb, planes, bands).persist()
    val rawN = raw.count() // hotBucketRoots scans it twice (stats + probe)
    val b = Dedup.hotBucketRoots(raw, Seq("q", "nib"), cap,
      struct(col("vec_id")), relRows = Some(rawN)).persist()
    b.count()
    raw.unpersist(blocking = false)
    b
  }

  /** Exact cosine of a distinct (a_id, b_id) candidate-pair frame. */
  private def scorePairs(cand: DataFrame, emb: DataFrame): DataFrame = {
    val e = withNorm(emb)
    cand
      .join(e.as("a"), col("a_id") === col("a.vec_id"))
      .join(e.as("b"), col("b_id") === col("b.vec_id"))
      .select(col("a_id"), col("b_id"), cosine("a", "b"))
  }

  /** Exact cosine top-k per query vector (vec_id % stride = 0), neighbors
    * ranked (cos_sim DESC, neighbor_id ASC), self excluded.
    */
  def bruteTopK(emb: DataFrame, k: Int = TopK): DataFrame = {
    val e = withNorm(emb)
    val q = e.filter(col("vec_id") % QueryStride === 0)
    // broadcast the QUERY side: the non-equi join is a nested-loop join and
    // without the hint Spark builds the right (full-corpus) side — fine at
    // test scale, fatal at 100 TB. With BuildLeft the corpus streams.
    broadcast(q.as("a"))
      .join(e.as("b"), col("a.vec_id") =!= col("b.vec_id"))
      .select(col("a.vec_id").as("query_id"),
        col("b.vec_id").as("neighbor_id"), cosine("a", "b"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  /** LSH-accelerated top-k: rank only candidates sharing ≥1 nibble band
    * with the query (approximate — may return < k rows per query).
    * `planes`/`bands` size the buckets — see [[signatures]]; buckets hotter
    * than `maxBandOccupancy` degrade to star candidates (the root—member
    * edges with a query endpoint, oriented query-first) — see
    * [[bandRowsWithOccupancy]]. Mirrored in the DuckDB oracle.
    */
  def lshTopK(emb: DataFrame, k: Int = TopK, planes: Int = Planes,
      nBands: Int = NibbleBands,
      maxBandOccupancy: Int = Dedup.MaxBandOccupancy): DataFrame = {
    val bands = bandRowsWithOccupancy(emb, planes, nBands, maxBandOccupancy)
    Dedup.materializeFreeing(lshTopKFrom(bands, emb, k), bands)
  }

  /** The occupancy-annotated band relation as a SHARED relation — the
    * seam a battery memoizes so [[lshTopK]] and [[lshNearDup]] read ONE
    * signature + occupancy build instead of each constructing their own
    * (the materialize-once convention). The returned relation is
    * persisted and eagerly filled; the caller owns its lifetime.
    */
  def lshBandRelation(emb: DataFrame, planes: Int = Planes,
      nBands: Int = NibbleBands,
      maxBandOccupancy: Int = Dedup.MaxBandOccupancy): DataFrame =
    bandRowsWithOccupancy(emb, planes, nBands, maxBandOccupancy)

  /** [[lshTopK]] over an explicit (persisted) band relation. */
  private[graft] def lshTopKFrom(bands: DataFrame, emb: DataFrame,
      k: Int = TopK): DataFrame = {
    val cold = bands.filter(col("hot_root").isNull)
      .select("vec_id", "q", "nib")
    val candCold = cold.filter(col("vec_id") % QueryStride === 0).as("qa")
      .join(cold.as("qb"),
        col("qa.q") === col("qb.q") && col("qa.nib") === col("qb.nib") &&
          col("qa.vec_id") =!= col("qb.vec_id"))
      .select(col("qa.vec_id").as("a_id"), col("qb.vec_id").as("b_id"))
    val hot = bands
      .filter(col("hot_root").isNotNull &&
        col("vec_id") =!= col("hot_root.vec_id"))
    val candHot = hot.filter(col("hot_root.vec_id") % QueryStride === 0)
      .select(col("hot_root.vec_id").as("a_id"), col("vec_id").as("b_id"))
      .unionByName(hot.filter(col("vec_id") % QueryStride === 0)
        .select(col("vec_id").as("a_id"), col("hot_root.vec_id").as("b_id")))
    val cand = candCold.unionByName(candHot).distinct()
    scorePairs(cand, emb)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("cos_sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)
  }

  // ---- IVF-flat (inverted-file) ANN ----

  val NumLists = 16
  val NProbe = 2
  /** Per-list cap in [[ivfTopK]]: a degenerate corpus (one dominant cluster)
    * assigns everything to one list, and probing that list is a full corpus
    * scan per query. Lists keep their `maxListOccupancy` lowest vec_ids for
    * probing — deterministic, oracle-mirrored; the production fix for a
    * persistently hot list is more lists / re-training, the cap is the
    * guard that keeps probe cost bounded meanwhile.
    */
  val MaxListOccupancy = 1000

  /** Deterministic coarse quantizer: the [[NumLists]] lowest-vec_id vectors
    * act as list leaders (a "sampled leaders" IVF — this keeps the oracle
    * deterministic; [[kmeansLeaders]] is the quality-refined option).
    */
  private def leaders(emb: DataFrame): DataFrame =
    withNorm(emb.filter(col("vec_id") < NumLists))
      .select(col("vec_id").as("list_id"), col("embedding").as("lvec"),
        col("norm").as("lnorm"))

  /** The deterministic coarse-quantizer relation `(list_id, lvec, lnorm)`
    * — exposed for [[graft.ops.Pq]]'s residual encoding, which subtracts
    * the assigned leader from each vector before quantizing (FAISS
    * `by_residual=true`) and so must see the SAME leader floats the
    * assignment ranked against.
    */
  private[graft] def ivfLeaders(emb: DataFrame): DataFrame = leaders(emb)

  /** Assignment of each vector to its max-cosine centroid (ties → lowest
    * list id), carrying the vector and its norm through the window. One
    * broadcast of the centroids, one linear scan — N×K dot products, no
    * shuffle of the corpus; consumers that don't need the carry select it
    * away and Catalyst prunes it out of the scan.
    */
  private def assignFull(e: DataFrame, cents: DataFrame): DataFrame =
    e.crossJoin(broadcast(cents))
      .select(col("vec_id"), col("embedding"), col("norm"), col("list_id"),
        (expr(Dedup.dot("embedding", "lvec")) / (col("norm") * col("lnorm")))
          .as("list_cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy("vec_id")
        .orderBy(col("list_cos").desc, col("list_id"))))
      .filter(col("rnk") === 1)
      .drop("rnk")

  private def assignTo(e: DataFrame, cents: DataFrame): DataFrame =
    assignFull(e, cents).select("vec_id", "list_id", "list_cos")

  /** Lloyd-refined leaders from the deterministic seeds: `iters` rounds of
    * assign-to-max-cosine + elementwise-mean recompute (spherical k-means;
    * Jégou/Douze/Schmid train the IVF coarse quantizer exactly so). Each
    * round's centroid set is collected to the driver and re-broadcast —
    * O(NumLists × Dim) values by construction (MLlib's k-means does the
    * same), which keeps every round ONE crossJoin against a local relation
    * instead of an iters-deep nested plan. The mean runs through a
    * posexplode + (list_id, pos) hash-aggregate: map-side partial combine,
    * no array lambdas in the hot path. A list that loses all members keeps
    * its previous centroid.
    */
  def kmeansLeaders(emb: DataFrame, iters: Int): DataFrame =
    kmeansFromSeeds(emb, leaders(emb), iters)

  /** [[kmeansLeaders]] from an EXPLICIT seed relation `(list_id, lvec,
    * lnorm)` — the RETRAIN seam: an index maintainer re-training a skewed
    * store seeds from the store's own current spread (e.g.
    * [[graft.streaming.IvfMaintenance.hashTileSeeds]]) instead of the
    * low-vec_id bootstrap vectors, which by construction sit wherever the
    * corpus STARTED, not where it has drifted.
    */
  def kmeansFromSeeds(emb: DataFrame, seeds: DataFrame, iters: Int): DataFrame = {
    require(iters >= 0, s"kmeansFromSeeds: iters must be >= 0, got $iters")
    val spark = emb.sparkSession
    import spark.implicits._
    val e = withNorm(emb)
    var cents = seeds
    for (_ <- 0 until iters) {
      val means = assignTo(e, cents)
        .join(e.select("vec_id", "embedding"), Seq("vec_id"))
        .select(col("list_id"), posexplode(col("embedding")).as(Seq("pos", "x")))
        .groupBy("list_id", "pos").agg(avg("x").as("mx"))
        .groupBy("list_id")
        .agg(array_sort(collect_list(struct(col("pos"), col("mx")))).as("pm"))
        .select(col("list_id"), expr("transform(pm, p -> CAST(p.mx AS FLOAT))").as("mvec"))
      val next = cents
        .join(means, Seq("list_id"), "left")
        .select(col("list_id"), coalesce(col("mvec"), col("lvec")).as("lvec"))
        .select($"list_id", $"lvec",
          expr(s"sqrt(${Dedup.dot("lvec", "lvec")})").as("lnorm"))
        .as[(Long, Array[Float], Double)].collect().toSeq
      cents = next.toDF("list_id", "lvec", "lnorm")
    }
    cents
  }

  /** IVF assignment over the deterministic leaders (`kmeansIters` = 0, the
    * oracle default) or the Lloyd-refined ones.
    */
  def ivfAssignments(emb: DataFrame, kmeansIters: Int = 0): DataFrame =
    assignTo(withNorm(emb),
      if (kmeansIters == 0) leaders(emb) else kmeansLeaders(emb, kmeansIters))

  /** Assignment of arbitrary vectors against an EXPLICIT centroid relation
    * `(list_id, lvec, lnorm)` — the index-ADD seam: an incremental
    * maintainer ([[graft.streaming.IncrementalAnnIndex]]) assigns each new
    * batch against the FROZEN trained leaders instead of re-deriving
    * leaders from the batch (which would silently re-train the quantizer
    * on whatever arrived last).
    */
  def assignWithLeaders(emb: DataFrame, cents: DataFrame): DataFrame =
    assignTo(withNorm(emb), cents)

  /** [[assignWithLeaders]] retaining `(embedding, norm)` alongside the
    * assignment — the single-pass index ADD (list rows physically carry
    * their vectors; recomputing norms and joining them back would shuffle
    * the batch against itself every micro-batch).
    */
  def assignWithLeadersRetaining(emb: DataFrame, cents: DataFrame): DataFrame =
    assignFull(withNorm(emb), cents)

  /** `(vec_id, embedding, norm)` — the one place the norm formula lives;
    * exposed so store probes compute query norms identically to the
    * assignment path (the bit-identity contract rides on it).
    */
  def withNorms(emb: DataFrame): DataFrame = withNorm(emb)

  /** The trained leader relation for [[assignWithLeaders]] — deterministic
    * seeds at `kmeansIters` = 0, Lloyd-refined otherwise.
    */
  def trainLeaders(emb: DataFrame, kmeansIters: Int = 0): DataFrame =
    if (kmeansIters == 0) leaders(emb) else kmeansLeaders(emb, kmeansIters)

  /** IVF-flat top-k: probe the [[NProbe]] nearest lists per query, rank
    * only vectors assigned there. Candidate volume ≈ nprobe/nlists of the
    * corpus per query; the probe join co-partitions on list_id. Lists are
    * capped at `maxListOccupancy` members (see [[MaxListOccupancy]]) via a
    * rank-limit the optimizer runs as WindowGroupLimit — bounded per-task
    * state, not a full sort of a hot list.
    */
  def ivfTopK(emb: DataFrame, k: Int = TopK, kmeansIters: Int = 0,
      maxListOccupancy: Int = MaxListOccupancy): DataFrame = {
    val (cand, assign) = ivfProbeCandidates(emb, kmeansIters, maxListOccupancy)
    // free the assignment leg once the (k rows/query) result materializes —
    // same no-leak contract as the Dedup pair operators
    Dedup.materializeFreeing(ivfTopKFrom(cand, emb, k), assign)
  }

  /** [[ivfTopK]]'s ranking leg over an EXPLICIT candidate relation — the
    * share seam: a battery memoizing [[ivfCappedAssign]]/
    * [[ivfCandidatesFrom]] feeds the flat and IVFPQ searches from ONE
    * assignment + candidate build (the caller owns those lifetimes).
    */
  private[graft] def ivfTopKFrom(cand: DataFrame, emb: DataFrame,
      k: Int = TopK): DataFrame =
    scorePairs(cand.select(col("query_id").as("a_id"),
        col("vec_id").as("b_id")), emb)
      .select(col("a_id").as("query_id"), col("b_id").as("neighbor_id"),
        col("cos_sim"))
      .withColumn("rank", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("cos_sim").desc, col("neighbor_id"))))
      .filter(col("rank") <= k)

  /** The capped-list probe candidate relation `(query_id, vec_id)` shared
    * by [[ivfTopK]] and [[graft.ops.Pq.ivfpqTopK]] — ONE construction, so
    * the flat and PQ search paths cannot diverge from the oracle's shared
    * `iv_kept`/`iv_probe`/`iv_cand` CTE chain. Returns the candidate pairs
    * plus the PERSISTED assignment leg; the caller must free it via
    * [[Dedup.materializeFreeing]] once its result materializes.
    */
  /** The `(query_id, list_id)` probe relation: each query's [[NProbe]]
    * max-cosine lists under an explicit centroid set — ONE construction
    * shared by [[ivfProbeCandidates]] and the incremental IVFPQ store
    * search ([[graft.streaming.IncrementalIvfPqIndex]]), so a store probe
    * ranks lists exactly as the batch operator does. `queries` must carry
    * `(vec_id, embedding, norm)` (see [[withNorms]]).
    */
  private[graft] def probeLists(queries: DataFrame, cents: DataFrame): DataFrame =
    queries
      .crossJoin(broadcast(cents))
      .select(col("vec_id").as("query_id"), col("list_id"),
        (expr(Dedup.dot("embedding", "lvec")) / (col("norm") * col("lnorm")))
          .as("probe_cos"))
      .withColumn("rnk", row_number().over(Window.partitionBy("query_id")
        .orderBy(col("probe_cos").desc, col("list_id"))))
      .filter(col("rnk") <= NProbe)
      .select("query_id", "list_id")

  private[graft] def ivfProbeCandidates(emb: DataFrame, kmeansIters: Int = 0,
      maxListOccupancy: Int = MaxListOccupancy): (DataFrame, DataFrame) = {
    // ONE centroid set for both halves: training twice would not only
    // double the Lloyd cost, its order-dependent float means could
    // disagree bitwise and misroute probes near list boundaries
    val cents =
      if (kmeansIters == 0) leaders(emb) else kmeansLeaders(emb, kmeansIters)
    val assign =
      ivfCappedAssignWith(emb, cents, maxListOccupancy).persist()
    assign.count() // eager: probed by both the query and candidate legs
    (ivfCandidatesWith(assign, emb, cents), assign)
  }

  /** The capped-list assignment `(vec_id, list_id)` under an explicit
    * centroid set — the build half of [[ivfProbeCandidates]], split out so
    * a battery can memoize ONE assignment for the flat search, the
    * residual IVFPQ search AND the residual code store (each built the
    * identical relation per row in r15). Cap via the two-phase
    * WindowGroupLimit rank, as always.
    */
  private[graft] def ivfCappedAssignWith(emb: DataFrame, cents: DataFrame,
      maxListOccupancy: Int = MaxListOccupancy): DataFrame =
    assignTo(withNorm(emb), cents)
      .withColumn("lrnk", row_number().over(Window.partitionBy("list_id")
        .orderBy("vec_id")))
      .filter(col("lrnk") <= maxListOccupancy)
      .select("vec_id", "list_id")

  /** The probe-candidate half of [[ivfProbeCandidates]] over an EXPLICIT
    * (persisted) capped assignment and the SAME centroid set it was built
    * against. cand carries the probed list_id: each vector belongs to
    * exactly one list (assignment rnk = 1) so the pair set is unchanged,
    * and the IVFPQ residual path needs the list to pick the right
    * per-(query, list) distance-table slice. The capped-list side
    * BROADCASTS (≤ cap × lists id-width rows by construction): the only
    * equi-key is list_id (NumLists values), so a shuffled join would cap
    * parallelism at the list count — a probed hot list's every
    * (query × member) candidate through one task.
    */
  private[graft] def ivfCandidatesWith(assign: DataFrame, emb: DataFrame,
      cents: DataFrame): DataFrame = {
    val e = withNorm(emb)
    val probes = probeLists(e.filter(col("vec_id") % QueryStride === 0), cents)
    probes
      .join(broadcast(assign), Seq("list_id"))
      .filter(col("query_id") =!= col("vec_id"))
      .select("query_id", "list_id", "vec_id")
      .distinct()
  }

  /** LSH near-duplicate pairs: nibble-band candidates, exact-cosine verified
    * at the [[Dedup.CosineDupThreshold]] — the sub-quadratic counterpart of
    * [[Dedup.embeddingNearDup]]. `planes`/`bands` size the buckets — see
    * [[signatures]]; candidate cost per band ≈ corpus × occupancy / 2, with
    * buckets hotter than `maxBandOccupancy` degraded to star candidates
    * (root = bucket-min vec_id, so orientation keeps a_id < b_id) — see
    * [[bandRowsWithOccupancy]]. Mirrored in the DuckDB oracle.
    */
  def lshNearDup(emb: DataFrame, planes: Int = Planes,
      nBands: Int = NibbleBands,
      maxBandOccupancy: Int = Dedup.MaxBandOccupancy): DataFrame = {
    val bands = bandRowsWithOccupancy(emb, planes, nBands, maxBandOccupancy)
    Dedup.materializeFreeing(lshNearDupFrom(bands, emb), bands)
  }

  /** [[lshNearDup]] over an explicit (persisted) band relation — the
    * [[lshBandRelation]] share seam.
    */
  private[graft] def lshNearDupFrom(bands: DataFrame,
      emb: DataFrame): DataFrame = {
    val cold = bands.filter(col("hot_root").isNull)
      .select("vec_id", "q", "nib")
    val candCold = cold.as("qa")
      .join(cold.as("qb"),
        col("qa.q") === col("qb.q") && col("qa.nib") === col("qb.nib") &&
          col("qa.vec_id") < col("qb.vec_id"))
      .select(col("qa.vec_id").as("a_id"), col("qb.vec_id").as("b_id"))
    val candHot = bands
      .filter(col("hot_root").isNotNull &&
        col("vec_id") =!= col("hot_root.vec_id"))
      .select(col("hot_root.vec_id").as("a_id"), col("vec_id").as("b_id"))
    val cand = candCold.unionByName(candHot).distinct()
    scorePairs(cand, emb).filter(col("cos_sim") >= NearDupCosine)
  }

  /** SemDeDup (Abbas et al., "SemDeDup: Data-efficient learning at
    * web-scale through semantic deduplication", arXiv:2303.09540):
    * cluster-then-pairwise semantic dedup. Vectors are coarse-assigned to
    * their max-cosine IVF list (the same quantizer as [[ivfTopK]] — the
    * paper clusters precisely so the O(n²) cosine check runs within
    * clusters, never across the corpus); within a list a vector is DROPPED
    * iff some LOWER-vec_id vector among the list's `maxListOccupancy`
    * lowest ids is `tau`-similar, and `dup_of` records the lowest such id
    * (the paper keeps one exemplar per duplicate group; lowest-id-wins is
    * the deterministic keeper policy every dedup operator here uses, and
    * it lets the DuckDB oracle replay the decision bit-for-bit).
    *
    * Scale shape: one broadcast centroid assignment (linear scan), then a
    * within-list join whose EARLIER-ID side is capped at
    * `maxListOccupancy` — candidate volume per list is members × cap, not
    * members², so a degenerate corpus that lands in one list stays linear.
    * Vectors beyond a hot list's head are still checked against that head
    * (where the list's first-seen exemplars live); the production fix for
    * a persistently hot list is retraining ([[kmeansFromSeeds]]), the cap
    * is the guard that bounds the pass meanwhile. Output is one audit row
    * per vector: `(vec_id, list_id, dup_of, kept)`.
    */
  def semDedup(emb: DataFrame, tau: Double = NearDupCosine,
      kmeansIters: Int = 0,
      maxListOccupancy: Int = MaxListOccupancy): DataFrame = {
    val (out, assign) = semDedupPlan(emb, tau, kmeansIters, maxListOccupancy)
    // caching is logical-plan-keyed, so persisting the assignment fragment
    // here substitutes it into every leg of the already-built plan
    assign.persist()
    assign.count() // eager: read by the head leg, the probe leg, the output
    Dedup.materializeFreeing(out, assign)
  }

  /** The un-materialized [[semDedup]] plan plus its shared assignment leg —
    * split out so plan tests can assert the election shape before the
    * localCheckpoint flattens it.
    */
  private[graft] def semDedupPlan(emb: DataFrame, tau: Double,
      kmeansIters: Int, maxListOccupancy: Int): (DataFrame, DataFrame) = {
    val e = withNorm(emb)
    val cents =
      if (kmeansIters == 0) leaders(emb) else kmeansLeaders(emb, kmeansIters)
    val assign = assignFull(e, cents)
    // Head election runs on ID-WIDTH rows: ranking the full assignment
    // relation would sort every member's embedding of a hot list through
    // one task (the vector payload rides the sort). On (list_id, vec_id)
    // the rank-limit plans as a partial-then-final WindowGroupLimit — each
    // input partition sheds all but its local `maxListOccupancy` lowest
    // ids before the shuffle, so the per-list final pass sorts id pairs,
    // never vectors — and the elected head (≤ cap × lists rows by
    // construction) broadcasts back against the assignment to fetch
    // embeddings for the head only.
    val headIds = assign.select("list_id", "vec_id")
      .withColumn("lrnk", row_number().over(Window.partitionBy("list_id")
        .orderBy("vec_id")))
      .filter(col("lrnk") <= maxListOccupancy)
      .select("list_id", "vec_id")
    val head = assign.join(broadcast(headIds), Seq("list_id", "vec_id"))
      .select(col("list_id"), col("vec_id").as("h_id"),
        col("embedding").as("h_emb"), col("norm").as("h_norm"))
    // the head side BROADCASTS (≤ cap × lists rows by construction — the
    // same bound that makes the election collect-safe): the probe join's
    // only equi-key is list_id, whose cardinality is NumLists, so a
    // shuffled join caps parallelism at the list count — a planted
    // one-list corpus would push its every (member × head) pair through
    // ONE task. Broadcast keeps the corpus side in place at full
    // parallelism and moves no assignment rows at all.
    val dupOf = assign.as("a")
      .join(broadcast(head.as("h")),
        col("a.list_id") === col("h.list_id") &&
          col("h.h_id") < col("a.vec_id") &&
          (expr(Dedup.dot("a.embedding", "h.h_emb")) /
            (col("a.norm") * col("h.h_norm"))) >= tau)
      .groupBy(col("a.vec_id").as("vec_id"))
      .agg(min(col("h.h_id")).as("dup_of"))
    val out = assign.select("vec_id", "list_id")
      .join(dupOf, Seq("vec_id"), "left")
      .select(col("vec_id"), col("list_id"), col("dup_of"),
        col("dup_of").isNull.as("kept"))
    (out, assign)
  }

  /** Cross-set semantic contamination: corpus vectors whose cosine against
    * ANY probe-set vector clears `threshold`, with hit count and max
    * similarity as evidence — `(vec_id, n_probe_hits, max_cos)`.
    *
    * Built for the asymmetric real case (corpus = a 10^10-vector train
    * set, probe = a benchmark/eval set orders of magnitude smaller): the
    * PROBE side's band rows broadcast, so the corpus streams through one
    * broadcast hash join of id-width rows — no corpus shuffle until the
    * candidate dedup, which is bounded by genuine band collisions. A probe
    * band bucket hotter than `maxBandOccupancy` (boilerplate signature)
    * degrades to its bucket-min STAR probe — the [[lshTopK]] convention —
    * keeping candidates ≤ corpus-bands × cap. Candidates are then
    * exact-cosine verified with the probe embeddings broadcast.
    *
    * Sign-LSH candidate recall has the usual banded guarantee (hamming ≤
    * planes − planes/bands ⇒ some band equal); the [[graft.streaming]]
    * incremental variant probes a FROZEN eval set per arriving batch.
    */
  def crossSetContamination(corpusEmb: DataFrame, probeEmb: DataFrame,
      threshold: Double = NearDupCosine, planes: Int = Planes,
      nBands: Int = NibbleBands,
      maxBandOccupancy: Int = Dedup.MaxBandOccupancy): DataFrame = {
    // the probe side is broadcast-sized, but the degrade still rides
    // [[Dedup.hotBucketRoots]] for uniformity — ONE spelling of the
    // occupancy cap everywhere, so the no-bucket-windows plan assertion
    // holds without exceptions. The probe band rows localCheckpoint
    // (eager, probe-sized) because the degrade scans them twice and the
    // signature projection is `planes` dot products per row.
    val px = Dedup.hotBucketRoots(
      bandRows(probeEmb, planes, nBands).localCheckpoint(),
      Seq("q", "nib"), maxBandOccupancy, struct(col("vec_id")))
    val cold = px.filter(col("hot_root").isNull)
      .select(col("vec_id").as("b_id"), col("q"), col("nib"))
    val hot = px.filter(col("hot_root").isNotNull)
      .select(col("hot_root.vec_id").as("b_id"), col("q"), col("nib"))
      .distinct()
    val cand = bandRows(corpusEmb, planes, nBands)
      .join(broadcast(cold.unionByName(hot)), Seq("q", "nib"))
      .select(col("vec_id").as("a_id"), col("b_id")).distinct()
    cand
      .join(withNorm(corpusEmb).as("a"), col("a_id") === col("a.vec_id"))
      .join(broadcast(withNorm(probeEmb)).as("b"), col("b_id") === col("b.vec_id"))
      .select(col("a_id"), col("b_id"), cosine("a", "b"))
      .filter(col("cos_sim") >= threshold)
      .groupBy("a_id")
      .agg(count(lit(1)).as("n_probe_hits"), max("cos_sim").as("max_cos"))
      .select(col("a_id").as("vec_id"), col("n_probe_hits"), col("max_cos"))
  }
}
