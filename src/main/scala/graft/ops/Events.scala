package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Event-stream operators over the `events` table
  * (event_id, ts, user_id, event_type, value, props-JSON) — the batch forms
  * of the classic streaming workloads: tumbling/hopping time windows,
  * gap-based sessionization, funnel attribution, per-window top-k, and
  * semi-structured JSON extraction.
  *
  * These are written as ordinary DataFrame transforms so Catalyst plans them
  * (and the DuckDB oracle can replay them); [[graft.streaming.EventStream]]
  * runs the same window/session logic under Structured Streaming with
  * watermarks and state.
  *
  * Scale shape: every operator shuffles once on its natural key
  * (window-bucket, user_id, or day). Sessionization partitions by user_id —
  * at 100 TB that is the canonical high-cardinality repartition, with AQE
  * handling hot users; no global windows anywhere.
  */
object Events {

  val SessionGapMinutes = 30
  private val GapMicros: Long = SessionGapMinutes * 60L * 1000000L
  val DailyTopK = 3

  /** Per-user event-time ordering; event_id breaks exact-timestamp ties so
    * the running session index is deterministic across engines.
    */
  private val byUserTime = Window.partitionBy("user_id").orderBy("ts", "event_id")

  /** Tumbling 1-hour windows × event_type: counts, distinct users, value
    * stats. Uses Spark's `window()` (epoch-aligned buckets).
    */
  def hourly(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour"), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        countDistinct(col("user_id")).as("n_users"),
        sum(col("value")).as("sum_value"))
      .select(col("window.start").as("hour_start"),
        col("window.end").as("hour_end"),
        col("event_type"), col("n_events"), col("n_users"), col("sum_value"))

  /** Hopping windows (1 h length, 30 min slide) — each event lands in
    * exactly two buckets.
    */
  def hopping(events: DataFrame): DataFrame =
    events.groupBy(window(col("ts"), "1 hour", "30 minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("window.start").as("win_start"),
        col("window.end").as("win_end"),
        col("n_events"), col("sum_value"))

  /** Gap-based sessionization: a new session starts after
    * [[SessionGapMinutes]] of inactivity; one output row per
    * (user, session) with bounds and totals.
    */
  def sessionize(events: DataFrame): DataFrame =
    events
      .withColumn("us", unix_micros(col("ts")))
      .withColumn("prev_us", lag(col("us"), 1).over(byUserTime))
      .withColumn("is_new",
        when(col("prev_us").isNull || col("us") - col("prev_us") > GapMicros, 1)
          .otherwise(0))
      .withColumn("session_idx", sum(col("is_new"))
        .over(byUserTime.rowsBetween(Window.unboundedPreceding, 0)))
      .groupBy(col("user_id"), col("session_idx"))
      .agg(min(col("ts")).as("session_start"), max(col("ts")).as("session_end"),
        count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"),
        countDistinct(col("event_type")).as("n_event_types"))

  /** Ordered view → click → purchase funnel per user: each stage's earliest
    * qualifying timestamp must follow the previous stage's.
    */
  def funnel(events: DataFrame): DataFrame = {
    val v = events.filter(col("event_type") === "view")
      .groupBy("user_id").agg(min("ts").as("view_ts"))
    val c = events.filter(col("event_type") === "click")
      .join(v, "user_id").filter(col("ts") > col("view_ts"))
      .groupBy("user_id").agg(min("ts").as("click_ts"))
    val p = events.filter(col("event_type") === "purchase")
      .join(c, "user_id").filter(col("ts") > col("click_ts"))
      .groupBy("user_id").agg(min("ts").as("purchase_ts"))
    events.select("user_id").distinct()
      .join(v, Seq("user_id"), "left")
      .join(c, Seq("user_id"), "left")
      .join(p, Seq("user_id"), "left")
      .withColumn("reached_stage",
        when(col("purchase_ts").isNotNull, 3)
          .when(col("click_ts").isNotNull, 2)
          .when(col("view_ts").isNotNull, 1)
          .otherwise(0))
  }

  /** Top-k event types per day by count (count DESC, type ASC tiebreak). */
  def dailyTypeTopK(events: DataFrame, k: Int = DailyTopK): DataFrame =
    events.groupBy(to_date(col("ts")).as("day"), col("event_type"))
      .agg(count(lit(1)).as("n_events"))
      .withColumn("rank", row_number().over(Window.partitionBy("day")
        .orderBy(col("n_events").desc, col("event_type"))))
      .filter(col("rank") <= k)

  /** Semi-structured extraction from the JSON props payload. */
  def jsonProps(events: DataFrame): DataFrame =
    events.select(col("event_id"),
      get_json_object(col("props"), "$.k").cast("bigint").as("prop_k"))

  /** Sketch-based daily distinct users: HyperLogLog++ only. At 100 TB
    * exact COUNT(DISTINCT) shuffles every (day, user) pair; the HLL sketch
    * is a few KB per day, merges associatively in partial aggregation, and
    * never moves raw ids. Keeping the exact count alongside would reinstate
    * the very shuffle the sketch avoids — the accuracy contract lives in
    * the spec, which compares against a separately computed exact count.
    * No DuckDB oracle: sketch estimates are implementation-defined.
    */
  def dailyUsersApprox(events: DataFrame, rsd: Double = 0.02): DataFrame =
    events.groupBy(col("ts").cast("date").as("day"))
      .agg(approx_count_distinct(col("user_id"), rsd).as("n_users_approx"))

  /** Exact twin of [[dailyUsersApprox]] — correctness baseline for specs. */
  def dailyUsersExact(events: DataFrame): DataFrame =
    events.groupBy(col("ts").cast("date").as("day"))
      .agg(countDistinct(col("user_id")).as("n_users_exact"))

  /** Sketch-based value quantiles per event type (Greenwald-Khanna via
    * `percentile_approx`): mergeable partial sketches, no global sort — the
    * scale path for percentile dashboards. Spec-bounded against the exact
    * twin; no DuckDB oracle (sketch estimates are implementation-defined).
    */
  val QuantilePoints: Seq[Double] = Seq(0.5, 0.95, 0.99)

  private def quantileCols(suffix: String) =
    QuantilePoints.zipWithIndex.map { case (q, i) =>
      col("q")(i).as(s"p${(q * 100).toInt}_$suffix")
    }

  def valueQuantilesApprox(events: DataFrame,
      accuracy: Int = 10000): DataFrame =
    events.groupBy("event_type")
      .agg(percentile_approx(col("value"),
        array(QuantilePoints.map(lit): _*), lit(accuracy)).as("q"))
      .select(col("event_type") +: quantileCols("approx"): _*)

  /** Exact twin of [[valueQuantilesApprox]] (single-node sort per group —
    * correctness baseline only).
    */
  def valueQuantilesExact(events: DataFrame): DataFrame =
    events.groupBy("event_type")
      .agg(expr(s"percentile(value, array(${QuantilePoints.mkString("D, ")}D))")
        .as("q"))
      .select(col("event_type") +: quantileCols("exact"): _*)

  /** Driver-checkable accuracy gate for [[dailyUsersApprox]]: the number
    * of days whose HLL estimate misses the exact count by more than
    * `bound` relative error (5× the 0.02 rsd — a hard ceiling that still
    * catches a broken sketch). Both sides are deterministic aggregations
    * of the same input, so the result is a CONSTANT zero row and the
    * DuckDB oracle is that constant — which turns the driver's
    * hash-compare into a real accuracy assertion at the driver's own
    * scale, where the sketch estimate itself is implementation-defined
    * and cannot be oracle'd directly.
    */
  def dailyUsersApproxErr(events: DataFrame, rsd: Double = 0.02,
      bound: Double = 0.10): DataFrame =
    dailyUsersApprox(events, rsd)
      .join(dailyUsersExact(events), Seq("day"))
      .agg(coalesce(sum(when(
        abs(col("n_users_approx") - col("n_users_exact")) /
          col("n_users_exact") > bound, 1L).otherwise(0L)), lit(0L))
        .as("n_violations"))

  /** Driver-checkable accuracy gate for [[valueQuantilesApprox]]: the
    * number of (event_type, quantile) outputs whose returned value sits
    * more than `tol` away in RANK from the requested quantile —
    * Greenwald-Khanna's guarantee is rank error, not value error (value
    * distance to the interpolated exact percentile is unbounded on sparse
    * tails). Rank is computed against the full value multiset with one
    * aggregate per (type, point) — a 3-point gate query, one extra pass
    * over events. Constant zero row; oracle'd as the constant (see
    * [[dailyUsersApproxErr]]).
    */
  def valueQuantilesApproxErr(events: DataFrame,
      tol: Double = 0.02): DataFrame = {
    val long = valueQuantilesApprox(events)
      .select(col("event_type"), explode(array(QuantilePoints.map(q =>
        struct(lit(q).as("q"),
          col(s"p${(q * 100).toInt}_approx").as("a"))): _*)).as("qa"))
      .select(col("event_type"), col("qa.q").as("q"), col("qa.a").as("a"))
    // broadcast the 3-rows-per-type side explicitly: event_type has FEW
    // distinct values, so a stats-misestimated shuffle join here would
    // funnel each type through one reducer
    events.select("event_type", "value").join(broadcast(long), Seq("event_type"))
      .groupBy("event_type", "q", "a")
      .agg((sum(when(col("value") <= col("a"), 1L).otherwise(0L)) /
        count(lit(1))).as("rank"))
      .agg(coalesce(sum(when(abs(col("rank") - col("q")) > tol, 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  // ---------------------------------------------------------------- //
  // Count-Min frequency sketch — the third mergeable summary next to  //
  // HLL (cardinality) and GK (quantiles): per-key FREQUENCY.          //
  // ---------------------------------------------------------------- //

  /** CMS shape: eps bounds the overestimate at eps x stream length with
    * probability `confidence` per query (Cormode & Muthukrishnan,
    * J. Algorithms 2005); the seed pins the hash family so the sketch is
    * deterministic and partitioning-invariant (counters are purely
    * additive, the estimate a min over depth rows).
    */
  val CmsEps = 0.001
  val CmsConfidence = 0.999
  val CmsSeed = 42

  /** Every `stride`-th user is the fixed probe set of the frequency
    * gates — the [[graft.ops.Retrieval]] fixed-query-batch convention.
    */
  val CmsProbeStride = 7

  /** ONE Count-Min sketch over every user_id plus the sketch's add
    * count: a ~160 KB mergeable summary built in one pass with partial
    * aggregation — at 100 TB per-key frequency questions answer from
    * this blob instead of a shuffle of every occurrence, the same
    * contract as [[dailyUsersApprox]]'s HLL. `n_events` counts NON-NULL
    * user_ids — exactly what the sketch ingests (`count_min_sketch`
    * skips nulls), so it equals the merged sketch's totalCount (the
    * store-fold invariant) and is the N in the eps x N error bound. No
    * DuckDB oracle: sketch bytes are implementation-defined.
    */
  def userCountsSketch(events: DataFrame): DataFrame =
    events.agg(
      expr(s"count_min_sketch(user_id, ${CmsEps}d, ${CmsConfidence}d, " +
        s"$CmsSeed)").as("cms"),
      count(col("user_id")).as("n_events"))

  /** Exact per-user counts over the probe set — correctness baseline and
    * DuckDB-oracled twin.
    */
  def userCountsExact(events: DataFrame,
      stride: Int = CmsProbeStride): DataFrame =
    events.filter(col("user_id") % stride === 0)
      .groupBy("user_id").agg(count(lit(1)).as("n_events"))

  /** The one place the sketch's byte format is handled — every reader
    * (the gate's broadcast estimator, the streaming store's merge/fold)
    * goes through this pair.
    */
  private[graft] def cmsFromBytes(bytes: Array[Byte])
      : org.apache.spark.util.sketch.CountMinSketch =
    org.apache.spark.util.sketch.CountMinSketch.readFrom(
      new java.io.ByteArrayInputStream(bytes))

  private[graft] def cmsToBytes(
      cms: org.apache.spark.util.sketch.CountMinSketch): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    cms.writeTo(out)
    out.toByteArray
  }

  /** Estimate-at-probe: the deserialized sketch rides to executors as a
    * broadcast and answers per-row, so the probe relation never funnels
    * through the driver — the one `collect` is the 1-row sketch itself,
    * which is the point of a mergeable summary (it IS the driver-sized
    * aggregate). Deserialization is once per executor via the transient
    * lazy val, not per row.
    */
  private class CmsEstimator(bytes: Array[Byte]) extends Serializable {
    @transient private lazy val cms = cmsFromBytes(bytes)
    def estimate(id: Long): Long = cms.estimateCount(id)
  }

  /** Per-probe-user estimates of an EXPLICIT sketch row next to the
    * exact counts: `(user_id, n_events, n_events_cms)` — the seam the
    * streaming store's merged sketch shares with the batch gate.
    */
  def comparedWith(events: DataFrame, cmsBytes: Array[Byte],
      stride: Int = CmsProbeStride): DataFrame = {
    val bc = events.sparkSession.sparkContext
      .broadcast(new CmsEstimator(cmsBytes))
    val cmsOf = udf((id: Long) => bc.value.estimate(id))
    userCountsExact(events, stride)
      .withColumn("n_events_cms", cmsOf(col("user_id")))
  }

  /** Per-probe-user CMS estimates next to the exact counts:
    * `(user_id, n_events, n_events_cms)`.
    */
  def userCountsCompared(events: DataFrame,
      stride: Int = CmsProbeStride): DataFrame =
    comparedWith(events,
      userCountsSketch(events).collect().head.getAs[Array[Byte]]("cms"),
      stride)

  /** Driver-checkable accuracy gate for the frequency sketch, the
    * [[dailyUsersApproxErr]] pattern: probe users whose estimate breaks
    * either CMS guarantee — an UNDERESTIMATE (structurally impossible in
    * a correct sketch: counters only ever add) or an overestimate past
    * `boundFactor` x eps x N (eps x N holds per query at 99.9%
    * confidence; 3x is exceeded with probability ~2^-30, a hard ceiling
    * that still catches a broken hash family). Deterministic, so the
    * DuckDB oracle is the constant zero row and the driver's
    * hash-compare is a real accuracy assertion. One sketch pass: the
    * collected 1-row summary feeds both the estimates and the eps x N
    * bound.
    */
  def userCountsCmsErr(events: DataFrame,
      stride: Int = CmsProbeStride, boundFactor: Int = 3): DataFrame = {
    val sk = userCountsSketch(events).collect().head
    val bound = boundFactor.toLong *
      math.ceil(CmsEps * sk.getLong(1)).toLong
    comparedWith(events, sk.getAs[Array[Byte]]("cms"), stride)
      .agg(coalesce(sum(when(
        col("n_events_cms") < col("n_events") ||
          col("n_events_cms") > col("n_events") + bound, 1L)
        .otherwise(0L)), lit(0L)).as("n_violations"))
  }

  /** Cohort retention: users grouped by first-activity day; for each
    * (cohort, day-offset) the distinct active users and the retention
    * rate. Two shuffles (per-user first day, then cohort × day counts);
    * the rate division is exact IEEE on integer operands.
    */
  def retention(events: DataFrame): DataFrame = {
    val firstDay = events.groupBy("user_id")
      .agg(min(to_date(col("ts"))).as("cohort_day"))
    val sizes = firstDay.groupBy("cohort_day")
      .agg(countDistinct(col("user_id")).as("cohort_size"))
    events.select(col("user_id"), to_date(col("ts")).as("activity_day"))
      .distinct()
      .join(firstDay, Seq("user_id"))
      .withColumn("day_offset", datediff(col("activity_day"), col("cohort_day")).cast("long"))
      .groupBy("cohort_day", "day_offset")
      .agg(countDistinct(col("user_id")).as("n_active"))
      .join(sizes, Seq("cohort_day"))
      .withColumn("retention_rate",
        col("n_active").cast("double") / col("cohort_size"))
  }

  /** Gap sessionization via Spark's native `session_window` (the same
    * grouping [[sessionize]] derives with lag+cumsum, usable unchanged
    * under Structured Streaming). The window end is last_event + gap by
    * definition; `n_events`/`sum_value` match the lag-based rows.
    */
  def sessionWindows(events: DataFrame): DataFrame =
    events.groupBy(col("user_id"),
        session_window(col("ts"), s"$SessionGapMinutes minutes"))
      .agg(count(lit(1)).as("n_events"), sum(col("value")).as("sum_value"))
      .select(col("user_id"),
        col("session_window.start").as("session_start"),
        col("session_window.end").as("window_end"),
        col("n_events"), col("sum_value"))
}
