package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed keys — the manual fallback when AQE's
  * skew-join split isn't available (e.g. the skewed side is mid-sized and
  * the other side can't broadcast).
  *
  * The skewed (probe) side gets a deterministic salt in [0, salts); the
  * build side is replicated once per salt value; the join key becomes
  * (keys..., salt), spreading each hot key over `salts` reducers. Replication
  * multiplies the build side `salts`× — size it so
  * `|build| * salts / shufflePartitions` stays executor-resident.
  */
object SkewJoin {

  val SaltCol = "__graft_salt"

  /** @param saltBy deterministic expression over `skewed`'s columns used to
    *   derive the salt (e.g. a row id, or `hash` of high-cardinality cols);
    *   using a DETERMINISTIC salt (not `rand()`) keeps retried tasks and
    *   oracle replays stable.
    */
  def saltedJoin(
      skewed: DataFrame,
      build: DataFrame,
      keys: Seq[String],
      salts: Int,
      saltBy: Column,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, "salts must be positive")
    // Replicating the build side salts× preserves semantics only when each
    // build row may match multiple times or not at all from the PROBE side's
    // perspective. For right/full outer (or right_semi/anti), unmatched
    // build rows would surface once per salt replica — silently duplicated.
    val canonical = joinType.toLowerCase.replace("_", "")
    val supported = // all probe-side-preserving spellings Spark accepts
      Set("inner", "left", "leftouter", "semi", "leftsemi", "anti",
        "leftanti", "cross")
    require(supported.contains(canonical),
      s"saltedJoin supports inner/left/left_semi/left_anti/cross, got '$joinType' " +
        "(right/full outer would duplicate unmatched build rows per salt replica)")
    val l = skewed.withColumn(SaltCol, pmod(saltBy.cast("long"), lit(salts.toLong)))
    val r = build.withColumn(SaltCol,
      explode(sequence(lit(0L), lit(salts.toLong - 1))))
    l.join(r, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
