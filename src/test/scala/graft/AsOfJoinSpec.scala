package graft

import org.apache.spark.sql.functions._

import graft.ops.AsOfJoin

/** Union-window as-of join semantics. */
class AsOfJoinSpec extends SparkSpec {

  test("asof: latest right at-or-before left time, per key; no match -> null") {
    import spark.implicits._
    val left = Seq(("u1", 5L), ("u1", 10L), ("u1", 25L), ("u2", 7L))
      .toDF("k", "t")
    val right = Seq(("u1", 8L, "a"), ("u1", 20L, "b"), ("u2", 9L, "c"))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("payload"))
      .orderBy("k", "t").collect()
    assert(out.map(r => (r.getString(0), r.getLong(1), r.getString(2))).toSeq == Seq(
      ("u1", 5L, null), // before any right row
      ("u1", 10L, "a"),
      ("u1", 25L, "b"),
      ("u2", 7L, null))) // u2's right row is later; keys are isolated
  }

  test("asof boundary is inclusive: equal timestamps match") {
    import spark.implicits._
    val left = Seq(("k", 10L)).toDF("k", "t")
    val right = Seq(("k", 10L, "exact")).toDF("k", "t", "payload")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("payload")).head()
    assert(out.getAs[String]("payload") == "exact")
  }

  test("asof tolerance: matches staler than the bound null out") {
    import spark.implicits._
    val left = Seq(("k", 10L), ("k", 30L)).toDF("k", "t")
    val right = Seq(("k", 8L, "a")).toDF("k", "t", "payload")
    val out = AsOfJoin.asofJoinTolerance(left, right, Seq("k"), "t", "t",
        Seq("payload"), toleranceMicros = Some(5L))
      .orderBy("t").collect()
    assert(out(0).getAs[String]("payload") == "a") // 10-8=2 <= 5
    assert(out(1).getAs[String]("payload") == null) // 30-8=22 > 5
  }

  test("asof rejects mixed left/right time column types with a named error") {
    import spark.implicits._
    val left = Seq(("k", 10L)).toDF("k", "t")
    val right = Seq(("k", java.sql.Timestamp.valueOf("2024-01-01 00:00:00"), "a"))
      .toDF("k", "t", "payload")
    val ex = intercept[IllegalArgumentException](
      AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("payload")))
    assert(ex.getMessage.contains("bigint") && ex.getMessage.contains("timestamp"),
      ex.getMessage)
  }

  test("asof matches the newest right ROW even when its payload is null") {
    import spark.implicits._
    // right row at t=20 carries a legitimately NULL payload; the match must
    // surface that null, not carry the older t=8 value forward
    val left = Seq(("k", 25L)).toDF("k", "t")
    val right = Seq(("k", 8L, Some("old")), ("k", 20L, Option.empty[String]))
      .toDF("k", "t", "payload")
    val out = AsOfJoin.asofJoin(left, right, Seq("k"), "t", "t", Seq("payload")).head()
    assert(out.getAs[String]("payload") == null)
  }
}
