package graft

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The custom running-EWMA window function (graft.functions.Ewma). */
class EwmaSpec extends SparkSpec {

  test("running ewma recursion: seed on first value, nulls carry state") {
    import spark.implicits._
    val df = Seq(
      ("A", 1, Some(10.0)), ("A", 2, None), ("A", 3, Some(20.0)), ("A", 4, Some(30.0)),
      ("B", 1, None), ("B", 2, Some(5.0)))
      .toDF("k", "i", "x")
    val w = Window.partitionBy("k").orderBy("i")
    val out = df.withColumn("e", expr("graft_ewma(x, CAST(0.5 AS DOUBLE))").over(w))
      .orderBy("k", "i").collect()
    def e(i: Int): Any = out(i).get(out(i).fieldIndex("e"))
    assert(e(0) == 10.0) // seed
    assert(e(1) == 10.0) // null carries
    assert(e(2) == 0.5 * 20.0 + 0.5 * 10.0) // 15.0
    assert(e(3) == 0.5 * 30.0 + 0.5 * 15.0) // 22.5
    assert(e(4) == null) // B: leading null -> no state yet
    assert(e(5) == 5.0) // B seeds late
  }

  test("alpha=1 tracks the input; alpha=0 freezes the seed") {
    import spark.implicits._
    val df = Seq(("A", 1, 3.0), ("A", 2, 7.0), ("A", 3, 11.0)).toDF("k", "i", "x")
    val w = Window.partitionBy("k").orderBy("i")
    val r = df
      .withColumn("track", expr("graft_ewma(x, CAST(1.0 AS DOUBLE))").over(w))
      .withColumn("frozen", expr("graft_ewma(x, CAST(0.0 AS DOUBLE))").over(w))
      .orderBy("i").collect()
    assert(r.map(_.getAs[Double]("track")).toSeq == Seq(3.0, 7.0, 11.0))
    assert(r.map(_.getAs[Double]("frozen")).toSeq == Seq(3.0, 3.0, 3.0))
  }
}
