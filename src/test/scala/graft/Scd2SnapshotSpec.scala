package graft

import java.sql.Timestamp

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.pipeline.Scd2Snapshot
import graft.pipeline.Scd2Snapshot.{ValidFrom, ValidTo}

/** dbt check-strategy snapshot semantics over three runs. */
class Scd2SnapshotSpec extends SparkSpec {

  private val t1 = Timestamp.valueOf("2024-01-01 12:00:00")
  private val t2 = Timestamp.valueOf("2024-02-01 12:00:00")
  private val t3 = Timestamp.valueOf("2024-03-01 12:00:00")

  private def src(rows: (String, String, Double)*): DataFrame = {
    import spark.implicits._
    rows.toDF("ticker", "sector", "weight")
  }

  test("check strategy: change closes and reopens; new inserts; missing stays open") {
    val keys = Seq("ticker")
    val check = Seq("sector", "weight")

    val s1 = Scd2Snapshot.initialize(src(("AAPL", "Tech", 6.5), ("XOM", "Energy", 1.2)), t1)
    assert(s1.count() == 2 && s1.filter(col(ValidTo).isNotNull).count() == 0)

    // run 2: AAPL weight changes; XOM vanishes (soft delete -> stays open); NVDA appears
    val s2 = Scd2Snapshot.advance(s1,
      src(("AAPL", "Tech", 7.0), ("NVDA", "Tech", 3.0)), keys, check, t2).cache()
    assert(s2.count() == 4)
    val aaplClosed = s2.filter(col("ticker") === "AAPL" && col(ValidTo).isNotNull).head()
    assert(aaplClosed.getAs[Double]("weight") == 6.5)
    assert(aaplClosed.getAs[Timestamp](ValidTo) == t2)
    val aaplOpen = s2.filter(col("ticker") === "AAPL" && col(ValidTo).isNull).head()
    assert(aaplOpen.getAs[Double]("weight") == 7.0)
    assert(aaplOpen.getAs[Timestamp](ValidFrom) == t2)
    assert(s2.filter(col("ticker") === "XOM" && col(ValidTo).isNull).count() == 1)
    assert(s2.filter(col("ticker") === "NVDA" && col(ValidTo).isNull).count() == 1)

    // run 3 with identical source: NO new versions (idempotent on no-change)
    val s3 = Scd2Snapshot.advance(s2,
      src(("AAPL", "Tech", 7.0), ("NVDA", "Tech", 3.0)), keys, check, t3)
    assert(s3.count() == 4)
    assert(s3.filter(col(ValidFrom) === t3).count() == 0)

    // validity chains don't overlap per key: closed.valid_to == next.valid_from
    val aapl = s2.filter(col("ticker") === "AAPL")
      .orderBy(ValidFrom).collect()
    assert(aapl(0).getAs[Timestamp](ValidTo) == aapl(1).getAs[Timestamp](ValidFrom))
  }

  test("null-safe comparison: null -> value and value -> null are changes; null -> null is not") {
    import spark.implicits._
    val keys = Seq("ticker")
    val check = Seq("sector")
    val s1 = Scd2Snapshot.initialize(
      Seq(("A", null: String), ("B", "X"), ("C", null: String)).toDF("ticker", "sector"), t1)
    val s2 = Scd2Snapshot.advance(s1,
      Seq(("A", "Y"), ("B", null: String), ("C", null: String)).toDF("ticker", "sector"),
      keys, check, t2)
    assert(s2.filter(col("ticker") === "A").count() == 2) // null -> Y changed
    assert(s2.filter(col("ticker") === "B").count() == 2) // X -> null changed
    assert(s2.filter(col("ticker") === "C").count() == 1) // null -> null unchanged
  }
}
