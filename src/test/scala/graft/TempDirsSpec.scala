package graft

import java.nio.file.Files

import scala.jdk.CollectionConverters._

import org.apache.spark.sql.Row
import org.apache.spark.sql.types.{LongType, StringType, StructField, StructType}

/** The landing helper's contract: every landOne call leaves exactly one
  * readable parquet FILE under the requested name — including for an
  * empty frame — and never leaks the staging listing.
  */
class TempDirsSpec extends SparkSpec {

  private val schema = StructType(Seq(
    StructField("id", LongType), StructField("s", StringType)))

  test("landOne lands one readable file for a non-empty frame") {
    val landing = Files.createTempDirectory("td-land")
    val df = spark.createDataFrame(
      Seq(Row(1L, "a"), Row(2L, "b")).asJava, schema)
    TempDirs.landOne(df, landing.toString, "x.parquet")
    val back = spark.read.parquet(landing.resolve("x.parquet").toString)
    assert(back.count() == 2L)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("landOne lands a schema-bearing file for an EMPTY frame") {
    val landing = Files.createTempDirectory("td-land-empty")
    val df = spark.createDataFrame(
      java.util.Collections.emptyList[Row](), schema)
    TempDirs.landOne(df, landing.toString, "empty.parquet")
    val back = spark.read.parquet(landing.resolve("empty.parquet").toString)
    assert(back.count() == 0L)
    assert(back.schema.fieldNames.toSeq == Seq("id", "s"))
  }

  test("repeated landings under the same name overwrite, not accumulate") {
    val landing = Files.createTempDirectory("td-land-over")
    val a = spark.createDataFrame(Seq(Row(1L, "a")).asJava, schema)
    val b = spark.createDataFrame(Seq(Row(2L, "b"), Row(3L, "c")).asJava, schema)
    TempDirs.landOne(a, landing.toString, "y.parquet")
    TempDirs.landOne(b, landing.toString, "y.parquet")
    val back = spark.read.parquet(landing.resolve("y.parquet").toString)
    assert(back.count() == 2L)
    assert(TempDirs.listFiles(landing).size == 1)
  }
}
