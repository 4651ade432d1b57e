package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Shared local session for all suites (getOrCreate ⇒ one JVM-wide session;
  * sbt forks a single test JVM).
  */
trait SparkSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkSession.builder()
    .master("local[4]")
    .config("spark.sql.extensions", "graft.functions.GraftExtensions")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.sql.warehouse.dir",
      java.nio.file.Files.createTempDirectory("graft-warehouse").toString)
    .config("spark.sql.session.timeZone", "UTC")
    .config("spark.ui.enabled", "false")
    .getOrCreate()

  lazy val sf: String = sys.env.getOrElse("GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")

  /** Land one parquet FILE for a streaming file source — the shared
    * [[TempDirs.landOne]] idiom (scratch staging swept at exit).
    */
  def landParquet(landing: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit =
    TempDirs.landOne(df, landing.toString, name)
}
