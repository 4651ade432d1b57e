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

  /** Land one parquet FILE for a streaming file source (which does not
    * recurse into the directory a DataFrame write produces).
    */
  def landParquet(landing: java.nio.file.Path, name: String,
      df: org.apache.spark.sql.DataFrame): Unit = {
    import scala.jdk.CollectionConverters._
    val stage = java.nio.file.Files.createTempDirectory("land-stage")
      .resolve("d")
    df.coalesce(1).write.mode("overwrite").parquet(stage.toString)
    val part = java.nio.file.Files.list(stage).iterator().asScala
      .find(_.getFileName.toString.endsWith(".parquet")).get
    java.nio.file.Files.copy(part, landing.resolve(name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
  }
}
