package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Filesystem-probe helper shared by the streaming store maintainers
  * ([[IncrementalMartStream]], [[IncrementalCuration]]) — one place to fix
  * scheme handling for every bootstrap-vs-increment branch.
  */
private[streaming] object StoragePaths {
  def exists(spark: SparkSession, p: String): Boolean = {
    val hp = new Path(p)
    hp.getFileSystem(spark.sessionState.newHadoopConf()).exists(hp)
  }
}
