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

  /** Write a small metadata file (store markers, generation manifests).
    * The name should start with `_` so Spark's file listing and partition
    * discovery ignore it. Creation-with-overwrite of a single small file
    * is the closest thing to an atomic pointer swap a plain filesystem
    * offers — HDFS renames/creates are atomic, object stores make
    * single-key PUTs atomic.
    */
  def writeSmallFile(spark: SparkSession, p: String, content: String): Unit = {
    val hp = new Path(p)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    val out = fs.create(hp, true)
    try out.write(content.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    finally out.close()
  }

  /** Read a small metadata file written by [[writeSmallFile]]; None when
    * absent.
    */
  def readSmallFile(spark: SparkSession, p: String): Option[String] = {
    val hp = new Path(p)
    val fs = hp.getFileSystem(spark.sessionState.newHadoopConf())
    if (!fs.exists(hp)) None
    else {
      val in = fs.open(hp)
      try {
        val bytes = new java.io.ByteArrayOutputStream()
        val buf = new Array[Byte](4096)
        var n = in.read(buf)
        while (n >= 0) { bytes.write(buf, 0, n); n = in.read(buf) }
        Some(new String(bytes.toByteArray,
          java.nio.charset.StandardCharsets.UTF_8))
      } finally in.close()
    }
  }
}
