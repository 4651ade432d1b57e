package graft

/** Scratch directories for battery demos and soak legs: created like
  * `Files.createTempDirectory`, but swept by one JVM shutdown hook so a
  * battery + soak run leaves /tmp as it found it. The dirs must OUTLIVE
  * the creating call — a memoized demo root (the era-feed walk) is read
  * by queries that run long after the walk built it, and a soak leg's
  * store is probed across timed runs — so a `finally` delete at the call
  * site would be wrong; process exit is the correct lifetime.
  */
object TempDirs {

  private val created =
    new java.util.concurrent.ConcurrentLinkedQueue[java.nio.file.Path]()

  private lazy val hookInstalled: Unit =
    Runtime.getRuntime.addShutdownHook(new Thread(() => {
      created.forEach { p =>
        try deleteRecursively(p)
        catch { case _: Throwable => () } // best-effort sweep at exit
      }
    }))

  private def deleteRecursively(p: java.nio.file.Path): Unit =
    if (java.nio.file.Files.exists(p)) {
      import scala.jdk.CollectionConverters._
      val walk = java.nio.file.Files.walk(p)
      try walk.iterator().asScala.toSeq.reverseIterator
        .foreach(f => java.nio.file.Files.deleteIfExists(f))
      finally walk.close()
    }

  /** A fresh scratch directory, registered for the exit-time sweep. */
  def scratch(prefix: String): java.nio.file.Path = {
    hookInstalled
    val p = java.nio.file.Files.createTempDirectory(prefix)
    created.add(p)
    p
  }

  /** List a directory's entries eagerly, CLOSING the underlying stream.
    * `Files.list`/`Files.walk` hold an open directory descriptor until
    * closed; a long test run that leaks one per landing can exhaust the
    * process fd limit on hosts with a low ulimit.
    */
  def listFiles(dir: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.list(dir)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** Walk a tree eagerly (depth-first, parents before children),
    * closing the stream — see [[listFiles]].
    */
  def walkFiles(root: java.nio.file.Path): Seq[java.nio.file.Path] = {
    import scala.jdk.CollectionConverters._
    val s = java.nio.file.Files.walk(root)
    try s.iterator().asScala.toSeq
    finally s.close()
  }

  /** Land one parquet FILE for a streaming file source (which does not
    * recurse into the directory a DataFrame write produces): stage the
    * frame as a single-part directory in scratch space, then copy the
    * part file into the landing dir under `name`. The ONE spelling of
    * the idiom — the battery's walked runbooks, the soak's drain-grown
    * stores, and the specs all land through here.
    */
  def landOne(df: org.apache.spark.sql.DataFrame, landing: String,
      name: String): Unit = {
    def writeAndFind(frame: org.apache.spark.sql.DataFrame)
        : Option[java.nio.file.Path] = {
      val stage = scratch("graft-land")
      frame.coalesce(1).write.mode("overwrite").parquet(stage.toString)
      listFiles(stage).find(_.getFileName.toString.endsWith(".parquet"))
    }
    // coalesce(1) over a zero-partition frame writes no part file at
    // all; repartition(1) always materializes exactly one.
    val part = writeAndFind(df)
      .orElse(writeAndFind(df.repartition(1)))
      .getOrElse(throw new IllegalStateException(
        s"landOne($landing, $name): staged write produced no parquet part file"))
    java.nio.file.Files.createDirectories(java.nio.file.Paths.get(landing))
    java.nio.file.Files.copy(part, java.nio.file.Paths.get(landing, name),
      java.nio.file.StandardCopyOption.REPLACE_EXISTING)
    ()
  }
}
