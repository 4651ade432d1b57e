package graft.pipeline

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** dbt-style model DAG runner (SURVEY §3.2 port).
  *
  * A [[Model]] is (name, deps, materialization, build fn). `View` nodes stay
  * LAZY DataFrames — exactly a dbt view: Catalyst inlines them into
  * downstream plans and collapses projections/filters across the boundary
  * (dbt materialization config reference
  * `dbt/stock_analytics/dbt_project.yml:55-65`). `Table` nodes write
  * Parquet and re-read, cutting lineage like a dbt table. `Incremental`
  * nodes MERGE a recomputed recent slice by trade_date partition overwrite.
  *
  * Scale notes: table/incremental writes repartition on `clusterBy` and
  * sort within partitions — the Spark analogue of the reference's
  * `cluster_by=['ticker']` (`models/marts/fct_trading_momentum.sql:5`),
  * keeping per-ticker scans one-file-touch. Incremental materialization
  * rewrites ONLY the partitions present in the slice (dynamic partition
  * overwrite), so daily cost is proportional to the 4-day lookback window,
  * not history.
  */
object Pipeline {

  sealed trait Materialization
  case object View extends Materialization
  case object Table extends Materialization
  /** MERGE-by-partition: `slice` must contain ALL rows of each trade_date
    * partition it touches (true for the reference's lookback recompute).
    */
  case object Incremental extends Materialization

  /** `contract` is the dbt `on_schema_change='fail'` analogue (reference
    * `models/intermediate/int_russell3000__daily.sql:6`,
    * `models/marts/fct_trading_momentum.sql:6`): when declared, the built
    * frame's schema is checked BEFORE any write, so upstream drift fails
    * fast, named at the model that detected it, instead of surfacing as a
    * corrupt mart or a far-downstream analysis error.
    */
  final case class Model(
    name: String,
    deps: Seq[String],
    materialization: Materialization,
    clusterBy: Seq[String] = Nil,
    contract: Option[StructType] = None,
    build: Map[String, DataFrame] => DataFrame)

  /** Column names (case-insensitive, in declared order) and types must match
    * exactly; nullability is NOT contracted — Spark tightens and loosens it
    * through joins/coalesce and parquet round-trips don't preserve it.
    */
  private def enforceContract(name: String, actual: StructType, contract: StructType): Unit = {
    def sig(s: StructType): Seq[(String, String)] =
      s.fields.toSeq.map(f => (f.name.toLowerCase, f.dataType.simpleString))
    if (sig(actual) != sig(contract)) {
      def render(s: StructType) =
        sig(s).map { case (n, t) => s"$n $t" }.mkString(", ")
      throw new IllegalStateException(
        s"schema contract violation in model '$name' (on_schema_change=fail)\n" +
          s"  declared: ${render(contract)}\n  actual:   ${render(actual)}")
    }
  }

  /** Kahn topological order; fails fast on unknown deps or cycles. */
  def topoOrder(models: Seq[Model]): Seq[Model] = {
    val byName = models.map(m => m.name -> m).toMap
    models.flatMap(_.deps).find(!byName.contains(_))
      .foreach(d => throw new IllegalArgumentException(s"unknown dependency: $d"))
    val order = scala.collection.mutable.ListBuffer.empty[Model]
    val done = scala.collection.mutable.Set.empty[String]
    val visiting = scala.collection.mutable.Set.empty[String]
    def visit(m: Model): Unit =
      if (!done(m.name)) {
        if (!visiting.add(m.name))
          throw new IllegalArgumentException(s"dependency cycle at ${m.name}")
        m.deps.foreach(d => visit(byName(d)))
        visiting.remove(m.name)
        done += m.name
        order += m
      }
    models.foreach(visit)
    order.toSeq
  }

  private def clustered(df: DataFrame, clusterBy: Seq[String]): DataFrame =
    if (clusterBy.isEmpty) df
    else df.repartition(clusterBy.map(col): _*)
      .sortWithinPartitions(clusterBy.map(col): _*)

  /** Run the DAG; returns each model's resolved DataFrame (lazy for views,
    * freshly-read for tables).
    */
  def run(spark: SparkSession, models: Seq[Model], storeDir: String): Map[String, DataFrame] = {
    var resolved = Map.empty[String, DataFrame]
    topoOrder(models).foreach { m =>
      val inputs = m.deps.map(d => d -> resolved(d)).toMap
      val df = m.build(inputs)
      m.contract.foreach(c => enforceContract(m.name, df.schema, c))
      val out = m.materialization match {
        case View => df
        case Table =>
          val path = s"$storeDir/${m.name}"
          clustered(df, m.clusterBy).write.mode(SaveMode.Overwrite).parquet(path)
          spark.read.parquet(path)
        case Incremental =>
          val path = s"$storeDir/${m.name}"
          // date-aware layout: co-locate each trade_date in one task (file
          // count ≈ dates, not tasks × dates), rows sorted by the cluster
          // key within each date's file
          val arranged =
            df.repartition(col("trade_date"))
              .sortWithinPartitions(("trade_date" +: m.clusterBy).map(col): _*)
          MergeWriter.mergeByDatePartition(spark, arranged, path)
          spark.read.parquet(path)
      }
      resolved += m.name -> out
    }
    resolved
  }
}

/** Partition-level MERGE: the reference's incremental upsert on
  * (ticker, trade_date) with a 4-day lookback
  * (`models/intermediate/int_russell3000__daily.sql:3-7,19-26`) always
  * recomputes WHOLE dates, so merging = overwrite exactly the trade_date
  * partitions present in the slice. Dynamic partition overwrite does that
  * in one write, idempotently, with no row-level merge shuffle — at 100 TB
  * this is the difference between touching 4 partitions and re-sorting the
  * table.
  */
object MergeWriter {

  def mergeByDatePartition(spark: SparkSession, slice: DataFrame, path: String,
      partitionCol: String = "trade_date"): Unit = {
    val prev = spark.conf.getOption("spark.sql.sources.partitionOverwriteMode")
    spark.conf.set("spark.sql.sources.partitionOverwriteMode", "dynamic")
    try slice.write.mode(SaveMode.Overwrite).partitionBy(partitionCol).parquet(path)
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.sources.partitionOverwriteMode", v)
      case None => spark.conf.unset("spark.sql.sources.partitionOverwriteMode")
    }
  }
}
