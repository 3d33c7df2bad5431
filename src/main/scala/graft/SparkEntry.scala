package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.core.GQuery
import graft.queries._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * All capabilities are declared as [[graft.core.GQuery]] values grouped by
  * suite; this object just flattens the registry into the maps the driver
  * consumes (duplicate names fail fast in `GQuery.registry`).
  */
object SparkEntry {

  val registry: Seq[GQuery] = GQuery.registry(
    Relational.defs,
    ThemisOps.defs,
    TextPipeline.defs,
    Similarity.defs,
    Iterative.defs,
    SortOps.defs,
    GraphText.defs,
    // binary decode isn't SQL-expressible → rows-only driver check
    Seq(GQuery("q_media_features",
      graft.operators.Multimodal.mediaFeatureStats _, None)))

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    Relational.pricingSummary(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    registry.map(q => q.name -> q.run).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    registry.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Names Bench times at sf0.1. */
  def headlines: Seq[String] = registry.filter(_.headline).map(_.name)
}
