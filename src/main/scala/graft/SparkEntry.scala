package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.catalog.QueryDef

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * The query catalog is assembled from per-domain modules; each entry
  * carries its own DuckDB oracle SQL where SQL-expressible.
  */
object SparkEntry {

  /** All catalog entries, in registration order. */
  def catalog: Seq[QueryDef] =
    graft.operators.RelationalQueries.defs ++
      graft.operators.TextMrQueries.defs ++
      graft.operators.KvQueries.defs ++
      graft.operators.PipelineQueries.defs ++
      graft.operators.StreamMediaQueries.defs ++
      graft.operators.AnalyticsQueries.defs ++
      graft.operators.AuditQueries.defs ++
      graft.operators.CurationQueries.defs ++
      graft.operators.ScienceQueries.defs

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    catalog.head.fn(spark, "/root/testdata/sf0.001")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    catalog.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] =
    catalog.flatMap(q => q.oracle.map(q.name -> _)).toMap

  /** Subset used by Bench as the headline perf suite. */
  def headlines: Seq[QueryDef] = {
    val h = catalog.filter(_.headline)
    if (h.nonEmpty) h else catalog.take(4)
  }
}
