package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** ETL write-path utilities: the disk layouts that make 100 TB readable.
  *
  *  - `writePartitioned`: hive-style partition directories; queries that
  *    filter on the partition column prune entire directories at plan
  *    time (PartitionFilters — zero I/O for pruned partitions).
  *  - `writeSortedParquet`: clusters rows by a column within each file so
  *    parquet row-group min/max statistics skip non-matching groups for
  *    range predicates on that column.
  *  - `compact`: coalesce a many-small-files dataset to `n` output files
  *    (the periodic maintenance job every streaming sink needs).
  */
object Etl {

  def writePartitioned(
      df: DataFrame,
      path: String,
      partitionCol: String): Unit =
    df.write.mode("overwrite").partitionBy(partitionCol).parquet(path)

  def writeSortedParquet(
      df: DataFrame,
      path: String,
      sortCol: String,
      files: Int = 1): Unit =
    df.repartition(files)
      .sortWithinPartitions(sortCol)
      .write.mode("overwrite").parquet(path)

  def compact(spark: SparkSession, inPath: String, outPath: String, n: Int): Unit =
    spark.read.parquet(inPath).coalesce(n)
      .write.mode("overwrite").parquet(outPath)
}
