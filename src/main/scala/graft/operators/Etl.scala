package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
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

  /** Z-order value of two non-negative int columns: interleave the low
    * `bits` bits (a even positions, b odd). Sorting by this before write
    * clusters rows so parquet min/max row-group stats prune on EITHER
    * column — the standard multi-column data-skipping layout at scale.
    * Pure bit arithmetic (shift/or), codegen'd, ANSI-safe.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      shiftleft(shiftright(a.cast("long"), i).bitwiseAND(1L), 2 * i)
        .bitwiseOR(
          shiftleft(shiftright(b.cast("long"), i).bitwiseAND(1L), 2 * i + 1))
    }.reduce((x, y) => x.bitwiseOR(y))

  /** Z-order clustered write: range-partition + sort by the interleaved
    * key, so each output file covers a compact rectangle in (a, b) space.
    */
  def writeZOrdered(
      df: DataFrame,
      path: String,
      colA: String,
      colB: String,
      files: Int = 8): Unit =
    df.withColumn("__z", zValue(col(colA), col(colB)))
      .repartitionByRange(files, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write.mode("overwrite").parquet(path)

  /** Write `df` as ONE reproducible global random permutation — the
    * trainer-feed step after `Scale.hashSplit`: range-partition on the
    * content hash md5(id|salt) and sort within partitions, so file k's
    * hash range ends before file k+1's begins and a sequential reader of
    * the part files in name order consumes exactly the md5 permutation.
    * No single-partition sort anywhere (the ORDER BY rand() equivalent
    * would pull the corpus into one task or leave file order undefined);
    * same salt + same ids ⇒ byte-identical layout on any cluster.
    */
  def writeShuffled(
      df: DataFrame,
      path: String,
      idCol: String,
      salt: String,
      files: Int = 8): Unit =
    df.withColumn("__h", md5(concat(col(idCol).cast("string"), lit("|" + salt))))
      .repartitionByRange(files, col("__h"))
      .sortWithinPartitions("__h")
      .drop("__h")
      .write.mode("overwrite").parquet(path)
}
