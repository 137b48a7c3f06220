package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Exactly-once keyed upsert sink for `writeStream.foreachBatch`: a
  * last-write-wins (by `seqCol`) key→value table maintained as versioned
  * parquet commits.
  *
  * Protocol (a minimal transaction log, the same idea production table
  * formats use): each micro-batch merges into the current snapshot and
  * writes a NEW version directory `v<batchId>`; the `_LATEST` pointer
  * file is then swapped atomically (temp + rename). A replayed batch —
  * Spark re-delivers the in-flight batch after a restart — sees
  * `batchId <= latest` and is a no-op, which is exactly the idempotence
  * foreachBatch needs for end-to-end exactly-once on a
  * non-transactional store. Readers always load through `_LATEST`, so
  * they never observe a half-written version.
  *
  * Feeding this sink `KvStreaming.changeFeed` (per-op CDC rows)
  * materializes the same final state as `KvStore` batch replay —
  * UpsertSinkSpec asserts that equivalence, restart replay included.
  *
  * Scale: the merge is one shuffle on the key; a 100 TB deployment swaps
  * the full-snapshot rewrite for partitioned rewrites (hash-bucket the
  * key space, rewrite only buckets the batch touches) — the commit
  * protocol is unchanged.
  */
object UpsertSink {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  /** Latest committed batch id, if any. */
  def latestVersion(spark: SparkSession, tableDir: String): Option[Long] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir, "_LATEST")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(in.readAllBytes(), "UTF-8").trim.toLong)
      finally in.close()
    }
  }

  /** Current snapshot (empty schema-less read is the caller's concern —
    * returns None when no version has committed yet). */
  def load(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestVersion(spark, tableDir).map(v =>
      spark.read.parquet(s"$tableDir/v$v"))

  /** The foreachBatch hook. Usage (typed streams need the DataFrame
    * adapter — foreachBatch infers the Dataset's row type):
    * `stream.writeStream.foreachBatch((ds: Dataset[T], id: Long) =>
    *   UpsertSink.upsertBatch(dir)(ds.toDF(), id))`.
    */
  def upsertBatch(
      tableDir: String,
      keyCol: String = "key",
      seqCol: String = "seq",
      valueCol: String = "value")(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val committed = latestVersion(spark, tableDir)
    if (committed.exists(batchId <= _)) return // replayed batch: no-op
    val incoming = batch.select(keyCol, seqCol, valueCol)
    val merged = load(spark, tableDir) match {
      case Some(cur) => cur.unionByName(incoming)
      case None      => incoming
    }
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    val next = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    next.write.mode("overwrite").parquet(s"$tableDir/v$batchId")
    // atomic pointer swap: write aside, rename-with-overwrite (plain
    // FileSystem.rename refuses an existing destination; FileContext
    // supports the atomic overwrite semantics)
    val f = fs(spark, tableDir)
    val tmp = new Path(tableDir, s"_LATEST.tmp$batchId")
    val out = f.create(tmp, true)
    try out.write(batchId.toString.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(tableDir).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(tableDir, "_LATEST"),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }
}
