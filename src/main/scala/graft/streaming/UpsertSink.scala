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
  * Scale: the merge is one shuffle on the key. [[upsertBatchBucketed]]
  * is the 100 TB form: the key space is hash-bucketed and a batch
  * rewrites ONLY the buckets it touches (untouched buckets are carried
  * into the new version as references, not data) — write amplification
  * drops from O(table) to O(touched buckets) while the commit protocol
  * (versioned manifest + atomic pointer swap) is unchanged.
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
    commitPointer(spark, tableDir, "_LATEST", batchId.toString)
  }

  /** Atomic small-file commit: write aside, rename-with-overwrite (plain
    * FileSystem.rename refuses an existing destination; FileContext
    * supports the atomic overwrite semantics).
    */
  private def commitPointer(
      spark: SparkSession, tableDir: String, name: String, content: String): Unit = {
    val f = fs(spark, tableDir)
    val tmp = new Path(tableDir, s"$name.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(tableDir).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(tableDir, name),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  // ---------- bucketed form (the 100 TB write-amplification fix) ----------

  /** Deterministic key bucket (non-negative, engine-independent of
    * partitioning; xxhash64 is fine here — the bucket id never crosses
    * the oracle boundary). */
  private def bucketOf(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int")

  /** Manifest for version v: one line `<bucket>:<version>` per bucket —
    * which version directory holds each bucket's current data. */
  private def readManifest(
      spark: SparkSession, tableDir: String, v: Long): Map[Int, Long] = {
    val f = fs(spark, tableDir)
    val in = f.open(new Path(tableDir, s"_MANIFEST.v$v"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    text.split("\n").filter(_.nonEmpty).map { line =>
      val Array(b, ver) = line.split(":")
      b.toInt -> ver.toLong
    }.toMap
  }

  /** Load the current snapshot of a bucketed table. Each version dir is
    * filtered to the buckets the manifest assigns to it — a version may
    * also hold rows for buckets a LATER version has since rewritten.
    */
  def loadBucketed(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestVersion(spark, tableDir).map { v =>
      readManifest(spark, tableDir, v)
        .groupBy(_._2).map { case (ver, entries) =>
          spark.read.parquet(s"$tableDir/v$ver")
            .filter(col("bucket").isin(entries.keys.toSeq: _*))
        }.reduce(_ unionByName _)
    }

  /** Bucketed exactly-once upsert: only buckets the batch touches are
    * merged and rewritten into `v<batchId>`; every other bucket's
    * manifest entry carries forward unchanged. Same idempotence contract
    * as [[upsertBatch]].
    */
  def upsertBatchBucketed(
      tableDir: String,
      nBuckets: Int = 16,
      keyCol: String = "key",
      seqCol: String = "seq",
      valueCol: String = "value")(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val committed = latestVersion(spark, tableDir)
    if (committed.exists(batchId <= _)) return // replayed batch: no-op
    val incoming = batch.select(keyCol, seqCol, valueCol)
      .withColumn("bucket", bucketOf(keyCol, nBuckets))
    val touched = incoming.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    val prevManifest = committed.map(readManifest(spark, tableDir, _))
      .getOrElse(Map.empty[Int, Long])
    // current rows of ONLY the touched buckets
    val curTouched = prevManifest.filter { case (b, _) => touched(b) }
      .groupBy(_._2).map { case (ver, entries) =>
        spark.read.parquet(s"$tableDir/v$ver")
          .filter(col("bucket").isin(entries.keys.toSeq: _*))
      }.reduceOption(_ unionByName _)
    val merged = curTouched match {
      case Some(cur) => cur.unionByName(incoming)
      case None      => incoming
    }
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      .write.mode("overwrite").parquet(s"$tableDir/v$batchId")
    val manifest = prevManifest.filter { case (b, _) => !touched(b) } ++
      touched.map(_ -> batchId)
    commitPointer(spark, tableDir, s"_MANIFEST.v$batchId",
      manifest.toSeq.sorted.map { case (b, v) => s"$b:$v" }.mkString("\n"))
    commitPointer(spark, tableDir, "_LATEST", batchId.toString)
  }
}
