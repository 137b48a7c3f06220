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
  * writes a NEW version directory `v<version>`; the `_LATEST` pointer
  * file — `<version>\n<appId>\n<batchId>` — is then swapped atomically
  * (temp + rename-with-overwrite). Readers always load through the
  * pointer, so they never observe a half-written version.
  *
  * Idempotence is keyed on (appId, batchId): a re-delivered batch —
  * Spark re-runs the in-flight batch after a restart from the SAME
  * checkpoint — sees its own appId with `batchId <= last` and is a
  * no-op. A DIFFERENT appId (fresh checkpoint, second query) is a new
  * lineage: its batches always apply, versions keep incrementing —
  * batch ids from one lineage can never silently discard another's
  * writes. Internal version numbers are decoupled from batch ids for
  * the same reason.
  *
  * Feeding this sink `KvStreaming.changeFeed` (per-op CDC rows)
  * materializes the same final state as `KvStore` batch replay —
  * UpsertSinkSpec asserts that equivalence, restart replay included.
  *
  * Scale: the merge is one shuffle on the key. [[upsertBatchBucketed]]
  * is the 100 TB form: the key space is hash-bucketed (bucket count is
  * RECORDED in the manifest and enforced — silently re-bucketing an
  * existing table would orphan rows) and a batch rewrites ONLY the
  * buckets it touches; untouched buckets carry forward as manifest
  * references. Superseded version directories are reclaimed with
  * [[vacuum]].
  */
object UpsertSink {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private final case class Pointer(version: Long, appId: String, batchId: Long)

  private def readPointer(spark: SparkSession, tableDir: String): Option[Pointer] = {
    val f = fs(spark, tableDir)
    val p = new Path(tableDir, "_LATEST")
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
      val Array(v, app, b) = text.split("\n", 3)
      Some(Pointer(v.trim.toLong, app, b.trim.toLong))
    }
  }

  /** Latest committed version, if any data version has committed. */
  def latestVersion(spark: SparkSession, tableDir: String): Option[Long] =
    readPointer(spark, tableDir).map(_.version).filter(_ >= 0)

  /** Current snapshot of a plain (non-bucketed) table; None until a
    * batch with data has committed. */
  def load(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestVersion(spark, tableDir).map(v =>
      spark.read.parquet(s"$tableDir/v$v"))

  /** Atomic small-file commit: write aside, rename-with-overwrite (plain
    * FileSystem.rename refuses an existing destination; FileContext
    * supports the atomic overwrite semantics).
    */
  private def commitFile(
      spark: SparkSession, tableDir: String, name: String, content: String): Unit = {
    val f = fs(spark, tableDir)
    f.mkdirs(new Path(tableDir))
    val tmp = new Path(tableDir, s"$name.tmp")
    val out = f.create(tmp, true)
    try out.write(content.getBytes("UTF-8")) finally out.close()
    org.apache.hadoop.fs.FileContext
      .getFileContext(new Path(tableDir).toUri, spark.sparkContext.hadoopConfiguration)
      .rename(tmp, new Path(tableDir, name),
        org.apache.hadoop.fs.Options.Rename.OVERWRITE)
  }

  private def commitPointer(
      spark: SparkSession, tableDir: String, p: Pointer): Unit =
    commitFile(spark, tableDir, "_LATEST", s"${p.version}\n${p.appId}\n${p.batchId}")

  /** True iff this (appId, batchId) was already applied — the replay
    * check shared by both sink forms. */
  private def alreadyApplied(prev: Option[Pointer], appId: String, batchId: Long): Boolean =
    prev.exists(p => p.appId == appId && batchId <= p.batchId)

  /** The foreachBatch hook. Usage (typed streams need the DataFrame
    * adapter — foreachBatch infers the Dataset's row type):
    * `stream.writeStream.foreachBatch((ds: Dataset[T], id: Long) =>
    *   UpsertSink.upsertBatch(dir)(ds.toDF(), id))`.
    * Pass a stable `appId` (e.g. the checkpoint path) when more than one
    * lineage may ever write the table.
    */
  def upsertBatch(
      tableDir: String,
      keyCol: String = "key",
      seqCol: String = "seq",
      valueCol: String = "value",
      appId: String = "default")(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = readPointer(spark, tableDir)
    if (alreadyApplied(prev, appId, batchId)) return
    val incoming = batch.select(keyCol, seqCol, valueCol)
    if (incoming.isEmpty) {
      // nothing to merge: advance the replay marker, keep the version
      commitPointer(spark, tableDir,
        Pointer(prev.map(_.version).getOrElse(-1L), appId, batchId))
      return
    }
    val merged = load(spark, tableDir) match {
      case Some(cur) => cur.unionByName(incoming)
      case None      => incoming
    }
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    val next = merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
    val version = prev.map(_.version + 1).getOrElse(0L)
    next.write.mode("overwrite").parquet(s"$tableDir/v$version")
    commitPointer(spark, tableDir, Pointer(version, appId, batchId))
  }

  // ---------- bucketed form (the 100 TB write-amplification fix) ----------

  /** Deterministic key bucket (non-negative, independent of partitioning;
    * xxhash64 is fine here — the bucket id never crosses the oracle
    * boundary). */
  private def bucketOf(keyCol: String, nBuckets: Int) =
    pmod(xxhash64(col(keyCol)), lit(nBuckets.toLong)).cast("int")

  /** Manifest for version v: first line `buckets:<n>`, then one line
    * `<bucket>:<version>` per bucket holding data. */
  private def readManifest(
      spark: SparkSession, tableDir: String, v: Long): (Int, Map[Int, Long]) = {
    val f = fs(spark, tableDir)
    val in = f.open(new Path(tableDir, s"_MANIFEST.v$v"))
    val text = try new String(in.readAllBytes(), "UTF-8") finally in.close()
    val lines = text.split("\n").filter(_.nonEmpty)
    val n = lines.head.stripPrefix("buckets:").toInt
    val entries = lines.tail.map { line =>
      val Array(b, ver) = line.split(":")
      b.toInt -> ver.toLong
    }.toMap
    (n, entries)
  }

  /** Union of the version dirs a manifest references, each filtered to
    * its assigned buckets — a version may also hold rows for buckets a
    * LATER version has since rewritten. Shared by snapshot reads and the
    * merge path. */
  private def readBuckets(
      spark: SparkSession, tableDir: String,
      entries: Map[Int, Long]): Option[DataFrame] =
    entries.groupBy(_._2).map { case (ver, es) =>
      spark.read.parquet(s"$tableDir/v$ver")
        .filter(col("bucket").isin(es.keys.toSeq: _*))
    }.reduceOption(_ unionByName _)

  /** Current snapshot of a bucketed table; None until data committed. */
  def loadBucketed(spark: SparkSession, tableDir: String): Option[DataFrame] =
    latestVersion(spark, tableDir).flatMap { v =>
      readBuckets(spark, tableDir, readManifest(spark, tableDir, v)._2)
    }

  /** Bucketed exactly-once upsert: only buckets the batch touches are
    * merged and rewritten into the next version; every other bucket's
    * manifest entry carries forward unchanged. Same (appId, batchId)
    * idempotence as [[upsertBatch]]. The table's bucket count is fixed
    * by its first batch; a mismatching `nBuckets` later fails fast
    * instead of silently splitting keys across incompatible layouts.
    */
  def upsertBatchBucketed(
      tableDir: String,
      nBuckets: Int = 16,
      keyCol: String = "key",
      seqCol: String = "seq",
      valueCol: String = "value",
      appId: String = "default")(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val prev = readPointer(spark, tableDir)
    if (alreadyApplied(prev, appId, batchId)) return
    val prevState = prev.filter(_.version >= 0)
      .map(p => readManifest(spark, tableDir, p.version))
    prevState.foreach { case (n, _) =>
      require(n == nBuckets,
        s"table at $tableDir is bucketed $n-way; refusing nBuckets=$nBuckets " +
          "(re-bucketing requires a rewrite, not a config change)")
    }
    val incoming = batch.select(keyCol, seqCol, valueCol)
      .withColumn("bucket", bucketOf(keyCol, nBuckets))
    val touched = incoming.select("bucket").distinct()
      .collect().map(_.getInt(0)).toSet
    if (touched.isEmpty) {
      commitPointer(spark, tableDir,
        Pointer(prev.map(_.version).getOrElse(-1L), appId, batchId))
      return
    }
    val prevManifest = prevState.map(_._2).getOrElse(Map.empty[Int, Long])
    val curTouched = readBuckets(spark, tableDir,
      prevManifest.filter { case (b, _) => touched(b) })
    val merged = curTouched match {
      case Some(cur) => cur.unionByName(incoming)
      case None      => incoming
    }
    val w = Window.partitionBy(keyCol).orderBy(col(seqCol).desc)
    val version = prev.map(_.version + 1).getOrElse(0L)
    merged
      .withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1)
      .drop("__rn")
      // physical layout = one partition dir per bucket, so a reader (or
      // the next merge) of bucket b scans ONLY bucket=b/ of each version
      // it references — partition pruning instead of a full-version scan
      .write.mode("overwrite").partitionBy("bucket")
      .parquet(s"$tableDir/v$version")
    val manifest = prevManifest.filter { case (b, _) => !touched(b) } ++
      touched.map(_ -> version)
    commitFile(spark, tableDir, s"_MANIFEST.v$version",
      (s"buckets:$nBuckets" +:
        manifest.toSeq.sorted.map { case (b, v) => s"$b:$v" }).mkString("\n"))
    commitPointer(spark, tableDir, Pointer(version, appId, batchId))
  }

  /** Compact a bucketed table: rewrite EVERY live bucket into one new
    * version and point the whole manifest at it. Without this, a
    * long-running stream leaves each bucket pinned at whichever version
    * last rewrote it — the manifest fans out across an unbounded set of
    * version directories, every snapshot read unions all of them, and
    * [[vacuum]] can reclaim none (each old version stays live through
    * the one bucket still referencing it). After compaction the manifest
    * references exactly one version, so a follow-up vacuum reclaims
    * everything older.
    *
    * Crash-safe by the same rule as the write path: the new version dir
    * is INVISIBLE until the manifest + `_LATEST` pointer commit (readers
    * resolve through the pointer). A compaction that dies mid-write
    * leaves a stray un-referenced `v<n+1>` dir that the next writer's
    * `mode("overwrite")` clobbers — never a torn snapshot
    * (UpsertSinkSpec restarts a compaction mid-flight to pin this).
    * The pointer keeps the previous (appId, batchId) replay marker:
    * compaction is a maintenance commit, not a batch — a re-delivered
    * micro-batch after a restart still deduplicates correctly.
    *
    * Returns the new version, or None when the table is already compact
    * (single referenced version) or has no data.
    */
  def compact(spark: SparkSession, tableDir: String): Option[Long] = {
    readPointer(spark, tableDir) match {
      // a plain (non-bucketed) table has no manifest and each version is
      // already a full snapshot — nothing to compact, vacuum suffices
      case Some(p) if p.version >= 0 &&
          fs(spark, tableDir).exists(
            new Path(tableDir, s"_MANIFEST.v${p.version}")) =>
        val (n, entries) = readManifest(spark, tableDir, p.version)
        if (entries.values.toSet == Set(p.version)) None
        else readBuckets(spark, tableDir, entries) match {
          case None => None
          case Some(snap) =>
            val newV = p.version + 1
            snap.write.mode("overwrite").partitionBy("bucket")
              .parquet(s"$tableDir/v$newV")
            commitFile(spark, tableDir, s"_MANIFEST.v$newV",
              (s"buckets:$n" +:
                entries.keys.toSeq.sorted.map(b => s"$b:$newV")).mkString("\n"))
            commitPointer(spark, tableDir, Pointer(newV, p.appId, p.batchId))
            Some(newV)
        }
      case _ => None
    }
  }

  /** Snapshot pinned to a specific committed version — the time-travel
    * read the retention grace window exists for: a reader that resolved
    * `_LATEST` (or deliberately pinned an older version for a
    * reproducible job) keeps resolving as long as [[vacuum]]'s window
    * covers that version. Bucketed tables resolve through their
    * version's manifest (which may reference still-older version dirs —
    * the retention window protects those transitively); plain tables
    * read the version dir directly. None once the version has been
    * vacuumed away.
    */
  def loadVersion(spark: SparkSession, tableDir: String, version: Long): Option[DataFrame] = {
    val f = fs(spark, tableDir)
    if (version < 0) None
    else if (f.exists(new Path(tableDir, s"_MANIFEST.v$version"))) {
      val (_, entries) = readManifest(spark, tableDir, version)
      // a vacuum outside the retention window may have reclaimed a dir
      // this manifest still references (the manifest itself survives
      // while its own version dir is pinned by a newer manifest):
      // resolve to a clean None instead of a plan that fails at collect
      if (entries.values.toSet.forall(v => f.exists(new Path(tableDir, s"v$v"))))
        readBuckets(spark, tableDir, entries)
      else None
    } else if (f.exists(new Path(tableDir, s"v$version")))
      Some(spark.read.parquet(s"$tableDir/v$version"))
    else None
  }

  /** Reclaim version directories (and manifests) no longer reachable
    * from the latest commit, subject to a retention grace window:
    *
    *  - `keepLast`: the most recent `keepLast` superseded versions stay
    *    on disk even when unreferenced — a reader that resolved the
    *    pointer just before a new commit (or pinned a version via
    *    [[loadVersion]]) keeps resolving for `keepLast` more commits.
    *  - `minAgeMs`: versions younger than this are never reclaimed —
    *    the age-based form of the same contract, for tables where
    *    "commits" arrive in bursts and a count window is no bound on
    *    wall-clock reader lifetime.
    *
    * Liveness is computed transitively: every retained version's
    * manifest pins the versions IT references, so a pinned bucketed
    * snapshot never loses a carried-forward bucket out from under it.
    * The defaults (0, 0) reclaim everything unreferenced by the latest
    * commit — the spec-pinned historical behavior; production streams
    * should pass a window at least as long as their slowest reader.
    * Safe to run concurrently with writers: only versions strictly
    * older than the latest commit are candidates. Returns the removed
    * version numbers.
    */
  def vacuum(
      spark: SparkSession,
      tableDir: String,
      keepLast: Int = 0,
      minAgeMs: Long = 0L): Seq[Long] = {
    val f = fs(spark, tableDir)
    readPointer(spark, tableDir) match {
      case None => Seq.empty
      case Some(p) =>
        val versions = f.listStatus(new Path(tableDir)).toSeq
          .map(_.getPath.getName)
          .filter(_.matches("v\\d+"))
          .map(_.drop(1).toLong)
        val now = System.currentTimeMillis()
        def young(v: Long): Boolean = minAgeMs > 0 &&
          now - f.getFileStatus(new Path(tableDir, s"v$v"))
            .getModificationTime < minAgeMs
        // retention roots: the latest commit, the keepLast most recent
        // EXISTING superseded versions (selected from the listing, not
        // by version arithmetic — numbering may be sparse after a crash
        // or partial manual cleanup, and the window must still cover
        // keepLast real versions), and every superseded version inside
        // the age window
        val kept = versions.filter(_ < p.version).sorted.takeRight(keepLast).toSet
        val roots = versions.filter(v =>
          v == p.version || kept(v) || (v < p.version && young(v)))
        val live: Set[Long] =
          if (p.version < 0) Set.empty
          else roots.flatMap { r =>
            if (f.exists(new Path(tableDir, s"_MANIFEST.v$r")))
              readManifest(spark, tableDir, r)._2.values.toSet + r
            else Set(r)
          }.toSet
        val dead = versions.filter(v => v < p.version && !live(v)).sorted
        dead.foreach { v =>
          f.delete(new Path(tableDir, s"v$v"), true)
          f.delete(new Path(tableDir, s"_MANIFEST.v$v"), false)
        }
        dead
    }
  }
}
