package graft.streaming

import graft.dedup.Dedup
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Streaming NEAR-duplicate dedup: the `foreachBatch` production shape,
  * where each micro-batch is deduplicated against every document kept in
  * any earlier batch, via a persisted MinHash band-bucket store.
  *
  * Why not a stateful streaming operator: near-dup needs a candidate
  * JOIN against all history (any prior doc sharing an LSH band bucket),
  * which doesn't fit per-key `GroupState` — the key (bucket) maps to
  * unbounded member sets and a doc spans `bands` keys. The standard
  * answer is foreachBatch + a persistent index, exactly like the
  * exactly-once upsert sink ([[UpsertSink]]) — batch-granular, restart
  * safe, and every step a plain distributed join.
  *
  * Store layout (under `storeDir`): `buckets/batch=N/` holds
  * (doc_id, band, bucket) rows and `sigs/batch=N/` holds (doc_id, sig)
  * for the docs KEPT in batch N. Idempotence needs no transaction log:
  * a re-delivered batch N (restart replay) reads only batches < N and
  * OVERWRITES its own `batch=N` dirs, reproducing identical output —
  * the directory is the commit. Readers of batch N's decisions are
  * unaffected by any in-flight rewrite of batch M > N.
  *
  * Decision rule (signature-estimate gated — history texts are not
  * retained, so the exact verify stage of the batch pipeline is
  * deliberately traded for O(signature) state):
  *  - drop a doc if it LSH-collides with a KEPT doc from an earlier
  *    batch and the MinHash jaccard estimate ≥ threshold;
  *  - within a batch, drop the larger doc_id of any estimated-near-dup
  *    candidate pair (keep-min, deterministic on any partitioning);
  *  - everything else is kept and indexed.
  * Estimator std is sqrt(j(1-j)/H) ≈ 0.04 at H=96, j=0.8 — the
  * streaming contract is a recall/precision band around the threshold,
  * vs the batch pipeline's exact verify. Callers needing exactness run
  * the batch `Dedup.nearDupPairs` as a compaction pass.
  *
  * Scale: per batch, ONE shuffle joins batch band-buckets to the store
  * (both sides keyed (band, bucket)); store size is O(kept docs ×
  * bands) rows of three longs plus one sig array per doc — the texts
  * themselves never enter the store.
  */
object NearDupStream {

  /** Returns the kept subset of `batch`, deciding against (and NOT yet
    * writing) the store — the pure core, used by [[dedupBatch]] and
    * directly testable.
    */
  def keptAgainstStore(
      spark: SparkSession,
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      numHashes: Int = 96,
      bands: Int = 32): DataFrame =
    decide(spark, storeDir, batch, batchId, idCol, textCol,
      threshold, numHashes, bands)._1

  /** (kept docs, ALL batch signatures — checkpointed) so dedupBatch can
    * index the kept docs without re-running the minhash scan.
    */
  private def decide(
      spark: SparkSession,
      storeDir: String,
      batch: DataFrame,
      batchId: Long,
      idCol: String,
      textCol: String,
      threshold: Double,
      numHashes: Int,
      bands: Int): (DataFrame, DataFrame) = {
    val sigs = Dedup.minHashSignatures(batch, idCol, textCol, 3, numHashes)
      .localCheckpoint() // sig scan feeds every consumer below; cut once
    val banded = Dedup.bandBuckets(sigs, idCol, bands)
      .select(col(idCol), col("band"), col("bucket"))

    // history = banded index + sigs of every batch strictly before this
    // one (re-delivery of batch N must not see N's own half-written dirs)
    val (histBuckets, histSigs) =
      readStore(spark, storeDir, batchId, idCol, batch.schema(idCol).dataType)

    val dropHist = banded
      .join(histBuckets.withColumnRenamed(idCol, "old_id"), Seq("band", "bucket"))
      .select(col(idCol), col("old_id")).distinct()
      .join(sigs.withColumnRenamed("sig", "sig_new"), idCol)
      .join(histSigs.withColumnRenamed(idCol, "old_id")
        .withColumnRenamed("sig", "sig_old"), "old_id")
      .filter(estimate(col("sig_new"), col("sig_old")) >= threshold)
      .select(col(idCol)).distinct()

    // within-batch: estimated near-dup pairs → keep-min (drop id_b side)
    val dropLocal = Dedup.lshCandidatesWithSigs(sigs, idCol, bands)
      .filter(estimate(col("sig_a"), col("sig_b")) >= threshold)
      .select(col("id_b").as(idCol)).distinct()

    (batch.join(dropHist.union(dropLocal).distinct(), Seq(idCol), "left_anti"),
      sigs)
  }

  /** foreachBatch body: dedup `batch` against the store, append the kept
    * docs' index to the store (idempotent overwrite of this batch's
    * dirs), and write the kept documents to `outDir/batch=N`.
    */
  def dedupBatch(
      storeDir: String,
      outDir: String,
      idCol: String = "doc_id",
      textCol: String = "text",
      threshold: Double = 0.8,
      numHashes: Int = 96,
      bands: Int = 32)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val (keptRaw, sigs) = decide(spark, storeDir, batch, batchId,
      idCol, textCol, threshold, numHashes, bands)
    val kept = keptRaw
      .localCheckpoint() // decisions must not recompute after store writes
    // kept docs' signatures come from the already-checkpointed batch
    // sigs (semi-join on kept ids) — NOT a second minhash scan
    val keptSigs = sigs.join(kept.select(idCol), Seq(idCol), "left_semi")
    Dedup.bandBuckets(keptSigs, idCol, bands)
      .select(col(idCol), col("band"), col("bucket"))
      .write.mode(SaveMode.Overwrite).parquet(s"$storeDir/buckets/batch=$batchId")
    keptSigs.write.mode(SaveMode.Overwrite).parquet(s"$storeDir/sigs/batch=$batchId")
    kept.write.mode(SaveMode.Overwrite).parquet(s"$outDir/batch=$batchId")
  }

  /** Compact the store: merge all batch dirs strictly below `upTo` into
    * a single consolidated batch dir (named `batch=<maxMerged>`), so the
    * per-batch file count stops growing with stream lifetime — the
    * maintenance pass every foreachBatch sink needs ([[UpsertSink]]'s
    * vacuum is the same idea). Decisions are unaffected: the merged dir
    * holds exactly the union of the merged batches' rows and keeps a
    * batch id below `upTo`, so future batches read the same history.
    *
    * Run BETWEEN batches (it rewrites dirs that concurrent deciders
    * would read). Crash safety — NO window loses history:
    *  1. recover any interrupted previous compaction (below);
    *  2. write the consolidated dir (holding EVERY merged row) to
    *     `_compact_tmp`;
    *  3. rename the colliding source dir ASIDE to `_compact_old_batch=N`
    *     (atomic, not a delete);
    *  4. promote `_compact_tmp` → `batch=N` (atomic, checked);
    *  5. delete the aside dir and the other merged sources.
    * A crash between 3 and 4 is undone by recovery (the aside dir is
    * renamed back because `batch=N` is missing); a crash after 4 leaves
    * duplicate rows across dirs, which the decision joins tolerate
    * (collision candidates dedup on doc id before the estimate gate) and
    * the next compaction merges away. Stale `_compact_tmp` dirs are
    * deleted by recovery — by then either promotion completed (tmp is
    * gone) or the sources are all still present.
    */
  def compactStore(spark: SparkSession, storeDir: String, upTo: Long): Unit = {
    Seq("buckets", "sigs").foreach { sub =>
      val root = new java.io.File(s"$storeDir/$sub")
      def dirs(prefix: String) = Option(root.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith(prefix))
      // recovery from an interrupted run
      dirs("_compact_old_batch=").foreach { aside =>
        val target = new java.io.File(root, aside.getName.stripPrefix("_compact_old_"))
        if (!target.exists()) require(aside.renameTo(target),
          s"compactStore recovery: failed to restore $aside")
        else deleteRec(aside) // promotion had completed; aside is a duplicate
      }
      dirs("_compact_tmp").foreach(deleteRec)

      val parts = dirs("batch=")
        .filter(_.getName.stripPrefix("batch=").toLong < upTo)
      if (parts.length > 1) {
        val maxId = parts.map(_.getName.stripPrefix("batch=").toLong).max
        val tmp = new java.io.File(root, "_compact_tmp")
        spark.read.parquet(parts.map(_.getPath).toIndexedSeq: _*)
          .write.mode(SaveMode.Overwrite).parquet(tmp.getPath)
        val target = new java.io.File(root, s"batch=$maxId")
        val aside = new java.io.File(root, s"_compact_old_batch=$maxId")
        require(target.renameTo(aside),
          s"compactStore: failed to move $target aside")
        require(tmp.renameTo(target),
          s"compactStore: failed to promote $tmp to $target")
        deleteRec(aside)
        parts.filter(_.getName != s"batch=$maxId").foreach(deleteRec)
      }
    }
  }

  private def deleteRec(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRec)
    f.delete()
  }

  /** Fraction of equal MinHash components — the jaccard estimator. */
  private def estimate(a: org.apache.spark.sql.Column, b: org.apache.spark.sql.Column) =
    aggregate(zip_with(a, b, (x, y) => when(x === y, 1).otherwise(0)),
      lit(0), (acc, x) => acc + x).cast("double") / size(a).cast("double")

  private def readStore(
      spark: SparkSession,
      storeDir: String,
      beforeBatch: Long,
      idCol: String,
      idType: org.apache.spark.sql.types.DataType): (DataFrame, DataFrame) = {
    import org.apache.spark.sql.types._
    // empty-store schemas carry the CALLER's id type — a hardcoded
    // BIGINT would type the first batch's joins differently from every
    // later batch when ids are strings
    def read(sub: String, rest: Seq[StructField]): DataFrame = {
      val dir = new java.io.File(s"$storeDir/$sub")
      val parts = Option(dir.listFiles()).getOrElse(Array.empty)
        .filter(f => f.isDirectory && f.getName.startsWith("batch="))
        .filter(_.getName.stripPrefix("batch=").toLong < beforeBatch)
        .map(_.getPath)
      if (parts.isEmpty) spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row],
        StructType(StructField(idCol, idType) +: rest))
      else spark.read.parquet(parts.toIndexedSeq: _*)
    }
    (read("buckets", Seq(StructField("band", IntegerType),
      StructField("bucket", LongType))),
      read("sigs", Seq(StructField("sig", ArrayType(LongType)))))
  }
}
