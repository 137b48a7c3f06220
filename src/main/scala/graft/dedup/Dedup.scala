package graft.dedup

import graft.textops.TextAnalysis
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for training-data pipelines, all expressed as
  * shuffle-lean DataFrame pipelines over built-in (codegen'd) functions:
  *
  *  - exact: hash-groupBy on content digest — one shuffle, partial agg.
  *  - MinHash + LSH: shingle → H independent min-hashes → band → bucket
  *    join. Candidate generation never compares all pairs: docs only meet
  *    inside an LSH bucket, so cost is Σ bucket² instead of n² — the only
  *    approach that survives 100 TB.
  *  - SimHash: 64-bit sign-of-weighted-sums sketch; near-dups differ in
  *    few bits; bucketing on bit-bands gives the same n²-avoidance.
  *  - n-gram Jaccard: exact verification stage for LSH candidates.
  *
  * Determinism: all hashing is xxhash64 (fixed seed), so results are
  * stable across runs/partitionings.
  */
object Dedup {

  // ---------- exact ----------

  /** Content-hash dedup groups: one row per distinct text, the kept
    * (minimum) id, and the duplicate count. At scale this is a single
    * hash-partitioned aggregation on the 32-byte digest, never on the
    * full text.
    */
  def exactGroups(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame =
    docs.groupBy(md5(col(textCol)).as("fp"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  /** Keep-first exact dedup: drops all but the min-id copy of each text. */
  def exactDedup(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val keep = exactGroups(docs, idCol, textCol).select(col("keep_id").as(idCol))
    docs.join(keep, idCol)
  }

  // ---------- MinHash + LSH ----------

  /** MinHash signature: for each of `numHashes` seeded hash functions,
    * the min over the doc's `k`-token shingles. Computed by exploding
    * shingles and taking `numHashes` min-aggregates — partial (map-side)
    * aggregation keeps the shuffle proportional to docs × H, not tokens.
    */
  def minHashSignatures(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
      numHashes: Int = 64): DataFrame = {
    val sh = docs.select(col(idCol),
      explode(TextAnalysis.shingles(col(textCol), k)).as("shingle"))
    val minCols = (0 until numHashes).map(i =>
      min(xxhash64(lit(i), col("shingle"))).as(s"h$i"))
    sh.groupBy(col(idCol))
      .agg(minCols.head, minCols.tail: _*)
      .select(col(idCol), array((0 until numHashes).map(i => col(s"h$i")): _*).as("sig"))
  }

  /** LSH candidate pairs: split the signature into `bands` bands of
    * H/bands rows; docs sharing any band-hash land in one bucket and form
    * candidate pairs (a < b). Pair emission is bounded per bucket — a
    * giant bucket (degenerate shingles) would explode quadratically, so
    * buckets above `maxBucket` are dropped (logged upstream if needed) —
    * the standard skew guard at scale.
    */
  def lshCandidates(
      signatures: DataFrame,
      idCol: String = "doc_id",
      bands: Int = 16,
      maxBucket: Int = 1000): DataFrame = {
    val numHashes = 64 // matches minHashSignatures default H
    val rows = numHashes / bands
    val banded = signatures.select(
      col(idCol),
      posexplode(transform(sequence(lit(0), lit(bands - 1)),
        b => xxhash64(lit("band"), b, concat_ws(",",
          transform(slice(col("sig"), b * rows + 1, lit(rows)), _.cast("string"))))))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"), col(idCol).as("id_a"))
    val b = banded.select(col("band"), col("bucket"), col(idCol).as("id_b"))
    val small = a.groupBy("band", "bucket").count()
      .filter(col("count") <= maxBucket).drop("count")
    a.join(small, Seq("band", "bucket"))
      .join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** Exact n-gram Jaccard for (id_a, id_b) candidate pairs: distinct
    * shingle sets joined on shingle — shared count over union size.
    */
  def ngramJaccard(
      docs: DataFrame,
      pairs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3): DataFrame = {
    val sh = docs.select(col(idCol).as("id"),
      explode(array_distinct(TextAnalysis.shingles(col(textCol), k))).as("shingle"))
    val sizes = sh.groupBy("id").agg(count(lit(1)).as("n"))
    val shA = sh.select(col("id").as("id_a"), col("shingle"))
    val shB = sh.select(col("id").as("id_b"), col("shingle"))
    pairs
      .join(shA, "id_a")
      .join(shB, Seq("id_b", "shingle"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("shared"))
      .join(sizes.withColumnRenamed("id", "id_a").withColumnRenamed("n", "n_a"), "id_a")
      .join(sizes.withColumnRenamed("id", "id_b").withColumnRenamed("n", "n_b"), "id_b")
      .withColumn("jaccard",
        round(col("shared").cast("double") /
          (col("n_a") + col("n_b") - col("shared")).cast("double"), 4))
      .select("id_a", "id_b", "jaccard")
  }

  /** MinHash near-dup pipeline: LSH candidates filtered by exact Jaccard. */
  def nearDupPairs(
      docs: DataFrame,
      idCol: String = "doc_id",
      textCol: String = "text",
      k: Int = 3,
      threshold: Double = 0.8): DataFrame = {
    val sigs = minHashSignatures(docs, idCol, textCol, k)
    val cands = lshCandidates(sigs, idCol)
    ngramJaccard(docs, cands, idCol, textCol, k)
      .filter(col("jaccard") >= threshold)
  }

  // ---------- SimHash ----------

  /** 64-bit SimHash: per token-hash bit, sum +1/-1 across the doc's
    * tokens; the sign vector packed into a long. Near-dup docs differ in
    * few bits. Computed with 64 conditional sums after an explode —
    * partial aggregation applies, one shuffle of 64 longs per doc.
    */
  def simHash(docs: DataFrame, idCol: String = "doc_id", textCol: String = "text"): DataFrame = {
    val toks = docs.select(col(idCol),
      explode(TextAnalysis.wsTokens(col(textCol))).as("tok"))
      .withColumn("h", xxhash64(col("tok")))
    val bitSums = (0 until 64).map(b =>
      sum(when(shiftright(col("h"), b).bitwiseAND(1) === 1, 1).otherwise(-1)).as(s"b$b"))
    val agg = toks.groupBy(col(idCol)).agg(bitSums.head, bitSums.tail: _*)
    val packed = (0 until 64).map(b =>
      when(col(s"b$b") > 0, shiftleft(lit(1L), b)).otherwise(0L))
      .reduce((x, y) => x.bitwiseOR(y))
    agg.select(col(idCol), packed.as("simhash"))
  }

  /** Hamming distance between two packed 64-bit sketches. */
  def hamming(a: Column, b: Column): Column = bit_count(a.bitwiseXOR(b))

  /** SimHash near-dup pairs: docs whose sketches agree on one of four
    * 16-bit bands are candidates (≤ maxDist differing bits verified
    * exactly). Same bucket-join shape as MinHash-LSH.
    */
  def simHashNearDups(
      sketches: DataFrame,
      idCol: String = "doc_id",
      maxDist: Int = 3): DataFrame = {
    val banded = sketches.select(col(idCol), col("simhash"),
      posexplode(array((0 until 4).map(i =>
        shiftright(col("simhash"), i * 16).bitwiseAND(0xffffL)): _*))
        .as(Seq("band", "bucket")))
    val a = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_a"), col("simhash").as("sh_a"))
    val b = banded.select(col("band"), col("bucket"),
      col(idCol).as("id_b"), col("simhash").as("sh_b"))
    a.join(b, Seq("band", "bucket"))
      .filter(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"), hamming(col("sh_a"), col("sh_b")).as("dist"))
      .distinct()
      .filter(col("dist") <= maxDist)
  }
}
