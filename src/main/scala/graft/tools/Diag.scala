package graft.tools

import graft.GraftSession
import graft.dedup.Dedup
import graft.tables.Tables
import org.apache.spark.sql.functions._

/** Scratch diagnostics main for performance investigation. */
object Diag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val copies = args.lift(1).map(_.toInt).getOrElse(1)
    val spark = GraftSession.getOrCreate("graft-diag")
    val base = Tables.documents(spark, dir).select("doc_id", "text")
    // optional N-fold replication with per-copy token prefixes (zero
    // cross-copy similarity) — same corpus construction as ScaleProbe,
    // so stage timings can be broken down at the probe's scale points
    val docs = if (copies <= 1) base else
      (0 until copies).map { k =>
        base.select((col("doc_id") + lit(k.toLong * 10000000L)).as("doc_id"),
          array_join(transform(split(col("text"), "\\s+"),
            t => concat(lit(s"c$k"), t)), " ").as("text"))
      }.reduce(_ union _)
    val t0 = System.nanoTime()
    val sigs = Dedup.minHashSignatures(docs).cache()
    println(s"docs=${docs.count()} sigs=${sigs.count()} sigT=${(System.nanoTime()-t0)/1e9}")
    val t1 = System.nanoTime()
    val cands = Dedup.lshCandidatesWithSigs(sigs).cache()
    println(s"cands=${cands.count()} candT=${(System.nanoTime()-t1)/1e9}")
    val t2 = System.nanoTime()
    val est = Dedup.estimateJaccard(cands).cache()
    println(s"est=${est.count()} estT=${(System.nanoTime()-t2)/1e9}")
    println("est distribution: " + est.select(
      sum(when(col("est_jaccard") >= 0.55, 1).otherwise(0)).as("ge55"),
      sum(when(col("est_jaccard") >= 0.3, 1).otherwise(0)).as("ge30"))
      .collect().mkString)
    val t3 = System.nanoTime()
    val plausible = est.filter(col("est_jaccard") >= 0.55).select("id_a", "id_b").distinct()
    val verified = Dedup.ngramJaccard(docs, plausible)
      .filter(col("jaccard") >= 0.7)
    println(s"verified=${verified.count()} verifyT=${(System.nanoTime()-t3)/1e9}")
    spark.stop()
  }
}
