package graft.tools

import graft.GraftSession
import graft.tables.Tables
import graft.textops.TextAnalysis
import org.apache.spark.sql.functions._

/** Scratch stage-timing for the exact prefix-filter join (q91 path). */
object PrefixDiag {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = GraftSession.getOrCreate("graft-prefixdiag")
    val threshold = 0.7
    val te = threshold - 1e-4
    val docs = Tables.documents(spark, dir).select("doc_id", "text")

    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[prefixdiag] $label: ${(System.nanoTime() - t0) / 1e9}%.2fs")
      r
    }

    val sh = docs.select(col("doc_id").as("id"),
      array_distinct(transform(TextAnalysis.shingles(col("text"), 3),
        s => TextAnalysis.md5Long(s))).as("sh"))
      .filter(size(col("sh")) > 0)
    t("sh count")(sh.count())
    val exploded = sh.select(col("id"), explode(col("sh")).as("g"))
    t("exploded count")(exploded.count())
    val freq = exploded.groupBy("g").agg(count(lit(1)).as("df"))
    t("freq count")(freq.count())
    val prefixes = exploded.join(freq, "g")
      .groupBy("id")
      .agg(sort_array(collect_list(struct(col("df"), col("g")))).as("ordered"))
      .select(col("id"), size(col("ordered")).as("n"),
        transform(col("ordered"), x => x.getField("g")).as("sorted"))
      .select(col("id"), col("n"),
        explode(slice(col("sorted"), lit(1),
          (col("n") - ceil(col("n") * te).cast("int") + 1))).as("g"))
    t("prefixes count")(prefixes.count())
    val buckets = prefixes.groupBy("g")
      .agg(collect_list(struct(col("id"), col("n"))).as("members"))
      .filter(size(col("members")) >= 2)
    t("buckets count")(buckets.count())
    val pairsCol = flatten(transform(col("members"), (x, i) =>
      filter(
        transform(slice(col("members"), i + 2, size(col("members"))),
          y => struct(
            least(x.getField("id"), y.getField("id")).as("id_a"),
            greatest(x.getField("id"), y.getField("id")).as("id_b"),
            least(x.getField("n"), y.getField("n")).as("nmin"),
            greatest(x.getField("n"), y.getField("n")).as("nmax"))),
        p => p.getField("nmin").cast("double") >= p.getField("nmax") * te)))
    val cands = buckets
      .select(explode(pairsCol).as("p"))
      .select(col("p.id_a").as("id_a"), col("p.id_b").as("id_b"))
      .distinct()
      .localCheckpoint()
    t("cands count")(println("cands=" + cands.count()))
    t("verify")(println("verified=" +
      graft.dedup.Dedup.ngramJaccard(docs, cands)
        .filter(col("jaccard") >= threshold).count()))
    spark.stop()
  }
}
