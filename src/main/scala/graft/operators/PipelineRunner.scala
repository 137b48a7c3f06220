package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Resumable multi-stage batch pipeline: each stage's output is persisted
  * to `<workDir>/<stageName>/` as parquet, and a stage whose output
  * already committed is NOT recomputed on a re-run — the restart contract
  * production ETL needs: a crash mid-pipeline resumes from the last
  * durable boundary instead of re-paying every upstream stage over the
  * 100 TB corpus.
  *
  * Correctness rests on parquet's atomic commit: `_SUCCESS` appears only
  * after the FileOutputCommitter promotes every task file, so "marker
  * present" ⟺ "output complete" on any Hadoop filesystem (HDFS, S3A with
  * a committer, local). An interrupted write leaves no marker; the rerun
  * overwrites the partial directory (SaveMode.Overwrite) and the stage is
  * effectively idempotent. Stages read predecessors from their PERSISTED
  * parquet (never the in-memory lineage), so resumed and fresh runs
  * compute over byte-identical inputs — and each stage boundary doubles
  * as a lineage cut (no giant multi-stage DAG for Spark to re-derive).
  *
  * Not a scheduler: stages run sequentially in declaration order (the
  * dependency order of a linear curation pipeline). For DAG-shaped
  * fan-out, compose two runners or let independent branches share a
  * stage's persisted output.
  */
object PipelineRunner {

  private def fs(spark: SparkSession, root: String) =
    new Path(root).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def committed(spark: SparkSession, dir: String): Boolean =
    fs(spark, dir).exists(new Path(dir, "_SUCCESS"))

  /** Marker file holding the stage's CASCADED fingerprint (written after
    * the parquet commit; a crash between the two leaves a committed dir
    * with no/stale marker, which safely recomputes on resume).
    */
  private val FingerprintFile = "_GRAFT_STAGE"

  private def md5Hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  private def readFingerprint(spark: SparkSession, dir: String): Option[String] = {
    val f = fs(spark, dir)
    val p = new Path(dir, FingerprintFile)
    if (!f.exists(p)) None
    else {
      val in = f.open(p)
      try Some(new String(
        org.apache.commons.io.IOUtils.toByteArray(in), "UTF-8").trim)
      finally in.close()
    }
  }

  private def writeFingerprint(
      spark: SparkSession, dir: String, fp: String): Unit = {
    val out = fs(spark, dir).create(new Path(dir, FingerprintFile), true)
    try out.write(fp.getBytes("UTF-8")) finally out.close()
  }

  /** Run `stages` in order. Each stage function receives the persisted
    * outputs of ALL prior stages (by name, re-read from parquet) and
    * returns the DataFrame to persist under its own name. Returns the
    * persisted outputs of every stage. Stages whose output is already
    * committed under `workDir` AND whose fingerprint matches are skipped
    * (their function is never invoked).
    *
    * The per-stage `version` string is the caller's declaration of the
    * stage's logic + parameters (bump it when either changes). The
    * fingerprint persisted next to `_SUCCESS` is the md5 CHAIN of
    * (name, version) over the stage and every stage before it, so
    * editing stage i — or reordering — invalidates stage i AND every
    * downstream stage automatically; `_SUCCESS` alone no longer lets a
    * rerun silently reuse output computed by different code. Every
    * skip/recompute decision is logged, so stale reuse is visible even
    * when the caller leaves versions at the default.
    */
  def runVersioned(
      spark: SparkSession,
      workDir: String,
      stages: Seq[(String, String, Map[String, DataFrame] => DataFrame)])
      : Map[String, DataFrame] = {
    require(stages.map(_._1).distinct.size == stages.size,
      s"duplicate stage names in ${stages.map(_._1)}")
    var outputs = Map.empty[String, DataFrame]
    var chain = ""
    stages.foreach { case (name, version, stage) =>
      // name and version hash SEPARATELY before folding into the chain:
      // a '|' inside either could otherwise shift bytes between fields
      // (("a","b|c") vs ("a|b","c")) and leave a changed pipeline with
      // an unchanged fingerprint
      chain = md5Hex(chain + md5Hex(name) + md5Hex(version))
      val dir = s"$workDir/$name"
      val stored = readFingerprint(spark, dir)
      if (committed(spark, dir) && stored.contains(chain)) {
        Console.err.println(
          s"[PipelineRunner] stage $name: skipped (committed, fingerprint $chain)")
      } else {
        if (committed(spark, dir)) Console.err.println(
          s"[PipelineRunner] stage $name: committed output is STALE " +
            s"(fingerprint ${stored.getOrElse("<none>")} != $chain) — recomputing")
        else Console.err.println(s"[PipelineRunner] stage $name: computing")
        // Overwrite clears any partial (uncommitted) output from a crash
        stage(outputs).write.mode(SaveMode.Overwrite).parquet(dir)
        writeFingerprint(spark, dir, chain)
      }
      outputs += name -> spark.read.parquet(dir)
    }
    outputs
  }

  /** [[runVersioned]] with every stage at the default version "" — the
    * resume contract still keys on the cascaded (name-sequence)
    * fingerprint, so reordering or renaming stages invalidates
    * correctly; only a logic edit under an unchanged name needs a
    * caller-supplied version to be detected.
    */
  def run(
      spark: SparkSession,
      workDir: String,
      stages: Seq[(String, Map[String, DataFrame] => DataFrame)])
      : Map[String, DataFrame] =
    runVersioned(spark, workDir,
      stages.map { case (n, f) => (n, "", f) })
}
