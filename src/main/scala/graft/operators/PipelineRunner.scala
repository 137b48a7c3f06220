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

  /** Run `stages` in order. Each stage function receives the persisted
    * outputs of ALL prior stages (by name, re-read from parquet) and
    * returns the DataFrame to persist under its own name. Returns the
    * persisted outputs of every stage. Stages whose output is already
    * committed under `workDir` are skipped (their function is never
    * invoked) — delete the stage directory to force recomputation.
    */
  def run(
      spark: SparkSession,
      workDir: String,
      stages: Seq[(String, Map[String, DataFrame] => DataFrame)])
      : Map[String, DataFrame] = {
    require(stages.map(_._1).distinct.size == stages.size,
      s"duplicate stage names in ${stages.map(_._1)}")
    var outputs = Map.empty[String, DataFrame]
    stages.foreach { case (name, stage) =>
      val dir = s"$workDir/$name"
      if (!committed(spark, dir)) {
        // Overwrite clears any partial (uncommitted) output from a crash
        stage(outputs).write.mode(SaveMode.Overwrite).parquet(dir)
      }
      outputs += name -> spark.read.parquet(dir)
    }
    outputs
  }
}
