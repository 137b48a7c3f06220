package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Resume semantics: committed stages are never recomputed; a crashed
  * (uncommitted) stage is overwritten cleanly; resumed runs read the
  * SAME bytes a fresh run would.
  */
class PipelineRunnerSpec extends SparkSpec {
  import spark.implicits._

  test("run -> rerun: committed stages skip; outputs identical") {
    val dir = Files.createTempDirectory("graft-pipe").toString
    var aRuns = 0
    var bRuns = 0
    val stages = Seq(
      "clean" -> { (_: Map[String, org.apache.spark.sql.DataFrame]) =>
        aRuns += 1
        Seq((1L, "keep"), (2L, "drop"), (3L, "keep")).toDF("id", "verdict")
          .filter($"verdict" === "keep")
      },
      "score" -> { (prev: Map[String, org.apache.spark.sql.DataFrame]) =>
        bRuns += 1
        prev("clean").withColumn("score", $"id" * 10)
      })

    val out1 = PipelineRunner.run(spark, dir, stages)
    assert(aRuns == 1 && bRuns == 1)
    val got1 = out1("score").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq
    assert(got1 == Seq((1L, 10L), (3L, 30L)))

    // rerun: both stages committed -> neither function invoked
    val out2 = PipelineRunner.run(spark, dir, stages)
    assert(aRuns == 1 && bRuns == 1, "committed stages must not recompute")
    assert(out2("score").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(2))).toSeq == got1)
  }

  test("crash mid-pipeline: resume skips committed prefix, overwrites partial output") {
    val dir = Files.createTempDirectory("graft-pipe2").toString
    var firstRuns = 0
    val first = "first" -> { (_: Map[String, org.apache.spark.sql.DataFrame]) =>
      firstRuns += 1
      Seq(1L, 2L, 3L).toDF("id")
    }
    val boom = "second" -> { (_: Map[String, org.apache.spark.sql.DataFrame]) =>
      throw new RuntimeException("induced stage crash")
    }
    intercept[RuntimeException] {
      PipelineRunner.run(spark, dir, Seq(first, boom))
    }
    assert(firstRuns == 1)

    // plant a PARTIAL (uncommitted) second-stage dir: data, no _SUCCESS
    val partial = new java.io.File(s"$dir/second")
    partial.mkdirs()
    new java.io.File(partial, "part-garbage.parquet").createNewFile()

    val fixed = "second" -> { (prev: Map[String, org.apache.spark.sql.DataFrame]) =>
      prev("first").withColumn("sq", $"id" * $"id")
    }
    val out = PipelineRunner.run(spark, dir, Seq(first, fixed))
    assert(firstRuns == 1, "committed first stage must not recompute on resume")
    assert(out("second").orderBy("id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq ==
      Seq((1L, 1L), (2L, 4L), (3L, 9L)),
      "partial output must be overwritten by the resumed stage")
  }

  test("duplicate stage names are rejected loudly") {
    val dir = Files.createTempDirectory("graft-pipe3").toString
    val s = "x" -> { (_: Map[String, org.apache.spark.sql.DataFrame]) =>
      Seq(1L).toDF("id") }
    intercept[IllegalArgumentException] {
      PipelineRunner.run(spark, dir, Seq(s, s))
    }
  }
}
