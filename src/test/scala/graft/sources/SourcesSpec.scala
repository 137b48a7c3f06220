package graft.sources

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  private val golden = "/root/reference/src/main/mymrout"

  test("kvtext reads the reference's golden output identically to a text+split parse") {
    val viaSource = spark.read.format("kvtext").load(golden)
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    val viaText = spark.read.text(golden)
      .select(col("value").as("line"))
      .collect().map { r =>
        val line = r.getString(0)
        val cut = line.lastIndexOf(' ')
        if (cut < 0) (line, "") else (line.substring(0, cut), line.substring(cut + 1))
      }.toSeq
    assert(viaSource.length == 22107)
    assert(viaSource.sorted == viaText.sorted)
    assert(spark.read.format("kvtext").load(golden).schema.fieldNames.toSeq ==
      Seq("key", "value"))
  }

  test("kvtext honors column pruning down to the scan") {
    val df = spark.read.format("kvtext").load(golden).select("value")
    val scan = df.queryExecution.executedPlan.collectLeaves().head
    assert(scan.output.map(_.name) == Seq("value"),
      s"scan must read only the requested column, got ${scan.output}")
    // pruned read still parses correctly (counts are numeric)
    val vals = df.limit(100).collect().map(_.getString(0))
    assert(vals.nonEmpty && vals.forall(_.forall(_.isDigit)))
  }

  test("kvtext resolves globs, directories, and value-less lines") {
    val dir = Files.createTempDirectory("kvtext").toFile
    Files.writeString(new java.io.File(dir, "mr-out-0").toPath,
      "alpha 1\nbeta 2\n")
    Files.writeString(new java.io.File(dir, "mr-out-1").toPath,
      "gamma 3\nnovalue\nmulti word key 9\n")
    def rows(path: String) = spark.read.format("kvtext").load(path)
      .collect().map(r => (r.getString(0), r.getString(1))).toSet
    val expected = Set(
      ("alpha", "1"), ("beta", "2"), ("gamma", "3"),
      ("novalue", ""), ("multi word key", "9"))
    assert(rows(s"$dir/mr-out-*") == expected, "glob read")
    assert(rows(dir.toString) == expected, "directory read")
    // file-grain parallelism: one partition per shard
    assert(spark.read.format("kvtext").load(s"$dir/mr-out-*").rdd
      .getNumPartitions == 2)
  }

  test("kvtext round-trips the engine's own MapReduce text sink") {
    val out = Files.createTempDirectory("kvtext-rt").toString + "/wc"
    Seq(("b", "2"), ("a", "1"), ("c", "3")).toDF("k", "v")
      .select(concat_ws(" ", col("k"), col("v")).as("value"))
      .coalesce(1).write.text(out)
    val back = spark.read.format("kvtext").load(out)
      .orderBy("key")
      .collect().map(r => (r.getString(0), r.getString(1))).toSeq
    assert(back == Seq(("a", "1"), ("b", "2"), ("c", "3")))
  }
}
