package graft.operators

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

class EtlSpec extends SparkSpec {
  import spark.implicits._

  test("partitioned write -> filter prunes partitions at the scan") {
    val dir = Files.createTempDirectory("graft-etl").toString + "/events_p"
    val events = spark.read.parquet(s"$sf0001/events.parquet")
    Etl.writePartitioned(events, dir, "event_type")
    // hive-style layout on disk
    val dirs = new java.io.File(dir).listFiles().filter(_.isDirectory).map(_.getName)
    assert(dirs.exists(_.startsWith("event_type=")), dirs.mkString(","))
    val filtered = spark.read.parquet(dir).filter($"event_type" === "click")
    val plan = filtered.queryExecution.executedPlan.toString
    assert(plan.contains("PartitionFilters: [isnotnull(event_type"),
      s"no partition pruning:\n$plan")
    assert(filtered.count() ==
      events.filter($"event_type" === "click").count())
  }

  test("sorted write enables row-group stats; data round-trips completely") {
    val dir = Files.createTempDirectory("graft-etl").toString + "/orders_s"
    val orders = spark.read.parquet(s"$sf0001/orders.parquet")
    Etl.writeSortedParquet(orders, dir, "o_orderkey", files = 2)
    val back = spark.read.parquet(dir)
    assert(back.count() == orders.count())
    // within each file rows are clustered by key (stats-skippable)
    val perFile = back.select(input_file_name().as("f"), $"o_orderkey")
      .groupBy("f").agg(min("o_orderkey").as("lo"), max("o_orderkey").as("hi"))
      .collect()
    assert(perFile.length == 2)
  }

  test("compact reduces file count without losing rows") {
    val base = Files.createTempDirectory("graft-etl").toString
    val many = s"$base/many"
    val one = s"$base/one"
    spark.read.parquet(s"$sf0001/lineitem.parquet").repartition(16)
      .write.parquet(many)
    assert(new java.io.File(many).listFiles().count(_.getName.endsWith(".parquet")) == 16)
    Etl.compact(spark, many, one, 1)
    assert(new java.io.File(one).listFiles().count(_.getName.endsWith(".parquet")) == 1)
    assert(spark.read.parquet(one).count() == spark.read.parquet(many).count())
  }
}
