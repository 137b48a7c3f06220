package graft

import org.apache.spark.sql.SparkSession

/** Central SparkSession factory so every entry point (Verify, Bench, tests)
  * gets identical, scale-minded settings.
  *
  * Settings rationale (local[32] single-JVM harness, but written for a real
  * cluster):
  *  - shuffle.partitions matches local cores (not the 200 default) — on a
  *    real cluster AQE coalesces post-shuffle partitions anyway.
  *  - AQE on: runtime re-planning (skew-join splitting, partition
  *    coalescing, broadcast-join demotion/promotion) is the 100 TB story.
  *  - session timezone pinned UTC so timestamp semantics agree with the
  *    DuckDB oracle.
  */
object GraftSession {
  def cpus: Int = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32").toInt

  def builder(appName: String = "graft"): SparkSession.Builder =
    SparkSession
      .builder()
      .appName(appName)
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus.toString)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.adaptive.skewJoin.enabled", "true")
      // runtime bloom-filter pushdown: large-join probe sides get a bloom
      // built from the build side's join keys injected below their scan —
      // at 100 TB this prunes shuffle input for selective fact⋈fact joins
      // without any query change
      .config("spark.sql.optimizer.runtimeFilter.bloomFilter.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.parquet.int96RebaseModeInWrite", "CORRECTED")
      .config("spark.sql.parquet.datetimeRebaseModeInWrite", "CORRECTED")
      // events.ts is parquet TIMESTAMP(NANOS) which Spark cannot represent;
      // read it as Long nanos-since-epoch (Tables.eventsTs converts).
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")

  def getOrCreate(appName: String = "graft"): SparkSession = {
    val spark = builder(appName)
      .withExtensions(new graft.functions.GraftExtensions)
      .getOrCreate()
    graft.functions.GraftFunctions.register(spark)
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
