package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class TemporalSpec extends SparkSpec {
  import spark.implicits._

  test("asofJoin: latest at-or-before match, inclusive ties, null when none") {
    val left = Seq(
      (1L, 10L), (1L, 20L), (1L, 5L), // key 1 at ts 10, 20, 5
      (2L, 100L),                     // key 2: no right rows at all
      (3L, 50L))                      // key 3: exact-ts match
      .toDF("k", "ts")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 15L, "r15"),
      (3L, 50L, "r50"))
      .toDF("k", "rts", "v")
    val got = Temporal.asofJoin(left, right, "k", "ts", "rts", Seq("v"))
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> Option(r.getString(2))).toMap
    assert(got((1L, 5L)).isEmpty, "match before any right row must be null")
    assert(got((1L, 10L)).contains("r10"), "inclusive: equal ts matches")
    assert(got((1L, 20L)).contains("r15"), "latest prior, not first")
    assert(got((2L, 100L)).isEmpty)
    assert(got((3L, 50L)).contains("r50"))
  }

  test("asofJoin preserves left row count (left-outer semantics)") {
    val e = graft.tables.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", timestamp_micros(expr("ts div 1000")).as("ts"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(max("o_totalprice").as("order_price"))
    val joined = Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("o_orderdate", "order_price"))
    assert(joined.count() == e.count())
  }

  test("asofJoin plan: single shuffle on key, no non-equi join") {
    val e = graft.tables.Tables.events(spark, sf0001)
      .select($"event_id", $"user_id", timestamp_micros(expr("ts div 1000")).as("ts"))
    val o = spark.read.parquet(s"$sf0001/orders.parquet")
      .groupBy($"o_custkey".as("user_id"), $"o_orderdate")
      .agg(max("o_totalprice").as("order_price"))
    val plan = Temporal.asofJoin(e, o, "user_id", "ts", "o_orderdate",
      Seq("order_price")).queryExecution.executedPlan.toString
    assert(!plan.contains("Join"), s"as-of should not plan a join:\n$plan")
  }

  // --- overlapJoinBucketed -------------------------------------------

  private def pairsOf(df: org.apache.spark.sql.DataFrame): Set[(Long, Long)] =
    df.select("a_id", "b_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("overlapJoinBucketed == brute-force overlap join on randomized intervals") {
    val rnd = new scala.util.Random(7)
    // durations straddle the bucket width (50): some intervals cover one
    // bucket, some several — exercises both the explode and the dedup
    val as = (1L to 120L).map(i => (i, rnd.nextInt(1000).toLong))
      .map { case (i, s) => (i, s, s + rnd.nextInt(140)) }
    val bs = (1001L to 1120L).map(i => (i, rnd.nextInt(1000).toLong))
      .map { case (i, s) => (i, s, s + rnd.nextInt(140)) }
    val a = as.toDF("a_id", "a_s", "a_e")
    val b = bs.toDF("b_id", "b_s", "b_e")
    val got = pairsOf(Temporal.overlapJoinBucketed(
      a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 50))
    val want = (for {
      (ai, s1, e1) <- as; (bi, s2, e2) <- bs
      if s1 <= e2 && s2 <= e1
    } yield (ai, bi)).toSet
    assert(want.nonEmpty, "degenerate fixture: no overlaps planted")
    assert(got == want, s"missing=${want -- got} spurious=${got -- want}")
  }

  test("overlapJoinBucketed: multi-bucket pairs emit exactly once, endpoints closed") {
    // both intervals span many buckets and overlap in several — the
    // overlap-start-bucket rule must keep exactly one copy
    val a = Seq((1L, 100L, 400L)).toDF("a_id", "a_s", "a_e")
    val b = Seq((2L, 350L, 900L), // overlaps [350,400]
                (3L, 400L, 500L), // touches at exactly a_e=400 (closed)
                (4L, 401L, 500L)) // disjoint by 1 unit
      .toDF("b_id", "b_s", "b_e")
    val got = Temporal.overlapJoinBucketed(
      a, b, "a_s", "a_e", "b_s", "b_e", bucketWidth = 10)
    assert(got.count() == got.select("a_id", "b_id").distinct().count(),
      "a pair surfaced from more than one bucket")
    assert(pairsOf(got) == Set((1L, 2L), (1L, 3L)),
      "closed-endpoint overlap set wrong")
  }

  test("overlapJoinBucketed rejects colliding column names") {
    val a = Seq((1L, 1L, 2L)).toDF("id", "s", "e")
    intercept[IllegalArgumentException] {
      Temporal.overlapJoinBucketed(a, a, "s", "e", "s", "e", 10)
    }
  }

  test("q215 SCD2: joined version == count of changes at-or-before fact time") {
    val rows = graft.SparkEntry.queries("q215_scd2_join")(spark, sf0001)
      .collect()
      .map(r => (r.getLong(0), r.getLong(1),
        if (r.isNullAt(3)) -1L else r.getLong(3),
        if (r.isNullAt(4)) -1L else r.getLong(4)))
    // driver reference from the raw events
    val ev = graft.tables.Tables.eventsTs(spark, sf0001)
      .select(col("event_id"), col("user_id"),
        unix_micros(col("ts")).as("tus"), col("event_type"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getString(3)))
    val signupsByUser: Map[Long, Seq[Long]] = ev.filter(_._4 == "signup")
      .groupBy(_._2).map { case (u, es) =>
        u -> es.map(_._3).distinct.sorted.toSeq }
    val purchases = ev.filter(_._4 == "purchase")
      .map(e => e._1 -> (e._2, e._3)).toMap
    assert(rows.length == purchases.size)
    rows.foreach { case (eid, uid, version, vfrom) =>
      val ts = purchases(eid)._2
      val prior = signupsByUser.getOrElse(uid, Seq.empty).takeWhile(_ <= ts)
      if (prior.isEmpty) assert(version == -1L && vfrom == -1L,
        s"purchase $eid before any signup must be NULL")
      else {
        assert(version == prior.length,
          s"purchase $eid: version $version != ${prior.length}")
        assert(vfrom == prior.last, s"purchase $eid valid_from")
      }
    }
  }
}
