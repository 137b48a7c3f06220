package graft.ml

import graft.SparkSpec

class EvalSpec extends SparkSpec {
  import spark.implicits._

  private def auc(rows: Seq[(Long, Boolean)]): (Long, Long, Long, Option[Long]) = {
    val r = Eval.aucExact(rows.toDF("score", "pos"), "score", "pos").head()
    (r.getLong(0), r.getLong(1), r.getLong(2),
      if (r.isNullAt(3)) None else Some(r.getLong(3)))
  }

  test("perfect separation scores 10000 bp; reversed scores 0") {
    assert(auc(Seq((10L, true), (9L, true), (2L, false), (1L, false))) ==
      ((2L, 2L, 8L, Some(10000L))))
    assert(auc(Seq((1L, true), (2L, true), (9L, false), (10L, false))) ==
      ((2L, 2L, 0L, Some(0L))))
  }

  test("all-tied scores give exactly 5000 bp; hand example with mixed ties") {
    assert(auc(Seq((5L, true), (5L, true), (5L, false)))._4 == Some(5000L))
    // pos {3, 2}, neg {2, 1}: pairs (3,2)=1 (3,1)=1 (2,2)=0.5 (2,1)=1
    // → U = 3.5 of 4 → 2U = 7 → 8750 bp
    assert(auc(Seq((3L, true), (2L, true), (2L, false), (1L, false))) ==
      ((2L, 2L, 7L, Some(8750L))))
  }

  test("single-class input yields null auc, not a crash") {
    assert(auc(Seq((1L, true), (2L, true)))._4.isEmpty)
    assert(auc(Seq((1L, false)))._4.isEmpty)
  }

  test("result is invariant under partitioning") {
    val rows = (0 until 500).map(i =>
      ((i * 7919 % 101).toLong, i % 3 == 0))
    val df = rows.toDF("score", "pos")
    val a = Eval.aucExact(df, "score", "pos").head()
    val b = Eval.aucExact(df.repartition(13), "score", "pos").head()
    assert(a == b)
    // cross-check vs a sequential double-loop reference
    val pos = rows.filter(_._2).map(_._1)
    val neg = rows.filterNot(_._2).map(_._1)
    val u2 = (for (p <- pos; n <- neg)
      yield if (p > n) 2L else if (p == n) 1L else 0L).sum
    assert(a.getLong(2) == u2)
    assert(a.getLong(3) == 10000L * u2 / (2L * pos.size * neg.size))
  }

  test("liftTable: hand case — perfect ranking concentrates positives in the top bins") {
    // 20 rows, 5 positives holding the 5 highest scores, 4 bins of 5
    val rows = (1L to 20L).map(id => (id, 100L - id, id <= 5))
    val df = rows.toDF("doc_id", "score", "pos")
    val got = Eval.liftTable(df, "score", "pos", "doc_id", bins = 4)
      .orderBy("bin").collect()
      .map(r => (r.getInt(0).toLong, r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    // bin 1 = ids 1..5 (highest scores) = all 5 positives
    assert(got(0) == (1L, 5L, 5L, 10000L, 40000L),
      s"top bin must be all-positive at 4x lift, got ${got(0)}")
    assert(got.drop(1).forall(b => b._3 == 0L && b._4 == 0L),
      "remaining bins hold no positives")
    // cumulative lift decays toward 10000 bp (the base rate) at the end
    assert(got.last._5 == 10000L)
  }

  test("liftTable: exact ntile sizing on a non-divisible total; partition-invariant") {
    // 23 rows into 4 bins -> sizes 6,6,6,5 (first n%bins bins get the
    // extra row); positives alternate so rates are mixed
    val rows = (1L to 23L).map(id => (id, id * 7 % 23, id % 3 == 0))
    val df = rows.toDF("doc_id", "score", "pos")
    val a = Eval.liftTable(df, "score", "pos", "doc_id", bins = 4)
      .orderBy("bin").collect().toSeq
    val b = Eval.liftTable(df.repartition(11), "score", "pos", "doc_id", bins = 4)
      .orderBy("bin").collect().toSeq
    assert(a == b, "lift table must not depend on partitioning")
    assert(a.map(_.getLong(1)) == Seq(6L, 6L, 6L, 5L))
    assert(a.map(_.getLong(2)).sum == rows.count(_._3))
  }
}
