package graft.operators

import graft.SparkSpec
import graft.SparkEntry
import org.apache.spark.sql.functions._

/** Semantic invariants for the q228–q232 audit set — properties that
  * must hold beyond the DuckDB oracle's value equality.
  */
class AuditSpec extends SparkSpec {

  private def run(name: String, dir: String = sf0001) =
    SparkEntry.queries(name)(spark, dir)

  test("q228: zero-match predicate full-skips BOTH layouts; arithmetic consistent") {
    val rows = run("q228_zonemap_skip").collect().map { r =>
      (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3),
        r.getLong(4), r.getLong(5), r.getLong(6))
    }
    assert(rows.length == 8, "4 predicates × 2 layouts")
    rows.foreach { case (pred, layout, nChunks, read, rowsRead, rowsMatch, permille) =>
      assert(read <= nChunks, s"$pred/$layout")
      assert(rowsRead >= rowsMatch,
        s"$pred/$layout: zone maps must never skip a matching row")
      assert(permille == 1000 * (nChunks - read) / nChunks, s"$pred/$layout")
    }
    // predicate 0 ([1990, 1994]) predates every shipdate: full skip
    rows.filter(_._1 == 0L).foreach { r =>
      assert(r._4 == 0 && r._5 == 0 && r._7 == 1000L,
        s"pred 0 must full-skip: $r")
    }
    // rows_match is a property of the predicate, not the layout
    rows.groupBy(_._1).values.foreach { g =>
      assert(g.map(_._6).distinct.length == 1)
    }
    // the clustered layout must beat raw on the selective mid-range
    // predicate (that's the point of the audit): strictly fewer rows read
    val byLayout = rows.filter(_._1 == 2L).map(r => r._2 -> r._5).toMap
    assert(byLayout("clustered") < byLayout("raw"),
      s"clustering must skip on a narrow date range: $byLayout")
  }

  test("q229: predictions are non-edges; RA equals a driver recompute") {
    val li = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .filter(col("l_orderkey") % 3 === 0 && col("l_partkey") % 2 === 0)
      .select("l_orderkey", "l_partkey").collect()
      .map(r => (r.getLong(0), r.getLong(1)))
    val byOrder = li.groupBy(_._1).view.mapValues(_.map(_._2).distinct.sorted)
    val edges = byOrder.values.flatMap { ps =>
      for (i <- ps.indices; j <- i + 1 until ps.length) yield (ps(i), ps(j))
    }.toSet
    val adj = scala.collection.mutable.Map.empty[Long, Set[Long]]
      .withDefaultValue(Set.empty)
    edges.foreach { case (a, b) =>
      adj(a) = adj(a) + b; adj(b) = adj(b) + a
    }
    val got = run("q229_link_predict").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
    assert(got.nonEmpty)
    got.foreach { case (u, v, cn, ra) =>
      assert(u < v, "pairs are canonicalized")
      assert(!edges.contains((u, v)), s"($u,$v) is already an edge")
      val pivots = (adj(u) & adj(v)).filter(z => adj(z).size <= 64)
      assert(cn == pivots.size, s"($u,$v) common-neighbor count")
      assert(ra == pivots.toSeq.map(z => 1000000L / adj(z).size).sum,
        s"($u,$v) RA micro")
    }
    // ranked descending by the scored order
    assert(got.map(_._4).toSeq == got.map(_._4).sortBy(-_).toSeq)
  }

  test("q230: bins partition the corpus; decomposition equals a driver recompute") {
    val stops = AuditQueries.calibStops.toSet
    val docs = spark.read.parquet(s"$sf0001/documents.parquet")
      .select("lang", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split("\\s+").filter(_.nonEmpty)
        (r.getString(0) == "en", toks)
      }
      .filter(_._2.nonEmpty)
      .map { case (en, toks) =>
        val p = math.min(999999L, 1000000L * toks.count(stops) / toks.length)
        (p / 100000L, p, if (en) 1L else 0L)
      }
    val want = docs.groupBy(_._1).map { case (bin, g) =>
      val n = g.length.toLong
      val sp = g.map(_._2).sum
      val npos = g.map(_._3).sum
      val ssq = g.map { case (_, p, y) =>
        BigInt(p - 1000000L * y) * BigInt(p - 1000000L * y)
      }.sum
      bin -> (n, sp / n, 1000000L * npos / n, (ssq / n).toLong)
    }
    val rows = run("q230_calibration").collect()
    assert(rows.map(_.getAs[Long]("n")).sum == docs.length,
      "bins must partition the scored corpus")
    rows.foreach { r =>
      val (n, mp, pr, br) = want(r.getAs[Long]("bin"))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("mean_p_micro") == mp)
      assert(r.getAs[Long]("pos_rate_micro") == pr)
      assert(r.getAs[Long]("brier_micro2") == br)
      assert(r.getAs[Long]("rel_contrib_micro2") == (mp - pr) * (mp - pr))
    }
  }

  test("q231: tau-b equals a driver recompute; pair classes partition n(n-1)/2") {
    val smp = spark.read.parquet(s"$sf0001/documents.parquet")
      .filter(col("doc_id") < 200)
      .select("doc_id", "n_chars", "text").collect()
      .map(r => (r.getLong(1),
        r.getString(2).split("\\s+").count(_.nonEmpty).toLong))
    var (c, d, tx, ty, txy) = (0L, 0L, 0L, 0L, 0L)
    for (i <- smp.indices; j <- i + 1 until smp.length) {
      val cx = java.lang.Long.compare(smp(i)._1, smp(j)._1)
      val cy = java.lang.Long.compare(smp(i)._2, smp(j)._2)
      if (cx == 0 && cy == 0) txy += 1
      else if (cx == 0) tx += 1
      else if (cy == 0) ty += 1
      else if (cx == cy) c += 1
      else d += 1
    }
    val r = run("q231_kendall_tau").head()
    val n = smp.length.toLong
    val nPairs = n * (n - 1) / 2
    assert(r.getAs[Long]("n") == n)
    assert(r.getAs[Long]("n_pairs") == nPairs)
    assert(r.getAs[Long]("concordant") == c)
    assert(r.getAs[Long]("discordant") == d)
    assert(r.getAs[Long]("ties_x") == tx)
    assert(r.getAs[Long]("ties_y") == ty)
    assert(r.getAs[Long]("ties_xy") == txy)
    assert(c + d + tx + ty + txy == nPairs, "pair classes must partition")
    val tau = 1000000.0 * (c - d) /
      math.sqrt((nPairs - tx - txy).toDouble * (nPairs - ty - txy).toDouble)
    assert(r.getAs[Long]("tau_b_micro") ==
      BigDecimal(tau).setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong)
  }

  test("q233: HITS authorities equal a driver recompute of the unrolled rounds") {
    val edges = spark.read.parquet(s"$sf0001/lineitem.parquet")
      .select("l_orderkey", "l_partkey")
      .join(spark.read.parquet(s"$sf0001/orders.parquet")
        .select("o_orderkey", "o_custkey"),
        col("l_orderkey") === col("o_orderkey"))
      .select(col("o_custkey").as("c"), col("l_partkey").as("p"))
      .distinct().collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val byPart = edges.groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val byCust = edges.groupBy(_._1).view.mapValues(_.map(_._2)).toMap
    val a1 = byPart.view.mapValues(cs => 1000000L * cs.size).toMap
    val a1mx = a1.values.max
    val a1n = a1.view.mapValues(a => a * 1000000L / a1mx).toMap
    val h1 = byCust.view.mapValues(ps => ps.toSeq.map(a1n).sum).toMap
    val h1mx = h1.values.max
    val h1n = h1.view.mapValues(h => h * 1000000L / h1mx).toMap
    val a2 = byPart.view.mapValues(cs => cs.toSeq.map(h1n).sum).toMap
    val a2mx = a2.values.max
    val want = a2.view.mapValues(a => a * 1000000L / a2mx).toMap
    val got = run("q233_hits").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(got.length == 15)
    got.foreach { case (p, auth, _) =>
      assert(auth == want(p), s"part $p")
    }
    // the global top part normalizes to exactly 1e6
    assert(got.head._2 == 1000000L)
    assert(got.map(_._2).toSeq == got.map(_._2).sortBy(-_).toSeq)
  }

  test("q234: residuals de-season the diurnal profile; MAD is a data element") {
    val rows = run("q234_seasonal").collect()
    assert(rows.length == 5, "one row per event type")
    val nTotal = spark.read.parquet(s"$sf0001/events.parquet").count()
    assert(rows.map(_.getAs[Long]("n")).sum == nTotal)
    rows.foreach { r =>
      assert(r.getAs[Long]("mad_cents") >= 0)
      // anomalies are a small tail, never the bulk
      assert(r.getAs[Long]("n_anomalies") * 10 < r.getAs[Long]("n"),
        s"${r.getString(0)}: anomaly rule flags >10% of rows")
    }
  }

  test("q235: KM invariants — at-risk telescopes, log-survival is non-increasing") {
    val rows = run("q235_kaplan_meier").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
        r.getLong(4)))
    assert(rows.nonEmpty)
    val nUsers = spark.read.parquet(s"$sf0001/events.parquet")
      .select("user_id").distinct().count()
    assert(rows.head._2 == nUsers, "everyone is at risk at the first time")
    assert(rows.map(r => r._3 + r._4).sum == nUsers,
      "every user churns or is censored exactly once")
    rows.sliding(2).foreach {
      case Array((t1, n1, d1, c1, s1), (t2, n2, _, _, s2)) =>
        assert(t1 < t2)
        assert(n2 == n1 - d1 - c1, "at-risk must telescope")
        assert(s2 <= s1, "log-survival is non-increasing")
      case _ =>
    }
    assert(rows.head._5 <= 0, "log-survival starts ≤ 0")
  }

  test("q236: run/NDV statistics equal a driver recompute in physical order") {
    val ord = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderstatus", "o_orderpriority")
      .collect().sortBy(_.getLong(0))
    def stats(vs: Array[String]): (Long, Long, Long, Long) = {
      val runs = 1L + vs.sliding(2).count(w => w.length == 2 && w(0) != w(1))
      (vs.length.toLong, vs.distinct.length.toLong, runs,
        vs.map(_.length.toLong).sum)
    }
    val want = Map(
      "o_orderstatus" -> stats(ord.map(_.getString(1))),
      "o_orderpriority" -> stats(ord.map(_.getString(2))))
    val rows = run("q236_storage_advisor").collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      val (n, ndv, runs, bytes) = want(r.getString(0))
      assert(r.getAs[Long]("n") == n)
      assert(r.getAs[Long]("ndv") == ndv)
      assert(r.getAs[Long]("runs") == runs, r.getString(0))
      assert(r.getAs[Long]("plain_bytes") == bytes)
      assert(r.getAs[Long]("avg_run_len_milli") == 1000L * n / runs)
      val bits = r.getAs[Long]("dict_bits")
      assert(ndv <= (1L << bits) && (bits == 0 || ndv > (1L << (bits - 1))),
        s"${r.getString(0)}: $ndv values need $bits bits")
    }
  }

  test("q232: overlap equals a driver recompute of both top-10 sets") {
    val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")
      .select("vec_id", "embedding").collect()
      .map(r => (r.getLong(0), r.getSeq[Float](1).toArray))
    def cos(a: Array[Float], b: Array[Float], dim: Int): Double = {
      var (dp, na, nb) = (0.0, 0.0, 0.0)
      for (i <- 0 until dim) {
        dp += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
      }
      dp / (math.sqrt(na) * math.sqrt(nb))
    }
    def top10(q: (Long, Array[Float]), dim: Int): Seq[Long] =
      emb.filter(_._1 != q._1)
        .map { case (id, e) => (id, cos(q._2, e, dim)) }
        .sortBy { case (id, s) => (-s, id) }.take(10).map(_._1).toSeq
    val want = emb.filter(_._1 < 20).map { q =>
      val full = top10(q, 64)
      val half = top10(q, 32)
      q._1 -> (full.toSet.intersect(half.toSet).size.toLong,
        if (full.head == half.head) 1L else 0L)
    }.toMap
    val rows = run("q232_matryoshka").collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val (ov, t1) = want(r.getAs[Long]("query_id"))
      assert(r.getAs[Long]("n_overlap") == ov, s"query ${r.getLong(0)}")
      assert(r.getAs[Long]("top1_match") == t1, s"query ${r.getLong(0)}")
    }
  }
}
