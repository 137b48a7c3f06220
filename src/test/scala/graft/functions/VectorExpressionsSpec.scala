package graft.functions

import graft.SparkSpec
import graft.similarity.Similarity
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private lazy val emb = spark.read.parquet(s"$sf0001/embeddings.parquet")

  test("native cosine is BIT-exact with the composed reference form on real data") {
    val pairs = emb.filter($"vec_id" < 40).select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(emb.filter($"vec_id" >= 40 && $"vec_id" < 80)
        .select($"vec_id".as("ib"), $"embedding".as("eb")))
    val diff = pairs.select(
        Similarity.cosine($"ea", $"eb").as("native"),
        Similarity.cosineComposed($"ea", $"eb").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0, s"$diff pairs differ between native and composed cosine")
  }

  test("interpreted (eval) path agrees with codegen path") {
    // force interpreted evaluation by disabling wholestage codegen
    val pairs = emb.filter($"vec_id" < 10).select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(emb.filter($"vec_id" >= 10 && $"vec_id" < 20)
        .select($"vec_id".as("ib"), $"embedding".as("eb")))
    val expr = Similarity.cosine($"ea", $"eb").as("sim")
    val withCodegen = pairs.select(col("ia"), col("ib"), expr)
      .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = pairs.select(col("ia"), col("ib"), expr)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_cosine is callable from SQL") {
    emb.createOrReplaceTempView("emb_v")
    val r = spark.sql(
      """SELECT a.vec_id, graft_cosine(a.embedding, a.embedding) AS self_sim
        |FROM emb_v a WHERE a.vec_id < 5""".stripMargin)
      .collect().map(_.getDouble(1))
    assert(r.length == 5)
    r.foreach(s => assert(math.abs(s - 1.0) < 1e-12))
  }

  test("null and mismatched-length inputs behave sanely") {
    val df = Seq(
      (Some(Array(1f, 2f)), Some(Array(1f, 2f, 9f))),
      (None, Some(Array(1f, 2f)))).toDF("a", "b")
    val got = df.select(Similarity.cosine($"a", $"b").as("s")).collect()
    // min-length semantics: [1,2]·[1,2] over norms ‖[1,2]‖·‖[1,2,9]‖... n=2
    assert(!got(0).isNullAt(0))
    assert(got(1).isNullAt(0), "null input must propagate null")
  }

  test("native l2sq is BIT-exact with the composed reference form, incl. inside transform") {
    val pairs = emb.filter($"vec_id" < 40).select($"vec_id".as("ia"), $"embedding".as("ea"))
      .crossJoin(emb.filter($"vec_id" >= 40 && $"vec_id" < 80)
        .select($"vec_id".as("ib"), $"embedding".as("eb")))
    val diff = pairs.select(
        Similarity.l2sq($"ea", $"eb").as("native"),
        Similarity.l2sqComposed($"ea", $"eb").as("composed"))
      .filter($"native" =!= $"composed")
      .count()
    assert(diff == 0, s"$diff pairs differ between native and composed l2sq")
    // the k-means shape: evaluated per element of a higher-order transform
    val arr = pairs.limit(50)
      .select($"ea", array($"eb", $"ea").as("cents"))
      .select(
        transform($"cents", c => Similarity.l2sq($"ea", c)).as("n"),
        transform($"cents", c => Similarity.l2sqComposed($"ea", c)).as("m"))
      .filter($"n" =!= $"m").count()
    assert(arr == 0, "native l2sq must agree with composed inside transform lambdas")
    // self-distance is exactly zero; nulls propagate
    val self = emb.limit(10)
      .select(Similarity.l2sq($"embedding", $"embedding").as("d")).collect()
    assert(self.forall(_.getDouble(0) == 0.0))
    val nulls = Seq((None: Option[Array[Float]], Some(Array(1f, 2f))))
      .toDF("a", "b")
      .select(Similarity.l2sq($"a", $"b").as("d")).collect()
    assert(nulls(0).isNullAt(0))
  }

  test("graft_l2sq is callable from SQL") {
    emb.createOrReplaceTempView("emb_v2")
    val r = spark.sql(
      """SELECT graft_l2sq(a.embedding, a.embedding) AS d
        |FROM emb_v2 a WHERE a.vec_id < 5""".stripMargin)
      .collect().map(_.getDouble(0))
    assert(r.length == 5 && r.forall(_ == 0.0))
  }

  test("FuseVectorFolds rewrites composed cosine/l2sq folds into the fused kernels") {
    // GraftFunctions.register (SparkSpec session) installs the rule
    val pair = emb.limit(50).crossJoin(
      emb.limit(50).select($"vec_id".as("id2"), $"embedding".as("e2")))
    val cosPlan = pair
      .select(Similarity.cosineComposed($"embedding", $"e2").as("sim"))
      .queryExecution.optimizedPlan.toString
    assert(cosPlan.contains("graft_cosine"),
      s"composed cosine did not fuse:\n$cosPlan")
    assert(!cosPlan.contains("aggregate("),
      s"composed folds survived the rewrite:\n$cosPlan")
    val l2Plan = pair
      .select(Similarity.l2sqComposed($"embedding", $"e2").as("d2"))
      .queryExecution.optimizedPlan.toString
    assert(l2Plan.contains("graft_l2sq"), s"composed l2sq did not fuse:\n$l2Plan")
    // and the rewrite is invisible to results (fused == composed is
    // separately asserted bit-exact above; here: end-to-end equality
    // between the rule-rewritten query and the native call)
    val viaRule = pair.select(Similarity.cosineComposed($"embedding", $"e2"))
      .collect().map(_.getDouble(0)).toSeq
    val native = pair.select(Similarity.cosine($"embedding", $"e2"))
      .collect().map(_.getDouble(0)).toSeq
    assert(viaRule == native)
  }

  test("FuseVectorFolds leaves non-matching folds alone") {
    import org.apache.spark.sql.functions._
    // sum of |x − y| — same skeleton, different element term: must NOT fuse
    val df = emb.limit(5).select(
      aggregate(
        zip_with($"embedding", $"embedding",
          (x, y) => abs(x.cast("double") - y.cast("double"))),
        lit(0.0), (acc, x) => acc + x).as("l1"))
    val plan = df.queryExecution.optimizedPlan.toString
    assert(!plan.contains("graft_l2sq") && !plan.contains("graft_cosine"),
      s"unrelated fold was rewritten:\n$plan")
    assert(df.collect().forall(_.getDouble(0) == 0.0))
  }

  // ---- graft_hyperplane_bands: the composed reference spelling the
  // kernel replaced in Similarity.hyperplaneBuckets (plane-literal
  // transform of aggregate(zip_with) dots, then a sign-bit fold per
  // band) — kept here verbatim as the executable spec.
  private def composedBands(
      embCol: org.apache.spark.sql.Column,
      nPlanes: Int, bands: Int, dim: Int): org.apache.spark.sql.Column = {
    import org.apache.spark.sql.functions._
    val planes = (0 until nPlanes).map { p =>
      (0 until dim).map(i => Similarity.planeWeight(p, i))
    }
    val planesCol = array(planes.map(p => array(p.map(lit): _*)): _*)
    val rowsPerBand = nPlanes / bands
    val dots = transform(planesCol, plane =>
      aggregate(zip_with(embCol, plane, (x, w) => x.cast("double") * w),
        lit(0.0), (acc, x) => acc + x))
    array((0 until bands).map { bi =>
      aggregate(slice(dots, bi * rowsPerBand + 1, rowsPerBand),
        struct(lit(0L).as("sig"), lit(1L).as("bit")),
        (acc, dd) => struct(
          when(dd >= 0, acc.getField("sig").bitwiseOR(acc.getField("bit")))
            .otherwise(acc.getField("sig")).as("sig"),
          (acc.getField("bit") * 2).as("bit")),
        acc => acc.getField("sig"))
    }: _*)
  }

  test("graft_hyperplane_bands is BIT-exact with the composed band folds on real data") {
    import org.apache.spark.sql.functions._
    Seq((56, 8), (88, 8), (16, 4)).foreach { case (np, nb) =>
      val diff = emb.select(
          VectorFunctions.graftHyperplaneBands($"embedding", np, nb, 64).as("a"),
          composedBands($"embedding", np, nb, 64).as("b"))
        .filter(not($"a" <=> $"b")).count()
      assert(diff == 0, s"bands differ for nPlanes=$np bands=$nb")
    }
  }

  test("graft_hyperplane_bands edge behavior matches the composed form") {
    import org.apache.spark.sql.functions._
    // null embedding, wrong dimension, null element: composed dots go
    // null and every sign test takes the otherwise branch → all-zero
    // buckets (never a null array)
    val rows = Seq(
      (1L, Some(Seq.fill(64)(Some(0.5f)))),               // normal
      (2L, None),                                         // null emb
      (3L, Some(Seq.fill(32)(Some(0.5f)))),               // short
      (4L, Some(Seq.fill(70)(Some(0.5f)))),               // long
      (5L, Some(Seq.tabulate(64)(i =>
        if (i == 7) None else Some(0.5f)))),              // null element
      (6L, Some(Seq.fill(64)(Some(0.0f)))))               // zero vector
      .toDF("id", "embedding")
      .select($"id", $"embedding".cast("array<float>").as("embedding"))
    val got = rows.select($"id",
        VectorFunctions.graftHyperplaneBands($"embedding", 16, 4, 64).as("a"),
        composedBands($"embedding", 16, 4, 64).as("b"))
      .collect()
    got.foreach { r =>
      assert(!r.isNullAt(1), s"kernel returned null for id=${r.getLong(0)}")
      assert(r.getSeq[Long](1) == r.getSeq[Long](2),
        s"edge mismatch for id=${r.getLong(0)}: " +
          s"${r.getSeq[Long](1)} vs ${r.getSeq[Long](2)}")
    }
  }

  test("graft_hyperplane_bands: interpreted eval agrees with codegen") {
    val expr = VectorFunctions.graftHyperplaneBands($"embedding", 56, 8, 64)
    val withCodegen = emb.limit(50).select($"vec_id", expr.as("b"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    spark.conf.set("spark.sql.codegen.wholeStage", "false")
    spark.conf.set("spark.sql.codegen.factoryMode", "NO_CODEGEN")
    try {
      val interpreted = emb.limit(50).select($"vec_id", expr.as("b"))
        .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
      assert(withCodegen == interpreted)
    } finally {
      spark.conf.set("spark.sql.codegen.wholeStage", "true")
      spark.conf.set("spark.sql.codegen.factoryMode", "FALLBACK")
    }
  }

  test("graft_hyperplane_bands is callable from SQL") {
    emb.limit(3).createOrReplaceTempView("vx_emb")
    val r = spark.sql(
      "SELECT graft_hyperplane_bands(embedding, 16, 4, 64) AS b FROM vx_emb")
      .collect()
    assert(r.forall(_.getSeq[Long](0).length == 4))
  }
}
