package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.Bridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Native codegen'd cosine similarity over two float-array columns.
  *
  * Semantics are EXACTLY the sequential double fold of
  * graft.similarity.Similarity (dot and both norms accumulated
  * element-by-element in doubles, then dot / (sqrt(na)*sqrt(nb))) — so it
  * is interchangeable with the composed `aggregate(zip_with(...))` form
  * and stays bit-exact with the DuckDB oracle. The difference is cost:
  * the composed form materializes a zipped intermediate array and runs
  * three lambda-driven folds per row; this expression is a single fused
  * loop with no allocation, generated straight into the enclosing
  * WholeStageCodegen stage — the difference matters when scoring billions
  * of vectors.
  */
case class CosineSimilarity(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_cosine expects two array<float> args, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_cosine"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var dot = 0.0
    var na = 0.0
    var nb = 0.0
    var i = 0
    while (i < n) {
      val xi = x.getFloat(i).toDouble
      val yi = y.getFloat(i).toDouble
      dot += xi * yi
      na += xi * xi
      nb += yi * yi
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val dot = ctx.freshName("dot")
      val na = ctx.freshName("na")
      val nb = ctx.freshName("nb")
      val xi = ctx.freshName("xi")
      val yi = ctx.freshName("yi")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $xi = (double) $a.getFloat($i);
         |  double $yi = (double) $b.getFloat($i);
         |  $dot += $xi * $yi; $na += $xi * $xi; $nb += $yi * $yi;
         |}
         |${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Native squared-L2 distance over two float-array columns — the
  * k-means assignment kernel. Same contract as [[CosineSimilarity]]:
  * bit-exact with the composed `aggregate(zip_with(...))` sequential
  * double fold (Σ (x−y)² accumulated element-by-element), but a single
  * fused loop with no intermediate zipped array. The fold shape matters
  * doubly here because assignment evaluates it k times per row inside a
  * higher-order `transform` (which Spark interprets): the composed form
  * allocates and lambda-dispatches per element per centroid, this one
  * runs a tight primitive loop per centroid.
  */
case class L2SquaredDistance(left: Expression, right: Expression)
    extends BinaryExpression {

  override def checkInputDataTypes(): TypeCheckResult = {
    val ok = Seq(left, right).forall(_.dataType match {
      case ArrayType(FloatType, _) => true
      case _ => false
    })
    if (ok) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"graft_l2sq expects two array<float> args, got " +
        s"(${left.dataType.catalogString}, ${right.dataType.catalogString})")
  }
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "graft_l2sq"

  override def nullSafeEval(a: Any, b: Any): Any = {
    val x = a.asInstanceOf[ArrayData]
    val y = b.asInstanceOf[ArrayData]
    val n = math.min(x.numElements(), y.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val d = x.getFloat(i).toDouble - y.getFloat(i).toDouble
      acc += d * d
      i += 1
    }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val n = ctx.freshName("n")
      val i = ctx.freshName("i")
      val acc = ctx.freshName("acc")
      val d = ctx.freshName("d")
      s"""
         |int $n = java.lang.Math.min($a.numElements(), $b.numElements());
         |double $acc = 0.0;
         |for (int $i = 0; $i < $n; $i++) {
         |  double $d = (double) $a.getFloat($i) - (double) $b.getFloat($i);
         |  $acc += $d * $d;
         |}
         |${ev.value} = $acc;
       """.stripMargin
    })

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Column-level entry points for the native vector expressions. */
/** Native hyperplane-LSH band buckets over a float-array column: all
  * `bands` sign-bit buckets of the `nPlanes`-plane random-hyperplane
  * signature in ONE fused loop — array<long> of length `bands`, bucket
  * bit j of band bi = sign of plane bi·(nPlanes/bands)+j.
  *
  * Semantics are EXACTLY the composed higher-order form of
  * `Similarity.hyperplaneBuckets` (per plane a left-associated
  * `aggregate(zip_with(emb, plane, (x, w) -> double(x)·w), 0.0, +)`
  * dot, then per band a sign-bit fold with the bit doubling per
  * plane), including its edge behavior — a null embedding, a
  * dimension mismatch against the planes, or a null element yields
  * every-band bucket 0 (the composed form's null dots take the
  * `otherwise` branch of every sign test), and a NaN dot sets its bit
  * (Spark's interpreted double ordering ranks NaN above zero) — so it
  * is a pure cost rewrite, asserted bit-for-bit in
  * VectorExpressionsSpec. The difference is cost: higher-order
  * functions run INTERPRETED, so the composed form allocates a zipped
  * array and dispatches a lambda per element PER PLANE per row —
  * 56–88 planes × 64 dims of boxed arithmetic on every corpus vector
  * in the q30/q243/q286 family. Plane weights come from the pinned
  * [[HyperplaneBandsExpr.planeWeight]] (the q30/q102/q106 oracles bake
  * these constants), precomputed once per expression instance.
  */
case class HyperplaneBandsExpr(child: Expression, nPlanes: Int, bands: Int, dim: Int)
    extends org.apache.spark.sql.catalyst.expressions.UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
  import org.apache.spark.sql.types.LongType

  @transient private lazy val planes: Array[Array[Double]] =
    Array.tabulate(nPlanes, dim)((p, i) => HyperplaneBandsExpr.planeWeight(p, i))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) =>
      if (nPlanes > 0 && bands > 0 && nPlanes % bands == 0 &&
        nPlanes / bands <= 63 && dim > 0) TypeCheckResult.TypeCheckSuccess
      else TypeCheckResult.TypeCheckFailure(
        s"graft_hyperplane_bands: bad sizing nPlanes=$nPlanes bands=$bands dim=$dim")
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_hyperplane_bands expects array<float>, got ${other.catalogString}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  // never null: the composed form maps a null/malformed embedding to
  // all-zero buckets, not to null (the pair stage later drops such
  // rows at the cosine filter, but bucket-stat consumers see the rows)
  override def nullable: Boolean = false
  override def prettyName: String = "graft_hyperplane_bands"

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    HyperplaneBandsExpr.compute(
      if (v == null) null else v.asInstanceOf[ArrayData], planes, bands)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("planes", planes, "double[][]")
    val helper = HyperplaneBandsExpr.getClass.getName.stripSuffix("$") + "$.MODULE$"
    ev.copy(
      code = code"""
        |${c.code}
        |org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        |  $helper.compute(${c.isNull} ? null : ${c.value}, $planesRef, $bands);
        |""".stripMargin,
      isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object HyperplaneBandsExpr {
  /** The pinned plane-weight constants — deliberately the (deprecated)
    * MurmurHash3 productHash: the q30/q102/q106 oracles bake these as
    * SQL literals, so the hash must never drift (Similarity.planeWeight
    * delegates here — ONE definition).
    */
  def planeWeight(p: Int, i: Int): Double =
    scala.util.hashing.MurmurHash3.productHash((p, i)).toDouble / Int.MaxValue

  /** Fused band-bucket loop, shared by eval and codegen. */
  def compute(
      emb: ArrayData,
      planes: Array[Array[Double]],
      bands: Int): org.apache.spark.sql.catalyst.util.GenericArrayData = {
    val nPlanes = planes.length
    val rowsPerBand = nPlanes / bands
    val dim = if (nPlanes > 0) planes(0).length else 0
    val out = new Array[Long](bands)
    var ok = emb != null && emb.numElements() == dim
    if (ok) {
      var i = 0
      while (i < dim) {
        if (emb.isNullAt(i)) { ok = false; i = dim } else i += 1
      }
    }
    if (ok) {
      val v = new Array[Double](dim)
      var i = 0
      while (i < dim) { v(i) = emb.getFloat(i).toDouble; i += 1 }
      var bi = 0
      while (bi < bands) {
        var sig = 0L
        var bit = 1L
        var j = 0
        while (j < rowsPerBand) {
          val w = planes(bi * rowsPerBand + j)
          var d = 0.0
          var k = 0
          while (k < dim) { d += v(k) * w(k); k += 1 }
          // interpreted Spark ranks NaN above zero, so a NaN dot SETS
          // its bit — matched exactly
          if (d >= 0 || java.lang.Double.isNaN(d)) sig |= bit
          bit *= 2
          j += 1
        }
        out(bi) = sig
        bi += 1
      }
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }
}

object VectorFunctions {
  def graftCosine(a: Column, b: Column): Column =
    Bridge.column(CosineSimilarity(Bridge.expression(a), Bridge.expression(b)))
  def graftL2sq(a: Column, b: Column): Column =
    Bridge.column(L2SquaredDistance(Bridge.expression(a), Bridge.expression(b)))
  def graftHyperplaneBands(
      emb: Column, nPlanes: Int, bands: Int, dim: Int): Column =
    Bridge.column(HyperplaneBandsExpr(Bridge.expression(emb), nPlanes, bands, dim))
}
