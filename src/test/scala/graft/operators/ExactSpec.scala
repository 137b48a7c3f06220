package graft.operators

import graft.{PropHelper, SparkSpec}
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop}
import org.scalacheck.Prop.propBoolean

/** Property: quantized aggregation (operators.Exact) is independent of
  * partitioning — the whole reason it exists. Random 2-decimal money
  * values, random repartitionings: the cent-sum must equal the exact
  * BigDecimal sum every time, and must not vary across partition counts.
  * (A plain double sum fails the bit-equality half of this property for
  * adversarial value sets.)
  */
class ExactSpec extends SparkSpec with PropHelper {
  import spark.implicits._

  private val moneyGen: Gen[List[Double]] =
    Gen.listOfN(200, Gen.chooseNum(0L, 99999999L).map(_ / 100.0))

  test("cent-sums equal the exact decimal sum under any partitioning") {
    checkProp(Prop.forAll(moneyGen, Gen.chooseNum(1, 16)) { (xs, nPart) =>
      xs.nonEmpty ==> {
        val expected = xs.map(x => BigDecimal(math.round(x * 100)))
          .sum.toLong
        val got = xs.toDF("v").repartition(nPart)
          .agg(sum(Exact.cents(col("v"))).as("s"))
          .head.getLong(0)
        got == expected
      }
    }, minSuccessful = 20)
  }

  test("fix() quantization is stable across partition counts") {
    val xs = Seq.tabulate(500)(i => math.sqrt(i + 1) * math.Pi)
    val results = Seq(1, 3, 8, 16).map { n =>
      xs.toDF("v").repartition(n)
        .agg(sum(Exact.fix(col("v"), 6)).as("s")).head.getLong(0)
    }
    assert(results.distinct.size == 1, s"partition-dependent sums: $results")
  }
}
