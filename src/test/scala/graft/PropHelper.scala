package graft

import org.scalacheck.{Prop, Test => SCTest}

/** Raw-ScalaCheck bridge (scalatestplus is not in the offline cache). */
trait PropHelper {
  def checkProp(prop: Prop, minSuccessful: Int = 30): Unit = {
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(minSuccessful), prop)
    assert(res.passed, s"property failed: ${res.status}")
  }
}
