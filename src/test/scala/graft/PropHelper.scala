package graft

import org.scalacheck.{Gen, Prop, Test => SCTest}
import org.scalacheck.rng.Seed

/** Minimal scalatest<->scalacheck bridge (scalatestplus is not in the
  * offline dependency cache; raw scalacheck is).
  */
trait PropHelper {
  def checkProp(prop: Prop, minSuccessful: Int = 100): Unit = {
    val params = SCTest.Parameters.default
      .withMinSuccessfulTests(minSuccessful)
      .withInitialSeed(Seed(42L))
    val res = SCTest.check(params, prop)
    assert(res.passed, s"property failed: ${res.status}")
  }

  def forAllProp[A](g: Gen[A], minSuccessful: Int = 100)(f: A => Boolean): Unit =
    checkProp(Prop.forAll(g)(f), minSuccessful)
}
