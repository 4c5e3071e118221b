package graft

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Deterministic sampling from ScalaCheck generators — the
  * scalatestplus bridge is not on the (offline) test classpath, so
  * property-style tests draw a fixed-seed sample and assert over it. */
object PropSampling {
  def sample[A](g: Gen[A], n: Int = 200): Seq[A] = {
    val p = Gen.Parameters.default
    Iterator.from(0)
      .map(i => g.apply(p, Seed(42L + i)))
      .collect { case Some(a) => a }
      .take(n)
      .toSeq
  }
}
