package graft.testkit

import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Minimal deterministic property harness (the scalatest-scalacheck bridge
  * artifact is not in the offline cache). */
object Props {
  def forAllN[A](gen: Gen[A], n: Int = 100)(f: A => Unit): Unit = {
    var seed = Seed(42L)
    var i = 0
    while (i < n) {
      val a = gen.pureApply(Gen.Parameters.default, seed, retries = 1000)
      try f(a)
      catch {
        case e: Throwable =>
          throw new AssertionError(s"property failed for input: $a (iteration $i)", e)
      }
      seed = seed.next
      i += 1
    }
  }
}
