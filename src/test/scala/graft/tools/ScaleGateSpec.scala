package graft.tools

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testkit.Props.forAllN

/** The deque-sweep kernel is scale-gate EVIDENCE infrastructure — if the
  * gate itself were wrong it could bless a broken decomposition, so the
  * kernel is pinned against brute force here. */
class ScaleGateSpec extends AnyFunSuite {

  private val win = 100L

  private def brute(events: Seq[(Long, Long)], errors: Seq[(Long, Long)]): Map[Long, (Long, Long)] =
    errors.flatMap { case (id, t) =>
      val w = events.collect { case (us, c) if us >= t - win && us < t => c }
      if (w.isEmpty) None else Some(id -> (w.min, w.max))
    }.toMap

  private def viaSweep(events: Seq[(Long, Long)], errors: Seq[(Long, Long)]): Map[Long, (Long, Long)] = {
    val rows = (events.map { case (us, c) => (0L, us, c, 0L, 0L) } ++
      errors.map { case (id, t) => (0L, t, 0L, 1L, id) }).toArray
    ScaleGate.sweepBucket(rows, win).map { case (id, lo, hi) => id -> (lo, hi) }.toMap
  }

  test("deque sweep equals brute-force window extrema (random streams)") {
    val gen = for {
      n <- Gen.choose(0, 120)
      m <- Gen.choose(1, 40)
      evs <- Gen.listOfN(n, Gen.zip(Gen.choose(0L, 500L), Gen.choose(-1000L, 1000L)))
      errs <- Gen.listOfN(m, Gen.choose(0L, 500L))
    } yield (evs, errs.zipWithIndex.map { case (t, i) => (i.toLong, t) })
    forAllN(gen, 200) { case (evs, errs) =>
      assert(viaSweep(evs, errs) == brute(evs, errs))
    }
  }

  test("boundary semantics: us == t excluded, us == t - w included, ties error-first") {
    // window is [t - w, t): the event AT t must not count, the event AT
    // t - w must
    val errors = Seq((1L, 200L))
    assert(viaSweep(Seq((200L, 5L)), errors).isEmpty)
    assert(viaSweep(Seq((100L, 7L)), errors) == Map(1L -> (7L, 7L)))
    assert(viaSweep(Seq((199L, 3L), (200L, -9L)), errors) == Map(1L -> (3L, 3L)))
    // duplicate cents across the window keep extrema stable
    assert(viaSweep(Seq((150L, 4L), (160L, 4L), (170L, 2L)), errors) == Map(1L -> (2L, 4L)))
  }
}
