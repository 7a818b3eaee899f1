package graft

import org.scalatest.funsuite.AnyFunSuite

/** The bench contention gate (pure decision logic — the measured inputs are
  * exercised by the bench run itself).
  *
  * The r8 failure mode this pins: steady external load inflated every pass
  * of every query uniformly, so max/min pass spread stayed at 1.6 and the
  * worsening fraction stayed low — `contended: false` on an artifact whose
  * numbers were 2-20× off. Only an absolute throughput reference catches
  * that shape.
  */
class BenchGateSpec extends AnyFunSuite {

  test("quiet run: relative stats quiet, canary at best -> not contended") {
    assert(!Bench.contendedVerdict(medianSpread = 1.2, worsening = 0.1,
      maxLoad = 8.0, cpus = 32, canaryNow = 5000, canaryBest = 5074))
  }

  test("synthetic steady load: spread 1.0 but canary at half best -> contended") {
    // all passes uniformly 2x slower: spread/worsening/load all look quiet
    assert(Bench.contendedVerdict(medianSpread = 1.0, worsening = 0.0,
      maxLoad = 4.0, cpus = 32, canaryNow = 2500, canaryBest = 5074))
  }

  test("the exact r8 artifact shape trips: spread 1.60, canary 329 vs best 4951") {
    assert(Bench.contendedVerdict(medianSpread = 1.60, worsening = 0.2,
      maxLoad = 20.0, cpus = 32, canaryNow = 329, canaryBest = 4951))
  }

  test("canary threshold is 60% of stored best") {
    assert(!Bench.canaryTrips(nowMbps = 3050, bestMbps = 5000)) // 61%
    assert(Bench.canaryTrips(nowMbps = 2950, bestMbps = 5000)) // 59%
  }

  test("fresh machine (no stored best) never trips on the canary alone") {
    assert(!Bench.canaryTrips(nowMbps = 100, bestMbps = 0.0))
    assert(!Bench.contendedVerdict(medianSpread = 1.1, worsening = 0.0,
      maxLoad = 2.0, cpus = 32, canaryNow = 100, canaryBest = 0.0))
  }

  test("ramping load still trips through the relative statistics") {
    assert(Bench.contendedVerdict(medianSpread = 2.5, worsening = 0.1,
      maxLoad = 2.0, cpus = 32, canaryNow = 5000, canaryBest = 5074))
    assert(Bench.contendedVerdict(medianSpread = 1.1, worsening = 0.5,
      maxLoad = 2.0, cpus = 32, canaryNow = 5000, canaryBest = 5074))
    assert(Bench.contendedVerdict(medianSpread = 1.1, worsening = 0.1,
      maxLoad = 60.0, cpus = 32, canaryNow = 5000, canaryBest = 5074))
  }
}
