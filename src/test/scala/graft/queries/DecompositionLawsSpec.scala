package graft.queries

import org.scalatest.funsuite.AnyFunSuite
import org.scalacheck.Gen
import graft.testkit.Props.forAllN

/** Property laws for the session's pure decomposition kernels — the math
  * the distributed queries rely on, checked exhaustively over random
  * inputs (no SparkSession needed; the queries themselves are gated by the
  * DuckDB oracles at five scale factors).
  */
class DecompositionLawsSpec extends AnyFunSuite {

  // ---- x09: Hamilton apportionment -----------------------------------

  private val strataGen: Gen[Seq[((String, String), Long)]] = for {
    k <- Gen.choose(1, 40)
    masses <- Gen.listOfN(k, Gen.choose(1L, 100000L))
  } yield masses.zipWithIndex.map { case (m, i) => ((s"s$i", s"l${i % 5}"), m) }

  test("Hamilton: quotas sum to the budget exactly and stay within [floor, ceil] of the share") {
    forAllN(strataGen.flatMap(st => Gen.choose(0L, 5000L).map((st, _)))) { case (strata, budget0) =>
      val n = strata.map(_._2).sum
      val budget = budget0 min n // more seats than members is out of contract
      val quotas = TextQueries.hamiltonApportion(strata, budget)
      assert(quotas.map(_._2).sum == budget, "budget must be hit exactly")
      val byKey = quotas.toMap
      strata.foreach { case (k, m) =>
        val share = budget.toDouble * m / n
        val q = byKey(k)
        assert(q >= math.floor(share).toLong && q <= math.ceil(share).toLong,
          s"quota $q for share $share violates Hamilton's bound")
        assert(q >= 0L && q <= m)
      }
    }
  }

  test("Hamilton: permutation-invariant up to the deterministic tie order") {
    forAllN(strataGen.flatMap(st => Gen.choose(1L, 1000L).map((st, _)))) { case (strata, budget0) =>
      val budget = budget0 min strata.map(_._2).sum
      val a = TextQueries.hamiltonApportion(strata, budget).toMap
      val b = TextQueries.hamiltonApportion(scala.util.Random.shuffle(strata), budget).toMap
      assert(a == b, "input order must not change any quota")
    }
  }

  // ---- x08: skyline distributivity ------------------------------------

  private val pointsGen: Gen[List[SkyPoint]] = for {
    k <- Gen.choose(0, 120)
    pts <- Gen.listOfN(k, for {
      nt <- Gen.choose(1L, 30L); ttr <- Gen.choose(1L, 10L); run <- Gen.choose(1L, 8L)
    } yield (nt, ttr, run))
  } yield pts.zipWithIndex.map { case ((nt, ttr, run), i) => SkyPoint(i.toLong, nt, ttr, run) }

  private def naiveSkyline(pts: List[SkyPoint]): Set[Long] =
    pts.filter(p => !pts.exists(q => TextQueries.skyDominates(q, p))).map(_.doc_id).toSet

  test("skyline: one BNL pass equals the naive dominance filter") {
    forAllN(pointsGen) { pts =>
      val got = TextQueries.skylinePass(pts.iterator).map(_.doc_id).toSet
      assert(got == naiveSkyline(pts))
    }
  }

  test("skyline: distributive — merging local frontiers of ANY partitioning gives the global frontier") {
    forAllN(pointsGen.flatMap(p => Gen.choose(1, 7).map((p, _)))) { case (pts, nParts) =>
      val parts = pts.zipWithIndex.groupBy(_._2 % nParts).values.map(_.map(_._1))
      val locals = parts.flatMap(p => TextQueries.skylinePass(p.iterator)).toList
      val merged = TextQueries.skylinePass(locals.iterator).map(_.doc_id).toSet
      assert(merged == naiveSkyline(pts),
        "skyline(U skyline(Pi)) must equal skyline(U Pi) for every partitioning")
    }
  }
}
