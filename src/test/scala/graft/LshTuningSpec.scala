package graft

import graft.operators.LshTuning
import org.scalatest.funsuite.AnyFunSuite

/** The LSH planning rules: banding must stay on the target threshold
  * (MinHash) / keep bucket occupancy bounded (sign-LSH) as the inputs
  * scale — the "retune r as the corpus grows" contract, computed. */
class LshTuningSpec extends AnyFunSuite {

  test("minhash banding hits the documented τ=0.5 / 64-seed plan") {
    assert(LshTuning.minhashBands(0.5, 64) == (4, 16))
    // and its S-curve threshold is exactly the target
    assert(LshTuning.minhashThreshold(4, 16) == 0.5)
  }

  test("minhash banding sharpens with the seed budget at fixed τ") {
    val budgets = Seq(8, 64, 512, 4096)
    val rows = budgets.map(b => LshTuning.minhashBands(0.5, b)._1)
    assert(rows == rows.sorted, s"rows-per-band must not shrink: $rows")
    assert(rows.last > rows.head)
    budgets.foreach { budget =>
      val (r, b) = LshTuning.minhashBands(0.5, budget)
      assert(b * r <= budget, "seed budget respected")
      val t = LshTuning.minhashThreshold(r, b)
      assert(t > 0.35 && t < 0.65, s"threshold drifted to $t at budget $budget")
    }
  }

  test("minhash recall at the dup band stays high for every budget") {
    Seq(8, 64, 512).foreach { budget =>
      val (r, b) = LshTuning.minhashBands(0.5, budget)
      assert(LshTuning.recall(0.97, r, b) > 0.95,
        s"J=0.97 dup recall too low at budget $budget: (r=$r, b=$b)")
    }
  }

  test("sign-LSH bits track log2(n), bucket occupancy stays O(1)") {
    assert(LshTuning.signBits(500, 96) == (9, 10))
    assert(LshTuning.signBits(5000, 96) == (13, 7))
    Seq(100L, 1000L, 100000L, 10000000L).foreach { n =>
      val (r, b) = LshTuning.signBits(n, 96)
      assert(b * r <= 96)
      // expected bucket population n / 2^r is O(1) once log2 n <= maxBits
      if (r < 24) assert(n.toDouble / math.pow(2, r) <= 1.0 + 1e-9,
        s"bucket occupancy ${n.toDouble / math.pow(2, r)} at n=$n")
    }
    // the fixed 96-plane budget holds τ=0.99 recall through ~1e5 vectors
    Seq(500L, 5000L, 100000L).foreach { n =>
      val (r, b) = LshTuning.signBits(n, 96)
      assert(LshTuning.recall(0.955, r, b) > 0.95,
        s"τ=0.99 recall too low at n=$n: (r=$r, b=$b)")
    }
  }

  test("sign-LSH plane budget scales to hold recall at any corpus size") {
    // signPlanes is the corpus-scale knob: recall stays >= target when
    // the budget it returns is used, where a fixed 96 would decay
    Seq(1000L, 100000L, 10000000L, 10000000000L).foreach { n =>
      val planes = LshTuning.signPlanes(n)
      val (r, b) = LshTuning.signBits(n, planes)
      assert(LshTuning.recall(0.955, r, b) >= 0.99,
        s"recall target missed at n=$n with $planes planes (r=$r, b=$b)")
    }
    // and the budget grows monotonically with the corpus
    val budgets = Seq(1000L, 1000000L, 1000000000L).map(LshTuning.signPlanes(_))
    assert(budgets == budgets.sorted)
  }
}
