package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** The Misra–Gries shrink rule's selection pass: the (k+1)-th largest
  * counter, found WITHOUT a sort (min scan at the saturated size k+1,
  * quickselect past it). Checked against the sorted reading on every
  * shape the sketches produce.
  */
class MgSelectSpec extends AnyFunSuite {

  private def bySort(vals: Array[Long], k: Int): Long =
    vals.sorted(Ordering[Long].reverse)(k)

  test("saturated-update case (exactly k+1 values) is the minimum") {
    val vals = Array(9L, 3L, 7L, 1L, 5L)
    assert(MgSelect.kPlus1thLargest(vals.clone(), 4) == 1L)
    assert(MgSelect.kPlus1thLargest(vals.clone(), 4) ==
      bySort(vals, 4))
  }

  test("merge case (up to 2k values) matches the sorted (k+1)-th " +
      "largest on adversarial shapes: ties, sorted runs, all-equal") {
    val shapes = Seq(
      Array(5L, 5L, 5L, 5L, 5L, 5L),                    // all equal
      (1L to 16L).toArray,                              // ascending run
      (1L to 16L).reverse.toArray,                      // descending run
      Array(10L, 10L, 2L, 2L, 7L, 7L, 7L, 1L),          // heavy ties
      Array(Long.MaxValue, 1L, Long.MaxValue - 1, 2L, 3L))
    for (vals <- shapes; k <- 1 until vals.length) {
      val got = MgSelect.kPlus1thLargest(vals.clone(), k)
      assert(got == bySort(vals, k),
        s"k=$k over ${vals.mkString(",")}: got $got")
    }
  }

  test("decrementing by the selected value leaves at most k positive " +
      "counters (the shrink invariant)") {
    val vals = Array(10L, 10L, 2L, 2L, 7L, 7L, 7L, 1L)
    for (k <- 1 until vals.length) {
      val d = MgSelect.kPlus1thLargest(vals.clone(), k)
      assert(vals.count(_ - d > 0) <= k, s"k=$k d=$d")
    }
  }
}
