package graft.ops

import org.scalatest.funsuite.AnyFunSuite

/** Pins the Hilbert kernel's defining properties — the ones Z-order
  * does NOT have — plus the exact base-case orientation, so any edit to
  * the rotation algebra (either engine side derives from this loop)
  * fails loudly. */
class HilbertSpec extends AnyFunSuite {

  test("base case (bits=1): the canonical U walk (0,0)->(0,1)->(1,1)->(1,0)") {
    assert(Hilbert.d2(0, 0, 1) == 0L)
    assert(Hilbert.d2(0, 1, 1) == 1L)
    assert(Hilbert.d2(1, 1, 1) == 2L)
    assert(Hilbert.d2(1, 0, 1) == 3L)
  }

  test("bijection: every cell of the 32x32 grid gets a distinct index in range") {
    val bits = 5
    val n = 1 << bits
    val ds = for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.d2(x.toLong, y.toLong, bits)
    assert(ds.toSet == (0 until n * n).map(_.toLong).toSet)
  }

  test("locality: consecutive indices are ALWAYS adjacent cells (unit step)") {
    val bits = 5
    val n = 1 << bits
    val cellOf = (for (x <- 0 until n; y <- 0 until n)
      yield Hilbert.d2(x.toLong, y.toLong, bits) -> (x, y)).toMap
    for (d <- 0 until n * n - 1) {
      val (x1, y1) = cellOf(d.toLong)
      val (x2, y2) = cellOf(d.toLong + 1)
      assert(math.abs(x1 - x2) + math.abs(y1 - y2) == 1,
        s"d=$d jumps from ($x1,$y1) to ($x2,$y2)")
    }
    // Morton, by contrast, jumps: its quadrant seam (d=3 -> 4 at bits=2)
    // moves diagonally — the property Hilbert buys over ZOrder
    val mortonCell = (for (x <- 0 until 4; y <- 0 until 4) yield {
      val m = (0 until 2).map(i => (((x >> i) & 1) << (2 * i)) +
        (((y >> i) & 1) << (2 * i + 1))).sum
      m -> (x, y)
    }).toMap
    val (mx1, my1) = mortonCell(3)
    val (mx2, my2) = mortonCell(4)
    assert(math.abs(mx1 - mx2) + math.abs(my1 - my2) > 1)
  }

  test("nesting: the top-left quadrant at bits=k is the full curve at bits=k-1") {
    // first quarter of the bits=3 walk stays inside one 4x4 quadrant and
    // visits it completely (the recursive self-similarity)
    val bits = 3
    val n = 1 << bits
    val firstQuarter = (for (x <- 0 until n; y <- 0 until n
                             if Hilbert.d2(x.toLong, y.toLong, bits) < n * n / 4)
      yield (x, y)).toSet
    assert(firstQuarter.size == n * n / 4)
    val xs = firstQuarter.map(_._1); val ys = firstQuarter.map(_._2)
    assert(xs.max - xs.min == n / 2 - 1 && ys.max - ys.min == n / 2 - 1,
      s"first quarter is not one quadrant: $firstQuarter")
  }
}
