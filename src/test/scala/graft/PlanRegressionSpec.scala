package graft

import graft.tools.PlanSnap
import org.scalatest.funsuite.AnyFunSuite

/** Plan-snapshot regression gate: every headline query's executed-plan
  * operator skeleton must match its golden file byte-for-byte. An added
  * Exchange, a broadcast→sort-merge flip, or a lost codegen span fails
  * HERE, with a line diff, instead of surfacing as a bench regression a
  * round later. After a DELIBERATE plan change, regenerate with
  * `sbt "runMain graft.tools.PlanSnap"` and review the git diff.
  */
class PlanRegressionSpec extends AnyFunSuite {
  import TestSpark._

  private val dir = "/root/testdata/sf0.001"

  private def golden(name: String): String = {
    val p = java.nio.file.Paths.get(PlanSnap.SnapshotDir, s"$name.plan")
    assert(java.nio.file.Files.exists(p),
      s"missing golden snapshot $p — run: sbt \"runMain graft.tools.PlanSnap $name\"")
    java.nio.file.Files.readString(p).stripLineEnd
  }

  private def diff(want: String, got: String): String = {
    val w = want.linesIterator.toVector
    val g = got.linesIterator.toVector
    (0 until math.max(w.size, g.size)).collect {
      case i if w.lift(i) != g.lift(i) =>
        f"  line ${i + 1}%3d: golden=${w.lift(i).getOrElse("∅")}  actual=${g.lift(i).getOrElse("∅")}"
    }.take(12).mkString("\n")
  }

  (PlanSnap.Headline ++ PlanSnap.Seams.keys.toSeq.sorted).foreach { name =>
    test(s"$name plan skeleton matches its golden snapshot") {
      val got = PlanSnap.capture(spark, name, dir)
      val want = golden(name)
      assert(got == want,
        s"\nplan shape changed for $name — if deliberate, regenerate the snapshot" +
          s" (sbt \"runMain graft.tools.PlanSnap $name\") and review the diff:\n" +
          diff(want, got))
    }
  }
}
