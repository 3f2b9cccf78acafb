package graft.data

import graft.extract.Normalizer
import org.scalatest.funsuite.AnyFunSuite

/** Semantic invariants behind the z1 / t6 / r1 driver oracles — these
  * pin the Scala side of each analytic oracle to the real operators, so
  * the literals in SparkEntry.oracleSql cannot drift silently.
  */
class QueryFixturesSpec extends AnyFunSuite {

  test("t6 word pairs: clean side IS the normalizer output for the noisy side") {
    QueryFixtures.NoisyWords.zip(QueryFixtures.CleanWords).foreach {
      case (noisy, clean) =>
        assert(Normalizer.normalize(noisy) == clean, s"pair $noisy")
    }
  }

  test("z1: low-confidence zone is filtered BEFORE merging, order is reading order") {
    for (d <- 0L until 64L) {
      val rows = QueryFixtures.zoneRows(d).toSeq
      val clusters = (d % 3).toInt + 1
      val expected = clusters + (if (d % 2 == 0) 1 else 0)
      assert(rows.size == expected, s"d=$d")
      // if the low-conf zone survived the filter it would merge into
      // chain 0 and grow its bbox to y2 = 105
      assert(rows.forall(_._6 == 50), s"d=$d leaked the low-confidence zone")
      // final order indexes 0..n-1 with x1 strictly increasing
      assert(rows.map(_._2) == rows.indices)
      assert(rows.map(_._3) == rows.map(_._3).sorted)
      assert(rows.filter(_._7 == "text").forall(r => r._8 >= 0.5 && r._8 <= 0.99))
      assert(rows.count(_._7 == "figure") == (if (d % 2 == 0) 1 else 0))
    }
  }

  test("z1: merged confidence equals the closed-form area-weighted mean") {
    // d=37, c=1 is the worst 4-decimal rounding-margin case for d < 100000
    val rows = QueryFixtures.zoneRows(37).toSeq
    val ks = (0 until 3).map(j => ((37 + 7 + 3 * j) % 50) + 50)
    val want = (ks(0) * 4000.0 + ks(1) * 4500.0 + ks(2) * 5000.0) / 1350000.0
    assert(math.abs(rows(1)._8 - want) < 1e-12)
  }

  test("p4: XY-cut emits header / columns / footer regardless of input order") {
    val (_, even) = QueryFixtures.pdfLayoutRow(0)
    // d=0: a=alpha b=brick c=cloud,delta,eagle r=frost,grape,house
    assert(even ==
      "alpha brick\n\ncloud\ndelta\neagle\n\nfrost\ngrape\nhouse\n\nf end")
    val (_, odd) = QueryFixtures.pdfLayoutRow(1)
    // d=1: a=brick c=house,alpha,brick (indices 7,0,1)
    assert(odd == "brick\n\nhouse\nalpha\nbrick\n\nf end")
    // malformed entries are skipped, escapes decoded: both already
    // asserted by the strings above ("junk"/"x@y,z" absent, "f end")
  }

  test("h1: boilerplate vanishes, inline link survives, markdown decorates") {
    val (_, plain, md) = QueryFixtures.htmlRow(0)
    // d=0: t0=W(0)=alpha, h=W(1)=brick, content c_j=W(j) for j=0..5,
    // inline-link words il_j = W(0*7+j) = w[j] → alpha brick cloud delta
    assert(plain ==
      "alpha\n\nbrick\n\nalpha brick cloud & delta eagle frost\n\nalpha brick cloud delta")
    assert(md ==
      "# alpha\n\n# brick\n\nalpha brick cloud & delta eagle frost\n\nalpha brick cloud delta")
    // nav word W(2)=cloud appears only via content indices; assert the
    // dropped-block MARKERS never leak instead
    assert(!plain.contains("x" * 10) && !plain.contains("chrome comment"))
  }

  test("r1 branches: dispatch reject, survivor drop, all truncation modes") {
    val r0 = QueryFixtures.renderRow(0)
    assert(r0._4 == "Value one\n\nline2\n\nGreen & cert <ok>")
    assert(r0._5 == "Value one\n\nline2\n") // newline cut past 80% of budget
    assert(r0._2.startsWith("# 0\n\n![image](img://0)\n\n"))
    assert(r0._3.contains("<p>Green &amp; cert &lt;ok&gt;</p>"))
    assert(!r0._3.contains("junk")) // unknown kind rejected (F1)
    val r1 = QueryFixtures.renderRow(1)
    assert(r1._5 == "Valuation statement ") // hard cut, no close newline
    val r2 = QueryFixtures.renderRow(2)
    assert(r2._5 == "Valuation statement") // newline exactly at threshold
    val r3 = QueryFixtures.renderRow(3)
    assert(r3._4 == "Short" && r3._5 == "Short") // blank image span dropped (F3)
    assert(!r3._3.contains("data-order=\"1\""))
  }
}
