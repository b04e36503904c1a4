package graft.relational

import graft.TestSpark
import org.scalatest.funsuite.AnyFunSuite

/** q36_corr correctness: the moment-sum route must reproduce the
  * textbook two-pass statistics computed in memory with exact decimal
  * accumulation (the same arithmetic the DuckDB oracle runs).
  */
class StatsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val sf = "/root/testdata/sf0.001"

  test("q36_corr: matches an exact-decimal in-memory replay") {
    val rows = graft.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
    val expected = rows.groupBy(_._1).map { case (flag, g) =>
      def d2(x: Double) =
        BigDecimal(x).setScale(2, BigDecimal.RoundingMode.HALF_UP)
      val n = g.length.toDouble
      val sx = g.map(t => d2(t._2)).sum.toDouble
      val sy = g.map(t => d2(t._3)).sum.toDouble
      val sxy = g.map(t => d2(t._2) * d2(t._3)).sum.toDouble
      val sxx = g.map(t => d2(t._2) * d2(t._2)).sum.toDouble
      val syy = g.map(t => d2(t._3) * d2(t._3)).sum.toDouble
      val corr = (n * sxy - sx * sy) /
        math.sqrt((n * sxx - sx * sx) * (n * syy - sy * sy))
      val cov = (sxy - sx * sy / n) / (n - 1)
      flag -> (g.length.toLong, corr, cov)
    }
    val got = Relational.q36_corr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2), r.getDouble(3)))
    assert(got.length == expected.size)
    got.foreach { case (flag, n, corr, cov) =>
      val (en, ecorr, ecov) = expected(flag)
      assert(n == en)
      assert(math.abs(corr - ecorr) < 1e-6, s"$flag corr $corr vs $ecorr")
      assert(math.abs(cov - ecov) < 1e-4 * math.abs(ecov),
        s"$flag cov $cov vs $ecov")
      assert(corr >= -1.0 && corr <= 1.0)
    }
  }

  test("q38_regr: r2 = corr^2, line passes through the mean point") {
    val corr = Relational.q36_corr(spark, sf).collect()
      .map(r => r.getString(0) -> r.getDouble(2)).toMap
    val means = graft.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity", "l_extendedprice").collect()
      .map(r => (r.getString(0), r.getDouble(1), r.getDouble(2)))
      .groupBy(_._1).map { case (f, g) =>
        f -> (g.map(_._2).sum / g.length, g.map(_._3).sum / g.length)
      }
    val got = Relational.q38_regr(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.nonEmpty)
    got.foreach { case (flag, _, slope, intercept, r2) =>
      val c = corr(flag)
      assert(math.abs(r2 - c * c) < 1e-5, s"$flag r2 $r2 vs corr^2 ${c * c}")
      // least squares: y-mean = slope * x-mean + intercept
      val (mx, my) = means(flag)
      assert(math.abs(my - (slope * mx + intercept)) < 1e-2 * math.abs(my),
        s"$flag line misses the mean point")
      assert(r2 >= 0.0 && r2 <= 1.0)
    }
  }

  test("q37_mad: matches an in-memory interpolated-percentile replay") {
    def pct(xs: Array[Double], q: Double): Double = {
      val s = xs.sorted
      val pos = q * (s.length - 1)
      val lo = pos.toInt
      if (lo == s.length - 1) s(lo)
      else s(lo) + (pos - lo) * (s(lo + 1) - s(lo))
    }
    val rows = graft.Tables.load(spark, sf, "lineitem")
      .select("l_returnflag", "l_quantity").collect()
      .map(r => (r.getString(0), r.getDouble(1)))
    val expected = rows.groupBy(_._1).map { case (flag, g) =>
      val xs = g.map(_._2)
      val med = pct(xs, 0.5)
      val devs = xs.map(x => math.abs(x - med))
      flag -> (xs.length.toLong, med, pct(devs, 0.5), pct(devs, 0.9))
    }
    val got = Relational.q37_mad(spark, sf).collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2),
        r.getDouble(3), r.getDouble(4)))
    assert(got.length == expected.size)
    got.foreach { case (flag, n, med, mad, p90) =>
      val (en, emed, emad, ep90) = expected(flag)
      assert(n == en)
      assert(med == emed, s"$flag median $med vs $emed")
      assert(mad == emad, s"$flag MAD $mad vs $emad")
      assert(p90 == ep90, s"$flag dev_p90 $p90 vs $ep90")
    }
  }
}
