package graft.ops

import graft.SparkTestBase

/** Invariant pins for the mixing/batching/QA/attribution wave — the
  * properties the value oracles can't state (conservation laws, bound
  * checks, cross-column identities). */
class MixAttributionSpec extends SparkTestBase {
  import spark.implicits._

  test("epoch mix conserves the corpus char budget") {
    val rows = MlOps.epochMix(spark, sf0001).collect()
    assert(rows.length == 20, s"${rows.length} sources")
    val (srcChars, budgets) =
      (rows.map(_.getLong(3)), rows.map(_.getLong(4)))
    val cTotal = srcChars.sum
    // per-source floor division can only UNDERFILL, by < 1 char each
    assert(budgets.sum <= cTotal &&
      cTotal - budgets.sum < rows.length, s"${budgets.sum} vs $cTotal")
    rows.foreach { r =>
      val (sc, budget, epochs, nFrac, fracChars, eff) =
        (r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6),
          r.getLong(7), r.getLong(8))
      assert(epochs == budget / sc, r.toString)
      assert(nFrac >= 0 && nFrac <= r.getLong(2), r.toString)
      assert(fracChars >= 0 && fracChars <= sc, r.toString)
      assert(eff == epochs * sc + fracChars, r.toString)
    }
    // the knob actually mixes: high-weight sources are upsampled past
    // one full pass, tail sources are downsampled below it
    assert(rows.filter(_.getLong(1) == 4L)
      .forall(r => r.getLong(8) > r.getLong(3)), "w=4 not upsampled")
    assert(rows.filter(_.getLong(1) == 1L)
      .forall(r => r.getLong(8) < r.getLong(3)), "w=1 not downsampled")
  }

  test("length buckets partition the corpus; padding bounds hold") {
    val rows = MlOps.lengthBuckets(spark, sf0001).collect()
    val total = graft.Tables.documents(spark, sf0001).count()
    assert(rows.map(_.getLong(2)).sum == total, "doc partition")
    rows.foreach { r =>
      val (bucket, cap, n, nBatches, used, padFrac) =
        (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3),
          r.getLong(4), r.getDouble(5))
      assert(cap == bucket * 64)
      assert(nBatches == (n + 31) / 32)
      assert(used <= nBatches * 32 * cap, r.toString)
      assert(padFrac >= 0.0 && padFrac < 1.0, r.toString)
    }
  }

  test("label agreement: cells, rates and kappa are self-consistent") {
    val r = QualityOps.labelAgreement(spark, sf0001).collect().head
    val (n, n11, n10, n01, n00) = (r.getLong(0), r.getLong(1),
      r.getLong(2), r.getLong(3), r.getLong(4))
    val (po, pe, kappa) = (r.getDouble(5), r.getDouble(6), r.getDouble(7))
    assert(n == n11 + n10 + n01 + n00, "cells partition n")
    assert(Seq(n11, n10, n01, n00).forall(_ > 0), "a vacuous cell")
    val poX = (n11 + n00).toDouble / n
    val peX = ((n11 + n10) * (n11 + n01) +
      (n00 + n01) * (n00 + n10)).toDouble / (n.toDouble * n)
    assert(math.abs(po - poX) < 1e-6 && math.abs(pe - peX) < 1e-6)
    assert(math.abs(kappa - (poX - peX) / (1 - peX)) < 1e-6)
    assert(kappa >= -1.0 && kappa <= 1.0 && kappa < po)
  }

  test("attribution: first/last counts both equal the conversion count") {
    val rows = WindowOps.attribution(spark, sf0001).collect()
    val (nFirst, nLast) =
      (rows.map(_.getLong(2)).sum, rows.map(_.getLong(3)).sum)
    assert(nFirst == nLast && nFirst > 0, s"$nFirst vs $nLast")
    // linear credit distributes ~1 unit per conversion: the integer-ppm
    // floor loses < n_touches/1e6 per conversion, never gains
    val credit = rows.map(_.getDouble(4)).sum
    assert(credit <= nFirst + 1e-6 && credit > nFirst * 0.99,
      s"credit $credit vs conversions $nFirst")
    rows.foreach { r =>
      assert(r.getLong(1) >= r.getLong(2) && r.getLong(1) >= r.getLong(3),
        r.toString)
    }
  }
}
