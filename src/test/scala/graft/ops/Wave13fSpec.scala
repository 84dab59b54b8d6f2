package graft.ops

import graft.SparkTestBase
import scala.math.BigDecimal.RoundingMode

/** Round-13 sixth wave: independent replays (the established
  * convention — raw-fixture recomputation in plain collections). */
class Wave13fSpec extends SparkTestBase {
  import spark.implicits._

  private def micro(x: Double): Double = math.floor(x * 1e6) / 1e6
  private def r6(x: Double): BigDecimal =
    BigDecimal(x).setScale(6, RoundingMode.HALF_UP)

  test("q_ml_kaplan_meier: hand-folded survival; censoring matters") {
    import org.apache.spark.sql.functions._
    val per = graft.Tables.orders(spark, sf0001)
      .groupBy($"o_custkey")
      .agg(min(to_date($"o_orderdate")).as("f"),
        max(to_date($"o_orderdate")).as("l"))
      .collect().map(r => (r.getDate(1).toLocalDate, r.getDate(2).toLocalDate))
    val m = per.map(_._2).max(Ordering.by((d: java.time.LocalDate) =>
      d.toEpochDay))
    val durs = per.map { case (f, l) =>
      (java.time.temporal.ChronoUnit.DAYS.between(f, l),
        java.time.temporal.ChronoUnit.DAYS.between(l, m) > 90) }
    val cells = durs.groupBy(_._1).toSeq.sortBy(_._1).map { case (dur, g) =>
      (dur, g.count(_._2).toLong, g.count(!_._2).toLong) }
    var atRisk = durs.length.toLong
    var logS = BigDecimal(0)
    val expected = cells.flatMap { case (dur, d, c) =>
      val row = if (d > 0) {
        if (atRisk > d) {
          logS += r6(math.log((atRisk - d).toDouble / atRisk))
          Some((dur, atRisk, d, c, Some(logS.toDouble),
            micro(math.exp(logS.toDouble))))
        } else Some((dur, atRisk, d, c, None, 0.0))
      } else None
      atRisk -= (d + c)
      row
    }
    val got = graft.SparkEntry.queries("q_ml_kaplan_meier")(spark, sf0001)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), if (r.isNullAt(4)) None else Some(r.getDouble(4)),
        r.getDouble(5))).toSeq
    assert(got == expected)
    // survival is monotone non-increasing and strictly below 1
    val survs = got.map(_._6)
    assert(survs == survs.sorted.reverse && survs.head < 1.0)
    // censoring is REAL: censored customers exist, and so do events —
    // without both, KM degenerates to a plain empirical CDF
    assert(durs.exists(_._2) && durs.exists(!_._2))
  }

  test("q_text_bigram_llr: 2x2 replay; LLR disagrees with PMI on purpose") {
    val texts = graft.Tables.documents(spark, sf0001)
      .select($"text").as[String].collect()
    val bc = scala.collection.mutable.Map[(String, String), Long]()
    texts.foreach { t =>
      val ts = t.split(" ", -1)
      for (i <- 0 until ts.length - 1) {
        val k = (ts(i), ts(i + 1))
        bc(k) = bc.getOrElse(k, 0L) + 1L
      }
    }
    val ca = bc.groupBy(_._1._1).view.mapValues(_.values.sum).toMap
    val cb = bc.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
    val t = bc.values.sum
    def term(o: Long, rs: Long, cs: Long): BigDecimal =
      if (o > 0) o * r6(math.log((o * t).toDouble / (rs * cs).toDouble))
      else BigDecimal(0)
    val expected = bc.toSeq.collect { case ((a, b), k11) if k11 >= 5 =>
      val (ra, rb) = (ca(a), cb(b))
      val (k12, k21, k22) = (ra - k11, rb - k11, t - ra - rb + k11)
      val g2 = micro((term(k11, ra, rb) + term(k12, ra, t - rb) +
        term(k21, t - ra, rb) + term(k22, t - ra, t - rb)).toDouble * 2.0)
      (s"$a $b", k11, ra, rb, g2)
    }.sortBy { case (bg, _, _, _, g2) => (-g2, bg) }.take(20)
    val got = graft.SparkEntry.queries("q_text_bigram_llr")(spark, sf0001)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getDouble(4))).toSeq
    assert(got == expected)
    // the design point: G² is frequency-calibrated, PMI is not — the
    // two top-20 sets differ on this corpus
    val pmiTop = graft.SparkEntry.queries("q_text_bigram_pmi")(spark, sf0001)
      .select($"bg").as[String].collect().toSet
    assert(got.map(_._1).toSet != pmiTop)
  }
}
