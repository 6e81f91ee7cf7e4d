package graft

import graft.analytics.Funnels
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Test => SCTest}

/** Boundary properties for cohort retention and funnel stages — the
  * ordering edges a hand-picked fixture never hits reliably:
  *
  *  - signups exactly AT a day boundary (midnight) and one second
  *    before/after it — the cohort-day assignment edge;
  *  - same-day activity BEFORE the signup instant — still offset 0
  *    (date-grain semantics);
  *  - stage events with EQUAL timestamps — strict `>` means a click at
  *    exactly t_view does not advance the funnel.
  *
  * Both properties check the SHIPPED plans (`Funnels`) against an
  * independent in-process model over generated boundary-heavy event
  * logs — the hopping-window boundary pattern from TimeSeriesSpec.
  */
class FunnelPropertySpec extends SparkSpec {
  import spark.implicits._

  private val epoch0 = 1704067200L // 2024-01-01 00:00:00 UTC, a day boundary
  private def dayOf(s: Long): Long = Math.floorDiv(s, 86400L)

  // timestamps cluster on day boundaries, their ±1 s shadows, and a
  // couple of interior instants; the coarse grid makes EQUAL timestamps
  // across event types frequent instead of astronomically rare
  private val genEvents: Gen[List[(Long, Long, String)]] = for {
    nUsers <- Gen.choose(1, 5)
    n <- Gen.choose(4, 24)
    evs <- Gen.listOfN(n, for {
      u <- Gen.choose(1, nUsers)
      day <- Gen.choose(0, 3)
      off <- Gen.oneOf(0L, 1L, 43200L, 86399L)
      et <- Gen.oneOf("signup", "view", "click", "purchase")
    } yield (u.toLong, epoch0 + day * 86400L + off, et))
  } yield evs

  private def toDf(evs: List[(Long, Long, String)]) =
    evs.toDF("user_id", "s", "event_type")
      .select($"user_id", timestamp_seconds($"s").as("ts"), $"event_type")

  test("cohort retention: day-boundary signups and pre-signup same-day activity (property)") {
    val prop = Prop.forAll(genEvents) { evs =>
      val signups = evs.filter(_._3 == "signup")
      val cohort = signups.groupBy(_._1).map { case (u, es) => u -> dayOf(es.map(_._2).min) }
      val activeDays = evs.groupBy(_._1).map { case (u, es) => u -> es.map(e => dayOf(e._2)).toSet }
      val cells = (for {
        (u, c) <- cohort.toSeq
        d <- activeDays(u) if d >= c
      } yield ((c, d - c), u)).groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
      val sizes = cohort.groupBy(_._2).map { case (c, m) => c -> m.size }
      val want = cells.toSeq.map { case ((c, off), users) =>
        (java.time.LocalDate.ofEpochDay(c).toString, off, users.size.toLong,
          BigDecimal(users.size.toDouble / sizes(c))
            .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble)
      }.sorted

      val got = Funnels.cohortRetention(toDf(evs))
        .select($"cohort".cast("string"), $"day_offset", $"n_active", $"retention")
        .as[(String, Long, Long, Double)].collect().toSeq.sorted
      if (got != want) {
        println(s"events: $evs\ngot:  $got\nwant: $want")
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }

  test("funnel stages: equal-timestamp stage events never advance the funnel (property)") {
    val prop = Prop.forAll(genEvents) { evs =>
      def minTs(et: String, after: Long => Boolean, u: Long): Option[Long] =
        evs.filter(e => e._1 == u && e._3 == et && after(e._2)).map(_._2)
          .reduceOption(_ min _)
      val want = evs.filter(_._3 == "view").map(_._1).distinct.sorted.map { u =>
        val tv = minTs("view", _ => true, u).get
        val tc = minTs("click", _ > tv, u)
        val tp = tc.flatMap(c => minTs("purchase", _ > c, u))
        (u, tv, tc, tp, 1L + tc.size + tp.size)
      }

      val got = Funnels.funnelStages(toDf(evs))
        .select($"user_id", $"t_view".cast("long"),
          $"t_click".cast("long"), $"t_purchase".cast("long"), $"stages")
        .as[(Long, Long, Option[Long], Option[Long], Long)]
        .collect().toSeq.sortBy(_._1)
      if (got != want) {
        println(s"events: $evs\ngot:  $got\nwant: $want")
      }
      got == want
    }
    val res = SCTest.check(
      SCTest.Parameters.default.withMinSuccessfulTests(12).withWorkers(1), prop)
    assert(res.passed, res.status.toString)
  }
}
