package graft

import java.sql.Timestamp

import org.scalacheck.{Gen, Prop, Properties, Test}

import graft.queries.Relational

/** ScalaCheck: the SAX motif pipeline (ordered prefix → integer PAA →
  * min-max normalization → symbol word → blocked pair verify) must
  * agree with a direct Scala replay on random event frames — ragged
  * user series (< 16 events), timestamp ties broken by event_id, and
  * flat series (umax == umin) are all in the generator's range. */
object AnalyticsProps extends Properties("Analytics") {

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  private lazy val spark = TestSpark.spark

  // values on a cent grid like the driver corpus; few distinct ts
  // seconds so ordering ties exercise the event_id tiebreak
  private case class Ev(userId: Long, eventId: Long, tsSec: Long, cents: Long)

  private val userEvents: Gen[Seq[Ev]] = for {
    nUsers <- Gen.chooseNum(2, 5)
    evs <- Gen.sequence[List[List[Ev]], List[Ev]]((0 until nUsers).toList.map { u =>
      for {
        n <- Gen.chooseNum(3, 24)
        ts <- Gen.listOfN(n, Gen.chooseNum(0L, 12L))
        cs <- Gen.listOfN(n, Gen.chooseNum(1L, 49000L))
      } yield ts.zip(cs).zipWithIndex.map { case ((t, c), i) =>
        Ev(u.toLong, u.toLong * 1000 + i, t, c)
      }
    })
  } yield evs.flatten

  property("sax motif pairs equal a direct Scala replay") =
    Prop.forAll(userEvents) { evs =>
      import spark.implicits._
      val df = evs.map { e =>
        (e.userId, e.eventId,
          new Timestamp(e.tsSec * 1000L), e.cents.toDouble / 100.0)
      }.toDF("user_id", "event_id", "ts", "value")
      val got = Relational.saxMotif(df).collect()
        .map(r => (r.getAs[Long]("user_a"), r.getAs[Long]("user_b"),
          r.getAs[Long]("sax_word"), r.getAs[Long]("l1_dist"))).toSeq

      // --- direct replay ---
      val byUser = evs.groupBy(_.userId)
      val sketches = byUser.map { case (u, es) =>
        val cents = es.sortBy(e => (e.tsSec, e.eventId)).take(16).map(_.cents)
        val paa: Map[Int, Long] = cents.zipWithIndex
          .groupBy { case (_, i) => i / 4 }
          .view.mapValues(vs => Math.floorDiv(vs.map(_._1).sum, 4L)).toMap
        val umin = paa.values.min; val umax = paa.values.max
        val norm: Map[Int, Long] = paa.view.mapValues { p =>
          if (umax == umin) 0L else Math.floorDiv((p - umin) * 1000L, umax - umin)
        }.toMap
        val mult = Array(1000L, 100L, 10L, 1L)
        val word = norm.map { case (s, n) => math.min(n / 250, 3L) * mult(s) }.sum
        val n4 = (0 until 4).map(s => norm.getOrElse(s, 0L))
        u -> (word, n4)
      }
      val expected = (for {
        (ua, (wa, na)) <- sketches.toSeq
        (ub, (wb, nb)) <- sketches.toSeq
        if ua < ub && wa == wb
        dist = na.zip(nb).map { case (x, y) => math.abs(x - y) }.sum
        if dist <= 300L
      } yield (ua, ub, wa, dist)).sortBy(t => (t._1, t._2))

      got == expected
    }
}
