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

  /** The integer-sqrt fold must be the exact floor square root over
    * its whole advertised domain (random draws up to 2⁴⁰; the median
    * CI and stylometry ride on it). */
  property("isqrtFold is the exact floor sqrt on random BIGINTs") =
    Prop.forAll(Gen.listOfN(24,
      Gen.oneOf(Gen.chooseNum(0L, 4096L),
        Gen.chooseNum(0L, (1L << 40) - 1)))) { ms =>
      import spark.implicits._
      import org.apache.spark.sql.functions.expr
      val got = ms.toDF("m")
        .select(expr(Relational.isqrtFold("m")).as("r"))
        .collect().map(_.getAs[Long]("r")).toSeq
      val expected = ms.map(m => math.sqrt(m.toDouble).toLong match {
        // float sqrt can land one off at domain edges — settle exactly
        case g if g * g > m => g - 1
        case g if (g + 1) * (g + 1) <= m => g + 1
        case g => g
      })
      got == expected
    }

  /** Survival hazard against a direct Scala replay on random user
    * spans — censoring boundary, risk-set exits, and the running
    * estimator all recomputed independently. */
  property("survival hazard equals a direct Scala replay") =
    Prop.forAll(for {
      n <- Gen.chooseNum(3, 20)
      spans <- Gen.listOfN(n, for {
        first <- Gen.chooseNum(0, 20)
        len <- Gen.chooseNum(0, 20)
      } yield (first, first + len))
    } yield spans.zipWithIndex) { spans =>
      import spark.implicits._
      val rows = spans.flatMap { case ((f, l), u) =>
        Seq((u.toLong, new Timestamp(f * 86400000L)),
          (u.toLong, new Timestamp(l * 86400000L)))
      }
      val got = Relational.survivalHazard(rows.toDF("user_id", "ts"))
        .collect()
        .map(r => (r.getAs[Long]("t_day"), r.getAs[Long]("n_risk"),
          r.getAs[Long]("d_churn"), r.getAs[Long]("cumhaz_ppb"))).toSeq

      val w = spans.map(_._1._2).max
      val lt = spans.map { case ((f, l), _) => (l - f, l < w - 14) }
      val days = lt.map(_._1.toLong).distinct.sorted
      var cum = 0L
      val expected = days.map { t =>
        val risk = lt.count(_._1 >= t).toLong
        val d = lt.count(x => x._1 == t && x._2).toLong
        cum += d * 1000000000L / risk
        (t, risk, d, cum)
      }
      got == expected
    }

  /** Changepoint against a brute argmax over every split of the dense
    * daily grid (ties resolved the same way: gain DESC, day ASC). */
  property("changepoint equals the brute best-split replay") =
    Prop.forAll(for {
      nd <- Gen.chooseNum(4, 16)
      counts <- Gen.listOfN(nd, Gen.chooseNum(1, 9))
    } yield counts) { counts =>
      import spark.implicits._
      val rows = counts.zipWithIndex.flatMap { case (c, d) =>
        Seq.fill(c)(("x", new Timestamp(d * 86400000L)))
      }
      val r = Relational.tsChangepoint(rows.toDF("event_type", "ts"))
        .collect().head
      val xs = counts.map(_.toLong)
      val nn = xs.length.toLong
      val tot = xs.sum
      val best = (1L until nn).map { t =>
        val s1 = xs.take(t.toInt).sum
        val num = s1 * nn - tot * t
        (num * num / (t * (nn - t) * nn), t)
      }.maxBy { case (g, t) => (g, -t) } // gain DESC, earliest day wins
      r.getAs[Long]("gain") == best._1 &&
        r.getAs[Long]("cp_day") == best._2
    }

  /** Mann–Whitney against a direct doubled-midrank replay on random
    * per-user values — ties, empty variants avoided by construction,
    * verdicts compared through the same BigInt inequality. */
  property("mann-whitney equals the brute doubled-midrank reference") =
    Prop.forAll(for {
      n <- Gen.chooseNum(4, 30)
      vals <- Gen.listOfN(n, Gen.chooseNum(1L, 40L))
    } yield vals.zipWithIndex.map { case (v, i) => (i.toLong, v) }) { users =>
      import spark.implicits._
      val df = users.map { case (u, v) => (u, v.toDouble) }
        .toDF("user_id", "value")
      val r = graft.quality.Quality.mannWhitney(df).collect().head
      val xs = users.map { case (u, v) => (v * 100L, u % 2 == 0) }
      val sorted = xs.map(_._1).sorted
      val nA = xs.count(_._2).toLong
      val nB = xs.size - nA
      val sum2rA = xs.filter(_._2).map { case (x, _) =>
        2L * sorted.count(_ < x) + sorted.count(_ == x) + 1L
      }.sum
      val u2 = sum2rA - nA * (nA + 1)
      val n = nA + nB
      val ties = sorted.groupBy(identity).values
        .map(g => g.size.toLong).map(t => t * t * t - t).sum
      val d = BigInt(u2 - nA * nB)
      val sig = d * d * 30000 * n * (n - 1) >=
        BigInt(38416) * nA * nB * (BigInt(n) * n * n - n - ties)
      r.getAs[Long]("u_x2") == u2 &&
        r.getAs[Long]("n_a") == nA &&
        (r.getAs[String]("significant") == "Y") == sig
    }
}
