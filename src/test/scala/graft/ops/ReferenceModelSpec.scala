package graft.ops

import scala.util.Random

import graft.SparkSpec

/** Randomized reference-model tests: each distributed operator is
  * replayed against a naive single-threaded Scala fold over the same
  * randomly-generated input (fixed seeds — failures reproduce exactly).
  * Example-based specs pin the documented edge cases; these pin the
  * general contract across hundreds of generated rows, including tie
  * and boundary patterns no hand-written example covers.
  */
class ReferenceModelSpec extends SparkSpec {
  import spark.implicits._

  private def cases(n: Int)(seed: Int => Unit): Unit = (1 to n).foreach(seed)

  test("Sessionize.assign matches a naive per-key scan") {
    cases(5) { seed =>
      val rnd = new Random(seed)
      val rows = (1 to 120).map { i =>
        (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toLong)
      }
      val gap = rnd.nextInt(50).toLong
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        var sid = 0L
        var prev = Long.MinValue
        sorted.map { case (_, t, tie) =>
          if (sid == 0L || t - prev > gap) sid += 1
          prev = t
          (k, tie) -> sid
        }
      }
      val got = Sessionize.assign(rows.toDF("k", "t", "tie"), "k", "t", "tie", gap)
        .select("k", "tie", "session_id").rows
        .map(r => (r(0), r(1)) -> r(2)).toMap
      withClue(s"seed=$seed gap=$gap: ") { got shouldBe expected }
    }
  }

  test("Scd.type2 matches a naive version fold") {
    cases(5) { seed =>
      val rnd = new Random(100 + seed)
      val attrs = Array("A", "B", null)
      val rows = (1 to 80).map { i =>
        (rnd.nextInt(5).toLong, rnd.nextInt(40).toLong, i.toLong,
          attrs(rnd.nextInt(3)))
      }
      val expected = rows.groupBy(_._1).flatMap { case (k, rs) =>
        val sorted = rs.sortBy(r => (r._2, r._3))
        val versions = sorted.foldLeft(Vector.empty[(String, Long, Long)]) {
          // (attr, validFrom, nObs) per version
          case (acc, (_, t, _, a)) =>
            if (acc.nonEmpty && acc.last._1 == a)
              acc.init :+ ((a, acc.last._2, acc.last._3 + 1))
            else acc :+ ((a, t, 1L))
        }
        versions.zipWithIndex.map { case ((a, from, n), i) =>
          val to = if (i + 1 < versions.size) versions(i + 1)._2 else -1L
          (k, (i + 1).toLong) -> ((a, from, to, n))
        }
      }
      val got = Scd.type2(rows.toDF("k", "t", "tie", "attr"), "k", "t", "tie", "attr")
        .rows.map { r =>
          (r(0), r(1)) -> ((r(2), r(3),
            Option(r(4)).getOrElse(-1L), r(6)))
        }.toMap
      withClue(s"seed=$seed: ") { got shouldBe expected }
    }
  }

  test("Cdc.apply matches a naive last-wins fold") {
    cases(5) { seed =>
      val rnd = new Random(200 + seed)
      val base = (1 to 10).map(k => (k.toLong, k * 100.0))
      val changes = (1 to 60).map { i =>
        (rnd.nextInt(14).toLong + 1, rnd.nextInt(20).toLong, i.toLong,
          if (rnd.nextBoolean()) "U" else "D", rnd.nextInt(1000).toDouble)
      }
      val winners = changes.groupBy(_._1).map { case (k, cs) =>
        k -> cs.maxBy(c => (c._2, c._3))
      }
      val expected = (base.filterNot(b => winners.contains(b._1)) ++
        winners.values.collect { case (k, _, _, "U", bal) => (k, bal) })
        .sortBy(_._1)
      val got = Cdc.apply(base.toDF("k", "bal"),
          changes.toDF("k", "seq", "tie", "op", "bal"),
          "k", "seq", "tie", "op")
        .orderBy("k").rows.map(r => (r(0), r(1)))
      withClue(s"seed=$seed: ") { got shouldBe expected }
    }
  }

  test("Percentiles.nearestRank matches naive sorted selection") {
    cases(5) { seed =>
      val rnd = new Random(300 + seed)
      val rows = (1 to 90).map { _ =>
        (rnd.nextInt(3).toLong, rnd.nextInt(25).toDouble) // ties likely
      }
      val ps = Seq(0.25, 0.5, 0.75, 0.9, 1.0)
      val expected = rows.groupBy(_._1).flatMap { case (g, rs) =>
        val sorted = rs.map(_._2).sorted
        ps.map(p => (g, p) -> sorted(math.ceil(p * sorted.size).toInt - 1))
      }
      val got = Percentiles.nearestRank(rows.toDF("g", "v"), Seq("g"), "v", ps)
        .rows.map(r => (r(0), r(1)) -> r(2)).toMap
      withClue(s"seed=$seed: ") { got shouldBe expected }
    }
  }

  test("Cohort.retention matches a naive cell count") {
    cases(5) { seed =>
      val rnd = new Random(400 + seed)
      val rows = (1 to 150).map { _ =>
        (rnd.nextInt(8).toLong, rnd.nextInt(200).toLong)
      }
      val len = rnd.nextInt(20).toLong + 1
      val perKey = rows.groupBy(_._1).map { case (k, rs) =>
        k -> rs.map(_._2 / len).distinct
      }
      val expected = perKey.toSeq.flatMap { case (_, periods) =>
        val cohort = periods.min
        periods.map(p => (cohort, p - cohort))
      }.groupBy(identity).map { case (cell, hits) => cell -> hits.size.toLong }
      val got = Cohort.retention(rows.toDF("k", "t"), "k", "t", len)
        .rows.map(r => (r(0), r(1)) -> r(2)).toMap
      withClue(s"seed=$seed len=$len: ") { got shouldBe expected }
    }
  }
}
