package graft

import graft.ext.Relational
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Generated-input laws for the interval operators — the shapes fixtures
  * miss: intervals spanning many buckets, exact bucket-edge alignment,
  * touching endpoints, contained intervals, and bucket widths both finer
  * and coarser than the intervals.
  */
class RelationalPropertySpec extends SparkSpec {
  import spark.implicits._

  private def samples[A](g: Gen[A], n: Int, seed0: Long): Seq[A] = {
    var seed = Seed(seed0)
    (1 to n).map { _ =>
      val a = g.pureApply(Gen.Parameters.default, seed)
      seed = seed.next
      a
    }
  }

  private val intervalGen: Gen[(Long, Long)] = for {
    lo <- Gen.choose(0L, 500L)
    len <- Gen.choose(1L, 120L)
  } yield (lo, lo + len)

  test("intervalJoinBucketed ≡ brute-force theta join, each pair exactly once") {
    val caseGen = for {
      ls <- Gen.choose(1, 25).flatMap(Gen.listOfN(_, intervalGen))
      rs <- Gen.choose(1, 25).flatMap(Gen.listOfN(_, intervalGen))
      w <- Gen.oneOf(1L, 7L, 50L, 300L) // finer than, near, and coarser than spans
    } yield (ls, rs, w)
    samples(caseGen, 12, 4242L).foreach { case (ls, rs, w) =>
      val left = ls.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("lid", "a_lo", "a_hi")
      val right = rs.zipWithIndex.map { case ((lo, hi), i) => (i.toLong, lo, hi) }
        .toDF("rid", "b_lo", "b_hi")
      val got = Relational
        .intervalJoinBucketed(left, "a_lo", "a_hi", right, "b_lo", "b_hi", w)
        .select("lid", "rid").as[(Long, Long)].collect().toSeq.sorted
      val expected = (for {
        ((llo, lhi), li) <- ls.zipWithIndex
        ((rlo, rhi), ri) <- rs.zipWithIndex
        if llo < rhi && rlo < lhi
      } yield (li.toLong, ri.toLong)).sorted
      assert(got == expected,
        s"w=$w: got ${got.size} pairs, expected ${expected.size}")
      assert(got.distinct.size == got.size, s"w=$w: duplicate matches")
    }
  }

  test("mergeIntervals: islands are maximal, disjoint, and cover exactly the union") {
    val caseGen = Gen.choose(1, 40).flatMap(Gen.listOfN(_, intervalGen))
    samples(caseGen, 12, 777L).foreach { ivs =>
      val d = ivs.map { case (lo, hi) => ("k", lo, hi) }.toDF("k", "lo", "hi")
      val islands = Relational.mergeIntervals(d, Seq("k"), "lo", "hi")
        .select("lo", "hi").as[(Long, Long)].collect().toSeq.sortBy(_._1)
      // brute-force union length over the integer point domain
      val covered = ivs.flatMap { case (lo, hi) => lo until hi }.toSet
      assert(islands.map { case (lo, hi) => hi - lo }.sum == covered.size.toLong,
        "total island length must equal the union measure")
      // islands pairwise disjoint with a genuine gap (maximality: touching
      // or overlapping islands would have merged)
      islands.sliding(2).foreach {
        case Seq((_, h1), (l2, _)) => assert(l2 > h1, s"islands must not touch: $islands")
        case _ =>
      }
      // every input interval lands inside exactly one island
      ivs.foreach { case (lo, hi) =>
        assert(islands.count { case (il, ih) => il <= lo && hi <= ih } == 1,
          s"[$lo,$hi) not contained in exactly one island of $islands")
      }
    }
  }
}
