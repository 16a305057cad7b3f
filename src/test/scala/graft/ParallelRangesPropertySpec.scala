package graft

import org.scalacheck.{Gen, Prop, Properties}

import graft.sql.ParallelRanges

/** Property tests for the X1 range splitter — the goldens in
  * QueryBuilderSpec pin the reference's exact cases
  * (`ParallelQueryBuilderTest.java:38-105`); these pin the INVARIANTS for
  * every (min, max, parallelism), including the degenerate corners
  * (max == min, parallelism ≫ span, span not divisible): the generated
  * ranges tile [min, max] exactly — every integer in the span falls in
  * EXACTLY one range — respect the parallelism bound, and keep the
  * reference's half-open/inclusive-last shape.
  */
object ParallelRangesPropertySpec extends Properties("ParallelRanges") {

  private val cases: Gen[(Long, Long, Int)] = for {
    min <- Gen.chooseNum(-10000L, 10000L)
    span <- Gen.chooseNum(0L, 5000L)
    k <- Gen.chooseNum(1, 40)
  } yield (min, min + span, k)

  private def covers(ranges: Vector[ParallelRanges.Range], v: Long): Int =
    ranges.count(r => v >= r.start && (if (r.endInclusive) v <= r.end else v < r.end))

  property("ranges tile [min, max]: every value in exactly one range") =
    Prop.forAll(cases) { case (min, max, k) =>
      val ranges = ParallelRanges.generate(min, max, k)
      // sample the span (ends + random interior points) instead of iterating
      // huge spans
      val probes = (Seq(min, max) ++ (1 to 50).map(i => min + (max - min) * i / 51)).distinct
      probes.forall(v => covers(ranges, v) == 1)
    }

  property("never more than parallelism ranges; only the last is inclusive") =
    Prop.forAll(cases) { case (min, max, k) =>
      val ranges = ParallelRanges.generate(min, max, k)
      ranges.nonEmpty && ranges.size <= k &&
        ranges.last.endInclusive && ranges.init.forall(!_.endInclusive)
    }

  property("ranges are contiguous and ordered: each starts where the previous ended") =
    Prop.forAll(cases) { case (min, max, k) =>
      val ranges = ParallelRanges.generate(min, max, k)
      ranges.head.start == min && ranges.last.end == max &&
        ranges.sliding(2).forall {
          case Vector(a, b) => a.end == b.start
          case _ => true
        }
    }
}
