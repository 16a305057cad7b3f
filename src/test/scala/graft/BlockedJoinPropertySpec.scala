package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for the blocked bucket self-join lemma that both hot-key
  * fixes rely on — `Dedup.embeddingNearDupsLsh` (r14: LSH bucket self-join,
  * `Dedup.scala` blocked candidates) and `Graph.linkPredict` (r13: blocked
  * wedges). The construction: every row in a bucket gets its own block
  * `bs = h(id) mod s` and replicates once per opposing block
  * `bo ∈ [0, s)`; the self-join keys on `(a.bs = b.bo, a.bo = b.bs)` plus
  * the `a.id < b.id` ordering.
  *
  * The lemma the production code asserts in prose ("candidates
  * BIT-IDENTICAL — every pair meets in exactly one block cell"): for ANY
  * bucket population, ANY bucketCap ≥ 1 and ANY block-assignment function
  * (not just a good hash — a constant function must work too, it only
  * concentrates load), the join emits every unordered pair EXACTLY ONCE
  * before `.distinct()`, and nothing else. Exactly-once matters beyond
  * dedup: the `.distinct()` would mask duplicates, but a MISSED pair is a
  * recall hole no downstream stage can repair, and the oracle fixtures
  * only sample one population shape.
  *
  * The model mirrors the DataFrame construction line for line
  * (replicate → conditional equi-join), so a future edit to the join
  * condition that breaks the pairing bijection shows up as a
  * counterexample here, not as a fixture-dependent recall dip.
  */
object BlockedJoinPropertySpec extends Properties("BlockedBucketSelfJoin") {

  /** (ids, cap, blockFn) — ids distinct, cap ≥ 1, blockFn arbitrary
    * (keyed by a random salt; one generator arm forces the constant
    * function, the worst case for spread but still pair-complete).
    */
  private val cases: Gen[(List[Long], Int, Long => Long)] = for {
    n <- Gen.chooseNum(0, 60)
    ids <- Gen.listOfN(n, Gen.chooseNum(Long.MinValue + 1, Long.MaxValue)).map(_.distinct)
    cap <- Gen.chooseNum(1, 8)
    salt <- Gen.chooseNum(Long.MinValue, Long.MaxValue)
    fn <- Gen.oneOf[Long => Long](
      (v: Long) => v * 0x9e3779b97f4a7c15L + salt, // splitmix-ish mix
      (_: Long) => salt,                           // adversarial: one hot cell
      (v: Long) => v)                              // identity
  } yield (ids, cap, fn)

  /** The BIPARTITE variant (r14 review: `Dedup.embeddingIncrementalFrom`'s
    * corpus × increment join): corpus rows own one block
    * `bs = h(id) mod s`, increment rows replicate across all `s` blocks,
    * the join keys on (corpus.bs = increment.bo). Every (corpus,
    * increment) pair must meet exactly once, at a replication cost of
    * m_b·s increment rows and zero corpus copies.
    */
  property("bipartite: every (corpus, increment) pair meets in exactly one block") =
    Prop.forAll(cases, cases) { case ((corIds, cap, blockFn), (incIds0, _, _)) =>
      val incIds = incIds0.filterNot(corIds.toSet)
      val nB = corIds.length.toLong
      val s = (nB + cap - 1) / cap max 1
      val corBlocked = corIds.map(id => (id, java.lang.Math.floorMod(blockFn(id), s)))
      val incBlocked = for { id <- incIds; bo <- 0L until s } yield (id, bo)
      val joined = for {
        (ic, bs) <- corBlocked
        (ii, bo) <- incBlocked
        if bs == bo
      } yield (ic, ii)
      val counts = joined.groupBy(identity).view.mapValues(_.size)
      val expected = (for { a <- corIds; b <- incIds } yield (a, b)).toSet
      Prop.all(
        Prop(counts.keySet == expected) :| "bipartite pair set mismatch",
        Prop(counts.values.forall(_ == 1)) :| "a bipartite pair met in more than one block",
        Prop(incBlocked.length.toLong == incIds.length * s && corBlocked.length == corIds.length) :|
          "replication cost drifted from m_b*s increment rows + zero corpus copies")
    }

  property("every unordered pair meets in exactly one block cell") =
    Prop.forAll(cases) { case (ids, cap, blockFn) =>
      val nB = ids.length.toLong
      val s = (nB + cap - 1) / cap max 1 // ⌈n_b/cap⌉, s=1 when the bucket is light
      // the replicated relation: (id, bs, bo) — one row per opposing block
      val blocked = for {
        id <- ids
        bs = java.lang.Math.floorMod(blockFn(id), s)
        bo <- 0L until s
      } yield (id, bs, bo)
      // the self-join: a.bs = b.bo && a.bo = b.bs && a.id < b.id
      val joined = for {
        (ia, bsA, boA) <- blocked
        (ib, bsB, boB) <- blocked
        if bsA == boB && boA == bsB && ia < ib
      } yield (ia, ib)
      val counts = joined.groupBy(identity).view.mapValues(_.size)
      val expected = (for {
        a <- ids; b <- ids if a < b
      } yield (a, b)).toSet
      Prop.all(
        Prop(counts.keySet == expected) :| s"pair set mismatch: got ${counts.keySet.size}, want ${expected.size}",
        Prop(counts.values.forall(_ == 1)) :| s"a pair met in more than one cell: ${counts.filter(_._2 > 1).take(3)}",
        // replication cost is the documented n_b·s rows, never more
        Prop(blocked.length.toLong == nB * s) :| "replication factor drifted from n_b*s")
    }
}
