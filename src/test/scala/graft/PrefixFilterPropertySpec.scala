package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for the prefix-filter candidate cut in
  * `TextAnalysis.containmentJoin` — the pigeonhole lemma the scaladoc
  * states in prose: ordering every doc's shingles by ascending global
  * document frequency (ties by shingle) and probing with only the first
  * `|A| − ⌈t·|A|⌉ + 1` shingles is LOSSLESS — any B with
  * `|A∩B| ≥ ⌈t·|A|⌉` must intersect A's prefix, so the exact verify sees
  * every qualifying pair. The oracle rows check one corpus; this model
  * mirrors the operator's integer arithmetic
  * (`⌈t·|A|⌉ = (tMilli·|A| + 999) div 1000`,
  * `containment_milli = 1000·|A∩B| div |A| ≥ tMilli`) over random small
  * corpora with a deliberately tiny shingle alphabet (forcing the heavy-
  * overlap regime where the cut is under the most pressure) and asserts
  * the candidates→verify pipeline returns EXACTLY the brute-force
  * all-pairs result — no pair missed by the cut, no false positive
  * surviving the verify, and the size prune
  * (`|B| ≥ ⌈t·|A|⌉`) never drops a qualifying pair either.
  */
object PrefixFilterPropertySpec extends Properties("ContainmentPrefixFilter") {

  private val corpora: Gen[(List[Set[Long]], Int)] = for {
    nDocs <- Gen.chooseNum(2, 10)
    alphabet <- Gen.chooseNum(4L, 12L) // small: heavy cross-doc overlap
    docs <- Gen.listOfN(nDocs, Gen.nonEmptyListOf(Gen.chooseNum(0L, alphabet)).map(_.toSet))
    tMilli <- Gen.frequency(
      6 -> Gen.chooseNum(1, 1000),
      1 -> Gen.const(1000), // prefix length collapses to 1
      1 -> Gen.const(1))    // prefix is the whole doc
  } yield (docs, tMilli)

  private def ceilT(tMilli: Int, a: Int): Int = (tMilli * a + 999) / 1000

  property("prefix cut + size prune + exact verify == brute force") =
    Prop.forAll(corpora) { case (docs, tMilli) =>
      val ids = docs.indices.toList
      val df: Map[Long, Int] =
        docs.flatten.groupBy(identity).view.mapValues(_.size).toMap
      def prefix(a: Set[Long]): Set[Long] = {
        val need = ceilT(tMilli, a.size)
        a.toList.sortBy(s => (df(s), s)).take(a.size - need + 1).toSet
      }
      val candidates = for {
        ai <- ids; bi <- ids if ai != bi
        a = docs(ai); b = docs(bi)
        if (prefix(a) intersect b).nonEmpty     // the prefix join
        if b.size >= ceilT(tMilli, a.size)       // the size prune
      } yield (ai, bi)
      val verified = candidates.filter { case (ai, bi) =>
        1000L * (docs(ai) intersect docs(bi)).size / docs(ai).size >= tMilli
      }.toSet
      val brute = (for {
        ai <- ids; bi <- ids if ai != bi
        if 1000L * (docs(ai) intersect docs(bi)).size / docs(ai).size >= tMilli
      } yield (ai, bi)).toSet
      Prop(verified == brute) :|
        s"missed=${(brute -- verified).take(3)} spurious=${(verified -- brute).take(3)} tMilli=$tMilli"
    }
}
