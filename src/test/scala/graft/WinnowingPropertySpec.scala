package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for the winnowing guarantee `TextAnalysis.winnowing`
  * claims in prose (Schleimer–Wilkerson–Aiken, SIGMOD'03): any two
  * documents sharing a gram-hash run of length ≥ `w` (i.e. a common
  * substring of length ≥ `w + k − 1`) share at least one SELECTED
  * fingerprint hash. The selection rule mirrored here is the operator's
  * SQL fold exactly (winnowSelected): per window of `w` consecutive gram
  * hashes, keep the minimum with `<=` displacement — later equal hashes
  * displace, i.e. the RIGHTMOST minimum — then distinct (pos, h).
  *
  * Why the guarantee survives ties and arbitrary surroundings: the fold
  * is per-window over that window's contents alone, so the window lying
  * fully inside the shared run picks the same hash at the same RELATIVE
  * position in both documents, whatever differs outside the run. The
  * generator uses a tiny hash alphabet precisely to hammer the tie rule
  * (equal minima inside and around the run), plus arbitrary prefix/suffix
  * context on each side.
  */
object WinnowingPropertySpec extends Properties("WinnowingGuarantee") {

  /** Rightmost-min-per-window selection — line-for-line model of the
    * operator's aggregate fold (TextAnalysis.winnowSelected). Bound to
    * the REAL SQL fold by the cross-check in Round10BatchSpec
    * ("winnowing model == SQL fold"), so the properties here are
    * properties of the shipped selection rule, not of a lookalike.
    */
  private[graft] def select(hs: Vector[Long], w: Int): Set[(Int, Long)] =
    (0 to hs.length - w).map { j =>
      var h = Long.MaxValue; var pos = -1
      for (o <- 0 until w)
        if (hs(j + o) <= h) { h = hs(j + o); pos = j + o }
      (pos, h)
    }.toSet

  private val cases: Gen[(Vector[Long], Vector[Long], Int)] = for {
    w <- Gen.chooseNum(2, 6)
    alphabet <- Gen.chooseNum(2L, 8L) // tiny: force ties on the minimum
    run <- Gen.listOfN(w, Gen.chooseNum(0L, alphabet)).map(_.toVector)
    pre1 <- Gen.listOf(Gen.chooseNum(0L, alphabet)).map(_.toVector)
    suf1 <- Gen.listOf(Gen.chooseNum(0L, alphabet)).map(_.toVector)
    pre2 <- Gen.listOf(Gen.chooseNum(0L, alphabet)).map(_.toVector)
    suf2 <- Gen.listOf(Gen.chooseNum(0L, alphabet)).map(_.toVector)
  } yield (pre1 ++ run ++ suf1, pre2 ++ run ++ suf2, w)

  property("a shared w-gram run forces a shared fingerprint hash") =
    Prop.forAll(cases) { case (doc1, doc2, w) =>
      val f1 = select(doc1, w).map(_._2)
      val f2 = select(doc2, w).map(_._2)
      Prop((f1 intersect f2).nonEmpty) :|
        s"no shared fingerprint despite a planted $w-run: f1=$f1 f2=$f2"
    }

  property("density: selections per doc never exceed window count, never zero") =
    Prop.forAll(cases) { case (doc1, _, w) =>
      val sel = select(doc1, w)
      Prop(sel.nonEmpty && sel.size <= doc1.length - w + 1)
    }
}
