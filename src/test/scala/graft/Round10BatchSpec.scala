package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{Graph, Relational, Similarity, TextAnalysis, TimeSeries}

/** Contract specs for the round-10 continuation batch (time-series family,
  * DQ audits, link prediction, phrase/containment search). The DuckDB
  * oracles are the bit-exact gate; these pin the semantic PROPERTIES that
  * an oracle row-hash can't localize when it breaks — invariants of each
  * statistic, losslessness of the candidate cuts, determinism of tie
  * orders — plus the plan shapes that keep them scale-safe.
  */
class Round10BatchSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  test("acf: every (type, lag<=3) cell present, r_milli bounded, pairs < hours") {
    val rows = TimeSeries.eventsAcf(spark, dir).collect()
    assert(rows.nonEmpty)
    val hoursByType = TimeSeries.eventsCusum(spark, dir).collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    val types = rows.map(_.getString(0)).distinct
    // all 3 lags materialize for every type (the hourly series is dense
    // enough at every SF that lag-3 overlap exists)
    types.foreach { t =>
      val lags = rows.filter(_.getString(0) == t).map(_.getLong(1)).sorted.toSeq
      assert(lags == Seq(1L, 2L, 3L), s"type $t lags $lags")
    }
    rows.foreach { r =>
      val (lag, n) = (r.getLong(1), r.getLong(2))
      assert(n >= 2, s"degenerate pair count $n")
      if (!r.isNullAt(3)) {
        val rm = r.getLong(3)
        assert(rm >= -1000 && rm <= 1000, s"correlation out of range: $rm")
      }
      // pairs are bounded by the observed-hour count (each x-hour pairs
      // with at most one z-hour per lag); NO monotonicity in lag — gaps
      // in a sparse series make lag-3 overlap exceed lag-1 legitimately
      val hours = hoursByType(r.getString(0))
      assert(n <= hours - 1, s"lag-$lag pair count $n exceeds hours $hours")
    }
  }

  test("acf: perfectly autocorrelated constant-step series gives r_milli = 1000") {
    // independent arithmetic check on a hand series: y_t = t is perfectly
    // linearly dependent at every lag, so Pearson r must be exactly 1
    import spark.implicits._
    val hand = (1 to 50).map(t => ("x", t.toLong, t.toLong)).toDF("event_type", "hr", "y")
    hand.createOrReplaceTempView("r10_acf_hand")
    val lagged = spark.sql(
      """SELECT a.event_type, l.lag, a.y AS x, b.y AS z
        |FROM r10_acf_hand a
        |JOIN (SELECT explode(sequence(1, 3)) AS lag) l
        |JOIN r10_acf_hand b ON b.event_type = a.event_type AND b.hr = a.hr + l.lag
        |""".stripMargin)
    val m = lagged.groupBy("event_type", "lag")
      .agg(count(lit(1)).as("n"), sum("x").as("s_x"), sum("z").as("s_z"),
        sum(expr("x * x")).as("s_xx"), sum(expr("z * z")).as("s_zz"),
        sum(expr("x * z")).as("s_xz"))
      .selectExpr("CAST(round(1000.0 * (n * s_xz - s_x * s_z) / " +
        "(sqrt(CAST(n * s_xx - s_x * s_x AS DOUBLE)) * " +
        "sqrt(CAST(n * s_zz - s_z * s_z AS DOUBLE)))) AS BIGINT) AS r_milli")
      .collect()
    assert(m.length == 3 && m.forall(_.getLong(0) == 1000L), m.mkString(","))
  }

  test("cusum: one changepoint per type; S_t identity and argmax tie-order hold") {
    val rows = TimeSeries.eventsCusum(spark, dir).collect()
    val types = rows.map(_.getString(0))
    assert(types.distinct.length == types.length, "duplicate changepoint row")
    rows.foreach { r =>
      val (nH, total, t, s, absS) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5), r.getLong(6))
      assert(absS == math.abs(s))
      assert(t >= 1 && t <= nH, s"cp position $t outside [1, $nH]")
      assert(total > 0)
      // S_n = n*total - n*total = 0, so a positive max |S| can never sit
      // at the last position unless the whole series deviates nowhere
      if (absS > 0) assert(t < nH, "argmax landed on the always-zero endpoint")
    }
  }

  test("seasonality: exactly one peak per type; mean identity; totals partition the volume") {
    val rows = TimeSeries.eventsSeasonality(spark, dir).collect()
    val byType = rows.groupBy(_.getString(0))
    byType.foreach { case (t, rs) =>
      assert(rs.count(_.getBoolean(5)) == 1, s"type $t has != 1 peak slot")
      val peak = rs.filter(_.getBoolean(5)).head
      assert(rs.forall(r => r.getLong(3) <= peak.getLong(3)),
        s"type $t peak is not the max-total slot")
      rs.foreach { r =>
        assert(r.getLong(4) == 1000L * r.getLong(3) / r.getLong(2), "mean_milli identity")
        assert(r.getLong(1) >= 0 && r.getLong(1) <= 23)
      }
    }
    // hour-of-day totals partition total event volume exactly
    val volume = Relational.events(spark, dir).count()
    assert(rows.map(_.getLong(3)).sum == volume)
  }

  test("ohlc: high/low bound open/close; volumes partition the stream; ties broken by event_id") {
    val rows = TimeSeries.eventsOhlc(spark, dir).collect()
    rows.foreach { r =>
      val (vol, o, h, l, c) =
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5), r.getLong(6))
      assert(h >= math.max(o, c) && l <= math.min(o, c), s"candle bounds broken: $r")
      assert(vol >= 1)
      if (vol == 1) assert(o == c && o == h && h == l, s"singleton candle not degenerate: $r")
    }
    assert(rows.map(_.getLong(2)).sum == Relational.events(spark, dir).count())
  }

  test("rolling median: frame arithmetic exact (multiples of 500, inside [min,max] of frame)") {
    val rows = TimeSeries.eventsRollingMedian(spark, dir)
      .orderBy("event_type", "hr").collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(0)).foreach { case (_, rs) =>
      val ordered = rs.sortBy(_.getLong(1))
      ordered.zipWithIndex.foreach { case (r, i) =>
        val med = r.getLong(3)
        assert(med % 500 == 0, s"median not on the exact midpoint grid: $med")
        val frame = ordered.slice(math.max(0, i - 4), i + 1).map(_.getLong(2) * 1000)
        assert(med >= frame.min && med <= frame.max, "median escaped its frame")
        // independent recomputation of the order statistic
        val sorted = frame.sorted
        val want = if (sorted.length % 2 == 1) sorted(sorted.length / 2)
          else (sorted(sorted.length / 2 - 1) + sorted(sorted.length / 2)) / 2
        assert(med == want, s"median $med != recomputed $want")
      }
    }
  }

  test("decomposition: y*1000 == trend + seasonal + residual; seasonal constant per slot") {
    val rows = TimeSeries.eventsDecompose(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (y, t, s, res) = (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))
      assert(1000 * y == t + s + res, s"reconstruction identity broken: $r")
      assert(t >= 0, "trend of a count series cannot be negative")
    }
    // the seasonal component is a function of (type, hour-of-day) only
    rows.groupBy(r => (r.getString(0), r.getLong(1) % 24)).foreach { case (k, rs) =>
      assert(rs.map(_.getLong(4)).distinct.length == 1,
        s"seasonal component varies within slot $k")
    }
  }

  test("benford: 9 digit rows, observed partitions orders, literal expectations") {
    val rows = Relational.dqBenford(spark, dir).collect()
    assert(rows.map(_.getLong(0)).sorted.toSeq == (1L to 9L),
      "first digits of positive totals must cover 1..9")
    assert(rows.map(_.getLong(1)).sum ==
      spark.read.parquet(s"$dir/orders.parquet").count())
    val expected = Map(1L -> 301L, 2L -> 176L, 3L -> 125L, 4L -> 97L,
      5L -> 79L, 6L -> 67L, 7L -> 58L, 8L -> 51L, 9L -> 46L)
    rows.foreach { r =>
      assert(r.getLong(3) == expected(r.getLong(0)), "expectation literal drifted")
      assert(r.getLong(4) == math.abs(r.getLong(2) - r.getLong(3)), "dev identity")
    }
  }

  test("l-diversity: l <= k always; is_diverse is the l >= 3 gate; groups partition customers") {
    val rows = Relational.dqLdiversity(spark, dir).collect()
    rows.foreach { r =>
      val (k, l) = (r.getLong(2), r.getLong(3))
      assert(l >= 1 && l <= k, s"distinct sensitive values $l outside [1, $k]")
      assert(r.getBoolean(4) == (l >= 3))
    }
    assert(rows.map(_.getLong(2)).sum ==
      spark.read.parquet(s"$dir/customer.parquet").count())
    // the parameter is live: l = 1 makes every group diverse
    assert(Relational.dqLdiversity(spark, dir, l = 1)
      .filter(!col("is_diverse")).count() == 0)
  }

  test("link predict: self-tuning cut sparsifies; predictions disjoint from edges; order total") {
    // sf0.001's 900-permille backbone is 2 disjoint edges — no wedges, so
    // the spec exercises the parameter at 750 (the sf0.01 driver oracle
    // covers the 900 default)
    val out = Graph.linkPredict(spark, dir, topK = 10, cutPermille = 750).collect()
    assert(out.nonEmpty, "median cut failed to sparsify — no links to predict")
    assert(out.length <= 10)
    out.foreach(r => assert(r.getLong(0) < r.getLong(1), "pairs must be oriented u < v"))
    assert(out.map(r => (r.getLong(0), r.getLong(1))).distinct.length == out.length)
    // ranking is the documented total order
    val key = out.map(r => (-r.getLong(3), -r.getLong(2), r.getLong(0), r.getLong(1)))
    assert(key.sameElements(key.sorted), "output violates (ra DESC, common DESC, u, v)")
    out.foreach { r =>
      assert(r.getLong(2) >= 1, "a predicted pair must share a neighbor")
      // RA with >= 1 common neighbor of degree >= 1 is >= 1 micro-unit
      assert(r.getLong(3) >= 1)
    }
  }

  test("lpa: labels are node ids, sizes consistent, backbone yields real structure") {
    val rows = Graph.lpaCommunities(spark, dir).collect()
    assert(rows.nonEmpty)
    val nodes = rows.map(_.getLong(0)).toSet
    val byComm = rows.groupBy(_.getLong(1))
    // labels originate as node ids and propagation only copies them
    byComm.keys.foreach(l => assert(nodes.contains(l), s"label $l is not a node"))
    byComm.foreach { case (_, rs) =>
      rs.foreach(r => assert(r.getLong(2) == rs.length, "community_size drifted"))
    }
    // the top-decile cut exists BECAUSE the median graph collapses to one
    // community — the backbone must show actual structure
    assert(byComm.size > 1, "LPA degenerated to a single community")
    intercept[IllegalArgumentException](Graph.lpaCommunities(spark, dir, steps = 0))
    intercept[IllegalArgumentException](Graph.lpaCommunities(spark, dir, cutPermille = 1000))
  }

  test("phrase search: every hit contains the phrase; counts match an independent scan") {
    val hits = TextAnalysis.phraseSearch(spark, dir, phrase = "fast table").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // independent ground truth: whitespace-tokenize driver-side and count
    // adjacent ("fast", "table") positions
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select("doc_id", "text").collect()
      .map { r =>
        val toks = r.getString(1).toLowerCase.split(" ")
        val n = toks.indices.dropRight(1)
          .count(i => toks(i) == "fast" && toks(i + 1) == "table")
        r.getLong(0) -> n.toLong
      }.filter(_._2 > 0).toMap
    assert(hits == want, s"phrase hits diverge: got ${hits.size}, want ${want.size}")
  }

  test("containment: prefix filter is lossless vs brute force and prunes the pair space") {
    val got = TextAnalysis.containmentJoin(spark, dir, k = 12, tMilli = 800)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(4))).toSet
    // brute-force ground truth over the same 60-bit hashed shingles
    graft.functions.GraftFunctions.register(spark)
    val h60 = s"graft_poly_hash(x, 31, ${graft.functions.Portable.P1}L) * 1073741824L + " +
      s"graft_poly_hash(x, 37, ${graft.functions.Portable.P2}L) % 1073741824L"
    val sh = spark.read.parquet(s"$dir/documents.parquet")
      .filter(length(col("text")) >= 12)
      .select(col("doc_id"),
        explode(array_distinct(expr(
          s"transform(transform(sequence(1, length(text) - 11), " +
            s"i -> substring(text, i, 12)), x -> $h60)"))).as("s"))
    sh.createOrReplaceTempView("r10_sh")
    val want = spark.sql(
      """WITH sz AS (SELECT doc_id, count(*) AS size_a FROM r10_sh GROUP BY doc_id),
        |p AS (SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS n_common
        |      FROM r10_sh a JOIN r10_sh b ON a.s = b.s AND a.doc_id != b.doc_id
        |      GROUP BY 1, 2)
        |SELECT a_id, b_id, 1000 * n_common div size_a AS cm
        |FROM p JOIN sz ON a_id = sz.doc_id
        |WHERE 1000 * n_common div size_a >= 800""".stripMargin)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(got == want, s"containment diverges from brute force: ${got.size} vs ${want.size}")
    // the t=1 cut degenerates to single-shingle prefixes and still works
    val strict = TextAnalysis.containmentJoin(spark, dir, k = 12, tMilli = 1000).collect()
    strict.foreach(r => assert(r.getLong(4) == 1000L))
    intercept[IllegalArgumentException](
      TextAnalysis.containmentJoin(spark, dir, tMilli = 0))
  }

  test("winnowing: density near 2/(w+1); selection invariants; checksum consistent") {
    val rows = TextAnalysis.winnowing(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      val (nGrams, nSel, nDist, density) =
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(5))
      assert(nSel >= 1 && nSel <= nGrams - 3, "selected count outside window bounds")
      assert(nDist >= 1 && nDist <= nSel)
      assert(density == 1000L * nSel / (nGrams - 3), "density identity")
      // winnowing theory: expected density 2/(w+1) = 400 milli on random
      // hashes; real text wobbles but stays in a broad band
      assert(density >= 200 && density <= 700, s"density $density implausible")
    }
  }

  test("r14: winnowing model == SQL fold (binds WinnowingPropertySpec to the shipped rule)") {
    // WinnowingPropertySpec proves the SIGMOD'03 guarantee against a Scala
    // model of the per-window rightmost-min fold; this case runs the REAL
    // SQL fold (the exact snippet winnowSelected uses, applied to literal
    // hash arrays) next to the model so the properties demonstrably hold
    // for the shipped rule. Arrays chosen to hammer the <= tie rule.
    import spark.implicits._
    val w = 4
    val arrays = Seq(
      Vector(3L, 1L, 1L, 2L, 1L, 5L, 0L, 0L, 9L),
      Vector(7L, 7L, 7L, 7L, 7L),
      Vector(1L, 2L, 3L, 4L, 5L, 6L),
      Vector(6L, 5L, 4L, 3L, 2L, 1L))
    val sql = arrays.toDF("hs")
      .selectExpr(s"""array_distinct(transform(sequence(1, size(hs) - ${w - 1}),
           j -> aggregate(sequence(0, ${w - 1}),
             named_struct('h', 9223372036854775807L, 'pos', -1L),
             (acc, o) -> IF(element_at(hs, CAST(j + o AS INT)) <= acc.h,
               named_struct('h', element_at(hs, CAST(j + o AS INT)), 'pos', CAST(j + o AS BIGINT)),
               acc)))) AS sel""")
      .collect()
      .map(_.getSeq[org.apache.spark.sql.Row](0)
        .map(s => (s.getLong(1), s.getLong(0))).toSet)
    for ((hs, got) <- arrays.zip(sql)) {
      // SQL positions are 1-based (element_at); the model is 0-based
      val want = WinnowingPropertySpec.select(hs, w).map { case (p, h) => (p + 1L, h) }
      assert(got == want, s"SQL fold disagrees with the model on $hs: sql=$got model=$want")
    }
  }

  test("winnowing guarantee: every high-containment pair shares >= 1 winnowed hash") {
    // containment pairs share full 12-char shingles; 12 >= w + k - 1 = 11,
    // so the SIGMOD'03 guarantee promises at least one common selected
    // fingerprint — the cross-operator losslessness proof
    val contained = TextAnalysis.containmentJoin(spark, dir, k = 12, tMilli = 800)
      .collect().map(r => (math.min(r.getLong(0), r.getLong(1)),
        math.max(r.getLong(0), r.getLong(1)))).toSet
    // stop-fingerprint cap disabled: the raw guarantee join is the claim
    val shared = TextAnalysis.winnowingOverlap(spark, dir, minSharedMilli = 1,
        maxDfPermille = 1000, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val missed = contained -- shared
    assert(missed.isEmpty, s"winnowing missed high-containment pairs: $missed")
  }

  test("winnowing overlap: fractional + min-count gates honored, pairs oriented and unique") {
    val rows = TextAnalysis.winnowingOverlap(spark, dir).collect()
    assert(rows.nonEmpty, "stop-fingerprint cap removed every real overlap")
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1), "pairs must be oriented a < b")
      val sm = r.getLong(3)
      assert(sm >= 500 && sm <= 1000, s"shared_milli $sm outside the gate")
      // min-count floor: n_shared >= 500/1000 * least(ca,cb) >= 10
      assert(r.getLong(2) >= 10, "pair survived with fewer rare hashes than the floor allows")
    }
    assert(rows.map(r => (r.getLong(0), r.getLong(1))).distinct.length == rows.length)
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingOverlap(spark, dir, minSharedMilli = 0))
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingOverlap(spark, dir, maxDfPermille = 0))
  }

  test("winnowing overlap: forced hot-hash blocking (blockCap=2) is pair-identical to the plain join") {
    // r14 deep-read: the pair self-join on `h` gained the blocked-self-join
    // skew guard (a hash at the df cap otherwise lands its quadratic pair
    // stream on one reduce task). At the default cap every fixture hash has
    // s = 1, so force s > 1 with blockCap = 2 — the blocked-exactly-once
    // pairing lemma must make n_shared and the gated output BIT-identical.
    val plain = TextAnalysis.winnowingOverlap(spark, dir, minSharedMilli = 1,
        maxDfPermille = 1000, minCount = 1)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    val blocked = TextAnalysis.winnowingOverlap(spark, dir, minSharedMilli = 1,
        maxDfPermille = 1000, minCount = 1, blockCap = 2)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSet
    assert(blocked == plain,
      s"blocked pair join diverged: only-blocked=${blocked -- plain} only-plain=${plain -- blocked}")
    intercept[IllegalArgumentException](
      TextAnalysis.winnowingOverlap(spark, dir, blockCap = 0))
  }

  test("distinct-n diversity: instance totals recomputed independently; ratio identity") {
    val rows = TextAnalysis.distinctNgrams(spark, dir).collect()
    assert(rows.nonEmpty)
    // independent recomputation of per-source trigram instance counts
    val want = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("source"), expr("greatest(size(split(trim(text), '\\\\s+')) - 2, 0)").as("g"))
      .groupBy("source").agg(sum("g").as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    rows.foreach { r =>
      val (src, inst, dist) = (r.getString(0), r.getLong(3), r.getLong(4))
      assert(inst == want(src), s"$src instance count $inst != ${want(src)}")
      assert(dist >= 1 && dist <= inst)
      assert(r.getLong(5) == 1000L * dist / inst, "distinct_milli identity")
    }
  }

  test("margin mining: one aligned partner per side-A vector; mutual partners unique") {
    val rows = Similarity.marginMining(spark, dir).collect()
    val nSideA = spark.read.parquet(s"$dir/embeddings.parquet")
      .filter(col("vec_id") % 10 === 0).count()
    assert(rows.length == nSideA, "exactly one best-margin row per side-A vector")
    assert(rows.map(_.getLong(0)).distinct.length == rows.length)
    rows.foreach { r =>
      assert(r.getLong(0) % 10 == 0 && r.getLong(1) % 10 != 0, "side split violated")
      assert(r.getLong(2) > 0, "margin must be positive on this corpus")
    }
    // a side-B vector's best-x is unique, so mutual rows can't share y
    val mutualYs = rows.filter(_.getBoolean(3)).map(_.getLong(1))
    assert(mutualYs.nonEmpty, "no mutual alignment found — mining degenerated")
    assert(mutualYs.distinct.length == mutualYs.length)
    intercept[IllegalArgumentException](Similarity.marginMining(spark, dir, k = 0))
  }

  test("calibrated quality: every source independently meets the keep rate; cut value-atomic") {
    val rows = TextAnalysis.qualityCalibrated(spark, dir).collect()
    assert(rows.nonEmpty)
    rows.groupBy(_.getString(1)).foreach { case (src, rs) =>
      val kept = rs.count(_.getBoolean(5))
      // the CALIBRATION property: each source meets the 30% target on its
      // own (a global cut would starve high-xent sources entirely)
      assert(1000L * kept >= 300L * rs.length,
        s"source $src kept only $kept/${rs.length}")
      val thr = rs.head.getLong(4)
      rs.foreach { r =>
        assert(r.getLong(4) == thr, "threshold must be constant per source")
        assert(r.getBoolean(5) == (r.getLong(3) <= thr), "keep decision != threshold rule")
        assert(r.getLong(3) == r.getLong(2) / 1000, "milli quantization identity")
      }
      // value-atomic: removing the boundary value drops below target, so
      // the chosen threshold is minimal
      val below = rs.count(_.getLong(3) < thr)
      assert(1000L * below < 300L * rs.length, "threshold is not minimal")
    }
    // keepMilli = 1000 keeps every document
    assert(TextAnalysis.qualityCalibrated(spark, dir, keepMilli = 1000)
      .filter(!col("kept")).count() == 0)
    intercept[IllegalArgumentException](
      TextAnalysis.qualityCalibrated(spark, dir, keepMilli = 0))
  }

  test("r10 batch plan shapes: no cartesian; nested-loop only as one-row scalar broadcasts") {
    // dq_benford broadcasts its one-row total and graph_link_predict its
    // one-row threshold/count — those BNLJ sites are by-construction
    // bounded; anywhere else a BNLJ means an equi-join silently degraded
    // ann_margin_mining's allowed BNLJ is the bounded QUERY-SET broadcast
    // (side A × corpus scoring scan), the same shape PlanSpec blesses for
    // ann_topk — not a degraded equi-join
    // text_quality_calibrated inherits lmCrossEntropy's one-row vocab
    // crossJoin — also a bounded scalar broadcast
    val scalarBroadcastOk = Set("dq_benford", "graph_link_predict",
      "graph_link_predict_skew", "graph_lpa",
      "ann_margin_mining", "text_quality_calibrated", "text_winnowing_overlap")
    val batch = Seq("events_acf", "events_cusum", "events_seasonality",
      "events_ohlc", "events_rolling_median", "events_decompose",
      "dq_benford", "dq_ldiversity",
      "graph_link_predict", "graph_link_predict_skew",
      "graph_lpa", "text_phrase_search", "text_containment",
      "text_winnowing", "text_winnowing_overlap", "text_distinct_ngrams",
      "ann_margin_mining", "text_quality_calibrated")
    batch.foreach { name =>
      val plan = SparkEntry.queries(name)(spark, dir)
        .queryExecution.executedPlan.toString
      assert(!plan.contains("CartesianProduct"),
        s"$name plans a cartesian product:\n$plan")
      if (!scalarBroadcastOk(name))
        assert(!plan.contains("BroadcastNestedLoopJoin"),
          s"$name lost its equi-join:\n$plan")
    }
  }
}
