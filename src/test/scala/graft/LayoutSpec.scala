package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Layout

class LayoutSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  private def zRef(x: Long, y: Long): Long = {
    var v = 0L
    var b = 0
    while (b < Layout.BitsPerKey) {
      v |= ((x >> b) & 1L) << (2 * b) | ((y >> b) & 1L) << (2 * b + 1)
      b += 1
    }
    v
  }

  test("zValue matches the bit-interleave reference, incl. 21-bit truncation") {
    import spark.implicits._
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (1L, 1L),
      (101L, 9L), ((1L << 21) - 1, (1L << 21) - 1),
      // wider than 21 bits: high bits must be dropped, not shifted in
      ((1L << 21) | 5L, 3L), ((1L << 40) | 7L, (1L << 30) | 2L))
    val got = cases.toDF("x", "y")
      .select(Layout.zValue(col("x"), col("y")).as("z")).collect().map(_.getLong(0))
    val want = cases.map { case (x, y) => zRef(x & ((1L << 21) - 1), y & ((1L << 21) - 1)) }
    assert(got.toSeq == want)
    // full-width keys: z stays within 42 bits (positive, range-partitionable)
    assert(got.forall(z => z >= 0 && z < (1L << 42)))
  }

  private def hilbertRef(bits: Int, x0: Long, y0: Long): Long = {
    var x = x0 & ((1L << bits) - 1)
    var y = y0 & ((1L << bits) - 1)
    var d = 0L
    var s = 1L << (bits - 1)
    while (s > 0) {
      val rx = if ((x & s) != 0) 1L else 0L
      val ry = if ((y & s) != 0) 1L else 0L
      d += s * s * ((3 * rx) ^ ry)
      if (ry == 0) {
        if (rx == 1) { x = s - 1 - x; y = s - 1 - y }
        val t = x; x = y; y = t
      }
      s >>= 1
    }
    d
  }

  test("r9: graft_hilbert is a true Hilbert curve — bijective, unit-step, beats Morton locality") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val n = 16
    val grid = (for (x <- 0 until n; y <- 0 until n) yield (x.toLong, y.toLong)).toDF("x", "y")
    val got = grid.selectExpr("x", "y", "graft_hilbert(x, y, 4) AS d").collect()
      .map(r => r.getLong(2) -> (r.getLong(0), r.getLong(1))).toMap
    assert(got.keySet == (0 until n * n).map(_.toLong).toSet,
      "hilbert indexes must be a bijection onto [0, n^2)")
    val jumps = (0L until (n * n - 1).toLong).count { d =>
      val (x1, y1) = got(d)
      val (x2, y2) = got(d + 1)
      math.abs(x1 - x2) + math.abs(y1 - y2) != 1
    }
    assert(jumps == 0, s"every consecutive index pair must be grid-adjacent; found $jumps jumps")
    // the Morton order on the same grid has Z-shaped jumps — the locality
    // advantage clusterHilbert's doc claims is measurable, not asserted
    val byZ = got.values.toSeq.sortBy { case (x, y) => zRef(x, y) }
    val mortonJumps = byZ.sliding(2).count {
      case Seq((x1, y1), (x2, y2)) => math.abs(x1 - x2) + math.abs(y1 - y2) != 1
      case _ => false
    }
    assert(mortonJumps > 0, "Morton should jump on a full grid (sanity of the comparison)")
    info(s"non-unit steps over the 16x16 grid: hilbert=0, morton=$mortonJumps")
  }

  test("r9: graft_hilbert matches the xy2d reference, incl. 16-bit truncation") {
    import spark.implicits._
    graft.functions.GraftFunctions.register(spark)
    val cases = Seq[(Long, Long)](
      (0L, 0L), (1L, 0L), (0L, 1L), (65535L, 65535L), (101L, 9L), (40000L, 1L),
      // wider than 16 bits: high bits must be dropped, not shifted in
      ((1L << 16) | 5L, 3L), ((1L << 40) | 7L, (1L << 30) | 2L))
    val got = cases.toDF("x", "y")
      .selectExpr("graft_hilbert(x, y, 16) AS d").collect().map(_.getLong(0))
    val want = cases.map { case (x, y) => hilbertRef(16, x, y) }
    assert(got.toSeq == want)
    assert(got.forall(d => d >= 0 && d < (1L << 32)), "16+16 bits → 32-bit positive index")
  }

  test("r9: clusterHilbert range-partitions on the curve and tiles the key space") {
    val li = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet")
    val clustered = Layout.clusterHilbert(li, "l_partkey", "l_suppkey", 8)
    val plan = clustered.queryExecution.executedPlan.toString()
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange, got:\n$plan")
    val stats = clustered
      .select(col("l_partkey").cast("long").as("x"), col("l_suppkey").cast("long").as("y"),
        spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("x").as("x0"), max("x").as("x1"), min("y").as("y0"), max("y").as("y1"))
      .collect()
    assert(stats.length > 1, "range partitioner should produce multiple partitions")
    val r = li.selectExpr("CAST(l_partkey AS LONG) AS x", "CAST(l_suppkey AS LONG) AS y")
      .agg(min("x"), max("x"), min("y"), max("y")).head()
    val (xAll, yAll) = ((r.getLong(1) - r.getLong(0) + 1).toDouble, (r.getLong(3) - r.getLong(2) + 1).toDouble)
    val fractions = stats.map { s =>
      ((s.getLong(2) - s.getLong(1) + 1).toDouble / xAll) *
        ((s.getLong(4) - s.getLong(3) + 1).toDouble / yAll)
    }
    val mean = fractions.sum / fractions.length
    assert(mean < 0.5, s"hilbert rectangles too large: mean area fraction $mean")
  }

  test("cluster range-partitions on z and tiles the key space (data-skipping property)") {
    val li = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet")
    val files = 8
    val clustered = Layout.cluster(li, "l_partkey", "l_suppkey", files)
    // plan shape: one range exchange on the z expression, no extra shuffle
    val plan = clustered.queryExecution.executedPlan.toString()
    assert(plan.contains("rangepartitioning") || plan.contains("RangePartitioning"),
      s"expected a range exchange, got:\n$plan")

    // Data-skipping: per output partition, the (x, y) bounding rectangles
    // must cover a small fraction of the full key-space area — a single-key
    // sort would give full-width stripes on the second key (fraction ~1).
    val stats = clustered
      .select(col("l_partkey").cast("long").as("l_partkey"),
        col("l_suppkey").cast("long").as("l_suppkey"), spark_partition_id().as("pid"))
      .groupBy("pid")
      .agg(min("l_partkey").as("x0"), max("l_partkey").as("x1"),
        min("l_suppkey").as("y0"), max("l_suppkey").as("y1"))
      .collect()
    assert(stats.length > 1, "range partitioner should produce multiple partitions")
    val (xAll, yAll) = {
      val r = li.selectExpr("CAST(l_partkey AS LONG) AS x", "CAST(l_suppkey AS LONG) AS y")
        .agg(min("x"), max("x"), min("y"), max("y")).head()
      ((r.getLong(1) - r.getLong(0) + 1).toDouble, (r.getLong(3) - r.getLong(2) + 1).toDouble)
    }
    val fractions = stats.map { r =>
      val xw = (r.getLong(2) - r.getLong(1) + 1).toDouble
      val yw = (r.getLong(4) - r.getLong(3) + 1).toDouble
      (xw / xAll) * (yw / yAll)
    }
    val mean = fractions.sum / fractions.length
    // 8 partitions over a z-curve: each rectangle covers ~1/8 of the area
    // (curve boundaries straddle at most a few cells); a one-key sort gives
    // mean ≈ 1/8 on x but 1.0 on y → area fraction ≈ 1/8 with yw full —
    // the interleave must do strictly better than 0.5 on average and the
    // partitions must not all span the full y range.
    assert(mean < 0.5, s"z-order rectangles too large: mean area fraction $mean")
    assert(stats.exists(r => (r.getLong(4) - r.getLong(3) + 1).toDouble < yAll),
      "at least one partition must span a strict y sub-range")
  }

  test("cluster normalization survives key domains wider than 2^42 (no overflow scramble)") {
    // Regression for the r5 ADVICE finding: (x - lo) * full in 64-bit
    // arithmetic overflows for domains wider than ~2^42, silently
    // scrambling z-values (layout would degrade to no skipping). The wide
    // path must stay RANK-PRESERVING: clustering on a huge-domain key
    // still tiles it into strict sub-ranges per partition.
    import spark.implicits._
    // x spans ~2^61; y constant, so z is MONOTONE in x and every range
    // partition must be a contiguous x interval — under an overflow
    // scramble z wraps pseudo-randomly and partitions span ~the whole
    // domain, so the intervals overlap massively.
    val wide = (0 until 4096).map(i => (i.toLong * (1L << 49), 1L)).toDF("x", "y")
    val clustered = Layout.cluster(wide, "x", "y", 8)
    val stats = clustered
      .select(col("x"), spark_partition_id().as("pid"))
      .groupBy("pid").agg(min("x").as("x0"), max("x").as("x1"), count(lit(1)).as("n"))
      .collect().filter(_.getLong(3) > 0)
      .map(r => (r.getLong(1), r.getLong(2))).sortBy(_._1)
    assert(stats.length > 1, "range partitioner should produce multiple partitions")
    val overlaps = stats.sliding(2).collect { case Array((_, hi1), (lo2, _)) => hi1 >= lo2 }
    assert(!overlaps.contains(true),
      s"partition x-intervals overlap — z-values scrambled by overflow: ${stats.toSeq}")
  }

  test("written z-ordered files skip on disk: footer stats prune point lookups") {
    import org.apache.hadoop.fs.Path
    import org.apache.parquet.hadoop.ParquetFileReader
    import org.apache.parquet.hadoop.util.HadoopInputFile
    val li = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet")
    val conf = spark.sparkContext.hadoopConfiguration

    def fileRanges(dir: String): Seq[(Long, Long, Long, Long)] = {
      val files = new java.io.File(dir).listFiles().filter(_.getName.endsWith(".parquet"))
      files.toSeq.map { f =>
        val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(f.toString), conf))
        try {
          val blocks = reader.getFooter.getBlocks
          import scala.jdk.CollectionConverters._
          val stats = blocks.asScala.flatMap(_.getColumns.asScala)
            .filter(c => Seq("l_partkey", "l_suppkey").contains(c.getPath.toDotString))
            .map(c => c.getPath.toDotString ->
              (c.getStatistics.genericGetMin, c.getStatistics.genericGetMax))
          def rng(n: String) = {
            val vs = stats.filter(_._1 == n).map(_._2)
            (vs.map(_._1.asInstanceOf[Number].longValue).min,
              vs.map(_._2.asInstanceOf[Number].longValue).max)
          }
          val (x0, x1) = rng("l_partkey"); val (y0, y1) = rng("l_suppkey")
          (x0, x1, y0, y1)
        } finally reader.close()
      }
    }

    val zDir = java.nio.file.Files.createTempDirectory("zorder-out").toString
    Layout.cluster(li, "l_partkey", "l_suppkey", 8)
      .write.mode("overwrite").parquet(zDir)
    val plainDir = java.nio.file.Files.createTempDirectory("plain-out").toString
    li.repartition(8).write.mode("overwrite").parquet(plainDir)

    val zRanges = fileRanges(zDir)
    val plainRanges = fileRanges(plainDir)
    assert(zRanges.size > 1 && plainRanges.size > 1)

    // a point predicate (x=a AND y=b) must touch only files whose footer
    // rectangle contains the point — count survivors over a probe grid
    val probes = li.selectExpr("CAST(l_partkey AS LONG)", "CAST(l_suppkey AS LONG)")
      .distinct().limit(64).collect().map(r => (r.getLong(0), r.getLong(1)))
    def touched(ranges: Seq[(Long, Long, Long, Long)], x: Long, y: Long) =
      ranges.count(r => x >= r._1 && x <= r._2 && y >= r._3 && y <= r._4)
    val zTouched = probes.map { case (x, y) => touched(zRanges, x, y) }.sum.toDouble / probes.length
    val pTouched = probes.map { case (x, y) => touched(plainRanges, x, y) }.sum.toDouble / probes.length
    info(f"avg files touched per point lookup: zorder $zTouched%.2f vs plain $pTouched%.2f of ${zRanges.size}")
    // hash-repartitioned files span the full key space: every probe hits
    // every file; z-ordered files must prune to a strict subset on average
    assert(pTouched >= plainRanges.size * 0.99, "plain layout unexpectedly prunes")
    assert(zTouched < pTouched * 0.7,
      f"z-order layout does not skip on disk: $zTouched%.2f vs $pTouched%.2f")
  }

  test("layout_zorder catalog query equals the reference on real rows") {
    val out = graft.operators.Layout.zorderQuery(spark, SparkSpec.testDataDir)
      .selectExpr("CAST(l_partkey AS LONG)", "CAST(l_suppkey AS LONG)", "zval").collect()
    out.foreach { r =>
      assert(r.getLong(2) == zRef(r.getLong(0), r.getLong(1)),
        s"zval mismatch for (${r.getLong(0)}, ${r.getLong(1)})")
    }
  }

  test("r9: skipping gain: z-order prunes, ingest order cannot") {
    val rows = graft.operators.Layout.skippingGain(spark, SparkSpec.testDataDir)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(4), r.getLong(5)))
    val (nat, zo) = rows.partition(_._1 == "natural")
    assert(nat.length == 16 && zo.length == 16, s"16 probes per layout: ${rows.length}")
    val natScan = nat.map(_._4).sum; val zoScan = zo.map(_._4).sum
    // ingest order is uncorrelated with (partkey, suppkey): every chunk
    // spans nearly the full key rectangle, so pruning barely helps
    assert(natScan * 10 >= nat.map(_._3).sum * 8, s"natural should scan >=80%: $natScan")
    // the z-layout gives each chunk a small rectangle: most probes prune
    assert(zoScan * 4 <= natScan, s"z-order must scan <=25% of natural: $zoScan vs $natScan")
    // a probe never scans more chunks than exist
    rows.foreach { case (l, p, n, s) => assert(s <= n, s"$l probe $p: $s > $n") }
  }
}
