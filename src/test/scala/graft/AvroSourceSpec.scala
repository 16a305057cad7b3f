package graft

import java.nio.file.Files

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Similarity
import graft.schema.AvroSchemaGen
import graft.sink.AvroSink
import graft.sources.AvroSource

/** Round trip: export parquet → Avro with the sink, read back with the
  * source, values identical (modulo the documented wire conversions:
  * timestamps → epoch millis).
  */
class AvroSourceSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark

  test("avro round trip preserves lineitem content") {
    import org.apache.spark.sql.functions._
    val dir = Files.createTempDirectory("avro-roundtrip").toString
    val li = spark.read.parquet(s"${SparkSpec.testDataDir}/lineitem.parquet")
    val schema = AvroSchemaGen.generate(li.schema, AvroSchemaGen.Config(tableName = "lineitem"))
    AvroSink.write(li, schema, dir, "deflate1")

    val back = AvroSource.read(spark, dir)
    assert(back.count() == li.count())
    // timestamps come back as epoch-millis longs (dbeam wire format)
    val expected = li.select(
      col("l_orderkey"), col("l_linenumber"),
      unix_millis(col("l_shipdate").cast("timestamp")).as("l_shipdate"))
    val got = back.select("l_orderkey", "l_linenumber", "l_shipdate")
    assert(got.exceptAll(expected).count() == 0)
    assert(expected.exceptAll(got).count() == 0)
    // parallelism preserved: one read partition per container file
    assert(back.rdd.getNumPartitions == li.rdd.getNumPartitions)
  }

  test("commit manifest: written after parts, rejects partition-count drift") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("avro-manifest").toString
    val schema = StructType(Seq(StructField("id", LongType)))
    def df(n: Int, parts: Int) = spark.createDataFrame(
      (0 until n).map(i => Row(i.toLong)).asJava, schema).repartition(parts)
    val avro = AvroSchemaGen.generate(schema, AvroSchemaGen.Config())

    AvroSink.write(df(10, 3), avro, dir, "deflate1")
    val manifest = java.nio.file.Files.readString(java.nio.file.Paths.get(dir, "_MANIFEST"))
    assert(manifest.trim.split("\n").toSeq == (0 until 3).map(i => f"part-$i%05d-of-00003.avro"))
    assert(AvroSource.read(spark, dir).count() == 10)

    // a same-plan retry rewrites the same names + same manifest: still reads
    AvroSink.write(df(10, 3), avro, dir, "deflate1")
    assert(AvroSource.read(spark, dir).count() == 10)

    // a replayed write with DIFFERENT parallelism adds a disjoint
    // part-i-of-2 set; without the manifest this would read 20 rows —
    // with it, the reader fails loudly
    AvroSink.write(df(10, 2), avro, dir, "deflate1")
    val e = intercept[IllegalArgumentException](AvroSource.read(spark, dir))
    assert(e.getMessage.contains("commit manifest"))
  }

  test("round trip preserves nulls and arrays") {
    import scala.jdk.CollectionConverters._
    import org.apache.spark.sql.Row
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("avro-rt2").toString
    val schema = StructType(Seq(
      StructField("id", LongType),
      StructField("s", StringType),
      StructField("arr", ArrayType(IntegerType, containsNull = false))))
    val df = spark.createDataFrame(
      Seq(Row(1L, null, Seq(1, 2)), Row(2L, "x", Seq.empty[Int])).asJava, schema).coalesce(1)
    AvroSink.write(df, AvroSchemaGen.generate(schema, AvroSchemaGen.Config()), dir, "deflate1")
    val back = AvroSource.read(spark, dir).collect().sortBy(_.getLong(0))
    assert(back(0).isNullAt(1))
    assert(back(0).getSeq[Int](2) == Seq(1, 2))
    assert(back(1).getString(1) == "x")
    assert(back(1).getSeq[Int](2).isEmpty)
  }
}

class IvfSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir

  test("IVF recall vs brute force is reasonable for probe fraction") {
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivf = Similarity.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val recall = (exact & ivf).size.toDouble / exact.size
    info(s"IVF recall@10 = $recall (probing ${Similarity.NumProbes}/${Similarity.NumCentroids} cells)")
    // near-random vectors spread neighbors across cells; probing 6/16 cells
    // must recover at least the probed fraction's worth
    assert(recall >= 0.5, s"recall $recall unreasonably low")
    // and every returned neighbor must rank correctly (1..10 per query)
    val ranks = Similarity.ivfTopK(spark, dir).collect()
      .groupBy(_.getLong(0)).values.map(_.map(_.getInt(2)).sorted.toSeq)
    assert(ranks.forall(r => r == (1 to r.size)))
  }

  test("Lloyd refinement is deterministic and no worse than raw seeds") {
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // Full-corpus training isolates Lloyd's property from sampling noise
    // (with a 10% sample of the 500-vector fixture, the 50-point training
    // set's noise dominates and the monotonicity claim is meaningless —
    // the sampled path's recall is gated separately by ann_ivf_check).
    def recallOf(iters: Int) = {
      val ivf = Similarity.ivfTopK(spark, dir, refineIters = iters,
        trainFraction = 1.0).collect()
        .map(r => (r.getLong(0), r.getLong(1))).toSet
      (exact & ivf).size.toDouble / exact.size
    }
    val r0 = recallOf(0)
    val r2 = recallOf(2)
    info(s"IVF recall@10: seeds=$r0, 2 Lloyd iters=$r2")
    // k-means tightens cells; on near-random data it must at least not hurt
    // beyond noise (one neighbor out of 50)
    assert(r2 >= r0 - 0.02, s"refinement degraded recall: $r0 -> $r2")
    // determinism ACROSS partition layouts: centroid means are exact
    // integer-micros sums (commutative), so changing the shuffle
    // parallelism — i.e. the summation order — must not move a single rank
    val a = Similarity.ivfTopK(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    val prev = spark.conf.get("spark.sql.shuffle.partitions")
    val b = try {
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      Similarity.ivfTopK(spark, dir).collect().map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
    } finally spark.conf.set("spark.sql.shuffle.partitions", prev)
    assert(a == b, "IVF results drifted with summation order — centroid math is not order-independent")
  }

  test("IVF tuning surface: recall gate holds at the non-default (32 cells, 4 probes) point") {
    // Round-7: numCentroids/numProbes are parameters, not constants — the
    // 100 TB settings differ from the fixture defaults (cells ≈ √n). This
    // cell probes 4/32 = 12.5% of a finer partition over near-random
    // vectors; measured per-query hits are (3,1,1,2,3)/10 and the pipeline
    // is deterministic, so the floor is the measured minimum. The gate
    // shape is exactly ann_ivf_check's, so an off-default regression —
    // e.g. a parameter not actually reaching training or probing — is
    // visible as a zero.
    val rows = Similarity.ivfRecallFloor(spark, dir, minHits = 1,
      numCentroids = 32, numProbes = 4).collect()
    assert(rows.length == 5, s"one gate row per query expected, got ${rows.length}")
    assert(rows.forall(_.getBoolean(1)),
      s"off-default recall floor violated: ${rows.mkString(", ")}")
    // and the default cell still holds its stronger floor
    val dflt = Similarity.ivfRecallFloor(spark, dir).collect()
    assert(dflt.forall(_.getBoolean(1)), "default-cell recall floor violated")
  }

  test("r12: hot-cell clustered twin corpus is a real ball and keeps the recall floor") {
    import org.apache.spark.sql.functions._
    graft.functions.GraftFunctions.register(spark)
    val clustered = Similarity.clusteredEmbeddings(spark, dir)
    val n = clustered.count()
    // the ball: ≥ 85% of vectors sit within cosine 0.99 of vector 0's
    // nudged center — the property that makes ONE quantizer cell hot
    val anchor = clustered.filter(col("vec_id") === 1)
      .select("embedding").head().getSeq[Float](0)
    val lit64 = anchor.map(_.toDouble).mkString("array(", "D, ", "D)")
    val near = clustered.withColumn("c",
      expr(s"graft_dot(embedding, $lit64)") /
        (expr("sqrt(graft_dot(embedding, embedding))") *
          math.sqrt(anchor.map(x => x.toDouble * x).sum)))
      .filter(col("c") > 0.99).count()
    assert(near * 1000 >= n * 850, s"ball too loose: $near / $n within cosine 0.99")
    // determinism: the derived corpus is a pure map — two builds identical
    assert(clustered.exceptAll(Similarity.clusteredEmbeddings(spark, dir)).isEmpty)
    // and the gate the catalog row runs is green on this fixture
    val rows = Similarity.ivfRecallFloorClustered(spark, dir).collect()
    assert(rows.length == 5 && rows.forall(_.getBoolean(1)),
      s"hot-cell recall floor violated: ${rows.mkString(", ")}")
    // off-default knob cell (the IvfSpec pattern): a HALF-clustered corpus
    // must also hold the floor, and the parameter must actually reach the
    // corpus builder — at 500 permille the ball holds ~half the vectors
    val half = Similarity.clusteredEmbeddings(spark, dir, clusterPermille = 500)
    val nHalf = half.count()
    val kept = half.join(
      Similarity.clusteredEmbeddings(spark, dir).select("vec_id", "embedding"),
      Seq("vec_id", "embedding"), "left_semi").count()
    assert(kept < nHalf, "clusterPermille=500 must differ from the 900 default")
    val offRows = Similarity.ivfRecallFloorClustered(spark, dir,
      clusterPermille = 500).collect()
    assert(offRows.length == 5 && offRows.forall(_.getBoolean(1)),
      s"off-default hot-cell floor violated: ${offRows.mkString(", ")}")
  }

  test("persisted IVF index: store-backed query path is bit-equal to the direct path") {
    val store = java.nio.file.Files.createTempDirectory("ivf-store-spec").toString
    try {
      Similarity.writeIvfIndex(spark, dir, store)
      val viaStore = Similarity.ivfTopKViaStore(spark, dir, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = Similarity.ivfTopK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaStore == direct,
        s"store round trip changed results: store-only=${(viaStore -- direct).take(5)} " +
          s"direct-only=${(direct -- viaStore).take(5)}")
      // the index artifacts have the documented shapes
      assert(spark.read.parquet(s"$store/centroids.parquet").count() == Similarity.NumCentroids)
      assert(spark.read.parquet(s"$store/assignments.parquet").count() ==
        spark.read.parquet(s"$dir/embeddings.parquet").count())
    } finally {
      new scala.reflect.io.Directory(new java.io.File(store)).deleteRecursively()
    }
  }

  test("IVF-PQ composition: recall floor >= 3/10 per query, deterministic across runs") {
    val exact = Similarity.bruteForceTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val run1 = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    val run2 = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2)))
    assert(run1.sorted.toSeq == run2.sorted.toSeq,
      "IVF-PQ must be bit-reproducible (both quantizers seeded, exact integer means)")
    run1.map(t => (t._1, t._2)).groupBy(_._1).foreach { case (q, rows) =>
      val hits = rows.count(exact.contains)
      info(s"IVF-PQ recall q=$q: $hits/10")
      assert(hits >= 3, s"IVF-PQ recall for query $q below floor: $hits/10")
    }
    // every query answered with exactly k ranked rows
    assert(run1.groupBy(_._1).values.forall(_.map(_._3).sorted.toSeq == (1 to 10)))
  }

  test("IVF-PQ gate rows are all true on the fixture") {
    val rows = Similarity.ivfPqRecallFloor(spark, dir).collect()
    assert(rows.length == 5)
    assert(rows.forall(_.getBoolean(1)), "IVF-PQ recall floor violated")
  }

  test("persisted IVF-PQ index: store-backed query path is bit-equal to the direct path") {
    val store = java.nio.file.Files.createTempDirectory("ivfpq-store-spec").toString
    try {
      Similarity.writeIvfPqIndex(spark, dir, store)
      val viaStore = Similarity.ivfPqTopKViaStore(spark, dir, store).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      val direct = Similarity.ivfPqTopK(spark, dir).collect()
        .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSet
      assert(viaStore == direct,
        s"IVF-PQ store round trip changed results: store-only=${(viaStore -- direct).take(5)} " +
          s"direct-only=${(direct -- viaStore).take(5)}")
      // artifact shapes: numCentroids coarse cells, Subspaces x PqCentroids
      // codebook rows, one coded row per non-zero-norm vector
      assert(spark.read.parquet(s"$store/centroids.parquet").count() == Similarity.NumCentroids)
      assert(spark.read.parquet(s"$store/codebooks.parquet").count() ==
        Similarity.PqSubspaces.toLong * Similarity.PqCentroids)
      assert(spark.read.parquet(s"$store/coded.parquet").count() ==
        spark.read.parquet(s"$dir/embeddings.parquet").count())
    } finally {
      new scala.reflect.io.Directory(new java.io.File(store)).deleteRecursively()
    }
  }

  test("IVF-PQ recall can only drop vs IVF-flat on the same cells (PQ is lossy, pruning is shared)") {
    // The composition probes exactly the cells IVF-flat probes (shared
    // cellAffinities order), so every IVF-PQ hit must come from a probed
    // cell; quantization can lose candidates but never add cells. The
    // comparison is structural: ivfpq results ⊆ probed-cell membership is
    // implied by ivf ⊇ check on the same fixture where PQ's shortlist
    // (200) covers every probed candidate — there the two paths must
    // retrieve IDENTICAL neighbor sets up to ADC-ordering of the shortlist.
    val ivf = Similarity.ivfTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    val ivfpq = Similarity.ivfPqTopK(spark, dir).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    // sf0.001 fixture: 500 vectors, ~8/16 cells probed → ~250 candidates,
    // shortlist 200 ≈ full coverage; exact re-rank then equalizes the two
    // paths for the overwhelming majority of slots.
    val agree = (ivf & ivfpq).size.toDouble / ivf.size
    info(s"IVF vs IVF-PQ agreement = $agree")
    assert(agree >= 0.8,
      s"IVF-PQ diverged from IVF-flat beyond shortlist truncation: $agree")
  }

  test("r10: local quantizer trainers are BIT-identical to the distributed cross-check") {
    import org.apache.spark.sql.functions.{col, expr}
    graft.functions.GraftFunctions.register(spark)
    val e = spark.read.parquet(s"$dir/embeddings.parquet")
      .select(col("vec_id"), col("embedding"),
        graft.functions.Portable.l2NormNative("embedding").as("norm"))

    // IVF coarse quantizer: the dispatch (local — the fixture is far under
    // MaxTrainCollect) vs the distributed Lloyd, exact Double equality
    val local = Similarity.trainIvfCentroids(e, refineIters = 2, numCentroids = 16)
    val dist = Similarity.trainIvfCentroidsDistributed(e, refineIters = 2, numCentroids = 16)
    assert(local.map { case (c, v) => (c, v.toList) }.toList ==
      dist.map { case (c, v) => (c, v.toList) }.toList,
      "IVF centroids: local Lloyd must replicate the distributed arithmetic bit-for-bit")

    // PQ codebooks: same contract through the trainCodebooks dispatch
    val normed = e.filter(col("norm") > 0)
      .withColumn("nemb", expr("transform(embedding, x -> CAST(x AS DOUBLE) / norm)"))
    def flat(b: Array[Array[Array[Double]]]) = b.map(_.map(_.toList).toList).toList
    val localB = Similarity.trainCodebooks(normed, refineIters = 3, trainFraction = 1.0)
    val distB = Similarity.trainCodebooksDistributed(normed, refineIters = 3)
    assert(flat(localB) == flat(distB),
      "PQ codebooks: local Lloyd must replicate the distributed arithmetic bit-for-bit")
  }
}
