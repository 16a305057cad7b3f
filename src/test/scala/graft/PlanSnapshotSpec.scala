package graft

import java.nio.file.{Files, Paths}

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.execution.exchange.Exchange
import org.apache.spark.sql.execution.FileSourceScanExec
import org.scalatest.funsuite.AnyFunSuite

/** PLAN-SNAPSHOT regression harness (VERDICT r15 #7): bench wall-clock is
  * ±7% noise on identical code, so a plan regression (a lost pushdown, an
  * extra exchange, a broadcast that became a shuffle) can hide inside the
  * noise floor for rounds. This pins the CANONICALIZED physical plan of
  * every headline query — node-kind sequence, exchange count, pushed
  * filters per scan — against a committed snapshot, so any plan change
  * fails CI loudly and is reviewed deliberately rather than discovered by
  * benchmarking archaeology.
  *
  * Snapshots are taken with AQE OFF: the snapshot is the deterministic
  * static plan (AQE's runtime re-plans are data-dependent and belong to
  * the bench, not to CI). The canonical form strips expression IDs and
  * data-dependent literals — only structure is pinned.
  *
  * Regenerate (after an INTENTIONAL plan change):
  *   SPARK_GRAFT_REGEN_PLANS=1 sbt "testOnly graft.PlanSnapshotSpec"
  * then review the diff of bench/PLAN_SNAPSHOTS.txt like any code change.
  */
class PlanSnapshotSpec extends AnyFunSuite {
  private lazy val spark = SparkSpec.spark
  private val dir = SparkSpec.testDataDir
  private val snapshotPath = "bench/PLAN_SNAPSHOTS.txt"

  /** The Bench headline vector (kept in its order) — the queries whose
    * plans the per-round bench actually times.
    */
  private val headline = Vector(
    "q1_agg", "q3_join_agg", "q5_multi_join", "w1_window_topk", "s1_full_scan",
    "q_grouped_topk", "q_scalar_subquery",
    "events_sessionize", "events_hourly_agg", "events_range_join",
    "events_session_window",
    "text_line_dedup", "text_hash_embedding", "pipeline_vectorize",
    "text_fingerprint", "text_quality", "text_term_stats",
    "text_decontaminate", "text_pack_sequences",
    "dedup_minhash", "dedup_simhash", "dedup_exact",
    "dedup_incremental", "dedup_clusters", "dedup_embedding",
    "ann_topk", "ann_lsh", "multimodal_meta",
    // the most expensive algorithmic rows (bench r15/r16 top-10): a plan
    // regression here — a lost prefix filter, a blocked join collapsing
    // to nested-loop, a broadcast that became a shuffle — costs the most
    // and hides longest inside bench noise
    "graph_link_predict", "graph_pagerank", "graph_lpa",
    "text_containment", "ann_margin_mining_ivf", "dedup_ngram",
    "dedup_semdedup", "text_lm_xent", "text_substring_dup",
    "pipeline_ppl_buckets", "text_winnowing", "events_gapfill")

  private def canonical(plan: SparkPlan): String = {
    val nodes = plan.collect { case n => n.nodeName }
    val exchanges = plan.collect { case e: Exchange => e }.size
    val pushed = plan.collect {
      case s: FileSourceScanExec =>
        s.metadata.getOrElse("PushedFilters", "[]")
      case b: BatchScanExec => b.scan.description().takeWhile(_ != '\n')
    }
    s"exchanges=$exchanges nodes=${nodes.mkString(">")} pushed=${pushed.mkString(";")}"
  }

  private def currentSnapshots(): Vector[(String, String)] = {
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try headline.map { name =>
      val df = SparkEntry.queries(name)(spark, dir)
      name -> canonical(df.queryExecution.executedPlan)
    } finally spark.conf.set("spark.sql.adaptive.enabled", aqe)
  }

  test("headline physical plans match the committed snapshot") {
    val current = currentSnapshots()
    val regen = sys.env.get("SPARK_GRAFT_REGEN_PLANS").contains("1")
    val p = Paths.get(snapshotPath)
    // A missing snapshot is a lost baseline, not a license to mint one:
    // silently recreating it would turn the plan-regression guard into a
    // self-approving no-op exactly when the baseline disappears (deleted
    // file, wrong cwd, sparse checkout). Only regen deliberately.
    if (!regen && !Files.exists(p)) {
      fail(s"plan snapshot $snapshotPath is missing — the committed baseline is gone. " +
        "Restore it from git, or regenerate DELIBERATELY with " +
        "SPARK_GRAFT_REGEN_PLANS=1 and review the new file like a code change.")
    }
    if (regen) {
      Files.writeString(p, current.map { case (n, c) => s"$n|$c" }.mkString("", "\n", "\n"))
      info(s"snapshot regenerated at $snapshotPath — commit and review it")
    } else {
      val committed = scala.io.Source.fromFile(snapshotPath).getLines()
        .filter(_.nonEmpty).map { l =>
          val i = l.indexOf('|'); l.substring(0, i) -> l.substring(i + 1)
        }.toMap
      val diffs = current.flatMap { case (name, c) =>
        committed.get(name) match {
          case Some(`c`) => None
          case Some(old) => Some(s"$name:\n  committed: $old\n  current:   $c")
          case None => Some(s"$name: not in committed snapshot (new query? regen)")
        }
      }
      assert(diffs.isEmpty,
        s"physical plan changed for ${diffs.size} headline quer${if (diffs.size == 1) "y" else "ies"} — " +
          s"if intentional, SPARK_GRAFT_REGEN_PLANS=1 and review the snapshot diff:\n" +
          diffs.mkString("\n"))
    }
  }
}
