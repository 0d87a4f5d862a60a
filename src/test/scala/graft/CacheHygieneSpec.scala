package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** Session cache hygiene: query builders must not leak pinned cache
  * entries. A long-lived service session invoking query builders
  * repeatedly would otherwise accumulate cached blocks forever (the
  * round-7 bench logged "Asked to cache already cached data" x4) —
  * intermediate reuse inside a builder rides `localCheckpoint(true)`
  * (blocks release with the plan via the ContextCleaner) instead of
  * `.persist()` (pinned in the CacheManager until someone unpersists).
  *
  * KNOWN TRADE: localCheckpoint truncates lineage, so on a
  * multi-executor cluster losing an executor holding checkpoint blocks
  * fails the query instead of recomputing the partition. The
  * production alternatives are persist + unpersist-in-finally (keeps
  * lineage, needs explicit release plumbing through every consumer) or
  * reliable checkpointing to the cluster FS. For this library's query
  * builders — self-contained, re-runnable, bounded intermediates —
  * fail-and-rerun is the right side of that trade; a long-running
  * service embedding these builders should swap in reliable
  * checkpoints at the same call sites.
  */
class CacheHygieneSpec extends AnyFunSuite {

  lazy val spark: SparkSession = graft.sources.GraftSession.local()
  private val dir = "/root/testdata/sf0.001"

  // every query whose builder materializes a reused intermediate
  private val reusers = Seq(
    "dedup_minhash", "dedup_clusters", "dedup_simhash", "dedup_ngram",
    "dedup_incremental", "dedup_semantic", "dedup_embedding",
    "sim_ann_ivf", "sim_ann_recall", "pipe_decontam_bloom", "pipe_curate",
    "ivf_cell_stats", "sim_knn_graph_recall", "pipe_topic_mix",
    "mm_near_dup", "sim_ann_opq_recall", "rel_retention_incremental",
    "sim_ann_pq_upsert", "rel_funnel_replay", "rel_funnel_incremental",
    "text_lm_surprisal", "pipe_quality_nb", "text_lm_incremental",
    "rel_fuzzy_join", "rel_anomaly_days", "ft_counts_incremental",
    "sim_ann_opq_idx", "mm_near_dup_incremental", "rel_fuzzy_join_fallback",
    "ft_segment_stats_invariant", "ft_heavy_hitters_invariant",
    "sim_ann_opq_ivfpq_idx", "pipe_quality_nb_incremental",
    "rel_fuzzy_join_scaled", "mm_band_stats", "rel_fuzzy_join_banded",
    "rel_fuzzy_join_queue", "text_bm25_incremental",
    "rel_funnel_bloom_stats", "text_bpe_train", "text_bpe_apply",
    "dedup_clusters_incremental")

  test("Tables.table plan memo cannot serve a stale listing after a rewrite") {
    import spark.implicits._
    val scratch = graft.sources.TempDirs.scratch("graft_memo_")
    Seq((1L, "a")).toDF("k", "txt").write.parquet(s"$scratch/t.parquet")
    assert(graft.sources.Tables.table(spark, scratch, "t").count() == 1)
    Thread.sleep(1100) // File.lastModified is ms-granular; step past it
    Seq((1L, "a"), (2L, "b")).toDF("k", "txt")
      .write.mode("overwrite").parquet(s"$scratch/t.parquet")
    assert(graft.sources.Tables.table(spark, scratch, "t").count() == 2,
      "memo served a stale scan plan after the path was rewritten")
  }

  test("cacheManager gains no entries after each reusing query builder runs") {
    // SharedState (and its CacheManager) is per-SparkContext, shared with
    // every other suite's session in this test JVM — start from a clean
    // slate so a sibling suite's persisted frame can't fail us
    // order-dependently, and assert no NEW entries per builder.
    spark.catalog.clearCache()
    reusers.foreach { n =>
      SparkEntry.queries(n)(spark, dir).collect()
      assert(spark.sharedState.cacheManager.isEmpty,
        s"$n left entries in the session cache manager")
    }
  }
}
