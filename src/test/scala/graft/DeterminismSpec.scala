package graft

/** Partition-count independence, CI-locked: every result the gate
  * surface produces must be a pure function of the DATA, not of the
  * parallelism it ran under — the property that makes results stable
  * across cluster resizes, AQE re-plans, and speculative re-execution
  * at 100 TB. The decimal-exact aggregate pattern (graft.functions
  * .Exact), hash-based keep decisions, and partial-agg-friendly
  * formulations are what buy it; this spec samples one query per risk
  * family and re-runs it under a different shuffle-partition count.
  */
class DeterminismSpec extends SparkSpec {

  // one per family: grouped decimal agg, windowed running decimal sum,
  // banded minhash + exact verify, exploded decimal centroid mean,
  // two-phase prefix-sum packing, weighted hash sampling, histogram,
  // unrolled iterative graph fixpoint, sharded global rank
  // ... plus: gaps-and-islands span merge, deletion-key fuzzy pairs,
  // mergeable Count-Min counters, canonical bitmap blobs (sorted-word
  // serialization makes the OR-merge rollup partition-independent),
  // integer-exact windowed anomaly flags
  // ... plus this session's risk families: the bounded-buffer top-k
  // (merge order varies with partitioning), the grouping-set bitmap
  // composition, weighted-median cross-multiplication, and the
  // filtered search's label-blocked GroupTopK
  private val sampled = Seq(
    "q05_groupby_agg", "q39_window_frames", "qd05_minhash_lsh",
    "qs07_label_centroids", "qc02_pack_budget", "qc05_weighted_sample",
    "q59_histogram", "qt15_textrank", "qc09_corpus_shuffle",
    "qd14_span_strip", "q68_fuzzy_pairs", "qa04_cms_bound",
    "qa05_bitmap_distinct_rollup", "q69_rolling_anomaly",
    "qa09_group_topk", "qa10_weighted_median",
    "qa11_bitmap_grouping_sets", "qs14_filtered_topk",
    // ... plus the graph family: integer fixed-point PageRank (whole
    // gate, not just the operator spec), monotone label propagation,
    // and the degree-ordered triangle join
    "qg01_pagerank", "qg02_triangles", "qg03_label_prop",
    // ... plus this round's risk families: the k-step greedy argmax
    // walk (MMR — a max over doubles per step, order-free only because
    // every candidate score is bit-identical), the shingle->min(id)
    // first-occurrence credit, and the chunk-parallel per-source rank
    // behind the weighted interleave
    "qs21_mmr_rerank", "qt22_novelty", "qc15_mixture_interleave",
    // ... plus this round's: IVF-armed RRF fusion (rank-only fusion of
    // two deterministic arms) and the two-level manifest range read
    // (driver-side partition/file pruning must be layout-independent)
    "qs23_hybrid_ann_recall", "qj24_two_level_manifest_read")

  private def rows(name: String): Seq[String] = {
    val q = SparkEntry.allQueries.find(_.name == name).get
    val df = q.build(spark, sfDir)
    df.collect().map(_.toString).sorted.toSeq
  }

  sampled.foreach { name =>
    test(s"$name is identical under a different shuffle-partition count") {
      val conf = spark.conf
      val key = "spark.sql.shuffle.partitions"
      val saved = conf.get(key)
      val base = rows(name)
      try {
        conf.set(key, "7")
        assert(rows(name) == base,
          s"$name changed results when parallelism changed")
      } finally conf.set(key, saved)
    }
  }
}
