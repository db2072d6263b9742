package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Graph analytics over distributed edge lists.
  *
  * Reference grounding: the reference's analytical views rank entities
  * by aggregated measures (rahil/create_views.py, e.g. store bonus
  * ranking); a web-scale training corpus needs the graph-native form of
  * "rank by importance" — PageRank over the domain/page link graph is
  * the canonical quality prior for corpus curation (used by every
  * CommonCrawl-derived dataset). Spark-first shape: each iteration is
  * one key-partitioned equi-join (ranks ⋈ edges on src) plus one
  * partial-aggregated shuffle on dst — no driver-side state, no
  * collect; the node count and dangling mass ride as broadcast 1-row
  * scalars.
  *
  * EXACT INTEGER FIXED-POINT, not floating point: ranks are scaled
  * BIGINTs and every step is integer multiply / truncating divide, so
  * the result is bit-identical regardless of partitioning, shuffle
  * order, retries, or engine (the q73 slope-pair / Exact-decimal
  * discipline applied to an iterative algorithm). Floating-point
  * PageRank sums in shuffle order and is unreproducible at scale;
  * deterministic output is what makes incremental corpus re-releases
  * diffable.
  *
  * Semantics per iteration (damping d = dNum/dDen, scale S):
  *   contrib(u→v) = (r(u) · w(u,v) · dNum) div (outw(u) · dDen)
  *   dang         = Σ r(u) over nodes with no out-edge
  *   r'(v) = (S·(dDen−dNum)) div (N·dDen)           -- teleport
  *         + (dang·dNum) div (N·dDen)               -- dangling share
  *         + Σ_{u→v} contrib(u→v)
  * Truncation loses ≤1 unit per term (≤ 1e-12 of total mass per edge
  * at the default scale) — far below any ranking-relevant difference,
  * and identically in every engine.
  */
object Graph {

  /** Weighted PageRank in exact fixed-point arithmetic.
    *
    * @param nodes one row per vertex, column `id: bigint`
    * @param edges columns `src: bigint, dst: bigint, w: bigint` (w>0);
    *              multi-edges should be pre-summed but merely add
    * @param iters fixed iteration count. Each round references the
    *              rank frame THREE times (edge join, dangling anti
    *              join, final assembly), so the purely declarative
    *              logical plan grows ~3^iters — fine at the shallow
    *              depths this oracle surface runs (analysis stalls
    *              were measured from ~10), hence the hard cap of 8.
    *              Deeper runs go through [[pagerankConvergedFp]],
    *              which materializes every round and keeps plan depth
    *              constant.
    * @return columns `id: bigint, r: bigint` with Σr ≈ scale
    */
  def pagerankFp(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      dNum: Long = 85,
      dDen: Long = 100): DataFrame = {
    require(iters >= 0 && iters <= 8,
      s"iters=$iters: the declarative plan grows ~3^iters — use " +
        "pagerankConvergedFp (materialized rounds) beyond 8")
    require(dNum > 0 && dNum < dDen, s"damping $dNum/$dDen not in (0,1)")

    val e = edges.select(col("src"), col("dst"), col("w"))
    val n1 = nodes.agg(count(lit(1)).cast("long").as("n"))
    val outw = outWeights(e)
    val dangIds = danglingIds(nodes, outw)

    // r0: uniform S div N
    var r: DataFrame = nodes.crossJoin(broadcast(n1))
      .select(col("id"), expr(s"${scale}L div n").as("r"))

    for (_ <- 0 until iters)
      r = prStep(nodes, e, outw, dangIds, n1, r, scale, dNum, dDen)
    r
  }

  /** Edge-contribution expression, computed through DECIMAL(38,0)
    * intermediates: rank (≤ scale = 1e12) times a pre-summed multi-edge
    * weight times dNum wraps a BIGINT once max(w) passes ~1e5 — decimal
    * holds the ≤1e33 product exactly and `div` (IntegralDivide) brings
    * the quotient back to BIGINT, which always fits because every
    * contribution is ≤ scale. Same truncation, same result on
    * non-overflowing inputs; on formerly-wrapping inputs, now correct.
    */
  private def contribExpr(dNum: Long, dDen: Long): Column =
    expr(s"(CAST(r AS DECIMAL(38,0)) * w * ${dNum}L) " +
      s"div (CAST(ow AS DECIMAL(38,0)) * ${dDen}L)")

  /** Out-weight totals through a decimal sum — pre-summed multi-edge
    * weights can exceed BIGINT range in aggregate even when each edge
    * fits (the same wrap [[contribExpr]] guards against).
    */
  private def outWeights(e: DataFrame): DataFrame =
    e.groupBy("src").agg(sum(col("w").cast("decimal(38,0)")).as("ow"))

  /** The static dangling-node id set (no out-edge) — a pure function
    * of the edge list, so every PageRank driver computes it ONCE and
    * each round reduces the current ranks against it with a broadcast
    * probe instead of re-building a per-round anti-join hash table
    * over the full out-weight table (whose upstream the declarative
    * driver would re-derive every round).
    */
  private def danglingIds(nodes: DataFrame, outw: DataFrame): DataFrame =
    nodes.join(outw, nodes("id") === outw("src"), "left_anti")
      .select(col("id"))

  /** One PageRank round (shared by the fixed-depth and convergence
    * drivers so both compute the IDENTICAL integer recurrence).
    */
  private def prStep(nodes: DataFrame, e: DataFrame, outw: DataFrame,
                     dangIds: DataFrame, n1: DataFrame, rr: DataFrame,
                     scale: Long, dNum: Long, dDen: Long): DataFrame = {
    // mass flowing along edges: join on src (key-partitioned), then
    // one partial-agg shuffle keyed by dst
    val contrib = e
      .join(rr.withColumnRenamed("id", "src"), "src")
      .join(outw, "src")
      .select(col("dst").as("id"), contribExpr(dNum, dDen).as("c"))
      .groupBy("id").agg(sum(col("c")).as("s"))
    // dangling mass: current ranks of the precomputed dangling id set
    // (1-row result; identical value to the former per-round anti-join)
    val dang = rr.join(broadcast(dangIds), Seq("id"))
      .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
    nodes.crossJoin(broadcast(n1)).crossJoin(broadcast(dang))
      .join(contrib, Seq("id"), "left")
      .select(col("id"),
        (expr(s"(${scale}L * ${dDen - dNum}L) div (n * ${dDen}L)")
          + expr(s"(dang * ${dNum}L) div (n * ${dDen}L)")
          + coalesce(col("s"), lit(0L))).as("r"))
  }

  /** Personalized (topic-sensitive) PageRank: teleport and dangling
    * mass flow ONLY to the seed set, so ranks measure proximity to the
    * seeds along weighted paths — the domain-biased quality prior
    * (e.g. rank pages by closeness to a trusted seed domain list).
    * Same exact-integer discipline as [[pagerankFp]]: r0 = S div |B|
    * on seeds (0 elsewhere); per round non-seeds receive only edge
    * mass. Same plan shape plus one broadcast seed-membership join.
    */
  def personalizedPagerankFp(
      nodes: DataFrame,
      edges: DataFrame,
      seeds: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      dNum: Long = 85,
      dDen: Long = 100): DataFrame = {
    require(iters >= 0 && iters <= 8,
      s"iters=$iters: the declarative plan grows ~3^iters — materialize beyond 8")
    require(dNum > 0 && dNum < dDen, s"damping $dNum/$dDen not in (0,1)")
    // Deliberately NOT materialized (measured): at the shallow gate
    // depth (iters = 3) Catalyst's exchange reuse already dedupes the
    // repeated e/outw/seeded subtrees, and three upfront
    // localCheckpoint jobs cost more than they save — the bench read
    // the checkpointed variant 0.67 s SLOWER (2.26 → 2.93 s min-of-3).
    // The deep/materialized drivers are where leaf materialization
    // pays (pagerankFpMaterialized, measured −2.3 s on qg04).
    val e = edges.select(col("src"), col("dst"), col("w"))
    val b1 = seeds.agg(count(lit(1)).cast("long").as("b"))
    val outw = outWeights(e)
    val seeded = nodes
      .join(broadcast(seeds.select(col("id"), lit(1L).as("is_seed"))), Seq("id"), "left")
      .select(col("id"), coalesce(col("is_seed"), lit(0L)).as("is_seed"))
    var r: DataFrame = seeded.crossJoin(broadcast(b1))
      .select(col("id"),
        when(col("is_seed") === 1L, expr(s"${scale}L div b"))
          .otherwise(lit(0L)).as("r"))
    for (_ <- 0 until iters) {
      val rr = r
      val contrib = e
        .join(rr.withColumnRenamed("id", "src"), "src")
        .join(outw, "src")
        .select(col("dst").as("id"),
          contribExpr(dNum, dDen).as("c"))
        .groupBy("id").agg(sum(col("c")).as("s"))
      val dang = rr.join(outw, rr("id") === outw("src"), "left_anti")
        .agg(coalesce(sum(col("r")), lit(0L)).as("dang"))
      r = seeded.crossJoin(broadcast(b1)).crossJoin(broadcast(dang))
        .join(contrib, Seq("id"), "left")
        .select(col("id"),
          (when(col("is_seed") === 1L,
            expr(s"(${scale}L * ${dDen - dNum}L) div (b * ${dDen}L)")
              + expr(s"(dang * ${dNum}L) div (b * ${dDen}L)"))
            .otherwise(lit(0L))
            + coalesce(col("s"), lit(0L))).as("r"))
    }
    r
  }

  /** Fixed-depth PageRank with MATERIALIZED rounds: the same integer
    * recurrence as [[pagerankFp]], but each round localCheckpoints, so
    * plan depth is constant and any `iters` is fine — this is the
    * fixed-depth form for depths past the declarative ~3^iters wall
    * (gated at 24 rounds against a recursive-CTE oracle by qg04).
    */
  def pagerankFpMaterialized(
      nodes: DataFrame,
      edges: DataFrame,
      iters: Int,
      scale: Long = 1000000000000L,
      dNum: Long = 85,
      dDen: Long = 100): DataFrame = {
    require(iters >= 0, s"iters=$iters")
    require(dNum > 0 && dNum < dDen, s"damping $dNum/$dDen not in (0,1)")
    val e = edges.select(col("src"), col("dst"), col("w")).localCheckpoint()
    val outw = outWeights(e).localCheckpoint()
    // nodes is referenced by EVERY round's assembly (plus n1): without
    // this cut each of the `iters` rounds re-derived the caller's node
    // frame from scratch (for the qg04 gate that was 12 re-scans of the
    // events table, JSON parse and distinct included — measured as the
    // bulk of the gate's cost)
    val nd = nodes.select(col("id")).localCheckpoint()
    val dangIds = danglingIds(nd, outw).localCheckpoint()
    val n1 = nd.agg(count(lit(1)).cast("long").as("n"))
    var r = nd.crossJoin(broadcast(n1))
      .select(col("id"), expr(s"${scale}L div n").as("r")).localCheckpoint()
    for (_ <- 0 until iters)
      r = prStep(nd, e, outw, dangIds, n1, r, scale, dNum, dDen)
        .localCheckpoint()
    r
  }

  /** PageRank iterated TO CONVERGENCE — the production driver the
    * fixed-depth [[pagerankFp]] (the oracle surface) points at for
    * deep graphs. Each round is materialized (localCheckpoint, or
    * reliable parquet snapshots with O(1) live files under
    * `sparkContext.getCheckpointDir` — the connectedComponents
    * discipline: each rank snapshot supersedes the last, the
    * edges/out-weights snapshot serves every round), so plan depth
    * stays constant however many rounds run. Convergence is exact and
    * engine-independent because ranks are integers: stop when the max
    * per-node change ≤ `tol` rank units (at the default scale, 1000
    * units = 1e-9 of total mass); the only per-round driver value is
    * that one scalar. Deltas shrink geometrically at roughly the
    * damping factor, so expect about log(delta0/tol)/log(dDen/dNum)
    * rounds — around 50 for 1e-9 of mass at d=0.85, which sizes the
    * default cap. A graph that fails to converge within `maxRounds`
    * fails LOUDLY rather than emitting unconverged ranks.
    *
    * Returns (ranks, rounds run).
    */
  def pagerankConvergedFp(
      nodes: DataFrame,
      edges: DataFrame,
      tol: Long = 1000L,
      maxRounds: Int = 128,
      reliable: Boolean = false,
      scale: Long = 1000000000000L,
      dNum: Long = 85,
      dDen: Long = 100): (DataFrame, Int) = {
    require(tol >= 0, s"tol=$tol must be >= 0")
    require(dNum > 0 && dNum < dDen, s"damping $dNum/$dDen not in (0,1)")
    val spark = nodes.sparkSession
    val snapRoot: Option[org.apache.hadoop.fs.Path] =
      if (!reliable) None
      else {
        val base = spark.sparkContext.getCheckpointDir.getOrElse(
          throw new IllegalStateException(
            "reliable=true requires sparkContext.setCheckpointDir"))
        Some(new org.apache.hadoop.fs.Path(
          base, s"graft-pr-${java.util.UUID.randomUUID()}"))
      }
    lazy val snapFs = snapRoot.get
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    var snapIdx = 0
    // returns the materialized frame plus its snapshot path (None in
    // localCheckpoint mode) so the loop can delete a rank snapshot the
    // moment its successor's delta check has consumed it — at most TWO
    // rank snapshots ever live, however many rounds run
    def ckpt(df: DataFrame): (DataFrame, Option[org.apache.hadoop.fs.Path]) =
      snapRoot match {
        case None => (df.localCheckpoint(), None)
        case Some(root) =>
          val p = new org.apache.hadoop.fs.Path(root, s"snap-$snapIdx")
          snapIdx += 1
          df.write.mode("overwrite").parquet(p.toString)
          (spark.read.parquet(p.toString), Some(p))
      }
    val (e, _) = ckpt(edges.select(col("src"), col("dst"), col("w")))
    val (outw, _) = ckpt(outWeights(e))
    // derived once over the MATERIALIZED out-weights; each round's
    // dangling-mass probe re-reads only that snapshot, never the
    // caller's edge lineage (snapshot count stays at three — the
    // reliable-mode contract)
    val dangIds = danglingIds(nodes, outw)
    val n1 = nodes.agg(count(lit(1)).cast("long").as("n"))
    var (r, rPath) = ckpt(nodes.crossJoin(broadcast(n1))
      .select(col("id"), expr(s"${scale}L div n").as("r")))
    var round = 0
    var converged = false
    while (!converged) {
      round += 1
      if (round > maxRounds)
        throw new IllegalStateException(
          s"pagerank did not converge to tol=$tol in $maxRounds rounds — " +
            "raise maxRounds or tol; refusing to emit unconverged ranks")
      // the delta check rides the SAME job that materializes the
      // snapshot: the previous rank joins into the rank step (one more
      // key-partitioned join of an already-materialized frame) and the
      // max per-node change surfaces as an observed metric of the
      // checkpoint action — one job per round instead of a second
      // join+aggregate pass over both snapshots
      val obs = org.apache.spark.sql.Observation(s"graft-pr-delta-$round")
      val stepped = prStep(nodes, e, outw, dangIds, n1, r, scale, dNum, dDen)
        .join(r.select(col("id"), col("r").as("__pr")), Seq("id"))
        .select(col("id"), col("r"), abs(col("r") - col("__pr")).as("__d"))
        .observe(obs, coalesce(max(col("__d")), lit(0L)).as("delta"))
      val (next, nextPath) = ckpt(stepped)
      // metric delivery is async (a query-execution listener fires
      // after the action): poll briefly, then belt-and-braces — a scan
      // of the just-written snapshot (no join, __d is a stored column)
      // recovers the delta if the action never surfaced the metric
      var waited = 0L
      while (obs.future.value.isEmpty && waited < 2000) {
        Thread.sleep(10); waited += 10
      }
      val delta = obs.future.value match {
        case Some(scala.util.Success(row)) if row.length > 0 =>
          row.getAs[Long]("delta")
        case _ =>
          next.agg(coalesce(max(col("__d")), lit(0L))).first().getLong(0)
      }
      rPath.foreach(snapFs.delete(_, true))
      r = next
      rPath = nextPath
      converged = delta <= tol
    }
    (r.select(col("id"), col("r")), round)
  }

  /** Per-vertex triangle and degree counts over an undirected graph.
    *
    * Input edges are directed observations (both directions and
    * self-loops tolerated); they are canonicalized to distinct
    * undirected pairs first. Exact counts — the oracle-matchable
    * baseline for the clustering-coefficient quality signal (kept as
    * the integer pair (n_tri, deg): coefficient = 2·n_tri/(deg·(deg−1)),
    * compared by cross-multiplication, never divided — the q73 slope
    * discipline).
    *
    * SKEW SAFETY is the point of the implementation: the naive wedge
    * join fans out quadratically in the HUB degree (a 10⁶-degree hub in
    * a web graph → 10¹² wedges). Instead every edge is oriented toward
    * the endpoint with the LARGER (degree, id) — the node-iterator++
    * ordering — so wedges form only among each vertex's up-orientation
    * neighbors and per-vertex fan-out is bounded by its count of
    * HIGHER-degree neighbors (≤ O(√|E|) on any graph, regardless of
    * hubs). Each triangle has exactly one minimum-ordered corner, so it
    * is produced exactly once; three shuffle joins total, all
    * equi-keyed, no driver state.
    */
  def triangleCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    // ud feeds the degree count AND both sides of the orientation
    // join; oe feeds all three wedge-join references. Materialized
    // once each, the three-way triangle join reads in-memory edge
    // lists instead of re-deriving the caller's edge lineage per
    // branch (bit-identical; consume before a checkpoint-block sweep).
    val ud = edges.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .distinct()
      .localCheckpoint()
    val deg = ud.select(col("a").as("v"))
      .unionAll(ud.select(col("b").as("v")))
      .groupBy("v").agg(count(lit(1)).as("deg"))
    // orient each edge toward the larger (deg, id); carry both ranks
    val withDeg = ud
      .join(deg.select(col("v").as("a"), col("deg").as("da")), "a")
      .join(deg.select(col("v").as("b"), col("deg").as("db")), "b")
    val oe = withDeg.select(
      when(struct(col("da"), col("a")) < struct(col("db"), col("b")),
        struct(col("a").as("u"), col("da").as("du"),
          col("b").as("v"), col("db").as("dv")))
        .otherwise(
          struct(col("b").as("u"), col("db").as("du"),
            col("a").as("v"), col("da").as("dv"))).as("e"))
      .select(col("e.u").as("u"), col("e.du").as("du"),
        col("e.v").as("v"), col("e.dv").as("dv"))
      .localCheckpoint()
    // wedges at the minimum-ordered corner; close with the oriented
    // third edge (its endpoints are already in orientation order)
    val wedges = oe.as("e1").join(oe.as("e2"),
        col("e1.u") === col("e2.u") &&
          struct(col("e1.dv"), col("e1.v")) < struct(col("e2.dv"), col("e2.v")))
      .select(col("e1.u").as("x"), col("e1.v").as("y"), col("e2.v").as("z"))
    val tri = wedges.join(
      oe.select(col("u").as("y"), col("v").as("z")), Seq("y", "z"))
    val tcnt = tri.select(col("x").as("v"))
      .unionAll(tri.select(col("y").as("v")))
      .unionAll(tri.select(col("z").as("v")))
      .groupBy("v").agg(count(lit(1)).as("n_tri"))
    nodes
      .join(deg.withColumnRenamed("v", "id"), Seq("id"), "left")
      .join(tcnt.withColumnRenamed("v", "id"), Seq("id"), "left")
      .select(col("id"), coalesce(col("deg"), lit(0L)).as("deg"),
        coalesce(col("n_tri"), lit(0L)).as("n_tri"))
  }

  /** Monotone weighted label propagation — community detection over an
    * undirected graph (the clustering complement to [[pagerankFp]]'s
    * ranking and [[triangleCounts]]' cohesion).
    *
    * DETERMINISTIC AND CONVERGENT by construction, unlike textbook
    * LPA: every node starts labeled with its own id; each round it
    * finds the neighbor label with the greatest total incident edge
    * weight (ties toward the smaller label) and adopts it only if it
    * is SMALLER than its current label. Plain synchronous LPA
    * oscillates on symmetric cores (two mutually-heaviest nodes swap
    * labels forever); the monotone rule makes labels non-increasing,
    * so the process converges and the result is reproducible across
    * engines, partitionings, and reruns — randomized/asynchronous LPA
    * is none of those, which makes it unusable for diffable corpus
    * releases. Communities are weight basins seeded at locally-minimal
    * ids: a weak bridge (lighter than a node's intra-community
    * support) never flips it.
    *
    * Input `transitions` are raw directed observations (multiplicity =
    * weight); self-loops are dropped and both directions of a pair sum
    * into one undirected weight. Per round: one v-keyed equi-join, one
    * (u, label) partial-agg shuffle, one u-partitioned window — all
    * key-partitioned, no driver state, same fixed-depth plan
    * discipline as pagerankFp (checkpoint beyond ~16 rounds).
    */
  def labelPropagation(nodes: DataFrame, transitions: DataFrame,
                       iters: Int): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    require(iters >= 0 && iters <= 16,
      s"iters=$iters: fixed-depth declarative loop; checkpoint beyond 16")
    val ud = transitions.filter(col("src") =!= col("dst"))
      .select(least(col("src"), col("dst")).as("a"),
        greatest(col("src"), col("dst")).as("b"))
      .groupBy("a", "b").agg(count(lit(1)).as("w"))
    // every round joins against sym; materialized once so the rounds
    // read an in-memory edge list instead of re-deriving the caller's
    // transition lineage per round (bit-identical results; consume
    // before a checkpoint-block sweep)
    val sym = ud.select(col("a").as("u"), col("b").as("v"), col("w"))
      .unionAll(ud.select(col("b").as("u"), col("a").as("v"), col("w")))
      .localCheckpoint()
    var lab = nodes.select(col("id"), col("id").as("lab")).localCheckpoint()
    for (_ <- 0 until iters) {
      val nb = sym
        .join(lab.select(col("id").as("v"), col("lab").as("nl")), "v")
        .groupBy("u", "nl").agg(sum(col("w")).as("sw"))
      val best = nb.withColumn("rn", row_number().over(
          Window.partitionBy("u").orderBy(col("sw").desc, col("nl"))))
        .filter(col("rn") === 1).select(col("u").as("id"), col("nl"))
      lab = lab.join(best, Seq("id"), "left")
        .select(col("id"),
          least(col("lab"), coalesce(col("nl"), col("lab"))).as("lab"))
    }
    lab
  }
}
