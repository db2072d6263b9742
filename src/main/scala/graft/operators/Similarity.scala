package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

/** Similarity search over an embedding column (Array[Float]).
  *
  * Two paths:
  *  - cosineTopK: exact brute force — queries x corpus cross join with
  *    the codegen'd DotProduct kernel. The correctness baseline; cost
  *    O(|Q| x |corpus| x dim), fine when |Q| is small or corpus is
  *    broadcastable.
  *  - lshCosineTopK: random-hyperplane LSH — bucket both sides by
  *    sign-bit keys, rerank inside buckets only. The 100 TB path: the
  *    cross join becomes an equi-join on bucket keys; recall is tuned
  *    with (planes, tables) and verified against brute force in the
  *    test suite.
  */
object Similarity {

  private def normed(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Text.dot(col("v"), col("v"))))

  /** Exact top-k cosine neighbors for each query vector.
    * Output: (query_id, neighbor_id, rnk) with rnk 1..k, deterministic
    * (ties broken by neighbor id).
    */
  def cosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = normed(corpus, idCol, vecCol)
    val q = normed(queries, idCol, vecCol)
      .withColumnRenamed("vid", "qid")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    val sims = q.crossJoin(c)
      .filter(col("qid") =!= col("vid"))
      .withColumn("sim", Text.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    sims
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"), col("rnk"))
  }

  /** Exact FILTERED vector search: top-k cosine neighbors per query
    * among only the vectors sharing the query's `labelCol` value — the
    * filtered-ANN pattern (metadata predicate + similarity search).
    * The filter becomes the JOIN KEY: a label-blocked equi-join
    * replaces cosineTopK's documented cross join, so candidate work is
    * per-label density, not all-pairs; and the per-query top-k is the
    * GroupTopK bounded-buffer aggregate (map-side pruning), never a
    * whole-group window sort. Ordering contract matches cosineTopK
    * (sim desc, neighbor id asc).
    */
  def filteredCosineTopK(
      df: DataFrame, idCol: String, vecCol: String, labelCol: String,
      queryPred: Column, k: Int): DataFrame = {
    val n = df
      .select(col(idCol).as("vid"), col(labelCol).as("lbl"),
        col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Text.dot(col("v"), col("v"))))
    val q = df.filter(queryPred)
      .select(col(idCol).as("qid"), col(labelCol).as("lbl"),
        col(vecCol).cast("array<double>").as("qv"))
      .withColumn("qnrm", sqrt(Text.dot(col("qv"), col("qv"))))
    q.join(n, "lbl")
      .filter(col("qid") =!= col("vid"))
      .withColumn("sim", Text.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .groupBy("qid")
      .agg(Text.groupTopK(col("sim"), col("vid"), k).as("t"))
      .select(col("qid"), posexplode(col("t")).as(Seq("pos", "e")))
      .select(col("qid").as("query_id"), col("e.id").as("neighbor_id"),
        (col("pos") + 1).cast(LongType).as("rnk"))
  }

  /** Deterministic pseudo-random hyperplanes: planes x dim matrix with
    * values in [-0.5, 0.5), derived from a splitmix64-style bit mixer
    * of the flat index so tests reproduce them exactly.
    *
    * NOT a raw LCG: an earlier version fed sequential indices through
    * one LCG step, whose outputs lie on a coarse lattice — at sf1 one
    * query vector sat so that its true sim≈0.45 neighbors (per-table
    * agreement 0.27, miss 4.5e-4 over 24 tables under a random model)
    * were missed almost entirely, failing the recall floor. The mixer's
    * avalanche breaks the lattice and restores the random-hyperplane
    * model the banding math assumes.
    */
  def hyperplanes(planes: Int, dim: Int): Array[Array[Double]] =
    Array.tabulate(planes, dim) { (p, d) =>
      var x = (p.toLong * dim + d + 1) * 0x9E3779B97F4A7C15L
      x ^= (x >>> 30); x *= 0xBF58476D1CE4E5B9L
      x ^= (x >>> 27); x *= 0x94D049BB133111EBL
      x ^= (x >>> 31)
      ((x >>> 11).toDouble / (1L << 53).toDouble) - 0.5
    }

  /** Approximate top-k via random-hyperplane LSH with multiple tables.
    * Each table hashes vectors to a sign-bit bucket key; candidates are
    * vectors sharing a bucket in ANY table; rerank is exact cosine.
    */
  def lshCosineTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planesPerTable: Int = 8, tables: Int = 8, dim: Int = 64): DataFrame = {

    def bucketed(df: DataFrame, vec: String, id: String): DataFrame = {
      val withBuckets = (0 until tables).foldLeft(df) { (d, t) =>
        val planes = hyperplanes((t + 1) * planesPerTable, dim)
          .drop(t * planesPerTable)
        val key = planes.zipWithIndex.map { case (p, i) =>
          when(Text.dot(col(vec), typedLit(p.toSeq)) >= 0,
            lit(1L << i)).otherwise(lit(0L))
        }.reduce(_ + _)
        d.withColumn(s"__b$t", key)
      }
      withBuckets.withColumn("table",
        explode(sequence(lit(0), lit(tables - 1))))
      .withColumn("bucket",
        element_at(array((0 until tables).map(t => col(s"__b$t")): _*),
          col("table") + 1))
      .select(col(id), col(vec), col("table"), col("bucket"))
    }

    val c = normed(corpus, idCol, vecCol)
    val q = normed(queries, idCol, vecCol)
    val cb = bucketed(c, "v", "vid")
    val qb = bucketed(
      q.withColumnRenamed("vid", "qid").withColumnRenamed("v", "qv")
        .withColumnRenamed("nrm", "qnrm"), "qv", "qid")

    val cand = qb.join(cb, Seq("table", "bucket"))
      .filter(col("qid") =!= col("vid"))
      .select("qid", "vid").distinct()
      .join(c, "vid")
      .join(q.withColumnRenamed("vid", "qid").withColumnRenamed("v", "qv")
        .withColumnRenamed("nrm", "qnrm"), "qid")
      .withColumn("sim", Text.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    cand.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"), col("rnk"))
  }

  /** Exact top-k by raw INNER PRODUCT (MIPS — recommendation scoring:
    * user·item, no normalization). Output shape and tie discipline as
    * [[cosineTopK]]. The documented O(n·q) baseline; [[mipsLshTopK]]
    * is the scale path.
    */
  def mipsTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int): DataFrame = {
    val c = corpus.select(col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
    val q = queries.select(col(idCol).as("qid"),
      col(vecCol).cast("array<double>").as("qv"))
    val sims = q.crossJoin(c)
      .filter(col("qid") =!= col("vid"))
      .withColumn("ip", Text.dot(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("ip").desc, col("vid"))
    sims.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"),
        col("rnk"))
  }

  /** Approximate MIPS via the norm-augmentation reduction
    * (Bachrach et al. / Shrivastava-Li): corpus vectors become
    * [v, √(M²−|v|²)] with M = max corpus norm, queries [q, 0] — every
    * augmented corpus vector has norm exactly M, so cosine in the
    * augmented space is q·v/(|q|·M), MONOTONE in the inner product,
    * and the existing random-hyperplane LSH machinery searches it
    * unchanged. The augmentation is one broadcast scalar (the max
    * norm) + a row-local array append; candidates and rerank ride
    * [[lshCosineTopK]] in dim+1.
    */
  def mipsLshTopK(
      corpus: DataFrame, queries: DataFrame,
      idCol: String, vecCol: String, k: Int,
      planesPerTable: Int = 8, tables: Int = 8, dim: Int = 64): DataFrame = {
    val c = corpus.select(col(idCol),
      col(vecCol).cast("array<double>").as(vecCol))
    val m = c.agg(max(sqrt(Text.dot(col(vecCol), col(vecCol)))).as("__m"))
    // greatest(0, ·) guards the max-norm vector itself, where rounding
    // can push M²−|v|² a few ulps negative
    val caug = c.crossJoin(broadcast(m))
      .withColumn(vecCol, concat(col(vecCol),
        array(sqrt(greatest(lit(0.0),
          col("__m") * col("__m") - Text.dot(col(vecCol), col(vecCol)))))))
      .drop("__m")
    val qaug = queries.select(col(idCol),
        col(vecCol).cast("array<double>").as(vecCol))
      .withColumn(vecCol, concat(col(vecCol), array(lit(0.0))))
    lshCosineTopK(caug, qaug, idCol, vecCol, k, planesPerTable, tables,
      dim + 1)
  }

  /** Per-query overlap between an ANN result and the exact top-k:
    * (query_id, hits). Groups on the exact side so a query the ANN path
    * missed entirely still appears with hits = 0. Both ANN paths are
    * fully deterministic (LCG hyperplanes / seeded k-means), so
    * `hits >= floor` is a reproducible integer a SQL oracle can gate —
    * this is how qs05/qs06 turn ANN quality into a hash-checkable row
    * instead of a spec-only assertion.
    */
  def recallHits(exact: DataFrame, ann: DataFrame): DataFrame =
    exact.select(col("query_id"), col("neighbor_id"))
      .join(ann.select(col("query_id").as("qid"), col("neighbor_id").as("nid")),
        col("query_id") === col("qid") && col("neighbor_id") === col("nid"),
        "left")
      .groupBy("query_id").agg(count(col("nid")).as("hits"))

  /** Per-label embedding centroids in exploded (label, pos, m) form —
    * the element-wise exact mean that class-centroid classifiers and
    * IVF-style training build on. One posexplode (narrow) plus one
    * partial-agg shuffle on (label, pos); sums go through
    * DECIMAL(25,6) so the mean is bit-identical at any partitioning.
    * Reassemble with sort_array(collect_list(struct(pos, m))) when an
    * array-shaped centroid is needed.
    */
  def centroids(df: DataFrame, labelCol: String, vecCol: String): DataFrame =
    df.select(col(labelCol),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
      .groupBy(col(labelCol), col("pos").cast(LongType).as("pos"))
      .agg((sum(col("x").cast(graft.functions.Exact.Dec)).cast("double") /
        count(lit(1))).as("m"))

  /** Scalar (int8-style) embedding quantization with a per-vector
    * reconstruction-error verdict — the memory-compression move a
    * 100 TB vector corpus makes before ANN (4x smaller than float32):
    * each dimension maps to 256 levels over its corpus [min, max]
    * range, so the reconstruction error is bounded by half a level
    * step. The gate emits only the order-independent boolean
    * `within_bound` per vector (the qs05/qs06/q48 verdict pattern), so
    * the oracle can state every row must be TRUE — a broken quantizer,
    * and only a broken quantizer, flips a row and breaks the hash.
    *
    * Shape: one narrow posexplode, one partial-agg group-by for the
    * per-dimension ranges (output = dim count — broadcast-sized by
    * construction), one broadcast join back, one group-by per vector.
    * No driver-side state; scales linearly in corpus values.
    */
  def scalarQuantizationBound(df: DataFrame, idCol: String,
                              vecCol: String): DataFrame = {
    val dims = df.select(col(idCol).as("vid"),
      posexplode(col(vecCol).cast("array<double>")).as(Seq("pos", "x")))
    val ranges = dims.groupBy("pos")
      .agg(min(col("x")).as("lo"), max(col("x")).as("hi"))
    val step = (col("hi") - col("lo")) / 255.0
    val q = round((col("x") - col("lo")) / step)
    val xhat = when(col("hi") === col("lo"), col("lo"))
      .otherwise(col("lo") + q * step)
    // 0.500001: half-step bound with slack for the float arithmetic's
    // final ulps, so the verdict is deterministic, never tie-flaky
    dims.join(broadcast(ranges), "pos")
      .withColumn("__ok",
        abs(xhat - col("x")) <= (col("hi") - col("lo")) / 255.0 * 0.500001 ||
          col("hi") === col("lo"))
      .groupBy(col("vid").as(idCol))
      .agg(expr("bool_and(__ok)").as("within_bound"))
  }

  /** Johnson–Lindenstrauss random projection: 64-dim embeddings down to
    * `Text.JlDims` = 8 dims via fixed Rademacher (±1) sign vectors —
    * the standard cheap dimensionality reduction ahead of ANN (distances
    * are preserved in expectation: E‖y‖² = d_out·‖x‖² for unit-variance
    * sign entries, spec-verified on the corpus). A pure narrow map —
    * one codegen'd dot product per output dim per row, no shuffle, no
    * training, no model to version — which is why it's the first thing
    * to reach for at 100 TB before IVF/PQ's trained structures.
    * Deterministic: the sign tables are mixer-derived literals shared
    * verbatim with the oracle SQL ([[Text.jlSignsSql]]).
    */
  def jlProject(df: DataFrame, idCol: String, vecCol: String): DataFrame = {
    val v = col(vecCol).cast("array<double>")
    df.select(col(idCol) +: (0 until Text.JlDims).map(j =>
      Text.dot(v, typedLit(Text.JlSigns(j))).as(s"y$j")): _*)
  }

  /** Per-dimension embedding health profile — the monitoring step that
    * runs BEFORE any ANN build: a collapsed dimension (min == max), a
    * dead dimension (all zeros), or a runaway scale (|max| orders above
    * the rest) silently wrecks recall, and at 100 TB you find out from
    * this report, not from eyeballing vectors.
    *
    * Output per dimension: (dim, n, mean, vmin, vmax, n_zero). The mean
    * rides the decimal exact-sum (aggregation order can't perturb it);
    * min/max/counts are exact by nature.
    *
    * Scale: one posexplode (rows × dim) into a map-side-combining
    * group-by on the dimension index — linear, no shuffle wider than
    * `dim` groups.
    */
  def embeddingProfile(df: DataFrame, idCol: String, vecCol: String)
      : DataFrame =
    df.select(posexplode(col(vecCol).cast("array<double>"))
        .as(Seq("dim", "x")))
      .groupBy("dim")
      .agg(
        count(lit(1)).as("n"),
        (graft.functions.Exact.dsum(col("x")) / count(lit(1))).as("mean"),
        min(col("x")).as("vmin"),
        max(col("x")).as("vmax"),
        sum(when(col("x") === 0.0, 1L).otherwise(0L)).as("n_zero"))
      .select(col("dim").cast(LongType).as("dim"), col("n"), col("mean"),
        col("vmin"), col("vmax"), col("n_zero"))

  /** Maximal-marginal-relevance re-ranking — the diversification step a
    * retrieval-augmented or training-data pipeline runs over a
    * candidate list: greedily pick `k` documents where each pick
    * maximizes `λ·rel − (1−λ)·max_sim_to_already_picked`, so the
    * result is relevant AND non-redundant (a plain top-k returns five
    * near-copies; MMR returns one copy plus four distinct angles).
    *
    * `queries` is an EXPLICIT, BOUNDED frame of (idCol, vecCol) — the
    * fixed eval set the caller owns (the r13 shape derived queries as
    * `id % mod` OF THE CORPUS, which made |queries| ∝ n and the exact
    * candidate arm O(n²/mod); the bounded-query contract of
    * [[graft.operators.Retrieval.bm25PerQueryTopK]] applies here
    * verbatim). Candidates are the queries' exact cosine top-`kCand`;
    * rel = cosine to the query; pairwise candidate similarity is
    * cosine. Output per pick: (query_id, doc_id, rnk 1..k, rel, pen,
    * score) — the first pick carries pen = 0.0.
    *
    * Exactness: every number is a dot/√/×/−/÷ chain of exact IEEE ops
    * shared with cosineTopK; `max` over doubles and the (score desc,
    * id asc) argmax are order-free. λ must be exactly representable
    * (default 0.5) so both engines scale identically.
    *
    * Scale: candidates are rank-truncated, so the pair-similarity join
    * moves |Q| × kCand² bounded rows and each greedy step joins
    * query-bounded state; the corpus appears only in the candidate
    * arm, which at scale swaps for the ANN ladder unchanged. Steps are
    * `k` tiny jobs on checkpointed picks — plan depth stays O(1).
    */
  def mmrRerank(emb: DataFrame, idCol: String, vecCol: String,
                queries: DataFrame, kCand: Int = 20, k: Int = 5,
                lambda: Double = 0.5): DataFrame = {
    val c = normed(emb, idCol, vecCol)
    val q = normed(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val wRel = Window.partitionBy("qid").orderBy(col("rel").desc, col("did"))
    val cand = q.crossJoin(c)
      .filter(col("vid") =!= col("qid"))
      .withColumn("rel",
        Text.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
      .select(col("qid"), col("vid").as("did"), col("rel"), col("v"),
        col("nrm"))
      .withColumn("rs", row_number().over(wRel))
      .filter(col("rs") <= kCand)
      .localCheckpoint()
    val a = cand.select(col("qid"), col("did").as("da"), col("v").as("va"),
      col("nrm").as("na"))
    val b = cand.select(col("qid"), col("did").as("db"), col("v").as("vb"),
      col("nrm").as("nb"))
    val cs = a.join(b, Seq("qid")).filter(col("da") =!= col("db"))
      .withColumn("sim",
        Text.dot(col("va"), col("vb")) / (col("na") * col("nb")))
      .select("qid", "da", "db", "sim")
      .localCheckpoint()
    val candSlim = cand.select("qid", "did", "rel")

    def score(pen: Column): Column =
      lit(lambda) * col("rel") - lit(1 - lambda) * pen
    def argmax(df: DataFrame, ord: Column): DataFrame =
      df.withColumn("__rn", row_number().over(
          Window.partitionBy("qid").orderBy(ord.desc, col("did"))))
        .filter(col("__rn") === 1).drop("__rn")

    var all = argmax(candSlim, col("rel"))
      .withColumn("pen", lit(0.0))
      .withColumn("score", score(lit(0.0)))
      .withColumn("rnk", lit(1L))
      .localCheckpoint()
    for (t <- 2 to k) {
      val selKeys = all.select(col("qid"), col("did"))
      val rem = candSlim.join(selKeys, Seq("qid", "did"), "left_anti")
      val pen = cs
        .join(selKeys.withColumnRenamed("did", "db"), Seq("qid", "db"))
        .groupBy(col("qid"), col("da"))
        .agg(max(col("sim")).as("pen"))
        .withColumnRenamed("da", "did")
      val scored = rem.join(pen, Seq("qid", "did"))
        .withColumn("score", score(col("pen")))
      all = all.unionByName(
          argmax(scored, col("score")).withColumn("rnk", lit(t.toLong)))
        .localCheckpoint()
    }
    all.select(col("qid").as("query_id"), col("did").as("doc_id"),
      col("rnk"), col("rel"), col("pen"), col("score"))
  }
}
