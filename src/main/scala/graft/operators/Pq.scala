package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{Exact, Text}

/** Product quantization (PQ) approximate nearest-neighbor search —
  * the memory-compression path of the ANN suite (brute force qs01,
  * LSH qs05, IVF qs06, PQ here): split each L2-normalized vector into
  * `m` subspaces, learn a `k`-entry codebook per subspace (Lloyd, like
  * IVF's coarse quantizer but per-slice), and store each vector as `m`
  * small codes. A query then scans CODES, not vectors, with the
  * asymmetric distance computation (ADC): per query, one distance
  * table of m*k entries against the codebooks; per corpus vector, the
  * approximate distance is m table lookups summed. With m=16, k=16 a
  * 64-dim float vector (256 B) compresses to 16 codes — at 100 TB the
  * scan reads ~16-32x fewer bytes, which is the entire point: ANN scan
  * cost is memory bandwidth. The ADC top-`shortlist` is exact-reranked
  * on true vectors (the standard two-stage PQ search).
  *
  * On the unit sphere ||q-x||^2 = 2 - 2*cos(q,x), so ADC's L2 ranking
  * over normalized vectors approximates the cosine ranking the exact
  * baseline uses; the rerank repairs quantization error inside the
  * shortlist.
  *
  * Everything is DATA-shaped, never literal-expression-shaped: the
  * codebooks travel as a broadcast DataFrame, assignment is a
  * broadcast join + `min(struct(distance, code))`, and ADC is an
  * equi-join of exploded codes against per-query distance tables
  * followed by an aggregate — no giant literal expression trees to
  * re-codegen each Lloyd iteration (an earlier formulation inlined
  * m*k centroids as literals and spent its wall time in janino), and
  * no cross join anywhere.
  *
  * Determinism (the property the recall gate stands on): codebooks
  * initialize from the first k vectors by id, Lloyd means run through
  * DECIMAL(25,6), assignment ties break to the lowest code id, the
  * per-pair ADC sum is a decimal-exact aggregate (addition-order
  * independent), and both rank windows tie-break on id — the whole
  * path is a pure function of the corpus at any parallelism.
  */
object Pq {

  /** codebooks(mi)(ci) is the `subDim`-wide centroid `ci` of subspace `mi`. */
  case class Model(codebooks: Array[Array[Array[Double]]]) {
    def m: Int = codebooks.length
    def k: Int = codebooks.head.length
  }

  /** Unit-normalized vectors (vid, v) — shared with the semantic-dedup
    * clustering, which reuses `train(m = 1)` as plain Lloyd k-means.
    */
  private[operators] def unit(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v0"))
      .withColumn("nrm", sqrt(Text.dot(col("v0"), col("v0"))))
      .withColumn("v", transform(col("v0"), x => x / col("nrm")))
      .select(col("vid"), col("v"))

  /** (vid, mi, sub, sn2): the mi-th slice of each unit vector plus its
    * squared norm (precomputed once; the assignment join reuses it
    * against every codebook row).
    */
  private[operators] def sliced(u: DataFrame, m: Int, subDim: Int): DataFrame =
    u.select(col("vid"), explode(sequence(lit(0), lit(m - 1))).as("mi"), col("v"))
      .withColumn("sub", slice(col("v"), col("mi") * subDim + 1, lit(subDim)))
      .withColumn("sn2", Text.dot(col("sub"), col("sub")))
      .select("vid", "mi", "sub", "sn2")

  /** The model as a broadcastable DataFrame: (mi, ci, cvec, cn2). */
  private[operators] def centroidDf(spark: SparkSession, books: Array[Array[Array[Double]]]): DataFrame = {
    import spark.implicits._
    books.zipWithIndex.flatMap { case (b, mi) =>
      b.zipWithIndex.map { case (c, ci) => (mi, ci.toLong, c.toSeq) }
    }.toSeq.toDF("mi", "ci", "cvec")
      .withColumn("cn2", Text.dot(col("cvec"), col("cvec")))
  }

  /** Nearest code per (vector, subspace): broadcast join against the
    * codebooks, ||sub - c||^2 = sn2 - 2*dot + cn2 via the codegen'd
    * DotProduct kernel, argmin as `min(struct(d, ci))` (ties to the
    * lowest code). Keeps `sub` riding along for the training means.
    */
  private def assign(slices: DataFrame, cent: DataFrame): DataFrame =
    slices.join(broadcast(cent), "mi")
      .withColumn("d",
        col("sn2") - lit(2.0) * Text.dot(col("sub"), col("cvec")) + col("cn2"))
      .groupBy("vid", "mi")
      .agg(min(struct(col("d"), col("ci"), col("sub"))).as("a"))
      .select(col("vid"), col("mi"), col("a.ci").as("ci"), col("a.sub").as("sub"))

  /** Per-subspace Lloyd with deterministic init (first k vectors' slices
    * by id); all m subspaces train in the same `iters` corpus passes.
    */
  def train(spark: SparkSession, corpus: DataFrame, idCol: String,
            vecCol: String, m: Int = 16, k: Int = 16, iters: Int = 3): Model = {
    val u = unit(corpus, idCol, vecCol)
    // ONE bounded collect seeds everything the old three setup jobs
    // did (dim probe, first-k id scan, slice fetch): the first k unit
    // vectors by id, sliced on the DRIVER — slicing is array copy, no
    // arithmetic, so the seed codebooks are bit-identical to the old
    // in-plan slice fetch. k full vectors is driver-bounded metadata.
    val firstVecs = u.orderBy("vid").limit(k).collect()
      .map(r => (r.getLong(0), r.getSeq[Double](1).toArray))
    // A corpus smaller than k would seed short codebooks and the
    // Lloyd rebuild's Array.tabulate(k) fallback would index past
    // them (AIOOBE) — fail loud with the actual counts instead.
    require(firstVecs.length >= k,
      s"Pq.train: corpus has only ${firstVecs.length} vectors; k=$k " +
        "centroids per subspace need at least k vectors")
    val dim = firstVecs.head._2.length
    require(dim % m == 0, s"dim $dim must split into $m subspaces")
    val subDim = dim / m
    val s = sliced(u, m, subDim).cache()
    var books: Array[Array[Array[Double]]] =
      Array.tabulate(m) { mi =>
        firstVecs.sortBy(_._1).take(k)
          .map(_._2.slice(mi * subDim, (mi + 1) * subDim))
      }
    for (_ <- 1 to iters) {
      // decimal-exact means: identical codebooks at any partitioning
      val means = assign(s, centroidDf(spark, books))
        .select(col("mi"), col("ci"), posexplode(col("sub")).as(Seq("pos", "x")))
        .groupBy("mi", "ci", "pos")
        .agg((sum(col("x").cast(Exact.Dec)).cast("double") /
          count(lit(1))).as("mean"))
        .collect()
        .map(r => (r.getInt(0), r.getLong(1).toInt, r.getInt(2)) -> r.getDouble(3))
        .toMap
      books = Array.tabulate(m) { mi =>
        Array.tabulate(k) { ci =>
          Array.tabulate(subDim) { pos =>
            means.getOrElse((mi, ci, pos), books(mi)(ci)(pos))
          }
        }
      }
    }
    s.unpersist()
    Model(books)
  }

  /** Exploded code table (vid, mi, ci) — the 100 TB artifact: m small
    * integers per vector instead of the vector itself.
    */
  def encode(spark: SparkSession, corpus: DataFrame, model: Model,
             idCol: String, vecCol: String): DataFrame = {
    val subDim = model.codebooks.head.head.length
    assign(sliced(unit(corpus, idCol, vecCol), model.m, subDim),
      centroidDf(spark, model.codebooks))
      .select("vid", "mi", "ci")
  }

  /** Two-stage PQ search: ADC over codes for a top-`shortlist`
    * shortlist, exact cosine rerank for the top `k`. Output matches
    * `Similarity.cosineTopK`: (query_id, neighbor_id, rnk).
    */
  def search(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
             model: Model, idCol: String, vecCol: String, k: Int,
             shortlist: Int = 128): DataFrame = {
    val subDim = model.codebooks.head.head.length
    val cent = centroidDf(spark, model.codebooks)
    val codes = encode(spark, corpus, model, idCol, vecCol)
    val qu = unit(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"))
    // per-(query, subspace, code) distance table rows — |Q| * m * k of
    // them; ADC is then codes ⋈ table on (mi, ci) + a decimal-exact sum
    // per (query, vector): equi-joins and aggregates only
    val qtab = sliced(qu.select(col("qid").as("vid"), col("qv").as("v")),
        model.m, subDim)
      .join(broadcast(cent), "mi")
      .withColumn("d",
        col("sn2") - lit(2.0) * Text.dot(col("sub"), col("cvec")) + col("cn2"))
      .select(col("vid").as("qid"), col("mi"), col("ci"), col("d"))
    val adc = codes.join(qtab, Seq("mi", "ci"))
      .filter(col("qid") =!= col("vid"))
      .groupBy("qid", "vid")
      .agg(sum(col("d").cast(Exact.Dec)).as("adc")) // order-independent
    val wS = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
    val cand = adc.withColumn("r", row_number().over(wS))
      .filter(col("r") <= shortlist)
      .select("qid", "vid")
    // exact rerank on true vectors (unit norm: cosine = dot)
    val c = unit(corpus, idCol, vecCol)
    val rer = cand
      .join(c, "vid")
      .join(qu, "qid")
      .withColumn("sim", Text.dot(col("qv"), col("v")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    rer.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"), col("rnk"))
  }
}
