package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.Text

/** IVF (inverted-file) approximate nearest-neighbor search: a
  * k-means coarse quantizer partitions the corpus into cells; a query
  * probes only its `nprobe` nearest cells and reranks exactly inside
  * them. The classic alternative to LSH (Similarity.lshCosineTopK) —
  * better recall/cost trade-off when the corpus is clusterable.
  *
  * Scale shape: training touches the corpus `iters` times (linear
  * scans, centroids live on the driver — they are tiny); search is an
  * equi-join corpus-cell ⋈ query-probe — no cross join anywhere.
  * Deterministic: centroids initialize from the first k vectors by id
  * and Lloyd means run through DECIMAL(25,6), so centroids are
  * bit-identical at any input partitioning (tested in IvfSpec).
  */
object Ivf {

  case class Model(centroids: Array[Array[Double]])

  private[operators] def normalized(df: DataFrame, idCol: String, vecCol: String): DataFrame =
    df.select(col(idCol).as("vid"), col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Text.dot(col("v"), col("v"))))

  /** Nearest-centroid id for a vector column given driver-side
    * centroids (centroid id by maximum cosine = minimum angle).
    */
  private[operators] def assignExpr(vec: String, nrm: String,
                         centroids: Array[Array[Double]]) = {
    val sims = centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct(
        (Text.dot(col(vec), typedLit(c.toSeq)) / (col(nrm) * lit(cn))).as("sim"),
        lit(i.toLong).as("cid"))
    }
    // argmax by sim, ties to lowest cid: array_max on (sim, -cid) struct
    element_at(sort_array(array(sims.toIndexedSeq: _*), asc = false), 1)("cid")
  }

  /** Lloyd's algorithm with deterministic init (first k vectors by id). */
  def train(spark: SparkSession, corpus: DataFrame, idCol: String,
            vecCol: String, k: Int, iters: Int = 3): Model = {
    val data = normalized(corpus, idCol, vecCol).cache()
    var centroids: Array[Array[Double]] = data.orderBy("vid").limit(k)
      .select("v").collect().map(_.getSeq[Double](0).toArray)
    for (_ <- 1 to iters) {
      val assigned = data.withColumn("cid", assignExpr("v", "nrm", centroids))
      val dim = centroids.head.length
      // means through DECIMAL(25,6) (same move as Similarity.centroids):
      // plain double avg is partition-order-dependent in the last ulp,
      // so centroids — and the qs06 recall gate built on them — would
      // depend on how the corpus happens to be partitioned
      val means = assigned
        .select(col("cid"), posexplode(col("v")).as(Seq("pos", "x")))
        .groupBy("cid", "pos")
        .agg((sum(col("x").cast(graft.functions.Exact.Dec)).cast("double") /
          count(lit(1))).as("m"))
        .groupBy("cid")
        .agg(map_from_arrays(collect_list(col("pos")), collect_list(col("m"))).as("mm"))
        .collect()
        .map(r => r.getLong(0).toInt ->
          Array.tabulate(dim)(i => r.getMap[Int, Double](1)(i)))
        .toMap
      centroids = centroids.indices
        .map(i => means.getOrElse(i, centroids(i))).toArray
    }
    data.unpersist()
    Model(centroids)
  }

  /** The corpus half of the index — (vid, v, nrm, cid) rows, each
    * vector labeled with its nearest coarse cell. Row-local map (no
    * shuffle), deterministic given the model, and MERGEABLE: the
    * assignment of a union is the union of the assignments, which is
    * what lets [[graft.streaming.IvfIngest]] maintain it per
    * micro-batch and serve bit-identically to a batch build.
    */
  def assign(corpus: DataFrame, model: Model,
             idCol: String, vecCol: String): DataFrame =
    normalized(corpus, idCol, vecCol)
      .withColumn("cid", assignExpr("v", "nrm", model.centroids))

  /** Recompute the cell assignment of ALREADY-ASSIGNED rows ((…, v,
    * nrm, …) — [[assign]]'s value columns, e.g. read back from a
    * persisted index) against a NEW model, every other column
    * preserved in place. Row-local, and exactly [[assign]] of the
    * original vectors under `model` because v/nrm round-trip parquet
    * bit-exactly — which is what lets
    * [[graft.streaming.IvfIngest.retrainSwap]] rewrite an in-flight
    * batch's rows such that the pending replay reproduces them.
    */
  def reassign(assigned: DataFrame, model: Model): DataFrame =
    assigned.withColumn("cid", assignExpr("v", "nrm", model.centroids))

  /** Mean cosine similarity of assigned rows to their ASSIGNED
    * centroid — the cheapest meaningful fit statistic of a coarse
    * quantizer over a corpus, and therefore the DRIFT PROBE a
    * maintained index runs: at train time the assignment is nearest-
    * centroid so this is the k-means objective (in cosine form); as
    * the corpus shifts under a frozen model the newly-ingested
    * vectors sit further from every centroid and the mean drops.
    * One row-local projection + one partial-agg AVG — no join, no
    * shuffle beyond the final reduce; safe to run every maintenance
    * tick at any corpus size.
    */
  def meanAssignedSim(assigned: DataFrame, model: Model): Double = {
    val sims = model.centroids.map { c =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      Text.dot(col("v"), typedLit(c.toSeq)) / (col("nrm") * lit(cn))
    }
    assigned.select(avg(element_at(array(sims.toIndexedSeq: _*),
      (col("cid") + 1).cast("int"))).as("m"))
      .head().getDouble(0)
  }

  /** Probe the `nprobe` nearest cells per query, rerank exactly. */
  def search(corpus: DataFrame, queries: DataFrame, model: Model,
             idCol: String, vecCol: String, k: Int, nprobe: Int = 2): DataFrame =
    searchAssigned(assign(corpus, model, idCol, vecCol), queries, model,
      idCol, vecCol, k, nprobe)

  /** [[search]] against a PRE-ASSIGNED corpus ((vid, v, nrm, cid) —
    * [[assign]]'s schema, possibly persisted and streamed-into): the
    * query side probes its `nprobe` nearest cells, candidates come
    * from an equi-join on cid, exact rerank inside. Identical output
    * to [[search]] on the same rows by construction.
    */
  def searchAssigned(assigned: DataFrame, queries: DataFrame, model: Model,
                     idCol: String, vecCol: String, k: Int,
                     nprobe: Int = 2): DataFrame = {
    val c = assigned
    val q = normalized(queries, idCol, vecCol)
      .withColumnRenamed("vid", "qid")
      .withColumnRenamed("v", "qv").withColumnRenamed("nrm", "qnrm")
    // nprobe nearest centroids per query
    val sims = model.centroids.zipWithIndex.map { case (cent, i) =>
      val cn = math.sqrt(cent.map(x => x * x).sum)
      struct((Text.dot(col("qv"), typedLit(cent.toSeq)) / (col("qnrm") * lit(cn)))
        .as("sim"), lit(i.toLong).as("cid"))
    }
    val probes = q.withColumn("probe",
      explode(slice(sort_array(array(sims.toIndexedSeq: _*), asc = false), 1, nprobe)))
      .withColumn("cid", col("probe")("cid")).drop("probe")
    val cand = probes.join(c, "cid")
      .filter(col("qid") =!= col("vid"))
      .withColumn("sim", Text.dot(col("qv"), col("v")) / (col("qnrm") * col("nrm")))
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    cand.withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"), col("rnk"))
  }
}
