package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.functions.{Exact, Text}

/** IVF-PQ: the composed billion-scale ANN layout (FAISS's IVFADC
  * shape) — an IVF coarse quantizer partitions the corpus into cells,
  * and inside the probed cells the scan reads PQ CODES, not vectors.
  * The two compressions multiply: probing `nprobe` of `cells` cells
  * skips (1 - nprobe/cells) of the corpus, and the ADC scan over what
  * remains reads m one-byte codes per vector instead of the vector —
  * at 100 TB that is the difference between scanning terabytes and
  * scanning the shortlist's worth of real vectors.
  *
  * This composition quantizes raw (unit) vectors with GLOBAL PQ
  * codebooks (IVF-Flat-PQ). Classic IVFADC quantizes the RESIDUAL
  * v - centroid(cell) with per-layout codebooks, which tightens ADC
  * when cells are tight clusters; on this corpus's near-orthogonal
  * synthetic vectors cell radii are as wide as the space, so the
  * residual refinement buys nothing measurable and the composition
  * keeps the two trained models independent (either can be rebuilt
  * or reused alone — the coarse model is qs06's, the codebooks are
  * qs09's).
  *
  * Scale shape: one equi-join chain — codes ⋈ cell-assignments on id,
  * ⋈ query-probes on cell id, ⋈ per-query distance tables on
  * (qid, mi, ci) — then a decimal-exact per-(query, vector) sum, a
  * shortlist window, and the exact rerank on true vectors. No cross
  * join; the only fan-out is the intended per-probe code scan.
  * Deterministic end to end (both trainings are; ADC sums are decimal;
  * windows tie-break on id).
  */
object IvfPq {

  case class Model(coarse: Ivf.Model, pq: Pq.Model)

  def train(spark: SparkSession, corpus: DataFrame, idCol: String,
            vecCol: String, cells: Int = 8, m: Int = 16, k: Int = 16,
            iters: Int = 2): Model =
    Model(Ivf.train(spark, corpus, idCol, vecCol, cells, iters),
      Pq.train(spark, corpus, idCol, vecCol, m, k, iters))

  /** Two-stage search: ADC over the probed cells' codes, exact rerank.
    * Output matches `Similarity.cosineTopK`: (query_id, neighbor_id,
    * rnk).
    */
  def search(spark: SparkSession, corpus: DataFrame, queries: DataFrame,
             model: Model, idCol: String, vecCol: String, k: Int,
             nprobe: Int = 4, shortlist: Int = 128): DataFrame = {
    val subDim = model.pq.codebooks.head.head.length
    val cent = Pq.centroidDf(spark, model.pq.codebooks)
    // corpus side: (vid, cid, mi, ci) — PQ codes tagged with their cell
    val cellOf = Ivf.normalized(corpus, idCol, vecCol)
      .withColumn("cid", Ivf.assignExpr("v", "nrm", model.coarse.centroids))
      .select(col("vid"), col("cid"))
    val codes = Pq.encode(spark, corpus, model.pq, idCol, vecCol)
      .join(cellOf, "vid")
    // query side: nprobe nearest cells per query (same expression as
    // Ivf.search), plus the per-query ADC distance tables
    val sims = model.coarse.centroids.zipWithIndex.map { case (c, i) =>
      val cn = math.sqrt(c.map(x => x * x).sum)
      struct((Text.dot(col("qv"), typedLit(c.toSeq)) / (col("qnrm") * lit(cn)))
        .as("sim"), lit(i.toLong).as("cid"))
    }
    val q = Ivf.normalized(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"), col("nrm").as("qnrm"))
    val probes = q.withColumn("probe",
      explode(slice(sort_array(array(sims.toIndexedSeq: _*), asc = false), 1, nprobe)))
      .select(col("qid"), col("probe")("cid").as("cid"))
    val qu = Pq.unit(queries, idCol, vecCol)
      .select(col("vid").as("qid"), col("v").as("qv"))
    val qtab = Pq.sliced(qu.select(col("qid").as("vid"), col("qv").as("v")),
        model.pq.m, subDim)
      .join(broadcast(cent), "mi")
      .withColumn("d",
        col("sn2") - lit(2.0) * Text.dot(col("sub"), col("cvec")) + col("cn2"))
      .select(col("vid").as("qid"), col("mi"), col("ci"), col("d"))
    // cell-restricted ADC: only codes in a query's probed cells join its
    // distance table — the (nprobe/cells * corpus * m) scan IS the cost
    val adc = codes.join(probes, Seq("cid"))
      .filter(col("qid") =!= col("vid"))
      .join(qtab, Seq("qid", "mi", "ci"))
      .groupBy("qid", "vid")
      .agg(sum(col("d").cast(Exact.Dec)).as("adc"))
    val wS = Window.partitionBy("qid").orderBy(col("adc"), col("vid"))
    val cand = adc.withColumn("r", row_number().over(wS))
      .filter(col("r") <= shortlist)
      .select("qid", "vid")
    val c = Pq.unit(corpus, idCol, vecCol)
    val w = Window.partitionBy("qid").orderBy(col("sim").desc, col("vid"))
    cand.join(c, "vid").join(qu, "qid")
      .withColumn("sim", Text.dot(col("qv"), col("v")))
      .withColumn("rnk", row_number().over(w).cast(LongType))
      .filter(col("rnk") <= k)
      .select(col("qid").as("query_id"), col("vid").as("neighbor_id"), col("rnk"))
  }
}
