package graft.operators

import org.apache.spark.sql.SparkSession

/** Persistence for trained ANN model artifacts (IVF centroids, PQ
  * codebooks) as plain parquet tables — the model-registry move: at
  * 100 TB you train a coarse quantizer ONCE on a sample and reuse it
  * for every encode/search/ingest batch afterwards, so the artifact
  * must round-trip exactly. Doubles survive parquet bit-for-bit, and
  * load order is pinned by explicit sort keys, so a loaded model
  * produces IDENTICAL codes and search results to the trained one
  * (spec-asserted) — which is what keeps incrementally-encoded code
  * tables comparable across batches.
  */
object Models {

  /** PQ codebooks as one row per (subspace, centroid). */
  def savePq(spark: SparkSession, model: Pq.Model, path: String): Unit = {
    import spark.implicits._
    val rows = for {
      mi <- model.codebooks.indices
      ci <- model.codebooks(mi).indices
    } yield (mi, ci, model.codebooks(mi)(ci).toSeq)
    rows.toDF("mi", "ci", "centroid")
      .repartition(1) // driver-scale artifact: m*k rows
      .write.mode("overwrite").parquet(path)
  }

  def loadPq(spark: SparkSession, path: String): Pq.Model = {
    val rows = spark.read.parquet(path)
      .select("mi", "ci", "centroid").collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getSeq[Double](2).toArray))
    require(rows.nonEmpty, s"no PQ model at $path")
    val m = rows.map(_._1).max + 1
    val k = rows.map(_._2).max + 1
    require(rows.length == m * k, s"PQ model at $path is incomplete")
    val books = Array.ofDim[Array[Double]](m, k)
    rows.foreach { case (mi, ci, c) => books(mi)(ci) = c }
    // a duplicate + a missing row would pass the count check above but
    // leave a hole — every (subspace, centroid) slot must be filled
    require(books.forall(_.forall(_ != null)),
      s"PQ model at $path is incomplete (duplicate/missing entries)")
    Pq.Model(books.map(_.toArray))
  }

  /** IVF centroids as one row per cell. */
  def saveIvf(spark: SparkSession, model: Ivf.Model, path: String): Unit = {
    import spark.implicits._
    model.centroids.indices.map(i => (i, model.centroids(i).toSeq))
      .toDF("cid", "centroid")
      .repartition(1)
      .write.mode("overwrite").parquet(path)
  }

  def loadIvf(spark: SparkSession, path: String): Ivf.Model = {
    val rows = spark.read.parquet(path)
      .select("cid", "centroid").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty, s"no IVF model at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"IVF model at $path has gaps in cell ids")
    Ivf.Model(rows.map(_._2))
  }

  /** PCA model as one row per component plus a mean row (ci = -1). */
  def savePca(spark: SparkSession, model: Pca.Model, path: String): Unit = {
    import spark.implicits._
    val rows = (-1, model.mean.toSeq) +:
      model.components.indices.map(i => (i, model.components(i).toSeq))
    rows.toDF("ci", "vec")
      .repartition(1) // driver-scale artifact: outDims+1 rows
      .write.mode("overwrite").parquet(path)
  }

  def loadPca(spark: SparkSession, path: String): Pca.Model = {
    val rows = spark.read.parquet(path)
      .select("ci", "vec").collect()
      .map(r => (r.getInt(0), r.getSeq[Double](1).toArray))
      .sortBy(_._1)
    require(rows.nonEmpty && rows.head._1 == -1,
      s"no PCA model (or missing mean row) at $path")
    require(rows.map(_._1).toSeq == (-1 until rows.length - 1).toSeq,
      s"PCA model at $path has gaps in component ids")
    Pca.Model(rows.head._2, rows.tail.map(_._2))
  }

  /** Linear classifier weights as one row per dimension — the trained
    * quality filter is a registry artifact exactly like the ANN
    * quantizers: train once (expensive full passes), score every
    * ingest batch afterwards with the loaded copy.
    */
  def saveLinear(spark: SparkSession, model: Classifier.LinearModel,
                 path: String): Unit = {
    import spark.implicits._
    model.weights.indices.map(j => (j, model.weights(j)))
      .toDF("j", "w")
      .repartition(1) // driver-scale artifact: d rows
      .write.mode("overwrite").parquet(path)
  }

  def loadLinear(spark: SparkSession, path: String): Classifier.LinearModel = {
    val rows = spark.read.parquet(path)
      .select("j", "w").collect()
      .map(r => (r.getInt(0), r.getDouble(1)))
      .sortBy(_._1)
    require(rows.nonEmpty, s"no linear model at $path")
    require(rows.map(_._1).toSeq == rows.indices.toSeq,
      s"linear model at $path has gaps in dimensions")
    Classifier.LinearModel(rows.map(_._2))
  }

  /** Unigram-LM piece table as one row per (piece, count). The counts
    * are exact integers, so the loaded model reproduces the trained
    * one bit-for-bit — [[UnigramLm.encode]] from a loaded vocabulary
    * is IDENTICAL to encoding from the trained frame (ModelsSpec), the
    * property that makes per-batch streaming encodes comparable across
    * restarts. Stays a DataFrame on both sides: the piece table is the
    * one model here that may outgrow the driver (100k–1M pieces at
    * web-corpus scale), and nothing in train/encode ever collects it.
    */
  def saveVocab(spark: SparkSession, vocab: org.apache.spark.sql.DataFrame,
                path: String): Unit =
    vocab.select("piece", "cnt")
      .repartition(1) // vocab-scale artifact: |pieces| rows
      .write.mode("overwrite").parquet(path)

  def loadVocab(spark: SparkSession, path: String): org.apache.spark.sql.DataFrame = {
    val v = spark.read.parquet(path).select("piece", "cnt")
    require(!v.isEmpty, s"no unigram vocabulary at $path")
    v
  }
}
