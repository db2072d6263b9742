package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{IntegerType, LongType}

import graft.functions.Text

/** Deduplication operators for training-data pipelines.
  *
  * Four families, in increasing scale-friendliness:
  *  - exact: hash group-by on the full content — one shuffle.
  *  - ngramJaccardPairs: EXACT all-pairs n-gram Jaccard via an inverted
  *    shingle index (shuffle on shingle). Cost grows with
  *    sum(docs-per-shingle^2); correct but only for corpora/samples
  *    where shingles are selective.
  *  - minhash + LSH banding: the 100 TB path — signatures are a linear
  *    scan, banding turns near-dup search into an equi-join on band
  *    keys, candidates are verified with exact Jaccard.
  *  - simhash: 1 64-bit value per doc; hamming-near duplicates found by
  *    band-rotation equi-joins.
  */
object Dedup {

  /** Exact dedup: group identical content, keep the lowest id. */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(contentCol)
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))

  private def withShingles(df: DataFrame, idCol: String, textCol: String, n: Int) =
    df.withColumn("__ws", expr(Text.wordsExpr(textCol)))
      .withColumn("__sh", expr(Text.shinglesExpr("__ws", n)))
      .select(col(idCol), col("__sh"))

  /** Exact pairwise n-gram Jaccard >= threshold via inverted index. */
  def ngramJaccardPairs(
      df: DataFrame, idCol: String, textCol: String,
      n: Int = 3, threshold: Double = 0.5): DataFrame = {
    val sh = withShingles(df, idCol, textCol, n).cache()
    val sizes = sh.select(col(idCol), size(col("__sh")).as("n"))
    val e = sh.select(col(idCol).as("doc"), explode(col("__sh")).as("s"))
    val inter = e.as("a")
      .join(e.as("b"), col("a.s") === col("b.s") && col("a.doc") < col("b.doc"))
      .groupBy(col("a.doc").as("doc_a"), col("b.doc").as("doc_b"))
      .agg(count(lit(1)).as("i"))
    val jac = inter
      .join(sizes.withColumnRenamed(idCol, "doc_a").withColumnRenamed("n", "na"), "doc_a")
      .join(sizes.withColumnRenamed(idCol, "doc_b").withColumnRenamed("n", "nb"), "doc_b")
      .withColumn("jaccard", col("i") * lit(1.0) / (col("na") + col("nb") - col("i")))
    val result = jac.filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .localCheckpoint() // materialize, then release the shingle cache
    sh.unpersist()
    result
  }

  /** Minhash signatures in long format: (id, perm_id, sig). */
  def minhashSignatures(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 16, n: Int = 3): DataFrame =
    withShingles(df, idCol, textCol, n)
      .select(col(idCol), explode(col("__sh")).as("__s"))
      .withColumn("__h", Text.polyhash(col("__s")))
      .withColumn("perm_id", explode(sequence(lit(0L), lit((k - 1).toLong))))
      .groupBy(col(idCol), col("perm_id"))
      .agg(min((Text.permA(col("perm_id")) * col("__h") + Text.permB(col("perm_id")))
        % Text.Mod).as("sig"))

  /** Near-duplicate pairs via minhash-LSH banding, verified exactly.
    *
    * k perms split into `bands` bands of k/bands rows; docs sharing any
    * band key become candidates; candidates get exact Jaccard and the
    * threshold filter. At 100 TB every step is an equi-shuffle — no
    * pairwise blowup outside genuinely-similar buckets.
    */
  def minhashLshPairs(
      df: DataFrame, idCol: String, textCol: String,
      k: Int = 32, bands: Int = 8, n: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(k % bands == 0, "bands must divide k")
    val r = k / bands
    val sigs = minhashSignatures(df, idCol, textCol, k, n)
    val bandKeys = sigs
      .withColumn("band", (col("perm_id") / r).cast(LongType))
      .groupBy(col(idCol), col("band"))
      // deterministic order inside the band key
      .agg(sort_array(collect_list(struct(col("perm_id"), col("sig")))).as("bsig"))
      .select(col(idCol), col("band"), to_json(col("bsig")).as("bkey"))
    val cand = bandKeys.as("a")
      .join(bandKeys.as("b"),
        col("a.band") === col("b.band") && col("a.bkey") === col("b.bkey") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .select(col(s"a.$idCol").as("doc_a"), col(s"b.$idCol").as("doc_b"))
      .distinct()
    // exact verify candidates (shingles cached: reused by sigs + verify)
    val sh = withShingles(df, idCol, textCol, n).cache()
    val pairs = cand
      .join(sh.withColumnRenamed(idCol, "doc_a").withColumnRenamed("__sh", "sa"), "doc_a")
      .join(sh.withColumnRenamed(idCol, "doc_b").withColumnRenamed("__sh", "sb"), "doc_b")
      .withColumn("i", size(array_intersect(col("sa"), col("sb"))))
      .withColumn("jaccard",
        col("i") * lit(1.0) / (size(col("sa")) + size(col("sb")) - col("i")))
    val result = pairs.filter(col("jaccard") >= threshold)
      .select("doc_a", "doc_b", "jaccard")
      .localCheckpoint() // materialize, then release the shingle cache
    sh.unpersist()
    result
  }

  /** Simhash (word-frequency weighted, `bits` low bits, default 60 to
    * stay in a positive BIGINT): explode word hashes x bit positions,
    * majority vote per bit, reassemble.
    */
  def simhash(df: DataFrame, idCol: String, textCol: String, bits: Int = 60): DataFrame =
    df.withColumn("__ws", expr(Text.wordsExpr(textCol)))
      .select(col(idCol), explode(col("__ws")).as("__w"))
      .withColumn("__h", Text.polyhash(col("__w")))
      .withColumn("j", explode(sequence(lit(0), lit(bits - 1))))
      .groupBy(col(idCol), col("j"))
      .agg(sum(expr("(shiftright(__h, j) & 1) * 2 - 1")).as("s"))
      .groupBy(col(idCol))
      .agg(sum(when(col("s") > 0, expr("shiftleft(CAST(1 AS BIGINT), j)"))
        .otherwise(0L)).as("simhash"))

  /** Near-duplicate pairs by embedding cosine >= threshold (exact
    * all-pairs; the approximate scale path is Similarity.lshCosine*).
    */
  def embeddingNearDupPairs(
      df: DataFrame, idCol: String, vecCol: String,
      threshold: Double): DataFrame = {
    val v = df.select(
      col(idCol).as("vid"),
      col(vecCol).cast("array<double>").as("v"))
      .withColumn("nrm", sqrt(Text.dot(col("v"), col("v"))))
    v.as("a").join(v.as("b"), col("a.vid") < col("b.vid"))
      .withColumn("sim",
        Text.dot(col("a.v"), col("b.v")) / (col("a.nrm") * col("b.nrm")))
      .filter(col("sim") >= threshold)
      .select(col("a.vid").as("vec_a"), col("b.vid").as("vec_b"))
  }
}
