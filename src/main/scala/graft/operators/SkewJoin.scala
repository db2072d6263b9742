package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys — the manual fallback when AQE's skew
  * handling isn't available (e.g. a skewed key known in advance on a
  * 100 TB fact table: one hot customer, one hot null-bucket).
  *
  * The skewed (large) side gets a random salt in [0, salts); the small
  * side is exploded `salts` times so every (key, salt) pair matches.
  * Shuffle partitions then receive ~1/salts of the hot key each. Result
  * rows are identical to the unsalted join (verified in SkewJoinSpec).
  */
object SkewJoin {

  def saltedJoin(
      large: DataFrame, small: DataFrame,
      keys: Seq[String], salts: Int,
      joinType: String = "inner"): DataFrame = {
    val saltedLarge = large.withColumn("__salt",
      (rand(seed = 42) * salts).cast("int"))
    val saltedSmall = small.withColumn("__salt",
      explode(sequence(lit(0), lit(salts - 1))))
    saltedLarge
      .join(saltedSmall, keys :+ "__salt", joinType)
      .drop("__salt")
  }
}
