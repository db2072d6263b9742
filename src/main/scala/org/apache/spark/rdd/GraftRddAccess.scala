package org.apache.spark.rdd

/** Shim for `RDD.isLocallyCheckpointed`, which is `private[spark]`
  * (public in bytecode; Scala-restricted only). graft.Blocks needs it
  * to distinguish dead localCheckpoint blocks (truncated lineage,
  * garbage once their query returns — safe and necessary to sweep)
  * from plan-level caches (intact lineage, legitimate standing state —
  * must NOT be swept). Same access pattern as a SparkSessionExtensions
  * rule reaching analyzer internals.
  */
object GraftRddAccess {
  def isLocallyCheckpointed(r: RDD[_]): Boolean = r.isLocallyCheckpointed
}
