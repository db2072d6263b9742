package graft

import org.apache.spark.sql.functions._

/** The bench harness's dead-block sweep: locally-checkpointed RDDs are
  * reclaimed deterministically between suite entries, while plan-level
  * caches (intact lineage, legitimate standing state) are left alone.
  */
class BlocksSpec extends SparkSpec {

  test("sweep unpersists localCheckpoint blocks but leaves caches alone") {
    import spark.implicits._
    Blocks.sweepLocalCheckpoints(spark) // clean slate from other suites
    val ck = (1 to 100).toDF("x").localCheckpoint()
    assert(ck.count() == 100)
    val cached = (1 to 50).toDF("y").cache()
    assert(cached.count() == 50)
    val persisted = spark.sparkContext.getPersistentRDDs.size
    assert(persisted >= 2, s"expected both registered, got $persisted")

    val swept = Blocks.sweepLocalCheckpoints(spark)
    assert(swept >= 1, "the checkpointed RDD was not swept")
    // the cache survives the sweep AND still answers
    assert(spark.sparkContext.getPersistentRDDs.values
      .exists(!_.getStorageLevel.equals(
        org.apache.spark.storage.StorageLevel.NONE)),
      "the plan-level cache must survive the sweep")
    assert(cached.count() == 50)
    // a second sweep finds nothing new to do
    assert(Blocks.sweepLocalCheckpoints(spark) == 0)
    cached.unpersist()
  }

  test("storagePinned reports the block manager's pinned bytes") {
    import spark.implicits._
    Blocks.sweepLocalCheckpoints(spark)
    val ck = (1 to 10000).toDF("x").localCheckpoint()
    assert(ck.count() == 10000)
    val (n, mem, disk) = Blocks.storagePinned(spark)
    assert(n >= 1 && (mem + disk) > 0,
      s"checkpoint blocks should be visible: n=$n mem=$mem disk=$disk")
    Blocks.sweepLocalCheckpoints(spark)
  }
}
