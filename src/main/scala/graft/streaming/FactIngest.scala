package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.streaming.StreamingQuery

import graft.refstar.{RefStar, Warehouse}

/** Continuous fact ingestion — the streaming twin of the Warehouse fact
  * build (an extension; the reference is batch-only, SURVEY §2.10).
  *
  * A stream of raw sale rows (the denormalized detail+header shape a
  * CDC feed delivers) resolves its dimension FKs against the PERSISTED
  * dimensions via stateless stream-static left joins and appends
  * reference-contract Fact_SalesActual rows to a parquet path, with
  * exactly-once sink semantics from the checkpoint.
  *
  * Scale posture: this is the 100 TB ingest pattern — dimensions are
  * bounded and slow-changing (broadcast to every micro-batch task);
  * facts arrive continuously and append partition-local. No watermark
  * is needed because the lookups are stateless; no shuffle exists in
  * the hot path. Late-arriving sales simply append — the fact table is
  * an event log keyed by natural keys, never upserted.
  */
object FactIngest {

  /** One raw sale event, staging-typed (Staging.schemas salesheader +
    * salesdetail columns). STOREID/CUSTOMERID/RESELLERID carry the
    * source's exactly-one-party-per-sale convention, the rest NULL.
    */
  case class RawSale(SALESDETAILID: Long, SALESHEADERID: Long, PRODUCTID: Long,
                     SALESQUANTITY: Long, SALESAMOUNT: Double, DATE: String,
                     CHANNELID: Long, STOREID: Option[Long],
                     CUSTOMERID: Option[String], RESELLERID: Option[String])

  /** FK-resolved fact rows for a (possibly streaming) raw feed, joined
    * against the materialized dimensions.
    */
  def resolved(spark: SparkSession, raw: DataFrame): DataFrame =
    RefStar.resolveFact(raw,
      Warehouse.table(spark, "dim_product"),
      Warehouse.table(spark, "dim_store"),
      Warehouse.table(spark, "dim_customer"),
      Warehouse.table(spark, "dim_reseller"),
      Warehouse.table(spark, "dim_channel"))

  /** Append-mode continuous ingest into a parquet fact path, laid out
    * like the batch warehouse fact: partitioned by derived sale year,
    * so year-bounded reads prune streamed appends exactly as they prune
    * the batch build (Warehouse.FactYearCol) and a later
    * `Maintenance.compact` preserves the layout. The checkpoint gives
    * exactly-once file commits across restarts.
    *
    * `manifestCols` non-empty additionally maintains a
    * [[graft.sources.StatsManifest]] over the sink: after every
    * micro-batch a query-scoped listener appends stats rows for the
    * files that batch committed (`appendMissing` — covered files are
    * skipped, so a replayed batch or restarted query re-appends
    * nothing). Without this, sustained ingest decays the (stale-SAFE)
    * prune toward keep-everything: new files are unknown to the
    * manifest and always conservatively kept. The listener is
    * deregistered when the query terminates.
    */
  def start(spark: SparkSession, raw: DataFrame, path: String,
            checkpoint: String,
            manifestCols: Seq[String] = Nil): StreamingQuery = {
    val query = resolved(spark, raw)
      .withColumn(Warehouse.FactYearCol,
        org.apache.spark.sql.functions.floor(
          org.apache.spark.sql.functions.col("DimSaleDateID") / 10000L)
          .cast("int"))
      .writeStream
      .format("parquet")
      .option("path", path)
      .option("checkpointLocation", checkpoint)
      .partitionBy(Warehouse.FactYearCol)
      .outputMode("append")
      .start()
    if (manifestCols.nonEmpty) {
      val qid = query.id
      val listener = new org.apache.spark.sql.streaming.StreamingQueryListener {
        import org.apache.spark.sql.streaming.StreamingQueryListener._
        override def onQueryStarted(e: QueryStartedEvent): Unit = ()
        override def onQueryProgress(e: QueryProgressEvent): Unit =
          if (e.progress.id == qid)
            graft.sources.StatsManifest.appendMissing(spark, path, manifestCols)
        override def onQueryTerminated(e: QueryTerminatedEvent): Unit =
          if (e.id == qid) spark.streams.removeListener(this)
      }
      spark.streams.addListener(listener)
    }
    query
  }
}
