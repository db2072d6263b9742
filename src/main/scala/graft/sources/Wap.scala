package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.etl.Expectations

/** Write-Audit-Publish over branch refs — the lakehouse release
  * pattern (Iceberg WAP / Netflix's audit pattern): a batch is STAGED
  * as a real commit on an audit branch, validated there, and only a
  * passing audit fast-forwards the consumer-facing branch. Consumers
  * pinned to `main` can never observe unvalidated data, yet a failed
  * batch remains a readable staged version for forensics instead of
  * vanishing into a rejected write.
  *
  * Scale note: expectations are per-row, and every file carried from
  * the branch head was already validated when IT published — so the
  * audit validates ONLY the incoming batch, keeping audit cost
  * proportional to the change, never the table (the same
  * incremental-over-full discipline as compactIncremental).
  */
object Wap {

  /** Stage `df` on `audit`, validate, publish to `main` on success.
    *
    * Returns Right(published version) after a fast-forward, or
    * Left(violation count) after an abort — in which case `audit` is
    * reset to `main`'s head (ready for the next batch) while the
    * staged version stays in global history for inspection.
    */
  def writeAuditPublish(
      spark: SparkSession, table: String, df: DataFrame,
      rules: Seq[Expectations.Rule],
      fks: Seq[Expectations.FkRule] = Nil,
      mode: String = "append",
      main: String = "main", audit: String = "audit"): Either[Long, Int] = {
    val head = Refs.resolve(spark, table, audit)
    val staged = Refs.commitTo(spark, table, audit, df, mode)
    // audit the STAGED bytes, not the input plan: re-evaluating `df`
    // recomputes its source, and a non-deterministic source (or data
    // changing between stage and audit) would publish bytes that were
    // never validated — readAdded scans exactly the files this commit
    // added, keeping audit cost proportional to the batch
    val stagedRows = Snapshots.readAdded(spark, table, staged, head)
    val (_, quarantine) = Expectations.validate(stagedRows, rules, fks)
    val bad = quarantine.count()
    if (bad == 0) {
      Refs.fastForward(spark, table, main, audit)
      Right(staged)
    } else {
      Refs.drop(spark, table, audit)
      Refs.branch(spark, table, audit,
        Some(Refs.resolve(spark, table, main)))
      Left(bad)
    }
  }
}
