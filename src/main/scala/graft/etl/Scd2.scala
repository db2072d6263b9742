package graft.etl

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Slowly-changing-dimension Type 2 merge.
  *
  * The reference's dimension contract carries the SCD2 scaffolding —
  * EFFECTIVE_DATE / EXPIRATION_DATE / CURRENT_ROW_IND on Dim_Date
  * (rahil/create_views.py:70-72) — but never implements versioned
  * updates; this supplies the operator a warehouse user would expect.
  *
  * Given the current dimension state and a batch of source updates
  * keyed by the business key:
  *  - history rows (current_row_ind = 'N') pass through untouched
  *  - open rows with no update, or whose tracked attributes are all
  *    unchanged (null-safe compare), pass through untouched
  *  - open rows whose tracked attributes changed are CLOSED
  *    (expiration_date = asOf, current_row_ind = 'N') and a NEW open
  *    version row is emitted from the update's values
  *  - business keys new to the dimension get an initial open row
  *
  * ONE full-outer equi-join on the business key, consumed in a single
  * pass: each joined row emits its outcome rows (unchanged | closed +
  * fresh | fresh) through an array-explode, so the join subtree is
  * never duplicated across union branches — no windows, no driver
  * loops; at 100 TB both sides shuffle once on the key (or the update
  * batch broadcasts when small).
  */
object Scd2 {

  val OpenEnd = "9999-12-31"

  /** @param current  dimension state: `keyCol`, `tracked` attributes,
    *                 effective_date, expiration_date, current_row_ind
    * @param updates  source batch: `keyCol` + `tracked` attributes.
    *                 PRECONDITION: at most one row per business key —
    *                 a batch carrying two versions of the same key
    *                 would close the open row twice and emit two open
    *                 versions. A CDC feed folds to last-per-key FIRST
    *                 via `foldCdc(batch, key, orderCol)` (the feed has
    *                 the in-band ordering to fold by; this operator has
    *                 none).
    * @param asOf     the batch's effective date (yyyy-MM-dd)
    */
  /** Fold a CDC batch to its LAST version per business key — the
    * preparation `merge`'s one-row-per-key precondition prescribes. A
    * CDC feed has in-band ordering (an LSN, an offset, a change
    * timestamp); `orderCol` names it. Within one merge interval only
    * the final state matters — intermediate versions never become
    * dimension rows (they were superseded inside the batch), which is
    * standard warehouse CDC-compaction semantics. One partial-agg
    * shuffle on the key (max_by), no window sort.
    *
    * Ties on `orderCol` are broken by the largest tracked-attribute
    * tuple, so the fold is deterministic even on a sloppy feed.
    */
  def foldCdc(batch: DataFrame, keyCol: String, orderCol: String): DataFrame = {
    val payload = batch.columns.filter(_ != keyCol)
    val ord = struct(col(orderCol) +:
      payload.filterNot(_ == orderCol).map(col): _*)
    batch.groupBy(col(keyCol))
      .agg(max_by(struct(payload.map(col): _*), ord).as("__last"))
      .select(col(keyCol) +: payload.map(c => col(s"__last.$c")): _*)
  }

  /** Point-in-time snapshot: the business state current AT `date` —
    * effective_date <= date < expiration_date (half-open, so the day a
    * version closes is the day its successor answers). The query every
    * versioned dimension exists to serve: join facts to the dimension
    * AS OF the fact date instead of today's row. A narrow filter —
    * pushes down to the parquet scan, no shuffle.
    */
  def asOf(dim: DataFrame, date: String): DataFrame =
    dim.filter(col("effective_date") <= to_date(lit(date)) &&
      col("expiration_date") > to_date(lit(date)))
      .drop("effective_date", "expiration_date", "current_row_ind")

  def merge(current: DataFrame, updates: DataFrame, keyCol: String,
            tracked: Seq[String], asOf: String): DataFrame = {
    val meta = Seq("effective_date", "expiration_date", "current_row_ind")
    val outCols = (keyCol +: tracked) ++ meta

    val hist = current.filter(col("current_row_ind") =!= "Y")
      .select(outCols.map(col): _*)
    val open = current.filter(col("current_row_ind") === "Y")

    val u = updates.select((keyCol +: tracked).map(c => col(c).as(s"__u_$c")): _*)
    val j = open.join(u, col(keyCol) === col(s"__u_$keyCol"), "full")

    val changed: Column = tracked
      .map(t => !(col(t) <=> col(s"__u_$t"))).reduce(_ || _)
    val hasCur = col(keyCol).isNotNull
    val hasUpd = col(s"__u_$keyCol").isNotNull

    def row(cols: Seq[Column]): Column =
      struct(cols.zip(outCols).map { case (c, n) => c.as(n) }: _*)
    // open row that survives unchanged (no update, or update identical)
    val unchangedRow = row(outCols.map(col))
    // open row closed by a differing update
    val closedRow = row((keyCol +: tracked).map(col) ++ Seq(
      col("effective_date"), to_date(lit(asOf)), lit("N")))
    // fresh open version: differing update or brand-new key
    val freshRow = row((keyCol +: tracked).map(c => col(s"__u_$c")) ++ Seq(
      to_date(lit(asOf)), to_date(lit(OpenEnd)), lit("Y")))

    val emitted =
      when(hasCur && hasUpd && changed, array(closedRow, freshRow))
        .when(hasCur, array(unchangedRow))
        .otherwise(array(freshRow))

    hist.unionByName(
      j.select(explode(emitted).as("__r"))
        .select(outCols.map(n => col(s"__r.$n")): _*))
  }
}
