package graft.sources

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Hidden-partitioning transforms for snapshot tables (Iceberg's
  * partition model, re-expressed over path-encoded Spark layouts).
  *
  * A partition column is a TRANSFORM of a data column, written as a
  * derived column named `__p_<transform>_<srcCol>` — the data column
  * itself stays in the data files, so the layout is invisible to query
  * semantics (readers drop `__p_*`), and the path segment
  * `__p_year_l_shipdate=1995/` is fully self-describing: a pruner can
  * decide from the path alone whether a file may contain rows for a
  * predicate on the SOURCE column, with no spec registry to consult.
  * That is what lets the spec EVOLVE: each commit's data directory
  * carries its own layout, old directories keep theirs, and one table
  * mixes both — pruning applies per-file under whatever spec that file
  * was written with.
  *
  * Transforms (names must not contain '_' — the field-name parser
  * splits on the first one): `identity` (value copy), `year`
  * (calendar year of a date), `month` (months since 1970-01, so a
  * single integer totally orders across year boundaries — the Iceberg
  * month transform, not a 1-12 month-of-year which could not serve a
  * range).
  */
object PartitionSpec {

  val Prefix = "__p_"

  def fieldName(transform: String, src: String): String = {
    require(!transform.contains("_"), s"transform name may not contain '_': $transform")
    s"$Prefix${transform}_$src"
  }

  /** The derived partition column for a (transform, srcCol) pair. */
  def column(transform: String, src: String): Column = transform match {
    case "identity" => col(src)
    case "year" => year(col(src))
    case "month" => (year(col(src)) - 1970) * 12 + (month(col(src)) - 1)
    case BucketN(n) => pmod(crc32(col(src).cast("string")), lit(n.toLong))
    case t => throw new IllegalArgumentException(s"unknown partition transform: $t")
  }

  /** `bucketN` hashes the key's canonical string form through CRC32
    * mod N — computable identically on the driver (point-read pruning
    * needs the bound's bucket with no cluster round-trip) and inside
    * codegen'd Spark. Intended for integer/string keys; float keys are
    * rejected by their own string-form instability.
    */
  private object BucketN {
    def unapply(t: String): Option[Int] =
      if (t.startsWith("bucket")) t.stripPrefix("bucket").toIntOption.filter(_ > 0)
      else None
  }

  /** Driver-side twin of the bucketN transform. */
  def bucketValue(v: String, n: Int): Long = {
    val c = new java.util.zip.CRC32
    c.update(v.getBytes("UTF-8"))
    c.getValue % n
  }

  /** Transform applied to a driver-side ISO-date bound (None = this
    * transform cannot evaluate the bound → never prune on it).
    */
  private def bound(transform: String, v: String): Option[Long] =
    try transform match {
      case "year" => Some(java.time.LocalDate.parse(v).getYear.toLong)
      case "month" =>
        val d = java.time.LocalDate.parse(v)
        Some((d.getYear - 1970) * 12L + (d.getMonthValue - 1))
      case _ => None
    } catch { case _: java.time.format.DateTimeParseException => None }

  /** Spark percent-escapes special characters in partition directory
    * values (Hive path escaping); decode before comparing against a
    * caller-supplied raw bound, or an escaped value would wrongly
    * PRUNE a file that contains matching rows.
    */
  private def unescape(s: String): String = {
    val sb = new StringBuilder
    var i = 0
    while (i < s.length) {
      if (s.charAt(i) == '%' && i + 3 <= s.length &&
          s.substring(i + 1, i + 3).forall(c => Character.digit(c, 16) >= 0)) {
        sb.append(Integer.parseInt(s.substring(i + 1, i + 3), 16).toChar)
        i += 3
      } else { sb.append(s.charAt(i)); i += 1 }
    }
    sb.toString
  }

  /** `(transform, srcCol, value)` triples parsed from a relative file
    * path's `__p_*=v` segments (other segments ignored).
    */
  def segments(rel: String): Seq[(String, String, String)] =
    rel.split('/').toSeq.filter(_.contains("=")).flatMap { seg =>
      val Array(k, v) = seg.split("=", 2)
      if (!k.startsWith(Prefix)) None
      else {
        val rest = k.stripPrefix(Prefix)
        val i = rest.indexOf('_')
        if (i <= 0) None else Some((rest.take(i), rest.drop(i + 1), v))
      }
    }

  /** True when a file at `rel` may contain rows with `column` in
    * `[lo, hi]` under ITS OWN path-declared layout. Conservative by
    * construction: unknown transforms, unparsable values, null
    * partitions, and segments on other columns never prune. Identity
    * prunes only on equality bounds (string compare of a numeric range
    * would be unsound).
    */
  def mayContain(rel: String, column: String, lo: String, hi: String): Boolean =
    segments(rel).forall { case (t, src, v) =>
      if (src != column || v == "__HIVE_DEFAULT_PARTITION__") true
      else t match {
        case "identity" => lo != hi || unescape(v) == lo
        case "year" | "month" =>
          (bound(t, lo), bound(t, hi), v.toLongOption) match {
            case (Some(l), Some(h), Some(x)) => x >= l && x <= h
            case _ => true
          }
        case BucketN(n) =>
          // hashing destroys order: point reads only
          lo != hi || v.toLongOption.forall(_ == bucketValue(lo, n))
        case _ => true
      }
    }
}
