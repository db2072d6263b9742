package graft.etl

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructType}

/** CSV stage reader reproducing the reference's CSV_FORMAT + COPY INTO
  * semantics (rahil/create_stages.py:23-30, rahil/load_data.py:41-52):
  *
  *  - comma delimiter, 1 header row skipped
  *  - NULL_IF ('NULL','null') and EMPTY_FIELD_AS_NULL: Spark's CSV
  *    reader takes a single nullValue, so 'NULL' is handled at parse
  *    time and the remaining variants by a normalization pass
  *  - ON_ERROR='CONTINUE': PERMISSIVE mode with a corrupt-record
  *    column; bad rows are counted and dropped, not fatal
  *  - LIST-before-load: empty-glob guard instead of failing the read
  *
  * Schemas are always declared (schema-on-load like the reference's
  * DDL files) — never inferred, so a 100 TB load is a single pass.
  */
object CsvStageReader {

  val CorruptCol = "_corrupt_record"

  /** True if the stage path has at least one file (the reference's
    * `LIST @stage` guard, rahil/load_data.py:32-38).
    */
  def stageHasFiles(spark: SparkSession, path: String): Boolean = {
    val p = new Path(path)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.globStatus(p) match {
      case null => false
      case st => st.nonEmpty
    }
  }

  /** Load result: clean rows plus the rejected-row count (the
    * reference logs per-file loaded/error counts).
    */
  case class Loaded(df: DataFrame, errorRows: Long)

  def read(spark: SparkSession, path: String, schema: StructType): Loaded = {
    val withCorrupt = schema.add(CorruptCol, StringType)
    val raw = spark.read
      .option("header", "true")
      .option("nullValue", "NULL")
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", CorruptCol)
      .schema(withCorrupt)
      .csv(path)
      .cache()
    val bad = raw.filter(col(CorruptCol).isNotNull).count()
    val clean = raw.filter(col(CorruptCol).isNull).drop(CorruptCol)
    // second NULL_IF token + EMPTY_FIELD_AS_NULL for string columns
    val normalized = schema.fields.foldLeft(clean) { (df, f) =>
      if (f.dataType == StringType)
        df.withColumn(f.name,
          when(col(f.name) === "null" || col(f.name) === "", lit(null))
            .otherwise(col(f.name)))
      else df
    }
    Loaded(normalized, bad)
  }

  /** The reference's two observed source timestamp styles
    * (`1/1/13 20:54` and `2013-01-01 21:20:22`,
    * rahil/logs/etl_run_20250514_204417.log:208,243) parsed leniently:
    * first format that matches wins, else null.
    */
  def parseSourceTimestamp(c: Column): Column = coalesce(
    try_to_timestamp(c, lit("M/d/yy H:mm")),
    try_to_timestamp(c, lit("yyyy-MM-dd HH:mm:ss")))
}
