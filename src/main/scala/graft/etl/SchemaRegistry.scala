package graft.etl

import org.apache.spark.sql.types._

/** Declared schemas for every engine table — the reference's principle
  * of schema-on-load from DDL files (rahil/create_tables.py:62-74,
  * README.md:288-293: schemas are edited as declarations, never
  * inferred). At 100 TB inference would mean an extra full pass; with
  * the registry every read is single-pass and drift is caught by
  * SchemaRegistrySpec comparing the registry against the actual
  * parquet footers.
  */
object SchemaRegistry {

  private def s(fields: (String, DataType)*): StructType =
    StructType(fields.map { case (n, t) => StructField(n, t) })

  val schemas: Map[String, StructType] = Map(
    "region" -> s("r_regionkey" -> IntegerType, "r_name" -> StringType),
    "nation" -> s("n_nationkey" -> IntegerType, "n_name" -> StringType,
      "n_regionkey" -> IntegerType),
    "customer" -> s("c_custkey" -> LongType, "c_name" -> StringType,
      "c_nationkey" -> IntegerType, "c_acctbal" -> DoubleType,
      "c_mktsegment" -> StringType),
    "supplier" -> s("s_suppkey" -> LongType, "s_name" -> StringType,
      "s_nationkey" -> IntegerType, "s_acctbal" -> DoubleType),
    "part" -> s("p_partkey" -> LongType, "p_name" -> StringType,
      "p_brand" -> StringType, "p_type" -> StringType,
      "p_size" -> IntegerType, "p_retailprice" -> DoubleType),
    "orders" -> s("o_orderkey" -> LongType, "o_custkey" -> LongType,
      "o_orderstatus" -> StringType, "o_totalprice" -> DoubleType,
      "o_orderdate" -> TimestampNTZType, "o_orderpriority" -> StringType),
    "lineitem" -> s("l_orderkey" -> LongType, "l_partkey" -> LongType,
      "l_suppkey" -> LongType, "l_linenumber" -> IntegerType,
      "l_quantity" -> DoubleType, "l_extendedprice" -> DoubleType,
      "l_discount" -> DoubleType, "l_tax" -> DoubleType,
      "l_returnflag" -> StringType, "l_linestatus" -> StringType,
      "l_shipdate" -> TimestampNTZType),
    // events.ts arrives as TIMESTAMP(NANOS); Tables.apply normalizes to NTZ
    "events" -> s("event_id" -> LongType, "ts" -> TimestampNTZType,
      "user_id" -> LongType, "event_type" -> StringType,
      "value" -> DoubleType, "props" -> StringType),
    "documents" -> s("doc_id" -> LongType, "text" -> StringType,
      "lang" -> StringType, "source" -> StringType, "n_chars" -> LongType),
    "embeddings" -> s("vec_id" -> LongType,
      "embedding" -> ArrayType(FloatType), "label" -> IntegerType))
}
