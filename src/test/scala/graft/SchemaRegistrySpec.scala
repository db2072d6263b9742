package graft

import org.apache.spark.sql.types.StructType

import graft.etl.SchemaRegistry

/** The registry (declared schemas) must match reality (parquet
  * footers as loaded by Tables) — the reference's DDL-vs-code
  * consistency check (verify_sql.py) re-expressed as StructType
  * equality.
  */
class SchemaRegistrySpec extends SparkSpec {

  private def normalize(st: StructType): Seq[(String, String)] =
    st.fields.map(f => (f.name, f.dataType.simpleString)).toSeq

  test("declared schemas match loaded tables at every scale factor") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      Tables.names.foreach { t =>
        val actual = normalize(Tables(spark, dir, t).schema)
        val declared = normalize(SchemaRegistry.schemas(t))
        assert(actual == declared, s"$t at $dir: $actual vs $declared")
      }
    }
  }

  test("registry covers exactly the table set") {
    assert(SchemaRegistry.schemas.keySet == Tables.names.toSet)
  }
}
