package graft

import org.apache.spark.sql.types._

/** Pins Verify.assertComparatorSafe — the gate that keeps
  * comparator-unstable types (DecimalType, Array/Map cells) out of
  * query outputs. The r5 incident it guards against: q_ivm_agg's raw
  * DECIMAL(20,6) column hashed differently in pandas (Decimal objects)
  * vs DuckDB fetchdf (float64) despite identical values. */
class VerifyGuardSpec extends SparkSpec {

  private def schemaOf(sql: String): StructType =
    spark.sql(sql).schema

  test("a decimal output column is rejected with the query+column named") {
    val e = intercept[IllegalStateException] {
      Verify.assertComparatorSafe("q_demo",
        schemaOf("SELECT CAST(1.5 AS DECIMAL(20,6)) AS sum_price"))
    }
    assert(e.getMessage.contains("q_demo"))
    assert(e.getMessage.contains("sum_price"))
    assert(e.getMessage.contains("DecimalType"))
  }

  test("array and map cells are rejected (pandas sort crashes on them)") {
    intercept[IllegalStateException] {
      Verify.assertComparatorSafe("q_arr", schemaOf("SELECT array(1,2) AS xs"))
    }
    intercept[IllegalStateException] {
      Verify.assertComparatorSafe("q_map", schemaOf("SELECT map('a',1) AS m"))
    }
  }

  test("a decimal nested inside a struct is still caught") {
    intercept[IllegalStateException] {
      Verify.assertComparatorSafe("q_nested",
        schemaOf("SELECT named_struct('v', CAST(1 AS DECIMAL(10,2))) AS s"))
    }
  }

  test("comparator-safe scalar schemas pass") {
    Verify.assertComparatorSafe("q_ok",
      schemaOf("SELECT 1L AS k, CAST(1.5 AS DOUBLE) AS v, 'x' AS s, " +
        "DATE'2024-01-01' AS d, TIMESTAMP'2024-01-01 00:00:00' AS ts, true AS b"))
  }
}
