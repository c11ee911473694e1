package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.CtePrune

/** Unit + equivalence coverage for the unused-CTE pruner the DS battery
  * runs through on the Spark side (the DuckDB oracle keeps the full text).
  */
class CtePruneSuite extends AnyFunSuite {

  test("keeps transitive dependencies, drops unused definitions") {
    val sql = """WITH a AS (SELECT 1 AS x),
b AS (SELECT x FROM a),
c AS (SELECT 2 AS y),
d AS (SELECT y FROM c)
SELECT * FROM b"""
    val pruned = CtePrune.prune(sql)
    assert(pruned.contains("a AS"))
    assert(pruned.contains("b AS"))
    assert(!pruned.contains("c AS"))
    assert(!pruned.contains("d AS"))
  }

  test("qualified main.<name> does not pin the CTE of the same name") {
    val sql = """WITH customer AS (SELECT 1 AS x)
SELECT * FROM main.customer"""
    assert(!CtePrune.prune(sql).contains("WITH"))
  }

  test("column substrings (c_customer_sk) do not pin the customer CTE") {
    val sql = """WITH customer AS (SELECT 1 AS x),
s AS (SELECT c_customer_sk FROM main.orders)
SELECT * FROM s"""
    val pruned = CtePrune.prune(sql)
    assert(pruned.contains("s AS"))
    assert(!pruned.contains("customer AS"))
  }

  test("string literals and nested parens survive paren tracking") {
    val sql = """WITH a AS (SELECT ')(' AS s, (1 + (2)) AS n),
b AS (SELECT 1 AS y)
SELECT s FROM a"""
    val pruned = CtePrune.prune(sql)
    assert(pruned.contains("a AS"))
    assert(!pruned.contains("b AS"))
  }

  test("case-insensitive reference keeps its CTE") {
    val sql = """WITH customer AS (SELECT 1 AS x)
SELECT * FROM CUSTOMER"""
    assert(CtePrune.prune(sql) eq sql)
  }

  test("no WITH prefix returns input unchanged") {
    val sql = "SELECT 1 AS x"
    assert(CtePrune.prune(sql) eq sql)
  }

  test("all kept: text returned unchanged") {
    val sql = """WITH a AS (SELECT 1 AS x)
SELECT * FROM a"""
    assert(CtePrune.prune(sql) eq sql)
  }

  test("battery texts: pruned and full text give identical results") {
    val spark = TestSpark.spark
    val sfDir = TestSpark.sfDir
    Tables.views(spark, sfDir)
    // one light and one heavy entry; full-battery equivalence is implied by
    // the oracle gate (DuckDB validates the FULL text on every run)
    for (name <- Seq("q257_ds_q52", "q332_ds_q75")) {
      val full = graft.queries.DsOfficial.entries.find(_.name == name).get.oracle.get
      val pruned = CtePrune.prune(full)
      assert(pruned.length < full.length, s"$name: nothing pruned")
      val a = spark.sql(full).collect().toSeq
      val b = spark.sql(pruned).collect().toSeq
      assert(a == b, s"$name: pruned text diverged")
    }
  }
}
