package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Every implemented operator, one QE each (SURVEY.md §2 coverage). */
  def all: Seq[QE] =
    queries_relational ++ queries_pipeline

  private def queries_relational: Seq[QE] =
    graft.queries.Relational.entries ++
      graft.queries.Joins.entries ++
      graft.queries.Aggregates.entries ++
      graft.queries.Windows.entries ++
      graft.queries.SetsSorts.entries ++
      graft.queries.Subqueries.entries ++
      graft.queries.Extras.entries ++
      graft.queries.Sources.entries ++
      graft.queries.TpchShapes.entries ++
      graft.queries.DsShapes.entries ++
      graft.queries.DsOfficial.entries ++
      graft.queries.Modern.entries ++
      graft.queries.Temporal.entries

  private def queries_pipeline: Seq[QE] =
    graft.queries.Pipeline.entries ++
      graft.queries.Corpus.entries ++
      graft.queries.Scrub.entries ++
      graft.queries.IvfAnn.entries ++
      graft.queries.PqAnn.entries ++
      graft.queries.PgDialectQueries.entries

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * TPC-H Q1 shape per SURVEY.md §7.3: scan -> pushed filter -> hash agg ->
    * sort, all codegen'd, partial aggregation map-side.
    */
  def entry(spark: SparkSession): DataFrame =
    Tables.df(spark, "/root/testdata/sf0.001", "lineitem")
      .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
      .groupBy("l_returnflag", "l_linestatus")
      .agg(
        Q.dsum(col("l_quantity")).as("sum_qty"),
        Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
        Q.davg(col("l_extendedprice")).as("avg_price"),
        count(lit(1)).as("count_order"))
      .orderBy("l_returnflag", "l_linestatus")

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    all.map(q => q.name -> q.fn).toMap

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    all.flatMap(q => q.oracle.map(o => q.name -> o.trim)).toMap
}
