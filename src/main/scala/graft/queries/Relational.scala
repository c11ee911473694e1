package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Core relational surface: scan / filter / projection / predicates / CASE /
  * null handling. Mirrors the reference's parsed surface (SURVEY.md §2B;
  * reference parser sites AstBuilder.scala:681-757,1285-1477,1795-1839) but
  * re-expressed with the DataFrame API so Catalyst plans the scans with
  * pushdown + pruning.
  */
object Relational {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // Flagship TPC-H Q1 shape: scan -> pushed filter -> hash agg -> sort.
    QE("q01_pricing_summary", Some(s"""
      SELECT l_returnflag, l_linestatus,
             ${Q.oSum("l_quantity")} AS sum_qty,
             ${Q.oSum("l_extendedprice")} AS sum_base_price,
             ${Q.oSumRev("l_extendedprice", "l_discount")} AS sum_disc_price,
             CAST(SUM(${Q.oCharge("l_extendedprice", "l_discount", "l_tax")}) AS DOUBLE) AS sum_charge,
             ${Q.oAvg("l_quantity")} AS avg_qty,
             ${Q.oAvg("l_extendedprice")} AS avg_price,
             ${Q.oAvg("l_discount")} AS avg_disc,
             COUNT(*) AS count_order
      FROM lineitem WHERE l_shipdate <= TIMESTAMP '2000-09-02 00:00:00'
      GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus"""),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") <= lit("2000-09-02").cast(TimestampType))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          Q.dsum(col("l_quantity")).as("sum_qty"),
          Q.dsum(col("l_extendedprice")).as("sum_base_price"),
          Q.dsumx(Q.revenue(col("l_extendedprice"), col("l_discount"))).as("sum_disc_price"),
          Q.dsumx(Q.charge(col("l_extendedprice"), col("l_discount"), col("l_tax"))).as("sum_charge"),
          Q.davg(col("l_quantity")).as("avg_qty"),
          Q.davg(col("l_extendedprice")).as("avg_price"),
          Q.davg(col("l_discount")).as("avg_disc"),
          count(lit(1)).as("count_order"))
        .orderBy("l_returnflag", "l_linestatus")),

    // Pure scan + projection + pushed predicate (PushedFilters must show).
    QE("q02_scan_projection", Some("""
      SELECT l_orderkey, l_linenumber, l_partkey, l_extendedprice
      FROM lineitem WHERE l_quantity > 45.0
      ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_quantity") > 45.0)
        .select("l_orderkey", "l_linenumber", "l_partkey", "l_extendedprice")
        .orderBy("l_orderkey", "l_linenumber")),

    // TPC-H Q6 shape: tight filter -> global agg (map-side partial agg).
    QE("q03_forecast_revenue", Some("""
      SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1998-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1999-01-01 00:00:00'
        AND l_discount BETWEEN 0.02 AND 0.09 AND l_quantity < 24.0"""),
      (s, d) => t(s, d, "lineitem")
        .filter(col("l_shipdate") >= lit("1998-01-01").cast(TimestampType) &&
          col("l_shipdate") < lit("1999-01-01").cast(TimestampType) &&
          col("l_discount").between(0.02, 0.09) && col("l_quantity") < 24.0)
        .agg(sum(col("l_extendedprice").cast(Q.dec) * col("l_discount").cast(Q.dec))
          .cast(DoubleType).as("revenue"))),

    // CASE WHEN (searched) + grouping on the derived column.
    QE("q04_case_when", Some(s"""
      SELECT CASE WHEN o_totalprice < 100000 THEN 'small'
                  WHEN o_totalprice < 300000 THEN 'medium'
                  ELSE 'large' END AS bucket,
             COUNT(*) AS n, ${Q.oSum("o_totalprice")} AS total
      FROM orders GROUP BY 1 ORDER BY bucket"""),
      (s, d) => t(s, d, "orders")
        .select(
          when(col("o_totalprice") < 100000, "small")
            .when(col("o_totalprice") < 300000, "medium")
            .otherwise("large").as("bucket"),
          col("o_totalprice"))
        .groupBy("bucket")
        .agg(count(lit(1)).as("n"), Q.dsum(col("o_totalprice")).as("total"))
        .orderBy("bucket")),

    // BETWEEN / IN (list) / LIKE / RLIKE predicates together.
    QE("q05_predicates", Some("""
      SELECT o_orderkey, o_orderpriority, o_orderstatus
      FROM orders
      WHERE o_orderdate BETWEEN TIMESTAMP '1997-01-01 00:00:00' AND TIMESTAMP '1997-12-31 00:00:00'
        AND o_orderstatus IN ('F','O')
        AND o_orderpriority LIKE '%URGENT%'
        AND regexp_matches(o_orderpriority, '^[0-9]-')
      ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderdate").between(
          lit("1997-01-01").cast(TimestampType), lit("1997-12-31").cast(TimestampType))
          && col("o_orderstatus").isin("F", "O")
          && col("o_orderpriority").like("%URGENT%")
          && col("o_orderpriority").rlike("^[0-9]-"))
        .select("o_orderkey", "o_orderpriority", "o_orderstatus")
        .orderBy("o_orderkey")),

    // IS NULL / IS DISTINCT FROM / NULLS FIRST ordering over derived nulls.
    QE("q06_null_handling", Some("""
      SELECT c_custkey,
             CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END AS bal,
             (CASE WHEN c_acctbal < 0 THEN NULL ELSE c_acctbal END) IS NULL AS was_neg,
             c_mktsegment IS DISTINCT FROM 'BUILDING' AS not_building
      FROM customer
      ORDER BY bal ASC NULLS FIRST, c_custkey"""),
      (s, d) => {
        val bal = when(col("c_acctbal") < 0, lit(null).cast(DoubleType)).otherwise(col("c_acctbal"))
        t(s, d, "customer")
          .select(col("c_custkey"), bal.as("bal"), bal.isNull.as("was_neg"),
            !(col("c_mktsegment") <=> "BUILDING") as "not_building")
          .orderBy(col("bal").asc_nulls_first, col("c_custkey"))
      }),

    // String functions: substring / trim / position / upper / concat-|| / length.
    QE("q07_string_funcs", Some("""
      SELECT p_partkey,
             upper(p_brand) AS brand_u,
             substring(p_name, 1, 8) AS name8,
             trim(' ' || p_type || ' ') AS type_t,
             strpos(p_type, 'a') AS a_pos,
             length(p_name) AS name_len,
             p_brand || '#' || p_type AS tagged
      FROM part ORDER BY p_partkey"""),
      (s, d) => t(s, d, "part").select(
        col("p_partkey"),
        upper(col("p_brand")).as("brand_u"),
        substring(col("p_name"), 1, 8).as("name8"),
        trim(concat(lit(" "), col("p_type"), lit(" "))).as("type_t"),
        instr(col("p_type"), "a").cast(LongType).as("a_pos"),
        length(col("p_name")).cast(LongType).as("name_len"),
        concat_ws("#", col("p_brand"), col("p_type")).as("tagged"))
        .orderBy("p_partkey")),

    // Date/time functions: extract year/month/day, date_trunc, interval add.
    QE("q08_date_funcs", Some("""
      SELECT o_orderkey,
             CAST(extract(year FROM o_orderdate) AS INT) AS yr,
             CAST(extract(month FROM o_orderdate) AS INT) AS mon,
             CAST(extract(day FROM o_orderdate) AS INT) AS dy,
             date_trunc('month', o_orderdate) AS mon_start,
             o_orderdate + INTERVAL 30 DAY AS due
      FROM orders WHERE o_orderkey < 100 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 100)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("yr"),
          month(col("o_orderdate")).as("mon"),
          dayofmonth(col("o_orderdate")).as("dy"),
          date_trunc("month", col("o_orderdate")).as("mon_start"),
          (col("o_orderdate") + expr("INTERVAL 30 DAYS")).as("due"))
        .orderBy("o_orderkey")),

    // Date surface II beyond q08: month-clamped add_months/last_day,
    // next_day (DuckDB has none — the oracle derives it from isodow),
    // ISO week, date_add, epoch seconds, and a formatted render. The
    // epoch/format calls go through an explicit TimestampType cast so the
    // entry stays correct for both on-disk timestamp flavors the driver
    // data has shipped (LTZ and NTZ; session pinned UTC).
    QE("q217_datetime_funcs2", Some("""
      SELECT o_orderkey,
             CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS TIMESTAMP) AS plus3m,
             CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS eom,
             CAST(CAST(o_orderdate AS DATE) +
               CAST(CASE WHEN (8 - isodow(CAST(o_orderdate AS DATE))) % 7 = 0 THEN 7
                     ELSE (8 - isodow(CAST(o_orderdate AS DATE))) % 7 END AS INT)
               AS TIMESTAMP) AS next_mon,
             CAST(weekofyear(CAST(o_orderdate AS DATE)) AS INT) AS wk,
             CAST(CAST(o_orderdate AS DATE) + 45 AS TIMESTAMP) AS plus45d,
             CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s,
             strftime(o_orderdate, '%Y-%m-%d %H:%M:%S') AS ts_str
      FROM orders WHERE o_orderkey < 200 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders")
        .filter(col("o_orderkey") < 200)
        .select(
          col("o_orderkey"),
          // DATE results render as midnight timestamps on both sides: the
          // comparator sees parquet date32 and DuckDB DATE as different
          // pandas dtypes even when values agree
          add_months(to_date(col("o_orderdate")), 3).cast(TimestampType).as("plus3m"),
          last_day(to_date(col("o_orderdate"))).cast(TimestampType).as("eom"),
          next_day(to_date(col("o_orderdate")), "MON").cast(TimestampType).as("next_mon"),
          weekofyear(col("o_orderdate")).as("wk"),
          date_add(to_date(col("o_orderdate")), 45).cast(TimestampType).as("plus45d"),
          unix_timestamp(col("o_orderdate").cast(TimestampType)).as("epoch_s"),
          date_format(col("o_orderdate").cast(TimestampType),
            "yyyy-MM-dd HH:mm:ss").as("ts_str"))
        .orderBy("o_orderkey")),

    // Math functions (only ops with engine-identical IEEE semantics).
    QE("q09_math_funcs", Some("""
      SELECT s_suppkey,
             abs(s_acctbal) AS abs_bal,
             round(s_acctbal, 1) AS round_bal,
             floor(s_acctbal) AS floor_bal,
             ceil(s_acctbal) AS ceil_bal,
             sqrt(abs(s_acctbal)) AS sqrt_bal,
             CAST(s_suppkey % 7 AS BIGINT) AS mod7
      FROM supplier ORDER BY s_suppkey"""),
      (s, d) => t(s, d, "supplier").select(
        col("s_suppkey"),
        abs(col("s_acctbal")).as("abs_bal"),
        round(col("s_acctbal"), 1).as("round_bal"),
        floor(col("s_acctbal")).cast(DoubleType).as("floor_bal"),
        ceil(col("s_acctbal")).cast(DoubleType).as("ceil_bal"),
        sqrt(abs(col("s_acctbal"))).as("sqrt_bal"),
        (col("s_suppkey") % 7).as("mod7"))
        .orderBy("s_suppkey")),

    // String surface II beyond q07: translate, reverse, repeat, lpad,
    // split_part, regexp_extract_all (stringified for comparability),
    // md5 — all expression-only and codegen'd.
    QE("q185_string_funcs2", Some("""
      SELECT o_orderkey,
             translate(o_orderpriority, '-', '_') AS t,
             reverse(o_orderstatus) AS rev,
             repeat(o_orderstatus, 3) AS rep,
             lpad(CAST(o_orderkey AS VARCHAR), 8, '0') AS padded,
             split_part(o_orderpriority, '-', 2) AS word,
             array_to_string(regexp_extract_all(o_orderpriority, '[A-Z]+'), ',') AS caps,
             md5(o_orderpriority) AS h
      FROM orders WHERE o_orderkey < 500 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") < 500).select(
        col("o_orderkey"),
        translate(col("o_orderpriority"), "-", "_").as("t"),
        reverse(col("o_orderstatus")).as("rev"),
        repeat(col("o_orderstatus"), 3).as("rep"),
        lpad(col("o_orderkey").cast(StringType), 8, "0").as("padded"),
        split_part(col("o_orderpriority"), lit("-"), lit(2)).as("word"),
        concat_ws(",",
          regexp_extract_all(col("o_orderpriority"), lit("[A-Z]+"), lit(0))).as("caps"),
        md5(col("o_orderpriority").cast("binary")).as("h"))
        .orderBy("o_orderkey")),

    // Regexp capture-group BACKREFERENCES in replacement: the dialect trap
    // where Spark spells a group $1 and DuckDB/PG spell it \1 — the oracle
    // uses its own syntax, values must agree.
    QE("q234_regexp_backref", Some("""
      SELECT o_orderkey,
             regexp_replace(o_orderpriority, '(\d)-(\w+)', '\2-\1') AS swapped,
             regexp_replace(o_orderstatus, '(.)', '[\1]') AS boxed
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") < 300).select(
        col("o_orderkey"),
        regexp_replace(col("o_orderpriority"), "(\\d)-(\\w+)", "$2-$1").as("swapped"),
        regexp_replace(col("o_orderstatus"), "(.)", "[$1]").as("boxed"))
        .orderBy("o_orderkey")),

    // NULL-handling function family: NULLIF (sentinel → NULL), NVL/IFNULL
    // (default fill), NVL2 (three-way presence switch — DuckDB has none,
    // so the oracle spells the equivalent CASE).
    QE("q235_null_funcs", Some("""
      SELECT o_orderkey,
             nullif(o_orderstatus, 'O') AS st_or_null,
             ifnull(nullif(o_orderstatus, 'O'), 'open') AS st_filled,
             CASE WHEN nullif(o_orderstatus, 'O') IS NOT NULL
                  THEN 'closed' ELSE 'open' END AS st_state
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_orderkey,
                 nullif(o_orderstatus, 'O') AS st_or_null,
                 nvl(nullif(o_orderstatus, 'O'), 'open') AS st_filled,
                 nvl2(nullif(o_orderstatus, 'O'), 'closed', 'open') AS st_state
          FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey""")
      }),

    // String surface III: regexp_count, locate, chr, OVERLAY (SQL-standard
    // splice; DuckDB lacks it, so the oracle rebuilds it from substr
    // pieces), and a base64 render of the raw bytes.
    QE("q220_string_funcs3", Some("""
      SELECT o_orderkey,
             CAST(len(regexp_extract_all(o_orderpriority, '[aeiou]')) AS INT) AS vowels,
             CAST(strpos(o_orderpriority, 'E') AS INT) AS pos_e,
             chr(65 + CAST(o_orderkey % 26 AS INT)) AS code_chr,
             substr(o_orderpriority, 1, 1) || '##' ||
               substr(o_orderpriority, 4) AS spliced,
             base64(encode(o_orderstatus)) AS b64
      FROM orders WHERE o_orderkey < 300 ORDER BY o_orderkey"""),
      (s, d) => t(s, d, "orders").filter(col("o_orderkey") < 300).select(
        col("o_orderkey"),
        regexp_count(col("o_orderpriority"), lit("[aeiou]")).as("vowels"),
        locate("E", col("o_orderpriority")).as("pos_e"),
        expr("chr(65 + o_orderkey % 26)").as("code_chr"),
        overlay(col("o_orderpriority"), lit("##"), lit(2), lit(2)).as("spliced"),
        base64(col("o_orderstatus").cast(BinaryType)).as("b64"))
        .orderBy("o_orderkey")))
}
