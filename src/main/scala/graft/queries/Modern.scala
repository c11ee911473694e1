package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Modern-SQL surface the reference era predates: LATERAL correlated
  * subqueries in FROM (reference grammar has only LATERAL VIEW,
  * AstBuilder.scala:916-936), GROUP BY ALL, LIMIT ... OFFSET pagination,
  * UNION by column NAME with missing-column fill, and the MAP column
  * constructors/accessors. Each runs the same shape in DuckDB as the
  * oracle, so all five are hash-exact-checkable.
  */
object Modern {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // SQL-standard LATERAL correlated subquery in FROM — top-2 customers
    // per nation by balance. Catalyst decorrelates the LATERAL into a
    // ranked window join (DecorrelateInnerQuery), so the plan is one
    // customer scan + per-nation rank, never a per-nation re-scan: at
    // 1000 nations x 100 TB the naive interpretation is 1000 scans, the
    // decorrelated plan is one. Tie-break on c_custkey inside the LIMIT,
    // then a fully-deterministic outer ORDER BY.
    QE("q122_lateral_join", Some("""
      SELECT n_name, c_name, c_acctbal
      FROM nation, LATERAL (
        SELECT c_name, c_acctbal FROM customer
        WHERE c_nationkey = n_nationkey
        ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
      ORDER BY n_name, c_acctbal DESC, c_name"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT n_name, c_name, c_acctbal
          FROM nation, LATERAL (
            SELECT c_name, c_acctbal FROM customer
            WHERE c_nationkey = n_nationkey
            ORDER BY c_acctbal DESC, c_custkey LIMIT 2) t
          ORDER BY n_name, c_acctbal DESC, c_name""")
      }),

    // GROUP BY ALL — group keys inferred from the non-aggregate select
    // list. Same physical plan as the explicit form (partial agg +
    // exchange on the inferred keys); the construct is purely analysis-
    // time, so it costs nothing at scale.
    QE("q123_group_by_all", Some("""
      SELECT l_returnflag, l_linestatus,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT l_returnflag, l_linestatus,
                 CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
                 CAST(COUNT(*) AS BIGINT) AS n
          FROM lineitem GROUP BY ALL ORDER BY l_returnflag, l_linestatus""")
      }),

    // LIMIT ... OFFSET pagination over a total order. Spark plans the
    // combination as a single GlobalLimit(offset+limit) with the offset
    // applied after the take — still a top-(k+offset) per partition plus
    // one final merge, never a global sort materialization. (Deep
    // pagination at 100 TB should keyset-paginate on the sort key
    // instead — the plan cost grows with offset — but the operator
    // itself is the right primitive for bounded pages.)
    QE("q124_limit_offset", Some("""
      SELECT c_custkey, c_name, c_acctbal FROM customer
      ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 20"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT c_custkey, c_name, c_acctbal FROM customer
          ORDER BY c_acctbal DESC, c_custkey LIMIT 10 OFFSET 20""")
      }),

    // UNION by column NAME across heterogeneous schemas: the supplier
    // side lists its columns in a different order and lacks `bal`;
    // unionByName(allowMissingColumns) aligns by name and null-fills.
    // Resolution is analysis-time only — the physical plan is the same
    // zero-shuffle UnionExec as a positional UNION ALL.
    QE("q125_union_by_name", Some("""
      SELECT * FROM (
        SELECT 'c' AS src, c_custkey AS id, c_name AS name, c_acctbal AS bal
        FROM customer WHERE c_custkey <= 100
        UNION ALL BY NAME
        SELECT s_name AS name, 's' AS src, s_suppkey AS id
        FROM supplier WHERE s_suppkey <= 50)
      ORDER BY src, id"""),
      (s, d) => {
        val cust = t(s, d, "customer").where(col("c_custkey") <= 100)
          .select(lit("c").as("src"), col("c_custkey").as("id"),
            col("c_name").as("name"), col("c_acctbal").as("bal"))
        val supp = t(s, d, "supplier").where(col("s_suppkey") <= 50)
          .select(col("s_name").as("name"), lit("s").as("src"),
            col("s_suppkey").as("id"))
        cust.unionByName(supp, allowMissingColumns = true)
          .orderBy("src", "id")
      }),

    // MAP columns: construct from arrays, access by key, enumerate keys.
    // The map is built and consumed inside one projection — codegen'd
    // expressions end-to-end, no shuffle. Output flattens to plain
    // columns so the oracle (which computes the same values directly)
    // compares engine-neutrally.
    QE("q126_map_functions", Some("""
      SELECT vec_id, CAST(len(embedding) AS DOUBLE) AS dim_v,
             CAST(label AS DOUBLE) AS lbl_v,
             CAST(2 AS BIGINT) AS nkeys, 'dim,lbl' AS keys
      FROM embeddings WHERE vec_id < 20 ORDER BY vec_id"""),
      (s, d) => t(s, d, "embeddings")
        .where(col("vec_id") < 20)
        .select(col("vec_id"),
          map_from_arrays(
            array(lit("dim"), lit("lbl")),
            array(size(col("embedding")).cast("double"),
              col("label").cast("double"))).as("m"))
        .select(col("vec_id"),
          element_at(col("m"), "dim").as("dim_v"),
          element_at(col("m"), "lbl").as("lbl_v"),
          size(col("m")).cast("long").as("nkeys"),
          array_join(map_keys(col("m")), ",").as("keys"))
        .orderBy("vec_id")),

    // UNPIVOT — PIVOT's (q27) inverse: wide per-nation metrics melt into
    // (metric, value) rows. Plans as a zero-shuffle Expand over the
    // aggregate (each input row fans out to |metrics| rows in place), so
    // at scale the cost is the aggregation, not the reshape.
    QE("q127_unpivot", Some("""
      SELECT n_name, metric, val FROM (
        SELECT n_name,
               CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
               CAST(COUNT(*) AS DOUBLE) AS cnt
        FROM customer JOIN nation ON c_nationkey = n_nationkey
        GROUP BY n_name)
      UNPIVOT (val FOR metric IN (bal, cnt))
      ORDER BY n_name, metric"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT n_name, metric, val FROM (
            SELECT n_name,
                   CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS bal,
                   CAST(COUNT(*) AS DOUBLE) AS cnt
            FROM customer JOIN nation ON c_nationkey = n_nationkey
            GROUP BY n_name)
          UNPIVOT (val FOR metric IN (bal, cnt))
          ORDER BY n_name, metric""")
      }),

    // VARIANT — Spark 4's semi-structured type: parse once into the
    // binary variant encoding, then typed path extraction
    // (`variant_get`) and schema inference (`schema_of_variant`), all
    // codegen'd expressions over the string column — the open-schema
    // counterpart to q67's fixed-path get_json_object. The oracle pins
    // the same values via DuckDB's JSON operators (and the inferred
    // schema/nested-path results as constants the data guarantees).
    QE("q128_variant", Some("""
      SELECT event_id, CAST(props->>'k' AS BIGINT) AS k_val,
             'OBJECT<k: BIGINT>' AS sch, CAST(2 AS INT) AS nested
      FROM events WHERE event_id < 50 ORDER BY event_id"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT event_id,
                 variant_get(parse_json(props), '$.k', 'bigint') AS k_val,
                 schema_of_variant(parse_json(props)) AS sch,
                 variant_get(parse_json('{"a":{"b":[1,2,3]}}'), '$.a.b[1]', 'int') AS nested
          FROM events WHERE event_id < 50 ORDER BY event_id""")
      }),

    // WITH RECURSIVE — Spark 4's recursive CTE (planned as UnionLoop):
    // bounded-depth reachability over the supplier co-supply graph (edges =
    // supplier pairs appearing in the same order). Each iteration is one
    // equi-join of the frontier against the edge list — the standard
    // relational BFS; the explicit depth bound keeps the UNION ALL
    // iteration finite on a cyclic graph (Spark additionally guards with
    // spark.sql.cteRecursionLevelLimit), and the outer DISTINCT collapses
    // revisits. Identical text runs in DuckDB — recursion semantics agree.
    {
      // the high-value predicate is pushed to BOTH self-join scans, cutting
      // the edge build ~3x — which matters doubly here because the UnionLoop
      // re-evaluates the edges CTE every iteration (a production deployment
      // materializes the edge list once; in single-statement SQL the filter
      // is the available lever)
      val recursiveSql = """
      WITH RECURSIVE edges AS (
        SELECT DISTINCT a.l_suppkey AS src, b.l_suppkey AS dst
        FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
        WHERE a.l_suppkey <> b.l_suppkey
          AND a.l_extendedprice > 50000 AND b.l_extendedprice > 50000),
      reach(node, depth) AS (
        SELECT CAST(1 AS BIGINT) AS node, 0 AS depth
        UNION ALL
        SELECT e.dst, r.depth + 1 FROM reach r JOIN edges e ON e.src = r.node
        WHERE r.depth < 2)
      SELECT DISTINCT node FROM reach ORDER BY node"""
      QE("q132_recursive_cte", Some(recursiveSql),
        (s, d) => { Tables.views(s, d); s.sql(recursiveSql) })
    },

    // Lateral column alias — a SELECT item referencing an alias defined
    // earlier in the SAME select list (net -> gross), resolved at analysis
    // time with the expression inlined once into the projection; no
    // subquery nesting, no recomputation. Exact decimal term, doubles only
    // at the output boundary, identical op order in DuckDB.
    QE("q133_lateral_alias", Some("""
      SELECT l_orderkey, l_linenumber,
             CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net,
             CAST(CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                  * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) * 2 AS DOUBLE) AS doubled
      FROM lineitem WHERE l_orderkey < 100
      ORDER BY l_orderkey, l_linenumber"""),
      (s, d) => {
        Tables.views(s, d)
        // the Spark text really exercises the lateral alias: `doubled` is
        // built FROM `net`, not re-derived — the oracle spells it out
        // because DuckDB inlines identically either way
        s.sql("""
          SELECT l_orderkey, l_linenumber,
                 CAST(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(12,2))) AS DOUBLE) AS net,
                 CAST(net * 2 AS DOUBLE) AS doubled
          FROM lineitem WHERE l_orderkey < 100
          ORDER BY l_orderkey, l_linenumber""")
      }),

    // IDENTIFIER() clause — templated object names without string-splicing
    // SQL (the injection-safe form of dynamic table dispatch; the
    // reference's dialect has nothing comparable). The oracle just names
    // the table directly: IDENTIFIER is pure name resolution, so results
    // must be identical.
    QE("q134_identifier_clause", Some("""
      SELECT r_regionkey, r_name FROM region ORDER BY r_regionkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("SELECT r_regionkey, r_name FROM IDENTIFIER('region') ORDER BY r_regionkey")
      }),

    // Native parameterized SQL — named parameter markers bound through the
    // session API (spark.sql(text, args)), the engine-level analog of the
    // PG-wire `$n` binding in A8 (PgParser.bind): the parameter arrives as
    // a Literal in the analyzed plan, never via string interpolation. The
    // oracle inlines the same constant.
    QE("q135_parameterized_sql", Some("""
      SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price
      FROM orders WHERE o_totalprice > 450000 ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql(
          "SELECT o_orderkey, CAST(o_totalprice AS DOUBLE) AS price " +
            "FROM orders WHERE o_totalprice > :minPrice ORDER BY o_orderkey",
          Map("minPrice" -> 450000))
      }),

    // LISTAGG ... WITHIN GROUP (SQL:2023, Spark 4.0+) — ordered string
    // aggregation. The group input is the DISTINCT (source, lang) pairs,
    // so each concat is bounded by |langs| — the construct's scale hazard
    // (an unbounded group concatenating into one driver-sized row) is
    // designed out before the aggregate. DuckDB spells the same operation
    // string_agg(x, ',' ORDER BY x); the WITHIN GROUP ordering makes the
    // result deterministic under any partitioning.
    QE("q146_listagg", Some("""
      SELECT source, string_agg(lang, ',' ORDER BY lang) AS langs
      FROM (SELECT DISTINCT source, lang FROM documents)
      GROUP BY source ORDER BY source"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT source, listagg(lang, ',') WITHIN GROUP (ORDER BY lang) AS langs
          FROM (SELECT DISTINCT source, lang FROM documents)
          GROUP BY source ORDER BY source""")
      }),

    // MODE (deterministic form) + MEDIAN aggregates (Spark 3.4/4.0). Spark's
    // mode(col, true) breaks frequency ties on the LOWEST value; DuckDB's
    // mode() leaves ties unspecified, so the oracle derives the same
    // deterministic answer from the count table with an explicit
    // (cnt DESC, value) tie-break. Median of an even-sized group is the
    // midpoint of the two middle doubles — one IEEE average of identical
    // operands on both engines, so it compares bit-exact (the inputs are
    // exact 2-decimal values). At scale both run as single-shuffle
    // aggregates on the group key; median sorts within each group's
    // partition, never globally.
    QE("q147_mode_median", Some("""
      WITH c AS (
        SELECT o_orderpriority, o_orderstatus, COUNT(*) AS cnt
        FROM orders GROUP BY 1, 2),
      r AS (
        SELECT o_orderpriority, o_orderstatus,
               row_number() OVER (PARTITION BY o_orderpriority
                                  ORDER BY cnt DESC, o_orderstatus) AS rn
        FROM c),
      med AS (
        SELECT o_orderpriority, median(o_totalprice) AS med_price
        FROM orders GROUP BY 1)
      SELECT r.o_orderpriority, o_orderstatus AS status_mode, med_price
      FROM r JOIN med USING (o_orderpriority) WHERE rn = 1
      ORDER BY o_orderpriority"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_orderpriority, mode(o_orderstatus, true) AS status_mode,
                 median(o_totalprice) AS med_price
          FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""")
      }),

    // Native XML (Spark 4.0 pulled spark-xml into core): to_xml serializes
    // a struct per row, from_xml parses it back under an explicit schema —
    // the semi-structured path q87 proves for JSON, proved here for XML.
    // The aggregate runs over the PARSED values and the oracle over the
    // original table, so any loss in the serialize→parse trip (doubles
    // print as shortest round-trippable text) breaks the hash compare.
    // Explicit schema, never inference — schema inference is a second
    // full scan at 100 TB.
    QE("q163_xml_roundtrip", Some("""
      SELECT o_orderstatus,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total,
             COUNT(*) AS n
      FROM orders WHERE o_orderkey < 2000
      GROUP BY o_orderstatus ORDER BY o_orderstatus"""),
      (s, d) => {
        val parsed = t(s, d, "orders")
          .filter(col("o_orderkey") < 2000)
          .select(to_xml(struct(col("o_orderstatus").as("st"),
            col("o_totalprice").as("tp"))).as("x"))
          .select(from_xml(col("x"),
            org.apache.spark.sql.types.StructType.fromDDL("st STRING, tp DOUBLE"),
            new java.util.HashMap[String, String]()).as("r"))
        parsed
          .groupBy(col("r.st").as("o_orderstatus"))
          .agg(graft.Q.dsum(col("r.tp")).as("total"), count(lit(1)).as("n"))
          .orderBy("o_orderstatus")
      }),

    // Error-safe TRY functions (ANSI-mode companions): try_cast returns
    // NULL for an unparseable string instead of failing the job — at
    // 100 TB one malformed row must never kill a 6-hour query — and
    // try_divide nulls a zero denominator. DuckDB spells the same
    // semantics as TRY_CAST and NULLIF-guarded division.
    QE("q164_try_functions", Some("""
      SELECT o_orderkey,
             TRY_CAST(o_orderpriority AS INT) AS pri_num,
             TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS pri_digit,
             o_totalprice / NULLIF(CAST(o_orderkey % 3 AS DOUBLE), 0) AS ratio
      FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT o_orderkey,
                 TRY_CAST(o_orderpriority AS INT) AS pri_num,
                 TRY_CAST(SUBSTRING(o_orderpriority, 1, 1) AS INT) AS pri_digit,
                 try_divide(o_totalprice, CAST(o_orderkey % 3 AS DOUBLE)) AS ratio
          FROM orders WHERE o_orderkey < 50 ORDER BY o_orderkey""")
      }),

    // Dataset.observe — the zero-cost in-flight metrics API (production
    // pipelines hang row-count / null-rate QA gates on it): the observed
    // aggregates ride the SAME pass as the query's own work as accumulator
    // updates — no second scan, no extra shuffle, any plan shape. Here the
    // observed scan is materialized and the entry RETURNS the metrics row,
    // so the oracle checks the observation values themselves.
    QE("q172_observed_metrics", Some("""
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty,
             CAST(COUNT(CASE WHEN l_discount > 0.05 THEN 1 END) AS BIGINT) AS n_discounted
      FROM lineitem"""),
      (s, d) => {
        val obs = org.apache.spark.sql.Observation("q172")
        val observed = t(s, d, "lineitem").observe(obs,
          count(lit(1)).as("n_rows"),
          graft.Q.dsum(col("l_quantity")).as("total_qty"),
          count(when(col("l_discount") > 0.05, 1)).as("n_discounted"))
        observed.foreach((_: org.apache.spark.sql.Row) => ()) // one pass, metrics as accumulators
        val m = obs.get
        val row = org.apache.spark.sql.Row(
          m("n_rows").asInstanceOf[Long],
          m("total_qty").asInstanceOf[Double],
          m("n_discounted").asInstanceOf[Long])
        s.createDataFrame(java.util.List.of(row),
          org.apache.spark.sql.types.StructType.fromDDL(
            "n_rows BIGINT, total_qty DOUBLE, n_discounted BIGINT"))
      }),

    // SQL scalar UDFs (Spark 4): business logic declared ONCE in SQL and
    // reused across queries — and unlike JVM UDFs the body is inlined
    // into the plan at analysis, so it stays inside whole-stage codegen
    // and Catalyst folds/pushes through it (a Scala UDF is an opaque
    // serialization wall). The discount function returns exact DECIMAL so
    // its aggregation is order-independent; the oracle inlines the same
    // arithmetic.
    QE("q174_sql_udf", Some(s"""
      SELECT CAST(CEIL(l_quantity / 10.0) AS INT) AS band,
             COUNT(*) AS n,
             ${Q.oSumRev("l_extendedprice", "l_discount")} AS rev
      FROM lineitem GROUP BY 1 ORDER BY 1"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_disc_price(p DOUBLE, d DOUBLE)
                 RETURNS DECIMAL(26,4)
                 RETURN CAST(p AS DECIMAL(12,2)) * (CAST(1 AS DECIMAL(12,2)) - CAST(d AS DECIMAL(12,2)))""")
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_qband(q DOUBLE)
                 RETURNS INT RETURN CAST(CEIL(q / 10.0) AS INT)""")
        s.sql("""
          SELECT graft_qband(l_quantity) AS band, COUNT(*) AS n,
                 CAST(SUM(graft_disc_price(l_extendedprice, l_discount)) AS DOUBLE) AS rev
          FROM lineitem GROUP BY 1 ORDER BY 1""")
      }),

    // SQL TABLE UDF (Spark 4): a parameterized relation in the FROM
    // clause — the reusable-subquery primitive. The generated year axis
    // LEFT JOINs the facts so empty years still report (the densify
    // pattern); the body inlines at analysis like the scalar form, so
    // the join plans exactly as if the generator were written in place.
    QE("q175_sql_table_udf", Some("""
      WITH yrs AS (SELECT CAST(r AS INT) AS yr FROM range(1995, 2002) t(r))
      SELECT yr, CAST(COUNT(o_orderkey) AS BIGINT) AS n_orders
      FROM yrs LEFT JOIN orders ON EXTRACT(YEAR FROM o_orderdate) = yr
      GROUP BY yr ORDER BY yr"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_year_axis(a INT, b INT)
                 RETURNS TABLE (yr INT)
                 RETURN SELECT explode(sequence(a, b)) AS yr""")
        s.sql("""
          SELECT yr, COUNT(o_orderkey) AS n_orders
          FROM graft_year_axis(1995, 2001)
          LEFT JOIN orders ON year(o_orderdate) = yr
          GROUP BY yr ORDER BY yr""")
      }),

    // MAP higher-order-function family — map_from_entries, map_zip_with,
    // map_filter, element_at, explode-of-map — over per-user event-type
    // stats: build count and exact-total maps per user, zip them into an
    // average map, filter to busy types (n >= 10), explode back to rows.
    // All lambdas run inside codegen (HigherOrderFunction expressions, no
    // UDF); maps are bounded by the small event-type vocabulary, so per-row
    // state is O(|types|) at any corpus size and the only shuffles are the
    // two aggregations. The oracle is the flat GROUP BY ... HAVING with the
    // identical decimal-exact division, so the entry is hash-exact.
    QE("q189_map_hof_family", Some("""
      SELECT user_id, event_type, COUNT(*) AS n,
             CAST(CAST(SUM(CAST(value AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*)
                  AS DOUBLE) AS avg_value
      FROM events GROUP BY user_id, event_type HAVING COUNT(*) >= 10
      ORDER BY user_id, event_type"""),
      (s, d) => {
        val perType = Tables.df(s, d, "events")
          .groupBy("user_id", "event_type")
          .agg(count(lit(1)).as("n"), Q.dsum(col("value")).as("tot"))
        val maps = perType.groupBy("user_id").agg(
          map_from_entries(collect_list(struct(col("event_type"), col("n"))))
            .as("cnt_map"),
          map_from_entries(collect_list(struct(col("event_type"), col("tot"))))
            .as("tot_map"))
        maps
          .withColumn("avg_map",
            map_zip_with(col("cnt_map"), col("tot_map"), (_, n, t) => t / n))
          .withColumn("busy", map_filter(col("cnt_map"), (_, v) => v >= lit(10)))
          .select(col("user_id"), explode(col("busy")).as(Seq("event_type", "n")),
            col("avg_map"))
          .withColumn("avg_value", element_at(col("avg_map"), col("event_type")))
          .select("user_id", "event_type", "n", "avg_value")
          .orderBy("user_id", "event_type")
      }),

    // parse_url component extraction (HOST / PATH / a named QUERY param) —
    // the log-analytics staple. URLs are constructed from the corpus
    // columns, so the oracle reconstructs each component directly from the
    // same columns: the check verifies the PARSER inverts the construction
    // exactly. parse_url is a codegen'd native expression (no UDF), one
    // projection pass, trivially scalable.
    QE("q196_parse_url", Some("""
      SELECT doc_id,
             source || '.example.org' AS host,
             '/docs/' || CAST(doc_id AS VARCHAR) AS path,
             lang AS qlang
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val url = concat(lit("https://"), col("source"), lit(".example.org/docs/"),
          col("doc_id").cast("string"), lit("?lang="), col("lang"), lit("&v=1"))
        Tables.df(s, d, "documents")
          .select(col("doc_id"), url.as("url"))
          .select(col("doc_id"),
            parse_url(col("url"), lit("HOST")).as("host"),
            parse_url(col("url"), lit("PATH")).as("path"),
            parse_url(col("url"), lit("QUERY"), lit("lang")).as("qlang"))
          .orderBy("doc_id")
      }),

    // XPath extraction over an XML column (xpath_string / xpath_int /
    // xpath array form) — the XML sibling of q196's URL parsing, same
    // construct-and-invert oracle: the XML is built from corpus columns,
    // so DuckDB re-derives each extracted component directly and the check
    // proves the XPath engine inverts the construction exactly. Native
    // expressions, one projection pass.
    QE("q204_xpath", Some("""
      SELECT doc_id, lang AS xlang, n_chars AS xn,
             source AS first_tag
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          WITH x AS (SELECT doc_id,
                       concat('<doc><meta><lang>', lang, '</lang><n>', n_chars,
                              '</n></meta><tags><t>', source,
                              '</t><t>extra</t></tags></doc>') AS xml
                     FROM documents)
          SELECT doc_id,
                 xpath_string(xml, '/doc/meta/lang') AS xlang,
                 CAST(xpath_long(xml, '/doc/meta/n') AS BIGINT) AS xn,
                 xpath(xml, '/doc/tags/t/text()')[0] AS first_tag
          FROM x ORDER BY doc_id""")
      }),

    // str_to_map over a delimited key-value string (the classic
    // log-attribute format) plus map_keys / element_at access — built
    // from corpus columns, inverted by the oracle. One projection pass,
    // map size bounded by the attribute count.
    QE("q205_str_to_map", Some("""
      SELECT doc_id, lang AS m_lang, source AS m_src,
             CAST(n_chars AS VARCHAR) AS m_len, 3 AS n_keys
      FROM documents ORDER BY doc_id"""),
      (s, d) => {
        val kv = concat(lit("lang="), col("lang"), lit(";src="), col("source"),
          lit(";len="), col("n_chars").cast("string"))
        Tables.df(s, d, "documents")
          .select(col("doc_id"), str_to_map(kv, lit(";"), lit("=")).as("m"))
          .select(col("doc_id"),
            element_at(col("m"), "lang").as("m_lang"),
            element_at(col("m"), "src").as("m_src"),
            element_at(col("m"), "len").as("m_len"),
            size(map_keys(col("m"))).as("n_keys"))
          .orderBy("doc_id")
      }),

    // IGNORE NULLS window navigation — last non-null carried forward (the
    // telemetry gap-fill idiom): high readings (value > 50) propagate to
    // the rows after them within each user's event-time order. Values pass
    // through unchanged, so the fill is hash-exact across engines.
    QE("q206_ignore_nulls_window", Some("""
      WITH o AS (SELECT user_id, event_id, ts,
                   CASE WHEN value > 50 THEN value END AS hi
                 FROM events)
      SELECT user_id, event_id,
             LAST_VALUE(hi IGNORE NULLS) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_high
      FROM o ORDER BY user_id, event_id"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          WITH o AS (SELECT user_id, event_id, ts,
                       CASE WHEN value > 50 THEN value END AS hi
                     FROM events)
          SELECT user_id, event_id,
                 LAST_VALUE(hi) IGNORE NULLS OVER (
                   PARTITION BY user_id ORDER BY ts, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS last_high
          FROM o ORDER BY user_id, event_id""")
      }),

    // SQL SESSION VARIABLES (Spark 4 DECLARE/SET VAR): a typed server-side
    // variable referenced directly in query text — the parameterization
    // mechanism for SQL-only clients (no bind protocol needed; q84 covers
    // wire-level $n binds). The variable folds to a literal at plan time,
    // so the filter still pushes down to the scan. Oracle: the same query
    // with the value inlined.
    QE("q221_session_variables", Some("""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 450000.0 ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("DECLARE OR REPLACE VARIABLE price_floor DOUBLE DEFAULT 0.0")
        s.sql("SET VAR price_floor = 450000.0")
        s.sql("""SELECT o_orderkey, o_totalprice FROM orders
                 WHERE o_totalprice > price_floor ORDER BY o_orderkey""")
      }))
}
