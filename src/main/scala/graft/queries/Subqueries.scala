package graft.queries

import graft.{Q, QE, Tables}

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Subqueries, CTEs, inline VALUES, TVFs, lateral/explode, JSON and
  * complex-type access (reference sites AstBuilder.scala:192-214,916-936,
  * 1068-1113,1337-1350,1780-1793). Catalyst decorrelates the subqueries into
  * joins — the plan must show a join, not a per-row subquery execution.
  */
object Subqueries {
  private def t(s: SparkSession, d: String, n: String): DataFrame = Tables.df(s, d, n)

  val entries: Seq[QE] = Seq(
    // stack(): the n-way row generator beyond explode/posexplode (q66/q76)
    // — unpivots K constant-labeled expressions per input row without
    // building an intermediate array. The oracle spells it as the UNION
    // ALL it replaces; the Spark plan is ONE Generate over one scan.
    QE("q186_stack_generator", Some("""
      SELECT * FROM (
        SELECT s_suppkey, 'lo' AS band, CAST(floor(s_acctbal) AS DOUBLE) AS v FROM supplier
        UNION ALL
        SELECT s_suppkey, 'hi' AS band, CAST(ceil(s_acctbal) AS DOUBLE) AS v FROM supplier)
      ORDER BY s_suppkey, band"""),
      (s, d) =>
        t(s, d, "supplier")
          .selectExpr("s_suppkey",
            "stack(2, 'lo', CAST(floor(s_acctbal) AS DOUBLE), 'hi', CAST(ceil(s_acctbal) AS DOUBLE)) AS (band, v)")
          .orderBy("s_suppkey", "band")),

    // IN (subquery) — planned as left-semi join after rewrite.
    QE("q60_in_subquery", Some("""
      SELECT o_orderkey, o_custkey FROM orders
      WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
        AND o_totalprice > 350000
      ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT o_orderkey, o_custkey FROM orders
                 WHERE o_custkey IN (SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING')
                   AND o_totalprice > 350000
                 ORDER BY o_orderkey""")
      }),

    // Correlated EXISTS with an extra correlated predicate.
    QE("q61_exists_correlated", Some("""
      SELECT c_custkey FROM customer c
      WHERE EXISTS (SELECT 1 FROM orders o
                    WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 2 * c.c_acctbal
                      AND c.c_acctbal > 0)
      ORDER BY c_custkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""SELECT c_custkey FROM customer c
                 WHERE EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 2 * c.c_acctbal
                                 AND c.c_acctbal > 0)
                 ORDER BY c_custkey""")
      }),

    // Scalar subquery (decimal-exact global average so the comparison is
    // engine-deterministic).
    QE("q62_scalar_subquery", Some(s"""
      SELECT o_orderkey, o_totalprice FROM orders
      WHERE o_totalprice > 1.8 * (SELECT ${Q.oAvg("o_totalprice")} FROM orders)
      ORDER BY o_orderkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql(s"""SELECT o_orderkey, o_totalprice FROM orders
                  WHERE o_totalprice > 1.8 * (SELECT CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(o_totalprice) AS DOUBLE) FROM orders)
                  ORDER BY o_orderkey""")
      }),

    // WITH (CTE) reused twice in the main query.
    QE("q63_cte", Some(s"""
      WITH big AS (SELECT o_custkey, ${Q.oSum("o_totalprice")} AS spend
                   FROM orders GROUP BY o_custkey)
      SELECT c_custkey, spend FROM customer JOIN big ON c_custkey = o_custkey
      WHERE spend > (SELECT ${Q.oAvg("spend")} FROM big)
      ORDER BY c_custkey"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql(s"""WITH big AS (SELECT o_custkey, ${Q.oSum("o_totalprice")} AS spend
                               FROM orders GROUP BY o_custkey)
                  SELECT c_custkey, spend FROM customer JOIN big ON c_custkey = o_custkey
                  WHERE spend > (SELECT ${Q.oAvg("spend")} FROM big)
                  ORDER BY c_custkey""")
      }),

    // Inline VALUES relation joined against a real table.
    QE("q64_values_inline", Some("""
      SELECT v.tier, COUNT(*) AS n
      FROM (VALUES ('F', 'finished'), ('O', 'open'), ('P', 'pending')) AS v(st, tier)
      JOIN orders ON o_orderstatus = v.st
      GROUP BY v.tier ORDER BY v.tier"""),
      (s, d) => {
        import s.implicits._
        val v = Seq(("F", "finished"), ("O", "open"), ("P", "pending")).toDF("st", "tier")
        t(s, d, "orders").join(broadcast(v), col("o_orderstatus") === col("st"))
          .groupBy("tier").agg(count(lit(1)).as("n"))
          .orderBy("tier")
      }),

    // range TVF (spark.range <-> DuckDB range).
    QE("q65_range_tvf", Some("""
      SELECT range AS id, range * 3 AS tripled FROM range(0, 1000) WHERE range % 7 = 0
      ORDER BY id"""),
      (s, d) => s.range(0, 1000)
        .filter(col("id") % 7 === 0)
        .select(col("id"), (col("id") * 3).as("tripled"))
        .orderBy("id")),

    // posexplode / LATERAL VIEW over the embedding arrays.
    QE("q66_lateral_explode", Some("""
      SELECT vec_id, CAST(generate_subscripts(embedding, 1) - 1 AS INT) AS pos,
             CAST(unnest(embedding) AS DOUBLE) AS v
      FROM embeddings WHERE vec_id < 8
      ORDER BY vec_id, pos"""),
      (s, d) => t(s, d, "embeddings")
        .filter(col("vec_id") < 8)
        .select(col("vec_id"), posexplode(col("embedding")).as(Seq("pos", "v")))
        .select(col("vec_id"), col("pos"), col("v").cast(DoubleType).as("v"))
        .orderBy("vec_id", "pos")),

    // JSON field extraction from the events.props string column.
    QE("q67_json_props", Some("""
      SELECT event_id, CAST(regexp_extract(props, '"k": (\d+)', 1) AS INT) AS k
      FROM events WHERE event_id < 500 ORDER BY event_id"""),
      (s, d) => t(s, d, "events")
        .filter(col("event_id") < 500)
        .select(col("event_id"),
          from_json(col("props"), StructType(Seq(StructField("k", IntegerType))))
            .getField("k").as("k"))
        .orderBy("event_id")),

    // Higher-order functions: lambda fold for the vector self-dot-product.
    // Both engines fold left-to-right over identical element products, so the
    // double result is bit-identical.
    QE("q71_higher_order", Some("""
      SELECT vec_id,
             list_reduce(list_transform(generate_series(1, len(embedding)),
                                        i -> CAST(embedding[i] AS DOUBLE) * CAST(embedding[i] AS DOUBLE)),
                         (x, y) -> x + y) AS norm2,
             CAST(len(list_filter(embedding, x -> x > 0)) AS INT) AS n_pos
      FROM embeddings WHERE vec_id < 200 ORDER BY vec_id"""),
      (s, d) => t(s, d, "embeddings")
        .filter(col("vec_id") < 200)
        .select(col("vec_id"),
          aggregate(transform(col("embedding"), x => x.cast(DoubleType) * x.cast(DoubleType)),
            lit(0.0), (acc, v) => acc + v).as("norm2"),
          size(filter(col("embedding"), x => x > 0)).as("n_pos"))
        .orderBy("vec_id")),

    // Array functions + subscript access (1-based element_at).
    QE("q72_array_funcs", Some("""
      SELECT vec_id, CAST(len(embedding) AS INT) AS dim,
             CAST(embedding[1] AS DOUBLE) AS first_elem,
             CAST(embedding[len(embedding)] AS DOUBLE) AS last_elem
      FROM embeddings WHERE vec_id < 50 ORDER BY vec_id"""),
      (s, d) => t(s, d, "embeddings")
        .filter(col("vec_id") < 50)
        .select(col("vec_id"), size(col("embedding")).as("dim"),
          element_at(col("embedding"), 1).cast(DoubleType).as("first_elem"),
          element_at(col("embedding"), size(col("embedding"))).cast(DoubleType).as("last_elem"))
        .orderBy("vec_id")),

    // Struct construction + field dereference (s.f path).
    QE("q73_struct_access", Some("""
      SELECT n_nationkey, n_name AS nm, CAST(n_regionkey AS INT) AS rk
      FROM nation ORDER BY n_nationkey"""),
      (s, d) => t(s, d, "nation")
        .select(col("n_nationkey"),
          struct(col("n_name").as("nm"), col("n_regionkey").as("rk")).as("info"))
        .select(col("n_nationkey"),
          col("info").getField("nm").as("nm"),
          col("info").getField("rk").as("rk"))
        .orderBy("n_nationkey")),

    // Schema'd JSON column parsing (from_json) WITH corrupt-record
    // handling: a seventh of the rows get a deliberately malformed payload
    // — PERMISSIVE mode yields a NULL struct for those instead of failing
    // the job (the only survivable posture when 100 TB of logs contain
    // bad records), and the entry counts parsed vs corrupt per type.
    // q67 covers path extraction; this is the typed-schema parse.
    QE("q236_from_json_corrupt", Some("""
      WITH j AS (SELECT event_type,
                   CASE WHEN event_id % 7 = 0 THEN NULL
                        ELSE CAST(json_extract(props, '$.k') AS INT) END AS k,
                   CASE WHEN event_id % 7 = 0 THEN 1 ELSE 0 END AS corrupt
                 FROM events)
      SELECT event_type,
             COUNT(k) AS n_parsed,
             CAST(SUM(corrupt) AS BIGINT) AS n_corrupt,
             CAST(SUM(k) AS BIGINT) AS k_total
      FROM j GROUP BY event_type ORDER BY event_type"""),
      (s, d) =>
        t(s, d, "events")
          .withColumn("jraw",
            // corrupt PREFIX: Jackson tolerates trailing garbage, so a
            // broken head is what actually makes the parse fail
            when(col("event_id") % 7 === 0, substring(col("props"), 2, 1000000))
              .otherwise(col("props")))
          .withColumn("p", from_json(col("jraw"),
            StructType(Seq(StructField("k", IntegerType)))))
          .groupBy("event_type")
          // PERMISSIVE returns a struct with NULL FIELDS for a corrupt
          // record (the struct itself stays non-null since Spark 3)
          .agg(count(col("p.k")).as("n_parsed"),
            count(when(col("p.k").isNull, 1)).as("n_corrupt"),
            sum(col("p.k")).as("k_total"))
          .orderBy("event_type")),

    // Array surface II beyond q72's indexing: distinct-count, position
    // (Spark returns 0 for absent where DuckDB returns NULL — coalesced to
    // agree), membership, and a sorted slice render. All codegen'd array
    // expressions over the token split — no explode, no shuffle.
    QE("q233_array_funcs2", Some("""
      WITH tk AS (SELECT doc_id, str_split(text, ' ') AS ts FROM documents)
      SELECT doc_id,
             CAST(len(list_distinct(ts)) AS INT) AS n_unique,
             CAST(coalesce(list_position(ts, 'the'), 0) AS INT) AS pos_the,
             list_contains(ts, 'data') AS has_data,
             array_to_string(list_sort(ts[1:5]), ' ') AS first5_sorted
      FROM tk ORDER BY doc_id"""),
      (s, d) =>
        t(s, d, "documents")
          .withColumn("ts", split(col("text"), " "))
          .select(col("doc_id"),
            size(array_distinct(col("ts"))).as("n_unique"),
            array_position(col("ts"), "the").cast(IntegerType).as("pos_the"),
            array_contains(col("ts"), "data").as("has_data"),
            concat_ws(" ", sort_array(slice(col("ts"), 1, 5))).as("first5_sorted"))
          .orderBy("doc_id")),

    // NOT IN three-valued-logic trap: one NULL in the subquery makes the
    // whole NOT IN unknowable, so the poisoned variant must return ZERO
    // rows (the classic silent-wrong-answer bug when an engine compiles
    // NOT IN as a plain anti join); the clean variant is the real
    // null-aware anti join with actual survivors. Both variants in one
    // result so the contrast itself is what gets hash-checked.
    QE("q226_not_in_nulls", Some("""
      SELECT 'clean' AS variant, COUNT(*) AS n FROM customer
      WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                              WHERE o_totalprice <= 400000)
      UNION ALL
      SELECT 'poisoned', COUNT(*) FROM customer
      WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 400000
                                       THEN CAST(NULL AS BIGINT)
                                       ELSE o_custkey END
                              FROM orders)
      ORDER BY variant"""),
      (s, d) => {
        Tables.views(s, d)
        s.sql("""
          SELECT 'clean' AS variant, COUNT(*) AS n FROM customer
          WHERE c_custkey NOT IN (SELECT o_custkey FROM orders
                                  WHERE o_totalprice <= 400000)
          UNION ALL
          SELECT 'poisoned', COUNT(*) FROM customer
          WHERE c_custkey NOT IN (SELECT CASE WHEN o_totalprice > 400000
                                           THEN CAST(NULL AS BIGINT)
                                           ELSE o_custkey END
                                  FROM orders)
          ORDER BY variant""")
      }))
}
