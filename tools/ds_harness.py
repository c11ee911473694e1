#!/usr/bin/env python3
"""Authoring harness for the official-text TPC-DS battery: assembles the
derived star-schema CTE prefix + official query bodies, runs them in DuckDB
at all three SFs, prints row counts (rows>0 required everywhere).

Run: python3 tools/ds_harness.py [names...] — validate every battery text
in DuckDB BEFORE any Scala exists; src/main/scala/graft/queries/
DsOfficial.scala is generated from PREFIX/Q. Keep the two in sync."""
import duckdb, sys

PREFIX = """WITH date_dim AS (
  SELECT d_date AS d_date_sk, d_date,
         CAST(EXTRACT(YEAR FROM d_date) AS INT) AS d_year,
         CAST(EXTRACT(MONTH FROM d_date) AS INT) AS d_moy,
         CAST(EXTRACT(DAY FROM d_date) AS INT) AS d_dom,
         CAST(EXTRACT(QUARTER FROM d_date) AS INT) AS d_qoy,
         CAST((EXTRACT(DAY FROM d_date) + EXTRACT(MONTH FROM d_date) + EXTRACT(YEAR FROM d_date)) % 7 AS INT) AS d_dow,
         CASE CAST((EXTRACT(DAY FROM d_date) + EXTRACT(MONTH FROM d_date) + EXTRACT(YEAR FROM d_date)) % 7 AS INT)
           WHEN 0 THEN 'Sunday' WHEN 1 THEN 'Monday' WHEN 2 THEN 'Tuesday'
           WHEN 3 THEN 'Wednesday' WHEN 4 THEN 'Thursday' WHEN 5 THEN 'Friday'
           ELSE 'Saturday' END AS d_day_name,
         CAST((EXTRACT(YEAR FROM d_date) - 1990) * 12 + EXTRACT(MONTH FROM d_date) - 1 AS INT) AS d_month_seq
  FROM (SELECT DISTINCT CAST(l_shipdate AS DATE) AS d_date FROM main.lineitem) dd
),
item AS (
  SELECT p_partkey AS i_item_sk,
         p_name AS i_item_id,
         p_name AS i_item_desc,
         CAST(SUBSTRING(p_brand FROM 7) AS INT) AS i_brand_id,
         p_brand AS i_brand,
         CAST(p_partkey % 10 AS INT) AS i_category_id,
         CASE CAST(p_partkey % 10 AS INT) WHEN 0 THEN 'Books' WHEN 1 THEN 'Home'
           WHEN 2 THEN 'Electronics' WHEN 3 THEN 'Jewelry' WHEN 4 THEN 'Men'
           WHEN 5 THEN 'Music' WHEN 6 THEN 'Shoes' WHEN 7 THEN 'Sports'
           WHEN 8 THEN 'Children' ELSE 'Women' END AS i_category,
         CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'computers' WHEN 1 THEN 'stereo'
           WHEN 2 THEN 'football' WHEN 3 THEN 'shirts' ELSE 'dresses' END AS i_class,
         CAST(p_partkey % 50 AS INT) AS i_manufact_id,
         'mfg#' || CAST(CAST(p_partkey % 50 AS INT) AS VARCHAR(8)) AS i_manufact,
         CAST(p_partkey % 10 AS INT) AS i_manager_id,
         CAST(ROUND(p_retailprice * 100) AS BIGINT) AS i_current_price,
         CAST(FLOOR(ROUND(p_retailprice * 100) * 0.6) AS BIGINT) AS i_wholesale_cost,
         CASE CAST(p_partkey % 9 AS INT) WHEN 0 THEN 'slate' WHEN 1 THEN 'blanched'
           WHEN 2 THEN 'burnished' WHEN 3 THEN 'peach' WHEN 4 THEN 'khaki'
           WHEN 5 THEN 'orchid' WHEN 6 THEN 'salmon' WHEN 7 THEN 'sienna'
           ELSE 'navajo' END AS i_color
  FROM main.part
),
customer AS (
  SELECT c_custkey AS c_customer_sk,
         c_name AS c_customer_id,
         c_custkey AS c_current_addr_sk,
         c_custkey AS c_current_cdemo_sk,
         c_custkey AS c_current_hdemo_sk,
         c_name AS c_first_name,
         CAST(c_custkey % 12 + 1 AS INT) AS c_birth_month,
         CAST(1930 + c_custkey % 60 AS INT) AS c_birth_year,
         'LAST_' || CAST(CAST(c_custkey % 97 AS INT) AS VARCHAR(8)) AS c_last_name,
         CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Mr.' WHEN 1 THEN 'Mrs.'
           WHEN 2 THEN 'Ms.' ELSE 'Dr.' END AS c_salutation,
         CASE CAST(c_custkey % 2 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS c_preferred_cust_flag
  FROM main.customer
),
customer_address AS (
  SELECT c_custkey AS ca_address_sk,
         CASE CAST(c_custkey % 10 AS INT) WHEN 0 THEN 'Midway' WHEN 1 THEN 'Fairview'
           WHEN 2 THEN 'Oakland' WHEN 3 THEN 'Springfield' WHEN 4 THEN 'Georgetown'
           WHEN 5 THEN 'Greenville' WHEN 6 THEN 'Ashland' WHEN 7 THEN 'Centerville'
           WHEN 8 THEN 'Salem' ELSE 'Clinton' END AS ca_city,
         CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Williamson County'
           WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Bronx County'
           ELSE 'Orange County' END AS ca_county,
         CASE CAST(c_custkey % 8 AS INT) WHEN 0 THEN 'TN' WHEN 1 THEN 'SD' WHEN 2 THEN 'AL'
           WHEN 3 THEN 'GA' WHEN 4 THEN 'MI' WHEN 5 THEN 'NJ' WHEN 6 THEN 'TX'
           ELSE 'VA' END AS ca_state,
         CAST(CAST(10000 + c_custkey % 90 AS INT) AS VARCHAR(8)) AS ca_zip,
         CAST(CASE CAST(c_custkey % 2 AS INT) WHEN 0 THEN -5 ELSE -6 END AS INT) AS ca_gmt_offset,
         'United States' AS ca_country,
         CAST(CAST(100 + c_custkey % 900 AS INT) AS VARCHAR(8)) AS ca_street_number,
         CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN 'Main' WHEN 1 THEN 'Oak'
           WHEN 2 THEN 'Elm' WHEN 3 THEN 'Park' ELSE 'Lake' END AS ca_street_name,
         CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'St' WHEN 1 THEN 'Ave' ELSE 'Blvd' END AS ca_street_type,
         'Suite ' || CAST(CAST(c_custkey % 20 AS INT) AS VARCHAR(8)) AS ca_suite_number,
         CASE CAST(c_custkey % 3 AS INT) WHEN 0 THEN 'apartment' WHEN 1 THEN 'condo'
           ELSE 'single family' END AS ca_location_type
  FROM main.customer
),
household_demographics AS (
  SELECT c_custkey AS hd_demo_sk,
         CASE CAST(c_custkey % 6 AS INT) WHEN 0 THEN '>10000' WHEN 1 THEN 'Unknown'
           WHEN 2 THEN '5001-10000' WHEN 3 THEN '1001-5000' WHEN 4 THEN '501-1000'
           ELSE '0-500' END AS hd_buy_potential,
         CAST(c_custkey % 10 AS INT) AS hd_dep_count,
         CAST(c_custkey % 5 AS INT) AS hd_vehicle_count
  FROM main.customer
),
customer_demographics AS (
  SELECT c_custkey AS cd_demo_sk,
         CASE CAST(c_custkey % 2 AS INT) WHEN 0 THEN 'M' ELSE 'F' END AS cd_gender,
         CASE CAST(c_custkey % 5 AS INT) WHEN 0 THEN 'M' WHEN 1 THEN 'S' WHEN 2 THEN 'D'
           WHEN 3 THEN 'W' ELSE 'U' END AS cd_marital_status,
         CASE CAST(c_custkey % 7 AS INT) WHEN 0 THEN 'Primary' WHEN 1 THEN 'Secondary'
           WHEN 2 THEN 'College' WHEN 3 THEN '2 yr Degree' WHEN 4 THEN '4 yr Degree'
           WHEN 5 THEN 'Advanced Degree' ELSE 'Unknown' END AS cd_education_status,
         CAST(c_custkey % 10 AS INT) AS cd_dep_count,
         CAST((c_custkey % 20 + 1) * 500 AS INT) AS cd_purchase_estimate,
         CASE CAST(c_custkey % 4 AS INT) WHEN 0 THEN 'Low Risk' WHEN 1 THEN 'Good'
           WHEN 2 THEN 'High Risk' ELSE 'Unknown' END AS cd_credit_rating
  FROM main.customer
),
store AS (
  SELECT s_suppkey AS s_store_sk,
         'STORE_' || CAST(CAST(s_suppkey AS INT) AS VARCHAR(8)) AS s_store_id,
         CASE CAST(s_suppkey % 5 AS INT) WHEN 0 THEN 'ought' WHEN 1 THEN 'able'
           WHEN 2 THEN 'pri' WHEN 3 THEN 'ese' ELSE 'anti' END AS s_store_name,
         CASE CAST(s_suppkey % 3 AS INT) WHEN 0 THEN 'TN' WHEN 1 THEN 'SD' ELSE 'AL' END AS s_state,
         CASE CAST(s_suppkey % 4 AS INT) WHEN 0 THEN 'Williamson County'
           WHEN 1 THEN 'Franklin Parish' WHEN 2 THEN 'Bronx County'
           ELSE 'Orange County' END AS s_county,
         CASE CAST(s_suppkey % 6 AS INT) WHEN 0 THEN 'Midway' WHEN 1 THEN 'Fairview'
           WHEN 2 THEN 'Oakland' WHEN 3 THEN 'Springfield' WHEN 4 THEN 'Georgetown'
           ELSE 'Greenville' END AS s_city,
         CAST(CAST(10000 + s_suppkey % 90 AS INT) AS VARCHAR(8)) AS s_zip,
         CAST(200 + s_suppkey % 100 AS INT) AS s_number_employees,
         CASE CAST(s_suppkey % 2 AS INT) WHEN 0 THEN 'Unknown' ELSE 'Mid Atlantic' END AS s_company_name,
         CAST(-5 - s_suppkey % 3 AS INT) AS s_gmt_offset
  FROM main.supplier
),
time_dim AS (
  SELECT t_time_sk,
         CAST(FLOOR(t_time_sk * 1.0 / 60) AS INT) AS t_hour,
         CAST(t_time_sk % 60 AS INT) AS t_minute,
         CASE WHEN CAST(FLOOR(t_time_sk * 1.0 / 60) AS INT) BETWEEN 6 AND 8 THEN 'breakfast'
              WHEN CAST(FLOOR(t_time_sk * 1.0 / 60) AS INT) BETWEEN 17 AND 19 THEN 'dinner'
              ELSE NULL END AS t_meal_time
  FROM (SELECT DISTINCT CAST((l_orderkey * 3 + l_linenumber) % 1440 AS INT) AS t_time_sk
        FROM main.lineitem) tt
),
promotion AS (
  SELECT p_partkey AS p_promo_sk,
         CASE CAST(p_partkey % 13 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_email,
         CASE CAST(p_partkey % 3 AS INT) WHEN 0 THEN 'N' ELSE 'Y' END AS p_channel_event,
         CASE CAST(p_partkey % 5 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_dmail,
         CASE CAST(p_partkey % 7 AS INT) WHEN 0 THEN 'Y' ELSE 'N' END AS p_channel_tv
  FROM main.part
),
base_sales AS (
  SELECT CAST(l_shipdate AS DATE) AS sold_date_sk,
         CAST((l_orderkey * 3 + l_linenumber) % 1440 AS INT) AS sold_time_sk,
         l_partkey AS item_sk,
         o_custkey AS customer_sk,
         CAST((o_custkey * 3 + l_orderkey * 5) % cc.c_cnt AS BIGINT) AS addr_sk,
         l_suppkey AS store_sk,
         l_orderkey AS ticket_number,
         CAST(l_quantity AS INT) AS quantity,
         CAST(ROUND(l_extendedprice * 100) AS BIGINT) AS ext_cents,
         CAST((l_orderkey * 7 + l_linenumber * 3) % 5000 AS BIGINT) AS coupon_cents,
         CAST((l_orderkey * 17 + l_linenumber * 9) % 8000 AS BIGINT) AS discount_cents,
         CAST((l_orderkey * 11 + l_linenumber * 5) % 10000 AS BIGINT) AS tax_cents,
         CAST((l_orderkey * 13 + l_linenumber * 7) % 4 AS INT) AS channel,
         l_returnflag AS returnflag
  FROM main.lineitem JOIN main.orders ON l_orderkey = o_orderkey
  CROSS JOIN (SELECT COUNT(*) AS c_cnt FROM main.customer) cc
),
store_sales AS (
  SELECT sold_date_sk AS ss_sold_date_sk, sold_time_sk AS ss_sold_time_sk,
         item_sk AS ss_item_sk, customer_sk AS ss_customer_sk,
         customer_sk AS ss_cdemo_sk, customer_sk AS ss_hdemo_sk,
         addr_sk AS ss_addr_sk, store_sk AS ss_store_sk,
         item_sk AS ss_promo_sk, ticket_number AS ss_ticket_number,
         quantity AS ss_quantity,
         ext_cents AS ss_ext_sales_price,
         ext_cents + coupon_cents AS ss_ext_list_price,
         CAST(FLOOR(ext_cents * 1.0 / CASE WHEN quantity = 0 THEN 1 ELSE quantity END) AS BIGINT) AS ss_sales_price,
         CAST(FLOOR((ext_cents + coupon_cents) * 1.0 / CASE WHEN quantity = 0 THEN 1 ELSE quantity END) AS BIGINT) AS ss_list_price,
         coupon_cents AS ss_coupon_amt,
         discount_cents AS ss_ext_discount_amt,
         tax_cents AS ss_ext_tax,
         ext_cents - coupon_cents AS ss_net_paid,
         ext_cents - coupon_cents + tax_cents AS ss_net_paid_inc_tax,
         CAST(FLOOR(ext_cents * 0.8) AS BIGINT) AS ss_ext_wholesale_cost,
         ext_cents - coupon_cents - CAST(FLOOR(ext_cents * 0.8) AS BIGINT) AS ss_net_profit
  FROM base_sales WHERE channel <= 1
),
catalog_sales AS (
  SELECT sold_date_sk AS cs_sold_date_sk, item_sk AS cs_item_sk,
         customer_sk AS cs_bill_customer_sk, addr_sk AS cs_bill_addr_sk,
         customer_sk AS cs_bill_cdemo_sk,
         item_sk AS cs_promo_sk,
         sold_time_sk AS cs_sold_time_sk,
         discount_cents AS cs_ext_discount_amt,
         ext_cents AS cs_ext_sales_price,
         quantity AS cs_quantity,
         CAST(FLOOR(ext_cents * 1.0 / CASE WHEN quantity = 0 THEN 1 ELSE quantity END) AS BIGINT) AS cs_sales_price,
         CAST(FLOOR((ext_cents + coupon_cents) * 1.0 / CASE WHEN quantity = 0 THEN 1 ELSE quantity END) AS BIGINT) AS cs_list_price,
         coupon_cents AS cs_coupon_amt,
         ext_cents - coupon_cents - CAST(FLOOR(ext_cents * 0.8) AS BIGINT) AS cs_net_profit
  FROM base_sales WHERE channel = 2
),
web_sales AS (
  SELECT sold_date_sk AS ws_sold_date_sk, item_sk AS ws_item_sk,
         customer_sk AS ws_bill_customer_sk, addr_sk AS ws_bill_addr_sk,
         ext_cents AS ws_ext_sales_price,
         sold_time_sk AS ws_sold_time_sk,
         discount_cents AS ws_ext_discount_amt,
         CAST(FLOOR(ext_cents * 1.0 / CASE WHEN quantity = 0 THEN 1 ELSE quantity END) AS BIGINT) AS ws_sales_price
  FROM base_sales WHERE channel = 3
),
catalog_returns AS (
  SELECT sold_date_sk AS cr_returned_date_sk, item_sk AS cr_item_sk,
         customer_sk AS cr_returning_customer_sk,
         addr_sk AS cr_returning_addr_sk,
         ext_cents + tax_cents AS cr_return_amt_inc_tax
  FROM base_sales WHERE channel = 2 AND returnflag = 'R'
),
store_returns AS (
  SELECT sold_date_sk AS sr_returned_date_sk, item_sk AS sr_item_sk,
         customer_sk AS sr_customer_sk, store_sk AS sr_store_sk,
         ticket_number AS sr_ticket_number,
         CAST(ticket_number % 25 AS BIGINT) AS sr_reason_sk,
         quantity AS sr_return_quantity,
         ext_cents AS sr_return_amt,
         CAST(FLOOR(ext_cents * 0.3) AS BIGINT) AS sr_net_loss
  FROM base_sales WHERE returnflag = 'R'
),
reason AS (
  SELECT n_nationkey AS r_reason_sk,
         'reason ' || CAST(CAST(n_nationkey AS INT) AS VARCHAR(8)) AS r_reason_desc
  FROM main.nation
)"""

Q = {}

Q['ds_q1'] = """,
customer_total_return AS (
  SELECT sr_customer_sk AS ctr_customer_sk, sr_store_sk AS ctr_store_sk,
         CAST(SUM(sr_return_amt) AS BIGINT) AS ctr_total_return
  FROM store_returns, date_dim
  WHERE sr_returned_date_sk = d_date_sk AND d_year = 2000
  GROUP BY sr_customer_sk, sr_store_sk)
SELECT c_customer_id
FROM customer_total_return ctr1, store, customer
WHERE ctr1.ctr_total_return > (SELECT AVG(ctr_total_return) * 1.2
                               FROM customer_total_return ctr2
                               WHERE ctr1.ctr_store_sk = ctr2.ctr_store_sk)
  AND s_store_sk = ctr1.ctr_store_sk
  AND s_state = 'TN'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id
LIMIT 100"""

Q['ds_q3'] = """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS sum_agg
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manufact_id = 28
  AND dt.d_moy = 11
GROUP BY dt.d_year, item.i_brand_id, item.i_brand
ORDER BY dt.d_year, sum_agg DESC, brand_id
LIMIT 100"""

Q['ds_q6'] = """
SELECT a.ca_state AS state, COUNT(*) AS cnt
FROM customer_address a, customer c, store_sales s, date_dim d, item i
WHERE a.ca_address_sk = c.c_current_addr_sk
  AND c.c_customer_sk = s.ss_customer_sk
  AND s.ss_sold_date_sk = d.d_date_sk
  AND s.ss_item_sk = i.i_item_sk
  AND d.d_month_seq = (SELECT DISTINCT (d_month_seq) FROM date_dim
                       WHERE d_year = 2001 AND d_moy = 1)
  AND i.i_current_price > 1.0001 * (SELECT AVG(j.i_current_price) FROM item j
                                 WHERE j.i_category = i.i_category)
GROUP BY a.ca_state
HAVING COUNT(*) >= 1
ORDER BY cnt, a.ca_state
LIMIT 100"""

Q['ds_q7'] = """
SELECT i_item_id,
       AVG(ss_quantity) AS agg1, AVG(ss_list_price) AS agg2,
       AVG(ss_coupon_amt) AS agg3, AVG(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, item, promotion
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_cdemo_sk = cd_demo_sk AND ss_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""

Q['ds_q19'] = """
SELECT i_brand_id AS brand_id, i_brand AS brand, i_manufact_id, i_manufact,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS ext_price
FROM date_dim, store_sales, item, customer, customer_address, store
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1998
  AND ss_customer_sk = c_customer_sk AND c_current_addr_sk = ca_address_sk
  AND SUBSTR(ca_zip, 1, 5) <> SUBSTR(s_zip, 1, 5) AND ss_store_sk = s_store_sk
GROUP BY i_brand, i_brand_id, i_manufact_id, i_manufact
ORDER BY ext_price DESC, i_brand, i_brand_id, i_manufact_id, i_manufact
LIMIT 100"""

Q['ds_q27'] = """
SELECT i_item_id, s_state, CAST(GROUPING(s_state) AS INT) AS g_state,
       AVG(ss_quantity) AS agg1, AVG(ss_list_price) AS agg2,
       AVG(ss_coupon_amt) AS agg3, AVG(ss_sales_price) AS agg4
FROM store_sales, customer_demographics, date_dim, store, item
WHERE ss_sold_date_sk = d_date_sk AND ss_item_sk = i_item_sk
  AND ss_store_sk = s_store_sk AND ss_cdemo_sk = cd_demo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND d_year = 2000 AND s_state IN ('TN', 'SD', 'AL')
GROUP BY ROLLUP (i_item_id, s_state)
ORDER BY i_item_id NULLS FIRST, s_state NULLS FIRST
LIMIT 100"""

Q['ds_q33'] = """,
ss AS (
  SELECT i_manufact_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category IN ('Electronics'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
cs AS (
  SELECT i_manufact_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category IN ('Electronics'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id),
ws AS (
  SELECT i_manufact_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_manufact_id IN (SELECT i_manufact_id FROM item WHERE i_category IN ('Electronics'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 5
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_manufact_id)
SELECT i_manufact_id, CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_manufact_id
ORDER BY total_sales, i_manufact_id
LIMIT 100"""

Q['ds_q36'] = """
SELECT CAST(SUM(ss_net_profit) AS DOUBLE) / CAST(SUM(ss_ext_sales_price) AS DOUBLE) AS gross_margin,
       i_category, i_class,
       CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) AS lochierarchy,
       CAST(RANK() OVER (PARTITION BY GROUPING(i_category) + GROUPING(i_class),
         CASE WHEN GROUPING(i_class) = 0 THEN i_category END
         ORDER BY CAST(SUM(ss_net_profit) AS DOUBLE) / CAST(SUM(ss_ext_sales_price) AS DOUBLE) ASC) AS BIGINT) AS rank_within_parent
FROM store_sales, date_dim d1, item, store
WHERE d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND s_state IN ('TN', 'SD', 'AL')
GROUP BY ROLLUP(i_category, i_class)
ORDER BY lochierarchy DESC,
         CASE WHEN CAST(GROUPING(i_category) + GROUPING(i_class) AS INT) = 0 THEN i_category END NULLS FIRST,
         rank_within_parent, i_category NULLS FIRST, i_class NULLS FIRST
LIMIT 100"""

Q['ds_q42'] = """
SELECT dt.d_year, item.i_category_id, item.i_category,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS sum_sales
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_category_id, item.i_category
ORDER BY sum_sales DESC, dt.d_year, item.i_category_id, item.i_category
LIMIT 100"""

Q['ds_q52'] = """
SELECT dt.d_year, item.i_brand_id AS brand_id, item.i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS ext_price
FROM date_dim dt, store_sales, item
WHERE dt.d_date_sk = store_sales.ss_sold_date_sk
  AND store_sales.ss_item_sk = item.i_item_sk
  AND item.i_manager_id = 1
  AND dt.d_moy = 11 AND dt.d_year = 2000
GROUP BY dt.d_year, item.i_brand, item.i_brand_id
ORDER BY dt.d_year, ext_price DESC, brand_id
LIMIT 100"""

Q['ds_q55'] = """
SELECT i_brand_id AS brand_id, i_brand AS brand,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS ext_price
FROM date_dim, store_sales, item
WHERE d_date_sk = ss_sold_date_sk AND ss_item_sk = i_item_sk
  AND i_manager_id = 8 AND d_moy = 11 AND d_year = 1999
GROUP BY i_brand, i_brand_id
ORDER BY ext_price DESC, brand_id
LIMIT 100"""

Q['ds_q56'] = """,
ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('slate', 'blanched', 'burnished'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('slate', 'blanched', 'burnished'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item
                      WHERE i_color IN ('slate', 'blanched', 'burnished'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 2001 AND d_moy = 2
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY total_sales, i_item_id
LIMIT 100"""

Q['ds_q60'] = """,
ss AS (
  SELECT i_item_id, SUM(ss_ext_sales_price) AS total_sales
  FROM store_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ss_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id),
cs AS (
  SELECT i_item_id, SUM(cs_ext_sales_price) AS total_sales
  FROM catalog_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND cs_item_sk = i_item_sk AND cs_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND cs_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id),
ws AS (
  SELECT i_item_id, SUM(ws_ext_sales_price) AS total_sales
  FROM web_sales, date_dim, customer_address, item
  WHERE i_item_id IN (SELECT i_item_id FROM item WHERE i_category IN ('Music'))
    AND ws_item_sk = i_item_sk AND ws_sold_date_sk = d_date_sk
    AND d_year = 1998 AND d_moy = 9
    AND ws_bill_addr_sk = ca_address_sk AND ca_gmt_offset = -5
  GROUP BY i_item_id)
SELECT i_item_id, CAST(SUM(total_sales) AS BIGINT) AS total_sales
FROM (SELECT * FROM ss UNION ALL SELECT * FROM cs UNION ALL SELECT * FROM ws) tmp1
GROUP BY i_item_id
ORDER BY i_item_id, total_sales
LIMIT 100"""

Q['ds_q68'] = """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       extended_price, extended_tax, list_price
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(ss_ext_list_price) AS BIGINT) AS extended_price,
             CAST(SUM(ss_ext_tax) AS BIGINT) AS extended_tax,
             CAST(SUM(ss_list_price) AS BIGINT) AS list_price
      FROM store_sales, date_dim, store, household_demographics, customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_dep_count = 4
          OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_city IN ('Midway', 'Fairview')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, ss_ticket_number
LIMIT 100"""

Q['ds_q73'] = """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND date_dim.d_dom BETWEEN 1 AND 2
        AND (household_demographics.hd_buy_potential = '>10000'
          OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND CASE WHEN household_demographics.hd_vehicle_count > 0
              THEN household_demographics.hd_dep_count * 1.0 / household_demographics.hd_vehicle_count
              ELSE NULL END > 1
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('Williamson County', 'Franklin Parish',
                               'Bronx County', 'Orange County')
      GROUP BY ss_ticket_number, ss_customer_sk) dj, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 1 AND 5
ORDER BY cnt DESC, c_last_name ASC, ss_ticket_number
LIMIT 1000"""

Q['ds_q79'] = """
SELECT c_last_name, c_first_name, SUBSTR(s_city, 1, 30) AS s_city,
       ss_ticket_number, amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, store.s_city,
             CAST(SUM(ss_coupon_amt) AS BIGINT) AS amt,
             CAST(SUM(ss_net_profit) AS BIGINT) AS profit
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (household_demographics.hd_dep_count = 6
          OR household_demographics.hd_vehicle_count > 2)
        AND date_dim.d_dow = 1
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_number_employees BETWEEN 200 AND 295
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, store.s_city) ms,
     customer
WHERE ss_customer_sk = c_customer_sk
ORDER BY c_last_name, c_first_name, SUBSTR(s_city, 1, 30), profit, ss_ticket_number
LIMIT 100"""

Q['ds_q89'] = """
SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
       sum_sales, avg_monthly_sales
FROM (SELECT i_category, i_class, i_brand, s_store_name, s_company_name, d_moy,
             CAST(SUM(ss_sales_price) AS BIGINT) AS sum_sales,
             AVG(SUM(ss_sales_price)) OVER (PARTITION BY i_category, i_brand,
               s_store_name, s_company_name) AS avg_monthly_sales
      FROM item, store_sales, date_dim, store
      WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
        AND ss_store_sk = s_store_sk AND d_year IN (1999)
        AND ((i_category IN ('Books', 'Electronics', 'Sports')
              AND i_class IN ('computers', 'stereo', 'football'))
          OR (i_category IN ('Men', 'Jewelry', 'Women')
              AND i_class IN ('shirts', 'birdal', 'dresses')))
      GROUP BY i_category, i_class, i_brand, s_store_name, s_company_name, d_moy) tmp1
WHERE CASE WHEN (avg_monthly_sales <> 0)
        THEN (ABS(sum_sales - avg_monthly_sales) / avg_monthly_sales)
        ELSE NULL END > 0.1
ORDER BY sum_sales - avg_monthly_sales, s_store_name, sum_sales, i_brand, d_moy
LIMIT 100"""

Q['ds_q96'] = """
SELECT COUNT(*) AS cnt
FROM store_sales, household_demographics, time_dim, store
WHERE ss_sold_time_sk = time_dim.t_time_sk
  AND ss_hdemo_sk = household_demographics.hd_demo_sk
  AND ss_store_sk = s_store_sk
  AND time_dim.t_hour = 20 AND time_dim.t_minute >= 30
  AND household_demographics.hd_dep_count = 7
  AND store.s_store_name = 'ese'
ORDER BY COUNT(*)
LIMIT 100"""

Q['ds_q98'] = """
SELECT i_item_id, i_item_desc, i_category, i_class, i_current_price,
       CAST(SUM(ss_ext_sales_price) AS BIGINT) AS itemrevenue,
       CAST(SUM(ss_ext_sales_price) AS DOUBLE) * 100 / SUM(SUM(ss_ext_sales_price))
         OVER (PARTITION BY i_class) AS revenueratio
FROM store_sales, item, date_dim
WHERE ss_item_sk = i_item_sk
  AND i_category IN ('Sports', 'Books', 'Home')
  AND ss_sold_date_sk = d_date_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '1999-03-24'
GROUP BY i_item_id, i_item_desc, i_category, i_class, i_current_price
ORDER BY i_category, i_class, i_item_id, i_item_desc, revenueratio"""

Q['ds_q34'] = """
SELECT c_last_name, c_first_name, c_salutation, c_preferred_cust_flag,
       ss_ticket_number, cnt
FROM (SELECT ss_ticket_number, ss_customer_sk, COUNT(*) AS cnt
      FROM store_sales, date_dim, store, household_demographics
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND (date_dim.d_dom BETWEEN 1 AND 3 OR date_dim.d_dom BETWEEN 25 AND 28)
        AND (household_demographics.hd_buy_potential = '>10000'
          OR household_demographics.hd_buy_potential = 'Unknown')
        AND household_demographics.hd_vehicle_count > 0
        AND (CASE WHEN household_demographics.hd_vehicle_count > 0
               THEN household_demographics.hd_dep_count * 1.0 / household_demographics.hd_vehicle_count
               ELSE NULL END) > 1.2
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_county IN ('Williamson County', 'Franklin Parish',
                               'Bronx County', 'Orange County')
      GROUP BY ss_ticket_number, ss_customer_sk) dn, customer
WHERE ss_customer_sk = c_customer_sk AND cnt BETWEEN 2 AND 5
ORDER BY c_last_name, c_first_name, c_salutation, c_preferred_cust_flag DESC, ss_ticket_number"""

Q['ds_q43'] = """
SELECT s_store_name, s_store_id,
       CAST(SUM(CASE WHEN (d_day_name = 'Sunday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS sun_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Monday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS mon_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Tuesday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS tue_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Wednesday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS wed_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Thursday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS thu_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Friday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS fri_sales,
       CAST(SUM(CASE WHEN (d_day_name = 'Saturday') THEN ss_sales_price ELSE NULL END) AS BIGINT) AS sat_sales
FROM date_dim, store_sales, store
WHERE d_date_sk = ss_sold_date_sk AND s_store_sk = ss_store_sk
  AND s_gmt_offset = -5 AND d_year = 2000
GROUP BY s_store_name, s_store_id
ORDER BY s_store_name, s_store_id, sun_sales, mon_sales, tue_sales,
         wed_sales, thu_sales, fri_sales, sat_sales
LIMIT 100"""

Q['ds_q46'] = """
SELECT c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number,
       amt, profit
FROM (SELECT ss_ticket_number, ss_customer_sk, ca_city AS bought_city,
             CAST(SUM(ss_coupon_amt) AS BIGINT) AS amt,
             CAST(SUM(ss_net_profit) AS BIGINT) AS profit
      FROM store_sales, date_dim, store, household_demographics, customer_address
      WHERE store_sales.ss_sold_date_sk = date_dim.d_date_sk
        AND store_sales.ss_store_sk = store.s_store_sk
        AND store_sales.ss_hdemo_sk = household_demographics.hd_demo_sk
        AND store_sales.ss_addr_sk = customer_address.ca_address_sk
        AND (household_demographics.hd_dep_count = 4
          OR household_demographics.hd_vehicle_count = 3)
        AND date_dim.d_dow IN (6, 0)
        AND date_dim.d_year IN (1999, 1999 + 1, 1999 + 2)
        AND store.s_city IN ('Midway', 'Fairview', 'Oakland', 'Springfield', 'Georgetown')
      GROUP BY ss_ticket_number, ss_customer_sk, ss_addr_sk, ca_city) dn,
     customer, customer_address current_addr
WHERE ss_customer_sk = c_customer_sk
  AND customer.c_current_addr_sk = current_addr.ca_address_sk
  AND current_addr.ca_city <> bought_city
ORDER BY c_last_name, c_first_name, ca_city, bought_city, ss_ticket_number
LIMIT 100"""

Q['ds_q48'] = """
SELECT CAST(SUM(ss_quantity) AS BIGINT) AS total_quantity
FROM store_sales, store, customer_demographics, customer_address, date_dim
WHERE s_store_sk = ss_store_sk
  AND ss_sold_date_sk = d_date_sk AND d_year = 2000
  AND ((cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'M'
        AND cd_education_status = '4 yr Degree'
        AND ss_sales_price BETWEEN 50000 AND 500000)
    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'D'
        AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 100000 AND 1000000)
    OR (cd_demo_sk = ss_cdemo_sk AND cd_marital_status = 'S'
        AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 30000 AND 300000))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TN', 'SD', 'AL')
        AND ss_net_profit BETWEEN 0 AND 2000000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('GA', 'MI', 'NJ')
        AND ss_net_profit BETWEEN 15000 AND 3000000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'VA')
        AND ss_net_profit BETWEEN 50000 AND 2500000))"""

Q['ds_q53'] = """
SELECT * FROM
  (SELECT i_manufact_id,
          CAST(SUM(ss_sales_price) AS BIGINT) AS sum_sales,
          AVG(SUM(ss_sales_price)) OVER (PARTITION BY i_manufact_id) AS avg_quarterly_sales
   FROM item, store_sales, date_dim, store
   WHERE ss_item_sk = i_item_sk AND ss_sold_date_sk = d_date_sk
     AND ss_store_sk = s_store_sk
     AND d_month_seq IN (108, 108 + 1, 108 + 2, 108 + 3, 108 + 4, 108 + 5,
                         108 + 6, 108 + 7, 108 + 8, 108 + 9, 108 + 10, 108 + 11)
     AND ((i_category IN ('Books', 'Children', 'Electronics')
           AND i_class IN ('computers', 'stereo', 'football'))
       OR (i_category IN ('Women', 'Music', 'Men')
           AND i_class IN ('shirts', 'dresses', 'computers')))
   GROUP BY i_manufact_id, d_qoy) tmp1
WHERE CASE WHEN avg_quarterly_sales > 0
        THEN ABS(sum_sales - avg_quarterly_sales) / avg_quarterly_sales
        ELSE NULL END > 0.1
ORDER BY avg_quarterly_sales, sum_sales, i_manufact_id
LIMIT 100"""

Q['ds_q88'] = """
SELECT *
FROM
 (SELECT COUNT(*) AS h8_30_to_9
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 8 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s1,
 (SELECT COUNT(*) AS h9_to_9_30
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 9 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s2,
 (SELECT COUNT(*) AS h9_30_to_10
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 9 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s3,
 (SELECT COUNT(*) AS h10_to_10_30
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 10 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s4,
 (SELECT COUNT(*) AS h10_30_to_11
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 10 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s5,
 (SELECT COUNT(*) AS h11_to_11_30
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 11 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s6,
 (SELECT COUNT(*) AS h11_30_to_12
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 11 AND time_dim.t_minute >= 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s7,
 (SELECT COUNT(*) AS h12_to_12_30
  FROM store_sales, household_demographics, time_dim, store
  WHERE ss_sold_time_sk = time_dim.t_time_sk
    AND ss_hdemo_sk = household_demographics.hd_demo_sk
    AND ss_store_sk = s_store_sk
    AND time_dim.t_hour = 12 AND time_dim.t_minute < 30
    AND ((household_demographics.hd_dep_count = 4 AND household_demographics.hd_vehicle_count <= 4 + 2)
      OR (household_demographics.hd_dep_count = 2 AND household_demographics.hd_vehicle_count <= 2 + 2)
      OR (household_demographics.hd_dep_count = 0 AND household_demographics.hd_vehicle_count <= 0 + 2))
    AND store.s_store_name = 'ese') s8"""

Q['ds_q93'] = """
SELECT ss_customer_sk, CAST(SUM(act_sales) AS BIGINT) AS sumsales
FROM (SELECT ss_item_sk, ss_ticket_number, ss_customer_sk,
             CASE WHEN sr_return_quantity IS NOT NULL
               THEN (ss_quantity - sr_return_quantity) * ss_sales_price
               ELSE (ss_quantity * ss_sales_price) END AS act_sales
      FROM store_sales LEFT OUTER JOIN store_returns
        ON (sr_item_sk = ss_item_sk AND sr_ticket_number = ss_ticket_number),
        reason
      WHERE sr_reason_sk = r_reason_sk AND r_reason_desc = 'reason 8') t
GROUP BY ss_customer_sk
ORDER BY sumsales, ss_customer_sk
LIMIT 100"""

Q['ds_q97'] = """,
ssci AS (
  SELECT ss_customer_sk AS customer_sk, ss_item_sk AS item_sk
  FROM store_sales, date_dim
  WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 108 AND 108 + 11
  GROUP BY ss_customer_sk, ss_item_sk),
csci AS (
  SELECT cs_bill_customer_sk AS customer_sk, cs_item_sk AS item_sk
  FROM catalog_sales, date_dim
  WHERE cs_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 108 AND 108 + 11
  GROUP BY cs_bill_customer_sk, cs_item_sk)
SELECT CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS store_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NULL AND csci.customer_sk IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS catalog_only,
       CAST(SUM(CASE WHEN ssci.customer_sk IS NOT NULL AND csci.customer_sk IS NOT NULL
                THEN 1 ELSE 0 END) AS BIGINT) AS store_and_catalog
FROM ssci FULL OUTER JOIN csci
  ON (ssci.customer_sk = csci.customer_sk AND ssci.item_sk = csci.item_sk)
LIMIT 100"""

Q['ds_q13'] = """
SELECT AVG(ss_quantity) AS avg_qty, AVG(ss_ext_sales_price) AS avg_esp,
       AVG(ss_ext_wholesale_cost) AS avg_ewc,
       CAST(SUM(ss_ext_wholesale_cost) AS BIGINT) AS sum_ewc
FROM store_sales, store, customer_demographics, household_demographics,
     customer_address, date_dim
WHERE s_store_sk = ss_store_sk AND ss_sold_date_sk = d_date_sk AND d_year = 2001
  AND ((ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'M' AND cd_education_status = 'Advanced Degree'
        AND ss_sales_price BETWEEN 50000 AND 500000 AND hd_dep_count = 3)
    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'S' AND cd_education_status = 'College'
        AND ss_sales_price BETWEEN 100000 AND 1000000 AND hd_dep_count = 1)
    OR (ss_hdemo_sk = hd_demo_sk AND cd_demo_sk = ss_cdemo_sk
        AND cd_marital_status = 'W' AND cd_education_status = '2 yr Degree'
        AND ss_sales_price BETWEEN 30000 AND 300000 AND hd_dep_count = 1))
  AND ((ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TN', 'SD', 'AL') AND ss_net_profit BETWEEN 10000 AND 2000000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('GA', 'MI', 'NJ') AND ss_net_profit BETWEEN 15000 AND 3000000)
    OR (ss_addr_sk = ca_address_sk AND ca_country = 'United States'
        AND ca_state IN ('TX', 'VA') AND ss_net_profit BETWEEN 50000 AND 2500000))"""

Q['ds_q15'] = """
SELECT ca_zip, CAST(SUM(cs_sales_price) AS BIGINT) AS sum_sales
FROM catalog_sales, customer, customer_address, date_dim
WHERE cs_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND (SUBSTR(ca_zip, 1, 5) IN ('10005', '10017', '10029', '10033', '10041',
                                '10051', '10062', '10077', '10084', '10088')
    OR ca_state IN ('TN', 'GA', 'TX')
    OR cs_sales_price > 50000)
  AND cs_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip
ORDER BY ca_zip
LIMIT 100"""

Q['ds_q18'] = """
SELECT i_item_id, ca_country, ca_state, ca_county,
       AVG(CAST(cs_quantity AS DOUBLE)) AS agg1,
       AVG(CAST(cs_list_price AS DOUBLE)) AS agg2,
       AVG(CAST(cs_coupon_amt AS DOUBLE)) AS agg3,
       AVG(CAST(cs_sales_price AS DOUBLE)) AS agg4,
       AVG(CAST(cs_net_profit AS DOUBLE)) AS agg5,
       AVG(CAST(c_birth_year AS DOUBLE)) AS agg6,
       AVG(CAST(cd1.cd_dep_count AS DOUBLE)) AS agg7
FROM catalog_sales, customer_demographics cd1, customer_demographics cd2,
     customer, customer_address, date_dim, item
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd1.cd_demo_sk
  AND cs_bill_customer_sk = c_customer_sk
  AND cd1.cd_gender = 'F' AND cd1.cd_education_status = 'Unknown'
  AND c_current_cdemo_sk = cd2.cd_demo_sk
  AND c_current_addr_sk = ca_address_sk
  AND c_birth_month IN (1, 6, 8, 9, 12, 2)
  AND d_year = 1998
  AND ca_state IN ('TN', 'SD', 'AL', 'GA', 'MI', 'NJ', 'TX')
GROUP BY ROLLUP (i_item_id, ca_country, ca_state, ca_county)
ORDER BY ca_country NULLS FIRST, ca_state NULLS FIRST, ca_county NULLS FIRST,
         i_item_id NULLS FIRST
LIMIT 100"""

Q['ds_q45'] = """
SELECT ca_zip, ca_city, CAST(SUM(ws_sales_price) AS BIGINT) AS sum_sales
FROM web_sales, customer, customer_address, date_dim, item
WHERE ws_bill_customer_sk = c_customer_sk
  AND c_current_addr_sk = ca_address_sk
  AND ws_item_sk = i_item_sk
  AND (SUBSTR(ca_zip, 1, 5) IN ('10005', '10017', '10029', '10033', '10041',
                                '10051', '10062', '10077', '10084', '10088')
    OR i_item_id IN (SELECT i_item_id FROM item
                     WHERE i_item_sk IN (2, 3, 5, 7, 11, 13, 17, 19, 23, 29)))
  AND ws_sold_date_sk = d_date_sk
  AND d_qoy = 2 AND d_year = 2001
GROUP BY ca_zip, ca_city
ORDER BY ca_zip, ca_city
LIMIT 100"""

Q['ds_q61'] = """
SELECT promotions, total,
       CAST(promotions AS DOUBLE) / CAST(total AS DOUBLE) * 100 AS promo_pct
FROM (SELECT CAST(SUM(ss_ext_sales_price) AS BIGINT) AS promotions
      FROM store_sales, store, promotion, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_promo_sk = p_promo_sk AND ss_customer_sk = c_customer_sk
        AND ca_address_sk = c_current_addr_sk AND ss_item_sk = i_item_sk
        AND ca_gmt_offset = -5 AND i_category = 'Jewelry'
        AND (p_channel_dmail = 'Y' OR p_channel_email = 'Y' OR p_channel_tv = 'Y')
        AND s_gmt_offset = -5 AND d_year = 1998) promotional_sales,
     (SELECT CAST(SUM(ss_ext_sales_price) AS BIGINT) AS total
      FROM store_sales, store, date_dim, customer, customer_address, item
      WHERE ss_sold_date_sk = d_date_sk AND ss_store_sk = s_store_sk
        AND ss_customer_sk = c_customer_sk AND ca_address_sk = c_current_addr_sk
        AND ss_item_sk = i_item_sk AND ca_gmt_offset = -5
        AND i_category = 'Jewelry' AND s_gmt_offset = -5
        AND d_year = 1998) all_sales
ORDER BY promotions, total
LIMIT 100"""

Q['ds_q65'] = """
SELECT s_store_name, i_item_desc, CAST(sc.revenue AS BIGINT) AS revenue,
       i_current_price, i_wholesale_cost, i_brand
FROM store, item,
     (SELECT ss_store_sk, AVG(revenue) AS ave
      FROM (SELECT ss_store_sk, ss_item_sk, SUM(ss_sales_price) AS revenue
            FROM store_sales, date_dim
            WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 108 AND 108 + 11
            GROUP BY ss_store_sk, ss_item_sk) sa
      GROUP BY ss_store_sk) sb,
     (SELECT ss_store_sk, ss_item_sk, SUM(ss_sales_price) AS revenue
      FROM store_sales, date_dim
      WHERE ss_sold_date_sk = d_date_sk AND d_month_seq BETWEEN 108 AND 108 + 11
      GROUP BY ss_store_sk, ss_item_sk) sc
WHERE sb.ss_store_sk = sc.ss_store_sk AND sc.revenue <= 0.1 * sb.ave
  AND s_store_sk = sc.ss_store_sk AND i_item_sk = sc.ss_item_sk
ORDER BY s_store_name, i_item_desc, revenue, i_brand
LIMIT 100"""

Q['ds_q69'] = """
SELECT cd_gender, cd_marital_status, cd_education_status, COUNT(*) AS cnt1,
       cd_purchase_estimate, COUNT(*) AS cnt2, cd_credit_rating, COUNT(*) AS cnt3
FROM customer c, customer_address ca, customer_demographics
WHERE c.c_current_addr_sk = ca.ca_address_sk
  AND ca_state IN ('GA', 'MI', 'NJ')
  AND cd_demo_sk = c.c_current_cdemo_sk
  AND EXISTS (SELECT * FROM store_sales, date_dim
              WHERE c.c_customer_sk = ss_customer_sk AND ss_sold_date_sk = d_date_sk
                AND d_year = 2001 AND d_moy BETWEEN 4 AND 4 + 2)
  AND (NOT EXISTS (SELECT * FROM web_sales, date_dim
                   WHERE c.c_customer_sk = ws_bill_customer_sk
                     AND ws_sold_date_sk = d_date_sk
                     AND d_year = 2001 AND d_moy BETWEEN 4 AND 4 + 2)
    AND NOT EXISTS (SELECT * FROM catalog_sales, date_dim
                    WHERE c.c_customer_sk = cs_bill_customer_sk
                      AND cs_sold_date_sk = d_date_sk
                      AND d_year = 2001 AND d_moy BETWEEN 4 AND 4 + 2))
GROUP BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
ORDER BY cd_gender, cd_marital_status, cd_education_status,
         cd_purchase_estimate, cd_credit_rating
LIMIT 100"""

Q['ds_q25'] = """
SELECT i_item_id, i_item_desc, s_store_id, s_store_name,
       CAST(SUM(ss_net_profit) AS BIGINT) AS store_sales_profit,
       CAST(SUM(sr_net_loss) AS BIGINT) AS store_returns_loss,
       CAST(SUM(cs_net_profit) AS BIGINT) AS catalog_sales_profit
FROM store_sales, store_returns, catalog_sales, date_dim d1, date_dim d2,
     date_dim d3, store, item
WHERE d1.d_year = 2001 AND d1.d_date_sk = ss_sold_date_sk
  AND i_item_sk = ss_item_sk AND s_store_sk = ss_store_sk
  AND ss_customer_sk = sr_customer_sk AND ss_item_sk = sr_item_sk
  AND ss_ticket_number = sr_ticket_number
  AND sr_returned_date_sk = d2.d_date_sk
  AND d2.d_year = 2001
  AND sr_customer_sk = cs_bill_customer_sk AND sr_item_sk = cs_item_sk
  AND cs_sold_date_sk = d3.d_date_sk
  AND d3.d_year = 2001
GROUP BY i_item_id, i_item_desc, s_store_id, s_store_name
ORDER BY i_item_id, i_item_desc, s_store_id, s_store_name
LIMIT 100"""

Q['ds_q9'] = """
SELECT CASE WHEN (SELECT COUNT(*) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 10) > 10000
         THEN (SELECT AVG(ss_ext_discount_amt) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 10)
         ELSE (SELECT AVG(ss_net_paid) FROM store_sales WHERE ss_quantity BETWEEN 1 AND 10) END AS bucket1,
       CASE WHEN (SELECT COUNT(*) FROM store_sales WHERE ss_quantity BETWEEN 11 AND 20) > 8000
         THEN (SELECT AVG(ss_ext_discount_amt) FROM store_sales WHERE ss_quantity BETWEEN 11 AND 20)
         ELSE (SELECT AVG(ss_net_paid) FROM store_sales WHERE ss_quantity BETWEEN 11 AND 20) END AS bucket2,
       CASE WHEN (SELECT COUNT(*) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 30) > 6000
         THEN (SELECT AVG(ss_ext_discount_amt) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 30)
         ELSE (SELECT AVG(ss_net_paid) FROM store_sales WHERE ss_quantity BETWEEN 21 AND 30) END AS bucket3,
       CASE WHEN (SELECT COUNT(*) FROM store_sales WHERE ss_quantity BETWEEN 31 AND 40) > 4000
         THEN (SELECT AVG(ss_ext_discount_amt) FROM store_sales WHERE ss_quantity BETWEEN 31 AND 40)
         ELSE (SELECT AVG(ss_net_paid) FROM store_sales WHERE ss_quantity BETWEEN 31 AND 40) END AS bucket4,
       CASE WHEN (SELECT COUNT(*) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 50) > 2000
         THEN (SELECT AVG(ss_ext_discount_amt) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 50)
         ELSE (SELECT AVG(ss_net_paid) FROM store_sales WHERE ss_quantity BETWEEN 41 AND 50) END AS bucket5
FROM reason WHERE r_reason_sk = 1"""

Q['ds_q26'] = """
SELECT i_item_id,
       AVG(cs_quantity) AS agg1, AVG(cs_list_price) AS agg2,
       AVG(cs_coupon_amt) AS agg3, AVG(cs_sales_price) AS agg4
FROM catalog_sales, customer_demographics, date_dim, item, promotion
WHERE cs_sold_date_sk = d_date_sk AND cs_item_sk = i_item_sk
  AND cs_bill_cdemo_sk = cd_demo_sk AND cs_promo_sk = p_promo_sk
  AND cd_gender = 'M' AND cd_marital_status = 'S' AND cd_education_status = 'College'
  AND (p_channel_email = 'N' OR p_channel_event = 'N')
  AND d_year = 2000
GROUP BY i_item_id
ORDER BY i_item_id
LIMIT 100"""

Q['ds_q32'] = """
SELECT CAST(SUM(cs_ext_discount_amt) AS BIGINT) AS excess_discount_amount
FROM catalog_sales, item, date_dim
WHERE i_manufact_id = 28
  AND i_item_sk = cs_item_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '2001-02-22'
  AND d_date_sk = cs_sold_date_sk
  AND cs_ext_discount_amt > (SELECT 1.3 * AVG(cs_ext_discount_amt)
                             FROM catalog_sales, date_dim
                             WHERE cs_item_sk = i_item_sk
                               AND d_date BETWEEN DATE '1999-02-22' AND DATE '2001-02-22'
                               AND d_date_sk = cs_sold_date_sk)
LIMIT 100"""

Q['ds_q71'] = """
SELECT i_brand_id AS brand_id, i_brand AS brand, t_hour, t_minute,
       CAST(SUM(ext_price) AS BIGINT) AS ext_price
FROM item,
     (SELECT ws_ext_sales_price AS ext_price, ws_sold_date_sk AS sold_date_sk,
             ws_item_sk AS sold_item_sk, ws_sold_time_sk AS time_sk
      FROM web_sales, date_dim
      WHERE d_moy = 11 AND d_year = 1999 AND ws_sold_date_sk = d_date_sk
      UNION ALL
      SELECT cs_ext_sales_price AS ext_price, cs_sold_date_sk AS sold_date_sk,
             cs_item_sk AS sold_item_sk, cs_sold_time_sk AS time_sk
      FROM catalog_sales, date_dim
      WHERE d_moy = 11 AND d_year = 1999 AND cs_sold_date_sk = d_date_sk
      UNION ALL
      SELECT ss_ext_sales_price AS ext_price, ss_sold_date_sk AS sold_date_sk,
             ss_item_sk AS sold_item_sk, ss_sold_time_sk AS time_sk
      FROM store_sales, date_dim
      WHERE d_moy = 11 AND d_year = 1999 AND ss_sold_date_sk = d_date_sk) tmp,
     time_dim
WHERE sold_item_sk = i_item_sk AND i_manager_id = 1 AND time_sk = t_time_sk
  AND (t_meal_time = 'breakfast' OR t_meal_time = 'dinner')
GROUP BY i_brand, i_brand_id, t_hour, t_minute
ORDER BY ext_price DESC, i_brand_id, t_hour, t_minute
LIMIT 100"""

Q['ds_q81'] = """,
customer_total_return AS (
  SELECT cr_returning_customer_sk AS ctr_customer_sk, ca_state AS ctr_state,
         CAST(SUM(cr_return_amt_inc_tax) AS BIGINT) AS ctr_total_return
  FROM catalog_returns, date_dim, customer_address
  WHERE cr_returned_date_sk = d_date_sk AND d_year = 2000
    AND cr_returning_addr_sk = ca_address_sk
  GROUP BY cr_returning_customer_sk, ca_state)
SELECT c_customer_id, c_salutation, c_first_name, c_last_name,
       ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
       ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,
       ca_location_type, ctr_total_return
FROM customer_total_return ctr1, customer_address, customer
WHERE ctr1.ctr_total_return > (SELECT AVG(ctr_total_return) * 1.2
                               FROM customer_total_return ctr2
                               WHERE ctr1.ctr_state = ctr2.ctr_state)
  AND ca_address_sk = c_current_addr_sk
  AND ca_state = 'GA'
  AND ctr1.ctr_customer_sk = c_customer_sk
ORDER BY c_customer_id, c_salutation, c_first_name, c_last_name,
         ca_street_number, ca_street_name, ca_street_type, ca_suite_number,
         ca_city, ca_county, ca_state, ca_zip, ca_country, ca_gmt_offset,
         ca_location_type, ctr_total_return
LIMIT 100"""

Q['ds_q92'] = """
SELECT CAST(SUM(ws_ext_discount_amt) AS BIGINT) AS excess_discount_amount
FROM web_sales, item, date_dim
WHERE i_manufact_id = 35
  AND i_item_sk = ws_item_sk
  AND d_date BETWEEN DATE '1999-02-22' AND DATE '2001-02-22'
  AND d_date_sk = ws_sold_date_sk
  AND ws_ext_discount_amt > (SELECT 1.3 * AVG(ws_ext_discount_amt)
                             FROM web_sales, date_dim
                             WHERE ws_item_sk = i_item_sk
                               AND d_date BETWEEN DATE '1999-02-22' AND DATE '2001-02-22'
                               AND d_date_sk = ws_sold_date_sk)
ORDER BY excess_discount_amount
LIMIT 100"""

if __name__ == '__main__':
    names = sys.argv[1:] or sorted(Q)
    for sf in ['sf0.001', 'sf0.01', 'sf0.1']:
        con = duckdb.connect()
        for t in ['lineitem', 'orders', 'customer', 'part', 'supplier', 'nation', 'region']:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '/root/testdata/{sf}/{t}.parquet'")
        for name in names:
            sql = PREFIX + Q[name]
            try:
                df = con.execute(sql).df()
                flag = '' if len(df) > 0 else '  <<< EMPTY'
                print(f'{sf} {name}: {len(df)} rows{flag}')
            except Exception as e:
                print(f'{sf} {name}: ERROR {str(e)[:200]}')
