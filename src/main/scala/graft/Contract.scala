package graft

/** The 55-query t2 contract (SURVEY.md §2.4 + Appendix A, normative).
  *
  * Each entry carries the Spark-dialect SQL (executed by the engine) and
  * the DuckDB-dialect SQL (the driver's oracle). Most queries are
  * identical in both dialects; the splits encode the certified hazard
  * fixes H1–H10 (SURVEY.md §0.4): VARCHAR↔STRING (H5), regex escaping
  * (H9), DATEDIFF signature (H10), list ops vs higher-order functions,
  * ASOF join formulation (J10).
  *
  * Do not re-derive these — they are certified byte-identical across
  * DuckDB 1.0.0 and Spark 4.1.2 at sf0.001/0.01/0.1 (SURVEY.md §0.2).
  */
final case class ContractQuery(id: String, sparkSql: String, duckSql: String)

object Contract {

  private def q(id: String, sql: String): ContractQuery =
    ContractQuery(id, sql.trim, sql.trim)
  private def q2(id: String, spark: String, duck: String): ContractQuery =
    ContractQuery(id, spark.trim, duck.trim)

  /** hash01 column of SURVEY.md §2.4 — canonical SHA-256 prefix at sf0.01. */
  val hash01: Map[String, String] = Map(
    "S01" -> "5784bd053d049e72", "S02" -> "c0f41ea0c5c6b3be",
    "P01" -> "d910047a6d5885d7", "P02" -> "a2e3dab78729184e",
    "P03" -> "4dcdf13e42889cf1",
    "J01" -> "c4cb497136b86ef9", "J02" -> "f3f2e2d5fbe5c58e",
    "J03" -> "b2a54267f7a55fcc", "J04" -> "2315bd64e75a3465",
    "J05" -> "86a3f9b13a5b652f", "J06" -> "c1b40f8531b9bc9d",
    "J07" -> "65f9f39610ffe9c3", "J08" -> "ababb848d12629f6",
    "J09" -> "09a36859e0142147", "J10" -> "3dccdd8c3005bb8c",
    "A01" -> "c673b96106a0905f", "A02" -> "f98e4f97ad9c6573",
    "A03" -> "b558e733782f6a09", "A04" -> "d0b89bb5c38e1e6e",
    "A05" -> "d8540c185c99d537", "A06" -> "c8734f171dc04776",
    "A07" -> "44b1be14f78d90c8", "A08" -> "3138983c0b87b89f",
    "A09" -> "8a4178b5d2a8d6b5", "A10" -> "40510175845988f1",
    "W01" -> "c67db25a5d9fa01d", "W02" -> "6ebb6af11e7d7a33",
    "W03" -> "066e6e0e93fcb8dd", "W04" -> "dd584327cc5a2c0f",
    "W05" -> "35a8ce4050e3bccf", "W06" -> "263eacc735ac5d08",
    "O01" -> "62a1a88f65b39ba8", "O02" -> "470e79a17e822e78",
    "U01" -> "36bab61769e2334d", "U02" -> "4713cadab0a9b647",
    "U03" -> "55d2a0d5fdb99cfe",
    "F01" -> "641ca00676f9aa66", "F02" -> "c1e1461de52c5c43",
    "F03" -> "ff26374b511fddfc", "F04" -> "818cd4d8c02fd389",
    "F05" -> "45060d1230c50d6f", "F06" -> "7c42417715525dd7",
    "F07" -> "644eddfd9538c49a", "F08" -> "7bcc5ac03031b17e",
    "T01" -> "59c46c227e4ff0dc", "T02" -> "029b8dbbbf4c6b54",
    "T03" -> "427f9e4ad4701190",
    "L01" -> "15c0280ae621d685", "L02" -> "e3b0c44298fc1c14",
    "L03" -> "ca80dd7e2013ed62", "L04" -> "02d2c8b9a42dce67",
    "L05" -> "83c0ce39dbf295d9", "L06" -> "a16ffcd49a013be6",
    "L07" -> "05eafeda711584a9", "L08" -> "025145e149852ee4")

  /** hash1 column of SURVEY.md §2.4 — canonical SHA-256 prefix at sf0.1
    * (the bench scale).
    */
  val hash1: Map[String, String] = Map(
    "S01" -> "47f2b63b1237a4e9", "S02" -> "812d8e4813cd0e9c",
    "P01" -> "a2b8ea6054448c01", "P02" -> "0bf56efa206a9532",
    "P03" -> "e1d04ae94001eb7d",
    "J01" -> "ab225367fb8da979", "J02" -> "ab8bc7a4e3f60a8f",
    "J03" -> "df1590a1fbd152c5", "J04" -> "d3ccc3c3a442b275",
    "J05" -> "ddafe0dc90181d0c", "J06" -> "9005506b38c46613",
    "J07" -> "65f9f39610ffe9c3", "J08" -> "a4b162b091e18079",
    "J09" -> "4020ce885414ca82", "J10" -> "384a4c3a3db3dec1",
    "A01" -> "f02a0b8a95433f3a", "A02" -> "189aa7b65ca2bcea",
    "A03" -> "56fb57e727ecc2b9", "A04" -> "d00b2251ef7f1a85",
    "A05" -> "5a00c1fe1ada6b55", "A06" -> "62d2410d65452e09",
    "A07" -> "89107845720365fc", "A08" -> "1814c922947c8623",
    "A09" -> "510f10dca95a2113", "A10" -> "39e5b4830d4d9c14",
    "W01" -> "85fd2a78dc3c35b8", "W02" -> "e1beab8e7cb8b584",
    "W03" -> "f833448a6bd0ac5b", "W04" -> "208eacb4cad9d0a8",
    "W05" -> "bb3e9f5a48b21288", "W06" -> "37c4a7cca298cb1c",
    "O01" -> "926d0b30ce85b46a", "O02" -> "0bb3f000d64db68f",
    "U01" -> "36bab61769e2334d", "U02" -> "4713cadab0a9b647",
    "U03" -> "039651b9b561213a",
    "F01" -> "7d29bb3c7026c7a4", "F02" -> "c1e1461de52c5c43",
    "F03" -> "e9e2d64ecc1f000b", "F04" -> "1386a0ed189d6e62",
    "F05" -> "da1990ec185961ff", "F06" -> "30d4cc71704b1686",
    "F07" -> "884a7a47805b32e8", "F08" -> "2f268ffea9e3e0d8",
    "T01" -> "462dfcdcb3b153b9", "T02" -> "6e1bfbe2668b74cd",
    "T03" -> "b6a3691cbcc05dae",
    "L01" -> "03e30d516553c002", "L02" -> "61230790cccda93d",
    "L03" -> "c7463111f5c7e8a8", "L04" -> "c088b8edd44bbbe0",
    "L05" -> "1103178a73bf46a4", "L06" -> "32f70de085fe4e1f",
    "L07" -> "aae2a4bdce99b94b", "L08" -> "bb39b90073e27dd3")

  val all: Seq[ContractQuery] = Seq(
    // ---- scans ----
    q("S01", """
SELECT COUNT(*) AS n, MIN(l_orderkey) AS mn, MAX(l_orderkey) AS mx, COUNT(l_partkey) AS nn FROM lineitem
"""),
    q("S02", """
SELECT t, n FROM (
  SELECT 'customer' AS t, COUNT(*) AS n FROM customer
  UNION ALL SELECT 'orders', COUNT(*) FROM orders
  UNION ALL SELECT 'lineitem', COUNT(*) FROM lineitem
  UNION ALL SELECT 'part', COUNT(*) FROM part
  UNION ALL SELECT 'supplier', COUNT(*) FROM supplier
  UNION ALL SELECT 'nation', COUNT(*) FROM nation
  UNION ALL SELECT 'region', COUNT(*) FROM region
  UNION ALL SELECT 'events', COUNT(*) FROM events
  UNION ALL SELECT 'documents', COUNT(*) FROM documents
  UNION ALL SELECT 'embeddings', COUNT(*) FROM embeddings) x ORDER BY t
"""),
    // ---- projection / filter ----
    q("P01", """
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice*(1-l_discount)*(1+l_tax), 2) AS net
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 15 AND l_returnflag = 'R'
ORDER BY l_orderkey, l_linenumber LIMIT 100
"""),
    q("P02", """
SELECT c_custkey, c_name FROM customer
WHERE c_mktsegment IN ('BUILDING','AUTOMOBILE') AND c_name LIKE 'Customer#00000012%'
ORDER BY c_custkey
"""),
    q("P03", """
SELECT o_orderkey, o_orderstatus FROM orders
WHERE (o_orderpriority = '1-URGENT' OR o_orderpriority = '2-HIGH')
  AND NOT o_orderstatus = 'P'
  AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
ORDER BY o_orderkey LIMIT 50
"""),
    // ---- joins ----
    // Money columns: computed in exact decimal (H3), then CAST to DOUBLE
    // for the final output so both engines render identically (values are
    // certified ≤ 2 decimals — double is exact; canonical hash unchanged
    // because the §2.2 renderer collapses trailing zeros). Same reason for
    // the explicit BIGINT casts on SUM-of-integer columns: DuckDB widens
    // SUM(BIGINT) to HUGEINT, which the driver's comparator renders
    // differently.
    q("J01", """
SELECT c_mktsegment, COUNT(*) AS n_orders,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(18,4))), 2) AS DOUBLE) AS total
FROM orders JOIN customer ON o_custkey = c_custkey
GROUP BY c_mktsegment ORDER BY c_mktsegment
"""),
    q("J02", """
SELECT r_name, n_name,
       CAST(ROUND(SUM(CAST(l_extendedprice*(1-l_discount) AS DECIMAL(18,4))), 2) AS DOUBLE) AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
GROUP BY r_name, n_name ORDER BY r_name, n_name
"""),
    q("J03", """
SELECT c_custkey, COUNT(o.o_orderkey) AS n
FROM customer LEFT JOIN (SELECT * FROM orders WHERE o_orderstatus = 'P') o
  ON c_custkey = o.o_custkey
GROUP BY c_custkey HAVING COUNT(o.o_orderkey) = 0 ORDER BY c_custkey LIMIT 100
"""),
    q("J04", """
SELECT COUNT(*) AS n FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey AND o.o_orderstatus = 'P')
"""),
    q("J05", """
SELECT COUNT(*) AS n FROM part p
WHERE NOT EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_partkey = p.p_partkey AND l.l_quantity > 48)
"""),
    q("J06", """
SELECT COALESCE(cn.k, sn.k) AS nationkey,
       COALESCE(cn.n, 0) AS n_cust, COALESCE(sn.n, 0) AS n_supp
FROM (SELECT c_nationkey AS k, COUNT(*) AS n FROM customer GROUP BY c_nationkey) cn
FULL OUTER JOIN (SELECT s_nationkey AS k, COUNT(*) AS n FROM supplier GROUP BY s_nationkey) sn
ON cn.k = sn.k ORDER BY nationkey
"""),
    q("J07", """
SELECT r_name, s FROM region CROSS JOIN (SELECT DISTINCT o_orderstatus AS s FROM orders) x
ORDER BY r_name, s
"""),
    q("J08", """
SELECT p1.p_brand, COUNT(*) AS n
FROM part p1 JOIN part p2 ON p1.p_brand = p2.p_brand AND p1.p_size < p2.p_size
GROUP BY p1.p_brand ORDER BY p1.p_brand
"""),
    q("J09", """
SELECT o_orderpriority, COUNT(*) AS n
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
 AND l_shipdate > o_orderdate + INTERVAL 30 DAY
GROUP BY o_orderpriority ORDER BY o_orderpriority
"""),
    q2("J10", """
WITH c AS (SELECT * FROM events WHERE event_type = 'click'),
     p AS (SELECT * FROM events WHERE event_type = 'purchase'),
j AS (SELECT c.event_id, p.event_id AS purchase_id,
         ROW_NUMBER() OVER (PARTITION BY c.event_id ORDER BY p.ts DESC, p.event_id DESC) AS rn
      FROM c LEFT JOIN p ON c.user_id = p.user_id AND c.ts >= p.ts)
SELECT event_id, CASE WHEN rn IS NULL THEN NULL ELSE purchase_id END AS purchase_id
FROM j WHERE rn = 1 OR rn IS NULL
ORDER BY event_id LIMIT 200
""", """
SELECT c.event_id, p.event_id AS purchase_id
FROM (SELECT * FROM events WHERE event_type = 'click') c
ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
  ON c.user_id = p.user_id AND c.ts >= p.ts
ORDER BY c.event_id LIMIT 200
"""),
    // ---- aggregation ----
    q("A01", """
SELECT l_returnflag, l_linestatus,
  CAST(SUM(CAST(FLOOR(l_quantity) AS BIGINT)) AS BIGINT) AS sum_qty,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_base,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_disc,
  CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(1 - l_discount AS DECIMAL(12,2))
            * CAST(1 + l_tax AS DECIMAL(12,2))), 2) AS DOUBLE) AS sum_charge,
  ROUND(SUM(l_quantity) / COUNT(*), 4) AS avg_qty,
  COUNT(*) AS n
FROM lineitem WHERE l_shipdate <= TIMESTAMP '2001-09-01 00:00:00'
GROUP BY l_returnflag, l_linestatus ORDER BY l_returnflag, l_linestatus
"""),
    q("A02", """
SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS nd, COUNT(*) AS n
FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority
"""),
    q("A03", """
SELECT l_returnflag, COUNT(DISTINCT l_partkey) AS ndp, COUNT(DISTINCT l_suppkey) AS nds
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""),
    q("A04", """
SELECT GROUPING(r_name) AS g_r, GROUPING(n_name) AS g_n, r_name, n_name, COUNT(*) AS n
FROM customer JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY ROLLUP(r_name, n_name)
ORDER BY g_r, g_n, r_name NULLS FIRST, n_name NULLS FIRST
"""),
    q("A05", """
SELECT GROUPING(o_orderstatus) AS gs, GROUPING(o_orderpriority) AS gp,
       o_orderstatus, o_orderpriority, COUNT(*) AS n
FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
ORDER BY gs, gp, o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST
"""),
    q("A06", """
SELECT GROUPING(c_mktsegment) AS gm, GROUPING(c_nationkey) AS gn,
       c_mktsegment, c_nationkey, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS bal
FROM customer GROUP BY GROUPING SETS ((c_mktsegment), (c_nationkey))
ORDER BY gm, gn, c_mktsegment NULLS FIRST, c_nationkey NULLS FIRST
"""),
    q("A07", """
SELECT c_nationkey, COUNT(*) AS n, CAST(ROUND(SUM(CAST(c_acctbal AS DECIMAL(18,4))), 2) AS DOUBLE) AS bal
FROM customer GROUP BY c_nationkey HAVING COUNT(*) > 50 ORDER BY c_nationkey
"""),
    q("A08", """
SELECT COUNT(*) AS n, MIN(o_orderpriority) AS mnp, MAX(o_orderpriority) AS mxp,
       MIN(o_orderdate) AS mnd, MAX(o_orderdate) AS mxd FROM orders
"""),
    q("A09", """
SELECT l_returnflag,
       ROUND(STDDEV_SAMP(l_quantity), 4) AS sd,
       ROUND(VAR_SAMP(l_discount), 6) AS vr,
       ROUND(CORR(l_quantity, l_extendedprice), 4) AS cr
FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag
"""),
    q("A10", """
SELECT COUNT(*) AS n FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part)
"""),
    // ---- window functions ----
    q("W01", """
SELECT c_mktsegment, c_custkey, rn, rk, drk FROM (
  SELECT c_mktsegment, c_custkey,
    ROW_NUMBER() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rn,
    RANK()       OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS rk,
    DENSE_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey) AS drk
  FROM customer) x WHERE rn <= 3 ORDER BY c_mktsegment, rn
"""),
    q("W02", """
SELECT user_id, event_id,
  LAG(event_id)  OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_id,
  LEAD(event_id) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_id
FROM events WHERE user_id < 5 ORDER BY user_id, ts, event_id LIMIT 200
"""),
    q("W03", """
SELECT user_id, event_id,
  ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS run_sum,
  ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
        ROWS BETWEEN 3 PRECEDING AND CURRENT ROW), 4) AS mov_avg
FROM events WHERE user_id < 3 ORDER BY user_id, ts, event_id LIMIT 200
"""),
    q("W04", """
SELECT p_partkey, p_size,
  COUNT(*) OVER (ORDER BY p_size RANGE BETWEEN 2 PRECEDING AND CURRENT ROW) AS cnt_near
FROM part ORDER BY p_partkey LIMIT 100
"""),
    q("W05", """
SELECT c_custkey,
  NTILE(4) OVER (ORDER BY c_acctbal, c_custkey) AS quart,
  ROUND(PERCENT_RANK() OVER (ORDER BY c_acctbal, c_custkey), 6) AS pr,
  ROUND(CUME_DIST() OVER (ORDER BY c_acctbal, c_custkey), 6) AS cd
FROM customer WHERE c_nationkey = 3 ORDER BY c_custkey LIMIT 100
"""),
    q("W06", """
SELECT o_custkey, o_orderkey,
  FIRST_VALUE(o_orderkey) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS first_o,
  LAST_VALUE(o_orderkey)  OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS last_o,
  NTH_VALUE(o_orderkey, 2) OVER (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
      ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS second_o
FROM orders WHERE o_custkey < 20 ORDER BY o_custkey, o_orderkey LIMIT 200
"""),
    // ---- sort / limit ----
    q("O01", """
SELECT n_name, x.mx
FROM nation LEFT JOIN (SELECT s_nationkey, MAX(s_acctbal) AS mx FROM supplier GROUP BY s_nationkey) x
  ON n_nationkey = x.s_nationkey
ORDER BY x.mx DESC NULLS LAST, n_name ASC
"""),
    q("O02", """
SELECT o_orderkey, ROUND(o_totalprice, 2) AS p FROM orders
ORDER BY o_totalprice DESC, o_orderkey LIMIT 20
"""),
    // ---- set ops ----
    q("U01", """
SELECT k, COUNT(*) AS n FROM (
  SELECT c_nationkey AS k FROM customer UNION SELECT s_nationkey FROM supplier) x
GROUP BY k ORDER BY k
"""),
    q("U02", """
SELECT c_nationkey AS k FROM customer INTERSECT SELECT s_nationkey FROM supplier ORDER BY k
"""),
    q("U03", """
SELECT k FROM (
  SELECT DISTINCT l_partkey AS k FROM lineitem WHERE l_quantity > 49
  EXCEPT SELECT DISTINCT l_partkey FROM lineitem WHERE l_quantity < 2) x
ORDER BY k LIMIT 100
"""),
    // ---- scalar functions ----
    q2("F01", """
SELECT c_custkey, UPPER(c_mktsegment) AS u, LOWER(c_name) AS l,
  SUBSTR(c_name, 10, 9) AS digits, LENGTH(c_name) AS len,
  REPLACE(c_name, 'Customer', 'Cust') AS rep,
  TRIM(CONCAT('  ', c_mktsegment, '  ')) AS tr,
  LPAD(CAST(c_custkey AS STRING), 8, '0') AS pad,
  SPLIT_PART(c_name, '#', 2) AS sp
FROM customer WHERE c_custkey < 10 ORDER BY c_custkey
""", """
SELECT c_custkey, UPPER(c_mktsegment) AS u, LOWER(c_name) AS l,
  SUBSTR(c_name, 10, 9) AS digits, LENGTH(c_name) AS len,
  REPLACE(c_name, 'Customer', 'Cust') AS rep,
  TRIM(CONCAT('  ', c_mktsegment, '  ')) AS tr,
  LPAD(CAST(c_custkey AS VARCHAR), 8, '0') AS pad,
  SPLIT_PART(c_name, '#', 2) AS sp
FROM customer WHERE c_custkey < 10 ORDER BY c_custkey
"""),
    q2("F02", """
SELECT c_custkey,
  REGEXP_EXTRACT(c_name, 'Customer#(\\d+)', 1) AS num,
  REGEXP_REPLACE(c_name, '0+', '0') AS squeezed,
  INSTR(c_name, '#') AS pos
FROM customer WHERE c_custkey < 10 ORDER BY c_custkey
""", """
SELECT c_custkey,
  REGEXP_EXTRACT(c_name, 'Customer#(\d+)', 1) AS num,
  REGEXP_REPLACE(c_name, '0+', '0') AS squeezed,
  STRPOS(c_name, '#') AS pos
FROM customer WHERE c_custkey < 10 ORDER BY c_custkey
"""),
    q2("F03", """
SELECT o_orderkey,
  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart,
  DATEDIFF(CAST(o_orderdate AS DATE), DATE '1995-01-01') AS dd,
  o_orderdate + INTERVAL 90 DAY AS due
FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey
""", """
SELECT o_orderkey,
  YEAR(o_orderdate) AS y, MONTH(o_orderdate) AS m, DAY(o_orderdate) AS d,
  CAST(DATE_TRUNC('month', o_orderdate) AS DATE) AS mstart,
  DATEDIFF('day', TIMESTAMP '1995-01-01', o_orderdate) AS dd,
  o_orderdate + INTERVAL 90 DAY AS due
FROM orders WHERE o_orderkey < 20 ORDER BY o_orderkey
"""),
    q("F04", """
SELECT p_partkey,
  ABS(p_retailprice - 1000) AS a, ROUND(SQRT(p_retailprice), 4) AS sq,
  CAST(FLOOR(p_retailprice) AS BIGINT) AS fl, CAST(CEIL(p_retailprice) AS BIGINT) AS ce,
  ROUND(LN(p_retailprice), 4) AS lg, ROUND(POWER(p_size, 2), 1) AS pw,
  MOD(p_partkey, 7) AS md, CAST(SIGN(p_retailprice - 1500) AS DOUBLE) AS sg
FROM part WHERE p_partkey < 15 ORDER BY p_partkey
"""),
    q("F05", """
SELECT o_orderkey,
  CASE WHEN o_totalprice > 200000 THEN 'big' WHEN o_totalprice > 50000 THEN 'mid' ELSE 'small' END AS bucket,
  COALESCE(NULLIF(o_orderstatus, 'O'), 'OPEN') AS st,
  GREATEST(YEAR(o_orderdate), 1999) AS gy, LEAST(MONTH(o_orderdate), 6) AS lm
FROM orders WHERE o_orderkey < 30 ORDER BY o_orderkey
"""),
    q2("F06", """
SELECT l_orderkey, l_linenumber,
  CAST(FLOOR(l_quantity) AS INT) AS qi,
  CAST(CAST(l_orderkey AS STRING) AS BIGINT) AS rt,
  CAST(l_linenumber AS DOUBLE) / 2 AS hd
FROM lineitem WHERE l_orderkey < 10 ORDER BY l_orderkey, l_linenumber
""", """
SELECT l_orderkey, l_linenumber,
  CAST(FLOOR(l_quantity) AS INT) AS qi,
  CAST(CAST(l_orderkey AS VARCHAR) AS BIGINT) AS rt,
  CAST(l_linenumber AS DOUBLE) / 2 AS hd
FROM lineitem WHERE l_orderkey < 10 ORDER BY l_orderkey, l_linenumber
"""),
    q2("F07", """
SELECT vec_id, size(embedding) AS dim,
  ROUND(element_at(embedding, 1), 6) AS e0,
  ROUND(aggregate(slice(embedding, 1, 8), CAST(0.0 AS DOUBLE), (s, x) -> s + x), 6) AS s8
FROM embeddings WHERE vec_id < 10 ORDER BY vec_id
""", """
SELECT vec_id, len(embedding) AS dim,
  ROUND(embedding[1], 6) AS e0,
  ROUND(list_sum(embedding[1:8]), 6) AS s8
FROM embeddings WHERE vec_id < 10 ORDER BY vec_id
"""),
    q2("F08", """
SELECT event_id, CAST(get_json_object(props, '$.k') AS INT) AS k
FROM events WHERE event_id < 20 ORDER BY event_id
""", """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS INT) AS k
FROM events WHERE event_id < 20 ORDER BY event_id
"""),
    // ---- streaming (batch-equivalent forms) ----
    q("T01", """
SELECT DATE_TRUNC('hour', ts) AS w, event_type, COUNT(*) AS n, ROUND(SUM(value), 2) AS s
FROM events WHERE user_id < 50
GROUP BY DATE_TRUNC('hour', ts), event_type ORDER BY w, event_type
"""),
    q2("T02", """
WITH slid AS (
  SELECT CAST(to_timestamp(CAST(FLOOR(unix_timestamp(ts)/1800) AS BIGINT)*1800 - o.off) AS TIMESTAMP) AS w_start, value
  FROM events, (SELECT 0 AS off UNION ALL SELECT 1800) o
  WHERE user_id < 20 AND unix_timestamp(ts) >= CAST(FLOOR(unix_timestamp(ts)/1800) AS BIGINT)*1800 - o.off
    AND unix_timestamp(ts) < CAST(FLOOR(unix_timestamp(ts)/1800) AS BIGINT)*1800 - o.off + 3600)
SELECT w_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS s
FROM slid GROUP BY w_start ORDER BY w_start
""", """
WITH slid AS (
  SELECT to_timestamp(CAST(FLOOR(epoch(ts)/1800) AS BIGINT)*1800 - o.off)::TIMESTAMP AS w_start, value
  FROM events, (SELECT 0 AS off UNION ALL SELECT 1800) o
  WHERE user_id < 20 AND epoch(ts) >= CAST(FLOOR(epoch(ts)/1800) AS BIGINT)*1800 - o.off
    AND epoch(ts) < CAST(FLOOR(epoch(ts)/1800) AS BIGINT)*1800 - o.off + 3600)
SELECT w_start, COUNT(*) AS n, ROUND(SUM(value), 2) AS s
FROM slid GROUP BY w_start ORDER BY w_start
"""),
    q("T03", """
WITH g AS (
  SELECT user_id, ts, value,
    CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) > INTERVAL 30 MINUTE
         OR LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) IS NULL THEN 1 ELSE 0 END AS brk,
    event_id
  FROM events WHERE user_id < 10),
s AS (SELECT user_id, ts, value, CAST(SUM(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS sess FROM g)
SELECT user_id, sess, COUNT(*) AS n, MIN(ts) AS s_start, MAX(ts) AS s_end, ROUND(SUM(value), 2) AS v
FROM s GROUP BY user_id, sess ORDER BY user_id, sess
"""),
    // ---- LLM-pipeline ----
    q("L01", """
SELECT COUNT(*) AS total, COUNT(DISTINCT text) AS uniq FROM documents
"""),
    q("L02", """
SELECT keep_id, n FROM (
  SELECT MIN(doc_id) AS keep_id, COUNT(*) AS n FROM documents GROUP BY text) x
WHERE n > 1 ORDER BY keep_id
"""),
    q2("L03", """
SELECT w, COUNT(*) AS n FROM (
  SELECT explode(split(text, ' ')) AS w FROM documents) x
WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20
""", """
SELECT w, COUNT(*) AS n FROM (
  SELECT unnest(str_split(text, ' ')) AS w FROM documents) x
WHERE w <> '' GROUP BY w ORDER BY n DESC, w LIMIT 20
"""),
    q2("L04", """
SELECT w, COUNT(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, explode(split(text, ' ')) AS w FROM documents) x
WHERE w <> '' GROUP BY w ORDER BY df DESC, w LIMIT 20
""", """
SELECT w, COUNT(DISTINCT doc_id) AS df FROM (
  SELECT doc_id, unnest(str_split(text, ' ')) AS w FROM documents) x
WHERE w <> '' GROUP BY w ORDER BY df DESC, w LIMIT 20
"""),
    q("L05", """
SELECT lang, COUNT(*) AS n, MIN(n_chars) AS mn, MAX(n_chars) AS mx,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY lang ORDER BY lang
"""),
    q2("L06", """
SELECT b.vec_id,
  ROUND(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (s, x) -> s + x), 6) AS cos
FROM embeddings a CROSS JOIN embeddings b
WHERE a.vec_id = 0 AND b.vec_id <> 0
ORDER BY cos DESC, b.vec_id LIMIT 5
""", """
SELECT b.vec_id, ROUND(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id = 0 AND b.vec_id <> 0
ORDER BY cos DESC, b.vec_id LIMIT 5
"""),
    q2("L07", """
SELECT a.vec_id AS i, b.vec_id AS j,
  ROUND(aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
                  CAST(0.0 AS DOUBLE), (s, x) -> s + x), 6) AS cos
FROM embeddings a JOIN embeddings b
  ON a.label = b.label AND a.vec_id < b.vec_id
WHERE aggregate(zip_with(a.embedding, b.embedding, (x, y) -> CAST(x AS DOUBLE)*CAST(y AS DOUBLE)),
                CAST(0.0 AS DOUBLE), (s, x) -> s + x) > 0.35
ORDER BY i, j
""", """
SELECT a.vec_id AS i, b.vec_id AS j,
  ROUND(list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]), 6) AS cos
FROM embeddings a, embeddings b
WHERE a.vec_id < b.vec_id AND a.label = b.label
  AND list_inner_product(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) > 0.35
ORDER BY i, j
"""),
    q2("L08", """
SELECT label, COUNT(*) AS n, ROUND(AVG(element_at(embedding, 1)), 6) AS avg_e0
FROM embeddings GROUP BY label ORDER BY label
""", """
SELECT label, COUNT(*) AS n, ROUND(AVG(embedding[1]), 6) AS avg_e0
FROM embeddings GROUP BY label ORDER BY label
""")
  )

  val byId: Map[String, ContractQuery] = all.map(c => c.id -> c).toMap
}
