package graft.ops

import java.time.LocalDateTime

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DecimalType

/** DataFrame (E2) forms of the aggregation contract queries.
  *
  * All go through `groupBy/rollup/cube/groupingSets().agg()` →
  * HashAggregateExec partial→final (the MapReduce combiner for free,
  * SURVEY.md §2.1). Money math follows H3: per-column exact DECIMAL(12,2)
  * casts, decimal products (scale grows 2→4→6), ROUND at the end.
  */
object AggregateQueries {

  val queries: Map[String, Catalog => DataFrame] = Map(
    // A01 — TPC-H Q1 pricing summary in exact decimal arithmetic.
    "A01" -> { c =>
      val price = col("l_extendedprice").cast(DecimalType(12, 2))
      val disc = (lit(1) - col("l_discount")).cast(DecimalType(12, 2))
      val tax = (lit(1) + col("l_tax")).cast(DecimalType(12, 2))
      // single-row-group rescue (Scale.spreadForCompute): the decimal
      // partial aggregation is the cost and runs on the scan's task
      // count — 1–3 tasks over a small file at any core count. Spread
      // by the high-cardinality l_orderkey; every aggregate below is
      // exact under partitioning (decimal sums, counts, and
      // sum(l_quantity) is integer-valued-double arithmetic ≪ 2^53),
      // so the result is bit-identical. No-op at scale (scan splits
      // already exceed the session parallelism).
      Scale.spreadForCompute(
        c.lineitem
          .filter(col("l_shipdate") <= lit(LocalDateTime.of(2001, 9, 1, 0, 0))),
        col("l_orderkey"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
          sum(floor(col("l_quantity")).cast("bigint")).as("sum_qty"),
          // decimal math (H3), DOUBLE at the surface: exact for ≤2-decimal
          // money values and renders identically to the DuckDB oracle.
          round(sum(price), 2).cast("double").as("sum_base"),
          round(sum(price * disc), 2).cast("double").as("sum_disc"),
          round(sum(price * disc * tax), 2).cast("double").as("sum_charge"),
          round(sum(col("l_quantity")) / count(lit(1)), 4).as("avg_qty"),
          count(lit(1)).as("n"))
        .orderBy("l_returnflag", "l_linestatus")
    },
    // A02/A03 — distinct aggregates; Catalyst's RewriteDistinctAggregates
    // expands to a two-phase plan (map-side partial distinct first).
    "A02" -> { c =>
      c.orders.groupBy("o_orderpriority")
        .agg(countDistinct(col("o_custkey")).as("nd"), count(lit(1)).as("n"))
        .orderBy("o_orderpriority")
    },
    "A03" -> { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(
          countDistinct(col("l_partkey")).as("ndp"),
          countDistinct(col("l_suppkey")).as("nds"))
        .orderBy("l_returnflag")
    },
    // A04/A05/A06 — grouping-set family → a single Expand + aggregate.
    "A04" -> { c =>
      // rollup via expr(): name- or col()-based grouping columns over a
      // join trip Spark's ambiguous-column detection (dataset-id tags on
      // the pre- vs post-Expand lineage); unresolved attributes don't
      c.customer
        .join(broadcast(c.nation), col("c_nationkey") === col("n_nationkey"))
        .join(broadcast(c.region), col("n_regionkey") === col("r_regionkey"))
        .rollup(expr("r_name"), expr("n_name"))
        .agg(
          grouping(expr("r_name")).as("g_r"), grouping(expr("n_name")).as("g_n"),
          count(lit(1)).as("n"))
        .select("g_r", "g_n", "r_name", "n_name", "n")
        .orderBy(col("g_r"), col("g_n"),
          col("r_name").asc_nulls_first, col("n_name").asc_nulls_first)
    },
    "A05" -> { c =>
      c.orders
        .cube("o_orderstatus", "o_orderpriority")
        .agg(
          grouping("o_orderstatus").as("gs"), grouping("o_orderpriority").as("gp"),
          count(lit(1)).as("n"))
        .select("gs", "gp", "o_orderstatus", "o_orderpriority", "n")
        .orderBy(col("gs"), col("gp"),
          col("o_orderstatus").asc_nulls_first, col("o_orderpriority").asc_nulls_first)
    },
    "A06" -> { c =>
      c.customer
        .groupingSets(
          Seq(Seq(col("c_mktsegment")), Seq(col("c_nationkey"))),
          col("c_mktsegment"), col("c_nationkey"))
        .agg(
          grouping("c_mktsegment").as("gm"), grouping("c_nationkey").as("gn"),
          round(sum(col("c_acctbal").cast(DecimalType(18, 4))), 2).cast("double").as("bal"))
        .select("gm", "gn", "c_mktsegment", "c_nationkey", "bal")
        .orderBy(col("gm"), col("gn"),
          col("c_mktsegment").asc_nulls_first, col("c_nationkey").asc_nulls_first)
    },
    // A07 — HAVING = filter over the aggregate.
    "A07" -> { c =>
      c.customer.groupBy("c_nationkey")
        .agg(
          count(lit(1)).as("n"),
          round(sum(col("c_acctbal").cast(DecimalType(18, 4))), 2).cast("double").as("bal"))
        .filter(col("n") > 50)
        .orderBy("c_nationkey")
    },
    // A08 — global (no-group) aggregate; min/max on strings + timestamps.
    "A08" -> { c =>
      c.orders.agg(
        count(lit(1)).as("n"),
        min("o_orderpriority").as("mnp"), max("o_orderpriority").as("mxp"),
        min("o_orderdate").as("mnd"), max("o_orderdate").as("mxd"))
    },
    // A09 — statistical moments (single-pass partial aggregation).
    "A09" -> { c =>
      c.lineitem.groupBy("l_returnflag")
        .agg(
          round(stddev_samp(col("l_quantity")), 4).as("sd"),
          round(var_samp(col("l_discount")), 6).as("vr"),
          round(corr(col("l_quantity"), col("l_extendedprice")), 4).as("cr"))
        .orderBy("l_returnflag")
    },
    // A10 — scalar subquery: 1-row aggregate broadcast against the scan
    // (never a driver-side collect).
    "A10" -> { c =>
      val avgPrice = c.part.agg(avg("p_retailprice").as("ap"))
      c.part.crossJoin(broadcast(avgPrice))
        .filter(col("p_retailprice") > col("ap"))
        .agg(count(lit(1)).as("n"))
    }
  )
}
