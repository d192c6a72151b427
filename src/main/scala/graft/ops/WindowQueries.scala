package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DataFrame (E2) forms of the window-function contract queries.
  * One `Exchange hashpartitioning(partition keys)` + in-partition sort
  * per distinct (partitionBy, orderBy) pair; every ORDER BY carries a
  * unique tiebreaker so results are total-ordered (determinism).
  */
object WindowQueries {

  val queries: Map[String, Catalog => DataFrame] = Map(
    "W01" -> { c =>
      val w = Window.partitionBy("c_mktsegment")
        .orderBy(col("c_acctbal").desc, col("c_custkey"))
      c.customer
        .select(
          col("c_mktsegment"), col("c_custkey"),
          row_number().over(w).as("rn"),
          rank().over(w).as("rk"),
          dense_rank().over(w).as("drk"))
        .filter(col("rn") <= 3)
        .orderBy("c_mktsegment", "rn")
    },
    "W02" -> { c =>
      val w = Window.partitionBy("user_id").orderBy("ts", "event_id")
      c.events.filter(col("user_id") < 5)
        .select(
          col("user_id"), col("event_id"),
          lag("event_id", 1).over(w).as("prev_id"),
          lead("event_id", 1).over(w).as("next_id"))
        .orderBy("user_id", "ts", "event_id")
        .limit(200)
    },
    "W03" -> { c =>
      val base = Window.partitionBy("user_id").orderBy("ts", "event_id")
      val run = base.rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val mov = base.rowsBetween(-3, Window.currentRow)
      c.events.filter(col("user_id") < 3)
        .select(
          col("user_id"), col("event_id"),
          round(sum("value").over(run), 2).as("run_sum"),
          round(avg("value").over(mov), 4).as("mov_avg"))
        .orderBy("user_id", "ts", "event_id")
        .limit(200)
    },
    // W04 — RANGE frame on a numeric key (value-based, not row-based).
    // Served by the compressed-domain formulation: the certified SQL
    // form (Contract E1) pins the semantics, but its plan is a single-
    // partition WindowExec — a 100 TB straggler. ScalableWindowsSpec
    // pins hash-equality of the two forms; PlanAuditSpec pins that no
    // contract plan carries an unpartitioned window.
    "W04" -> { c => ScalableWindows.w04Scalable(c.part) },
    // W05 — global rank family, served by the two-pass bucketed global
    // row-number (same hash-equality + plan pins as W04).
    "W05" -> { c => ScalableWindows.w05Scalable(c.customer) },
    "W06" -> { c =>
      val w = Window.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
      c.orders.filter(col("o_custkey") < 20)
        .select(
          col("o_custkey"), col("o_orderkey"),
          first("o_orderkey").over(w).as("first_o"),
          last("o_orderkey").over(w).as("last_o"),
          nth_value(col("o_orderkey"), 2).over(w).as("second_o"))
        .orderBy("o_custkey", "o_orderkey")
        .limit(200)
    }
  )
}
