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
    "W04" -> { c =>
      val w = Window.orderBy("p_size").rangeBetween(-2, Window.currentRow)
      c.part
        .select(col("p_partkey"), col("p_size"), count(lit(1)).over(w).as("cnt_near"))
        .orderBy("p_partkey")
        .limit(100)
    },
    "W05" -> { c =>
      val w = Window.orderBy("c_acctbal", "c_custkey")
      c.customer.filter(col("c_nationkey") === 3)
        .select(
          col("c_custkey"),
          ntile(4).over(w).as("quart"),
          round(percent_rank().over(w), 6).as("pr"),
          round(cume_dist().over(w), 6).as("cd"))
        .orderBy("c_custkey")
        .limit(100)
    },
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
