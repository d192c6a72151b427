package graft.ops

import java.time.LocalDate

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.DateType

/** DataFrame (E2) forms of the scalar-function contract queries.
  * All built-in `org.apache.spark.sql.functions` — codegen'd column
  * expressions, no UDFs (SURVEY.md §4: functions, not UDFs).
  */
object ScalarQueries {

  val queries: Map[String, Catalog => DataFrame] = Map(
    "F01" -> { c =>
      c.customer.filter(col("c_custkey") < 10)
        .select(
          col("c_custkey"),
          upper(col("c_mktsegment")).as("u"),
          lower(col("c_name")).as("l"),
          substring(col("c_name"), 10, 9).as("digits"),
          length(col("c_name")).as("len"),
          replace(col("c_name"), lit("Customer"), lit("Cust")).as("rep"),
          trim(concat(lit("  "), col("c_mktsegment"), lit("  "))).as("tr"),
          lpad(col("c_custkey").cast("string"), 8, "0").as("pad"),
          split_part(col("c_name"), lit("#"), lit(2)).as("sp"))
        .orderBy("c_custkey")
    },
    "F02" -> { c =>
      c.customer.filter(col("c_custkey") < 10)
        .select(
          col("c_custkey"),
          regexp_extract(col("c_name"), "Customer#(\\d+)", 1).as("num"),
          regexp_replace(col("c_name"), "0+", "0").as("squeezed"),
          instr(col("c_name"), "#").as("pos"))
        .orderBy("c_custkey")
    },
    "F03" -> { c =>
      c.orders.filter(col("o_orderkey") < 20)
        .select(
          col("o_orderkey"),
          year(col("o_orderdate")).as("y"),
          month(col("o_orderdate")).as("m"),
          dayofmonth(col("o_orderdate")).as("d"),
          date_trunc("month", col("o_orderdate")).cast(DateType).as("mstart"),
          datediff(col("o_orderdate").cast(DateType), lit(LocalDate.of(1995, 1, 1))).as("dd"),
          (col("o_orderdate") + expr("INTERVAL 90 DAY")).as("due"))
        .orderBy("o_orderkey")
    },
    "F04" -> { c =>
      c.part.filter(col("p_partkey") < 15)
        .select(
          col("p_partkey"),
          abs(col("p_retailprice") - 1000).as("a"),
          round(sqrt(col("p_retailprice")), 4).as("sq"),
          floor(col("p_retailprice")).as("fl"),
          ceil(col("p_retailprice")).as("ce"),
          round(log(col("p_retailprice")), 4).as("lg"),
          round(pow(col("p_size"), 2), 1).as("pw"),
          (col("p_partkey") % 7).as("md"),
          signum(col("p_retailprice") - 1500).as("sg"))
        .orderBy("p_partkey")
    },
    "F05" -> { c =>
      c.orders.filter(col("o_orderkey") < 30)
        .select(
          col("o_orderkey"),
          when(col("o_totalprice") > 200000, "big")
            .when(col("o_totalprice") > 50000, "mid")
            .otherwise("small").as("bucket"),
          coalesce(nullif(col("o_orderstatus"), lit("O")), lit("OPEN")).as("st"),
          greatest(year(col("o_orderdate")), lit(1999)).as("gy"),
          least(month(col("o_orderdate")), lit(6)).as("lm"))
        .orderBy("o_orderkey")
    },
    // F06 — H2: explicit FLOOR before the int cast (Spark truncates,
    // DuckDB rounds — FLOOR makes both exact).
    "F06" -> { c =>
      c.lineitem.filter(col("l_orderkey") < 10)
        .select(
          col("l_orderkey"), col("l_linenumber"),
          floor(col("l_quantity")).cast("int").as("qi"),
          col("l_orderkey").cast("string").cast("bigint").as("rt"),
          (col("l_linenumber").cast("double") / 2).as("hd"))
        .orderBy("l_orderkey", "l_linenumber")
    },
    // F07 — array ops via higher-order functions (codegen-friendly, no
    // UDF): aggregate() folds in double exactly like the SQL form.
    "F07" -> { c =>
      c.embeddings.filter(col("vec_id") < 10)
        .select(
          col("vec_id"),
          size(col("embedding")).as("dim"),
          round(element_at(col("embedding"), 1), 6).as("e0"),
          round(
            aggregate(slice(col("embedding"), 1, 8), lit(0.0).cast("double"), (s, x) => s + x),
            6).as("s8"))
        .orderBy("vec_id")
    },
    "F08" -> { c =>
      c.events.filter(col("event_id") < 20)
        .select(
          col("event_id"),
          get_json_object(col("props"), "$.k").cast("int").as("k"))
        .orderBy("event_id")
    }
  )
}
