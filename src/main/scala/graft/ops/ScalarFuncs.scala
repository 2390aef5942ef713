package graft.ops

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Scalar-function parity packs: the string/date/math/array/window
  * function surface a user migrating from the reference's SQL layer
  * would reach for. Each pack is one oracle-graded query exercising
  * several functions with engine-identical semantics.
  *
  * Functions with engine-DIVERGENT semantics are deliberately handled:
  * DuckDB `dayofweek` is 0-based (Sun=0) vs Spark's 1-based — the
  * oracle adds 1; transcendental libm functions (log/exp/pow) are NOT
  * correctly-rounded and may differ in the last ulp between libms, so
  * the math pack sticks to exact ops (abs/ceil/floor/round/mod) and
  * IEEE-correctly-rounded sqrt.
  */
object ScalarFuncs {

  def stringFuncs(s: SparkSession, d: String): DataFrame =
    Tables.customer(s, d)
      .select(col("c_custkey"),
        upper(col("c_name")).as("up"),
        lower(col("c_name")).as("lo"),
        substring(col("c_name"), 1, 8).as("sub"),
        lpad(col("c_custkey").cast("string"), 8, "0").as("padded"),
        concat_ws("|", col("c_mktsegment"), col("c_name")).as("joined"),
        length(col("c_name")).as("len"),
        reverse(col("c_name")).as("rev"),
        translate(col("c_name"), "#", "-").as("tr"),
        regexp_replace(col("c_name"), "[0-9]+", "N").as("masked"))
      .orderBy(col("c_custkey"))

  def dateFuncs(s: SparkSession, d: String): DataFrame =
    Tables.orders(s, d)
      .select(col("o_orderkey"),
        year(col("o_orderdate")).as("yr"),
        quarter(col("o_orderdate")).as("qtr"),
        month(col("o_orderdate")).as("mth"),
        dayofmonth(col("o_orderdate")).as("dom"),
        dayofweek(col("o_orderdate")).as("dow"),
        date_add(col("o_orderdate").cast("date"), 30).cast("string").as("plus30"),
        last_day(col("o_orderdate")).cast("string").as("eom"),
        datediff(lit("2002-01-01").cast("date"),
          col("o_orderdate").cast("date")).as("days_to_2002"))
      .orderBy(col("o_orderkey"))

  def mathFuncs(s: SparkSession, d: String): DataFrame =
    Tables.lineitem(s, d)
      .select(col("l_orderkey"), col("l_linenumber"),
        abs(col("l_quantity") - 25).as("dist25"),
        ceil(col("l_extendedprice") / 1000).cast("long").as("price_k_ceil"),
        floor(col("l_extendedprice") / 1000).cast("long").as("price_k_floor"),
        round(col("l_extendedprice") / 7, 2).as("seventh"),
        (col("l_orderkey") % 97).as("mod97"),
        sqrt(col("l_quantity")).as("root_qty"),
        greatest(col("l_discount"), col("l_tax")).as("max_rate"),
        least(col("l_discount"), col("l_tax")).as("min_rate"))
      .orderBy(col("l_orderkey"), col("l_linenumber"))

  def arrayFuncs(s: SparkSession, d: String): DataFrame =
    Tables.documents(s, d)
      .withColumn("toks", split(col("text"), " "))
      .select(col("doc_id"),
        size(col("toks")).as("n_tokens"),
        size(array_distinct(col("toks"))).as("n_distinct"),
        concat_ws(",", slice(sort_array(array_distinct(col("toks"))), 1, 3))
          .as("first3"),
        array_contains(col("toks"), "spark").cast("boolean").as("has_spark"),
        element_at(col("toks"), 1).as("first_tok"))
      .orderBy(col("doc_id"))

  /** Ranking-function pack: rank / dense_rank / ntile / percent_rank /
    * cume_dist with fully tie-broken ordering. */
  def rankFuncs(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_orderpriority"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey"))
    Tables.orders(s, d)
      .select(col("o_orderpriority"), col("o_orderkey"),
        rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        ntile(4).over(w).as("quartile"),
        percent_rank().over(w).as("pct_rank"),
        cume_dist().over(w).as("cume"))
      .orderBy(col("o_orderpriority"), col("rnk"), col("o_orderkey"))
  }

  /** Offset-function pack: lag / lead / first_value / last_value /
    * nth_value over each customer's order timeline, plus the
    * inter-order gap in days — the "previous row" surface that
    * complements [[rankFuncs]]. Frame note: the value offsets use the
    * explicit full frame (unbounded both ways); lag/lead ignore
    * frames by definition. */
  def lagLead(s: SparkSession, d: String): DataFrame = {
    val w = Window.partitionBy(col("o_custkey"))
      .orderBy(col("o_orderdate"), col("o_orderkey"))
    val wf = w.rowsBetween(Window.unboundedPreceding,
      Window.unboundedFollowing)
    Tables.orders(s, d)
      .select(col("o_custkey"), col("o_orderkey"), col("o_orderdate"),
        lag(col("o_totalprice"), 1).over(w).as("prev_price"),
        lead(col("o_totalprice"), 1).over(w).as("next_price"),
        first(col("o_orderkey")).over(wf).as("first_key"),
        last(col("o_orderkey")).over(wf).as("last_key"),
        nth_value(col("o_orderkey"), 2).over(wf).as("second_key"),
        datediff(col("o_orderdate"),
          lag(col("o_orderdate"), 1).over(w)).as("gap_days"))
      .orderBy(col("o_custkey"), col("o_orderdate"), col("o_orderkey"))
  }

  val queries: Map[String, (SparkSession, String) => DataFrame] = Map(
    "func_string" -> stringFuncs,
    "window_lag_lead" -> lagLead,
    "func_date" -> dateFuncs,
    "func_math" -> mathFuncs,
    "func_array" -> arrayFuncs,
    "window_rank_funcs" -> rankFuncs,
  )

  val oracles: Map[String, String] = Map(
    "func_string" ->
      """SELECT c_custkey, upper(c_name) AS up, lower(c_name) AS lo,
        |  substr(c_name, 1, 8) AS sub,
        |  lpad(CAST(c_custkey AS VARCHAR), 8, '0') AS padded,
        |  concat_ws('|', c_mktsegment, c_name) AS joined,
        |  CAST(length(c_name) AS INT) AS len,
        |  reverse(c_name) AS rev,
        |  translate(c_name, '#', '-') AS tr,
        |  regexp_replace(c_name, '[0-9]+', 'N', 'g') AS masked
        |FROM customer ORDER BY c_custkey""".stripMargin,
    "func_date" ->
      """SELECT o_orderkey,
        |  CAST(year(o_orderdate) AS INT) AS yr,
        |  CAST(quarter(o_orderdate) AS INT) AS qtr,
        |  CAST(month(o_orderdate) AS INT) AS mth,
        |  CAST(dayofmonth(o_orderdate) AS INT) AS dom,
        |  CAST(dayofweek(o_orderdate) + 1 AS INT) AS dow,
        |  CAST(CAST(o_orderdate AS DATE) + 30 AS VARCHAR) AS plus30,
        |  CAST(last_day(CAST(o_orderdate AS DATE)) AS VARCHAR) AS eom,
        |  CAST(datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS INT)
        |    AS days_to_2002
        |FROM orders ORDER BY o_orderkey""".stripMargin,
    "func_math" ->
      """SELECT l_orderkey, l_linenumber,
        |  abs(l_quantity - 25) AS dist25,
        |  CAST(ceil(l_extendedprice / 1000) AS BIGINT) AS price_k_ceil,
        |  CAST(floor(l_extendedprice / 1000) AS BIGINT) AS price_k_floor,
        |  round(l_extendedprice / 7, 2) AS seventh,
        |  l_orderkey % 97 AS mod97,
        |  sqrt(l_quantity) AS root_qty,
        |  greatest(l_discount, l_tax) AS max_rate,
        |  least(l_discount, l_tax) AS min_rate
        |FROM lineitem ORDER BY l_orderkey, l_linenumber""".stripMargin,
    "func_array" ->
      """SELECT doc_id,
        |  CAST(len(string_split(text, ' ')) AS INT) AS n_tokens,
        |  CAST(len(list_distinct(string_split(text, ' '))) AS INT) AS n_distinct,
        |  array_to_string(list_sort(list_distinct(string_split(text, ' ')))[1:3], ',')
        |    AS first3,
        |  list_contains(string_split(text, ' '), 'spark') AS has_spark,
        |  string_split(text, ' ')[1] AS first_tok
        |FROM documents ORDER BY doc_id""".stripMargin,
    "window_lag_lead" ->
      """SELECT o_custkey, o_orderkey, o_orderdate,
        |  lag(o_totalprice, 1) OVER w AS prev_price,
        |  lead(o_totalprice, 1) OVER w AS next_price,
        |  first_value(o_orderkey) OVER wf AS first_key,
        |  last_value(o_orderkey) OVER wf AS last_key,
        |  nth_value(o_orderkey, 2) OVER wf AS second_key,
        |  CAST(datediff('day',
        |    lag(CAST(o_orderdate AS DATE), 1) OVER w,
        |    CAST(o_orderdate AS DATE)) AS INT) AS gap_days
        |FROM orders
        |WINDOW w AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey),
        |  wf AS (PARTITION BY o_custkey
        |    ORDER BY o_orderdate, o_orderkey
        |    ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
        |ORDER BY o_custkey, o_orderdate, o_orderkey""".stripMargin,
    "window_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey,
        |  CAST(rank() OVER w AS BIGINT) AS rnk,
        |  CAST(dense_rank() OVER w AS BIGINT) AS drnk,
        |  CAST(ntile(4) OVER w AS INT) AS quartile,
        |  percent_rank() OVER w AS pct_rank,
        |  cume_dist() OVER w AS cume
        |FROM orders
        |WINDOW w AS (PARTITION BY o_orderpriority
        |  ORDER BY o_totalprice DESC, o_orderkey)
        |ORDER BY o_orderpriority, rnk, o_orderkey""".stripMargin,
  )
}
