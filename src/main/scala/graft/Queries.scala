package graft

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** The oracle-checked query catalog: one entry per operator family of
  * SURVEY.md §2 (plus the large-scale training-data operators). Each query
  * has a DuckDB-equivalent SQL in [[Queries.oracle]] unless the operator is
  * not SQL-expressible (then the driver records a rows-only check).
  *
  * Numeric convention for exact oracle hashing: money/value aggregates are
  * computed in DECIMAL (exact, order-independent) and cast to DOUBLE at the
  * end, so Spark's partial/final aggregation order and DuckDB's scan order
  * produce bit-identical results.
  */
object Queries {

  def tbl(s: SparkSession, dir: String, name: String): DataFrame =
    s.read.parquet(s"$dir/$name.parquet")

  /** decimal-exact money expression */
  private def dec(c: Column): Column = c.cast("decimal(18,2)")

  // =====================================================================
  // Aggregations (SURVEY §2.5)
  // =====================================================================

  /** group_by_sum / fold_assoc family — TPC-H Q1 shaped. */
  def q1_agg(s: SparkSession, dir: String): DataFrame =
    tbl(s, dir, "lineitem")
      .groupBy(col("l_returnflag"), col("l_linestatus"))
      .agg(
        sum(dec(col("l_quantity"))).cast("double").as("sum_qty"),
        sum(dec(col("l_extendedprice"))).cast("double").as("sum_base_price"),
        sum(dec(col("l_extendedprice")) * (lit(1).cast("decimal(18,2)") - dec(col("l_discount"))))
          .cast("double").as("sum_disc_price"),
        count(lit(1)).as("count_order"))
      .orderBy(col("l_returnflag"), col("l_linestatus"))

  private val q1_sql =
    """SELECT l_returnflag, l_linestatus,
      |  CAST(sum(CAST(l_quantity AS DECIMAL(18,2))) AS DOUBLE) AS sum_qty,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE) AS sum_base_price,
      |  CAST(sum(CAST(l_extendedprice AS DECIMAL(18,2)) * (CAST(1 AS DECIMAL(18,2)) - CAST(l_discount AS DECIMAL(18,2)))) AS DOUBLE) AS sum_disc_price,
      |  count(*) AS count_order
      |FROM lineitem
      |GROUP BY l_returnflag, l_linestatus
      |ORDER BY l_returnflag, l_linestatus""".stripMargin

  // ---------------------------------------------------------------------
  // registry
  // ---------------------------------------------------------------------

  val all: Map[String, (SparkSession, String) => DataFrame] = Map(
    "q1_agg" -> (q1_agg _)
  )

  val oracle: Map[String, String] = Map(
    "q1_agg" -> q1_sql
  )
}
