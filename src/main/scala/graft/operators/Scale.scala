package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Scale machinery the reference leaves to the user and Spark makes
  * explicit: skew salting and bucketed (co-located) joins.
  *
  * At 100 TB these are the two levers that decide whether a shuffle-heavy
  * plan finishes: salting spreads a hot key over `salt` sub-keys (two-phase
  * aggregation), and bucketing pre-partitions fact tables on the join key so
  * repeated joins run with NO exchange at all (BucketingSpec asserts the
  * plan shape).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.*`, on by
  * default) handles join-side skew at runtime; explicit salting remains the
  * tool for aggregation skew and for deterministic plans.
  */
object Scale {

  /** Two-phase salted aggregation: spread each group over `salt` sub-groups,
    * partially aggregate, then merge. `aggs` must be algebraic pairs of
    * (partial, merge) expressed on the same column names — the common cases
    * are provided by [[saltedSum]]/[[saltedCount]]. */
  def saltedSum(df: DataFrame, key: Column, value: Column, salt: Int,
      keyName: String = "key", sumName: String = "sum"): DataFrame = {
    val salted = df.groupBy(key.as(keyName),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).as("_salt"))
      .agg(sum(value).as("_psum"))
    salted.groupBy(col(keyName)).agg(sum(col("_psum")).as(sumName))
  }

  def saltedCount(df: DataFrame, key: Column, salt: Int,
      keyName: String = "key", cntName: String = "n"): DataFrame = {
    val salted = df.groupBy(key.as(keyName),
        pmod(spark_partition_id() + monotonically_increasing_id(), lit(salt)).as("_salt"))
      .agg(count(lit(1)).as("_pcnt"))
    salted.groupBy(col(keyName)).agg(sum(col("_pcnt")).as(cntName))
  }

  /** Salted join against a skewed left key: replicate the (small) right side
    * `salt` times, salt the left key randomly-but-deterministically, join on
    * (key, salt). Use when one key dominates and the right side is small
    * enough to replicate but too big to broadcast whole. */
  def saltedJoin(left: DataFrame, right: DataFrame, leftKey: Column,
      rightKey: Column, salt: Int): DataFrame = {
    val saltedLeft = left.withColumn("_salt",
      pmod(xxhash64(monotonically_increasing_id()), lit(salt)))
    val saltedRight = right.crossJoin(
      spark(right).range(salt).select(col("id").cast("int").as("_salt")))
    saltedLeft.join(saltedRight,
      leftKey === rightKey && saltedLeft("_salt") === saltedRight("_salt"))
      .drop("_salt")
  }

  private def spark(df: DataFrame): SparkSession = df.sparkSession

  /** Write a bucketed+sorted table: joins and aggregations on `key` against
    * other tables bucketed the same way run WITHOUT a shuffle. Bucketing
    * metadata needs the (local) catalog; pass `path` to materialize as an
    * external table at an explicit location (otherwise the session's
    * warehouse dir). */
  def writeBucketed(df: DataFrame, table: String, key: String, buckets: Int,
      path: Option[String] = None): Unit = {
    val w = df.write.mode("overwrite").bucketBy(buckets, key).sortBy(key)
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  def readBucketed(spark: SparkSession, table: String): DataFrame =
    spark.table(table)
}
