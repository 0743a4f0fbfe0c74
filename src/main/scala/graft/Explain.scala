package graft
import org.apache.spark.sql.SparkSession
object Explain {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.ui.enabled","false")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.sql.ansi.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = "/root/testdata/sf0.01"
    println("=== q_filter ===")
    Queries.q_filter(spark, dir).explain("formatted")
    println("=== q_join_inner ===")
    Queries.q_join_inner(spark, dir).explain("formatted")
    println("=== q_map ===")
    Queries.q_map(spark, dir).explain("formatted")
    spark.stop()
  }
}
