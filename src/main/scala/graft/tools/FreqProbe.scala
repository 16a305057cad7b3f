package graft.tools
import org.apache.spark.sql.SparkSession
object FreqProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4").config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    graft.functions.GraftFunctions.register(spark)
    import org.apache.spark.sql.functions._
    spark.read.parquet("/root/testdata/sf0.01/documents.parquet")
      .select(explode(graft.functions.Portable.tokens("text")).as("token"))
      .createOrReplaceTempView("graft_tokens")
    spark.sql("""
      WITH hh AS (SELECT concat('hh_', CAST(i % 4 AS STRING)) AS token FROM (SELECT explode(sequence(0, 15999)) AS i)),
      allt AS (SELECT token FROM graft_tokens UNION ALL SELECT token FROM hh)
      SELECT c.max_error, c.stream_len FROM (SELECT graft_freq_check(token, 32) AS c FROM allt)""").show()
    spark.stop()
  }
}
