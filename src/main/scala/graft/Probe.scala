package graft
import org.apache.spark.sql.functions._

/** Scratch driver for manual end-to-end runs (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("4").getOrCreate()
    val emb = spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
    // sequential left-fold dot(v,v) in double — compare bits vs duckdb list_sum
    val dot = expr(
      "aggregate(zip_with(embedding, embedding, (x, y) -> cast(x as double) * cast(y as double)), cast(0.0 as double), (acc, v) -> acc + v)")
    emb.select(col("vec_id"), dot.as("norm2"))
      .orderBy("vec_id")
      .coalesce(1).write.mode("overwrite").parquet("/tmp/probe_norm2")
    spark.stop()
  }
}
