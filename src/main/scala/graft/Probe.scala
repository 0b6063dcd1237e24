package graft
import org.apache.spark.sql.functions._
import graft.sources.Tables

/** Scratch driver for manual end-to-end runs (not part of the API). */
object Probe {
  def main(args: Array[String]): Unit = {
    val spark = GraftSession.builder("32").getOrCreate()
    val docs = Tables(spark, "/root/testdata/sf0.1").documents
    def time(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"$name%-30s ${(System.nanoTime() - t0) / 1e9}%6.2f s  (rows=$n)")
    }
    time("warmup count")(docs.count())
    val sh = graft.operators.Dedup.withShingles(docs).select("doc_id", "shingles")
    time("shingles")(sh.count())
    time("shingles size sum")(sh.select(sum(size(col("shingles")))).collect().head.getLong(0))
    val expl = sh.select(col("doc_id"), explode(col("shingles")).as("s"))
    time("explode")(expl.count())
    val sigs = expl.groupBy(col("doc_id"))
      .agg(min(xxhash64(col("s"), lit(0))).as("sig_0"),
        (1 until 32).map(j => min(xxhash64(col("s"), lit(j))).as(s"sig_$j")): _*)
    time("sigs")(sigs.count())
    time("full minhashPairs")(graft.operators.Dedup.minhashPairs(docs).count())
    spark.stop()
  }
}
