package graft.ingest

import graft.SparkSpec
import graft.ingest.TinyParquet._

/** TinyParquet is the driver-side vehicle for the engine's bounded
  * state manifests; its files must stay interchangeable with what
  * Spark's parquet source writes and reads — both directions — or a
  * manifest written by one path would silently desync a reader on the
  * other.
  */
class TinyParquetSpec extends SparkSpec {

  private val conf = spark.sparkContext.hadoopConfiguration

  private val cols = Seq(IntCol("i"), LongCol("l"), DoubleCol("d"),
    StringCol("s"), DoubleArrayCol("da"), LongArrayCol("la"))
  private val rows: Seq[Seq[Any]] = Seq(
    Seq(1, 2L, 3.5, "a", Seq(1.0, -0.0, 2.25), Seq(7L, 8L)),
    Seq(-4, Long.MaxValue, -1.25e300, "", Seq.empty[Double], Seq(0L)))

  test("spark.read.parquet reads a TinyParquet-written manifest value-exactly") {
    val dir = tmpDir("tinyparquet_w").toString
    TinyParquet.write(dir, conf, cols, rows)
    val back = spark.read.parquet(dir).orderBy("i").collect()
    assert(back.length == 2)
    val r = back.find(_.getInt(0) == 1).get
    assert(r.getLong(1) == 2L && r.getDouble(2) == 3.5 && r.getString(3) == "a")
    assert(r.getSeq[Double](4) == Seq(1.0, -0.0, 2.25))
    assert(r.getSeq[Long](5) == Seq(7L, 8L))
    val r2 = back.find(_.getInt(0) == -4).get
    assert(r2.getLong(1) == Long.MaxValue && r2.getDouble(2) == -1.25e300)
    assert(r2.getString(3) == "" && r2.getSeq[Double](4).isEmpty &&
      r2.getSeq[Long](5) == Seq(0L))
  }

  test("TinyParquet reads a Spark-written manifest value-exactly (old state dirs)") {
    import spark.implicits._
    val dir = tmpDir("tinyparquet_r").toString
    Seq((16, 8, Seq(0.5, 1.5), "hll"), (17, 9, Seq(2.5), "cms"))
      .toDF("a", "b", "v", "k")
      .coalesce(1).write.mode("overwrite").parquet(dir)
    val got = TinyParquet.read(dir, conf,
        Seq(IntCol("a"), IntCol("b"), DoubleArrayCol("v"), StringCol("k")))
      .sortBy(_.head.asInstanceOf[Int])
    assert(got == Seq(
      Seq(16, 8, Seq(0.5, 1.5), "hll"),
      Seq(17, 9, Seq(2.5), "cms")))
  }

  test("write replaces: a second write leaves exactly the new rows") {
    val dir = tmpDir("tinyparquet_o").toString
    TinyParquet.write(dir, conf, Seq(IntCol("x")), Seq(Seq(1), Seq(2)))
    TinyParquet.write(dir, conf, Seq(IntCol("x")), Seq(Seq(9)))
    assert(TinyParquet.read(dir, conf, Seq(IntCol("x"))) == Seq(Seq(9)))
    assert(spark.read.parquet(dir).collect().map(_.getInt(0)).toSeq == Seq(9))
  }
}
