package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Deterministic uniform sampling as a typed Aggregator (the
  * UDAF surface): keep the k elements with the smallest xxhash64 —
  * a mergeable bottom-k sketch. Because membership depends only on
  * each value's hash, the sample is independent of partitioning and
  * row order (unlike reservoir sampling), so it is reproducible
  * across runs and cluster layouts; bounded state (k values) makes it
  * safe in a 100 TB group-by.
  */
object Sampling {

  type Buf = scala.collection.mutable.ArrayBuffer[(Long, String)]

  final class HashSample(k: Int) extends Aggregator[String, Buf, Seq[String]] {
    require(k >= 1)

    private def hash(s: String): Long = {
      val b = s.getBytes(java.nio.charset.StandardCharsets.UTF_8)
      org.apache.spark.sql.catalyst.expressions.XXH64
        .hashUnsafeBytes(b, org.apache.spark.unsafe.Platform.BYTE_ARRAY_OFFSET, b.length, 42L)
    }

    private def trim(b: Buf): Buf = {
      if (b.length > k) {
        val sorted = b.sortBy(_._1).take(k)
        b.clear()
        b ++= sorted
      }
      b
    }

    override def zero: Buf = new Buf()
    override def reduce(b: Buf, a: String): Buf = {
      if (a != null) b += ((hash(a), a))
      trim(b)
    }
    override def merge(b1: Buf, b2: Buf): Buf = trim(b1 ++= b2)
    override def finish(b: Buf): Seq[String] = b.sortBy(_._1).take(k).map(_._2).toSeq
    override def bufferEncoder: Encoder[Buf] = Encoders.kryo[Buf]
    override def outputEncoder: Encoder[Seq[String]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder[Seq[String]]()
  }

  /** Column function: `hash_sample(c, k)` usable in `agg(...)`. */
  def hash_sample(c: Column, k: Int): Column = udaf(new HashSample(k)).apply(c)
}
