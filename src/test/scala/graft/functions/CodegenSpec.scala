package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions.col

/** Runs every custom expression with codegen fallback DISABLED: a
  * generated kernel that fails to compile must throw here, not silently
  * degrade to the interpreted path (which the other suites would mask).
  */
class CodegenSpec extends SparkSpec {

  private def withStrictCodegen[T](body: => T): T = {
    val prev = spark.conf.getOption("spark.sql.codegen.fallback")
    spark.conf.set("spark.sql.codegen.fallback", "false")
    try body
    finally prev match {
      case Some(v) => spark.conf.set("spark.sql.codegen.fallback", v)
      case None => spark.conf.unset("spark.sql.codegen.fallback")
    }
  }

  test("all custom expressions compile and evaluate under strict codegen") {
    withStrictCodegen {
      val docs = graft.sources.Tables(spark, sf0001).documents.limit(50)
      val planes = VectorFunctions.randomPlanes(4, 64)
      val centroids = Array.fill(3)(Array.fill(64)(0.1))
      val out = docs
        .select(col("doc_id"), col("text"),
          TextExpressions.tokens(col("text")).as("toks"),
          TextExpressions.word_shingles(col("text"), 3).as("sh"),
          TextExpressions.winnow_fingerprint(col("text"), 8, 4).as("fp"))
        .select(col("doc_id"),
          TextExpressions.minhash_signature(col("sh"), 16).as("sig"),
          TextExpressions.simhash64(col("toks")).as("simhash"),
          TextExpressions.stopword_count(col("toks"), Seq("the", "a", "and")).as("stops"),
          org.apache.spark.sql.functions.size(col("fp")).as("n_fp"))
        .collect()
      assert(out.length == 50)
      assert(out.exists(_.getAs[Long]("stops") > 0))
      assert(out.forall(_.getAs[Seq[Long]]("sig").length == 16))

      // bloom probe: no false negatives on inserted members, and the
      // generated probe agrees with the driver-side sketch
      val texts = docs.select(col("text")).collect().map(_.getString(0))
      val members = texts.take(10).toSet
      val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.001)
      members.foreach(bloom.putString)
      val probed = docs
        .select(col("text"), TextExpressions.bloom_might_contain(col("text"), bloom).as("hit"))
        .collect()
      assert(probed.length == 50)
      probed.foreach { r =>
        if (members(r.getString(0))) assert(r.getBoolean(1), "bloom false negative")
        assert(r.getBoolean(1) == bloom.mightContainString(r.getString(0)))
      }

      val emb = graft.sources.Tables(spark, sf0001).embeddings.limit(20)
        .select(col("vec_id"), VectorFunctions.asDouble(col("embedding")).as("v"))
        .select(col("vec_id"),
          TextExpressions.lsh_sign_bits(col("v"), planes).as("bits"),
          TextExpressions.nearest_centroids(col("v"), centroids, 2).as("cells"))
        .collect()
      assert(emb.length == 20)
      assert(emb.forall(_.getAs[Seq[Int]]("cells").length == 2))
    }
  }

  test("DotProduct under strict codegen is bit-equal to the interpreted HOF fold") {
    withStrictCodegen {
      import org.apache.spark.sql.functions._
      val pairs = graft.sources.Tables(spark, sf0001).embeddings.limit(30)
        .select(VectorFunctions.asDouble(col("embedding")).as("a"))
        .crossJoin(graft.sources.Tables(spark, sf0001).embeddings.limit(3)
          .select(VectorFunctions.asDouble(col("embedding")).as("b")))
      val out = pairs.select(
          TextExpressions.dot_product(col("a"), col("b")).as("compiled"),
          aggregate(zip_with(col("a"), col("b"), (x, y) => x * y),
            lit(0.0), (acc, v) => acc + v).as("interpreted"))
        .collect()
      assert(out.length == 90)
      // the compiled kernel must reproduce the sequential fold EXACTLY
      // (same summation order) — this is what licenses swapping it into
      // every oracle-checked cosine path
      out.foreach(r => assert(r.getDouble(0) == r.getDouble(1),
        s"${r.getDouble(0)} != ${r.getDouble(1)}"))
    }
  }

  test("DotProduct poisons ragged or null-element arrays to NULL, like the fold") {
    withStrictCodegen {
      import org.apache.spark.sql.functions._
      import spark.implicits._
      val df = Seq(
        (Seq(1.0, 2.0), Seq(3.0, 4.0)),          // well-formed -> 11.0
        (Seq(1.0, 2.0, 3.0), Seq(1.0, 1.0)),     // ragged -> null
      ).toDF("a", "b")
        .union(Seq((Seq(1.0, 2.0), null.asInstanceOf[Seq[Double]])).toDF("a", "b"))
      val out = df.select(TextExpressions.dot_product(col("a"), col("b")).as("d")).collect()
      assert(out(0).getDouble(0) == 11.0)
      assert(out(1).isNullAt(0), "length mismatch must yield NULL, not a partial sum")
      assert(out(2).isNullAt(0), "null operand must yield NULL")
    }
  }
}
