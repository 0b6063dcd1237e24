package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._
import org.scalacheck.Gen
import org.scalacheck.rng.Seed

/** Property test for [[Dedup.prefixFilterPairs]]: the prefix-filter
  * equi-join (with the size AND PPJoin positional filters on) must
  * equal the brute-force all-pairs exact-Jaccard join on RANDOM
  * corpora — the losslessness theorem, exercised well beyond the
  * planted cases in DedupSpec. Corpora are drawn from a small token
  * vocabulary so overlap (and boilerplate-shingle collision) is
  * common, which is exactly the regime where a wrong positional bound
  * would drop a true pair. Fixed ScalaCheck seeds (no scalatestplus
  * bridge in the offline dependency set).
  */
class PrefixJoinPropertySpec extends SparkSpec {
  import spark.implicits._

  // ~30-token vocabulary => dense shingle collisions across docs
  private val vocab = Vector(
    "alpha", "beta", "gamma", "delta", "epsilon", "zeta", "eta", "theta",
    "iota", "kappa", "lambda", "mu", "nu", "xi", "omicron", "pi", "rho",
    "sigma", "tau", "upsilon", "phi", "chi", "psi", "omega", "data",
    "spark", "query", "join", "scan", "shuffle")

  private val docGen: Gen[String] = for {
    n <- Gen.chooseNum(1, 25)
    toks <- Gen.listOfN(n, Gen.oneOf(vocab))
  } yield toks.mkString(" ")

  private val corpusGen: Gen[List[String]] = for {
    n <- Gen.chooseNum(5, 30)
    docs <- Gen.listOfN(n, docGen)
  } yield docs

  private def sample[T](g: Gen[T], seed: Long): T =
    g.pureApply(Gen.Parameters.default, Seed(seed))

  test("property: prefix-filter join equals brute force on random overlapping corpora") {
    for (seed <- 1L to 12L) {
      val docs = sample(corpusGen, seed).zipWithIndex
        .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
      val got = Dedup.prefixFilterPairs(docs).collect()
        .map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      val sh = Dedup.withShingles(docs).select("doc_id", "shingles")
      val truth = sh.select(col("doc_id").as("a"), col("shingles").as("sa"))
        .join(sh.select(col("doc_id").as("b"), col("shingles").as("sb")), col("a") < col("b"))
        .select(col("a"), col("b"),
          (size(array_intersect(col("sa"), col("sb"))).cast("double") /
            size(array_union(col("sa"), col("sb")))).as("j"))
        .filter(col("j") >= 0.5)
        .collect().map(r => (r.getLong(0), r.getLong(1)) -> r.getDouble(2)).toMap
      assert(got == truth,
        s"seed $seed: prefix join diverged — got ${got.size}, truth ${truth.size}; " +
          s"missing ${truth.keySet -- got.keySet}, extra ${got.keySet -- truth.keySet}")
    }
  }
}
