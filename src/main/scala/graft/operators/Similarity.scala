package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables
import graft.functions.VectorFunctions._

/** Approximate-nearest-neighbor search over the `embeddings` table
  * (north-star LLM-pipeline additions, SURVEY.md §2C).
  *
  *  - [[bruteTopK]]: exact baseline — broadcast the (small) query set
  *    against the corpus, score with codegen'd double-precision folds,
  *    per-query top-k via window rank. One corpus scan, no shuffle
  *    except the final rank; linear in corpus × queries.
  *  - [[lshTopK]]: the scale path — sign-bit LSH restricts scoring to
  *    same-bucket candidates (contrast with brute force's full scan);
  *    recall measured against the baseline in ScalaTest.
  *
  * Cosine scores are bit-deterministic (sequential double fold,
  * verified equal to DuckDB's list arithmetic) which is what lets the
  * brute-force query be oracle-checked including rank order.
  */
object Similarity {

  def bruteTopK(emb: DataFrame, nQueries: Int = 3, k: Int = 5): DataFrame = {
    val q = emb.filter(col("vec_id") < nQueries)
      .select(col("vec_id").as("qid"), asDouble(col("embedding")).as("qv"))
    val c = emb.select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), col("qid") =!= col("cid"))
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim", "rn")
      .orderBy("qid", "rn")
  }

  /** Multi-table sign-bit LSH: `tables` independent hash tables of
    * `bitsPerTable` hyperplane sign bits each; a candidate is scored if
    * it shares a bucket with the query in ANY table (union over tables
    * raises recall — the standard LSH recall/cost dial). Candidates per
    * query ≈ tables · corpus / 2^bits, versus the full corpus for brute
    * force.
    */
  def lshTopK(emb: DataFrame, nQueries: Int = 3, k: Int = 5,
      bitsPerTable: Int = 4, tables: Int = 8, dim: Int = 64): DataFrame = {
    val allPlanes = randomPlanes(bitsPerTable * tables, dim)
    val bucketCols = (0 until tables).map { t =>
      struct(lit(t).as("t"),
        lshBucket(col("cv"), allPlanes.slice(t * bitsPerTable, (t + 1) * bitsPerTable)).as("h"))
    }
    val c = emb.select(col("vec_id").as("cid"), asDouble(col("embedding")).as("cv"))
      .withColumn("bucket", explode(array(bucketCols: _*)))
    val q = c.filter(col("cid") < nQueries)
      .select(col("cid").as("qid"), col("cv").as("qv"), col("bucket"))
    val w = Window.partitionBy(col("qid")).orderBy(col("sim").desc, col("cid"))
    c.join(broadcast(q), Seq("bucket"))
      .filter(col("qid") =!= col("cid"))
      .select(col("qid"), col("cid"), col("qv"), col("cv"))
      .distinct() // a pair may collide in several tables
      .withColumn("sim", cosine(col("qv"), col("cv")))
      .withColumn("rn", row_number().over(w).cast("bigint"))
      .filter(col("rn") <= k)
      .select("qid", "cid", "sim", "rn")
      .orderBy("qid", "rn")
  }

  private val sim01 = QueryDef(
    "sim01_knn_brute",
    (s, dir) => bruteTopK(Tables(s, dir).embeddings),
    Some("""WITH q AS (SELECT vec_id AS qid, embedding::DOUBLE[] AS qv
        FROM embeddings WHERE vec_id < 3),
      c AS (SELECT vec_id AS cid, embedding::DOUBLE[] AS cv FROM embeddings),
      s AS (SELECT qid, cid,
        list_sum(list_transform(list_zip(qv, cv), x -> x[1] * x[2])) /
          (sqrt(list_sum(list_transform(qv, x -> x * x))) *
           sqrt(list_sum(list_transform(cv, x -> x * x)))) AS sim
        FROM c, q WHERE qid <> cid),
      r AS (SELECT qid, cid, sim,
        CAST(ROW_NUMBER() OVER (PARTITION BY qid ORDER BY sim DESC, cid) AS BIGINT) AS rn
        FROM s)
      SELECT qid, cid, sim, rn FROM r WHERE rn <= 5 ORDER BY qid, rn"""),
    headline = true,
  )

  private val sim02 = QueryDef(
    "sim02_knn_lsh",
    (s, dir) => lshTopK(Tables(s, dir).embeddings),
    None, // bucket assignment is engine-specific; recall vs brute in ScalaTest
  )

  val defs: Seq[QueryDef] = Seq(sim01, sim02)
}
