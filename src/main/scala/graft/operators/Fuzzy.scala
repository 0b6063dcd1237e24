package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Blocked fuzzy (edit-distance) join — the entity-resolution /
  * record-linkage operator (SURVEY.md §2C extension; the reference has
  * no join at all, reference query surface is sqlite_connector.py:80-115
  * passthrough).
  *
  * Scale design: candidate generation is a DELETION-NEIGHBORHOOD
  * equi-join (the SymSpell blocking scheme): each key expands to itself
  * plus its |s| single-character-deletion variants, candidates are
  * pairs sharing any variant, and an exact `levenshtein` verify prunes
  * false candidates. Two strings within edit distance 1 ALWAYS share a
  * variant (equal → the string itself; substitution at i → both i-th
  * deletions equal; insert/delete → one IS a deletion of the other), so
  * the blocking is lossless for maxDist = 1 while touching only
  * same-variant buckets — never the quadratic cross join a naive fuzzy
  * join needs. Cost: |corpus| × (len+1) variant rows through one
  * hash-partitioned equi-join; at 100 TB the variant table is the only
  * shuffle and bucket sizes stay bounded by how many real near-matches
  * exist (boilerplate-free keys ⇒ small buckets).
  */
object Fuzzy {

  /** The string plus each single-character-deletion variant
    * (|s| + 1 array entries; built-ins only, stays codegen'd).
    */
  def deletionVariants(c: Column): Column =
    when(length(c) === 0, array(c)).otherwise(
      array_union(
        array(c),
        transform(sequence(lit(1), length(c)), i =>
          concat(c.substr(lit(1), i - 1), c.substr(i + 1, length(c) - i)))))

  /** Deletion neighborhood of depth 2: the string, every 1-deletion,
    * and every 2-deletion (delete positions i < j — three substring
    * concats per pair; ~1 + L + L(L−1)/2 distinct entries). The FastSS
    * theorem (Bocek et al. 2007) gives losslessness: lev(a, b) ≤ 2
    * implies the depth-2 neighborhoods intersect.
    */
  def deletionVariants2(c: Column): Column =
    when(length(c) <= 1, deletionVariants(c)).otherwise(
      array_union(
        deletionVariants(c),
        array_distinct(flatten(
          transform(sequence(lit(1), length(c) - 1), i =>
            transform(sequence(i + 1, length(c)), j =>
              concat(c.substr(lit(1), i - 1),
                c.substr(i + 1, j - i - 1),
                c.substr(j + 1, length(c) - j))))))))

  /** All pairs (id_a < id_b) whose keys are within edit distance
    * `maxDist` (≤ 1 for lossless blocking), via deletion-neighborhood
    * candidates + exact levenshtein verify.
    *
    * Implementation notes:
    *  - the candidate stage is a variant EQUI-JOIN (two exchanges),
    *    not a collect_list-per-bucket pair expansion (one exchange,
    *    measured ~15% faster at sf0.1). Chosen deliberately: a
    *    degenerate bucket (many rows sharing a key) materializes as an
    *    in-memory array under collect_list but streams and SPILLS
    *    through a sort-merge join — the join shape degrades gracefully
    *    at scale where the array shape OOMs;
    *  - the join key is xxhash64(variant), not the variant string:
    *    the shuffled key drops from ~len bytes to 8, and a 64-bit
    *    collision can only ADD a candidate pair, which the exact
    *    levenshtein verify then discards — losslessness is unaffected;
    *  - `lev` is computed BEFORE the multi-variant dedup so the
    *    distinct carries (id, id, lev) instead of two key strings; the
    *    duplicate pairs (a substitution pair shares several variants)
    *    recompute a cheap near-identical-string levenshtein instead of
    *    shuffling their keys again.
    */
  def fuzzyPairs(df: DataFrame, keyCol: String, idCol: String,
      maxDist: Int = 1, maxBucket: Int = Int.MaxValue): DataFrame = {
    require(maxDist >= 1 && maxDist <= 2,
      s"deletion-neighborhood blocking supports maxDist 1 or 2 (FastSS theorem), got $maxDist")
    val variants =
      if (maxDist == 1) deletionVariants(col("k")) else deletionVariants2(col("k"))
    val v0 = df.select(col(idCol).as("id"), col(keyCol).as("k"))
      .withColumn("vh", explode(transform(variants, x => xxhash64(x))))
    // Optional degenerate-bucket guard (the dd02 maxBucket idiom): on
    // LOW-ENTROPY keys — sequential zero-padded ids are the worst
    // case — a depth-2 variant can collide across thousands of keys
    // and the candidate join goes quadratic in the bucket. Capping
    // drops those buckets (documented recall trade: a true pair ALL
    // of whose shared variants are boilerplate is missed). The
    // default keeps the join exact.
    val v =
      if (maxBucket == Int.MaxValue) v0
      else v0.withColumn("_n", count(lit(1)).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("vh"))))
        .filter(col("_n") <= maxBucket).drop("_n")
    val a = v.select(col("id").as("id_a"), col("k").as("k_a"), col("vh"))
    val b = v.select(col("id").as("id_b"), col("k").as("k_b"), col("vh"))
    a.join(b, Seq("vh"))
      .filter(col("id_a") < col("id_b"))
      // thresholded levenshtein: banded DP, O(len·maxDist) per pair
      // instead of O(len²), returns -1 above the bound — the verify
      // runs per CANDIDATE (multiplicity included), so its constant
      // dominates this operator's cost (measured 3 s of 5.5 at sf0.1
      // for the unbanded form)
      .withColumn("lev",
        expr(s"levenshtein(k_a, k_b, $maxDist)").cast("bigint"))
      .filter(col("lev") >= 0 && col("lev") <= maxDist)
      .select("id_a", "id_b", "lev")
      .distinct() // a substitution pair shares several variants
      .orderBy("id_a", "id_b")
  }

  // The oracle is the INDEPENDENT naive quadratic join (no blocking),
  // so a hash match proves the deletion-neighborhood candidates missed
  // nothing — the losslessness claim, checked on the full sf table.
  private val fz01 = QueryDef(
    "fz01_fuzzy_join_blocked",
    (s, dir) => fuzzyPairs(Tables(s, dir).customer, "c_name", "c_custkey"),
    Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        levenshtein(a.c_name, b.c_name) AS lev
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE levenshtein(a.c_name, b.c_name) <= 1
      ORDER BY id_a, id_b"""),
  )

  // Edit-distance-2 twin on a bounded slice: the synthetic customer
  // names are sequential zero-padded numbers — the ADVERSARIAL case
  // for deletion blocking (a depth-2 variant of a 5-digit suffix
  // matches every number containing that 3-digit subsequence, so
  // full-corpus buckets go quadratic; real name/address keys carry far
  // more entropy). The declared query therefore runs the exact,
  // uncapped join on c_custkey < 400 against the naive quadratic
  // oracle — losslessness at distance 2 is the claim being checked —
  // while production use on low-entropy keys reaches for maxBucket.
  // An UNCAPPED full-corpus declaration stays out of scope by
  // measurement, not omission: on these keys the TRUE dist-2 pair set
  // is itself near-quadratic (fz03 counts 32,166 true pairs on just
  // the 400-key slice), so the blowup is in the answer, not the
  // algorithm — no blocking scheme can emit it cheaply, and fz03
  // quantifies exactly what the production cap trades for tractability.
  private val fz02 = QueryDef(
    "fz02_fuzzy_join_dist2",
    (s, dir) => fuzzyPairs(
      Tables(s, dir).customer.filter(col("c_custkey") < 400),
      "c_name", "c_custkey", maxDist = 2),
    Some("""SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
        levenshtein(a.c_name, b.c_name) AS lev
      FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
      WHERE a.c_custkey < 400 AND b.c_custkey < 400
        AND levenshtein(a.c_name, b.c_name) <= 2
      ORDER BY id_a, id_b"""),
  )

  // ------------------------------------------------------------- fz03
  /** Recall eval for the CAPPED fuzzy join (the dd14 pattern): runs
    * `fuzzyPairs(maxDist = 2, maxBucket = 50)` on the adversarial
    * low-entropy slice and scores it against the exact uncapped join
    * (itself oracle-proved lossless by fz02). Dropping a bucket can
    * only REMOVE candidates, so precision is 1.0 by construction (the
    * row proves it); recall is the measurement — exactly what the
    * documented trade in [[fuzzyPairs]]'s maxBucket guard gives up on
    * sequential zero-padded keys. This is the harness a pipeline
    * reruns after retuning maxBucket, as dd14 is for LSH geometry.
    *
    * The oracle replays the capped detector in SQL — deletion
    * neighborhoods, bucket counts BY VARIANT STRING (Spark buckets on
    * xxhash64(variant); a 64-bit collision merging two buckets would
    * flip the hash check, so the green row also certifies collision-
    * freeness on this slice), cap, verify — against the naive
    * quadratic truth.
    */
  private val fz03 = QueryDef(
    "fz03_fuzzy_capped_recall",
    (s, dir) => {
      val slice = Tables(s, dir).customer.filter(col("c_custkey") < 400)
      val truth = fuzzyPairs(slice, "c_name", "c_custkey", maxDist = 2)
        .select("id_a", "id_b")
      val det = fuzzyPairs(slice, "c_name", "c_custkey",
        maxDist = 2, maxBucket = 50).select("id_a", "id_b")
      val hit = det.join(truth, Seq("id_a", "id_b"), "left_semi")
      truth.agg(count(lit(1)).as("n_true"))
        .crossJoin(det.agg(count(lit(1)).as("n_detected")))
        .crossJoin(hit.agg(count(lit(1)).as("n_hit")))
        .select(col("n_true"), col("n_detected"), col("n_hit"),
          (col("n_hit").cast("double") /
            expr("nullif(n_detected, 0)").cast("double")).as("precision"),
          (col("n_hit").cast("double") /
            expr("nullif(n_true, 0)").cast("double")).as("recall"))
    },
    // variant lengths are bounded by the key length; range(1, 64) +
    // an i <= len(k) filter sidesteps DuckDB's lateral-column
    // generate_series limitation (see q51)
    Some("""WITH keys AS (SELECT c_custkey AS id, c_name AS k
        FROM customer WHERE c_custkey < 400),
      v1 AS (SELECT id, k, k AS v FROM keys
        UNION
        SELECT id, k, substr(k, 1, i - 1) || substr(k, i + 1, len(k) - i) AS v
        FROM keys, range(1, 64) r(i) WHERE i <= len(k)
        UNION
        SELECT id, k, substr(k, 1, i - 1) || substr(k, i + 1, j - i - 1)
          || substr(k, j + 1, len(k) - j) AS v
        FROM keys, range(1, 64) r(i), range(2, 65) r2(j)
        WHERE i < j AND j <= len(k)),
      vb AS (SELECT v, COUNT(*) AS n FROM v1 GROUP BY v),
      vkeep AS (SELECT v1.id, v1.k, v1.v
        FROM v1 JOIN vb USING (v) WHERE vb.n <= 50),
      det AS (SELECT DISTINCT a.id AS id_a, b.id AS id_b
        FROM vkeep a JOIN vkeep b ON a.v = b.v AND a.id < b.id
        WHERE levenshtein(a.k, b.k) <= 2),
      truth AS (SELECT a.c_custkey AS id_a, b.c_custkey AS id_b
        FROM customer a JOIN customer b ON a.c_custkey < b.c_custkey
        WHERE a.c_custkey < 400 AND b.c_custkey < 400
          AND levenshtein(a.c_name, b.c_name) <= 2),
      hit AS (SELECT * FROM det WHERE EXISTS (SELECT 1 FROM truth t
        WHERE t.id_a = det.id_a AND t.id_b = det.id_b))
      SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM truth) AS n_true,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM det) AS n_detected,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM hit) AS n_hit,
        CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
          / NULLIF((SELECT COUNT(*) FROM det), 0) AS precision,
        CAST((SELECT COUNT(*) FROM hit) AS DOUBLE)
          / NULLIF((SELECT COUNT(*) FROM truth), 0) AS recall"""),
  )

  val defs: Seq[QueryDef] = Seq(fz01, fz02, fz03)
}
