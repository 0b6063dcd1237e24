package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.QueryDef
import graft.sources.Tables

/** Deterministic streaming-sketch operators: count-min heavy-hitter
  * estimation (cms01) and HyperLogLog cardinality (hll01).
  *
  * The point of this module is that SKETCHES DO NOT HAVE TO BE
  * ORACLE-EXEMPT. q32 uses Spark's built-in approx aggregates, whose
  * internals (HLL++ bias tables, quantile sketch merge order) no other
  * engine reproduces — so q32 is no_oracle with a bounds-checking twin.
  * Here the sketch hash family is md5-derived and every intermediate is
  * integer (register maxima, cell counts, scaled harmonic sums), so
  * DuckDB replays the ENTIRE sketch bit-for-bit: build, estimate,
  * correction and all. Determinism also buys the production property
  * that a task retry or partition re-split cannot change the answer.
  *
  * Scale shapes (both): one map-side-combinable aggregation over the
  * fact producing a FIXED-size sketch (1,024 cells / 256 registers) —
  * the reduce side is constant no matter the corpus; estimation joins
  * are against broadcast-size tables. This is the sketch contract that
  * matters at 100 TB: memory is O(sketch), not O(distinct keys).
  *
  * No counterpart in the reference (its only aggregation is the top-5
  * error summary, error_handler.py:79-96) — declared extension,
  * SURVEY.md §2C.
  */
object Sketches {

  // ------------------------------------------------------------ cms01
  /** Count-min sketch (Cormode & Muthukrishnan 2005): depth 4 × width
    * 256. The 4 row hashes are DISJOINT 16-bit slices of ONE md5 of
    * the key (hex offsets 1/5/9/13), each mod 256 — md5 bits are
    * uniform and independent, so slicing buys the pairwise-independent
    * family the sketch needs at a quarter of the hash cost. The digest
    * is HOISTED into its own projection below the posexplode (see
    * [[cmsDigest]]): measured at sf0.1, inlining it into the four
    * bucket expressions under the generator costs 2.2 s vs 1.4 s
    * hoisted, because codegen CSE does not reach through Generate. Cell (j, b) accumulates
    * row counts; the estimate for x is min_j cell(j, bucket_j(x)) — an
    * OVERestimate with probability-1 (never under), which the output
    * asserts per key.
    */
  private val CmsDepth = 4
  private val CmsWidth = 256

  /** The one md5 digest per row the 4 depth-buckets slice. Hoisted
    * into its own projection by the callers: the 4 bucket expressions
    * sit under a generator (posexplode), where whole-stage codegen's
    * common-subexpression elimination does NOT reach — inlining the
    * digest into each bucket would evaluate it 4× per row.
    */
  private def cmsDigest(key: Column): Column =
    md5(concat(lit("cms:"), key.cast("string")).cast("binary"))

  private def cmsBucket(j: Int, digest: Column): Column =
    (conv(substring(digest, 1 + 4 * j, 4), 16, 10).cast("bigint") % CmsWidth).as(s"b$j")

  private def cmsBucketSql(j: Int, key: String): String =
    s"('0x' || substr(md5('cms:' || CAST($key AS VARCHAR)), ${1 + 4 * j}, 4))::BIGINT % $CmsWidth"

  /** (j, bucket, cnt) sketch cells of `keyCol` occurrences — exactly
    * CmsDepth×CmsWidth rows upper-bound, map-side combined.
    */
  def countMinCells(fact: DataFrame, keyCol: String): DataFrame =
    countMinCellsKernel(fact, Nil, keyCol)

  /** GROUPED count-min cells — the sketch as a per-group aggregate
    * (hll03's grouped form for heavy hitters: "top URLs per domain"):
    * cells key on (group, j, bucket), so the whole build stays ONE
    * hash aggregation with map-side combine and each group carries at
    * most CmsDepth×CmsWidth cells regardless of its row count.
    */
  def countMinCellsBy(fact: DataFrame, grp: String, keyCol: String): DataFrame =
    countMinCellsKernel(fact, Seq(grp), keyCol)

  // one copy of the digest/bucket projection for both arities (the
  // hllRegisterUpdatesKernel rationale)
  private def countMinCellsKernel(fact: DataFrame, grp: Seq[String],
      keyCol: String): DataFrame = {
    val g = grp.map(col)
    fact.select(g :+ cmsDigest(col(keyCol)).as("_h"): _*)
      .select(g :+ posexplode(array((0 until CmsDepth)
        .map(j => cmsBucket(j, col("_h"))): _*)).as(Seq("j", "bucket")): _*)
      .groupBy((grp ++ Seq("j", "bucket")).map(col): _*)
      .agg(count(lit(1)).as("cnt"))
  }

  /** Exact-top-20 heavy-hitter probe against a (j, bucket, cnt) cell
    * table — cms01's measurement extracted so warehouse-merged cells
    * (gov05) run the IDENTICAL probe: 20 keys × depth rows joined
    * against the ≤1,024-cell sketch, both sides broadcast-size by
    * construction; per key, estimate = min over depths, with the
    * never-under flag the sketch guarantees with probability 1.
    */
  private[operators] def cmsHeavyHitters(fact: DataFrame, cells: DataFrame,
      keyCol: String): DataFrame = {
    val top = fact.groupBy(col(keyCol)).agg(count(lit(1)).as("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol)).limit(20)
    top.withColumn("_h", cmsDigest(col(keyCol)))
      .select(col(keyCol), col("n_exact"),
        posexplode(array((0 until CmsDepth)
          .map(j => cmsBucket(j, col("_h"))): _*)).as(Seq("j", "bucket")))
      .join(broadcast(cells), Seq("j", "bucket"))
      .groupBy(keyCol)
      .agg(max(col("n_exact")).as("n_exact"), min(col("cnt")).as("n_est"))
      .withColumn("never_under", col("n_est") >= col("n_exact"))
      .orderBy(col("n_exact").desc, col(keyCol))
  }

  /** cms01's full oracle (cells + exact top + probe) over an arbitrary
    * table expression — the SINGLE copy gov05 retargets at the
    * erased-corpus subquery.
    */
  private[operators] def cmsHeavySql(table: String): String =
    s"""WITH cells AS (
        SELECT j, CASE j ${(0 until CmsDepth).map(j =>
          s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket,
          COUNT(*) AS cnt
        FROM $table CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)
        GROUP BY 1, 2),
      top AS (SELECT l_partkey, COUNT(*) AS n_exact FROM $table
        GROUP BY 1 ORDER BY n_exact DESC, l_partkey LIMIT 20),
      probe AS (SELECT l_partkey, n_exact, j,
          CASE j ${(0 until CmsDepth).map(j =>
            s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket
        FROM top CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j))
      SELECT p.l_partkey, MAX(p.n_exact) AS n_exact, MIN(c.cnt) AS n_est,
        MIN(c.cnt) >= MAX(p.n_exact) AS never_under
      FROM probe p JOIN cells c ON p.j = c.j AND p.bucket = c.bucket
      GROUP BY p.l_partkey ORDER BY n_exact DESC, l_partkey"""

  private val cms01 = QueryDef(
    "cms01_countmin_heavy",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      cmsHeavyHitters(li, countMinCells(li, "l_partkey"), "l_partkey")
    },
    Some(cmsHeavySql("lineitem")),
  )

  // ------------------------------------------------------------ hll01
  /** HyperLogLog (Flajolet et al. 2007) with p=8 (256 registers) over a
    * 32-bit md5-prefix hash: register = top 8 bits, rho = leading-zero
    * rank of the low 24 bits (1..25). The register maxima, the scaled
    * harmonic sum Σ 2^(25-rho) (exact integers — 2^-rho is scaled by
    * 2^25 so empty registers contribute exactly 2^25), and the
    * linear-counting small-range correction (est ≤ 2.5m with empty
    * registers → m·ln(m/zeros)) are all arithmetic DuckDB reproduces
    * exactly; ln() is bit-identical across engines (txt06 precedent).
    */
  private val HllRegs = 256       // m = 2^8
  private val HllRemBits = 24     // rho in 1..25
  private val Scale = 1L << (HllRemBits + 1)  // 2^25

  /** alpha_m · m² · 2^25 — literal-arithmetic constant, evaluated in
    * the same IEEE order in both engines. The fractional literals are
    * CAST to DOUBLE explicitly: Spark parses bare `0.7213` as DECIMAL
    * and would round the quotient HALF_UP at decimal scale (~4e-9
    * relative difference), while DuckDB's decimal/decimal division
    * returns DOUBLE — the casts force both engines onto the identical
    * IEEE double path.
    */
  private val AlphaSql =
    s"CAST(0.7213 AS DOUBLE) / (1.0 + CAST(1.079 AS DOUBLE) / $HllRegs.0)" +
      s" * $HllRegs.0 * $HllRegs.0 * $Scale.0"

  /** rho(w) for the 24-bit remainder w as a CASE chain — exact integer
    * compares only (floor(log2) rounds wrong at 2^k - 1 boundaries and
    * libm may differ across engines).
    */
  private def rhoSql(w: String): String =
    (1 to HllRemBits).map(r =>
      s"WHEN $w >= ${1L << (HllRemBits - r)} THEN $r")
      .mkString("CASE ", " ", s" ELSE ${HllRemBits + 1} END")

  private def rhoCol(w: Column): Column =
    (2 to HllRemBits).foldLeft(when(w >= (1L << (HllRemBits - 1)), 1)) {
      (acc, r) => acc.when(w >= (1L << (HllRemBits - r)), r)
    }.otherwise(HllRemBits + 1)

  /** One (label, n_exact, n_est, in_envelope) row estimating the
    * distinct count of `key` in `fact`.
    */
  // oracle-SQL building blocks for parity rows defined outside this
  // file (str12) — single copies of the geometry constants and rho
  // CASE chain so a sketch retune cannot drift the cross-file oracles
  private[operators] def Regs: Int = HllRegs
  private[operators] def RemBitsP1: Int = HllRemBits + 1
  private[operators] def HllRemBitsDiv: Long = 1L << HllRemBits
  private[operators] def ScaleConst: Long = Scale
  private[operators] def AlphaOracleSql: String = AlphaSql
  private[operators] def rhoOracleSql: String = rhoSql(s"(h % ${1L << HllRemBits})")

  private[operators] def hllSql(table: String, key: String, label: String): String =
    s"""SELECT '$label' AS col_name, n_exact,
        CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END AS n_est,
        abs(CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END - n_exact)
          <= 0.15 * n_exact AS in_envelope
      FROM (
        SELECT MAX(n_exact) AS n_exact,
          ($AlphaSql) / (SUM(CAST(1::BIGINT << (${HllRemBits + 1} - max_rho) AS DECIMAL(38,0)))
            + ($HllRegs - COUNT(*)) * CAST($Scale AS DECIMAL(38,0))) AS raw,
          $HllRegs - COUNT(*) AS zeros
        FROM (
          SELECT h // ${1L << HllRemBits} AS reg, MAX(rho) AS max_rho,
            MAX(n_exact) AS n_exact
          FROM (
            SELECT h, ${rhoSql(s"(h % ${1L << HllRemBits})")} AS rho,
              (SELECT COUNT(DISTINCT $key) FROM $table) AS n_exact
            FROM (SELECT DISTINCT ('0x' || substr(md5('hll:' || CAST($key AS VARCHAR)), 1, 8))::BIGINT AS h
                  FROM $table WHERE $key IS NOT NULL))
          GROUP BY reg))"""

  /** ((grp...,) reg, max_rho) register maxima of `key`'s md5-hash
    * stream, optionally keyed per group — the SINGLE copy of the hash
    * family and register build shared by [[hllEstimate]] (global,
    * grp = Nil), [[hllEstimateBy]] (grouped), and the hll02
    * mergeability proof, so a change to the hash family or register
    * width cannot silently make any of them a different sketch.
    */
  /** Streaming-legal register build: per-row (reg, rho) projection +
    * ONE groupBy(reg).max aggregation with fixed 256-row state —
    * runnable as a Structured Streaming Complete-mode aggregation
    * (chained aggregations are illegal in streams, and max(rho) is
    * duplicate-invariant, so the batch path's row-reducing
    * pre-distinct is simply unnecessary here). This is how the sketch
    * runs in production: the STREAM maintains the register state;
    * estimation is a batch read of the landed 256 rows
    * ([[hllEstimateFromRegisters]], proven by str11's parity oracle).
    */
  def hllRegisterUpdates(fact: DataFrame, key: String): DataFrame =
    hllRegisterUpdatesKernel(fact, Nil, key)

  /** [[hllRegisterUpdates]] keyed per group — (grp, reg) state, still
    * ONE streaming-legal aggregation, 256 rows per group.
    */
  def hllRegisterUpdatesBy(fact: DataFrame, grp: String, key: String): DataFrame =
    hllRegisterUpdatesKernel(fact, Seq(grp), key)

  // ONE copy of the hash/register projection for both arities: a
  // retune of the hash family that edited the global build but not
  // the grouped one would silently desynchronize str11 from str12
  private def hllRegisterUpdatesKernel(fact: DataFrame, grp: Seq[String],
      key: String): DataFrame = {
    val h = conv(substring(md5(concat(lit("hll:"), col(key).cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("bigint")
    val g = grp.map(col)
    fact.filter(col(key).isNotNull)
      .select(g :+ h.as("h"): _*)
      .select(g ++ Seq((col("h") / lit(1L << HllRemBits)).cast("bigint").as("reg"),
        rhoCol(col("h") % (1L << HllRemBits)).as("rho")): _*)
      .groupBy((grp :+ "reg").map(col): _*).agg(max(col("rho")).as("max_rho"))
  }

  /** Estimator over a landed (reg, max_rho) table — the batch tail of
    * a stream-maintained sketch; same raw/zeros/linear-counting
    * arithmetic as [[hllEstimate]]. Pass `grp` columns for a
    * per-group register table.
    */
  def hllEstimateFromRegisters(regs: DataFrame, grp: Seq[String] = Nil): DataFrame =
    regs.groupBy(grp.map(col): _*).agg(
      (expr(AlphaSql) /
        (sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllRemBits + 1} - max_rho)")
          .cast("decimal(38,0)")) +
          (lit(HllRegs) - count(lit(1))) * lit(Scale).cast("decimal(38,0)")))
        .as("raw"),
      (lit(HllRegs) - count(lit(1))).as("zeros"))
      .select(grp.map(col) :+
        when(col("raw") <= 2.5 * HllRegs && col("zeros") > 0,
          lit(HllRegs.toDouble) * log(lit(HllRegs.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_est"): _*)

  private def hllRegisters(fact: DataFrame, key: String,
      grp: Seq[String] = Nil): DataFrame = {
    val h = conv(substring(md5(concat(lit("hll:"), col(key).cast("string"))
      .cast("binary")), 1, 8), 16, 10).cast("bigint")
    val g = grp.map(col)
    fact.filter(col(key).isNotNull)
      .select(g :+ h.as("h"): _*).distinct()
      .select(g ++ Seq((col("h") / lit(1L << HllRemBits)).cast("bigint").as("reg"),
        rhoCol(col("h") % (1L << HllRemBits)).as("rho")): _*)
      .groupBy(g :+ col("reg"): _*).agg(max(col("rho")).as("max_rho"))
  }

  /** Shared estimator over register maxima (one copy of the raw /
    * zeros / linear-counting arithmetic, whatever the grouping). */
  private def hllCore(fact: DataFrame, key: String, grp: Seq[String]): DataFrame = {
    val g = grp.map(col)
    val exact = fact.groupBy(g: _*).agg(count_distinct(col(key)).as("n_exact"))
    val agg = hllRegisters(fact, key, grp).groupBy(g: _*)
      .agg(
        (expr(AlphaSql) /
          (sum(expr(s"shiftleft(CAST(1 AS BIGINT), ${HllRemBits + 1} - max_rho)")
            .cast("decimal(38,0)")) +
            (lit(HllRegs) - count(lit(1))) * lit(Scale).cast("decimal(38,0)")))
          .as("raw"),
        (lit(HllRegs) - count(lit(1))).as("zeros"))
    val joined =
      if (grp.isEmpty) agg.crossJoin(broadcast(exact))
      else agg.join(exact, grp)
    joined
      .select(g ++ Seq(col("n_exact"),
        when(col("raw") <= 2.5 * HllRegs && col("zeros") > 0,
          lit(HllRegs.toDouble) * log(lit(HllRegs.toDouble) / col("zeros")))
          .otherwise(col("raw")).as("n_est")): _*)
      .withColumn("in_envelope",
        abs(col("n_est") - col("n_exact")) <= lit(0.15) * col("n_exact"))
  }

  def hllEstimate(fact: DataFrame, key: String, label: String): DataFrame =
    hllCore(fact, key, Nil)
      .select(lit(label).as("col_name"), col("n_exact"), col("n_est"),
        col("in_envelope"))

  private val hll01 = QueryDef(
    "hll01_hyperloglog",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      hllEstimate(li, "l_orderkey", "l_orderkey")
        .unionByName(hllEstimate(li, "l_partkey", "l_partkey"))
        .unionByName(hllEstimate(li, "l_suppkey", "l_suppkey"))
        .orderBy("col_name")
    },
    Some(s"""SELECT * FROM (
        ${hllSql("lineitem", "l_orderkey", "l_orderkey")}
        UNION ALL ${hllSql("lineitem", "l_partkey", "l_partkey")}
        UNION ALL ${hllSql("lineitem", "l_suppkey", "l_suppkey")})
      ORDER BY col_name"""),
  )

  // ------------------------------------------------------------ cms02
  /** Sketch MERGEABILITY, oracle-proved: count-min cells are a
    * commutative monoid under cellwise addition, which is exactly why
    * the sketch build map-side combines and why executor-local
    * sketches union into a cluster-global one without a second scan.
    * The query splits the fact on a key parity, builds each half's
    * sketch independently, merges by cell addition, and certifies the
    * merge equals the direct whole-corpus sketch cell for cell. The
    * same algebra holds for any partitioning — parity is just the
    * deterministic stand-in for "two executors".
    */
  private val cms02 = QueryDef(
    "cms02_sketch_merge",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      val even = countMinCells(li.filter(col("l_orderkey") % 2 === 0), "l_partkey")
      val odd = countMinCells(li.filter(col("l_orderkey") % 2 =!= 0), "l_partkey")
      val merged = even.select(col("j"), col("bucket"), col("cnt"))
        .unionByName(odd)
        .groupBy("j", "bucket").agg(sum(col("cnt")).as("cnt"))
      val direct = countMinCells(li, "l_partkey")
      merged.join(direct.withColumnRenamed("cnt", "cnt_direct"),
          Seq("j", "bucket"), "full_outer")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("cnt") === col("cnt_direct"), 1L).otherwise(0L))
            .as("n_equal"))
        .withColumn("merge_exact", col("n_cells") === col("n_equal"))
    },
    Some(s"""WITH cells AS (
        SELECT l_orderkey % 2 AS half, j,
          CASE j ${(0 until CmsDepth).map(j =>
            s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket,
          COUNT(*) AS cnt
        FROM lineitem CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)
        GROUP BY 1, 2, 3),
      merged AS (SELECT j, bucket, SUM(cnt) AS cnt FROM cells GROUP BY 1, 2),
      direct AS (SELECT j,
          CASE j ${(0 until CmsDepth).map(j =>
            s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket,
          COUNT(*) AS cnt
        FROM lineitem CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)
        GROUP BY 1, 2)
      SELECT COUNT(*) AS n_cells,
        CAST(SUM(CASE WHEN m.cnt = d.cnt THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
        COUNT(*) = SUM(CASE WHEN m.cnt = d.cnt THEN 1 ELSE 0 END) AS merge_exact
      FROM merged m FULL OUTER JOIN direct d USING (j, bucket)"""),
  )

  // ------------------------------------------------------------ cms03
  /** Grouped heavy hitters + grouped mergeability in one audit row set:
    * per l_returnflag, the exact top-5 part keys probe the per-group
    * sketch ([[countMinCellsBy]]) — `never_under` is the count-min
    * one-sided guarantee within each group — and `merge_exact` proves
    * the grouped cells are still a monoid under cell-wise SUM (parity
    * halves re-built and merged must equal the direct build, per
    * group). Probe and merge proof both live on sketch-sized tables;
    * only the exact top-5 (the eval's ground truth, not the production
    * path) scans per-(group, key) counts, through a window PARTITIONED
    * by group.
    */
  private val cms03 = QueryDef(
    "cms03_grouped_countmin",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      val cells = countMinCellsBy(li, "l_returnflag", "l_partkey")
      // two-phase top-5: the group column has only 3 values, so a
      // window partitioned by group alone would funnel every per-key
      // count through 3 giant partitions at scale. Phase 1 takes a
      // local top-5 within (group, key-hash salt) — global top-5 keys
      // are necessarily in their salt's local top-5 — phase 2 re-ranks
      // the <= groups*32*5 survivors (bounded, not data-sized)
      val cnts = li.groupBy("l_returnflag", "l_partkey")
        .agg(count(lit(1)).as("n_exact"))
      val wSalt = org.apache.spark.sql.expressions.Window
        .partitionBy(col("l_returnflag"), pmod(col("l_partkey"), lit(32)))
        .orderBy(col("n_exact").desc, col("l_partkey"))
      val wG = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag")
        .orderBy(col("n_exact").desc, col("l_partkey"))
      val top = cnts
        .withColumn("rk", row_number().over(wSalt))
        .filter(col("rk") <= 5).drop("rk")
        .withColumn("rk", row_number().over(wG))
        .filter(col("rk") <= 5).drop("rk")
      val halves = countMinCellsBy(
          li.filter(col("l_orderkey") % 2 === 0), "l_returnflag", "l_partkey")
        .unionByName(countMinCellsBy(
          li.filter(col("l_orderkey") % 2 =!= 0), "l_returnflag", "l_partkey"))
        .groupBy("l_returnflag", "j", "bucket").agg(sum(col("cnt")).as("cnt_m"))
      val mergeOk = halves
        .join(cells.withColumnRenamed("cnt", "cnt_d"),
          Seq("l_returnflag", "j", "bucket"), "full_outer")
        .groupBy("l_returnflag")
        .agg((count(lit(1)) ===
          sum(when(col("cnt_m") === col("cnt_d"), 1L).otherwise(0L)))
          .as("merge_exact"))
      top.withColumn("_h", cmsDigest(col("l_partkey")))
        .select(col("l_returnflag"), col("l_partkey"), col("n_exact"),
          posexplode(array((0 until CmsDepth)
            .map(j => cmsBucket(j, col("_h"))): _*)).as(Seq("j", "bucket")))
        .join(broadcast(cells), Seq("l_returnflag", "j", "bucket"))
        .groupBy("l_returnflag", "l_partkey")
        .agg(max(col("n_exact")).as("n_exact"), min(col("cnt")).as("n_est"))
        .withColumn("never_under", col("n_est") >= col("n_exact"))
        .join(broadcast(mergeOk), "l_returnflag")
        .select("l_returnflag", "l_partkey", "n_exact", "n_est",
          "never_under", "merge_exact")
        .orderBy(col("l_returnflag"), col("n_exact").desc, col("l_partkey"))
    },
    Some(s"""WITH cells AS (
        SELECT l_returnflag, j, CASE j ${(0 until CmsDepth).map(j =>
          s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket,
          COUNT(*) AS cnt
        FROM lineitem CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)
        GROUP BY 1, 2, 3),
      halves AS (
        SELECT l_returnflag, l_orderkey % 2 AS half, j,
          CASE j ${(0 until CmsDepth).map(j =>
            s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket,
          COUNT(*) AS cnt
        FROM lineitem CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)
        GROUP BY 1, 2, 3, 4),
      merged AS (SELECT l_returnflag, j, bucket, SUM(cnt) AS cnt_m
        FROM halves GROUP BY 1, 2, 3),
      mok AS (SELECT l_returnflag,
          COUNT(*) = SUM(CASE WHEN m.cnt_m = c.cnt THEN 1 ELSE 0 END) AS merge_exact
        FROM merged m FULL OUTER JOIN cells c USING (l_returnflag, j, bucket)
        GROUP BY 1),
      top AS (SELECT l_returnflag, l_partkey, COUNT(*) AS n_exact
        FROM lineitem GROUP BY 1, 2
        QUALIFY ROW_NUMBER() OVER (PARTITION BY l_returnflag
          ORDER BY COUNT(*) DESC, l_partkey) <= 5),
      probe AS (SELECT l_returnflag, l_partkey, n_exact, j,
          CASE j ${(0 until CmsDepth).map(j =>
            s"WHEN $j THEN ${cmsBucketSql(j, "l_partkey")}").mkString(" ")} END AS bucket
        FROM top CROSS JOIN generate_series(0, ${CmsDepth - 1}) g(j)),
      est AS (SELECT p.l_returnflag, p.l_partkey,
          MAX(p.n_exact) AS n_exact, MIN(c.cnt) AS n_est
        FROM probe p JOIN cells c ON p.l_returnflag = c.l_returnflag
          AND p.j = c.j AND p.bucket = c.bucket
        GROUP BY 1, 2)
      SELECT e.l_returnflag, e.l_partkey, n_exact, n_est,
        n_est >= n_exact AS never_under, mok.merge_exact
      FROM est e JOIN mok USING (l_returnflag)
      ORDER BY l_returnflag, n_exact DESC, l_partkey"""),
  )

  // ------------------------------------------------------------ hll02
  /** HLL mergeability: registers are a monoid under elementwise MAX —
    * the union of two sketches estimates the union of the sets, the
    * property that lets per-partition register maxima combine into the
    * global cardinality without re-reading anything. The parity halves'
    * registers, merged by max, must equal the whole-corpus registers.
    */
  private val hll02 = QueryDef(
    "hll02_hll_merge",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      val merged = hllRegisters(li.filter(col("l_orderkey") % 2 === 0), "l_partkey")
        .unionByName(hllRegisters(li.filter(col("l_orderkey") % 2 =!= 0), "l_partkey"))
        .groupBy("reg").agg(max(col("max_rho")).as("max_rho"))
      merged.join(hllRegisters(li, "l_partkey").withColumnRenamed("max_rho", "rho_direct"),
          Seq("reg"), "full_outer")
        .agg(count(lit(1)).as("n_regs"),
          sum(when(col("max_rho") === col("rho_direct"), 1L).otherwise(0L))
            .as("n_equal"))
        .withColumn("merge_exact", col("n_regs") === col("n_equal"))
    },
    Some(s"""WITH hh AS (SELECT DISTINCT l_orderkey % 2 AS half,
          ('0x' || substr(md5('hll:' || CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM lineitem WHERE l_partkey IS NOT NULL),
      halves AS (SELECT half, h // ${1L << HllRemBits} AS reg,
          MAX(${rhoSql(s"(h % ${1L << HllRemBits})")}) AS max_rho
        FROM hh GROUP BY 1, 2),
      merged AS (SELECT reg, MAX(max_rho) AS max_rho FROM halves GROUP BY reg),
      direct AS (SELECT h // ${1L << HllRemBits} AS reg,
          MAX(${rhoSql(s"(h % ${1L << HllRemBits})")}) AS max_rho
        FROM (SELECT DISTINCT ('0x' || substr(md5('hll:' || CAST(l_partkey AS VARCHAR)), 1, 8))::BIGINT AS h
              FROM lineitem WHERE l_partkey IS NOT NULL)
        GROUP BY 1)
      SELECT COUNT(*) AS n_regs,
        CAST(SUM(CASE WHEN m.max_rho = d.max_rho THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
        COUNT(*) = SUM(CASE WHEN m.max_rho = d.max_rho THEN 1 ELSE 0 END) AS merge_exact
      FROM merged m FULL OUTER JOIN direct d USING (reg)"""),
  )

  // ------------------------------------------------------------ hll03
  /** GROUPED HyperLogLog — the sketch as a per-group aggregate, which
    * is how cardinality runs at 100 TB (per-domain distinct users,
    * per-source distinct docs): registers key on (group, reg), so the
    * whole build is ONE hash aggregation with map-side combine and
    * every group carries a fixed 256-register state regardless of its
    * row count. Same estimator, same exact-integer arithmetic, same
    * linear-counting correction as hll01 — just GROUP BY'd; the exact
    * per-group distinct joins in for the envelope check.
    */
  def hllEstimateBy(fact: DataFrame, grp: String, key: String): DataFrame =
    hllCore(fact, key, Seq(grp))

  private val hll03 = QueryDef(
    "hll03_grouped_hll",
    (s, dir) =>
      hllEstimateBy(Tables(s, dir).orders, "o_orderpriority", "o_custkey")
        .orderBy("o_orderpriority"),
    Some(s"""WITH hh AS (SELECT DISTINCT o_orderpriority,
          ('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM orders WHERE o_custkey IS NOT NULL),
      r AS (SELECT o_orderpriority, h // ${1L << HllRemBits} AS reg,
          MAX(${rhoSql(s"(h % ${1L << HllRemBits})")}) AS max_rho
        FROM hh GROUP BY 1, 2),
      agg AS (SELECT o_orderpriority,
          ($AlphaSql) / (SUM(CAST(1::BIGINT << (${HllRemBits + 1} - max_rho) AS DECIMAL(38,0)))
            + ($HllRegs - COUNT(*)) * CAST($Scale AS DECIMAL(38,0))) AS raw,
          $HllRegs - COUNT(*) AS zeros
        FROM r GROUP BY 1),
      ex AS (SELECT o_orderpriority, COUNT(DISTINCT o_custkey) AS n_exact
        FROM orders GROUP BY 1)
      SELECT agg.o_orderpriority, n_exact,
        CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END AS n_est,
        abs(CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END - n_exact)
          <= 0.15 * n_exact AS in_envelope
      FROM agg JOIN ex USING (o_orderpriority)
      ORDER BY o_orderpriority"""),
  )

  // ------------------------------------------------------------ hll04
  /** Persisted sketch warehouse — the dd16 pattern for sketches: each
    * ingestion batch APPENDS its register delta to a managed table and
    * estimation merges on read (groupBy(reg).max — the monoid hll02
    * proves), so the warehouse is append-only, retry-tolerant (a
    * replayed batch's registers merge idempotently under max) and
    * never rewritten. The oracle replays the DIRECT whole-corpus build
    * from raw data, so a hash match proves neither batch boundaries
    * (hll02) NOR the persistence roundtrip can change the estimate.
    * At 100 TB this is the continuous-cardinality architecture: 256
    * small rows per batch land next to the data, and any reader gets
    * the corpus-level estimate without touching a fact table.
    */
  private val hll04 = QueryDef(
    "hll04_sketch_warehouse",
    (s, dir) => {
      val li = Tables(s, dir).lineitem
      // run-unique name: a fixed table under a shared warehouse would
      // let concurrent runs (bench passes, parallel sessions) drop each
      // other's registers mid-query
      val table = s"hll04_registers_${ProcessHandle.current().pid()}_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      // run-unique name ⇒ no pre-clean needed; the finally is what
      // keeps a mid-query failure from orphaning the table forever
      try {
        graft.sink.Sinks.saveTable(
          hllRegisterUpdates(li.filter(col("l_orderkey") % 3 =!= 0), "l_partkey"), table)
        graft.sink.Sinks.saveTable(
          hllRegisterUpdates(li.filter(col("l_orderkey") % 3 === 0), "l_partkey"), table)
        val merged = s.table(table).groupBy("reg")
          .agg(max(col("max_rho")).as("max_rho"))
        val exact = li.agg(count_distinct(col("l_partkey")).as("n_exact"))
        hllEstimateFromRegisters(merged)
          .crossJoin(broadcast(exact))
          .select(lit("warehouse_partkey_hll").as("col_name"), col("n_exact"),
            col("n_est"),
            (abs(col("n_est") - col("n_exact")) <= lit(0.15) * col("n_exact"))
              .as("in_envelope"))
          .localCheckpoint(eager = true)
      } finally { s.sql(s"DROP TABLE IF EXISTS $table"); () }
    },
    Some(hllSql("lineitem", "l_partkey", "warehouse_partkey_hll")),
  )

  // ------------------------------------------------------------ hll05
  /** Sketch SET OPERATIONS — audience overlap from sketches alone:
    * with per-cohort register states (customers ordering before vs
    * after the drift split date), |A∪B| comes from the MERGED
    * registers (the max monoid) and |A∩B| from inclusion–exclusion
    * est(A) + est(B) − est(A∪B) — no raw-data join, the classic
    * audience-overlap answer two sketch tables give for free. The row
    * carries the exact counts beside every estimate; intersection
    * error compounds three estimates, so its envelope is checked
    * against the UNION size (the quantity whose scale bounds the
    * absolute error), not the possibly-tiny intersection itself.
    * Deterministic end to end — DuckDB replays all three register
    * states and the same I–E arithmetic.
    */
  private val hll05 = QueryDef(
    "hll05_sketch_set_ops",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val split = lit("1995-07-01").cast("timestamp")
      val a = o.filter(col("o_orderdate") < split)
      val b = o.filter(col("o_orderdate") >= split)
      val regsA = hllRegisterUpdates(a, "o_custkey")
      val regsB = hllRegisterUpdates(b, "o_custkey")
      val regsU = regsA.unionByName(regsB)
        .groupBy("reg").agg(max(col("max_rho")).as("max_rho"))
      val exact = a.select(col("o_custkey")).intersect(b.select(col("o_custkey")))
        .agg(count(lit(1)).as("inter_exact"))
        .crossJoin(a.agg(count_distinct(col("o_custkey")).as("a_exact")))
        .crossJoin(b.agg(count_distinct(col("o_custkey")).as("b_exact")))
      val out = hllEstimateFromRegisters(regsA).withColumnRenamed("n_est", "a_est")
        .crossJoin(hllEstimateFromRegisters(regsB).withColumnRenamed("n_est", "b_est"))
        .crossJoin(hllEstimateFromRegisters(regsU).withColumnRenamed("n_est", "u_est"))
        .crossJoin(broadcast(exact))
        .select(col("a_exact"), col("a_est"), col("b_exact"), col("b_est"),
          col("inter_exact"),
          (col("a_est") + col("b_est") - col("u_est")).as("inter_est"))
        .withColumn("in_envelope",
          abs(col("inter_est") - col("inter_exact")) <=
            lit(0.25) * (col("a_est") + col("b_est") - col("inter_est")))
        .localCheckpoint(eager = true)
      out
    },
    Some(s"""WITH a AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate < TIMESTAMP '1995-07-01'),
      b AS (SELECT DISTINCT o_custkey FROM orders
          WHERE o_orderdate >= TIMESTAMP '1995-07-01'),
      ha AS (SELECT ('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h FROM a),
      hb AS (SELECT ('0x' || substr(md5('hll:' || CAST(o_custkey AS VARCHAR)), 1, 8))::BIGINT AS h FROM b),
      ra AS (SELECT h // $HllRemBitsDiv AS reg, MAX($rhoOracleSql) AS max_rho FROM ha GROUP BY 1),
      rb AS (SELECT h // $HllRemBitsDiv AS reg, MAX($rhoOracleSql) AS max_rho FROM hb GROUP BY 1),
      ru AS (SELECT reg, MAX(max_rho) AS max_rho FROM
        (SELECT * FROM ra UNION ALL SELECT * FROM rb) GROUP BY reg),
      est AS (${Seq("ra" -> "a_est", "rb" -> "b_est", "ru" -> "u_est").map { case (t, n) =>
        s"""(SELECT CASE WHEN raw <= 2.5 * $Regs AND zeros > 0
           THEN $Regs.0 * ln($Regs.0 / zeros) ELSE raw END FROM (
           SELECT ($AlphaOracleSql) /
             (SUM(CAST(1::BIGINT << ($RemBitsP1 - max_rho) AS DECIMAL(38,0)))
             + ($Regs - COUNT(*)) * CAST($ScaleConst AS DECIMAL(38,0))) AS raw,
             $Regs - COUNT(*) AS zeros FROM $t)) AS $n"""}.mkString("SELECT ", ",\n        ", "")})
      SELECT
        (SELECT CAST(COUNT(*) AS BIGINT) FROM a) AS a_exact, a_est,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM b) AS b_exact, b_est,
        (SELECT CAST(COUNT(*) AS BIGINT) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)) AS inter_exact,
        a_est + b_est - u_est AS inter_est,
        abs((a_est + b_est - u_est) -
          (SELECT COUNT(*) FROM (SELECT * FROM a INTERSECT SELECT * FROM b)))
          <= 0.25 * (a_est + b_est - (a_est + b_est - u_est)) AS in_envelope
      FROM est"""),
  )

  // ------------------------------------------------------------- hll06
  /** SLIDING-WINDOW cardinality from daily register deltas — the scale
    * path for q51's exact rolling DAU/WAU: exact rolling distinct
    * explodes each (day, user) pair into every window it serves (cost
    * ∝ window length × active pairs), while the sketch keeps ONE
    * 256-register state per day and answers any trailing window by
    * max-merging ≤ 7 register rows — O(days · 256) state total, the
    * register-warehouse pattern (hll04) applied to time windows. The
    * register build is one pass over the fact; the window merge and
    * estimation never touch raw data again (re-windowing to 30 days
    * costs nothing new). Exact WAU joins in for the per-day envelope
    * check; only days with their own activity are reported (q51's
    * contract).
    */
  private val hll06 = QueryDef(
    "hll06_rolling_sketch",
    (s, dir) => {
      val du = Tables(s, dir).events
        .select(to_date(col("ts")).as("day"), col("user_id"))
      val regs = hllRegisterUpdatesBy(du, "day", "user_id")
      // a day's registers serve the 7 windows ending at day .. day+6
      val merged = regs
        .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
          col("reg"), col("max_rho"))
        .groupBy("day", "reg").agg(max(col("max_rho")).as("max_rho"))
      val est = hllEstimateFromRegisters(merged, Seq("day"))
      // exact trailing-7-day distinct (q51's relational shape)
      val pairs = du.distinct()
      val exact = pairs
        .select(explode(sequence(col("day"), date_add(col("day"), 6))).as("day"),
          col("user_id"))
        .distinct()
        .groupBy("day").agg(count(lit(1)).as("wau_exact"))
      val activeDays = pairs.select("day").distinct()
      activeDays.join(exact, "day").join(est, "day")
        .select(col("day"), col("wau_exact").cast("bigint").as("wau_exact"),
          col("n_est").as("wau_est"),
          (abs(col("n_est") - col("wau_exact")) <= lit(0.15) * col("wau_exact"))
            .as("in_envelope"))
        .orderBy("day")
    },
    Some(s"""WITH du AS (SELECT DISTINCT
          CAST(MAKE_TIMESTAMP(EPOCH_NS(ts) // 1000) AS DATE) AS day, user_id
        FROM events),
      hh AS (SELECT DISTINCT day,
          ('0x' || substr(md5('hll:' || CAST(user_id AS VARCHAR)), 1, 8))::BIGINT AS h
        FROM du),
      r AS (SELECT day, h // $HllRemBitsDiv AS reg,
          MAX($rhoOracleSql) AS max_rho
        FROM hh GROUP BY 1, 2),
      m AS (SELECT r.day + CAST(j AS INTEGER) AS day, reg, MAX(max_rho) AS max_rho
        FROM r, range(7) g(j) GROUP BY 1, 2),
      agg AS (SELECT day,
          ($AlphaSql) / (SUM(CAST(1::BIGINT << (${HllRemBits + 1} - max_rho) AS DECIMAL(38,0)))
            + ($HllRegs - COUNT(*)) * CAST($Scale AS DECIMAL(38,0))) AS raw,
          $HllRegs - COUNT(*) AS zeros
        FROM m GROUP BY 1),
      ex7 AS (SELECT DISTINCT du.day + CAST(j AS INTEGER) AS day, du.user_id
        FROM du, range(7) g(j)),
      wex AS (SELECT day, COUNT(DISTINCT user_id) AS wau_exact FROM ex7 GROUP BY day),
      act AS (SELECT DISTINCT day FROM du)
      SELECT act.day, CAST(wau_exact AS BIGINT) AS wau_exact,
        CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END AS wau_est,
        abs(CASE WHEN raw <= 2.5 * $HllRegs AND zeros > 0
             THEN $HllRegs.0 * ln($HllRegs.0 / zeros) ELSE raw END - wau_exact)
          <= 0.15 * wau_exact AS in_envelope
      FROM act JOIN wex USING (day) JOIN agg USING (day)
      ORDER BY act.day"""),
  )

  // ------------------------------------------------------------- bf01
  /** Bloom filter as an ORACLE-CHECKED sketch — the third classic
    * sketch next to count-min (frequency) and HLL (cardinality):
    * membership. dc02 already USES a Bloom filter (Spark's built-in,
    * engine-internal bit layout) for decontamination; this row makes
    * the sketch itself portable and provable: m = 16,384 bit positions,
    * k = 4 md5-sliced hashes (the cms01 family idiom, "bf:" prefix),
    * the filter materialized as its SET-BIT POSITION SET. The audit row
    * certifies the three properties a production membership sketch
    * lives on:
    *  - no_false_neg: every inserted key passes (probability-1
    *    guarantee — all k positions were set by construction);
    *  - fpr: the MEASURED false-positive rate on a same-size probe set
    *    of guaranteed-absent keys (key + 10^7), the number the m/k
    *    sizing trades against memory;
    *  - merge_exact: the position set is a monoid under set UNION —
    *    parity-half filters merged must equal the direct build, which
    *    is why per-executor filters OR together without a second scan.
    *
    * 100 TB shape: the build is one map + a distinct whose state is
    * capped at m positions (map-side partial dedup, reduce side is
    * O(m) no matter the corpus); probes join against the ≤ m-row
    * position set broadcast. Memory is O(m), not O(keys) — the sketch
    * contract.
    */
  private val BfBits = 16384
  private val BfHashes = 4

  private def bfDigest(key: Column): Column =
    md5(concat(lit("bf:"), key.cast("string")).cast("binary"))

  private def bfPos(j: Int, digest: Column): Column =
    conv(substring(digest, 1 + 4 * j, 4), 16, 10).cast("bigint") % BfBits

  private def bfPosSql(j: Int, key: String): String =
    s"('0x' || substr(md5('bf:' || CAST($key AS VARCHAR)), ${1 + 4 * j}, 4))::BIGINT % $BfBits"

  /** The filter's set-bit positions for `keyCol`'s values — ≤ BfBits
    * rows, map-side deduped.
    */
  def bloomBits(fact: DataFrame, keyCol: String): DataFrame =
    fact.select(bfDigest(col(keyCol)).as("_h"))
      .select(explode(array((0 until BfHashes)
        .map(j => bfPos(j, col("_h"))): _*)).as("pos"))
      .distinct()

  /** (key, hits) membership probes: hits == BfHashes means "maybe
    * present" (a pass); the bit set joins in broadcast.
    */
  private def bloomProbe(keys: DataFrame, bits: DataFrame): DataFrame =
    keys.withColumn("_h", bfDigest(col("key")))
      .select(col("key"), posexplode(array((0 until BfHashes)
        .map(j => bfPos(j, col("_h"))): _*)).as(Seq("j", "pos")))
      .join(broadcast(bits.withColumn("hit", lit(1L))), Seq("pos"), "left")
      .groupBy("key").agg(sum(coalesce(col("hit"), lit(0L))).as("hits"))

  private val bf01 = QueryDef(
    "bf01_bloom_filter",
    (s, dir) => {
      val part = Tables(s, dir).part
      val bits = bloomBits(part, "p_partkey")
      val keys = part.select(col("p_partkey").as("key")).distinct()
      val nKeys = keys.agg(count(lit(1)).as("n_keys"))
      val nBits = bits.agg(count(lit(1)).as("n_bits_set"))
      val presentPass = bloomProbe(keys, bits)
        .agg(sum(when(col("hits") === BfHashes, 1L).otherwise(0L)).as("n_present_pass"))
      val absentStats = bloomProbe(
          keys.select((col("key") + 10000000L).as("key")), bits)
        .agg(count(lit(1)).as("n_probes"),
          sum(when(col("hits") === BfHashes, 1L).otherwise(0L)).as("n_false_pos"))
      val merged = bloomBits(part.filter(col("p_partkey") % 2 === 0), "p_partkey")
        .unionByName(bloomBits(part.filter(col("p_partkey") % 2 =!= 0), "p_partkey"))
        .distinct()
      val mergeOk = merged.withColumn("m", lit(1L))
        .join(bits.withColumn("d", lit(1L)), Seq("pos"), "full_outer")
        .agg((count(lit(1)) ===
          sum(when(col("m").isNotNull && col("d").isNotNull, 1L).otherwise(0L)))
          .as("merge_exact"))
      broadcast(nKeys).crossJoin(broadcast(nBits))
        .crossJoin(broadcast(presentPass))
        .crossJoin(broadcast(absentStats))
        .crossJoin(broadcast(mergeOk))
        .select(col("n_keys"), col("n_bits_set"),
          (col("n_present_pass") === col("n_keys")).as("no_false_neg"),
          col("n_probes"), col("n_false_pos"),
          (col("n_false_pos").cast("double") / col("n_probes")).as("fpr"),
          col("merge_exact"))
    },
    Some(s"""WITH bits AS (SELECT DISTINCT
          CASE j ${(0 until BfHashes).map(j =>
            s"WHEN $j THEN ${bfPosSql(j, "p_partkey")}").mkString(" ")} END AS pos
        FROM part CROSS JOIN generate_series(0, ${BfHashes - 1}) g(j)),
      keys AS (SELECT DISTINCT p_partkey AS key FROM part),
      ppos AS (SELECT key, j,
          CASE j ${(0 until BfHashes).map(j =>
            s"WHEN $j THEN ${bfPosSql(j, "key")}").mkString(" ")} END AS pos
        FROM keys CROSS JOIN generate_series(0, ${BfHashes - 1}) g(j)),
      phit AS (SELECT key, SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
        FROM ppos p LEFT JOIN bits b ON b.pos = p.pos GROUP BY key),
      akeys AS (SELECT key + 10000000 AS key FROM keys),
      apos AS (SELECT key, j,
          CASE j ${(0 until BfHashes).map(j =>
            s"WHEN $j THEN ${bfPosSql(j, "key")}").mkString(" ")} END AS pos
        FROM akeys CROSS JOIN generate_series(0, ${BfHashes - 1}) g(j)),
      ahit AS (SELECT key, SUM(CASE WHEN b.pos IS NOT NULL THEN 1 ELSE 0 END) AS hits
        FROM apos p LEFT JOIN bits b ON b.pos = p.pos GROUP BY key),
      halves AS (SELECT DISTINCT
          CASE j ${(0 until BfHashes).map(j =>
            s"WHEN $j THEN ${bfPosSql(j, "p_partkey")}").mkString(" ")} END AS pos
        FROM part CROSS JOIN generate_series(0, ${BfHashes - 1}) g(j)
        WHERE p_partkey % 2 = 0
        UNION
        SELECT DISTINCT
          CASE j ${(0 until BfHashes).map(j =>
            s"WHEN $j THEN ${bfPosSql(j, "p_partkey")}").mkString(" ")} END AS pos
        FROM part CROSS JOIN generate_series(0, ${BfHashes - 1}) g(j)
        WHERE p_partkey % 2 = 1),
      mok AS (SELECT COUNT(*) = SUM(CASE WHEN m.pos IS NOT NULL AND b.pos IS NOT NULL
            THEN 1 ELSE 0 END) AS merge_exact
        FROM halves m FULL OUTER JOIN bits b ON m.pos = b.pos)
      SELECT
        (SELECT COUNT(*) FROM keys) AS n_keys,
        (SELECT COUNT(*) FROM bits) AS n_bits_set,
        (SELECT SUM(CASE WHEN hits = $BfHashes THEN 1 ELSE 0 END) FROM phit)
          = (SELECT COUNT(*) FROM keys) AS no_false_neg,
        (SELECT COUNT(*) FROM ahit) AS n_probes,
        (SELECT CAST(SUM(CASE WHEN hits = $BfHashes THEN 1 ELSE 0 END) AS BIGINT)
          FROM ahit) AS n_false_pos,
        (SELECT CAST(SUM(CASE WHEN hits = $BfHashes THEN 1 ELSE 0 END) AS DOUBLE)
          FROM ahit) / (SELECT COUNT(*) FROM ahit) AS fpr,
        (SELECT merge_exact FROM mok) AS merge_exact"""),
  )

  // ------------------------------------------------------------- qs01
  /** Mergeable QUANTILE sketch — the missing member of the classic
    * sketch quartet (frequency = cms, cardinality = hll, membership =
    * bf, quantiles = this). Form: bottom-k by a uniform md5-derived
    * hash of the row's unique key (the KMV / ordered-sampling family,
    * Bar-Yossef et al. 2002's bottom-k sampling applied to rank
    * queries) rather than KLL's level compactors: KLL's compaction
    * flips random coins level by level — inherently irreproducible in
    * one declarative pass — while bottom-k-by-hash delivers the SAME
    * contract (fixed k-row state, lossless mergeability, ±O(1/√k)
    * RANK error — the guarantee quantile sketches are specified by)
    * through a pure ORDER BY/LIMIT algebra both engines replay
    * bit-for-bit. Estimate for quantile q: the sampled value at rank
    * floor(q·(k−1))+1 of the value-sorted sample; the envelope check
    * then computes each estimate's TRUE rank over the full fact and
    * asserts |rank/n − q| ≤ 5% (3.2σ at k=1024) in exact integer
    * micro-units — a stronger cross-check than comparing against a
    * second quantile implementation, because it certifies the rank
    * error itself.
    *
    * 100 TB shape: orderBy(h).limit(k) compiles to
    * TakeOrderedAndProject — each task keeps a k-row heap and the
    * driver merges k-sized results (pinned in SketchesSpec); there is
    * NO global sort exchange and no O(n) state anywhere. The envelope
    * scan is one map-side-combined 9-key aggregation over the fact
    * with the 9 estimates broadcast.
    */
  private[operators] val QsK = 1024

  /** 60-bit uniform hash (15 md5 hex chars — 16 would overflow signed
    * BIGINT) of the row's unique key; (h, key) is a strict total
    * order, so the bottom-k cut is deterministic under any
    * partitioning, task retry, or merge order.
    */
  private def qsHash(key: Column): Column =
    conv(substring(md5(concat(lit("qs:"), key.cast("string")).cast("binary")),
      1, 15), 16, 10).cast("bigint")

  private def qsHashSql(key: String): String =
    s"('0x' || substr(md5('qs:' || CAST($key AS VARCHAR)), 1, 15))::BIGINT"

  /** The sketch's per-row projection (h, kk, v) BEFORE the bottom-k
    * cut — shared by the batch sketch below and the streaming
    * maintenance (str16), so both hash identically by construction.
    */
  private[graft] def quantileRows(fact: DataFrame, keyCol: String,
      valCol: String): DataFrame =
    fact.select(qsHash(col(keyCol)).as("h"),
      col(keyCol).cast("long").as("kk"),
      col(valCol).cast("double").as("v"))

  /** The k-row sketch state: (h, kk, v) — hash, unique row key, value.
    * Sampling on the ROW key (not the value) keeps duplicate values at
    * their true multiplicity, so the sketch answers quantiles of the
    * weighted distribution, not the distinct-value one.
    */
  def quantileSketch(fact: DataFrame, keyCol: String, valCol: String,
      k: Int = QsK): DataFrame =
    quantileRows(fact, keyCol, valCol).orderBy(col("h"), col("kk")).limit(k)

  /** Merge sketches: union then re-cut at k — the bottom-k of a union
    * IS the bottom-k of the united bottom-k's (every global survivor
    * survives its own half's cut), which qs02 certifies cell-for-cell.
    */
  def mergeQuantileSketches(a: DataFrame, b: DataFrame, k: Int = QsK): DataFrame =
    a.unionByName(b).orderBy(col("h"), col("kk")).limit(k)

  /** Decile estimates from a sketch: value-rank the ≤ k sample rows
    * (bounded window — the dq07 band-grid precedent) and pick the 9
    * decile order statistics.
    */
  def quantileEstimates(sketch: DataFrame): DataFrame = {
    val s = sketch.sparkSession
    val W = org.apache.spark.sql.expressions.Window
    val w = W.orderBy(col("v"), col("h"), col("kk"))
    // rank AND size from the SAME bounded window pass — a separate
    // count aggregate would re-execute the sketch's fact cut twice
    val ranked = sketch.withColumn("rn", row_number().over(w).cast("bigint"))
      .withColumn("s_n", count(lit(1)).over(
        w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
    ranked.join(broadcast(s.range(1, 10).toDF("decile")),
        col("rn") === expr("decile * (s_n - 1) div 10 + 1"))
      .select(col("decile"), col("v").as("est"))
  }

  /** The exact-rank envelope audit shared by qs01 (direct sketch) and
    * qs04 (warehouse-merged sketch): one map-side-combined 9-key
    * aggregation over the fact with the 9 estimates broadcast.
    */
  private[operators] def decileEnvelope(fact: DataFrame, valCol: String,
      est: DataFrame): DataFrame =
    fact.select(col(valCol).cast("double").as("v"))
      .crossJoin(broadcast(est))
      .groupBy("decile", "est")
      .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rank_lt"),
        count(lit(1)).as("n"))
      .withColumn("in_envelope",
        abs(col("rank_lt") * lit(1000000L) -
          col("decile") * lit(100000L) * col("n")) <= lit(50000L) * col("n"))
      .orderBy("decile")

  private val qs01 = QueryDef(
    "qs01_quantile_sketch",
    (s, dir) => {
      val o = Tables(s, dir).orders
      decileEnvelope(o, "o_totalprice",
        quantileEstimates(quantileSketch(o, "o_orderkey", "o_totalprice")))
    },
    Some(s"""WITH f AS (SELECT o_orderkey AS kk, CAST(o_totalprice AS DOUBLE) AS v,
          ${qsHashSql("o_orderkey")} AS h
        FROM orders),
      sk AS (SELECT h, kk, v FROM f ORDER BY h, kk LIMIT $QsK),
      sn AS (SELECT CAST(COUNT(*) AS BIGINT) AS s_n FROM sk),
      rk AS (SELECT v, CAST(ROW_NUMBER() OVER (ORDER BY v, h, kk) AS BIGINT) AS rn
        FROM sk),
      est AS (SELECT d.decile, rk.v AS est
        FROM range(1, 10) d(decile) JOIN rk
          ON rk.rn = (d.decile * ((SELECT s_n FROM sn) - 1)) // 10 + 1)
      SELECT e.decile, e.est,
        CAST(SUM(CASE WHEN f.v < e.est THEN 1 ELSE 0 END) AS BIGINT) AS rank_lt,
        COUNT(*) AS n,
        abs(CAST(SUM(CASE WHEN f.v < e.est THEN 1 ELSE 0 END) AS BIGINT) * 1000000
          - e.decile * 100000 * COUNT(*)) <= 50000 * COUNT(*) AS in_envelope
      FROM f, est e
      GROUP BY e.decile, e.est
      ORDER BY e.decile"""),
  )

  // ------------------------------------------------------------- qs02
  /** Quantile-sketch mergeability, oracle-proved (the cms02/hll02
    * pattern): parity halves' sketches merged by union-and-recut must
    * equal the direct whole-corpus sketch CELL FOR CELL — the property
    * that lets executor-local k-row states combine into the global
    * sketch, and per-day sketches roll up into a month, without
    * re-reading anything.
    */
  private val qs02 = QueryDef(
    "qs02_quantile_merge",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val even = quantileSketch(
        o.filter(col("o_orderkey") % 2 === 0), "o_orderkey", "o_totalprice")
      val odd = quantileSketch(
        o.filter(col("o_orderkey") % 2 =!= 0), "o_orderkey", "o_totalprice")
      val merged = mergeQuantileSketches(even, odd)
      val direct = quantileSketch(o, "o_orderkey", "o_totalprice")
      merged.join(direct.withColumnRenamed("v", "v_direct"),
          Seq("h", "kk"), "full_outer")
        .agg(count(lit(1)).as("n_cells"),
          sum(when(col("v") === col("v_direct"), 1L).otherwise(0L))
            .as("n_equal"))
        .withColumn("merge_exact", col("n_cells") === col("n_equal"))
    },
    Some(s"""WITH f AS (SELECT o_orderkey AS kk, CAST(o_totalprice AS DOUBLE) AS v,
          ${qsHashSql("o_orderkey")} AS h
        FROM orders),
      halves AS (
        SELECT * FROM (SELECT h, kk, v FROM f WHERE kk % 2 = 0
          ORDER BY h, kk LIMIT $QsK)
        UNION ALL
        SELECT * FROM (SELECT h, kk, v FROM f WHERE kk % 2 <> 0
          ORDER BY h, kk LIMIT $QsK)),
      merged AS (SELECT h, kk, v FROM halves ORDER BY h, kk LIMIT $QsK),
      direct AS (SELECT h, kk, v FROM f ORDER BY h, kk LIMIT $QsK)
      SELECT COUNT(*) AS n_cells,
        CAST(SUM(CASE WHEN m.v = d.v THEN 1 ELSE 0 END) AS BIGINT) AS n_equal,
        COUNT(*) = SUM(CASE WHEN m.v = d.v THEN 1 ELSE 0 END) AS merge_exact
      FROM merged m FULL OUTER JOIN direct d USING (h, kk)"""),
  )

  // ------------------------------------------------------------- qs03
  /** GROUPED quantile sketch — per-group deciles (per-priority price
    * distribution, per-source length percentiles), the hll03/cms03
    * grouped form of qs01: each group carries its own fixed k-row
    * bottom-k state. The per-group cut is TWO-PHASE (cms03's salted
    * top-k): the group column has few values, so a single window
    * partitioned by group alone would funnel every group's rows
    * through a handful of data-sized partitions — phase 1 takes a
    * local bottom-k within (group, key-salt) (a group's global
    * bottom-k rows are necessarily in their salt's local bottom-k),
    * phase 2 re-ranks the ≤ 32·k survivors per group (bounded, not
    * data-sized). Estimates and the exact-rank envelope then run per
    * group exactly as qs01.
    */
  def quantileSketchBy(fact: DataFrame, grp: String, keyCol: String,
      valCol: String, k: Int = QsK): DataFrame = {
    val W = org.apache.spark.sql.expressions.Window
    val base = fact.select(col(grp), qsHash(col(keyCol)).as("h"),
      col(keyCol).cast("long").as("kk"),
      col(valCol).cast("double").as("v"))
    val wSalt = W.partitionBy(col(grp), pmod(col("kk"), lit(32)))
      .orderBy(col("h"), col("kk"))
    val wG = W.partitionBy(col(grp)).orderBy(col("h"), col("kk"))
    base
      .withColumn("rk", row_number().over(wSalt)).filter(col("rk") <= k).drop("rk")
      .withColumn("rk", row_number().over(wG)).filter(col("rk") <= k).drop("rk")
  }

  private val qs03 = QueryDef(
    "qs03_grouped_quantiles",
    (s, dir) => {
      val W = org.apache.spark.sql.expressions.Window
      val o = Tables(s, dir).orders
      val sk = quantileSketchBy(o, "o_orderpriority", "o_orderkey", "o_totalprice")
      // bounded windows: the sketch is ≤ k rows per group; rank and
      // group size come from the SAME window pass (a groupBy-count
      // join would re-run the two-phase cut over the fact twice)
      val w = W.partitionBy(col("o_orderpriority")).orderBy(col("v"), col("h"), col("kk"))
      val ranked = sk.withColumn("rn", row_number().over(w).cast("bigint"))
        .withColumn("s_n", count(lit(1)).over(
          w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)))
      val est = ranked.join(broadcast(s.range(1, 10).toDF("decile")),
          col("rn") === expr("decile * (s_n - 1) div 10 + 1"))
        .select(col("o_orderpriority"), col("decile"), col("v").as("est"))
      o.select(col("o_orderpriority"), col("o_totalprice").cast("double").as("v"))
        .join(broadcast(est), "o_orderpriority")
        .groupBy("o_orderpriority", "decile", "est")
        .agg(sum(when(col("v") < col("est"), 1L).otherwise(0L)).as("rank_lt"),
          count(lit(1)).as("n"))
        .withColumn("in_envelope",
          abs(col("rank_lt") * lit(1000000L) -
            col("decile") * lit(100000L) * col("n")) <= lit(50000L) * col("n"))
        .orderBy("o_orderpriority", "decile")
    },
    Some(s"""WITH f AS (SELECT o_orderpriority AS g, o_orderkey AS kk,
          CAST(o_totalprice AS DOUBLE) AS v,
          ${qsHashSql("o_orderkey")} AS h
        FROM orders),
      sk AS (SELECT g, h, kk, v FROM (
          SELECT g, h, kk, v,
            ROW_NUMBER() OVER (PARTITION BY g ORDER BY h, kk) AS rk FROM f)
        WHERE rk <= $QsK),
      sn AS (SELECT g, CAST(COUNT(*) AS BIGINT) AS s_n FROM sk GROUP BY g),
      rk AS (SELECT g, v,
          CAST(ROW_NUMBER() OVER (PARTITION BY g ORDER BY v, h, kk) AS BIGINT) AS rn
        FROM sk),
      est AS (SELECT sn.g, d.decile, rk.v AS est
        FROM sn CROSS JOIN range(1, 10) d(decile)
        JOIN rk ON rk.g = sn.g
          AND rk.rn = (d.decile * (sn.s_n - 1)) // 10 + 1)
      SELECT e.g AS o_orderpriority, e.decile, e.est,
        CAST(SUM(CASE WHEN f.v < e.est THEN 1 ELSE 0 END) AS BIGINT) AS rank_lt,
        COUNT(*) AS n,
        abs(CAST(SUM(CASE WHEN f.v < e.est THEN 1 ELSE 0 END) AS BIGINT) * 1000000
          - e.decile * 100000 * COUNT(*)) <= 50000 * COUNT(*) AS in_envelope
      FROM f JOIN est e ON e.g = f.g
      GROUP BY e.g, e.decile, e.est
      ORDER BY o_orderpriority, decile"""),
  )

  // ------------------------------------------------------------- qs04
  /** Persisted quantile-sketch warehouse — hll04's pattern for the
    * quantile member: each ingestion batch APPENDS its k-row bottom-k
    * state to a managed table, and estimation merges on read by
    * distinct-then-recut (the union monoid qs02 proves, made
    * replay-tolerant: a retried batch appends the SAME (h, kk, v)
    * rows, and the (h, kk) dedup before the cut makes the duplicate
    * copies invisible — without it a duplicated row could displace a
    * legitimate k-th row from the recut, the bottom-k analog of why
    * hll04's max-merge is naturally idempotent). Append-only, never
    * rewritten. Shares qs01's oracle: a hash match proves neither
    * batch boundaries NOR the persistence roundtrip can change a
    * single decile estimate or its rank audit.
    */
  private lazy val qs04 = QueryDef(
    "qs04_quantile_warehouse",
    (s, dir) => {
      val o = Tables(s, dir).orders
      val table = s"qs04_sketch_${ProcessHandle.current().pid()}_" +
        java.util.UUID.randomUUID().toString.replace("-", "").take(8)
      try {
        graft.sink.Sinks.saveTable(
          quantileSketch(o.filter(col("o_orderkey") % 3 =!= 0),
            "o_orderkey", "o_totalprice"), table)
        graft.sink.Sinks.saveTable(
          quantileSketch(o.filter(col("o_orderkey") % 3 === 0),
            "o_orderkey", "o_totalprice"), table)
        val merged = s.table(table).dropDuplicates(Seq("h", "kk"))
          .orderBy(col("h"), col("kk")).limit(QsK)
        decileEnvelope(o, "o_totalprice", quantileEstimates(merged))
          .localCheckpoint(eager = true)
      } finally { s.sql(s"DROP TABLE IF EXISTS $table"); () }
    },
    qs01.oracle,
  )

  // Shared by StreamingParity's str16: the streamed sketch must emit
  // the identical envelope table, so it checks against the SAME oracle.
  private[operators] def qs01Oracle: Option[String] = qs01.oracle

  val defs: Seq[QueryDef] = Seq(cms01, cms02, cms03, hll01, hll02, hll03, hll04,
    hll05, hll06, bf01, qs01, qs02, qs03, qs04)
}
