package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Benchmark main: times every declared query on SPARK_GRAFT_SF_DIR and
  * prints ONE JSON line for the driver.
  *
  * Methodology:
  *  - noop-format writes force every output column to be computed
  *    (count() would let Catalyst prune the projections under test);
  *  - FIVE interleaved passes (pass loop outside, query loop inside),
  *    trimmed median per query (drop the fastest and slowest pass,
  *    median of the middle three) — a multi-second environment stall
  *    lands in one pass and the trim discards it, and a single
  *    suspiciously-fast pass can't drag the number down either;
  *  - per-query per-pass times are persisted to `bench_passes.json`
  *    (a side file, NOT the stdout line: round 3 in-lined them and the
  *    resulting ~5 KB line overflowed the driver's tail capture) so
  *    the next round can distinguish noise from regression instead of
  *    comparing two opaque medians;
  *  - the stdout line itself is budgeted to 1600 chars: the driver
  *    keeps only the LAST 2000 chars of run output, so the full
  *    per-query map (75+ queries) can no longer fit. stdout carries
  *    the total, query count, and the slowest queries that fit the
  *    budget; `bench_result.json` carries the complete map;
  *  - a query that throws in EVERY pass lands in `"failed"` and forces
  *    a nonzero exit — a hard regression can't read as a speedup; a
  *    query that throws in SOME passes lands in `"flaky"` (first
  *    error recorded) with its surviving passes still timed — a
  *    transient environment hiccup doesn't fail the round;
  *  - queries whose min/max spread exceeds 2x AND 0.75 s absolute
  *    AFTER trimming are listed in `"unstable":[...]` (the absolute
  *    floor keeps sub-second scheduler noise out of the flag);
  *  - the per-query trimmed MIN is reported alongside the median
  *    (`"qmin"` map in bench_result.json, `"total_min"` on stdout):
  *    the min is the contention-free floor, so a median regression
  *    whose min holds steady is environment noise, not a code
  *    regression — decidable without opening bench_passes.json;
  *  - an untimed warmup pass runs every query once before the timed
  *    passes so codegen compilation and footer reads don't bias pass 1.
  *
  * Also benches the bucketed-layout story: orders ⋈ lineitem is timed
  * both over plain parquet (shuffle both sides) and over co-bucketed
  * tables (shuffle-free join), as `xb_join_plain` / `xb_join_bucketed`.
  * Bucketed-table setup cost is NOT timed — at cluster scale bucketing
  * is a one-off layout decision amortized over every downstream join.
  * Honest scale note: at sf0.1 (600k lineitem rows) the bucketed join
  * measures ~0.1 s SLOWER — the saved shuffle costs less than the scan
  * parallelism 32 tiny bucket files give up. Replicating the tables 4x
  * (2.4M rows, same harness) inverts it: bucketed 0.77 s vs plain
  * 1.17 s median — the crossover the layout is designed for, growing
  * with data size as the shuffle dominates.
  */
object Bench {
  private val Passes = 5

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val warehouse = java.nio.file.Files.createTempDirectory("graft-bench-wh").toString
    val spark = GraftSession.tune(SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.warehouse.dir", warehouse)
      .config("spark.ui.enabled", "false"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // Warm the JVM/codegen once on the smallest SF so per-query timings
    // measure the plan, not first-use classloading.
    try SparkEntry.entry(spark).count() catch { case _: Throwable => () }

    // Drift-bisection mode: measure ONLY ingest throughput (seconds,
    // not the ~25 min full sweep) so an ingest_rps move between rounds
    // can be re-measured in isolation on demand.
    if (sys.env.contains("SPARK_GRAFT_INGEST_ONLY")) {
      val (rps, best) = ingestThroughput(spark)
      println(f"""{"metric":"ingest_rps","value":$rps%.0f,"best":$best%.0f}""")
      spark.stop()
      return
    }

    val all: Seq[(String, (SparkSession, String) => DataFrame)] =
      SparkEntry.queries.toSeq.sortBy(_._1) ++ bucketedJoinBench(spark, sfDir) ++
        skewBench ++ vectorIndexBench(spark, sfDir)

    // Warmup pass 0 (untimed): every query runs once so whole-stage
    // codegen compilation, parquet footer reads and broadcast-build
    // classloading land here instead of in pass 1. Round-4 per-pass
    // data (bench_passes.json) showed pass 1 reading 2-4x the steady
    // state for plans with many codegen stages; the trim absorbed it
    // but the medians still skewed on queries where contention added a
    // second slow pass. Errors are ignored here — a query that throws
    // gets its full 5 chances below.
    for ((_, fn) <- all)
      try fn(spark, sfDir).write.format("noop").mode("overwrite").save()
      catch { case _: Throwable => () }

    // times(name) = successful pass times (in pass order);
    // errors(name) = first error message seen
    val times = scala.collection.mutable.Map.empty[String, List[Double]]
    val errors = scala.collection.mutable.Map.empty[String, String]
    for (_ <- 1 to Passes; (name, fn) <- all) {
      val t0 = System.nanoTime()
      try {
        fn(spark, sfDir).write.format("noop").mode("overwrite").save()
        times(name) = times.getOrElse(name, Nil) :+ ((System.nanoTime() - t0) / 1e9)
      } catch {
        case e: Throwable =>
          errors.getOrElseUpdate(name,
            Option(e.getMessage).getOrElse(e.getClass.getName).take(200))
      }
    }
    // trimmed median: drop the single fastest and slowest pass, median
    // of the rest (plain median when fewer than 3 passes survived)
    def trimmed(xs: List[Double]): List[Double] = {
      val s = xs.sorted
      if (s.size >= 3) s.slice(1, s.size - 1) else s
    }
    def median(xs: List[Double]): Double = { val s = xs.sorted; s(s.size / 2) }
    val results = all.map(_._1)
      .flatMap(n => times.get(n).map(xs => n -> median(trimmed(xs)))).toMap
    // Trimmed-min per query, reported ALONGSIDE the median (round-5
    // verdict): sandbox contention inflates medians on identical code
    // (round 5 saw 3-5x outlier passes corrupt cross-round comparison).
    // The min of the surviving passes is the contention-free floor —
    // when a query's median regresses but its min holds, the cause is
    // noise, not code. The driver can now see both without opening
    // bench_passes.json.
    val mins = all.map(_._1)
      .flatMap(n => times.get(n).map(xs => n -> trimmed(xs).min)).toMap
    // failed = zero successful passes (exit 1); flaky = some passes threw
    val failed = errors.view.filterKeys(n => !times.contains(n)).toMap
    val flaky = errors.view.filterKeys(times.contains).toMap
    // unstable = post-trim spread exceeds 2x AND at least 0.75 s in
    // absolute terms. The ratio alone flagged 10 sub-second queries in
    // round 4 (a 0.35 s fixture read hitting 0.8 s under interleaved
    // load is scheduler noise, not a measurement problem); the absolute
    // floor keeps the flag for spreads that could actually move a
    // cross-round comparison.
    val unstable = times.collect {
      case (n, xs) if { val t = trimmed(xs)
        t.size >= 2 && t.max / math.max(t.min, 1e-9) > 2.0 &&
          t.max - t.min > 0.75 } => n
    }.toSeq.sorted

    // JSON string escape incl. control chars — exception messages carry
    // newlines/tabs and must not break the one-line output contract
    def jstr(s: String) = "\"" + s.flatMap {
      case '"' => "\\\""
      case '\\' => "\\\\"
      case c if c < ' ' => " "
      case c => c.toString
    } + "\""
    // explicit locale: a comma-decimal default locale must not produce
    // invalid JSON
    def jnum(v: Double) = String.format(java.util.Locale.ROOT, "%.4f", Double.box(v))
    val passesJson = times.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + v.map(jnum).mkString("[", ",", "]") }
      .mkString("{", ",", "}")
    def errJson(m: Map[String, String], cap: Int = Int.MaxValue) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jstr(v.take(cap)) }.mkString("{", ",", "}")
    val total = results.values.sum
    // Ingestion throughput — the one concrete number BASELINE.md claims
    // (30,786 records/sec into SQLite). Measured end-to-end on the
    // distributed JSONL path: discover + parse + normalize + lineage +
    // count + noop-sink over a generated 200k-record corpus. Corpus
    // generation is untimed (layout setup); median of 3 timed passes.
    // median-of-5 plus the best pass: round 5's official ingest_rps fell
    // 533k -> 138k on IDENTICAL ingest code purely from sandbox
    // contention; the best-pass number is the floor-of-noise figure the
    // cross-round comparison should use when the two disagree.
    val (ingestRps, ingestRpsBest) = try ingestThroughput(spark) catch {
      case e: Throwable => System.err.println(s"[bench] ingest bench failed: $e"); (0.0, 0.0)
    }
    // total = sum of per-query trimmed medians; total_min = sum of
    // per-query trimmed minima (the contention-free floor). A large
    // total/total_min gap on unchanged code means the run was polluted.
    val totalMin = mins.values.sum
    def assemble(qs: String, failCap: Int, unstableCap: Int, qmin: String = "{}") =
      s"""{"metric":"total","value":${jnum(total)},"unit":"sec","total_min":${jnum(totalMin)},"nq":${results.size},""" +
        s""""ingest_rps":${String.format(java.util.Locale.ROOT, "%.0f", Double.box(ingestRps))},""" +
        s""""ingest_rps_best":${String.format(java.util.Locale.ROOT, "%.0f", Double.box(ingestRpsBest))},""" +
        s""""queries":$qs,"qmin":$qmin,"failed":${errJson(failed, failCap)},"flaky":${errJson(flaky, failCap)},""" +
        s""""unstable":${unstable.take(unstableCap).map(jstr).mkString("[", ",", "]")},""" +
        s""""detail":"bench_result.json","sf":"$sfDir"}"""
    // Full per-query detail (and per-pass times) go to side files. The
    // STDOUT line must stay comfortably inside the driver's 2000-char
    // tail capture (the [success] sbt epilogue eats ~80 of those, and
    // rounds 1-3 all lost their numbers to this window) — so it carries
    // the total plus as many per-query medians as fit a 1600-char
    // budget, slowest queries first (the ones worth reading).
    def qmap(m: Map[String, Double]) = m.toSeq.sortBy(_._1)
      .map { case (k, v) => jstr(k) + ":" + jnum(v) }.mkString("{", ",", "}")
    val fullLine = assemble(qmap(results), Int.MaxValue, Int.MaxValue, qmap(mins))
    val budget = 1600
    val bySlowest = results.toSeq.sortBy(-_._2)
      .map { case (k, v) => jstr(k) + ":" + String.format(java.util.Locale.ROOT, "%.2f", Double.box(v)) }
    val base = assemble("{}", 60, 10).length
    val picked = scala.collection.mutable.ListBuffer.empty[String]
    var used = base
    for (e <- bySlowest if used + e.length + 1 <= budget) { picked += e; used += e.length + 1 }
    val stdoutLine = assemble(picked.mkString("{", ",", "}"), 60, 10)
    try {
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_passes.json"),
        s"""{"passes":$passesJson}""".getBytes("UTF-8"))
      java.nio.file.Files.write(java.nio.file.Paths.get("bench_result.json"),
        fullLine.getBytes("UTF-8"))
    } catch { case e: Throwable => System.err.println(s"[bench] side-file write failed: $e") }
    println(stdoutLine)
    spark.stop()
    if (failed.nonEmpty) sys.exit(1)
  }

  /** End-to-end JSONL ingestion throughput in records/sec, comparable
    * to the reference's claimed 30,786 rps insert rate (BASELINE.md).
    * 32 files × 6,250 records (one per core at the default CPU count)
    * are generated once, untimed; each timed pass runs the full
    * [[graft.ingest.JsonIngestor.ingestJsonl]] contract plus a noop
    * sink so parse/normalize/union/lineage are all on the clock.
    * Returns (median-of-5 rps, best-pass rps): five passes so two
    * contention-polluted passes still leave a clean median, and the
    * best pass as the noise floor for cross-round comparison.
    */
  private def ingestThroughput(spark: SparkSession, files: Int = 32,
      rowsPerFile: Int = 6250, passes: Int = 5): (Double, Double) = {
    val dir = java.nio.file.Paths.get(sys.props("java.io.tmpdir"), "graft_ingest_bench")
    val total = files.toLong * rowsPerFile
    if (!java.nio.file.Files.isDirectory(dir) ||
        java.nio.file.Files.list(dir).count() != files) {
      java.nio.file.Files.createDirectories(dir)
      for (f <- 0 until files) {
        val sb = new StringBuilder(rowsPerFile * 110)
        var i = 0
        while (i < rowsPerFile) {
          val id = f.toLong * rowsPerFile + i
          sb.append(s"""{"amount":${(id % 9973) * 0.01},"city":"city_${id % 257}",""")
            .append(s""""id":$id,"name":"user_$id","status":"${if (id % 7 == 0) "gold" else "std"}"}""")
            .append('\n')
          i += 1
        }
        java.nio.file.Files.write(dir.resolve(f"part$f%05d.jsonl"),
          sb.toString.getBytes("UTF-8"))
      }
    }
    val times = (1 to passes).map { _ =>
      val t0 = System.nanoTime()
      val res = graft.ingest.JsonIngestor.ingestJsonl(spark, dir.toString)
      res.data.write.format("noop").mode("overwrite").save()
      require(res.report.totalRecords == total,
        s"ingest bench expected $total records, got ${res.report.totalRecords}")
      (System.nanoTime() - t0) / 1e9
    }.sorted
    (total / times(times.size / 2), total / times.head)
  }

  /** Salted-vs-plain join timing on a genuinely skewed fact (the
    * round-5 verdict's ask: demonstrate the technique's BENEFIT, not
    * just its output-invariance — that is skw01's oracle job). The
    * fact is lineitem replicated 8x with ~30% of rows remapped onto
    * ONE hot key (Skew.skewedFact), so the hot key holds ~1.4M rows at
    * sf0.1 — enough that the plain sort-merge join's hot task is the
    * critical path. Measured honestly: salted (factor 32) wins ~10-15%
    * here BECAUSE AQE's skew-split (enabled, as in production) already
    * recovers most of the imbalance at this scale; explicit salting is
    * the tool for the regimes AQE cannot split — hot-key aggregations
    * above the join, hot×hot joins — and its margin grows with
    * hot-key mass.
    */
  private def skewBench: Seq[(String, (SparkSession, String) => DataFrame)] = {
    def agg(s: SparkSession, dir: String, salt: Int): DataFrame = {
      val t = graft.sources.Tables(s, dir)
      val fat = t.lineitem
        .withColumn("_r", explode(array((0 until 8).map(lit): _*))).drop("_r")
      graft.operators.Skew.skewDemoAgg(graft.operators.Skew.skewedFact(fat),
        t.orders.select(col("o_orderkey").as("okey"), col("o_orderpriority")), salt)
    }
    Seq(
      "xs_skew_plain" -> ((s: SparkSession, dir: String) => agg(s, dir, 1)),
      "xs_skew_salted" -> ((s: SparkSession, dir: String) => agg(s, dir, 32)))
  }

  /** From-scratch IVF-PQ search vs probing the PERSISTED vector index
    * (xv_ivfpq_scratch / xv_ivfpq_probe): the one-off index build is
    * untimed (the bucketed-table setup convention — a deployment
    * builds once and amortizes), so the pair measures what every
    * subsequent query actually pays — the probe reads stored PQ codes
    * where the scratch path re-trains quantizers (a driver collect)
    * and re-encodes the whole corpus per run.
    */
  private def vectorIndexBench(spark: SparkSession, sfDir: String)
      : Seq[(String, (SparkSession, String) => DataFrame)] = {
    try {
      val ipath = java.nio.file.Files
        .createTempDirectory("graft-bench-vindex").toString
      // the index must outlive every timed pass (the defs below close
      // over it), so cleanup rides a shutdown hook — and because the
      // hook is registered BEFORE the build, a half-written index from
      // a mid-save failure is removed too
      Runtime.getRuntime.addShutdownHook(new Thread(() =>
        try graft.ingest.FileUtils.delete(ipath, recursive = true): Unit
        catch { case _: Throwable => () }))
      graft.operators.VectorIndex.saveVectorIndex(
        graft.sources.Tables(spark, sfDir).embeddings, ipath)
      Seq(
        "xv_ivfpq_scratch" -> ((s: SparkSession, dir: String) =>
          graft.operators.Similarity.ivfPqTopK(
            graft.sources.Tables(s, dir).embeddings)),
        "xv_ivfpq_probe" -> ((s: SparkSession, dir: String) =>
          graft.operators.VectorIndex.probeVectorIndex(s, ipath,
            graft.sources.Tables(s, dir).embeddings.filter(col("vec_id") < 3))),
        // the MIPS-objective probe of the SAME stored index: measures
        // what the dot-product scoring function costs relative to the
        // L2 probe (same codes, different lookup tables + rank order)
        "xv_mips_probe" -> ((s: SparkSession, dir: String) =>
          graft.operators.VectorIndex.probeVectorIndexMips(s, ipath,
            graft.sources.Tables(s, dir).embeddings.filter(col("vec_id") < 3))))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] vector-index setup failed: ${e.getMessage}")
        Nil
    }
  }

  /** Same orders ⋈ lineitem aggregation over plain parquet vs
    * co-bucketed tables. Setup (one-off bucketed write) is untimed.
    */
  private def bucketedJoinBench(spark: SparkSession, sfDir: String)
      : Seq[(String, (SparkSession, String) => DataFrame)] = {
    try {
      val t = graft.sources.Tables(spark, sfDir)
      graft.sink.Sinks.saveBucketedTable(t.orders, "bench_orders_b",
        Seq("o_orderkey"), 32, Seq("o_orderkey"))
      graft.sink.Sinks.saveBucketedTable(t.lineitem, "bench_lineitem_b",
        Seq("l_orderkey"), 32, Seq("l_orderkey"))
      def agg(o: DataFrame, l: DataFrame): DataFrame =
        o.join(l, o("o_orderkey") === l("l_orderkey"))
          .groupBy(col("o_orderpriority"))
          .agg(count(lit(1)).as("n"), sum(col("l_extendedprice")).as("rev"))
      Seq(
        "xb_join_plain" -> ((s: SparkSession, dir: String) => {
          val tt = graft.sources.Tables(s, dir); agg(tt.orders, tt.lineitem)
        }),
        "xb_join_bucketed" -> ((s: SparkSession, _: String) =>
          agg(s.table("bench_orders_b"), s.table("bench_lineitem_b"))))
    } catch {
      case e: Throwable =>
        System.err.println(s"[bench] bucketed setup failed: ${e.getMessage}")
        Nil
    }
  }
}
