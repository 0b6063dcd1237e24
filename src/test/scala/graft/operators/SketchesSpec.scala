package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Deterministic sketch operators: count-min never underestimates and
  * stays fixed-size; HyperLogLog lands inside its error envelope on
  * both the raw-estimate and linear-counting branches.
  */
class SketchesSpec extends SparkSpec {
  import spark.implicits._

  test("count-min cells are bounded by depth x width and counts are conserved") {
    val li = graft.sources.Tables(spark, sf0001).lineitem
    val cells = Sketches.countMinCells(li, "l_partkey").collect()
    assert(cells.length <= 4 * 256)
    // every depth row distributes ALL fact rows across its buckets
    val n = li.count()
    val perRow = cells.groupBy(_.getInt(0)).view.mapValues(_.map(_.getLong(2)).sum)
    assert(perRow.values.toSet == Set(n), s"per-depth totals $perRow != $n")
  }

  test("cms01 estimates never underestimate the exact heavy-hitter counts") {
    val rows = graft.Registry.byName("cms01_countmin_heavy")
      .run(spark, sf0001).collect()
    assert(rows.length == 20)
    assert(rows.forall(_.getAs[Boolean]("never_under")),
      "count-min must overestimate with probability 1")
    // width 256 over ~hundreds of keys: estimates stay within a loose
    // additive bound of exact (eN/w with e≈2.7, N=6k rows) at this SF
    assert(rows.forall(r =>
      r.getAs[Long]("n_est") - r.getAs[Long]("n_exact") <= 200L))
  }

  test("hll01 lands inside the 15% envelope on all three audited columns") {
    val rows = graft.Registry.byName("hll01_hyperloglog")
      .run(spark, sf0001).collect()
    assert(rows.length == 3)
    assert(rows.forall(_.getAs[Boolean]("in_envelope")),
      rows.map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).mkString(", "))
  }

  test("sketch merges are exact: cells add, registers max") {
    for (name <- Seq("cms02_sketch_merge", "hll02_hll_merge")) {
      val r = graft.Registry.byName(name).run(spark, sf0001).collect().head
      assert(r.getAs[Boolean]("merge_exact"), s"$name: $r")
      assert(r.getLong(0) == r.getLong(1), s"$name: every cell/register must agree")
    }
  }

  test("hll linear-counting branch: tiny cardinalities are near-exact") {
    val tiny = (0 until 10).map(i => (i.toLong, s"k$i")).toDF("id", "k")
    val est = Sketches.hllEstimate(tiny, "k", "k").collect().head
    assert(est.getAs[Long]("n_exact") == 10L)
    // 10 distinct over 256 registers is deep linear-counting territory
    assert(math.abs(est.getAs[Double]("n_est") - 10.0) <= 1.0)
  }

  test("register warehouse: a replayed batch merges idempotently under max") {
    val a = (0 until 400).map(i => (i.toLong, s"u${i % 97}")).toDF("id", "k")
    val b = (0 until 400).map(i => (i.toLong, s"v${i % 53}")).toDF("id", "k")
    val once = Sketches.hllRegisterUpdates(a, "k")
      .unionByName(Sketches.hllRegisterUpdates(b, "k"))
      .groupBy("reg").agg(max(col("max_rho")).as("max_rho"))
    // batch b lands TWICE (the at-least-once replay a warehouse must absorb)
    val replayed = Sketches.hllRegisterUpdates(a, "k")
      .unionByName(Sketches.hllRegisterUpdates(b, "k"))
      .unionByName(Sketches.hllRegisterUpdates(b, "k"))
      .groupBy("reg").agg(max(col("max_rho")).as("max_rho"))
    val e1 = Sketches.hllEstimateFromRegisters(once).collect().head.getDouble(0)
    val e2 = Sketches.hllEstimateFromRegisters(replayed).collect().head.getDouble(0)
    assert(e1 == e2, s"replay changed the estimate: $e1 vs $e2")
    val regs1 = once.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val regs2 = replayed.collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(regs1 == regs2, "register state must be replay-invariant")
  }

  test("hll06: every active day's rolling estimate lands in the envelope") {
    val rows = graft.Registry.byName("hll06_rolling_sketch").run(spark, sf0001)
      .collect()
    assert(rows.nonEmpty)
    val days = rows.map(_.getDate(0).toString)
    assert(days.sorted.sameElements(days), "days must be ordered")
    rows.foreach { r =>
      assert(r.getLong(1) > 0 && r.getDouble(2) > 0.0)
      assert(r.getBoolean(3),
        s"day ${r.getDate(0)}: est ${r.getDouble(2)} vs exact ${r.getLong(1)} out of envelope")
    }
  }

  test("bf01: no false negatives, measured FPR near theory, merge exact") {
    val row = graft.Registry.byName("bf01_bloom_filter").run(spark, sf0001)
      .collect().head
    val nBitsSet = row.getLong(1)
    assert(row.getBoolean(2), "an inserted key can never fail the probe")
    assert(row.getBoolean(6), "parity-half union must equal the direct build")
    // measured FPR ≈ (load)^k with m=16384, k=4 — allow a generous band
    val theory = math.pow(nBitsSet.toDouble / 16384.0, 4)
    val fpr = row.getDouble(5)
    assert(fpr <= theory * 4 + 0.01, s"fpr $fpr way above theory $theory")
  }

  test("qs01: every decile estimate's true rank lands inside the 5% envelope") {
    val rows = graft.Registry.byName("qs01_quantile_sketch").run(spark, sf0001)
      .collect()
    assert(rows.map(_.getLong(0)).toSeq == (1L to 9L),
      "all nine deciles must be estimated")
    rows.foreach { r =>
      assert(r.getBoolean(4),
        s"decile ${r.getLong(0)}: rank ${r.getLong(2)}/${r.getLong(3)} out of envelope")
    }
    // estimates are order statistics of the data, so they must ascend
    val ests = rows.map(_.getDouble(1))
    assert(ests.sorted.sameElements(ests), "decile estimates must be monotone")
  }

  test("qs02: union-and-recut merge equals the direct sketch cell for cell") {
    val row = graft.Registry.byName("qs02_quantile_merge").run(spark, sf0001)
      .collect().head
    assert(row.getLong(0) == 1024 && row.getBoolean(2),
      s"merge must be exact over the full register table: $row")
  }

  test("qs03: every (group, decile) estimate lands inside the per-group envelope") {
    val rows = graft.Registry.byName("qs03_grouped_quantiles").run(spark, sf0001)
      .collect()
    val groups = rows.map(_.getString(0)).distinct
    assert(groups.length == 5, s"expected 5 priority groups: ${groups.toSeq}")
    groups.foreach { g =>
      val sub = rows.filter(_.getString(0) == g)
      assert(sub.map(_.getLong(1)).toSeq == (1L to 9L),
        s"group $g must carry all nine deciles")
      sub.foreach(r => assert(r.getBoolean(5),
        s"group $g decile ${r.getLong(1)} out of envelope: $r"))
      val ests = sub.sortBy(_.getLong(1)).map(_.getDouble(2))
      assert(ests.sorted.sameElements(ests),
        s"group $g decile estimates must be monotone")
    }
  }

  test("qs04: warehouse merge-on-read is replay-idempotent under a duplicated batch") {
    import spark.implicits._
    val o = graft.sources.Tables(spark, sf0001).orders
    val batchA = Sketches.quantileSketch(
      o.filter(col("o_orderkey") % 3 =!= 0), "o_orderkey", "o_totalprice")
    val batchB = Sketches.quantileSketch(
      o.filter(col("o_orderkey") % 3 === 0), "o_orderkey", "o_totalprice")
    def recut(df: org.apache.spark.sql.DataFrame) =
      df.dropDuplicates(Seq("h", "kk")).orderBy(col("h"), col("kk")).limit(1024)
    val once = recut(batchA.unionByName(batchB)).collect().toSeq
    // a RETRIED batch appends its rows a second time; the dedup before
    // the cut must make the duplicates invisible
    val replayed = recut(batchA.unionByName(batchB).unionByName(batchB))
      .collect().toSeq
    assert(replayed == once, "a replayed batch must not perturb the recut")
    val direct = Sketches.quantileSketch(o, "o_orderkey", "o_totalprice")
      .collect().toSeq
    assert(once == direct, "merged batches must equal the direct sketch")
  }

  test("quantile sketch compiles to a per-partition top-k, not a global sort") {
    val o = graft.sources.Tables(spark, sf0001).orders
    val plan = Sketches.quantileSketch(o, "o_orderkey", "o_totalprice")
      .queryExecution.sparkPlan.toString
    assert(plan.contains("TakeOrderedAndProject"),
      s"bottom-k cut must be TakeOrderedAndProject (k-row heaps per task):\n$plan")
  }
}
