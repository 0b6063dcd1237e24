package graft.operators

import graft.SparkSpec

/** Drift/audit statistics: each declared query is checked against an
  * independent in-memory reimplementation at sf0.001 (the DuckDB oracle
  * covers cross-engine determinism; these cover the math).
  */
class DriftSpec extends SparkSpec {

  /** o_orderdate surfaces as TIMESTAMP_NTZ (LocalDateTime) or TIMESTAMP
    * (java.sql.Timestamp) depending on the generator's parquet flavor —
    * normalize to "before the split instant" either way (UTC session).
    */
  private def beforeSplit(v: Any): Boolean = v match {
    case t: java.time.LocalDateTime =>
      t.isBefore(java.time.LocalDateTime.parse("1995-07-01T00:00"))
    case t: java.sql.Timestamp =>
      t.before(java.sql.Timestamp.valueOf("1995-07-01 00:00:00"))
    case other => fail(s"unexpected o_orderdate type: ${other.getClass}")
  }

  private def orderCohorts(): (Array[Double], Array[Double]) = {
    val rows = graft.sources.Tables(spark, sf0001).orders
      .select("o_totalprice", "o_orderdate").collect()
    val (e, l) = rows.partition(r => beforeSplit(r.get(1)))
    (e.map(_.getDouble(0)), l.map(_.getDouble(0)))
  }

  test("ks01: hierarchical ECDF matches the brute-force KS distance") {
    val (e, l) = orderCohorts()
    val pooled = (e ++ l).distinct
    val brute = pooled.map { x =>
      math.abs(e.count(_ <= x).toLong * l.length - l.count(_ <= x).toLong * e.length)
    }.max
    val r = graft.Registry.byName("ks01_ks_drift").run(spark, sf0001).collect().head
    assert(r.getAs[Long]("n_early") == e.length.toLong)
    assert(r.getAs[Long]("n_late") == l.length.toLong)
    assert(r.getAs[Long]("ks_num") == brute,
      s"distributed KS numerator ${r.getAs[Long]("ks_num")} != brute $brute")
    assert(r.getAs[Long]("ks_scaled") ==
      brute * 1000000L / (e.length.toLong * l.length))
  }

  test("chi01: every cell's statistic matches the hand-computed contingency") {
    val rows = graft.sources.Tables(spark, sf0001).orders
      .select("o_orderpriority", "o_orderdate").collect()
      .map(r => (r.getString(0), if (beforeSplit(r.get(1))) "early" else "late"))
    val n = rows.length.toLong
    val obs = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rt = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ct = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val got = graft.Registry.byName("chi01_chisq_drift").run(spark, sf0001).collect()
    assert(got.length == obs.size)
    for (r <- got) {
      val key = (r.getString(0), r.getString(1))
      val diff = obs(key) * n - rt(key._1) * ct(key._2)
      val expChi = diff.toDouble * diff.toDouble / (n * rt(key._1) * ct(key._2)).toDouble
      assert(r.getAs[Long]("obs") == obs(key), s"$key obs")
      assert(r.getAs[Long]("exp_floor") == rt(key._1) * ct(key._2) / n, s"$key exp")
      assert(r.getAs[Double]("chi2_cell") == expChi, s"$key chi2")
    }
  }

  test("dp01: noise is nonzero, bounded by the 24-bit inverse-CDF tail, and repeatable") {
    val run1 = graft.Registry.byName("dp01_dp_counts").run(spark, sf0001).collect()
    val run2 = graft.Registry.byName("dp01_dp_counts").run(spark, sf0001).collect()
    assert(run1.nonEmpty)
    assert(run1.map(_.toString).toSeq == run2.map(_.toString).toSeq,
      "derandomized noise must be identical across runs")
    for (r <- run1) {
      val noise = r.getAs[Double]("noisy_count") - r.getAs[Long]("n")
      assert(noise != 0.0, s"${r.getString(0)}: hash-derived noise can't be exactly 0")
      // max |noise| at e=1: -ln(2^-24 scale tail) < 17.4
      assert(math.abs(noise) < 17.4, s"${r.getString(0)}: $noise outside Laplace tail")
    }
  }

  test("cal01: bins partition the scored docs; rates and sums reconcile") {
    val docs = graft.sources.Tables(spark, sf0001).documents
    val scored = docs.count() // every generated doc has text; all score
    val got = graft.Registry.byName("cal01_reliability_bins").run(spark, sf0001).collect()
    assert(got.map(_.getAs[Long]("bin")).forall(b => b >= 0 && b <= 9))
    assert(got.map(_.getAs[Long]("n_docs")).sum == scored)
    for (r <- got) {
      assert(r.getAs[Long]("n_pos") <= r.getAs[Long]("n_docs"))
      assert(r.getAs[Double]("pos_rate") ==
        r.getAs[Long]("n_pos").toDouble / r.getAs[Long]("n_docs").toDouble)
    }
    // the scaled score of every doc is inside the declared [-50000, 50000]
    // envelope, so per-bin sums are bounded by n_docs * 50000
    for (r <- got)
      assert(math.abs(r.getAs[Long]("sum_score_scaled")) <=
        r.getAs[Long]("n_docs") * 50000L)
  }

  test("fe01: quantile bins are near-equal, ordered, and non-overlapping") {
    val rows = graft.Registry.byName("fe01_quantile_bins")
      .run(spark, sf0001).collect()
    assert(rows.map(_.getAs[Long]("bin")).toSeq == (0L to 9L))
    val n = rows.map(_.getAs[Long]("n_rows")).sum
    rows.foreach { r =>
      // equal-frequency: each bin within one tie-run of n/10
      assert(math.abs(r.getAs[Long]("n_rows") - n / 10) <= n / 20 + 2,
        s"bin ${r.getAs[Long]("bin")}: ${r.getAs[Long]("n_rows")} of $n")
      assert(r.getAs[Double]("x_min") <= r.getAs[Double]("x_max"))
    }
    // ranges ascend without overlap
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Double]("x_max") < b.getAs[Double]("x_min"))
    case _ => ()
    }
  }

  test("fe02: LOO encoding excludes the row's own label; naive includes it") {
    val out = graft.Registry.byName("fe02_target_encode")
      .run(spark, sf0001).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getLong(2), r.getLong(3)))
    // hand replay for one category from the raw table
    val raw = spark.read.parquet(s"$sf0001/orders.parquet")
      .select("o_orderkey", "o_orderpriority", "o_totalprice").collect()
      .map(r => (r.getLong(0), r.getString(1),
        BigDecimal(r.getDouble(2)).setScale(2, BigDecimal.RoundingMode.HALF_UP)))
    val cat = raw.groupBy(_._2).map { case (k, rs) =>
      k -> (rs.map(_._3).sum, rs.length.toLong)
    }
    for ((key, prio, loo, naive) <- out.take(200)) {
      val (csum, cn) = cat(prio)
      val y = raw.find(r => r._1 == key && r._2 == prio).get._3
      val expLoo = ((csum - y) * 1000000 / (cn - 1)).setScale(0, BigDecimal.RoundingMode.DOWN)
      val expNaive = (csum * 1000000 / cn).setScale(0, BigDecimal.RoundingMode.DOWN)
      assert(BigDecimal(loo) == expLoo, s"$key loo $loo != $expLoo")
      assert(BigDecimal(naive) == expNaive, s"$key naive $naive != $expNaive")
    }
    // the leak is measurable: LOO differs from naive wherever y differs
    // from the category mean (virtually every row in continuous data)
    assert(out.count { case (_, _, l, nv) => l != nv } > out.length / 2)
  }

  test("dq11: z-scores match a hand replay; early days score NULL") {
    val rows = graft.Registry.byName("dq11_rolling_anomaly").run(spark, sf0001)
      .collect()
      .map(r => (r.getDate(0).toString, r.getLong(1), r.getLong(2),
        if (r.isNullAt(3)) None else Some(r.getDouble(3))))
    assert(rows.nonEmpty)
    // first day has no priors -> NULL z
    assert(rows.head._3 == 0L && rows.head._4.isEmpty)
    val byDay = rows.map(r => r._1 -> r._2).toMap
    import java.time.LocalDate
    for ((day, n, k, z) <- rows if k >= 2) {
      val d = LocalDate.parse(day)
      val prior = (1 to 7).flatMap(j => byDay.get(d.minusDays(j.toLong).toString))
      assert(prior.size.toLong == k, s"$day window size")
      val mu = prior.sum.toDouble / prior.size
      val varS = prior.map(x => (x - mu) * (x - mu)).sum / (prior.size - 1)
      val expect = (n - mu) / math.sqrt(varS)
      assert(math.abs(z.get - expect) < 1e-9, s"$day: ${z.get} vs $expect")
    }
  }
}
