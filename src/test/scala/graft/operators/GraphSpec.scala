package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def ranks(edges: Seq[(Long, Long)], iters: Int = 5) =
    Graph.pageRank(edges.toDF("doc_a", "doc_b"), iterations = iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("pr01: rank mass is conserved up to integer-floor loss") {
    // triangle + pendant: 4 nodes, total scaled mass starts at ~10^12
    val r = ranks(Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L)))
    val total = r.values.sum
    // every div floors, so mass can only leak DOWN, and by < 1 unit
    // per node per term per round
    assert(total <= 1000000000000L)
    assert(total > 999999990000L, s"lost too much mass: $total")
  }

  test("pr01: symmetric star centre outranks leaves, leaves tie") {
    val r = ranks(Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L)))
    val leaves = Seq(1L, 2L, 3L, 4L).map(r)
    assert(leaves.distinct.size == 1, "leaves must tie exactly")
    assert(r(10L) > leaves.head * 2, "hub must dominate")
  }

  test("pr01: disconnected equal components get identical ranks") {
    val r = ranks(Seq((1L, 2L), (3L, 4L)))
    assert(r(1L) == r(2L) && r(2L) == r(3L) && r(3L) == r(4L))
  }

  test("pr01: deterministic across runs (scaled-integer contract)") {
    val e = Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L), (1L, 3L))
    assert(ranks(e) == ranks(e))
  }

  test("pr01: iteration gap shrinks geometrically (damping-decayed oscillation)") {
    // the symmetrized star is bipartite, so ranks OSCILLATE with
    // amplitude decaying by d² per two rounds — compare same-parity
    // gaps, which must shrink
    val e = Seq((10L, 1L), (10L, 2L), (10L, 3L), (10L, 4L))
    val g1 = math.abs(ranks(e, iters = 6)(10L) - ranks(e, iters = 4)(10L))
    val g2 = math.abs(ranks(e, iters = 12)(10L) - ranks(e, iters = 10)(10L))
    assert(g2 < g1, s"same-parity gap must decay: $g2 !< $g1")
  }

  private def hops(edges: Seq[(Long, Long)], maxHops: Int = 6,
      seedBelow: Long = 10L) =
    Graph.shortestHops(edges.toDF("doc_a", "doc_b"), maxHops, seedBelow)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap

  test("gr02: BFS levels on a path graph from a single seed") {
    val h = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 5L)), seedBelow = 2L)
    assert(h == Map(1L -> 0L, 2L -> 1L, 3L -> 2L, 4L -> 3L, 5L -> 4L))
  }

  test("gr02: shortcut edge wins over the long way; undirected relaxation") {
    // 1-2-3-4 chain plus a 1-4 shortcut given in reverse orientation
    val h = hops(Seq((1L, 2L), (2L, 3L), (3L, 4L), (4L, 1L)), seedBelow = 2L)
    assert(h(4L) == 1L, s"shortcut must relax 4 to hop 1: $h")
    assert(h(3L) == 2L, "3 is reachable both ways at 2 hops")
  }

  test("gr02: multi-source takes the NEAREST seed; unreached nodes omitted") {
    // chain 1-10-20-30-5: seeds are 1 and 5 (seedBelow=6), interior
    // nodes relabeled above the threshold; 30 is 1 hop from seed 5
    val h = hops(Seq((1L, 10L), (10L, 20L), (20L, 30L), (30L, 5L), (100L, 101L)),
      seedBelow = 6L)
    assert(h(30L) == 1L && h(20L) == 2L && h(10L) == 1L)
    assert(h(1L) == 0L && h(5L) == 0L)
    assert(!h.contains(100L) && !h.contains(101L), "far component unreachable")
    // a path longer than maxHops truncates
    val far = hops((1L to 9L).sliding(2).map(s => (s(0), s(1))).toSeq,
      maxHops = 3, seedBelow = 2L)
    assert(far.keySet == Set(1L, 2L, 3L, 4L) && far(4L) == 3L)
  }

  test("gr03: star contraction equals min-label propagation on adversarial shapes") {
    def star(edges: Seq[(Long, Long)]) =
      Graph.connectedComponentsStar(edges.toDF("doc_a", "doc_b"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def prop(edges: Seq[(Long, Long)]) =
      Dedup.clusterPairs(edges.toDF("doc_a", "doc_b"), maxIters = 50)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // long path (the high-diameter case star contraction exists for),
    // a cycle, a disconnected pair, and reversed/duplicated edges
    val path = (1L to 40L).sliding(2).map(s => (s(1), s(0))).toSeq // reversed
    val mixed = Seq((10L, 11L), (11L, 12L), (12L, 10L),            // cycle
      (20L, 21L), (21L, 20L),                                      // dup edges
      (30L, 31L))
    for (g <- Seq(path, mixed)) {
      val a = star(g); val b = prop(g)
      assert(a == b, s"star $a != propagation $b")
      // every cluster id is the component minimum (root property)
      a.groupBy(_._2).foreach { case (root, members) =>
        assert(members.keys.min == root)
      }
    }
  }

  test("gr04: 2-core keeps the cycle, peels the tail; k=3 empties a triangle") {
    def core(edges: Seq[(Long, Long)], k: Int) =
      Graph.kCore(edges.toDF("doc_a", "doc_b"), k = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // triangle {1,2,3} with a pendant chain 3-4-5: the chain needs TWO
    // peel rounds (5 first, then 4) — exercises the iteration
    val g = Seq((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L), (4L, 5L))
    assert(core(g, 2) == Map(1L -> 2L, 2L -> 2L, 3L -> 2L),
      "2-core must be exactly the triangle with in-core degrees")
    // no node of a triangle has degree 3: the 3-core is empty
    assert(core(Seq((1L, 2L), (2L, 3L), (1L, 3L)), 3).isEmpty)
    // two 4-cliques bridged by one edge: every node has degree >= 3, so
    // the 3-core keeps EVERYTHING including the bridge — the bridge
    // endpoints report in-core degree 4, clique interiors 3
    val k4a = Seq((1L, 2L), (1L, 3L), (1L, 4L), (2L, 3L), (2L, 4L), (3L, 4L))
    val k4b = k4a.map { case (x, y) => (x + 10L, y + 10L) }
    val bridged = k4a ++ k4b ++ Seq((4L, 11L))
    val c3 = core(bridged, 3)
    assert(c3.keySet == Set(1L, 2L, 3L, 4L, 11L, 12L, 13L, 14L))
    assert(c3(4L) == 4L && c3(11L) == 4L, s"bridge endpoints keep the bridge: $c3")
    assert(Set(1L, 2L, 3L, 12L, 13L, 14L).forall(c3(_) == 3L), s"$c3")
  }

  test("gr04 property: distributed peel equals the in-memory reference on random graphs") {
    def refCore(edges: Seq[(Long, Long)], k: Int): Map[Long, Long] = {
      val adj = scala.collection.mutable.Map[Long, scala.collection.mutable.Set[Long]]()
      edges.filter(e => e._1 != e._2).foreach { case (a, b) =>
        adj.getOrElseUpdate(a, scala.collection.mutable.Set()) += b
        adj.getOrElseUpdate(b, scala.collection.mutable.Set()) += a
      }
      var changed = true
      while (changed) {
        val drop = adj.collect { case (v, ns) if ns.size < k => v }.toSet
        changed = drop.nonEmpty
        drop.foreach { v => adj.remove(v).foreach(_.foreach(u => adj.get(u).foreach(_ -= v))) }
      }
      adj.map { case (v, ns) => v -> ns.size.toLong }.toMap
    }
    for (seed <- 1 to 3; k <- Seq(2, 3)) {
      val rnd = new scala.util.Random(seed * 31 + k)
      val edges = Seq.fill(60)((rnd.nextInt(25).toLong, rnd.nextInt(25).toLong))
      val got = Graph.kCore(edges.toDF("doc_a", "doc_b"), k = k)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == refCore(edges, k), s"seed=$seed k=$k: $got vs ${refCore(edges, k)}")
    }
  }
}
