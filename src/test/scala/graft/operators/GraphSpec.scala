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
}
