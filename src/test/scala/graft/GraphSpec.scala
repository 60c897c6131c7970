package graft

import org.apache.spark.sql.DataFrame
import graft.operators.Graph

/** Semantic coverage for fixed-point PageRank (x39's engine face).
  * Cross-engine cell-exactness is the driver oracle's job; these pin the
  * graph-theoretic properties and the integer-arithmetic guarantees the
  * operator advertises: mass conservation, symmetry, centrality
  * ordering, dangling handling, and bit-stability under repartitioning. */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private def vdf(ids: Long*): DataFrame = ids.toDF("id")
  private def edf(pairs: (Long, Long)*): DataFrame = pairs.toDF("src", "dst")

  private def ranks(v: DataFrame, e: DataFrame): Map[Long, Double] =
    Graph.pageRank(v, e).as[(Long, Double)].collect().toMap

  test("mass conservation: ranks sum to ~1 (truncation loss only)") {
    val r = ranks(vdf(1, 2, 3, 4, 5), edf((1, 2), (2, 3), (3, 4)))
    val total = r.values.sum
    // every op is a truncating integer divide losing <1 unit of 10^-15
    // per (vertex|edge) per iteration — loss is bounded far below 1e-9
    assert(math.abs(total - 1.0) < 1e-9, s"mass not conserved: $total")
  }

  test("complete graph: full symmetry, all ranks exactly equal") {
    val vs = Seq(1L, 2L, 3L, 4L)
    val es = for (a <- vs; b <- vs if a < b) yield (a, b)
    val r = ranks(vdf(vs: _*), edf(es: _*))
    // integer arithmetic: symmetric vertices get the SAME long, so the
    // display doubles are exactly equal, not approximately
    assert(r.values.toSet.size == 1, s"symmetric ranks differ: $r")
  }

  test("star graph: hub outranks leaves; leaves mutually equal") {
    val r = ranks(vdf(0, 1, 2, 3, 4, 5),
      edf((0, 1), (0, 2), (0, 3), (0, 4), (0, 5)))
    val leaves = (1L to 5L).map(r)
    assert(leaves.toSet.size == 1, s"leaf ranks differ: $r")
    assert(r(0L) > leaves.head, s"hub does not outrank leaves: $r")
  }

  test("isolated vertex settles at the dangling-fed floor, below connected ones") {
    val r = ranks(vdf(1, 2, 3), edf((1, 2)))
    assert(r(1L) == r(2L), s"symmetric pair differs: $r")
    assert(r(3L) > 0.0 && r(3L) < r(1L),
      s"isolated vertex not strictly between 0 and the connected ranks: $r")
  }

  test("bit-identical under repartitioning") {
    val v = vdf(1, 2, 3, 4, 5, 6, 7)
    val e = edf((1, 2), (2, 3), (1, 3), (4, 5), (6, 7), (3, 4))
    val a = ranks(v, e)
    val b = ranks(v.repartition(7), e.repartition(5))
    // fixed-point longs → the doubles must match EXACTLY, no tolerance
    assert(a == b, s"ranks flipped under a different partitioning:\n$a\n$b")
  }

  test("guards: empty vertex set and out-of-range damping rejected") {
    intercept[IllegalArgumentException] {
      Graph.pageRank(vdf(), edf())
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(vdf(1), edf(), dampingPct = 100)
    }
    intercept[IllegalArgumentException] {
      Graph.pageRank(vdf(1), edf(), iters = 0)
    }
  }
}
