package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import graft.core.{IterUtil, Tables}

/** Iterative graph analytics over (src, dst) edge lists — the step past
  * [[Dedup.connectedComponents]]'s membership labeling: PageRank scores
  * HOW CENTRAL each document is inside its near-dup neighborhood (a
  * high-rank member of a dup cluster is the one most others resemble — a
  * canonical-selection signal complementary to x31's quality score).
  *
  * Scale shape mirrors connectedComponents: each iteration is two
  * equi-joins plus one aggregate, all keyed on vertex id (uniform keys);
  * every round is lineage-cut (constant plan size) and the previous
  * round's blocks are freed, so the loop holds at most two rounds of
  * state. Pass `checkpointDir` on real clusters for executor-loss
  * durability (same contract as connectedComponents).
  *
  * Determinism: ranks are FIXED-POINT LONGS — mass in units of 10^-15 of
  * the total — and every operation in the loop is integer multiply,
  * truncating divide, or exact BIGINT sum. There is no floating-point op
  * anywhere between initialization and the final display cast, so the
  * result is bit-identical across partitionings, engines, and runs by
  * construction (x39 hash-checks against an unrolled-SQL DuckDB oracle
  * with zero tolerance). The decimal/double formulation was measured to
  * drift 1-4 units in the 14th digit cross-engine (DuckDB's
  * double→decimal cast double-rounds); integers close that door. Each
  * truncating divide loses < 10^-15 of mass — after k iterations ranks
  * sit within k*V*10^-15 of real-valued PageRank, far below any use's
  * noise floor. A narrower BIGINT also beats a 16-byte decimal for
  * shuffle width at 100 TB.
  */
object Graph {

  /** Fixed-point resolution: one rank unit = 10^-15 of total mass.
    * Headroom: damping numerators stay < 100 * 10^15 < 2^63. */
  val RankUnits: Long = 1000000000000000L

  /** x39's shared constants (Spark face + SQL twins). Damping is a
    * PERCENT so the blend stays in integer arithmetic. */
  private[graft] val PageRankIters: Int = 5
  private[graft] val PageRankDampingPct: Int = 85

  /** Fixed-iteration damped PageRank on an UNDIRECTED graph.
    *
    * `vertices` is a single-column `id` frame; `edges` holds unique
    * undirected pairs (src, dst), src != dst, both endpoints in
    * `vertices` (duplicate pairs would double-count contributions —
    * [[Dedup.ngramCandidatePairs]] guarantees uniqueness; pass arbitrary
    * edge lists through `.distinct()` first). Each edge is expanded into
    * both directions, so degree = neighbor count.
    *
    * Per iteration, with N = |vertices|, d = dampingPct, U = RankUnits,
    * and all divisions truncating:
    *
    *   rank'(v) = ((100-d) * (U div N)) div 100
    *            + (d * (danglingMass div N + Σ_{u→v} rank(u) div deg(u))) div 100
    *
    * where danglingMass is the summed rank of isolated vertices (no
    * edges — in an undirected graph the only dangling kind).
    *
    * The vertex count N and nothing else is collected to the driver (one
    * cheap job, same budget class as connectedComponents' convergence
    * counts); the dangling mass stays in-plan as a broadcast 1-row
    * cross join. */
  def pageRank(vertices: DataFrame, edges: DataFrame,
               iters: Int = PageRankIters,
               dampingPct: Int = PageRankDampingPct,
               checkpointDir: Option[String] = None): DataFrame = {
    require(iters > 0, s"pageRank: iters=$iters")
    require(dampingPct > 0 && dampingPct < 100, s"pageRank: dampingPct=$dampingPct")
    IterUtil.ensureCheckpointDir(vertices.sparkSession, checkpointDir)
    def cut(df: DataFrame): DataFrame = IterUtil.cut(df, checkpointDir.isDefined)

    val bidir = cut(edges.select(col("src"), col("dst"))
      .union(edges.select(col("dst").as("src"), col("src").as("dst"))))
    val deg = cut(bidir.groupBy(col("src").as("vid"))
      .agg(count(lit(1)).as("deg")))
    val n = vertices.count()
    require(n > 0, "pageRank: empty vertex set")
    val unit = RankUnits / n
    val base = ((100L - dampingPct) * unit) / 100L

    var cp = cut(vertices.select(col("id"), lit(unit).as("rank")))
    var ranks = cp
    for (_ <- 1 to iters) {
      val rd = ranks.join(deg, ranks("id") === deg("vid"), "left")
        .select(col("id"), col("rank"), col("deg"))
      // dangling mass: one BIGINT scalar, broadcast back in-plan
      val dangling = rd.filter(col("deg").isNull)
        .agg(coalesce(sum(col("rank")), lit(0L)).as("ds"))
      val msgs = bidir
        .join(rd.filter(col("deg").isNotNull), bidir("src") === col("id"))
        .select(col("dst").as("mid"), expr("rank div deg").as("c"))
        .groupBy(col("mid")).agg(sum(col("c")).as("msg"))
      val step = cut(ranks.select(col("id"))
        .join(msgs, col("id") === col("mid"), "left")
        .crossJoin(broadcast(dangling))
        .withColumn("m", coalesce(col("msg"), lit(0L)))
        .select(col("id"), expr(
          s"$base + (($dampingPct * (ds div $n + m)) div 100)").as("rank")))
      IterUtil.free(cp)
      cp = step
      ranks = step
    }
    IterUtil.free(bidir)
    IterUtil.free(deg)
    // display image: rank units → fraction of total mass. Both factors
    // are < 2^53 so the long→double cast is exact and the single
    // division correctly rounded — identical in the SQL twin.
    ranks.select(col("id"),
      (col("rank").cast("double") / lit(RankUnits.toDouble)).as("rank"))
  }

  /** x39: PageRank over the x03 near-dup candidate graph — doc centrality
    * within dup neighborhoods; isolated docs settle at the dangling-fed
    * floor. Oracle: the same five iterations unrolled as chained SQL
    * CTEs over the same edge CTE as x14/x31. */
  def pageRankQuery(spark: SparkSession, dir: String): DataFrame = {
    val docs = Tables.load(spark, dir, "documents")
    val edges = Dedup.ngramCandidatePairs(docs)
      .select(col("d1").as("src"), col("d2").as("dst"))
    pageRank(docs.select(col("doc_id").as("id")), edges)
      .select(col("id").as("doc_id"), col("rank"))
      .orderBy(col("doc_id"))
  }
}
