package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Link-graph analytics over the extracted edge list — the host/domain
  * ranking artifacts a web-scale crawl pipeline publishes alongside the
  * corpus (Common Crawl ships exactly this: host- and domain-level graph
  * ranks feeding crawl prioritization and quality weighting).
  *
  * Determinism contract: ranks are FIXED-POINT BIGINTs (`scale` units = rank
  * 1.0) and every step is integer arithmetic — `div` truncation and exact
  * long sums — so the result is identical on any partitioning, any executor
  * count, any run, and a DuckDB SQL unrolling of the same iterations is
  * bit-exact. Floating-point PageRank would be order-dependent in the sum
  * and could never pass a value-hash oracle.
  */
object Graph {

  /** PageRank with damping 0.85 over a directed edge list `(src, dst)`,
    * `iters` synchronous rounds from a uniform start:
    *
    *   r0(v)   = scale
    *   r_t+1(v) = scale*15/100 + (85 * Σ_{u→v} (r_t(u) div outdeg(u))) div 100
    *
    * The simplified (un-normalized, dangling mass evaporates) formulation —
    * the standard choice for host-rank artifacts where only the ordering and
    * relative mass matter.
    *
    * Scale shape (the 10^8-host graph this is written for):
    *  - edges are deduped and persisted ONCE; out-degree is pre-joined into
    *    the persisted edge relation, so each round is exactly one shuffle
    *    join (edges × ranks on src, both hash-partitioned on the same key —
    *    Spark reuses the edge side's exchange across rounds) plus one
    *    partial-aggregated sum keyed by dst. No per-round degree recompute.
    *  - ranks are `localCheckpoint`ed per round: lineage stays O(1) deep
    *    instead of O(iters), the same Pregel-style convention as
    *    [[Dedup.connectedComponents]].
    *  - contributions sum as longs: with ranks ≤ ~n·scale total mass, a
    *    10^8-node graph at scale 10^9 peaks at 10^17 ≪ Long.MaxValue.
    *  - dangling nodes (dst-only) still surface in the output via the
    *    left join against the node set, at the floor rank.
    */
  def pageRank(edges: DataFrame, iters: Int = 3, scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val ed = e.join(deg, "src").persist() // (src, dst, od) — reused every round
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().persist()
    val base = scale * 15L / 100L
    var ranks = nodes.withColumn("r", lit(scale)).localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      ranks = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"), expr(s"${base}L + (85L * coalesce(c, 0L)) div 100L").as("r"))
        .localCheckpoint()
      i += 1
    }
    e.unpersist(); ed.unpersist(); nodes.unpersist()
    ranks
  }
}
