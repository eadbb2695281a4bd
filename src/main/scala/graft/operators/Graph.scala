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

  /** HITS hubs & authorities (Kleinberg 1999) over a directed edge list
    * `(src, dst)`, `iters` synchronous rounds — the second classic link-rank
    * artifact next to [[pageRank]]: a page is a good HUB if it points at
    * good authorities, a good AUTHORITY if good hubs point at it. Crawl
    * pipelines use the hub side to prioritize directory/index pages for
    * link discovery and the authority side as a quality weight.
    *
    * Determinism contract (same as pageRank): all arithmetic is fixed-point
    * BIGINT. The textbook L2 normalization is float and order-dependent, so
    * each half-step instead rescales by the EXACT integer max:
    *
    *   a_0(v)    = scale
    *   h'_t(u)   = Σ_{u→v} a_t(v)          ;  h_t = h'_t div ceil(max(h'_t) / scale)
    *   a'_t+1(v) = Σ_{u→v} h_t(u)          ;  a_t+1 = a'_t+1 div ceil(max(a'_t+1) / scale)
    *
    * Max-rescaling by the EXACT integer divisor `ceil(max/scale)` (1 when
    * max ≤ scale) is monotone — the ranking survives every round — and
    * bounds values to [0, scale], so sums can never overflow: Σ
    * contributions ≤ indeg·scale ≤ 10^8·10^9 = 10^17 ≪ Long.MaxValue on a
    * 10^8-host graph, and no intermediate ever multiplies past that (the
    * naive `(v*scale) div max` WOULD overflow at v ~ 10^17). Every step is
    * integer div/sum, so the DuckDB unrolling is bit-identical.
    *
    * Scale shape: edges deduped + persisted once; each half-round is ONE
    * shuffle join (edges × scores on the gathering side, exchange reused
    * across rounds) + one partial-aggregated sum + an O(1) global max that
    * rides a broadcast crossJoin — no driver collect, no lineage growth
    * (`localCheckpoint` per round, the [[pageRank]] convention).
    */
  def hits(edges: DataFrame, iters: Int = 2, scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().persist()
    // v div ceil(mx / scale): overflow-free monotone rescale into [0, scale]
    def rescale(v: String, mx: String) =
      s"$v div (($mx + ${scale - 1}L) div ${scale}L)"
    var auth = nodes.withColumn("a", lit(scale)).localCheckpoint()
    var hub: DataFrame = null
    var i = 0
    while (i < iters) {
      val hRaw = e.join(auth, e("dst") === auth("node"))
        .select(e("src").as("node"), col("a").as("c"))
        .groupBy("node").agg(sum("c").as("hr"))
      val hAll = nodes.join(hRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("hr"), lit(0L)).as("hr"))
      val hMax = hAll.agg(greatest(max("hr"), lit(1L)).as("hmx"))
      hub = hAll.crossJoin(broadcast(hMax))
        .select(col("node"), expr(rescale("hr", "hmx")).as("h"))
        .localCheckpoint()
      val aRaw = e.join(hub, e("src") === hub("node"))
        .select(e("dst").as("node"), col("h").as("c"))
        .groupBy("node").agg(sum("c").as("ar"))
      val aAll = nodes.join(aRaw, Seq("node"), "left")
        .select(col("node"), coalesce(col("ar"), lit(0L)).as("ar"))
      val aMax = aAll.agg(greatest(max("ar"), lit(1L)).as("amx"))
      auth = aAll.crossJoin(broadcast(aMax))
        .select(col("node"), expr(rescale("ar", "amx")).as("a"))
        .localCheckpoint()
      i += 1
    }
    val out = hub.join(auth, "node")
      .select(col("node"), col("h").as("hub_fp"), col("a").as("auth_fp"))
    e.unpersist(); nodes.unpersist()
    out
  }

  /** TrustRank (Gyöngyi, Garcia-Molina & Pedersen, VLDB 2004) — biased
    * PageRank whose teleport mass lands ONLY on a hand-vetted trusted seed
    * set, so trust decays with link distance from the seeds and link-farm
    * hosts (high PageRank, no inbound path from any trusted host) surface
    * as high-rank/low-trust outliers. The standard web-spam demotion signal
    * a crawl pipeline runs next to [[pageRank]]: the two ranks differ only
    * in the teleport vector, and their gap is the "spam mass" estimate.
    *
    *   t0(v)    = scale            if v ∈ seeds, else 0
    *   t_i+1(v) = base(v) + (85 * Σ_{u→v} (t_i(u) div outdeg(u))) div 100
    *   base(v)  = scale*15/100     if v ∈ seeds, else 0
    *
    * Determinism contract (the [[pageRank]] convention): fixed-point BIGINT,
    * truncating `div`, exact long sums — identical on any partitioning and
    * bit-exact under a DuckDB unrolling. Total system mass is bounded by the
    * PageRank case (the teleport vector is a sub-distribution of uniform),
    * so the same 10^17 ≪ Long.MaxValue overflow headroom holds.
    *
    * Scale shape: identical to [[pageRank]] — edges deduped + out-degree
    * pre-joined + persisted once, one shuffle join + one partial-aggregated
    * sum per round, O(1) lineage via localCheckpoint. The seed set is a
    * broadcast left join computed ONCE into the base/start vectors (seed
    * lists are thousands of rows — never a shuffle side).
    */
  def trustRank(edges: DataFrame, seeds: DataFrame, iters: Int = 3,
                scale: Long = 1000000000L): DataFrame = {
    val e = edges.select(col("src"), col("dst")).distinct().persist()
    val deg = e.groupBy("src").agg(count(lit(1)).as("od"))
    val ed = e.join(deg, "src").persist() // (src, dst, od) — reused every round
    val nodes = e.select(col("src").as("node"))
      .unionAll(e.select(col("dst").as("node")))
      .distinct().persist()
    val sd = seeds.select(col("node")).distinct().withColumn("is_seed", lit(1))
    // seed indicator joined once; base + start vectors derive from it
    val nodeSeed = nodes.join(broadcast(sd), Seq("node"), "left")
      .select(col("node"), coalesce(col("is_seed"), lit(0)).as("is_seed"))
      .persist()
    val seedBase = scale * 15L / 100L
    var ranks = nodeSeed
      .select(col("node"), expr(s"CAST(is_seed AS BIGINT) * ${scale}L").as("r"))
      .localCheckpoint()
    var i = 0
    while (i < iters) {
      val contrib = ed.join(ranks, ed("src") === ranks("node"))
        .select(ed("dst").as("node"), expr("r div od").as("c"))
        .groupBy("node").agg(sum("c").as("c"))
      ranks = nodeSeed.join(contrib, Seq("node"), "left")
        .select(col("node"),
          expr(s"CAST(is_seed AS BIGINT) * ${seedBase}L + (85L * coalesce(c, 0L)) div 100L").as("r"))
        .localCheckpoint()
      i += 1
    }
    val out = ranks.select(col("node"), col("r").as("trust_fp"))
    e.unpersist(); ed.unpersist(); nodes.unpersist(); nodeSeed.unpersist()
    out
  }

  /** Community detection by synchronous label propagation (Raghavan et al.
    * 2007) over the UNDIRECTED host graph — the third classic link-graph
    * artifact next to [[pageRank]]/[[hits]] and the standard cheap detector
    * for host clusters / link farms (a spam ring's dense internal linking
    * collapses into one community label in a handful of rounds).
    *
    * Determinism contract (the reason this is the *synchronous* variant):
    * the textbook asynchronous LPA visits nodes in random order and
    * breaks ties randomly — unreproducible by design. Here every round
    * recomputes ALL labels from the previous round's snapshot and ties
    * break (count DESC, label ASC), so the result is identical on any
    * partitioning and a DuckDB unrolling of the rounds is bit-exact.
    * Isolated or tie-free nodes keep their previous label.
    *
    * Scale shape: edges canonicalize once (`least/greatest` + distinct —
    * reversed duplicates collapse, self-loops drop) and persist; each round
    * is two edge-keyed joins (the two directions of the undirected
    * neighbor stream), one partial-aggregated (node, label) count, and a
    * partial-aggregatable `min(struct(-count, label))` argmax — no windows,
    * no driver collect, O(1)-deep lineage via `localCheckpoint` (the
    * [[pageRank]] convention). A 10⁹-edge round is 2 joins + 2 aggs.
    */
  def labelPropagation(edges: DataFrame, iters: Int = 2): DataFrame = {
    val e = edges.selectExpr("least(src, dst) AS a", "greatest(src, dst) AS b")
      .where("a IS NOT NULL AND b IS NOT NULL AND a <> b")
      .distinct().persist()
    val nodes = e.select(col("a").as("node"))
      .unionAll(e.select(col("b").as("node")))
      .distinct().persist()
    var lab = nodes.withColumn("lab", col("node")).localCheckpoint()
    var i = 0
    while (i < iters) {
      val nbr = e.join(lab, e("b") === lab("node"))
        .select(e("a").as("node"), col("lab"))
        .unionAll(e.join(lab, e("a") === lab("node"))
          .select(e("b").as("node"), col("lab")))
      val best = nbr.groupBy("node", "lab").agg(count(lit(1)).as("c"))
        .groupBy("node")
        .agg(min(struct((lit(0L) - col("c")).as("nc"), col("lab"))).as("m"))
        .select(col("node"), col("m.lab").as("nl"))
      lab = lab.join(best, Seq("node"), "left")
        .select(col("node"), coalesce(col("nl"), col("lab")).as("lab"))
        .localCheckpoint()
      i += 1
    }
    val out = lab.select(col("node"), col("lab").as("community"))
    e.unpersist(); nodes.unpersist()
    out
  }

  /** NEPOTISM ratio per link target (Davison 2000, "Recognizing nepotistic
    * links on the Web"; the in-link concentration half of Bharat &
    * Henzinger's connectivity cleaning): for each host, what fraction of
    * its CROSS-host in-links comes from its single biggest source host.
    * A genuine authority accumulates links from many independents; a
    * link-farm beneficiary gets most of its mass from one ally — high
    * ratio + meaningful volume is the classic alliance-spam flag the rank
    * suite (PageRank/TrustRank) consumes as a demotion feature.
    *
    * Semantics: RAW link multiset (repeated links count — repetition IS
    * the signal), intra-host links dropped up front (trivially
    * nepotistic; Kleinberg's convention for connectivity analysis), NULL
    * hosts dropped. Output per target: total cross-host in-links, distinct
    * source hosts, the top source (ties → lexicographically smallest) and
    * its count, and the ratio in exact milli units.
    *
    * Scale shape: ONE (dst, src) partial-agged count shuffle, then ONE
    * dst-keyed agg whose per-source argmax is the partial-aggregatable
    * min(struct(−n, src)) — never a Window; a 10⁹-in-link hot host costs
    * its partition count.
    */
  def nepotism(edges: DataFrame): DataFrame = {
    val perSrc = edges
      .where("src IS NOT NULL AND dst IS NOT NULL AND src <> dst")
      .groupBy("dst", "src").agg(count(lit(1)).as("n"))
    perSrc.groupBy("dst")
      .agg(sum("n").as("in_links"),
        count(lit(1)).as("distinct_srcs"),
        min(struct((lit(0L) - col("n")).as("nn"), col("src"))).as("m"))
      .selectExpr("dst AS host",
        "CAST(in_links AS BIGINT) AS in_links",
        "CAST(distinct_srcs AS BIGINT) AS distinct_srcs",
        "m.src AS top_src",
        "CAST(0 - m.nn AS BIGINT) AS top_src_n",
        "CAST((0 - m.nn) * 1000 AS BIGINT) div CAST(in_links AS BIGINT) AS nepotism_milli")
  }
}
