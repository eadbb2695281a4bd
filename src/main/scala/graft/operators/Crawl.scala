package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Crawl-operations layer: snapshot diffing and fetch scheduling — the two
  * bookkeeping passes between "frontier" (Sitemap/Robots) and "ingest"
  * (Warc/ExtractJob) in a continuous-crawl pipeline.
  */
object Crawl {

  /** Re-crawl snapshot diff: classify every url across two crawl drops as
    * added / removed / changed / unchanged, comparing content by md5 so
    * the join shuffles 16-byte digests, never page text. ONE url-keyed
    * full-outer join; at 10^12 urls both sides partition on the same key,
    * and AQE handles drop-to-drop size skew. The output feeds re-crawl
    * prioritization (changed urls refresh first) and corpus deltas.
    */
  def crawlDiff(oldDocs: DataFrame, newDocs: DataFrame): DataFrame =
    oldDocs.selectExpr("url", "md5(text) AS old_md5")
      .join(newDocs.selectExpr("url", "md5(text) AS new_md5"), Seq("url"), "full_outer")
      .selectExpr("url",
        """CASE WHEN old_md5 IS NULL THEN 'added'
          |     WHEN new_md5 IS NULL THEN 'removed'
          |     WHEN old_md5 = new_md5 THEN 'unchanged'
          |     ELSE 'changed' END AS status""".stripMargin)

  /** Per-host politeness scheduling: assign each frontier url a fetch slot
    * and an absolute offset `fetch_at_s = slot * crawl_delay_s`, urls
    * ordered byte-wise within a host for determinism. Hosts without a
    * policy row take `defaultDelayS`. One host-keyed shuffle: the policy
    * join and the slot window share the same key, so the join reuses the
    * window's partitioning (policies are |hosts|-sized — NOT broadcast at
    * web scale; AQE may still broadcast small runs). A hot host (10⁶
    * frontier urls) is one sorted stream, never a materialized list.
    */
  def fetchSchedule(frontier: DataFrame, policies: DataFrame,
                    defaultDelayS: Long = 1L): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy("host").orderBy("url")
    frontier.join(policies, Seq("host"), "left")
      .withColumn("delay_s", coalesce(col("crawl_delay_s"), lit(defaultDelayS)))
      .withColumn("slot", row_number().over(w).cast("long") - 1L)
      .select(col("host"), col("url"), col("slot"),
        (col("slot") * col("delay_s")).as("fetch_at_s"))
  }

  /** Frontier expansion with a Bloom-filter seen-set split: from the
    * candidate-link stream, emit the urls NOT already in the corpus with
    * their in-degree (the crawl-priority signal). The seen set at crawl
    * scale is 10¹²-rows — too big to broadcast as a join side — but its
    * Bloom filter at 1% fpp is ~1.2 bytes/url, so the split goes:
    *
    *   1. dedupe candidates + count in-degree (one url-keyed shuffle with
    *      map-side partial aggregation);
    *   2. probe the broadcast Bloom filter (narrow): NEGATIVES are
    *      definitively unseen (no false negatives) and bypass the join
    *      entirely — at steady crawl state most candidates are seen and
    *      most emitted urls are bloom-negative fresh ones;
    *   3. only bloom-POSITIVES (seen urls + the fpp sliver) pay the exact
    *      left-anti join against the seen set, on the same url key the
    *      in-degree agg already partitioned by.
    *
    * The exact verify makes the output identical to a plain anti-join —
    * the bloom only moves rows off the shuffle, never changes the answer
    * (Spark's own runtime row-level bloom filters play the same trick).
    * The flagged aggregate is persisted (memory-and-disk) because both
    * union branches consume it — without it the candidate scan and
    * in-degree agg would run twice.
    */
  def frontier(candidates: DataFrame, seen: DataFrame,
               expectedSeen: Long = 1L << 20, fpp: Double = 0.01): DataFrame = {
    val spark = candidates.sparkSession
    import spark.implicits._
    val bloom = seen.stat.bloomFilter("url", expectedSeen, fpp)
    val b = spark.sparkContext.broadcast(bloom)
    val flagged = candidates.groupBy("url").agg(count(lit(1)).as("in_degree"))
      .as[(String, Long)]
      .mapPartitions { it =>
        val f = b.value
        it.map { case (u, d) => (u, d, f.mightContainString(u)) }
      }
      .toDF("url", "in_degree", "maybe_seen")
      .persist()
    val fresh = flagged.where(!col("maybe_seen")).drop("maybe_seen")
    val verified = flagged.where(col("maybe_seen")).drop("maybe_seen")
      .join(seen.select("url"), Seq("url"), "left_anti")
    fresh.unionAll(verified)
  }

  /** ADAPTIVE RECRAWL SCHEDULING (the Cho & Garcia-Molina change-rate
    * shape, integer-exact): estimate each url's change rate from its
    * capture history — `n_changes` = consecutive digest flips, observed
    * over `span` seconds — and schedule the next fetch one estimated
    * change-interval after the last capture, clamped to
    * [minIntervalS, maxIntervalS]: a page that changed every crawl is
    * revisited at the floor, a static page backs off to the ceiling. All
    * arithmetic is integer (DIV), so the schedule replays bit-exactly in
    * any engine. Shape: one url-keyed exchange shared by the lag window
    * and the aggregation (plan-guarded) — at 10^12 capture rows this is
    * the one shuffle a per-url schedule fundamentally needs.
    */
  def recrawlSchedule(captures: DataFrame, minIntervalS: Long, maxIntervalS: Long,
                      urlCol: String = "url", tsCol: String = "ts",
                      digestCol: String = "digest"): DataFrame = {
    require(minIntervalS > 0 && maxIntervalS >= minIntervalS,
      s"recrawlSchedule: need 0 < min <= max, got $minIntervalS/$maxIntervalS")
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(col(urlCol)).orderBy(col(tsCol))
    captures
      .withColumn("__pd", lag(col(digestCol), 1).over(w))
      .groupBy(col(urlCol).as("url"))
      .agg(
        count(lit(1)).as("n_captures"),
        sum(when(col("__pd").isNotNull && col(digestCol) =!= col("__pd"), 1L)
          .otherwise(0L)).as("n_changes"),
        (max(col(tsCol)) - min(col(tsCol))).as("__span"),
        max(col(tsCol)).as("__last"))
      .selectExpr("url", "n_captures", "n_changes",
        s"CAST(__last + least(greatest(__span DIV greatest(n_changes, 1), " +
          s"${minIntervalS}L), ${maxIntervalS}L) AS BIGINT) AS next_fetch")
  }

  /** EXACT WATER-FILLING crawl-budget allocation — the planning step
    * between host statistics and [[fetchSchedule]]: split a global fetch
    * budget B across hosts where host i wants `want = least(demand, cap)`
    * (pages discovered, politeness ceiling). Max-min fairness: find the
    * water level L such that every host gets `min(want, L)` and the budget
    * is exactly spent — small hosts are fully funded, mega-hosts are
    * leveled (the allocation every crawl planner converges to; a
    * proportional split would starve the long tail under one mega-host).
    *
    * All-integer and deterministic: hosts sort by (want, host), host at
    * rank j is FULLY funded iff pfx_j + want_j·(k−j) ≤ B (the funded set
    * is a prefix — the condition is monotone in j); the rest receive
    * L = (B − pfx_j*) div (k − j*) with the division remainder distributed
    * +1 to the first r unfunded ranks, so Σ alloc == min(Σ want, B)
    * EXACTLY and a DuckDB window replay is bit-identical.
    *
    * Scale shape (the [[TextOps.selectByTokenBudget]] discipline): the
    * global sorted prefix sum runs as range-repartition + per-partition
    * local sums + a broadcast offset array — never an unpartitioned
    * window; per-partition (count, sum) pairs and the funded-boundary
    * candidates are the only driver traffic (O(partitions) longs). One
    * fixed RDD lineage so every pass observes the identical partitioning.
    *
    * `budget < 0` selects the self-scaling contract form B = Σ want div 2.
    * Output: (host, want, rank, alloc).
    */
  def crawlBudget(hostStats: DataFrame, budget: Long = -1L, parts: Int = 0): DataFrame = {
    val spark = hostStats.sparkSession
    import spark.implicits._
    val n = if (parts > 0) parts else spark.sparkContext.defaultParallelism
    val rdd = hostStats
      .selectExpr("host", "CAST(least(demand, cap) AS BIGINT) AS want")
      .repartitionByRange(n, col("want"), col("host"))
      .sortWithinPartitions(col("want"), col("host"))
      .as[(String, Long)].rdd
    val nParts = rdd.getNumPartitions
    val totals = rdd.mapPartitionsWithIndex { (pid, it) =>
      var c = 0L; var s = 0L
      it.foreach { x => c += 1; s += x._2 }
      Iterator((pid, (c, s)))
    }.collect().toMap
    val cntOff = new Array[Long](nParts)
    val sumOff = new Array[Long](nParts)
    var ca = 0L; var sa = 0L; var p = 0
    while (p < nParts) {
      cntOff(p) = ca; sumOff(p) = sa
      val t = totals.getOrElse(p, (0L, 0L))
      ca += t._1; sa += t._2; p += 1
    }
    val k = ca
    val s = sa
    val b = if (budget >= 0L) budget else s / 2L
    val bc = spark.sparkContext.broadcast((cntOff, sumOff))
    val ranked = rdd.mapPartitionsWithIndex { (pid, it) =>
      var j = bc.value._1(pid); var pfx = bc.value._2(pid)
      it.map { case (h, w) => j += 1; pfx += w; (h, w, j, pfx) }
    }
    // funded boundary: max rank with pfx + want·(k − j) ≤ B (prefix
    // property) — one candidate per partition to the driver
    val cand = ranked.mapPartitions { it =>
      var best = (0L, 0L)
      it.foreach { case (_, w, j, pfx) =>
        if (pfx + w * (k - j) <= b && j > best._1) best = (j, pfx)
      }
      Iterator(best)
    }.collect()
    val (jstar, pfxstar) = if (cand.isEmpty) (0L, 0L) else cand.maxBy(_._1)
    val out = ranked.map { case (h, w, j, pfx) =>
      val alloc =
        if (s <= b || j <= jstar) w
        else {
          val l = (b - pfxstar) / (k - jstar)
          val r = (b - pfxstar) % (k - jstar)
          l + (if (j - jstar <= r) 1L else 0L)
        }
      (h, w, j, alloc)
    }
    spark.createDataFrame(out).toDF("host", "want", "rank", "alloc")
  }
}
