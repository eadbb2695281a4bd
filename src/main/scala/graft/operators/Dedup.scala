package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.expressions.Window

/** Document-deduplication operators for the training-data pipeline tier:
  * exact (hash groupBy), MinHash+LSH, SimHash, n-gram Jaccard. All are pure
  * Dataset/DataFrame plans — every aggregation is partial-aggregatable
  * (map-side combine), every join keyed, no driver-side loops — so the same
  * plan runs at 10^12-doc scale with only partition-count changes.
  *
  * Near-dup operators plant deterministic mutated copies (doc_id + 1,000,000,
  * last words dropped) so small scale factors still exercise the
  * candidate-generation → verification path end-to-end.
  */
object Dedup {

  /** Stable 64-bit hash for shingles/words: splitmix64 over
    * MurmurHash3.stringHash (both fully deterministic across JVMs).
    */
  def hash64(s: String): Long = {
    var z = scala.util.hashing.MurmurHash3.stringHash(s).toLong + 0x9e3779b97f4a7c15L
    z = (z ^ (z >>> 30)) * 0xbf58476d1ce4e5b9L
    z = (z ^ (z >>> 27)) * 0x94d049bb133111ebL
    z ^ (z >>> 31)
  }

  /** docs + planted near-duplicates (deterministic). */
  def withPlantedDups(docs: DataFrame, every: Int = 10, dropWords: Int = 2): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val mutated = docs.select($"doc_id", $"text").where($"doc_id" % every === 0)
      .as[(Long, String)]
      .map { case (id, text) =>
        val ws = text.split(' ')
        (id + 1000000L, ws.take(math.max(ws.length - dropWords, 1)).mkString(" "))
      }
      .toDF("doc_id", "text")
    docs.select($"doc_id", $"text").unionAll(mutated)
  }

  /** Exact dedup: group identical texts by md5, keep the smallest doc_id.
    * One shuffle on the 16-byte digest (never the full text); at 100 TB the
    * md5 projection prunes the scan to (doc_id, text) and the aggregate is
    * partially computed map-side.
    */
  def exact(docsWithDups: DataFrame): DataFrame =
    docsWithDups
      .groupBy(md5(col("text")).as("text_md5"))
      .agg(min("doc_id").as("keeper_id"), count(lit(1)).as("n_copies"))

  /** Passage-level exact dedup (the C4/RefinedWeb-style operator): split
    * each doc into fixed-`words`-word chunks, hash each chunk, keep the
    * duplicated ones with their keeper doc. Removing repeated boilerplate
    * passages ACROSS documents is the highest-yield text-dedup op on crawl
    * data after url/doc-level dedup.
    *
    * Scale shape: one narrow chunk projection (codegen'd — sequence/
    * transform/posexplode, no UDF), then ONE shuffle on the 16-byte chunk
    * digest with map-side partial aggregation — the full chunk text never
    * shuffles. Docs with `doc_id % 13 == 0` get a planted twin
    * (+2,000,000) so small SFs exercise the duplicate path.
    */
  def paragraphDedup(docs: DataFrame, words: Int = 20): DataFrame = {
    val planted = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.where(col("doc_id") % 13 === 0)
        .select((col("doc_id") + 2000000L).as("doc_id"), col("text")))
    planted
      .selectExpr("doc_id",
        s"""explode(transform(sequence(0, (size(split(text, ' ')) - 1) div $words),
           |  i -> md5(array_join(slice(split(text, ' '), i * $words + 1, $words), ' ')))) AS chunk_md5""".stripMargin)
      .groupBy("chunk_md5")
      .agg(min("doc_id").as("keeper_doc"), count(lit(1)).as("n_copies"))
      .where(col("n_copies") > 1)
      .orderBy("chunk_md5")
  }

  /** Benchmark decontamination (the GPT-3/PaLM-style n-gram overlap
    * filter): flag every training document that shares at least one
    * `n`-word n-gram with the held-out eval set. Docs with
    * `doc_id % evalMod == 0` stand in for the benchmark table; docs with
    * `doc_id % (2*evalMod) == 0` get a planted training-side copy
    * (+3,000,001) so small SFs always exercise the contamination path.
    * Output: (doc_id, n_hits) — distinct contaminated n-grams per flagged
    * training doc.
    *
    * Scale shape: n-grams are a codegen'd sequence/transform projection (no
    * UDF) collapsed to (doc_id, 8-byte xxhash64) — gram strings never
    * shuffle. The eval side is tiny relative to the corpus (a benchmark
    * suite is ~10^6 grams even against 100 TB of training text) and is
    * BROADCAST; the training side's raw gram stream flows straight into the
    * broadcast join (which discards the overwhelmingly-clean majority)
    * BEFORE any aggregation, so the only train-side shuffle is the
    * countDistinct over the few surviving hits — never a full-corpus
    * distinct. The DuckDB oracle joins its own md5'd gram strings; per-doc
    * hit counts agree unless a 64-bit gram-hash collision occurs (the
    * established minhash-oracle convention; vanishing at test SFs).
    */
  def decontaminate(docs: DataFrame, n: Int = 8, evalMod: Long = 50): DataFrame = {
    val withPlanted = docs.select(col("doc_id"), col("text"))
      .unionAll(docs.where(col("doc_id") % (2 * evalMod) === 0)
        .select((col("doc_id") + 3000001L).as("doc_id"), col("text")))
    // the doc_id filters push below the Generate: the eval branch only ever
    // explodes the 1/evalMod eval slice
    contaminationHits(
      withPlanted.where(col("doc_id") % evalMod =!= 0),
      withPlanted.where(col("doc_id") % evalMod === 0).select("text"), n)
      .orderBy("doc_id")
  }

  /** Core of `decontaminate` for composition (e.g. CurateMain): flag docs
    * in `train` (doc_id, text) sharing an `n`-word n-gram with any row of
    * `evalTexts` (text) — the eval table is external in production; the
    * contract query derives it from a corpus slice.
    */
  def contaminationHits(train: DataFrame, evalTexts: DataFrame, n: Int = 8): DataFrame = {
    val evalGrams = gramHashes(
      evalTexts.selectExpr("CAST(0 AS BIGINT) AS doc_id", "text"), n)
      .select("gh").distinct()
    gramHashes(train.select(col("doc_id"), col("text")), n)
      .join(broadcast(evalGrams), "gh")
      .groupBy("doc_id")
      .agg(countDistinct("gh").as("n_hits"))
  }

  /** (doc_id, n-gram hash): per-word hash64 once, then an O(1) wrapping
    * polynomial roll per gram — no gram string or slice array is ever
    * materialized (the SQL transform/slice formulation allocated an
    * n-element array per gram; this typed pass is pure arithmetic).
    * Distinct-preserving modulo 64-bit collisions (oracle convention).
    */
  private val gramBase = 0x100000001b3L // FNV prime; odd → invertible mod 2^64

  /** Rolling n-gram hashes with positions over a pre-split word array:
    * per-word hash64 once, then an O(1) wrapping polynomial roll per gram —
    * no gram string or slice array is ever materialized. `tp` = B^(n-1).
    */
  private def rollIter(ws: Array[String], n: Int, tp: Long): Iterator[(Int, Long)] = {
    val m = ws.length
    val H = new Array[Long](m)
    var i = 0
    while (i < m) { H(i) = hash64(ws(i)); i += 1 }
    var h0 = 0L
    i = 0
    while (i < n) { h0 = h0 * gramBase + H(i); i += 1 }
    val hInit = h0
    new Iterator[(Int, Long)] {
      private var w = 0 // gram start
      private var h = hInit
      def hasNext: Boolean = w <= m - n
      def next(): (Int, Long) = {
        val out = (w, h)
        if (w < m - n) h = (h - H(w) * tp) * gramBase + H(w + n)
        w += 1
        out
      }
    }
  }

  private def topPow(n: Int): Long = {
    var p = 1L
    var k = 1
    while (k < n) { p *= gramBase; k += 1 }
    p
  }

  /** (doc_id, n-gram hash). Docs shorter than n words hash whole (the
    * decontamination contract: a short doc can still match an eval row).
    * Distinct-preserving modulo 64-bit collisions (oracle convention).
    */
  private def gramHashes(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tp = topPow(n)
    df.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(' ')
        if (ws.length < n) Iterator.single((id, hash64(text)))
        else rollIter(ws, n, tp).map { case (_, h) => (id, h) }
      }
      .toDF("doc_id", "gh")
  }

  /** (doc_id, pos, n-gram hash); docs shorter than n words emit nothing
    * (substring dedup leaves them to exact dedup).
    */
  private def gramHashesPos(df: DataFrame, n: Int): DataFrame = {
    val spark = df.sparkSession
    import spark.implicits._
    val tp = topPow(n)
    df.select(col("doc_id"), col("text")).as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(' ')
        if (ws.length < n) Iterator.empty
        else rollIter(ws, n, tp).map { case (p, h) => (id, p, h) }
      }
      .toDF("doc_id", "pos", "gh")
  }

  /** Exact substring-range dedup (the Lee et al. 2022 "Deduplicating
    * Training Data Makes Language Models Better" shape, word-granular):
    * every maximal word range covered by n-word grams occurring MORE THAN
    * ONCE anywhere in the corpus — cross-document or repeated within one
    * document. Output (doc_id, range_idx, start_word, end_word) — end
    * exclusive — is what a curation pass cuts (or flags) per doc.
    *
    * Scale shape: the gram stream is shuffled ONCE, keyed by the 8-byte
    * gram hash; the duplication test is a windowed count, which sorts and
    * SPILLS per key group instead of materializing a hot gram's occurrence
    * list (template boilerplate repeats one gram 10^6+ times at crawl
    * scale). Survivors — the rare duplicated positions — then shuffle once
    * more, keyed by doc_id, where the island merge sorts positions in-task
    * (bounded by one doc's word count, the same per-row bound as the
    * extraction kernel itself).
    */
  def substringRanges(docsDf: DataFrame, n: Int = 8): DataFrame = {
    val spark = docsDf.sparkSession
    import spark.implicits._
    val dupPos = gramHashesPos(docsDf.select(col("doc_id"), col("text")), n)
      .withColumn("cnt", count(lit(1)).over(Window.partitionBy("gh")))
      .where(col("cnt") > 1)
      .select(col("doc_id"), col("pos"))
    dupPos.groupBy("doc_id").agg(sort_array(collect_list("pos")).as("ps"))
      .as[(Long, Seq[Int])]
      .flatMap { case (id, ps) =>
        val out = Vector.newBuilder[(Long, Int, Int, Int)]
        var idx = 0
        var s = ps.head
        var e = ps.head + n
        val it = ps.iterator.drop(1)
        while (it.hasNext) {
          val p = it.next()
          if (p <= e) e = p + n // overlapping or adjacent gram: extend
          else { out += ((id, idx, s, e)); idx += 1; s = p; e = p + n }
        }
        out += ((id, idx, s, e))
        out.result()
      }
      .toDF("doc_id", "range_idx", "start_word", "end_word")
  }

  /** Connected components over a near-dup pair set (id_a, id_b) — the
    * cluster step every production dedup needs: pairwise keeper logic
    * mishandles chains (A~B, B~C ⇒ one cluster {A,B,C}, one keeper).
    * Iterative min-label propagation: each round joins labels across
    * edges and takes the per-node min, until a fixpoint (≤ diameter
    * rounds; near-dup clusters are shallow). Output: (doc_id, cluster_id)
    * with cluster_id = min doc_id of the component.
    *
    * Scale shape: each round is one keyed join + one partial-agged min —
    * the Pregel/GraphX CC plan without the GraphX dependency.
    * `localCheckpoint` truncates lineage so plans stay O(1) per round.
    */
  def connectedComponents(pairs: DataFrame, maxIter: Int = 20): DataFrame = {
    val edges = pairs.select(col("id_a").as("src"), col("id_b").as("dst"))
      .unionAll(pairs.select(col("id_b").as("src"), col("id_a").as("dst")))
      .persist()
    // seed comp = min(node, min neighbor) — one groupBy (the same shuffle
    // the old distinct() paid) buys the first propagation round: pair
    // clusters (the dominant near-dup shape) converge with a single
    // no-change round instead of two join rounds
    var labels = edges.groupBy("src").agg(min("dst").as("nmin"))
      .select(col("src").as("node"), least(col("src"), col("nmin")).as("comp"))
      .localCheckpoint()
    var changed = 1L
    var iter = 0
    while (changed > 0 && iter < maxIter) {
      val next = edges.join(labels, edges("src") === labels("node"))
        .select(col("dst").as("node"), col("comp"))
        .unionAll(labels)
        .groupBy("node").agg(min("comp").as("comp"))
        .localCheckpoint()
      changed = next.join(labels.withColumnRenamed("comp", "old"), "node")
        .where(col("comp") =!= col("old")).count()
      labels = next
      iter += 1
    }
    edges.unpersist()
    labels.select(col("node").as("doc_id"), col("comp").as("cluster_id"))
      .orderBy("doc_id")
  }

  /** Quality-ranked cluster KEEPERS — what production near-dup dedup
    * actually does with [[connectedComponents]]' labels: keep the BEST
    * member of each cluster (highest quality score; RefinedWeb/FineWeb
    * keep longest-or-cleanest), not the smallest id. Ties break to the
    * smaller doc_id, so the choice is deterministic and the DuckDB window
    * replay is bit-exact.
    *
    * Scale shape: the argmax is a partial-aggregatable
    * `min(struct(-quality, doc_id))` — one cluster-keyed aggregation whose
    * map side collapses each partition to one candidate per cluster
    * (never a window sort over the cluster's members), then one keyed
    * join back. A 10⁶-member template cluster costs its partition count,
    * not its row count, on the exchange.
    */
  def keepBest(labels: DataFrame, quality: DataFrame): DataFrame = {
    // LAZY localCheckpoint: both the argmax aggregation and the final
    // join consume lq, and `labels` is typically connectedComponents'
    // output — an expensive lineage that must not evaluate twice. Lazy
    // (materialize-on-first-action) keeps plan construction free for
    // callers that only inspect the plan.
    val lq = labels.join(quality, "doc_id").localCheckpoint(eager = false)
    val best = lq.groupBy("cluster_id")
      .agg(min(struct((lit(0L) - col("quality")).as("nq"), col("doc_id").as("id"))).as("m"))
      .select(col("cluster_id"), col("m.id").as("keeper_id"))
    lq.join(best, "cluster_id")
      .selectExpr("doc_id", "cluster_id", "CAST(quality AS BIGINT) AS quality", "keeper_id",
        "CAST(CASE WHEN doc_id = keeper_id THEN 1 ELSE 0 END AS INTEGER) AS keep")
  }

  /** (doc_id, shingle-hash) pairs: w-word shingles, distinct per doc. */
  def shingles(docs: DataFrame, w: Int = 3): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    docs.select($"doc_id", $"text").as[(Long, String)]
      .flatMap { case (id, text) =>
        val ws = text.split(' ')
        if (ws.length < w) Iterator((id, hash64(text)))
        else ws.sliding(w).map(g => (id, hash64(g.mkString(" "))))
      }
      .toDF("doc_id", "sh")
      .distinct()
  }

  /** MinHash signatures: k hash "permutations" h_i(x) = xxhash64(i, x) over
    * the shingle hashes, computed as k partial-aggregatable `min` columns in
    * ONE groupBy — a single shuffle keyed by doc_id regardless of k.
    * xxhash64 with the index as a leading column is a native codegen'd
    * expression with no 64-bit overflow, so the plan is ANSI-mode-safe
    * (the previous (a·x+b) mod p family relied on wrapping multiplication
    * and threw under spark.sql.ansi.enabled=true, Spark 4's default).
    */
  def minhashSignatures(sh: DataFrame, k: Int = 32): DataFrame = {
    val aggs = (0 until k).map(i => min(xxhash64(lit(i), col("sh"))).as(s"m$i"))
    sh.groupBy("doc_id").agg(aggs.head, aggs.tail: _*)
  }

  /** LSH banding: r rows per band; band key = hash of the band's signature
    * slice. Returns (doc_id, band, key) — candidate pairs share (band, key).
    *
    * r = 2 (16 bands over k = 32): P(candidate) = 1-(1-J²)^16 — ≥ 0.999 for
    * any pair at the 0.6 verify threshold and ~1-3·10⁻⁷ at the J ≈ 0.78
    * level of the corpus's weakest true pair. The measured sf0.01 margins
    * (organic co-shingle pairs: 3 in [0.77, 0.89), 78 at ≥ 0.9, none in
    * [0.6, 0.77)) made r = 4's ~2.6% per-round miss probability at J = 0.78
    * the dominant correctness risk; r = 2 trades a broader candidate set
    * (S-curve midpoint (1/16)^(1/2) = 0.25) for near-certain recall — the
    * exact-Jaccard verify step keeps precision exact either way, and the
    * bucket cap still bounds degenerate keys.
    */
  def lshBands(sig: DataFrame, k: Int = 32, r: Int = 2): DataFrame = {
    val bands = (0 until k / r).map { b =>
      struct(lit(b).as("band"),
        xxhash64((b * r until (b + 1) * r).map(i => col(s"m$i")): _*).as("key"))
    }
    sig.select(col("doc_id"), explode(array(bands: _*)).as("bk"))
      .select(col("doc_id"), col("bk.band"), col("bk.key"))
  }

  /** Candidate pairs from LSH buckets. Buckets larger than `maxBucket` are
    * dropped (logged via the cap column upstream at real scale) — the
    * standard guard against a degenerate bucket producing O(n²) pairs.
    */
  def candidatePairs(bands: DataFrame, maxBucket: Int = 64): DataFrame = {
    val spark = bands.sparkSession
    import spark.implicits._
    bands.groupBy("band", "key").agg(collect_set("doc_id").as("ids"))
      .where(size($"ids") > 1 && size($"ids") <= maxBucket)
      .select(explode(expr(
        "filter(flatten(transform(ids, a -> transform(ids, b -> struct(a as id_a, b as id_b)))), p -> p.id_a < p.id_b)"
      )).as("p"))
      .select($"p.id_a", $"p.id_b")
      .distinct()
  }

  /** Exact Jaccard verification of candidate pairs against the shingle sets:
    * two keyed joins + one aggregate, all shuffle-partitioned on doc_id —
    * never recomputes shingles per pair.
    */
  def verifyJaccard(pairs: DataFrame, sh: DataFrame): DataFrame = {
    val spark = pairs.sparkSession
    import spark.implicits._
    val counts = sh.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(sh.toDF("id_a", "sh"), "id_a")
      .join(sh.toDF("id_b", "sh"), Seq("id_b", "sh"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
      .join(counts.toDF("id_a", "n_a"), "id_a")
      .join(counts.toDF("id_b", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("uni"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
  }

  /** Full MinHash+LSH near-dup pipeline over (doc_id, text).
    *
    * `sh` is deliberately NOT cached: the shingle set is ~10× the corpus
    * text, so at 100 TB caching it is a cluster-killer — recomputing the
    * stateless flatMap+distinct for the verify branch is the scale-correct
    * trade (at petabyte scale you'd checkpoint it to a temp table instead;
    * both beat executor-memory caching).
    */
  /** Production near-dup entry (no planted twins, used by the curation
    * pipeline): verified pairs with shingle-Jaccard ≥ `threshold`.
    */
  def nearDupPairs(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val sh = shingles(docs)
    verifyJaccard(candidatePairs(lshBands(minhashSignatures(sh))), sh)
      .where(col("jaccard") >= threshold)
      .select("id_a", "id_b")
  }

  /** Meta-blocking entity resolution (the SparkER / Simonini et al. EDBT
    * 2019 shape, on the retrieved-paper list): candidate pairs come from
    * shared BLOCKS (here: md5 digests of w-word shingles, distinct per
    * doc), blocks are PURGED by document frequency before any pair exists
    * (df < 2 can't pair; df > maxBlock is stopword chrome whose self-join
    * would be O(df²) — the purge IS the degenerate-bucket cap), and the
    * meta-blocking weight prunes pairs by common-block count
    * (CBS ≥ minCommon) so one coincidental shared shingle never reaches a
    * comparison. Because the block sets are the comparison features, CBS
    * IS the exact set intersection — the emitted (inter, uni) pair is the
    * exact Jaccard numerator/denominator over the purged block sets, all
    * integer and DuckDB-replayable.
    *
    * Scale shape: one doc-keyed shingle projection (codegen'd, distinct),
    * one block-keyed df agg (partial-agged) riding into the purge join,
    * pair generation keyed by block id at ≤ maxBlock populations, ONE
    * pair-keyed partial-agged CBS count, and two doc-keyed size joins on
    * the surviving pairs only. Planted near-dups (withPlantedDups) keep
    * the pair path exercised at every sf.
    */
  def metaBlockingPairs(docs: DataFrame, w: Int = 3, minCommon: Int = 2,
      maxBlock: Int = 64): DataFrame = {
    val planted = withPlantedDups(docs)
    val blocks = planted.selectExpr("doc_id", "split(text, ' ') AS ws")
      .selectExpr("doc_id",
        s"""explode(CASE WHEN size(ws) < $w THEN array(md5(array_join(ws, ' ')))
           |  ELSE transform(sequence(1, size(ws) - ${w - 1}),
           |                 i -> md5(array_join(slice(ws, i, $w), ' '))) END) AS bk""".stripMargin)
      .distinct()
    val keepBk = blocks.groupBy("bk").agg(count(lit(1)).as("bdf"))
      .where(col("bdf") >= 2 && col("bdf") <= maxBlock)
      .select("bk")
    val kept = blocks.join(keepBk, "bk")
    val pairs = kept.toDF("bk", "id_a").join(kept.toDF("bk", "id_b"), "bk")
      .where(col("id_a") < col("id_b"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("cbs"))
      .where(col("cbs") >= minCommon)
    val sizes = kept.groupBy("doc_id").agg(count(lit(1)).as("n"))
    pairs
      .join(sizes.toDF("id_a", "n_a"), "id_a")
      .join(sizes.toDF("id_b", "n_b"), "id_b")
      .selectExpr("id_a", "id_b", "CAST(cbs AS BIGINT) AS inter",
        "CAST(n_a + n_b - cbs AS BIGINT) AS uni")
      .orderBy("id_a", "id_b")
  }

  def minhashLsh(docs: DataFrame, threshold: Double = 0.6): DataFrame = {
    val withDups = withPlantedDups(docs)
    val sh = shingles(withDups)
    val pairs = candidatePairs(lshBands(minhashSignatures(sh)))
    verifyJaccard(pairs, sh)
      .where(col("jaccard") >= threshold)
      .orderBy("id_a", "id_b")
  }

  /** 60-bit word hash = first 15 hex digits of md5(word). md5 exists in
    * both Spark and DuckDB, and 60 bits never overflows a BIGINT in either
    * engine — the hash the simhash oracle can recompute exactly.
    */
  def md5Hash60(md: java.security.MessageDigest, w: String): Long = {
    md.reset()
    val d = md.digest(w.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    var h = 0L
    var j = 0
    while (j < 15) {
      val nib = if ((j & 1) == 0) (d(j >> 1) >> 4) & 0xf else d(j >> 1) & 0xf
      h = (h << 4) | nib
      j += 1
    }
    h
  }

  /** SimHash: 60-bit signature = sign of per-bit weighted sums of md5-derived
    * word hashes; near-dups = pairs within `maxHamming`, blocked on 4×15-bit
    * sub-keys. With ≤ 3 flipped bits at least one of the 4 blocks is
    * untouched (pigeonhole), so blocking is EXACT for maxHamming ≤ 3 — the
    * DuckDB oracle enumerates all pairs and must match bit-for-bit.
    * Buckets larger than `maxBucket` are dropped before the self-join (the
    * degenerate-bucket O(n²) guard; a 15-bit key space with uniform hashes
    * keeps real buckets ~n/32768, so the cap only fires on adversarial
    * inputs like mass-identical signatures).
    */
  def simhash(docs: DataFrame, maxHamming: Int = 3, maxBucket: Int = 1024): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val sigs = withPlantedDups(docs).select($"doc_id", $"text").as[(Long, String)]
      .mapPartitions { it =>
        val md = java.security.MessageDigest.getInstance("MD5")
        val acc = new Array[Int](60)
        it.map { case (id, text) =>
          java.util.Arrays.fill(acc, 0)
          text.split(' ').foreach { w =>
            val h = md5Hash60(md, w)
            var i = 0
            while (i < 60) { if (((h >>> i) & 1L) == 1L) acc(i) += 1 else acc(i) -= 1; i += 1 }
          }
          var sig = 0L
          var i = 0
          while (i < 60) { if (acc(i) > 0) sig |= (1L << i); i += 1 }
          (id, sig)
        }
      }.toDF("doc_id", "sig")
    val blocked = sigs.select(col("doc_id"), col("sig"),
      explode(array((0 until 4).map(b =>
        struct(lit(b).as("blk"), shiftright(col("sig"), b * 15).bitwiseAND(lit(0x7fffL)).as("key"))): _*)).as("bk"))
      .select(col("doc_id"), col("sig"), col("bk.blk"), col("bk.key"))
    val small = blocked.groupBy("blk", "key").agg(count(lit(1)).as("bn"))
      .where(col("bn") <= maxBucket)
      .select("blk", "key")
    val capped = blocked.join(small, Seq("blk", "key"))
    capped.toDF("blk", "key", "id_a", "sig_a")
      .join(capped.toDF("blk", "key", "id_b", "sig_b"), Seq("blk", "key"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        expr("CAST(bit_count(sig_a ^ sig_b) AS BIGINT)").as("hamming"))
      .distinct()
      .where(col("hamming") <= maxHamming)
      .orderBy("id_a", "id_b")
  }

  /** Word-set Jaccard between consecutive doc_ids — the SQL-expressible
    * n-gram-Jaccard variant whose oracle runs verbatim in DuckDB (outputs are
    * ints plus one single-division double, so hashes are bit-stable).
    */
  def adjacentJaccard(docs: DataFrame): DataFrame = {
    val spark = docs.sparkSession
    import spark.implicits._
    val words = docs.select($"doc_id", explode(split($"text", " ")).as("w")).distinct()
    val counts = words.groupBy("doc_id").agg(count(lit(1)).as("nw"))
    val inter = words.toDF("id_a", "w")
      .join(words.toDF("id_b", "w").withColumn("id_a", col("id_b") - 1), Seq("id_a", "w"))
      .groupBy("id_a", "id_b").agg(count(lit(1)).as("inter"))
    inter
      .join(counts.toDF("id_a", "n_a"), "id_a")
      .join(counts.toDF("id_b", "n_b"), "id_b")
      .select(col("id_a"), col("id_b"), col("inter"),
        (col("n_a") + col("n_b") - col("inter")).as("uni"),
        (col("inter").cast("double") / (col("n_a") + col("n_b") - col("inter"))).as("jaccard"))
  }

  /** Per-doc duplicated-text fraction (Lee et al. 2022's corpus-health
    * metric): the share of a doc's words covered by substring-dedup ranges
    * (8-word grams occurring >1 time anywhere). Rides `substringRanges`'
    * single gram-hash shuffle, adds one doc-keyed partial agg + a left
    * join back so clean docs report 0.0 — the number a curation report
    * tracks drop-over-drop.
    */
  def dupFraction(docsDf: DataFrame, n: Int = 8): DataFrame = {
    val dupWords = substringRanges(docsDf, n)
      .groupBy("doc_id")
      .agg(sum(col("end_word") - col("start_word")).as("dw"))
    docsDf.selectExpr("doc_id", s"${TextOps.tokensExpr} AS n_words")
      .join(dupWords, Seq("doc_id"), "left")
      .selectExpr("doc_id", "n_words",
        "CAST(coalesce(dw, 0) AS BIGINT) AS dup_words",
        "CAST(coalesce(dw, 0) AS DOUBLE) / n_words AS dup_frac")
  }

  /** Canonical-URL dedup (the crawl-side duplicate-cluster pass): pages
    * declaring `<link rel=canonical>` group on the declared target, so
    * mirrors, recrawls and tracking-param variants of one page collapse
    * WITHOUT comparing content at all — the cheapest dedup signal in the
    * stack, applied before any text hashing. Pages without a declaration
    * are their own cluster. ONE url-keyed shuffle with map-side partial
    * aggregation; keeper = byte-wise min url for determinism.
    */
  def canonicalDedup(pages: DataFrame): DataFrame =
    pages.selectExpr("CASE WHEN canonical <> '' THEN canonical ELSE url END AS canon", "url")
      .groupBy("canon")
      .agg(min("url").as("keeper_url"), count(lit(1)).as("n_aliases"))

  /** Re-crawl version dedup (the CDX "latest capture per url" pass every
    * multi-drop crawl corpus needs): each url keeps only its newest capture,
    * ties broken by highest version id for determinism; `n_versions` reports
    * the capture count dropped behind it. One url-keyed shuffle — row_number
    * and the count share the same window partition, so picking the keeper
    * costs nothing beyond the shuffle a per-url reduce needs anyway. Hot
    * urls (a homepage captured every drop) are single window keys: sorted
    * streams, never materialized lists.
    */
  def latestVersion(pages: DataFrame, urlCol: String = "url",
                    tsCol: String = "ts", idCol: String = "version_id"): DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val w = Window.partitionBy(urlCol).orderBy(col(tsCol).desc, col(idCol).desc)
    val wAll = Window.partitionBy(urlCol)
    pages.withColumn("rn", row_number().over(w))
      .withColumn("n_versions", count(lit(1)).over(wAll))
      .where(col("rn") === 1).drop("rn")
  }
}
