package graft.spark

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.TextOps

/** Incremental curation loop over the snapshot catalog — the composition
  * turning the round-4 primitives into the production daily job:
  *
  *   raw crawl drops → RAW catalog table (append / exactly-once stream sink)
  *   runOnce:
  *     1. window = rows added in (watermark, CURRENT] via readIncremental —
  *        O(drop) data read, O(delta) metadata planning, never O(table);
  *     2. stateless quality gates over the window only (token floor, Gopher
  *        rules, top-word repetition floor — all integer-exact, so the
  *        whole pipeline stays DuckDB-oracle-replayable);
  *     3. survivors append to the CURATED table deduped against ALL HISTORY
  *        through the 16-byte digest companion (IncrementalIngest) — a
  *        re-crawled or replayed text can never land twice;
  *     4. the watermark advances, committed AFTER the data: a crash between
  *        3 and 4 replays the window and the companion anti-join makes the
  *        replay a no-op — at-least-once processing + idempotent sink =
  *        exactly-once curation, the same composition argument as
  *        appendBatch.
  *
  * Compacting the RAW table invalidates open windows BY DESIGN
  * (readIncremental refuses rewrite-crossing windows rather than re-
  * emitting the whole table as new): compact raw only when consumers are
  * caught up, or reset their watermarks.
  */
object IncrementalCurate {

  val watermarkKey = "curate.watermark"

  /** One incremental run: curate everything the raw table gained since the
    * last run. Returns (windowRows, appendedRows).
    */
  def runOnce(spark: SparkSession, cat: ParquetSnapshotCatalog,
              raw: String, curated: String, minTokens: Int = 20): (Long, Long) = {
    val from = cat.getMeta(curated, watermarkKey).map(_.trim.toLong).getOrElse(0L)
    val to = cat.currentSnapshot(raw).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $raw"))
    if (to == from) return (0L, 0L)
    // a compaction/expiry of the raw table inside the window makes the
    // changelog refuse (it cannot tell rewritten rows from new ones) — for
    // CURATION that is recoverable: reprocess the full snapshot; the gates
    // are deterministic and the digest companion rejects everything already
    // curated, so the result stays exact at the cost of one full pass
    val window = (try cat.readIncremental(spark, raw, from, to)
      catch {
        case e: IllegalStateException if e.getMessage.contains("crosses a rewrite") =>
          System.err.println(s"[curate] raw table '$raw' was rewritten inside " +
            s"($from, $to] — reprocessing the full snapshot; the digest " +
            "companion keeps the append exact")
          cat.readSnapshot(spark, raw, to)
      })
      .select("doc_id", "text").persist()
    val n = window.count()
    val floor = window
      .selectExpr("doc_id", "text", s"${TextOps.tokensExpr} AS n_tokens")
      .where(s"n_tokens >= $minTokens")
    val gopherOk = TextOps.gopherRules(window)
      .where(col("gopher_pass") === 1).select("doc_id")
    // 0.2 repetition ceiling in integer form (5·top ≤ n — oracle-exact)
    val repOk = TextOps.repetitionStats(window)
      .where(expr("5 * top_word_n <= n_words")).select("doc_id")
    val passed = floor.join(gopherOk, "doc_id").join(repOk, "doc_id")
      .select("doc_id", "text", "n_tokens")
    val (_, appended) = IncrementalIngest.appendDeduped(spark, cat, curated, passed)
    window.unpersist()
    cat.putMeta(curated, watermarkKey, to.toString) // AFTER the data
    (n, appended)
  }
}
