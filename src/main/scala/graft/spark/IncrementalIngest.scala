package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incremental crawl-drop ingestion with exact dedup against everything
  * already committed — the production append loop: every new CC drop lands
  * as a snapshot that contains only texts the table has never seen.
  *
  * The naive cross-drop check would re-read (and re-hash) the full table
  * per drop — a 100 TB scan to admit a 1 TB drop. Instead the catalog
  * maintains a DIGEST COMPANION table (`<table>__digests`, one 16-byte md5
  * per committed row): the new drop anti-joins the companion, so the
  * cross-drop check scans O(rows·16 bytes), never page text. Within-drop
  * dedup is the usual digest groupBy (partial-agged, min doc_id keeps).
  *
  * Crash contract: data commits FIRST, companion second. A crash between
  * the two leaves the companion BEHIND the table — never ahead — so a
  * retried drop can only re-admit duplicates, never lose rows; the repair
  * is detected (companion row count < table row count) at the next append
  * and the companion is rebuilt from the table before the anti-join, which
  * restores exactness. The inverse order would silently drop never-
  * committed texts — the unrecoverable direction.
  */
object IncrementalIngest {

  /** Append `docs` (doc_id, text, …) to `table`, deduped within the drop
    * and against all prior snapshots. Returns (snapshotId, rowsAppended).
    */
  def appendDeduped(spark: SparkSession, cat: PageCatalog,
                    table: String, docs: DataFrame): (Long, Long) = {
    val digTable = table + "__digests"
    val withDig = docs.withColumn("digest", md5(col("text")))
    // within-drop: first arrival (min doc_id) per digest. The join-back side
    // is deduped on (digest, doc_id) first: a drop carrying two IDENTICAL
    // (doc_id, text) rows would otherwise fan the keeper join out and append
    // a same-snapshot exact duplicate the digest companion can never reject
    // later (it only guards ACROSS drops).
    val inDrop = withDig
      .groupBy("digest").agg(min("doc_id").as("doc_id"))
      .join(withDig.dropDuplicates("digest", "doc_id"), Seq("digest", "doc_id"))
    val fresh = cat.currentSnapshot(table) match {
      case None => inDrop
      case Some(_) =>
        repairIfBehind(spark, cat, table)
        // 16-byte column scan of the companion — never the table's text
        inDrop.join(cat.read(spark, digTable).select("digest"), Seq("digest"), "left_anti")
    }
    val staged = fresh.persist()
    val appended = staged.count()
    val snap =
      if (appended == 0) cat.currentSnapshot(table).getOrElse(0L)
      else {
        val s = cat.append(staged.drop("digest"), table) // data FIRST
        cat.append(staged.select("digest"), digTable) // companion second
        s
      }
    staged.unpersist()
    (snap, appended)
  }

  /** Companion-behind repair: a crash between the two commits leaves the
    * digest table short; rebuild it from the data table (one hashing scan —
    * the exceptional path, not the steady state).
    */
  def repairIfBehind(spark: SparkSession, cat: PageCatalog, table: String): Unit = {
    val digTable = table + "__digests"
    val tableRows = cat.read(spark, table).count()
    val digRows = cat.currentSnapshot(digTable)
      .map(_ => cat.read(spark, digTable).count()).getOrElse(0L)
    if (digRows < tableRows)
      cat.commit(cat.read(spark, table).select(md5(col("text")).as("digest")), digTable)
  }
}
