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
}
