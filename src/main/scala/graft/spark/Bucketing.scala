package graft.spark

import org.apache.spark.sql.DataFrame

/** Bucketed-table layout: the Spark-native co-location strategy for the
  * joins a curation pipeline repeats every drop (docs ⋈ features,
  * docs ⋈ dedup-keepers, docs ⋈ quality scores — all keyed by doc_id/url).
  *
  * Writing both sides `bucketBy(n, key)` hashes rows into a fixed number
  * of buckets AT WRITE TIME; any later equi-join (or aggregation) on that
  * key reads bucket i against bucket i directly — ZERO Exchange in the
  * plan, on any cluster size. At 100 TB the write-side cost is paid once
  * per drop while every downstream join/groupBy on the key skips its
  * shuffle, the single biggest cost in a multi-pass pipeline (the same
  * motivation as Iceberg's bucket partition transform; this is the
  * sandbox-available equivalent, and `PageCatalog` remains the snapshot
  * layer for the html pages themselves).
  *
  * Operational notes baked in here:
  * - bucket count must MATCH on both join sides (Spark joins b_i ⋈ b_i);
  *   pick a power of two sized so one bucket of the biggest table fits an
  *   executor (10 TB table / 4096 buckets ≈ 2.4 GB — splittable further
  *   since Spark 3 can coalesce/repartition mismatched-bucket joins via
  *   `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).
  * - `sortBy(key)` makes each written FILE key-sorted; with one file per
  *   bucket the sort-merge join also skips its Sort. Multiple writer
  *   tasks produce several files per bucket, so the read side may still
  *   sort — correct either way, the Exchange elision is the contract.
  * - tables register in the session catalog (in-memory here, Hive/Glue in
  *   production); data lands at an explicit `path` so the warehouse is
  *   relocatable and the table is EXTERNAL (drop = metadata only).
  */
object Bucketing {

  /** Write `df` as a bucketed (and per-file key-sorted) external parquet
    * table, replacing any previous registration and data.
    */
  def writeBucketed(df: DataFrame, table: String, path: String,
                    key: String, buckets: Int = 8): Unit = {
    val spark = df.sparkSession
    spark.sql(s"DROP TABLE IF EXISTS $table")
    df.write.mode("overwrite")
      .option("path", path)
      .bucketBy(buckets, key)
      .sortBy(key)
      .format("parquet")
      .saveAsTable(table)
  }
}
