package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession, SaveMode}
import java.nio.file.{Files, Paths, Path, StandardCopyOption}
import scala.jdk.CollectionConverters._

/** Iceberg-semantics table emulation over parquet: immutable snapshots, each
  * committed by an atomic manifest swap. No Iceberg runtime jar ships in this
  * sandbox (/opt/spark/jars has none — SURVEY.md §2.3), so the catalog is a
  * trait; `iceberg-spark-runtime` drops in behind the same calls via config
  * when available.
  *
  * Layout:  <root>/data/snap-<id>/part-*.parquet
  *          <root>/_manifests/v<N>.json   (file list of the CURRENT snapshot)
  *          <root>/_manifests/CURRENT     (atomic pointer, rename-swapped)
  *
  * Readers resolve CURRENT → manifest → file list; a writer prepares a full
  * new snapshot directory, writes v<N+1>.json, then renames a temp pointer
  * onto CURRENT (atomic on POSIX) — readers never observe a partial commit.
  */
trait PageCatalog {
  def read(spark: SparkSession, table: String): DataFrame
  def commit(df: DataFrame, table: String): Long
  /** Iceberg fast-append: the new snapshot = previous file list + the
    * delta's files — metadata-only on the existing data, no rewrite. */
  def append(df: DataFrame, table: String): Long
  def currentSnapshot(table: String): Option[Long]
}

final class ParquetSnapshotCatalog(root: String) extends PageCatalog {

  private def manifestDir(table: String): Path = Paths.get(root, table, "_manifests")

  override def currentSnapshot(table: String): Option[Long] = {
    val cur = manifestDir(table).resolve("CURRENT")
    if (Files.exists(cur)) Some(Files.readString(cur).trim.toLong) else None
  }

  private def manifestFiles(table: String, snap: Long): Seq[String] = {
    val m = manifestDir(table).resolve(s"v$snap.json")
    // one absolute parquet path per line inside a trivial JSON array
    val s = Files.readString(m)
    s.split('\n').map(_.trim.stripPrefix("[").stripSuffix("]").stripPrefix("\"").stripSuffix(",").stripSuffix("\""))
      .filter(_.nonEmpty).toSeq
  }

  override def read(spark: SparkSession, table: String): DataFrame = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
    // mergeSchema: Iceberg-style ADD-column evolution — a metadata-only
    // commit may reference data files written before and after a schema
    // widened; old files surface nulls for the new columns
    spark.read.option("mergeSchema", "true").parquet(manifestFiles(table, snap): _*)
  }

  /** Write `df` into `dataDir` and return the sorted parquet file list —
    * the shared first half of every data-writing commit path.
    */
  private def writeSnapshotData(df: DataFrame, dataDir: Path): Seq[String] = {
    df.write.mode(SaveMode.Overwrite).parquet(dataDir.toString)
    scala.util.Using.resource(Files.list(dataDir)) { s =>
      s.iterator().asScala
        .filter(p => p.getFileName.toString.endsWith(".parquet"))
        .map(_.toAbsolutePath.toString).toSeq.sorted
    }
  }

  override def commit(df: DataFrame, table: String): Long = {
    val snap = claimSnapshotId(table)
    val files = writeSnapshotData(df, Paths.get(root, table, "data", s"snap-$snap"))
    writeManifest(table, snap, files)
    snap
  }

  override def append(df: DataFrame, table: String): Long = {
    // single-writer append (the claim guards the snapshot id; concurrent
    // appends would need a manifest-merge retry loop, like Iceberg's)
    val prev = currentSnapshot(table).map(manifestFiles(table, _)).getOrElse(Seq.empty)
    val snap = claimSnapshotId(table)
    val files = writeSnapshotData(df, Paths.get(root, table, "data", s"snap-$snap"))
    writeManifest(table, snap, (prev ++ files).sorted)
    snap
  }

  /** Optimistic snapshot-id claim: atomically CREATE_NEW a claim marker so
    * two concurrent committers can never write the same manifest version
    * (the Iceberg-catalog CAS, filesystem edition). Claims are separate
    * from manifests, so a half-done commit is invisible to readers and
    * time travel. The CURRENT pointer still advances last-swap-wins; both
    * snapshots stay addressable either way.
    */
  private def claimSnapshotId(table: String): Long = {
    val dir = manifestDir(table)
    Files.createDirectories(dir)
    val claimed = scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(_.startsWith(".claim-v"))
        .map(_.stripPrefix(".claim-v").toLong).toSeq
    }
    var snap = (snapshots(table) ++ claimed :+ 0L).max + 1L
    while (true) {
      try {
        Files.writeString(dir.resolve(s".claim-v$snap"), "",
          java.nio.file.StandardOpenOption.CREATE_NEW)
        return snap
      } catch {
        case _: java.nio.file.FileAlreadyExistsException => snap += 1L
      }
    }
    snap // unreachable
  }

  /** Iceberg-style TIME TRAVEL: read the table as of a past snapshot.
    * Manifests are immutable and never deleted, so every committed version
    * stays addressable.
    */
  def readSnapshot(spark: SparkSession, table: String, snap: Long): DataFrame = {
    require(Files.exists(manifestDir(table).resolve(s"v$snap.json")),
      s"no snapshot $snap for $table")
    spark.read.option("mergeSchema", "true").parquet(manifestFiles(table, snap): _*)
  }

  /** All committed snapshot ids, ascending. */
  def snapshots(table: String): Seq[Long] = {
    val dir = manifestDir(table)
    if (!Files.exists(dir)) return Nil
    scala.util.Using.resource(Files.list(dir)) { s =>
      s.iterator().asScala.map(_.getFileName.toString)
        .filter(n => n.startsWith("v") && n.endsWith(".json"))
        .map(n => n.stripPrefix("v").stripSuffix(".json").toLong)
        .toSeq.sorted
    }
  }

  /** Roll the table back (or forward) to an existing snapshot — a
    * metadata-only atomic pointer swap, like Iceberg's rollback_to_snapshot.
    */
  def rollbackTo(table: String, snap: Long): Unit = {
    require(Files.exists(manifestDir(table).resolve(s"v$snap.json")),
      s"no snapshot $snap for $table")
    val tmp = manifestDir(table).resolve(s".CURRENT.rb$snap")
    Files.writeString(tmp, snap.toString)
    Files.move(tmp, manifestDir(table).resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }

  /** Exactly-once streaming append (the foreachBatch sink contract):
    * micro-batch `batchId`'s data lands in a batch-addressed directory and
    * is committed by the atomic manifest swap — the manifest itself IS the
    * idempotence marker, so Spark's replay-after-failure semantics (a
    * batch may be re-delivered, never skipped) compose to exactly-once:
    *
    *   - crash AFTER the data write, BEFORE the manifest commit → the
    *     replay overwrites the orphan directory and commits once;
    *   - crash AFTER the commit → the replay sees the batch referenced by
    *     a manifest and skips without touching storage.
    *
    * CONTRACT: batch ids must come from ONE checkpoint lineage per table.
    * A fresh checkpoint re-numbering from 0 against an existing table
    * makes its early batches indistinguishable from replays — they are
    * skipped (loudly, on stderr), never silently merged. Returns true iff
    * this call committed the batch.
    */
  def appendBatch(df: DataFrame, table: String, batchId: Long): Boolean = {
    if (batchCommitted(table, batchId)) {
      System.err.println(s"[catalog] appendBatch skip: batch $batchId already committed " +
        s"to '$table' (replay). Batch ids must come from one checkpoint lineage per table; " +
        "a new checkpoint reusing ids against an existing table is skipped here, not merged.")
      return false
    }
    val files = writeSnapshotData(df, Paths.get(root, table, "data", s"batch-$batchId"))
    val prev = currentSnapshot(table).map(manifestFiles(table, _)).getOrElse(Seq.empty)
    val snap = claimSnapshotId(table)
    writeManifest(table, snap, (prev ++ files).sorted)
    true
  }

  /** A batch is committed iff ANY retained manifest references its
    * batch-addressed directory, or the expired-batch ledger records it
    * (data present without either is an orphan from a mid-append crash —
    * NOT committed). Scanning all manifests — not just CURRENT — keeps the
    * marker durable across compact()/rollback, whose new snapshots
    * reference rewritten files; expireSnapshots preserves the ids of
    * batches its deleted manifests referenced in the ledger, so even full
    * snapshot expiry cannot resurrect a committed batch.
    */
  def batchCommitted(table: String, batchId: Long): Boolean = {
    val marker = s"/batch-$batchId/"
    snapshots(table).exists(s => manifestFiles(table, s).exists(_.contains(marker))) ||
      expiredBatches(table).contains(batchId)
  }

  /** Batch ids whose manifests were expired — the durable half of the
    * exactly-once marker (see [[batchCommitted]]).
    */
  def expiredBatches(table: String): Set[Long] = {
    val p = manifestDir(table).resolve("batches.expired.tsv")
    if (!Files.exists(p)) Set.empty
    else Files.readString(p).split('\n').filter(_.nonEmpty).map(_.toLong).toSet
  }

  /** Metadata-only commit: a new snapshot whose manifest references data
    * files already on storage (e.g. the chunk outputs of a resumable run) —
    * the Iceberg-style O(files) commit, no data copy.
    */
  def commitFiles(files: Seq[String], table: String): Long = {
    val snap = claimSnapshotId(table)
    writeManifest(table, snap, files.sorted)
    snap
  }

  /** Iceberg-style rewrite_data_files (bin-packing compaction): coalesce
    * the current snapshot's files into ~targetBytes outputs, committed as a
    * NEW snapshot — old versions stay time-travelable, CURRENT advances
    * atomically. `coalesce` (not `repartition`) keeps the rewrite a
    * shuffle-free narrow pass: adjacent scan splits merge into one writer
    * task each. At 100 TB this is the maintenance op that keeps scan task
    * counts bounded after many incremental/streaming commits (thousands of
    * small files → file-open overhead dominates the scan).
    */
  def compact(spark: SparkSession, table: String, targetBytes: Long = 128L << 20): Long = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
    val files = manifestFiles(table, snap)
    val totalBytes = files.map(f => Files.size(Paths.get(f))).sum
    val nOut = math.max(1, math.ceil(totalBytes.toDouble / targetBytes).toInt)
    commit(spark.read.parquet(files: _*).coalesce(nOut), table)
  }

  /** Iceberg-style expire_snapshots: drop all but the last `keepLast`
    * snapshots (CURRENT always survives) and delete the data files that
    * are referenced ONLY by expired manifests — metadata-only snapshots
    * sharing files with a live version keep those files on disk.
    * Returns the expired snapshot ids.
    */
  def expireSnapshots(table: String, keepLast: Int): Seq[Long] = {
    val snaps = snapshots(table)
    val keep: Set[Long] = snaps.takeRight(math.max(keepLast, 1)).toSet ++ currentSnapshot(table)
    val expired = snaps.filterNot(keep)
    // preserve the exactly-once markers of streaming batches whose
    // manifests are about to disappear (see batchCommitted)
    val batchRe = "/batch-(\\d+)/".r
    val expiredIds = expired.flatMap(s => manifestFiles(table, s))
      .flatMap(f => batchRe.findFirstMatchIn(f).map(_.group(1).toLong)).toSet
    if (expiredIds.nonEmpty) {
      val ledger = expiredBatches(table) ++ expiredIds
      val tmp = manifestDir(table).resolve(".batches.expired.tmp")
      Files.writeString(tmp, ledger.toSeq.sorted.mkString("", "\n", "\n"))
      Files.move(tmp, manifestDir(table).resolve("batches.expired.tsv"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    val liveFiles = keep.flatMap(s => manifestFiles(table, s))
    expired.flatMap(s => manifestFiles(table, s)).distinct
      .filterNot(liveFiles)
      .foreach(f => Files.deleteIfExists(Paths.get(f)))
    expired.foreach(s => Files.deleteIfExists(manifestDir(table).resolve(s"v$s.json")))
    expired
  }

  /** Commit + per-FILE column stats (Iceberg manifest zone maps): after the
    * data lands, one aggregation pass keyed by `input_file_name()` records
    * (min, max) per stats column per file into a `v<N>.stats.tsv` sidecar.
    * O(files) rows reach the driver — never data. At 100 TB these zone maps
    * are what lets a warc_ts- or doc_id-ranged query open 0.1% of the
    * files instead of all of them (the writer-side stats Iceberg collects
    * in its manifests; the emulation pays one extra scan instead of
    * hooking the parquet writer).
    */
  def commitWithStats(df: DataFrame, table: String, statsCols: Seq[String]): Long = {
    val snap = commit(df, table)
    val spark = df.sparkSession
    import org.apache.spark.sql.functions.{input_file_name, min => fmin, max => fmax, count => fcount, col, lit}
    val files = manifestFiles(table, snap)
    val aggs = statsCols.flatMap(c => Seq(fmin(col(c)).cast("string").as(s"min_$c"),
      fmax(col(c)).cast("string").as(s"max_$c"))) :+ fcount(lit(1)).as("n_rows")
    val rows = spark.read.parquet(files: _*)
      .groupBy(input_file_name().as("file"))
      .agg(aggs.head, aggs.tail: _*)
      .collect()
    val sb = new StringBuilder
    val seen = scala.collection.mutable.Set.empty[String]
    rows.foreach { r =>
      // input_file_name returns a URI (file:/... or file:///...); normalize
      // to the plain absolute path the manifest stores
      val f = "/" + r.getString(0).stripPrefix("file:").dropWhile(_ == '/')
      seen += f
      statsCols.zipWithIndex.foreach { case (c, i) =>
        sb.append(f).append('\t').append(c).append('\t')
          .append(escStat(r.getString(1 + 2 * i))).append('\t')
          .append(escStat(r.getString(2 + 2 * i))).append('\n')
      }
      // per-file row count under the reserved __count pseudo-column — what
      // makes count(*) a metadata-only query (statsAgg below)
      val n = r.getLong(1 + 2 * statsCols.length)
      sb.append(f).append('\t').append("__count").append('\t')
        .append(n).append('\t').append(n).append('\n')
    }
    // an empty writer partition still lands a 0-row parquet file the
    // input_file_name agg never sees; record it so completeness checks pass
    files.filterNot(seen).foreach { f =>
      sb.append(f).append('\t').append("__count").append('\t').append(0L).append('\t').append(0L).append('\n')
    }
    Files.writeString(manifestDir(table).resolve(s"v$snap.stats.tsv"), sb.toString)
    snap
  }

  /** Metadata-only aggregation (Iceberg's manifest-stats answer path):
    * global (min, max, count) of `column` for the CURRENT snapshot computed
    * purely from the `v<N>.stats.tsv` sidecar — O(files) driver work, ZERO
    * data files opened. At 100 TB this turns `SELECT min(ts), max(ts),
    * count(*)` — the first query every pipeline dashboard runs — from a
    * full scan into a metadata lookup.
    *
    * Soundness contract: answers ONLY when the sidecar is complete — every
    * manifest file must carry a `__count` row, and every file with rows
    * must carry a stats row for `column` (a fast-append / compaction /
    * plain-commit snapshot has no sidecar → None; callers fall back to the
    * real scan). min/max skip all-null files (per SQL semantics) while
    * count(*) still includes their rows; a column whose every file is
    * all-null yields (None, None, count).
    */
  def statsAgg(table: String, column: String): Option[(Option[String], Option[String], Long)] = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
    val all = manifestFiles(table, snap)
    val sidecar = manifestDir(table).resolve(s"v$snap.stats.tsv")
    if (!Files.exists(sidecar)) return None
    val lines = Files.readString(sidecar).split('\n').filter(_.nonEmpty).map(_.split('\t'))
    val counts = lines.collect { case Array(f, "__count", n, _) => f -> n.toLong }.toMap
    val stats = lines.collect { case Array(f, c, mn, mx) if c == column =>
      f -> ((unescStat(mn), unescStat(mx))) }.toMap
    // completeness: every file counted; every file WITH rows has column stats
    if (!all.forall(counts.contains)) return None
    if (!all.forall(f => counts(f) == 0L || stats.contains(f))) return None
    // all-null files (escaped-null bounds) are skipped for min/max per SQL
    // semantics; their rows still count
    val present = all.filter(f => counts(f) > 0L).map(stats)
      .collect { case (Some(mn), Some(mx)) => (mn, mx) }
    // compare tier: exact longs > exact doubles > byte-wise strings — a
    // DOUBLE column must never fall back to lexicographic order ("10.2" <
    // "9.5" byte-wise)
    def longs = present.forall { case (mn, mx) =>
      scala.util.Try(mn.toLong).isSuccess && scala.util.Try(mx.toLong).isSuccess }
    def doubles = present.forall { case (mn, mx) =>
      scala.util.Try(mn.toDouble).toOption.exists(d => !d.isNaN) &&
        scala.util.Try(mx.toDouble).toOption.exists(d => !d.isNaN) }
    val lt: (String, String) => Boolean =
      if (longs) (a, b) => a.toLong < b.toLong
      else if (doubles) (a, b) => a.toDouble < b.toDouble
      else (a, b) => a < b
    val mins = present.map(_._1)
    val maxs = present.map(_._2)
    Some((
      mins.reduceOption((a, b) => if (lt(a, b)) a else b),
      maxs.reduceOption((a, b) => if (lt(a, b)) b else a),
      all.map(counts).sum))
  }

  /** `statsAgg` as a 1-row DataFrame (min_v, max_v, n_rows — strings so any
    * column type round-trips; cast at the call site). Throws if the sidecar
    * cannot answer — the contract surface wants the metadata path PROVEN,
    * not silently degraded to a scan.
    */
  def statsAggDF(spark: SparkSession, table: String, column: String): DataFrame = {
    val (mn, mx, n) = statsAgg(table, column).getOrElse(
      throw new IllegalStateException(s"stats sidecar cannot answer for $table.$column"))
    spark.createDataFrame(Seq((mn.orNull, mx.orNull, n))).toDF("min_v", "max_v", "n_rows")
  }

  /** File-level zone-map pruning: the current snapshot's files whose
    * [min, max] range for `column` overlaps [lo, hi] (numeric compare when
    * both bounds parse as longs, byte-wise string compare otherwise).
    * Files without stats — no sidecar, or a null min/max from an
    * all-null file — are conservatively KEPT: pruning is an optimization;
    * the reader still applies the real filter, so correctness never
    * depends on the zone maps.
    */
  def pruneFiles(table: String, column: String, lo: String, hi: String): Seq[String] = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
    val all = manifestFiles(table, snap)
    val sidecar = manifestDir(table).resolve(s"v$snap.stats.tsv")
    if (!Files.exists(sidecar)) return all
    val stats = Files.readString(sidecar).split('\n').filter(_.nonEmpty).map(_.split('\t'))
      .collect { case Array(f, c, mn, mx) if c == column =>
        f -> ((unescStat(mn), unescStat(mx))) }.toMap
    def overlaps(mnO: Option[String], mxO: Option[String]): Boolean = (mnO, mxO) match {
      case (Some(mn), Some(mx)) =>
        (scala.util.Try(lo.toLong).toOption, scala.util.Try(hi.toLong).toOption,
          scala.util.Try(mn.toLong).toOption, scala.util.Try(mx.toLong).toOption) match {
          case (Some(l), Some(h), Some(fmn), Some(fmx)) => fmx >= l && fmn <= h
          case _ => mx >= lo && mn <= hi
        }
      case _ => true // all-null stats: conservatively keep
    }
    all.filter(f => stats.get(f).forall { case (mn, mx) => overlaps(mn, mx) })
  }

  /** Ranged read through the zone maps: only overlapping files are opened;
    * the caller still applies (and Spark pushes down) the actual predicate.
    */
  def readPruned(spark: SparkSession, table: String, column: String,
                 lo: String, hi: String): DataFrame = {
    val files = pruneFiles(table, column, lo, hi)
    if (files.isEmpty) read(spark, table).limit(0)
    else spark.read.option("mergeSchema", "true").parquet(files: _*)
  }

  /** Append a crawl drop AND roll the table's cumulative HyperLogLog
    * registers for `col` forward into a snapshot sidecar — incremental
    * distinct counting at 100 TB: each drop pays one small register pass
    * over ITS rows only, the merge is element-wise max (HLL's exact union,
    * duplicate-insensitive), and "distinct values across ALL drops"
    * becomes a 2 KB sidecar read ([[hllDistinctStat]]) instead of a
    * table-wide COUNT(DISTINCT) shuffle.
    *
    * Chain integrity: the cumulative state is only written when the table
    * is empty OR the previous snapshot carries the sidecar — an append
    * that bypassed this method poisons the chain, later snapshots get no
    * sidecar, and the estimate path refuses (None) rather than
    * understating. (A compaction snapshot rewrites data, not content —
    * carry the sidecar forward by re-appending through this method or
    * recommitting; the refusal is the safe default.)
    */
  def appendWithHll(df: DataFrame, table: String, col: String): Long = {
    val prev = currentSnapshot(table)
    val prevRegs = prev.flatMap(readHllSidecar(table, _, col))
    val chainOk = prev.isEmpty || prevRegs.isDefined
    val delta = graft.operators.Sketch.hllRegistersOf(df, col)
    val snap = append(df, table)
    if (chainOk) {
      val merged = prevRegs match {
        case Some(p) => p.zip(delta).map { case (a, b) => math.max(a, b) }
        case None => delta
      }
      val bb = java.nio.ByteBuffer.allocate(merged.length * 8)
      bb.asLongBuffer().put(merged)
      val tmp = manifestDir(table).resolve(s".hll.$col.tmp$snap")
      Files.write(tmp, bb.array())
      Files.move(tmp, manifestDir(table).resolve(s"v$snap.hll.$col.bin"),
        StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    }
    snap
  }

  private def readHllSidecar(table: String, snap: Long, col: String): Option[Array[Long]] = {
    val p = manifestDir(table).resolve(s"v$snap.hll.$col.bin")
    if (!Files.exists(p)) None
    else {
      val bytes = Files.readAllBytes(p)
      val out = new Array[Long](bytes.length / 8)
      java.nio.ByteBuffer.wrap(bytes).asLongBuffer().get(out)
      Some(out)
    }
  }

  /** (raw_est, n_zero) for `col` across every drop of the CURRENT
    * snapshot, from the cumulative register sidecar alone — zero data
    * files opened; None when the chain is broken (see [[appendWithHll]]).
    */
  def hllDistinctStat(table: String, col: String): Option[(Long, Int)] = {
    val snap = currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
    readHllSidecar(table, snap, col).map(graft.operators.Sketch.hllEstimate)
  }

  /** Sidecar value escaping: SQL NULL → `\N` (distinct from the 4-char
    * string "null"), and backslash/tab/newline/CR escaped so the TSV parse
    * can never be corrupted by data values.
    */
  private def escStat(v: String): String =
    if (v == null) "\\N"
    else v.replace("\\", "\\\\").replace("\t", "\\t").replace("\n", "\\n").replace("\r", "\\r")

  private def unescStat(v: String): Option[String] = {
    if (v == "\\N") return None
    val sb = new StringBuilder
    var i = 0
    while (i < v.length) {
      val c = v.charAt(i)
      if (c == '\\' && i + 1 < v.length) {
        v.charAt(i + 1) match {
          case 't' => sb.append('\t')
          case 'n' => sb.append('\n')
          case 'r' => sb.append('\r')
          case '\\' => sb.append('\\')
          case o => sb.append(o)
        }
        i += 2
      } else { sb.append(c); i += 1 }
    }
    Some(sb.toString)
  }

  private def writeManifest(table: String, snap: Long, files: Seq[String]): Unit = {
    Files.createDirectories(manifestDir(table))
    val manifest = files.map(f => "\"" + f + "\"").mkString("[\n", ",\n", "\n]")
    Files.writeString(manifestDir(table).resolve(s"v$snap.json"), manifest)
    val tmp = manifestDir(table).resolve(s".CURRENT.tmp$snap")
    Files.writeString(tmp, snap.toString)
    Files.move(tmp, manifestDir(table).resolve("CURRENT"),
      StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
  }
}
