package graft.sources

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.GenericInternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types._
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import scala.jdk.CollectionConverters._

import graft.spark.ParquetSnapshotCatalog

/** DataSourceV2 STREAMING read of the snapshot catalog — the Iceberg
  * streaming-read shape (`spark.readStream.format("iceberg")`) for the
  * filesystem catalog emulation:
  *
  *   spark.readStream.format("graft-catalog")
  *     .option("root", root).option("table", "pages").load()
  *
  * Offsets ARE snapshot ids: each micro-batch is the incremental window
  * (lastSnap, nextSnap] planned with the catalog's own O(delta) metadata
  * rules (manifest-LIST entry diff; only the window's delta manifests
  * expand), so a downstream pipeline — curation, indexing, CDC mirroring —
  * becomes a real Structured Streaming query with checkpointed exactly-once
  * progress instead of a hand-rolled watermark loop. The first batch
  * bootstraps with the full current snapshot (offset 0), matching
  * `readIncremental(fromSnap <= 0)`.
  *
  * Semantics (the Iceberg incremental-scan contract, enforced not assumed):
  *   - INSERT feed: a batch carries the rows ADDED in its window. Equality
  *     deletes committed in-window are applied to in-window files by the
  *     sequence rule (a delete at D hits only files added before D), so an
  *     upsert's fresh captures flow through while a row inserted AND
  *     taken down inside one window never appears. Takedowns of rows
  *     emitted by EARLIER batches are not retracted here — that is the
  *     changelog's delete side (`deletedInWindow` / `readChangelog`),
  *     deliberately not a streaming source concern (Iceberg's streaming
  *     read skips overwrite snapshots the same way).
  *   - a window crossing a REWRITE (compaction/expire/rollback) fails the
  *     stream loudly instead of re-emitting old rows as new — restart from
  *     a fresh checkpoint after maintenance, exactly like Iceberg's
  *     streaming read refuses replace snapshots.
  *   - `maxSnapshotsPerBatch` (default: all available) rate-limits how many
  *     snapshots one micro-batch may advance — admission control for a
  *     backlogged stream, so catch-up after downtime is N bounded batches,
  *     not one giant one.
  *
  * Scale shape at 100 TB: planning is driver-side O(delta) manifest I/O per
  * batch; each data file is one input partition streamed through a plain
  * parquet reader with COLUMN PRUNING pushed down (a query that only needs
  * `url` never decodes the html pages), and per-file equality deletes ride
  * the partition as broadcast-sized key sets (takedown-sized by
  * construction — they are the contents of delete FILES).
  *
  * The same scan doubles as a batch read (`spark.read.format(...)`) of the
  * current snapshot through the identical delete-applying reader, which is
  * what the parity spec pins against `catalog.read`.
  */
class CatalogSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "graft-catalog"
  override def supportsExternalMetadata(): Boolean = false

  override def inferSchema(options: CaseInsensitiveStringMap): StructType = {
    val (root, table) = CatalogSource.rootTable(options)
    val cat = new ParquetSnapshotCatalog(root)
    val snap = cat.currentSnapshot(table).getOrElse(throw new IllegalArgumentException(
      s"graft-catalog source: table '$table' under '$root' has no committed snapshot"))
    // the authoritative read path's schema — rename history applied and
    // ADD-column evolution unioned by name (a first-footer-only inference
    // would miss columns the first file predates); driver-side planning
    // only, no data read
    scala.util.Try(cat.read(SparkSession.active, table).schema).getOrElse {
      val files = cat.filesWithAddOrder(table, snap).map(_._1).sorted
      // fallback: one footer, driver-side — walk the list so a missing
      // first file (mid-maintenance) degrades gracefully
      files.iterator
        .map(f => scala.util.Try(SparkSession.active.read.parquet(f).schema))
        .collectFirst { case scala.util.Success(s) => s }
        .getOrElse(throw new IllegalArgumentException(
          s"graft-catalog source: snapshot $snap of '$table' has no readable data files"))
    }
  }

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: java.util.Map[String, String]): Table = {
    val opts = new CaseInsensitiveStringMap(properties)
    new CatalogTable(schema, opts.get("root"), opts.get("table"),
      Option(opts.get("maxSnapshotsPerBatch")).map(_.toInt).getOrElse(Int.MaxValue),
      Option(opts.get("startSnapshot")).map(_.toLong).getOrElse(0L))
  }
}

object CatalogTable {
  private[sources] def metaCol(colName: String, dt: DataType)
      : org.apache.spark.sql.connector.catalog.MetadataColumn =
    new org.apache.spark.sql.connector.catalog.MetadataColumn {
      override def name(): String = colName
      override def dataType(): DataType = dt
      override def isNullable: Boolean = false
    }
}

object CatalogSource {
  private[sources] def rootTable(options: CaseInsensitiveStringMap): (String, String) = {
    val root = Option(options.get("root")).getOrElse(
      throw new IllegalArgumentException("graft-catalog source needs option 'root'"))
    val table = Option(options.get("table")).getOrElse(
      throw new IllegalArgumentException("graft-catalog source needs option 'table'"))
    (root, table)
  }

  /** Delete keys match `CAST(column AS STRING)`; the non-Spark reader can
    * replay that cast faithfully only for these types (they are what
    * takedown/upsert key on: urls, digests, ids).
    */
  private[sources] def deletableType(dt: DataType): Boolean = dt match {
    case StringType | LongType | IntegerType => true
    case _ => false
  }
}

class CatalogTable(tableSchema: StructType, root: String, table: String,
                   maxSnaps: Int, startSnap: Long, asOf: Option[Long] = None)
    extends Table with SupportsRead
    with org.apache.spark.sql.connector.catalog.SupportsWrite
    with org.apache.spark.sql.connector.catalog.SupportsMetadataColumns {
  override def name(): String = s"graft-catalog:$root/$table"
  override def schema(): StructType = tableSchema

  /** Iceberg-shape metadata columns: `_file` (the data file path as the
    * manifest stores it) and `_pos` (the row's PHYSICAL ordinal within that
    * file — rows suppressed by pending tombstones still advance it, so it
    * is exactly the coordinate a positional tombstone names). They are what
    * row-level SQL DML keys on (`SupportsDelta.rowId`) and are directly
    * SELECTable for lineage queries. A data column with the same name wins
    * (Spark omits the conflicting metadata column).
    */
  override def metadataColumns()
      : Array[org.apache.spark.sql.connector.catalog.MetadataColumn] = Array(
    CatalogTable.metaCol("_file", StringType),
    CatalogTable.metaCol("_pos", LongType))
  override def capabilities(): java.util.Set[TableCapability] =
    Set(TableCapability.BATCH_READ, TableCapability.MICRO_BATCH_READ,
      TableCapability.BATCH_WRITE, TableCapability.STREAMING_WRITE,
      TableCapability.TRUNCATE, TableCapability.OVERWRITE_BY_FILTER,
      TableCapability.OVERWRITE_DYNAMIC).asJava
  override def newScanBuilder(options: CaseInsensitiveStringMap): ScanBuilder =
    new CatalogScanBuilder(tableSchema, root, table, maxSnaps, startSnap, asOf)
  override def newWriteBuilder(info: org.apache.spark.sql.connector.write.LogicalWriteInfo)
      : org.apache.spark.sql.connector.write.WriteBuilder =
    new CatalogWriteBuilder(info.schema(), root, table)
}

final class CatalogScanBuilder(tableSchema: StructType, root: String, table: String,
                               maxSnaps: Int, startSnap: Long, asOf: Option[Long] = None)
    extends ScanBuilder with SupportsPushDownRequiredColumns
    with org.apache.spark.sql.connector.read.SupportsPushDownFilters
    with org.apache.spark.sql.connector.read.SupportsPushDownAggregates {
  import org.apache.spark.sql.sources._
  private var required: StructType = tableSchema
  private var pushed: Array[Filter] = Array.empty
  private var pushedAgg: Option[(StructType, Array[Array[Any]])] = None
  override def pruneColumns(requiredSchema: StructType): Unit = required = requiredSchema

  /** Global MIN/MAX/COUNT(*) answered from the stats sidecars — zero data
    * files opened (Iceberg's metadata-aggregate optimization). Pushable
    * only when the answer is PROVABLY exact: no WHERE residue (we return
    * every filter as residual, so any filter blocks this), no GROUP BY, no
    * time travel, every file of the snapshot counted, no delete tombstone
    * pending ([[ParquetSnapshotCatalog.statsAgg]]'s refusal rule), and the
    * column's stat string round-trips its type exactly (long/int/string —
    * doubles are deliberately excluded: a formatted bound may not be the
    * exact stored double).
    */
  private def tryPushAgg(agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Array[Any]])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    if (asOf.nonEmpty || pushed.nonEmpty) return None
    if (agg.groupByExpressions().nonEmpty) return tryPushGroupAgg(agg)
    val cat = new ParquetSnapshotCatalog(root)
    if (cat.currentSnapshot(table).isEmpty) return None
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[StructField] =
      e match {
        case f: NamedReference if f.fieldNames().length == 1 =>
          tableSchema.fields.find(_.name == f.fieldNames()(0))
        case _ => None
      }
    def statVal(dt: DataType, s: String): Option[Any] = dt match {
      case LongType => s.toLongOption
      case IntegerType => s.toIntOption
      case StringType => Some(UTF8String.fromString(s))
      case _ => None
    }
    val res: Seq[Option[(StructField, Any)]] = agg.aggregateExpressions().toSeq.map {
      case _: CountStar =>
        cat.countStar(table).map(n => (StructField("count_star", LongType, nullable = false), n: Any))
      case m: Min => colOf(m.column).flatMap { f =>
        cat.statsAgg(table, f.name).flatMap(_._1).flatMap(statVal(f.dataType, _))
          .map(v => (StructField(s"min_${f.name}", f.dataType), v))
      }
      case m: Max => colOf(m.column).flatMap { f =>
        cat.statsAgg(table, f.name).flatMap(_._2).flatMap(statVal(f.dataType, _))
          .map(v => (StructField(s"max_${f.name}", f.dataType), v))
      }
      // COUNT(col) / COUNT(DISTINCT col) need null counts, which the stats
      // sidecar does not track — EXCEPT for the identity partition column
      // on an exact-clustered layout: every file is pinned to one value, so
      // a file's rows are null exactly when its pin is null, and the
      // distinct values are the pins themselves. partitionGroupCounts'
      // refusal rules (every file pinned AND counted, no tombstone pending)
      // carry over unchanged, so the answer is provably exact or refused.
      case c: Count => colOf(c.column).flatMap { f =>
        if (!cat.partitionSpec(table).exists(s =>
            s.col == f.name && s.isInstanceOf[graft.spark.IdentityTransform])) None
        else cat.partitionGroupCounts(table).map { groups =>
          val n: Long =
            if (c.isDistinct) groups.count { case (v, cnt) => v.isDefined && cnt > 0L }.toLong
            else groups.collect { case (Some(_), cnt) => cnt }.sum
          val nm = if (c.isDistinct) s"count_distinct_${f.name}" else s"count_${f.name}"
          (StructField(nm, LongType, nullable = false), n: Any)
        }
      }
      case _ => None // other aggregates (SUM/AVG/...) need the row scan
    }
    if (res.isEmpty || res.exists(_.isEmpty)) None
    else Some((StructType(res.map(_.get._1)), Array(res.map(_.get._2).toArray)))
  }

  /** Metadata-only `GROUP BY <partition column> COUNT(*)` — the per-group
    * twin of the global path: pushable only on an exact-clustered identity
    * layout where every file is pinned to one value AND `__count`ed with no
    * tombstone pending ([[ParquetSnapshotCatalog.partitionGroupCounts]]'s
    * refusal rule); the per-language census over 100 TB from O(files)
    * metadata, zero data opened. Complete-pushdown layout: group column
    * first, then one count per aggregate expression.
    */
  private def tryPushGroupAgg(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation)
      : Option[(StructType, Array[Array[Any]])] = {
    import org.apache.spark.sql.connector.expressions.aggregate._
    import org.apache.spark.sql.connector.expressions.NamedReference
    val gb = agg.groupByExpressions()
    if (gb.length != 1) return None
    val col = gb(0) match {
      case f: NamedReference if f.fieldNames().length == 1 => f.fieldNames()(0)
      case _ => return None
    }
    // zero aggregate expressions = a group-only aggregate (SELECT DISTINCT
    // <partition col>, or an outer count() collapsing the inner counts) —
    // the distinct partition values are metadata too
    val aggs = agg.aggregateExpressions().toSeq
    if (!aggs.forall(_.isInstanceOf[CountStar])) return None
    val cat = new ParquetSnapshotCatalog(root)
    if (!cat.partitionSpec(table).exists(s =>
        s.col == col && s.isInstanceOf[graft.spark.IdentityTransform])) return None
    val field = tableSchema.fields.find(_.name == col).getOrElse(return None)
    def internal(v: Option[String]): Option[Any] = v match {
      case None => Some(null)
      case Some(s) => field.dataType match {
        case LongType => s.toLongOption
        case IntegerType => s.toIntOption
        case StringType => Some(UTF8String.fromString(s))
        case _ => None
      }
    }
    val groups = cat.partitionGroupCounts(table).getOrElse(return None)
    val conv = groups.map { case (v, n) => internal(v).map(iv => (iv, n)) }
    if (conv.exists(_.isEmpty)) return None
    val rows = conv.map(_.get).map { case (iv, n) =>
      (iv +: aggs.map(_ => n: Any)).toArray[Any]
    }
    val schema = StructType(
      StructField(col, field.dataType) +:
        aggs.indices.map(i => StructField(s"count_star_$i", LongType, nullable = false)))
    Some((schema, rows.toArray))
  }

  override def supportCompletePushDown(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean =
    tryPushAgg(agg).isDefined

  override def pushAggregation(
      agg: org.apache.spark.sql.connector.expressions.aggregate.Aggregation): Boolean = {
    pushedAgg = tryPushAgg(agg)
    pushedAgg.isDefined
  }

  /** Accept equality/range filters on atomic columns for FILE PRUNING
    * (zone maps + blooms + the partition transform consulted at planning);
    * every filter is also RETURNED as residual so Spark re-applies it row-
    * level — pruning is an optimization, never load-bearing, exactly like
    * the catalog's own pruned-read contract.
    */
  override def pushFilters(filters: Array[Filter]): Array[Filter] = {
    def prunable(f: Filter): Boolean = f match {
      case EqualTo(_, v) => v != null && CatalogScan.literalOk(v)
      case GreaterThan(_, v) => v != null && CatalogScan.literalOk(v)
      case GreaterThanOrEqual(_, v) => v != null && CatalogScan.literalOk(v)
      case LessThan(_, v) => v != null && CatalogScan.literalOk(v)
      case LessThanOrEqual(_, v) => v != null && CatalogScan.literalOk(v)
      // LIKE 'prefix%' — the url-slice access pattern on a url-sorted table
      case StringStartsWith(_, p) => p != null && p.nonEmpty
      // planning-time IN: union of per-value equality prunes, capped so the
      // driver-side sidecar consultation stays cheap (the runtime-filter
      // path's 256-value precedent, tighter here — per value it reads
      // zone + bloom + partition stats)
      case In(_, vs) => vs != null && vs.nonEmpty && vs.length <= 64 &&
        vs.forall(v => v != null && CatalogScan.literalOk(v))
      // boolean composition: Or prunes iff BOTH branches do (union);
      // And prunes if EITHER does (intersection / one-sided)
      case Or(l, r) => prunable(l) && prunable(r)
      case And(l, r) => prunable(l) || prunable(r)
      case _ => false
    }
    pushed = filters.filter(prunable)
    filters // all residual: the scan prunes FILES, Spark keeps the row filter
  }
  override def pushedFilters(): Array[Filter] = pushed

  override def build(): Scan = pushedAgg match {
    case Some((schema, values)) => new CatalogAggScan(table, schema, values)
    case None =>
      new CatalogScan(tableSchema, required, root, table, maxSnaps, startSnap, pushed, asOf)
  }
}

/** The metadata-only aggregate result — one row for the global path, one
  * row per group for the partition-column GROUP BY path — computed at
  * PLANNING time from the stats sidecars; the executor task only
  * materializes it.
  */
final case class CatalogAggPartition(rows: Array[Array[Any]]) extends InputPartition

final class CatalogAggScan(table: String, out: StructType, rows: Array[Array[Any]])
    extends Scan with Batch {
  override def readSchema(): StructType = out
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCatalogAggScan(table=$table, metadata-only: ${out.fieldNames.mkString(",")})"
  override def planInputPartitions(): Array[InputPartition] =
    Array(CatalogAggPartition(rows))
  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
        new PartitionReader[InternalRow] {
          private val rs = partition.asInstanceOf[CatalogAggPartition].rows
          private var i = -1
          override def next(): Boolean = { i += 1; i < rs.length }
          override def get(): InternalRow = new GenericInternalRow(rs(i).clone())
          override def close(): Unit = ()
        }
    }
}

/** One data file + the deletes that apply to it, both kinds resolved at
  * planning: equality tombstones as (column, keys) pairs in commit order
  * (sequence rule already applied), positional tombstones as the file's
  * sorted row ordinals.
  */
final case class CatalogFilePartition(file: String,
                                      deletes: Seq[(String, Seq[String])],
                                      posDeletes: Seq[Long] = Nil,
                                      dv: Option[(String, Long, Int)] = None)
    extends InputPartition

/** Several small data files bin-packed into ONE scan partition (Spark's
  * `FilePartition` behavior for the connector): a streaming-append table
  * accumulates many sub-target files between compactions, and one task per
  * tiny file is pure scheduling overhead at 100 TB. Each file keeps its own
  * delete state; readers chain per-file (row and columnar alike).
  */
final case class CatalogFileGroupPartition(files: Seq[CatalogFilePartition])
    extends InputPartition

object CatalogScan {
  /** The smallest string strictly greater than every string with prefix
    * `p` (last non-maximal char incremented, maximal tail dropped); None
    * when `p` is all `Char.MaxValue` — then the prefix range has no upper
    * bound. Used as an INCLUSIVE upper bound: over-keeps the single exact
    * boundary value, which is the safe direction for pruning.
    */
  private[sources] def nextPrefix(p: String): Option[String] = {
    var i = p.length - 1
    while (i >= 0 && p.charAt(i) == Char.MaxValue) i -= 1
    if (i < 0) None
    else Some(p.substring(0, i) + (p.charAt(i) + 1).toChar)
  }

  private[sources] def literalOk(v: Any): Boolean = v match {
    case _: String | _: Long | _: Int | _: java.lang.Long | _: java.lang.Integer |
         _: Double | _: java.lang.Double | _: java.sql.Timestamp | _: java.time.Instant => true
    case _ => false
  }
  private[sources] def lit(v: Any): String = v match {
    // render in the SESSION time zone (planning-time, driver-side), the
    // same zone the stats pass's CAST/date_format rendered the sidecar
    // bounds and the partitioned writer rendered the pins — a JVM-default
    // rendering (java.sql.Timestamp.toString) would silently mis-prune
    // day-boundary rows whenever the JVM and session zones differ
    case t: java.time.Instant =>
      java.time.format.DateTimeFormatter.ofPattern("yyyy-MM-dd HH:mm:ss.SSSSSS")
        .withZone(java.time.ZoneId.of(
          org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone))
        .format(t)
    case other => other.toString
  }

  /** First-fit-decreasing bin packing of per-file partitions into
    * `spark.sql.files.maxPartitionBytes` bins, each file padded by
    * `spark.sql.files.openCostInBytes` — Spark's own `FilePartition`
    * coalescing rule, applied to the connector so a between-compactions
    * small-file table doesn't pay one task per file. Singleton bins stay
    * plain [[CatalogFilePartition]]s; per-file delete state rides along
    * untouched. Driver cost: one `getFileStatus` per file (the same listing
    * [[CatalogScan.estimateStatistics]] already pays).
    */
  private[sources] def binPack(parts: Array[InputPartition],
                               targetOverride: Option[Long] = None): Array[InputPartition] = {
    if (parts.length <= 1) return parts
    val (confBytes, openCost) = scala.util.Try {
      val c = SparkSession.active.conf
      def bytes(k: String, dflt: Long): Long =
        org.apache.spark.network.util.JavaUtils.byteStringAsBytes(
          c.get(k, dflt.toString))
      (bytes("spark.sql.files.maxPartitionBytes", 128L << 20),
       bytes("spark.sql.files.openCostInBytes", 4L << 20))
    }.getOrElse((128L << 20, 4L << 20))
    // per-TABLE split override (the read.split.target-size TBLPROPERTY,
    // Iceberg's table-level read knob) beats the session-wide conf
    val maxBytes = targetOverride.getOrElse(confBytes)
    val hconf = new org.apache.hadoop.conf.Configuration()
    val sized = parts.map { p =>
      val f = p.asInstanceOf[CatalogFilePartition]
      val hp = new org.apache.hadoop.fs.Path(f.file)
      val len = scala.util.Try(hp.getFileSystem(hconf).getFileStatus(hp).getLen).getOrElse(0L)
      (f, len + openCost)
    }.sortBy(-_._2)
    val bins = scala.collection.mutable.ArrayBuffer[
      (scala.collection.mutable.ArrayBuffer[CatalogFilePartition], Long)]()
    sized.foreach { case (f, sz) =>
      bins.indexWhere(_._2 + sz <= maxBytes) match {
        case -1 => bins += ((scala.collection.mutable.ArrayBuffer(f), sz))
        case i => bins(i) = (bins(i)._1 += f, bins(i)._2 + sz)
      }
    }
    bins.map { case (fs, _) =>
      if (fs.length == 1) fs.head: InputPartition
      else CatalogFileGroupPartition(fs.sortBy(_.file).toSeq): InputPartition
    }.toArray
  }
}

final class CatalogScan(tableSchema: StructType, required: StructType,
                        root: String, table: String, maxSnaps: Int, startSnap: Long,
                        pushed: Array[org.apache.spark.sql.sources.Filter] = Array.empty,
                        asOf: Option[Long] = None)
    extends Scan with Batch with SupportsReportStatistics
    with SupportsReportPartitioning with SupportsRuntimeV2Filtering {
  private def cat = new ParquetSnapshotCatalog(root)

  // ------------------------------------------------------------------
  // RUNTIME file pruning (Iceberg's dynamic file filtering shape): Spark's
  // dynamic-partition-pruning rule sees `filterAttributes`, runs the join's
  // build side first, and hands the collected key values to `filter` as an
  // IN predicate — the scan then drops every data file whose zone map /
  // bloom sidecar / partition transform PROVES it cannot hold any of the
  // values, before a single fact byte is read. At 100 TB this is the
  // difference between scanning the table and scanning the join's actual
  // footprint. Pruning is never load-bearing: a file without stats is
  // kept, and Spark re-applies the join itself row-level.
  // ------------------------------------------------------------------
  private var runtimeKeep: Option[Set[String]] = None // surviving data files
  // allowed partition-column values, EXTERNALIZED strings — both the runtime
  // literals and the group keys normalize through [[externalize]], so the
  // internal-vs-external literal representation can never mis-drop a group
  private var runtimeKeyVals: Option[Set[String]] = None

  /** Columns a runtime IN can prune files on: stats/bloom/partition-spec
    * columns that exist in the schema at a literal type the stat strings
    * can replay (string/long/int — mirrors [[pruneByFilters]]'s tiers).
    */
  override def filterAttributes()
      : Array[org.apache.spark.sql.connector.expressions.NamedReference] = {
    val snapO = asOf.orElse(cat.currentSnapshot(table))
    snapO match {
      case None => Array.empty
      case Some(snap) =>
        cat.runtimePrunableColumns(table, snap)
          .filter(c => tableSchema.fields.exists(f => f.name == c && (f.dataType match {
            case StringType | LongType | IntegerType => true
            case _ => false
          })))
          .map(org.apache.spark.sql.connector.expressions.Expressions.column)
          .toArray
    }
  }

  /** The per-value equality candidate set — zone maps ∩ blooms ∩ the
    * partition transform, each conservative on missing stats (shared by the
    * planning-time EqualTo path and the runtime IN path).
    */
  private def eqCandidates(snap: Long, allFiles: Seq[String],
                           c: String, lit: String): Set[String] = {
    val z = cat.pruneFilesAt(table, snap, c, lit, lit).toSet
    val b = cat.pruneFilesByBloom(table, c, lit).toSet
    val p = cat.partitionSpec(table) match {
      case Some(spec) if spec.col == c =>
        val t = spec.literal(lit)
        cat.pruneFilesAt(table, snap, spec.statName, t, t).toSet
      case _ => allFiles.toSet
    }
    z & b & p
  }

  private def externalize(v: Any): Option[String] = v match {
    case u: UTF8String => Some(u.toString) // runtime IN values arrive internal
    case s: String => Some(s)
    case l: java.lang.Long => Some(l.toString)
    case i: java.lang.Integer => Some(i.toString)
    case _ => None
  }

  override def filter(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Unit = {
    import org.apache.spark.sql.connector.expressions.{Literal, NamedReference}
    predicates.foreach { p =>
      val kids = p.children()
      if ((p.name() == "IN" || p.name() == "=") && kids.length >= 2) kids.head match {
        case ref: NamedReference if ref.fieldNames().length == 1 &&
            kids.tail.forall(_.isInstanceOf[Literal[_]]) =>
          val c = ref.fieldNames()(0)
          val vals: Seq[Any] = kids.tail.map(_.asInstanceOf[Literal[_]].value: Any).toSeq
          val lits = vals.flatMap(externalize(_))
          // every value replayable AND the list small enough that per-value
          // sidecar consultation stays cheap driver work — a huge runtime IN
          // (low-selectivity build side) skips pruning, conservatively
          if (lits.length == vals.length && lits.length <= 256) {
            val all = batchFiles.map(_._1)
            val cand = lits.foldLeft(Set.empty[String])(_ | eqCandidates(batchSnap, all, c, _))
            runtimeKeep = Some(runtimeKeep.fold(cand)(_ & cand))
            if (cat.partitionSpec(table).exists(s => s.col == c &&
                s.isInstanceOf[graft.spark.IdentityTransform]))
              runtimeKeyVals = Some(runtimeKeyVals.fold(lits.toSet)(_ & lits.toSet))
          }
        case _ => ()
      }
    }
  }

  // ------------------------------------------------------------------
  // STORAGE-PARTITIONED JOIN surface (Iceberg's SPJ shape): when the table
  // was written exact-clustered on an identity transform
  // (commitPartitionedExact — ONE transform value per file), the scan
  // reports KeyGroupedPartitioning and returns one keyed multi-file
  // partition per value, so two tables partitioned on the same key join
  // with ZERO shuffle (spark.sql.sources.v2.bucketing.enabled=true).
  // Snapshot and file set are PINNED per scan so outputPartitioning and
  // planInputPartitions can never disagree under a concurrent commit.
  // ------------------------------------------------------------------
  private lazy val batchSnap: Long = effSnap
  private lazy val batchFiles: Seq[(String, Long)] =
    pruneByFilters(cat.filesWithAddOrder(table, batchSnap), batchSnap)

  /** One keyed file-group per partition value, or None when the layout
    * cannot guarantee it (no spec, a file with unpinned value, unsupported
    * key type, time travel). Identity groups key on the raw column value;
    * BUCKET groups key on the bucket id, reported as the `bucket(n, col)`
    * transform that Spark resolves through the catalog's FunctionCatalog
    * ([[GraftBucketFunction]]) — which is what lets two same-bucketed
    * tables compare partitionings and join with zero exchange. Days stays
    * out (session-tz rendering); truncate stays out (ranges, not pins, is
    * its usual write shape — and its SQL path pins too, but a truncate
    * prefix is rarely a join key).
    */
  private lazy val keyGroups: Option[(graft.spark.PartTransform, Array[InputPartition])] = {
    if (asOf.nonEmpty) None
    else cat.partitionSpec(table) match {
      case Some(spec @ (_: graft.spark.IdentityTransform | _: graft.spark.BucketTransform)) =>
        tableSchema.fields.find(_.name == spec.col).flatMap { field =>
          def internal(v: Option[String]): Option[Any] = (spec, v) match {
            // a bucket pin is the bucket id (INT result of the V2 function);
            // null raw keys cannot exist under a bucket write (writer gate)
            case (_: graft.spark.BucketTransform, Some(s)) =>
              s.toIntOption.map(java.lang.Integer.valueOf)
            case (_: graft.spark.BucketTransform, None) => None
            case (_, None) => Some(null)
            case (_, Some(s)) => field.dataType match {
              case LongType => s.toLongOption
              case IntegerType => s.toIntOption
              case StringType => Some(UTF8String.fromString(s))
              case _ => None
            }
          }
          cat.partitionValuesAt(table, batchSnap).flatMap { vals =>
            val byFile = vals.toMap
            val conv = byFile.values.toSeq.distinct.map(v => v -> internal(v)).toMap
            if (conv.values.exists(_.isEmpty)) None
            else {
              val parts = withDeletes(batchFiles, batchSnap)
                .map(_.asInstanceOf[CatalogFilePartition])
              val grouped = parts.groupBy(p => byFile(p.file))
                .toSeq.sortBy { case (v, _) => v.getOrElse("") }
                .map { case (v, fs) =>
                  CatalogKeyGroupPartition(fs, conv(v).get): InputPartition
                }
              Some((spec, grouped.toArray))
            }
          }
        }
      case _ => None
    }
  }

  override def outputPartitioning()
      : org.apache.spark.sql.connector.read.partitioning.Partitioning = keyGroups match {
    case Some((spec, groups)) =>
      val expr = spec match {
        case graft.spark.BucketTransform(n, c) =>
          org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
        case s =>
          org.apache.spark.sql.connector.expressions.Expressions.identity(s.col)
      }
      new org.apache.spark.sql.connector.read.partitioning.KeyGroupedPartitioning(
        Array(expr), groups.length)
    case None =>
      new org.apache.spark.sql.connector.read.partitioning.UnknownPartitioning(0)
  }

  /** The snapshot this batch scan reads: a pinned `VERSION AS OF` id (must
    * still be retained), or CURRENT.
    */
  private def effSnap: Long = asOf match {
    case Some(s) =>
      require(cat.snapshots(table).contains(s),
        s"graft-catalog: no retained snapshot $s for '$table' (VERSION AS OF)")
      s
    case None => cat.currentSnapshot(table).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for $table"))
  }

  /** Planner statistics from METADATA only: bytes = the pruned file set's
    * on-disk sizes, rows = the stats sidecar's __count when complete — what
    * lets Catalyst broadcast a small catalog table in a join without
    * scanning it first. O(files) driver work, zero data opened.
    */
  override def estimateStatistics(): Statistics = new Statistics {
    private val (bytes, rows) = {
      import org.apache.hadoop.fs.Path
      val snapO = asOf.orElse(cat.currentSnapshot(table))
      snapO match {
        case None => (0L, None)
        case Some(snap) =>
          val files = pruneByFilters(cat.filesWithAddOrder(table, snap), snap).map(_._1)
          val conf = new org.apache.hadoop.conf.Configuration()
          val sz = files.map { f =>
            val p = new Path(f)
            scala.util.Try(p.getFileSystem(conf).getFileStatus(p).getLen).getOrElse(0L)
          }.sum
          val nRows = scala.util.Try {
            val fdf = cat.filesDF(SparkSession.active, table)
              .where(org.apache.spark.sql.functions.col("file").isin(files: _*))
            val counted = fdf.collect()
            if (counted.nonEmpty && counted.forall(!_.isNullAt(3)))
              Some(counted.map(_.getLong(3)).sum)
            else None
          }.toOption.flatten
          (sz, nRows)
      }
    }
    override def sizeInBytes(): java.util.OptionalLong = java.util.OptionalLong.of(bytes)
    override def numRows(): java.util.OptionalLong =
      rows.map(java.util.OptionalLong.of).getOrElse(java.util.OptionalLong.empty())
  }

  override def readSchema(): StructType = required
  override def toBatch: Batch = this
  override def description(): String =
    s"GraftCatalogScan(root=$root, table=$table, columns=${required.fieldNames.mkString(",")}" +
      (if (pushed.nonEmpty) s", prunedBy=${pushed.mkString(";")}" else "") + ")"

  /** File pruning from the pushed filters: every applicable metadata
    * structure is consulted and the candidate sets INTERSECT — zone maps
    * (range + equality), bloom sidecars (equality), and the partition
    * transform (equality always; range only when order-preserving). A file
    * without stats is conservatively kept by each pruner, and Spark
    * re-applies the row-level filter on top.
    */
  private[sources] def pruneByFilters(files: Seq[(String, Long)], snap: Long): Seq[(String, Long)] = {
    import org.apache.spark.sql.sources._
    import CatalogScan.lit
    var keep = files.map(_._1).toSet
    def eqSet(c: String, v: Any): Set[String] = {
      val z = cat.pruneFilesAt(table, snap, c, lit(v), lit(v)).toSet
      val b = cat.pruneFilesByBloom(table, c, lit(v)).toSet
      val p = cat.partitionSpec(table) match {
        case Some(spec) if spec.col == c =>
          val t = spec.literal(lit(v))
          cat.pruneFilesAt(table, snap, spec.statName, t, t).toSet
        case _ => files.map(_._1).toSet
      }
      z & b & p
    }
    // recursive candidate set: And = intersection, Or = union (a file can
    // serve an Or iff it can serve SOME branch — both branches must be
    // answerable, else the whole Or is conservatively unanswerable)
    def cand(f: Filter): Option[Set[String]] = f match {
      case EqualTo(c, v) => Some(eqSet(c, v))
      case In(c, vs) =>
        // a file can serve the IN iff it can serve SOME value: union of
        // the per-value equality candidate sets
        Some(vs.map(v => eqSet(c, v)).reduce(_ | _))
      case StringStartsWith(c, p) =>
        // matches occupy [p, nextPrefix(p)] under STRING ordering; the
        // byte-wise-pinned pruner refuses the numeric/timestamp compare
        // tiers a bare prefix could accidentally parse into (tier
        // confusion there would OVER-prune — a wrong answer). Partition-
        // transform pruning is deliberately skipped: a truncated prefix
        // re-enters tier ambiguity, and zone maps already carry the
        // sorted-table case this pushdown exists for.
        Some(cat.pruneFilesAtBoundsRaw(table, snap, c,
          Some(p), CatalogScan.nextPrefix(p)).toSet)
      case GreaterThan(c, v) => Some(rangePrune(snap, c, Some(lit(v)), None, files))
      case GreaterThanOrEqual(c, v) => Some(rangePrune(snap, c, Some(lit(v)), None, files))
      case LessThan(c, v) => Some(rangePrune(snap, c, None, Some(lit(v)), files))
      case LessThanOrEqual(c, v) => Some(rangePrune(snap, c, None, Some(lit(v)), files))
      case Or(l, r) => for (a <- cand(l); b <- cand(r)) yield a | b
      case And(l, r) => (cand(l), cand(r)) match {
        case (Some(a), Some(b)) => Some(a & b)
        case (a, b) => a.orElse(b) // one answerable side still prunes
      }
      case _ => None
    }
    pushed.foreach(f => cand(f).foreach(s => keep = keep & s))
    files.filter(p => keep(p._1))
  }

  private def rangePrune(snap: Long, c: String, lo: Option[String], hi: Option[String],
                         files: Seq[(String, Long)]): Set[String] = {
    val z = cat.pruneFilesAtBounds(table, snap, c, lo, hi).toSet
    val p = cat.partitionSpec(table) match {
      case Some(spec) if spec.col == c && spec.orderPreserving =>
        cat.pruneFilesAtBounds(table, snap, spec.statName,
          lo.map(spec.literal), hi.map(spec.literal)).toSet
      case _ => files.map(_._1).toSet
    }
    z & p
  }

  /** Attach the sequence-rule-applicable deletes to each planned file and
    * validate that every delete column is readable by this scan (present in
    * the table schema at a CAST-replayable type).
    */
  private[sources] def withDeletes(files: Seq[(String, Long)],
                                   snap: Long): Array[InputPartition] = {
    // positional tombstones: (normalized path, row ordinal). The per-file
    // reader streams its file's row groups in order, so the running record
    // count IS `_metadata.row_index` — each file's sorted ordinal set rides
    // its partition and costs untouched files nothing. No add-order
    // grouping needed (tombstones name files; the sequence rule holds by
    // construction). A tombstoned path naming NO file of the snapshot has
    // nowhere to apply — refuse loudly rather than silently resurrect
    // (readWithDeletes' hand-to-every-group fallback has no per-file
    // equivalent here; both sides normalize identically, so this fires only
    // on genuine metadata corruption).
    // TSV tombstones expand at planning (takedown-sized by the commit
    // contract); deletion VECTORS stay coordinates — each file's partition
    // carries (dvPath, offset, length) and the TASK range-reads its bitmap,
    // so a DV table plans from O(index) driver bytes however many rows are
    // tombstoned.
    val posAll = cat.positionalTsvPairs(table, snap)
    val dvIdx = cat.deletionVectorIndex(table, snap)
    require(dvIdx.map(_.file).distinct.size == dvIdx.size,
      s"graft-catalog source: snapshot $snap of '$table' carries MULTIPLE deletion " +
      "vectors for one data file — run rewrite_position_deletes to merge them")
    val posByFile: Map[String, Seq[Long]] =
      if (posAll.isEmpty && dvIdx.isEmpty) Map.empty
      else {
        val snapNorm = cat.filesWithAddOrder(table, snap)
          .map(p => cat.normFile(p._1)).toSet
        val orphans = (posAll.collect { case (f, _) if !snapNorm(f) => f } ++
          dvIdx.collect { case e if !snapNorm(e.file) => e.file }).distinct
        require(orphans.isEmpty,
          s"graft-catalog source: positional tombstones of '$table' name files " +
          s"absent from snapshot $snap: ${orphans.take(3).mkString(", ")}")
        posAll.groupBy(_._1).map { case (f, ps) => f -> ps.map(_._2).distinct.sorted }
      }
    val dvByFile: Map[String, (String, Long, Int)] =
      dvIdx.map(e => e.file -> ((e.dvPath, e.offset, e.length))).toMap
    val deletes = cat.equalityDeletes(table, snap)
    deletes.map(_._2).distinct.foreach { c =>
      val f = tableSchema.fields.find(_.name == c).getOrElse(throw new IllegalStateException(
        s"graft-catalog source: delete column '$c' not in table schema"))
      require(CatalogSource.deletableType(f.dataType),
        s"graft-catalog source: delete column '$c' has type ${f.dataType.simpleString}; " +
        "only string/long/int delete keys are replayable by the streaming reader")
    }
    files.sortBy(_._1).map { case (f, addSnap) =>
      val norm = cat.normFile(f)
      CatalogFilePartition(f,
        deletes.filter(_._1 > addSnap).map(d => (d._2, d._3)),
        posByFile.getOrElse(norm, Nil),
        dvByFile.get(norm))
    }.toArray[InputPartition]
  }

  // batch read: the effective snapshot (VERSION AS OF or CURRENT),
  // file-pruned by the pushed filters
  override def planInputPartitions(): Array[InputPartition] = {
    // a ZERO-column unfiltered scan (`df.count()`, `HashAggregate([])` over
    // the relation after column pruning) only needs the row cardinality —
    // when every file is __count-ed and no tombstone is pending, emit the
    // rows synthetically and never open a data file
    if (required.isEmpty && pushed.isEmpty && asOf.isEmpty && runtimeKeep.isEmpty) {
      cat.countStar(table) match {
        case Some(n) => return Array(CatalogRowCountPartition(n))
        case None => ()
      }
    }
    keyGroups match {
      case Some((_, groups)) =>
        // runtime pruning keeps the KeyGroupedPartitioning contract: files
        // may drop out of a group and whole groups may disappear (Spark
        // back-fills missing partition values with empty partitions), but a
        // surviving group's key never changes.
        val byKey = runtimeKeyVals match {
          case Some(allowed) => groups.filter { g =>
            // a key that cannot externalize (incl. null) is conservatively
            // KEPT — only a provably-absent value drops its group
            externalize(g.asInstanceOf[CatalogKeyGroupPartition].keyVal)
              .forall(allowed.contains)
          }
          case None => groups
        }
        runtimeKeep match {
          case Some(keep) => byKey.flatMap { gp =>
            val g = gp.asInstanceOf[CatalogKeyGroupPartition]
            val fs = g.files.filter(f => keep(f.file))
            if (fs.isEmpty) None else Some(CatalogKeyGroupPartition(fs, g.keyVal): InputPartition)
          }
          case None => byKey
        }
      case None =>
        val files = runtimeKeep match {
          case Some(keep) => batchFiles.filter(f => keep(f._1))
          case None => batchFiles
        }
        CatalogScan.binPack(withDeletes(files, batchSnap), splitOverride)
    }
  }

  /** The table's `read.split.target-size` property as a bin-pack bound —
    * read once per scan (planning-time metadata, same listing the stats
    * consultation pays).
    */
  private[sources] lazy val splitOverride: Option[Long] =
    cat.getMeta(table, "prop.read.split.target-size").flatMap(_.toLongOption)

  /** Columnar (vectorized) reads iff snapshot-immutable facts allow them:
    * no key grouping (SPJ partitions chain files), no delete tombstone of
    * either kind at the pinned snapshot, no rename to resolve, no
    * synthesized metadata column, and every required type the vectorized
    * reader handles. Facts are per-SNAPSHOT metadata (immutable once
    * committed), so the flag cannot be invalidated between planning and
    * execution; runtime filters only REMOVE files. Anything else falls back
    * to the row reader — never a wrong answer, just the slower path.
    */
  override def createReaderFactory(): PartitionReaderFactory = {
    val columnarOk = scala.util.Try {
      def vectorizable(dt: DataType): Boolean = dt match {
        case StringType | BinaryType | LongType | IntegerType | DateType |
             DoubleType | FloatType | BooleanType | TimestampType => true
        case _ => false
      }
      required.nonEmpty &&
        !required.fieldNames.exists(n => n == "_file" || n == "_pos") &&
        cat.renameHistory(table).isEmpty &&
        cat.equalityDeletes(table, batchSnap).isEmpty &&
        // cheap positional check: TSV pairs are takedown-sized, and the DV
        // INDEX answers emptiness without touching a bitmap byte
        cat.positionalTsvPairs(table, batchSnap).isEmpty &&
        cat.deletionVectorIndex(table, batchSnap).isEmpty &&
        required.fields.forall(f => vectorizable(f.dataType))
    }.getOrElse(false)
    new CatalogReaderFactory(required, cat.renameHistory(table), columnarOk)
  }

  /** The row-based factory for STREAMING reads: a window's delete state is
    * not knowable when the stream's factory is created, so the columnar
    * flag could go stale mid-stream — streaming always rides the
    * delete-applying row reader.
    */
  private[sources] def rowReaderFactory(): PartitionReaderFactory =
    new CatalogReaderFactory(required, cat.renameHistory(table))

  override def toMicroBatchStream(checkpointLocation: String): streaming.MicroBatchStream = {
    require(asOf.isEmpty,
      "graft-catalog: VERSION AS OF is a batch read; streaming starts from startSnapshot")
    new CatalogMicroBatchStream(this, root, table, maxSnaps, startSnap)
  }
}

/** Offset = last fully-emitted snapshot id (0 = nothing emitted yet). */
final case class CatalogOffset(snap: Long) extends streaming.Offset {
  override def json(): String = snap.toString
}

final class CatalogMicroBatchStream(scan: CatalogScan, root: String, table: String,
                                    maxSnaps: Int, startSnap: Long)
    extends streaming.MicroBatchStream with streaming.SupportsTriggerAvailableNow {
  private def cat = new ParquetSnapshotCatalog(root)
  private var availableNowTarget: Long = -1L

  private def currentLatest(): Long =
    cat.currentSnapshot(table).getOrElse(startSnap)

  override def prepareForTriggerAvailableNow(): Unit = availableNowTarget = currentLatest()
  override def initialOffset(): streaming.Offset = CatalogOffset(startSnap)
  override def deserializeOffset(json: String): streaming.Offset = CatalogOffset(json.toLong)

  override def latestOffset(): streaming.Offset = CatalogOffset(currentLatest())

  /** Admission control: advance at most `maxSnapshotsPerBatch` committed
    * snapshots past `start` (and never past the AvailableNow pin) — a
    * backlogged stream catches up in bounded windows.
    */
  override def latestOffset(start: streaming.Offset, limit: streaming.ReadLimit): streaming.Offset = {
    val from = start.asInstanceOf[CatalogOffset].snap
    val cap = if (availableNowTarget >= 0) availableNowTarget else currentLatest()
    val pending = cat.snapshots(table).filter(s => s > from && s <= cap)
    CatalogOffset(if (pending.isEmpty) from else pending.take(maxSnaps).last)
  }

  override def planInputPartitions(start: streaming.Offset, end: streaming.Offset): Array[InputPartition] = {
    val s = start.asInstanceOf[CatalogOffset].snap
    val e = end.asInstanceOf[CatalogOffset].snap
    if (e <= s || e <= 0) return Array.empty
    val files =
      if (s <= 0) cat.filesWithAddOrder(table, e)             // bootstrap: full snapshot
      else cat.incrementalFilesWithAddOrder(table, s, e)       // O(delta) window
    // pushed filters prune the window's files too (sidecars permitting);
    // small streamed drops bin-pack like batch partitions
    CatalogScan.binPack(scan.withDeletes(scan.pruneByFilters(files, e), e), scan.splitOverride)
  }

  override def createReaderFactory(): PartitionReaderFactory = scan.rowReaderFactory()
  override def commit(end: streaming.Offset): Unit = ()
  override def stop(): Unit = ()
}

// ----------------------------------------------------------------------
// DSv2 WRITE path — the other half of the connector:
//   df.write.format("graft-catalog").mode("append")… and
//   ds.writeStream.format("graft-catalog")… (exactly-once via epoch
// markers). Tasks write parquet part files under a job-scoped staging
// directory; the JOB-level commit is one metadata-only fast-append
// (appendFiles / appendFilesAsBatch), so a failed job leaves only
// unreferenced staging files (orphan-GC'd) and a committed job is the same
// atomic snapshot every other write path produces. The table must already
// exist (first commit via the catalog API) — DSv2 writes are appends.
// ----------------------------------------------------------------------
import org.apache.spark.sql.connector.write.{Write, WriteBuilder, BatchWrite, DataWriter, DataWriterFactory, PhysicalWriteInfo, WriterCommitMessage}
import org.apache.spark.sql.connector.write.{streaming => wstreaming}
import org.apache.parquet.schema.{MessageType => PMessageType, Types => PTypes,
  PrimitiveType => PPrimitiveType, LogicalTypeAnnotation => PLogical}
import org.apache.parquet.schema.PrimitiveType.PrimitiveTypeName._

/** How the job-level commit lands: fast-append, whole-table replace, or an
  * Iceberg-shape partition overwrite (dynamic = replace the partitions the
  * data touches; `Partitions(values)` = a static `PARTITION (col=v)` clause,
  * clearing the named partitions even when no new rows land in them). */
private[sources] sealed trait CatalogWriteMode
private[sources] object CatalogWriteMode {
  case object Append extends CatalogWriteMode
  case object Truncate extends CatalogWriteMode
  case object DynamicPartitions extends CatalogWriteMode
  final case class Partitions(values: Set[String]) extends CatalogWriteMode
}

final class CatalogWriteBuilder(schema: StructType, root: String, table: String)
    extends WriteBuilder
    with org.apache.spark.sql.connector.write.SupportsDynamicOverwrite
    with org.apache.spark.sql.connector.write.SupportsOverwriteV2 {
  private var mode: CatalogWriteMode = CatalogWriteMode.Append
  private def cat = new ParquetSnapshotCatalog(root)

  /** `INSERT OVERWRITE` (static, no partition clause) /
    * `df.write.mode("overwrite")`: the job commit becomes a REPLACE
    * snapshot (commitFiles) instead of a fast-append — still one atomic
    * metadata swap, and time travel to the overwritten snapshot stays
    * complete (overwrites are snapshots, not mutations).
    */
  override def truncate(): WriteBuilder = { mode = CatalogWriteMode.Truncate; this }

  /** `INSERT OVERWRITE` under `partitionOverwriteMode=dynamic` (and
    * `df.writeTo(t).overwritePartitions()`): replace exactly the transform
    * values the new data pins, keep everything else — Iceberg's dynamic
    * overwrite, metadata-only over the untouched partitions.
    */
  override def overwriteDynamicPartitions(): WriteBuilder = {
    require(cat.partitionSpec(table).nonEmpty,
      s"graft-catalog: dynamic partition overwrite of '$table' needs a declared " +
      "partition transform (plain INSERT OVERWRITE replaces the whole table)")
    mode = CatalogWriteMode.DynamicPartitions; this
  }

  /** A static `INSERT OVERWRITE t PARTITION (col=v, ...)` arrives as an
    * overwrite-by-filter on the partition column (Spark renders the static
    * value as null-safe equality `<=>`); only identity-partition equality
    * is provably a partition swap — anything else is refused at analysis
    * via [[canOverwrite]] (never a silent whole-table replace).
    */
  private def partitionKeys(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : Option[Set[String]] = {
    import org.apache.spark.sql.connector.expressions.{NamedReference, Literal => VLit}
    def colOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case f: NamedReference if f.fieldNames().length == 1 => Some(f.fieldNames()(0))
        case _ => None
      }
    def litOf(e: org.apache.spark.sql.connector.expressions.Expression): Option[String] =
      e match {
        case l: VLit[_] => l.dataType match {
          case StringType | LongType | IntegerType => Option(l.value).map(_.toString)
          case _ => None
        }
        case _ => None
      }
    cat.partitionSpec(table) match {
      case Some(graft.spark.IdentityTransform(col)) if predicates.length == 1 =>
        val p = predicates(0)
        val kv: Option[Set[String]] = p.name() match {
          case "=" | "<=>" if p.children().length == 2 =>
            for (c <- colOf(p.children()(0)) if c == col;
                 v <- litOf(p.children()(1))) yield Set(v)
          case "IN" if p.children().length >= 2 =>
            colOf(p.children()(0)).filter(_ == col).flatMap { _ =>
              val vs = p.children().drop(1).toSeq.map(litOf)
              if (vs.exists(_.isEmpty)) None else Some(vs.map(_.get).toSet)
            }
          case _ => None
        }
        kv
      case _ => None
    }
  }
  override def canOverwrite(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate]): Boolean =
    predicates.forall(
      _.isInstanceOf[org.apache.spark.sql.connector.expressions.filter.AlwaysTrue]) ||
      partitionKeys(predicates).isDefined
  override def overwrite(
      predicates: Array[org.apache.spark.sql.connector.expressions.filter.Predicate])
      : WriteBuilder =
    if (predicates.forall(
        _.isInstanceOf[org.apache.spark.sql.connector.expressions.filter.AlwaysTrue]))
      truncate()
    else {
      mode = CatalogWriteMode.Partitions(partitionKeys(predicates).getOrElse(
        throw new UnsupportedOperationException(
          s"graft-catalog: overwrite of '$table' supports TRUE (full replace) or " +
          "equality on the identity partition column; got " +
          predicates.mkString(", "))))
      this
    }

  override def build(): Write = new CatalogWrite(schema, root, table, mode,
    cat.partitionSpec(table))
}

final case class CatalogCommitMessage(file: String, rows: Long,
    stats: Seq[(String, String, String)] = Nil) extends WriterCommitMessage

/** A task that ROLLED files at write.target-file-size: every rolled file
  * with its rows and writer-tracked stats. */
final case class RolledCommitMessage(
    entries: Seq[(String, Long, Seq[(String, String, String)])]) extends WriterCommitMessage

/** A partitioned batch writer's output: several files, each pinned to ONE
  * transform value (the writer rolls at value boundaries). */
final case class PartitionedCommitMessage(files: Seq[(String, Long, String)])
    extends WriterCommitMessage

final class CatalogWrite(schema: StructType, root: String, table: String,
                         mode: CatalogWriteMode = CatalogWriteMode.Append,
                         spec: Option[graft.spark.PartTransform] = None)
    extends Write
    with org.apache.spark.sql.connector.write.RequiresDistributionAndOrdering {
  private val stagingId = java.util.UUID.randomUUID().toString.take(8)

  // ------------------------------------------------------------------
  // Write DISTRIBUTION + ORDERING (Iceberg's write-clustered shape): a
  // table declared PARTITIONED BY asks Spark to shuffle same-key rows into
  // the same task and sort within it, so the value-rolling writer emits the
  // FEWEST one-value-per-file outputs. Correctness never depends on it —
  // the writer rolls at every value boundary regardless; clustering only
  // minimizes file count.
  // ------------------------------------------------------------------
  /** The write-side clustering key: the raw column for order-preserving
    * transforms, the bucket TRANSFORM itself for bucket — Spark resolves
    * `bucket(n, col)` through the table catalog's FunctionCatalog
    * ([[GraftBucketFunction]]) and shuffles/sorts by the bucket id, so
    * each task holds whole buckets and the value-rolling writer emits one
    * file per bucket.
    */
  private def clusterExpr(s: graft.spark.PartTransform)
      : org.apache.spark.sql.connector.expressions.Expression = s match {
    case graft.spark.BucketTransform(n, c) =>
      org.apache.spark.sql.connector.expressions.Expressions.bucket(n, c)
    case other => org.apache.spark.sql.connector.expressions.Expressions.column(other.col)
  }

  /** The write.sort-order TBLPROPERTY (unpartitioned tables only — a
    * declared transform's clustering wins): INSERTs RANGE-sort globally on
    * these columns and the writer tracks per-file min/max into the stats
    * sidecar, so a pure-SQL table gets zone-map pruning with zero Scala —
    * Iceberg's table sort order, end to end.
    */
  private lazy val sortOrderCols: Seq[String] =
    if (spec.nonEmpty) Nil
    else new ParquetSnapshotCatalog(root).getMeta(table, "prop.write.sort-order")
      .toSeq.flatMap(_.split(',')).map(_.trim).filter(_.nonEmpty)

  private def sortOrderSorts: Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    sortOrderCols.map(c => org.apache.spark.sql.connector.expressions.Expressions.sort(
      org.apache.spark.sql.connector.expressions.Expressions.column(c),
      org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING)).toArray

  override def requiredDistribution(): org.apache.spark.sql.connector.distributions.Distribution =
    spec match {
      case Some(s) => org.apache.spark.sql.connector.distributions.Distributions.clustered(
        Array(clusterExpr(s)))
      case None if sortOrderCols.nonEmpty =>
        org.apache.spark.sql.connector.distributions.Distributions.ordered(sortOrderSorts)
      case None => org.apache.spark.sql.connector.distributions.Distributions.unspecified()
    }
  override def distributionStrictlyRequired(): Boolean = false // advisory: rolling stays exact
  override def requiredOrdering(): Array[org.apache.spark.sql.connector.expressions.SortOrder] =
    spec match {
      case Some(s) => Array(org.apache.spark.sql.connector.expressions.Expressions.sort(
        clusterExpr(s),
        org.apache.spark.sql.connector.expressions.SortDirection.ASCENDING))
      case None => sortOrderSorts
    }

  override def toBatch: BatchWrite = new BatchWrite {
    override def createBatchWriterFactory(info: PhysicalWriteInfo): DataWriterFactory =
      new CatalogWriterFactory(schema, root, table, stagingId, spec,
        org.apache.spark.sql.internal.SQLConf.get.sessionLocalTimeZone, sortOrderCols,
        new ParquetSnapshotCatalog(root).getMeta(table, "prop.write.target-file-size")
          .flatMap(_.toLongOption))
    override def commit(messages: Array[WriterCommitMessage]): Unit = {
      // per-file row counts ride the commit messages for free — recorded as
      // __count sidecar lines so COUNT(*) over SQL-written tables stays a
      // metadata-only answer; a partitioned write additionally records each
      // file's pinned transform value as its stats bounds (lo == hi), which
      // is exactly what partition pruning and SPJ key grouping consume
      val all: Seq[(String, Long, Option[String])] = messages.toSeq.flatMap {
        case CatalogCommitMessage(f, n, _) => Seq((f, n, None))
        case RolledCommitMessage(es) => es.map { case (f, n, _) => (f, n, None) }
        case PartitionedCommitMessage(fs) => fs.map { case (f, n, v) => (f, n, Some(v)) }
      }.sortBy(_._1)
      val files = all.map(t => (t._1, t._2))
      val statLines = spec.toSeq.flatMap(s =>
        all.collect { case (f, _, Some(v)) => (f, s.statName, v, v) }) ++
        messages.toSeq.flatMap {
          case CatalogCommitMessage(f, _, st) => st.map { case (c, lo, hi) => (f, c, lo, hi) }
          case RolledCommitMessage(es) =>
            es.flatMap { case (f, _, st) => st.map { case (c, lo, hi) => (f, c, lo, hi) } }
          case _ => Nil
        }
      mode match {
        case CatalogWriteMode.Truncate =>
          // every snapshot owns >= 1 data file — an empty overwrite would
          // commit an unreadable snapshot; refuse loudly (DROP TABLE is the
          // empty-the-table operation)
          require(files.nonEmpty,
            s"graft-catalog: refusing empty INSERT OVERWRITE of '$table'")
          new ParquetSnapshotCatalog(root).commitFilesWithCounts(files, table, statLines)
        case CatalogWriteMode.DynamicPartitions =>
          // zero new rows touch zero partitions: dynamic overwrite of
          // nothing is a no-op, not a truncate
          if (files.nonEmpty)
            new ParquetSnapshotCatalog(root)
              .overwritePartitionValues(files, table, statLines, None)
        case CatalogWriteMode.Partitions(values) =>
          // empty files still CLEAR the named partitions (static contract)
          new ParquetSnapshotCatalog(root)
            .overwritePartitionValues(files, table, statLines, Some(values))
        case CatalogWriteMode.Append =>
          if (files.nonEmpty)
            new ParquetSnapshotCatalog(root).appendFilesWithCounts(files, table, statLines)
      }
    }
    override def abort(messages: Array[WriterCommitMessage]): Unit =
      CatalogWrite.deleteAll(messages)
  }

  override def toStreaming: wstreaming.StreamingWrite = {
    require(mode == CatalogWriteMode.Append,
      "graft-catalog sink: only append output mode is supported (truncate " +
      "per epoch would rewrite the table every micro-batch)")
    new wstreaming.StreamingWrite {
    override def createStreamingWriterFactory(info: PhysicalWriteInfo): wstreaming.StreamingDataWriterFactory =
      new CatalogStreamingWriterFactory(schema, root, table, stagingId)
    override def commit(epochId: Long, messages: Array[WriterCommitMessage]): Unit = {
      val files = messages.map(_.asInstanceOf[CatalogCommitMessage].file).toSeq.sorted
      if (files.nonEmpty &&
          !new ParquetSnapshotCatalog(root).appendFilesAsBatch(files, table, epochId))
        CatalogWrite.deleteAll(messages) // replayed epoch: drop the duplicate outputs
    }
    override def abort(epochId: Long, messages: Array[WriterCommitMessage]): Unit =
      CatalogWrite.deleteAll(messages)
    }
  }
}

object CatalogWrite {
  private[sources] def deleteAll(messages: Array[WriterCommitMessage]): Unit = {
    import org.apache.hadoop.fs.Path
    def del(f: String): Unit = {
      val p = new Path(f)
      val fs = p.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(p)) fs.delete(p, false)
    }
    messages.foreach {
      case CatalogCommitMessage(f, _, _) => del(f)
      case RolledCommitMessage(es) => es.foreach { case (f, _, _) => del(f) }
      case PartitionedCommitMessage(fs) => fs.foreach { case (f, _, _) => del(f) }
      case _ =>
    }
  }
}

final class CatalogWriterFactory(schema: StructType, root: String, table: String,
                                 stagingId: String,
                                 spec: Option[graft.spark.PartTransform] = None,
                                 sessionTz: String = "UTC",
                                 statCols: Seq[String] = Nil,
                                 targetBytes: Option[Long] = None)
    extends DataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long): DataWriter[InternalRow] =
    spec match {
      case Some(s) =>
        new CatalogPartitionedDataWriter(schema, root, table, stagingId, partitionId, taskId,
          s, sessionTz, targetBytes)
      case None =>
        new CatalogDataWriter(schema, root, table, stagingId, partitionId, taskId, statCols,
          targetBytes)
    }
}

final class CatalogStreamingWriterFactory(schema: StructType, root: String, table: String,
                                          stagingId: String)
    extends wstreaming.StreamingDataWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long, epochId: Long): DataWriter[InternalRow] =
    new CatalogDataWriter(schema, root, table, s"$stagingId-e$epochId", partitionId, taskId)
}

/** The shared parquet-hadoop row writer: schema mapping + record
  * serialization for one part file (atomic column types, timestamps as
  * INT64 micros — both Spark's reader and the connector's own read path
  * handle them), used by the append/overwrite writer and the row-level
  * (delta) writer alike.
  */
private[sources] object PqRow {
  import org.apache.hadoop.fs.Path
  import org.apache.parquet.hadoop.ParquetWriter
  import org.apache.parquet.hadoop.api.WriteSupport
  import org.apache.parquet.io.api.{Binary, RecordConsumer}

  private[sources] def message(schema: StructType): PMessageType = {
    val b = PTypes.buildMessage()
    schema.fields.foreach { f =>
      val t = f.dataType match {
        case StringType =>
          PTypes.optional(BINARY).as(PLogical.stringType())
        case BinaryType => PTypes.optional(BINARY)
        case LongType => PTypes.optional(INT64)
        case IntegerType => PTypes.optional(INT32)
        case DoubleType => PTypes.optional(DOUBLE)
        case FloatType => PTypes.optional(FLOAT)
        case BooleanType => PTypes.optional(BOOLEAN)
        case TimestampType =>
          PTypes.optional(INT64).as(PLogical.timestampType(true, PLogical.TimeUnit.MICROS))
        case DateType => PTypes.optional(INT32).as(PLogical.dateType())
        case other => throw new IllegalArgumentException(
          s"graft-catalog writer: unsupported column type $other for '${f.name}'")
      }
      b.addField(t.named(f.name))
    }
    b.named("spark_schema")
  }

  private final class RowWriteSupport(schema: StructType) extends WriteSupport[InternalRow] {
    private var rc: RecordConsumer = _
    override def init(conf: org.apache.hadoop.conf.Configuration): WriteSupport.WriteContext =
      new WriteSupport.WriteContext(message(schema), java.util.Collections.emptyMap[String, String]())
    override def prepareForWrite(consumer: RecordConsumer): Unit = rc = consumer
    override def write(row: InternalRow): Unit = {
      rc.startMessage()
      var i = 0
      while (i < schema.length) {
        if (!row.isNullAt(i)) {
          val name = schema.fields(i).name
          rc.startField(name, i)
          schema.fields(i).dataType match {
            case StringType => rc.addBinary(Binary.fromConstantByteArray(row.getUTF8String(i).getBytes))
            case BinaryType => rc.addBinary(Binary.fromConstantByteArray(row.getBinary(i)))
            case LongType | TimestampType => rc.addLong(row.getLong(i))
            case IntegerType | DateType => rc.addInteger(row.getInt(i))
            case DoubleType => rc.addDouble(row.getDouble(i))
            case FloatType => rc.addFloat(row.getFloat(i))
            case BooleanType => rc.addBoolean(row.getBoolean(i))
            case other => throw new IllegalStateException(s"unreachable: $other")
          }
          rc.endField(name, i)
        }
        i += 1
      }
      rc.endMessage()
    }
  }

  private final class B(p: Path, schema: StructType)
      extends ParquetWriter.Builder[InternalRow, B](p) {
    override def self(): B = this
    override def getWriteSupport(conf: org.apache.hadoop.conf.Configuration): WriteSupport[InternalRow] =
      new RowWriteSupport(schema)
  }

  private[sources] def open(schema: StructType, file: Path): ParquetWriter[InternalRow] =
    new B(file, schema)
      .withConf(new org.apache.hadoop.conf.Configuration())
      .withCompressionCodec(org.apache.parquet.hadoop.metadata.CompressionCodecName.SNAPPY)
      .build()
}

final class CatalogDataWriter(schema: StructType, root: String, table: String,
                              stagingId: String, partitionId: Int, taskId: Long,
                              statCols: Seq[String] = Nil,
                              targetBytes: Option[Long] = None)
    extends DataWriter[InternalRow] {
  import org.apache.hadoop.fs.Path

  // write.target-file-size: roll a fresh data file when the in-progress
  // one reaches the target (ParquetWriter.getDataSize = flushed + buffered
  // estimate) — the 100 TB write-side sizing knob, so one task writing a
  // huge partition emits right-sized files instead of one monolith
  private var fileNo = 0
  private def nextFile(): Path = {
    val p = new Path(root,
      f"$table/data/dsv2-$stagingId/part-$partitionId%05d-$taskId-$fileNo%04d.parquet")
    fileNo += 1
    p
  }
  private var file = nextFile()
  private var writer = PqRow.open(schema, file)
  private var rows = 0L
  private val done =
    scala.collection.mutable.ArrayBuffer[(String, Long, Seq[(String, String, String)])]()

  // per-file min/max of the write.sort-order columns (string/long/int
  // only), tracked inline so SQL-written tables get zone-map sidecars for
  // free; nulls are skipped per SQL min/max semantics — an all-null file
  // simply carries no stats row for the column (pruning keeps it, the
  // metadata aggregate refuses: conservative both ways)
  private val tracked: Array[(Int, org.apache.spark.sql.types.DataType)] =
    statCols.flatMap { c =>
      schema.fields.zipWithIndex.collectFirst {
        case (f, i) if f.name == c && (f.dataType == StringType ||
            f.dataType == LongType || f.dataType == IntegerType) => (i, f.dataType)
      }
    }.toArray
  private val mins = new Array[Any](tracked.length)
  private val maxs = new Array[Any](tracked.length)

  private def fileStats: Seq[(String, String, String)] =
    tracked.indices.collect {
      case j if mins(j) != null =>
        (schema.fields(tracked(j)._1).name, mins(j).toString, maxs(j).toString)
    }.toSeq

  private def finishFile(): Unit = {
    writer.close()
    // a trailing roll that never received a row would register an empty
    // file in the manifest (opened forever, prunable never) — drop it;
    // a genuinely empty TASK still commits its one empty file (the
    // pre-rolling contract, and what overwrite-to-empty relies on)
    if (rows == 0L && done.nonEmpty) {
      val fs = file.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(file)) fs.delete(file, false)
    } else done += ((file.toUri.getPath, rows, fileStats))
    java.util.Arrays.fill(mins.asInstanceOf[Array[AnyRef]], null)
    java.util.Arrays.fill(maxs.asInstanceOf[Array[AnyRef]], null)
    rows = 0L
  }

  override def write(record: InternalRow): Unit = {
    writer.write(record)
    rows += 1
    var j = 0
    while (j < tracked.length) {
      val (i, dt) = tracked(j)
      if (!record.isNullAt(i)) dt match {
        case StringType =>
          val v = record.getUTF8String(i).clone()
          if (mins(j) == null || v.compareTo(mins(j).asInstanceOf[UTF8String]) < 0) mins(j) = v
          if (maxs(j) == null || v.compareTo(maxs(j).asInstanceOf[UTF8String]) > 0) maxs(j) = v
        case LongType =>
          val v = record.getLong(i)
          if (mins(j) == null || v < mins(j).asInstanceOf[Long]) mins(j) = v
          if (maxs(j) == null || v > maxs(j).asInstanceOf[Long]) maxs(j) = v
        case IntegerType =>
          val v = record.getInt(i)
          if (mins(j) == null || v < mins(j).asInstanceOf[Int]) mins(j) = v
          if (maxs(j) == null || v > maxs(j).asInstanceOf[Int]) maxs(j) = v
        case _ => ()
      }
      j += 1
    }
    if (targetBytes.exists(t => writer.getDataSize >= t)) {
      finishFile()
      file = nextFile()
      writer = PqRow.open(schema, file)
    }
  }
  override def commit(): WriterCommitMessage = {
    finishFile()
    // a task that never rolled keeps the single-file message shape (the
    // streaming epoch path and batch-marker bookkeeping key on it)
    if (done.length == 1) {
      val (f, n, st) = done(0)
      CatalogCommitMessage(f, n, st)
    } else RolledCommitMessage(done.toSeq)
  }
  override def abort(): Unit = {
    writer.close()
    val conf = new org.apache.hadoop.conf.Configuration()
    (done.map(_._1) :+ file.toUri.getPath).foreach { f =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
  override def close(): Unit = ()
}

/** The VALUE-ROLLING writer for `PARTITIONED BY` tables: rows arrive
  * clustered + sorted by the source column ([[CatalogWrite]]'s required
  * distribution/ordering), and the writer starts a new data file whenever
  * the TRANSFORM value changes — so every emitted file is pinned to exactly
  * one transform value, the layout storage-partitioned joins and partition
  * pruning key on. Rolling is exact regardless of input order (an unsorted
  * run just fragments into more files, never a mixed one). NULL partition
  * values are refused loudly — a null key can't be pruned or join-grouped.
  */
final class CatalogPartitionedDataWriter(schema: StructType, root: String, table: String,
                                         stagingId: String, partitionId: Int, taskId: Long,
                                         spec: graft.spark.PartTransform,
                                         sessionTz: String = "UTC",
                                         targetBytes: Option[Long] = None)
    extends DataWriter[InternalRow] {
  import org.apache.hadoop.fs.Path

  private val colIdx = schema.fieldIndex(spec.col)
  private val colType = schema.fields(colIdx).dataType
  // days(ts): render internal micros in the WRITE SESSION's time zone —
  // the same zone the stats pass's date_format uses, so the pin, the
  // sidecar bounds, and the read path's literal replay all agree
  private lazy val tzFmt = java.time.format.DateTimeFormatter
    .ofPattern("yyyy-MM-dd HH:mm:ss").withZone(java.time.ZoneId.of(sessionTz))

  /** The row's raw column value in the SAME string form the stats sidecar
    * and the read path's literal replay use (CAST AS STRING semantics for
    * the supported key types; session-tz rendering for timestamps). */
  private def rawOf(r: InternalRow): String = {
    require(!r.isNullAt(colIdx),
      s"graft-catalog: NULL partition value in '${spec.col}' of table '$table' — " +
      "hidden partitioning needs a non-null key on every row")
    colType match {
      case StringType => r.getUTF8String(colIdx).toString
      case LongType => r.getLong(colIdx).toString
      case IntegerType => r.getInt(colIdx).toString
      case TimestampType =>
        val micros = r.getLong(colIdx)
        tzFmt.format(java.time.Instant.ofEpochSecond(
          Math.floorDiv(micros, 1000000L), Math.floorMod(micros, 1000000L) * 1000L))
      case other => throw new IllegalStateException(
        s"graft-catalog: unsupported partition column type $other")
    }
  }

  private var curVal: String = _
  private var curFile: Path = _
  private var curWriter: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var curRows = 0L
  private var fileNo = 0
  private val done = scala.collection.mutable.ArrayBuffer[(String, Long, String)]()

  private def roll(v: String): Unit = {
    closeCurrent()
    curVal = v
    curFile = new Path(root,
      f"$table/data/dsv2-$stagingId/part-$partitionId%05d-$taskId-$fileNo%04d.parquet")
    fileNo += 1
    curWriter = PqRow.open(schema, curFile)
    curRows = 0L
  }

  private def closeCurrent(): Unit = if (curWriter != null) {
    curWriter.close()
    // a byte-roll can leave a fresh zero-row writer at task end / value
    // change — drop it rather than pin an empty file into the manifest
    if (curRows == 0L) {
      val fs = curFile.getFileSystem(new org.apache.hadoop.conf.Configuration())
      if (fs.exists(curFile)) fs.delete(curFile, false)
    } else done += ((curFile.toUri.getPath, curRows, curVal))
    curWriter = null
  }

  override def write(record: InternalRow): Unit = {
    val v = spec.literal(rawOf(record))
    if (curWriter == null || v != curVal) roll(v)
    curWriter.write(record)
    curRows += 1
    // write.target-file-size inside a value pin: a 10⁹-row partition value
    // rolls into right-sized files that all carry the SAME pin — the
    // key-group scan's groupBy(pin) keeps SPJ intact across the roll
    if (targetBytes.exists(t => curWriter.getDataSize >= t)) roll(v)
  }

  override def commit(): WriterCommitMessage = {
    closeCurrent()
    PartitionedCommitMessage(done.toSeq)
  }

  override def abort(): Unit = {
    if (curWriter != null) { curWriter.close(); done += ((curFile.toUri.getPath, 0L, "")) }
    val conf = new org.apache.hadoop.conf.Configuration()
    done.foreach { case (f, _, _) =>
      val p = new Path(f)
      val fs = p.getFileSystem(conf)
      if (fs.exists(p)) fs.delete(p, false)
    }
  }
  override def close(): Unit = ()
}

// ----------------------------------------------------------------------
// ROW-LEVEL SQL DML (SupportsDelta) — UPDATE / MERGE INTO / arbitrary-
// predicate DELETE as Iceberg-style MERGE-ON-READ position deltas: each
// task streams its deleted rows' (file, ordinal) coordinates into a staged
// positional-tombstone file (O(1) task memory — the pairs never pass
// through the driver) and its replacement/inserted rows into a staged
// parquet file; the job commit renames the tombstones into the manifest
// dir and references them + one delta manifest in ONE atomic snapshot
// (ParquetSnapshotCatalog.commitRowDelta). Zero existing data rewritten,
// at any UPDATE/MERGE size.
// ----------------------------------------------------------------------

final case class DeltaCommitMessage(dataFile: Option[(String, Long)],
                                    deleteFile: Option[String],
                                    touched: Seq[String]) extends WriterCommitMessage

final class GraftDeltaWrite(dataSchema: StructType, rowId: StructType,
                            root: String, table: String)
    extends org.apache.spark.sql.connector.write.DeltaWrite {
  private val stagingId = java.util.UUID.randomUUID().toString.take(8)
  override def description(): String = s"GraftCatalogDeltaWrite(table=$table)"

  override def toBatch: org.apache.spark.sql.connector.write.DeltaBatchWrite =
    new org.apache.spark.sql.connector.write.DeltaBatchWrite {
      override def createBatchWriterFactory(info: PhysicalWriteInfo)
          : org.apache.spark.sql.connector.write.DeltaWriterFactory =
        new GraftDeltaWriterFactory(dataSchema, rowId, root, table, stagingId)
      override def commit(messages: Array[WriterCommitMessage]): Unit = {
        val ms = messages.collect { case m: DeltaCommitMessage => m }.toSeq
        val dels = ms.flatMap(_.deleteFile).sorted
        val datas = ms.flatMap(_.dataFile).sortBy(_._1)
        val touched = ms.flatMap(_.touched).distinct
        // a statement matching zero rows commits nothing (no empty snapshot)
        if (dels.nonEmpty || datas.nonEmpty)
          new ParquetSnapshotCatalog(root).commitRowDelta(table, dels, touched, datas)
      }
      override def abort(messages: Array[WriterCommitMessage]): Unit = {
        import org.apache.hadoop.fs.Path
        val conf = new org.apache.hadoop.conf.Configuration()
        messages.collect { case m: DeltaCommitMessage => m }
          .flatMap(m => m.dataFile.map(_._1) ++ m.deleteFile)
          .foreach { f =>
            val p = new Path(f)
            val fs = p.getFileSystem(conf)
            if (fs.exists(p)) fs.delete(p, false)
          }
      }
    }
}

final class GraftDeltaWriterFactory(dataSchema: StructType, rowId: StructType,
                                    root: String, table: String, stagingId: String)
    extends org.apache.spark.sql.connector.write.DeltaWriterFactory {
  override def createWriter(partitionId: Int, taskId: Long)
      : org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] =
    new GraftDeltaWriter(dataSchema, rowId, root, table, stagingId, partitionId, taskId)
}

/** Per-task delta writer: deletes stream straight to a staged tombstone tsv
  * (normalized + escaped exactly as the tombstone commit paths write them),
  * inserts to a staged parquet part file — both lazily created, so a task
  * that only deletes stages no parquet and vice versa. `touched` collects
  * the DISTINCT files this task tombstoned (O(files), not O(rows)) for the
  * commit-time conflict validation. With `representUpdateAsDeleteAndInsert`
  * the update path is split upstream; the direct `update` is kept correct
  * anyway (delete + insert).
  */
final class GraftDeltaWriter(dataSchema: StructType, rowId: StructType,
                             root: String, table: String, stagingId: String,
                             partitionId: Int, taskId: Long)
    extends org.apache.spark.sql.connector.write.DeltaWriter[InternalRow] {
  import org.apache.hadoop.fs.Path

  private val cat = new ParquetSnapshotCatalog(root)
  private val fileIdx = rowId.fieldIndex("_file")
  private val posIdx = rowId.fieldIndex("_pos")
  private val conf = new org.apache.hadoop.conf.Configuration()

  private val dataPath = new Path(root,
    f"$table/data/dsv2-$stagingId/part-$partitionId%05d-$taskId.parquet")
  private var dataWriter: org.apache.parquet.hadoop.ParquetWriter[InternalRow] = _
  private var rows = 0L

  private val delPath = new Path(root,
    f"$table/data/dsv2-$stagingId/del-$partitionId%05d-$taskId.tsv")
  private var delOut: java.io.Writer = _
  private val touched = scala.collection.mutable.LinkedHashSet.empty[String]

  override def delete(meta: InternalRow, id: InternalRow): Unit = {
    if (delOut == null)
      delOut = new java.io.BufferedWriter(new java.io.OutputStreamWriter(
        delPath.getFileSystem(conf).create(delPath, true),
        java.nio.charset.StandardCharsets.UTF_8))
    val f = id.getUTF8String(fileIdx).toString
    delOut.write(cat.posTombstoneLine(f, id.getLong(posIdx)))
    delOut.write('\n')
    touched += f
  }

  override def update(meta: InternalRow, id: InternalRow, row: InternalRow): Unit = {
    delete(meta, id); insert(row)
  }

  override def insert(row: InternalRow): Unit = {
    if (dataWriter == null) dataWriter = PqRow.open(dataSchema, dataPath)
    dataWriter.write(row)
    rows += 1
  }

  override def commit(): WriterCommitMessage = {
    if (dataWriter != null) dataWriter.close()
    if (delOut != null) delOut.close()
    DeltaCommitMessage(
      if (dataWriter != null) Some((dataPath.toUri.getPath, rows)) else None,
      if (delOut != null) Some(delPath.toUri.getPath) else None,
      touched.toSeq)
  }

  override def abort(): Unit = {
    if (dataWriter != null) dataWriter.close()
    if (delOut != null) delOut.close()
    val fs = dataPath.getFileSystem(conf)
    Seq(dataPath, delPath).foreach(p => if (fs.exists(p)) fs.delete(p, false))
  }

  override def close(): Unit = ()
}

/** Zero-column cardinality partition: `n` synthetic empty rows from the
  * `__count` sidecar metadata — no data file opened.
  */
final case class CatalogRowCountPartition(n: Long) extends InputPartition

/** One storage-partition: every file pinned to the SAME partition value,
  * read as a sequential chain. `partitionKey` is what lets Spark align two
  * scans' equal-keyed partitions without an exchange.
  */
final case class CatalogKeyGroupPartition(files: Seq[CatalogFilePartition], keyVal: Any)
    extends InputPartition with org.apache.spark.sql.connector.read.HasPartitionKey {
  override def partitionKey(): InternalRow = new GenericInternalRow(Array(keyVal))
}

final class CatalogReaderFactory(required: StructType,
                                 renames: Seq[(String, String)] = Nil,
                                 columnarOk: Boolean = false)
    extends PartitionReaderFactory {

  /** Columnar reads are an ALL-OR-NOTHING per-scan property (Spark refuses
    * mixed row/columnar partitions), so the decision is the factory-level
    * flag the scan computed from snapshot-immutable facts — never
    * per-partition state.
    */
  override def supportColumnarReads(partition: InputPartition): Boolean = columnarOk

  override def createColumnarReader(partition: InputPartition)
      : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] = {
    def one(p: CatalogFilePartition): CatalogVectorReader = {
      require(p.deletes.isEmpty && p.posDeletes.isEmpty && p.dv.isEmpty,
        s"graft-catalog: columnar read planned for a delete-carrying file ${p.file}")
      new CatalogVectorReader(p.file, required)
    }
    def chained(files: Seq[CatalogFilePartition])
        : PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] =
      new PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
        private val it = files.iterator
        private var cur: CatalogVectorReader = _
        override def next(): Boolean = {
          while (true) {
            if (cur == null) {
              if (!it.hasNext) return false
              cur = one(it.next())
            }
            if (cur.next()) return true
            cur.close(); cur = null
          }
          false
        }
        override def get(): org.apache.spark.sql.vectorized.ColumnarBatch = cur.get()
        override def close(): Unit = if (cur != null) cur.close()
      }
    partition match {
      case p: CatalogFilePartition => one(p)
      case g: CatalogFileGroupPartition => chained(g.files)
      case g: CatalogKeyGroupPartition => chained(g.files)
      case other => throw new IllegalStateException(
        s"graft-catalog: columnar read of non-file partition $other")
    }
  }

  override def createReader(partition: InputPartition): PartitionReader[InternalRow] =
    partition match {
      case CatalogRowCountPartition(n) => new PartitionReader[InternalRow] {
        private var left = n
        private val empty = new GenericInternalRow(0)
        override def next(): Boolean = if (left > 0) { left -= 1; true } else false
        override def get(): InternalRow = empty
        override def close(): Unit = ()
      }
      case p: CatalogFilePartition =>
        new CatalogPartitionReader(p.file, required, p.deletes, p.posDeletes, renames, p.dv)
      case g: CatalogKeyGroupPartition => chain(g.files)
      case g: CatalogFileGroupPartition => chain(g.files)
    }

  /** Sequential per-file chain — shared by key-grouped (SPJ) and bin-packed
    * partitions; each file keeps its own delete state and `_pos` ordinals.
    */
  private def chain(files: Seq[CatalogFilePartition]): PartitionReader[InternalRow] =
    new PartitionReader[InternalRow] {
      private val it = files.iterator
      private var cur: CatalogPartitionReader = _
      override def next(): Boolean = {
        while (true) {
          if (cur == null) {
            if (!it.hasNext) return false
            val p = it.next()
            cur = new CatalogPartitionReader(p.file, required, p.deletes, p.posDeletes, renames, p.dv)
          }
          if (cur.next()) return true
          cur.close(); cur = null
        }
        false
      }
      override def get(): InternalRow = cur.get()
      override def close(): Unit = if (cur != null) cur.close()
    }
}

/** Streams one parquet data file through parquet-hadoop's record reader
  * with the projection pushed down (only required ∪ delete-key columns are
  * decoded), applying the partition's equality deletes row-by-row — the
  * executor-side half of Iceberg's delete-file application. Supports the
  * atomic column types the catalog's page/document tables use (string,
  * binary, long, int, double, float, boolean, timestamp INT96/INT64, date);
  * nested/decimal columns fail loudly with the column name.
  */
object CatalogPartitionReader {
  /** Data files actually OPENED by this JVM's readers — the observable the
    * runtime-filter and metadata-only specs assert on (a pruned file must
    * never be opened; a metadata-answered query must open zero).
    */
  val opened = new java.util.concurrent.atomic.AtomicLong(0)
}

/** The COLUMNAR fast path: Spark's own `VectorizedParquetRecordReader`
  * (the engine's production parquet reader — batched column decoding into
  * `ColumnarBatch`, the same machinery `spark.read.parquet` runs) driving a
  * DSv2 columnar partition. Planned only when the snapshot carries no
  * deletes, no renames and no metadata columns — exactly the Iceberg rule
  * (vectorize clean scans, fall back to the row reader when row-level
  * semantics must apply). Schema evolution still works: the requested
  * schema rides the conf (`ParquetReadSupport` clips by name; a column the
  * file predates reads as a null vector).
  */
final class CatalogVectorReader(file: String, required: StructType)
    extends PartitionReader[org.apache.spark.sql.vectorized.ColumnarBatch] {
  CatalogPartitionReader.opened.incrementAndGet()
  import org.apache.hadoop.mapreduce.task.TaskAttemptContextImpl
  import org.apache.hadoop.mapreduce.{JobID, TaskAttemptID, TaskID, TaskType}

  private val conf = new org.apache.hadoop.conf.Configuration()
  conf.set("org.apache.spark.sql.parquet.row.requested_schema", required.json)
  conf.set("parquet.read.support.class",
    "org.apache.spark.sql.execution.datasources.parquet.ParquetReadSupport")
  // the schema converter / read support read these SQLConf keys from the
  // Hadoop conf WITHOUT defaults (Spark's own scan pre-seeds them the same
  // way); values = Spark's defaults for the session shapes this engine runs
  conf.set("spark.sql.parquet.binaryAsString", "false")
  conf.set("spark.sql.parquet.int96AsTimestamp", "true")
  conf.set("spark.sql.legacy.parquet.nanosAsLong", "false")
  conf.set("spark.sql.parquet.fieldId.read.enabled", "false")
  conf.set("spark.sql.parquet.inferTimestampNTZ.enabled", "true")
  conf.set("spark.sql.caseSensitive", "false")
  conf.set("spark.sql.session.timeZone", java.util.TimeZone.getDefault.getID)
  private val reader =
    new org.apache.spark.sql.execution.datasources.parquet.VectorizedParquetRecordReader(
      null, "CORRECTED", "UTC", "CORRECTED", "UTC", /*useOffHeap=*/ false, /*capacity=*/ 4096)
  // the base reader casts to the OLD-API split type (which extends the new)
  private val split = new org.apache.hadoop.mapred.FileSplit(
    new org.apache.hadoop.fs.Path(file), 0, Long.MaxValue, null: Array[String])
  reader.initialize(split, new TaskAttemptContextImpl(conf,
    new TaskAttemptID(new TaskID(new JobID(), TaskType.MAP, 0), 0)))
  reader.initBatch(new StructType(), new GenericInternalRow(0))
  reader.enableReturningBatches()

  override def next(): Boolean = reader.nextBatch()
  override def get(): org.apache.spark.sql.vectorized.ColumnarBatch =
    reader.getCurrentValue.asInstanceOf[org.apache.spark.sql.vectorized.ColumnarBatch]
  override def close(): Unit = reader.close()
}

final class CatalogPartitionReader(file: String, required: StructType,
                                   deletes: Seq[(String, Seq[String])],
                                   posDeletes: Seq[Long] = Nil,
                                   renames: Seq[(String, String)] = Nil,
                                   dv: Option[(String, Long, Int)] = None)
    extends PartitionReader[InternalRow] {
  CatalogPartitionReader.opened.incrementAndGet()
  import org.apache.parquet.hadoop.ParquetFileReader
  import org.apache.parquet.hadoop.util.HadoopInputFile
  import org.apache.parquet.io.ColumnIOFactory
  import org.apache.parquet.io.api.{Binary, Converter, GroupConverter, PrimitiveConverter, RecordMaterializer}
  import org.apache.parquet.schema.{MessageType, PrimitiveType, LogicalTypeAnnotation}
  import org.apache.hadoop.fs.Path

  private val conf = new org.apache.hadoop.conf.Configuration()
  private val reader = ParquetFileReader.open(HadoopInputFile.fromPath(new Path(file), conf))
  private val fileSchema = reader.getFooter.getFileMetaData.getSchema

  /** CURRENT-name → this file's physical field name, computed by replaying
    * the rename chain over the file's own fields — the per-file equivalent
    * of the catalog read path's `applyRenames` fold (the coalesce case
    * there is a merged-GROUP artifact; a single file never carries both
    * spellings of one column). A current name absent from the map is a
    * column this file predates (ADD-column evolution) — emitted as NULL,
    * matching `unionByName(allowMissingColumns)`.
    */
  private val physicalOf: Map[String, String] = {
    var cur: Map[String, String] = // physical -> current spelling
      (0 until fileSchema.getFieldCount)
        .map(i => fileSchema.getFieldName(i)).map(f => f -> f).toMap
    renames.foreach { case (o, n) =>
      if (!cur.values.exists(_ == n))
        cur = cur.map { case (p, c) => (p, if (c == o) n else c) }
    }
    cur.map(_.swap)
  }

  // projection = required columns ∪ delete-key columns (a pruned scan must
  // still decode the key column to apply the tombstones), resolved to the
  // file's physical names; columns the file predates simply don't project
  private val delCols = deletes.map(_._1).distinct
  private val projNames0 = (required.fieldNames.toSeq ++ delCols).distinct
    .flatMap(physicalOf.get).distinct
  // a pure-metadata projection (`SELECT _file, _pos`, a row-level DELETE's
  // scan) still needs one decoded column to drive record iteration
  private val projNames =
    if (projNames0.nonEmpty) projNames0 else Seq(fileSchema.getFieldName(0))

  // `_file`/`_pos` are SYNTHESIZED by the reader (SupportsMetadataColumns),
  // never decoded; a physical column of the same name wins, matching the
  // connector's metadata-conflict rule
  private val metaKind: Array[Int] = required.fields.map { f =>
    if (physicalOf.contains(f.name)) 0
    else f.name match { case "_file" => 1; case "_pos" => 2; case _ => 0 }
  }
  private val fileUtf8 = UTF8String.fromString(file)
  private val projection = new MessageType(fileSchema.getName,
    projNames.map(n => fileSchema.getType(fileSchema.getFieldIndex(n))): _*)
  reader.setRequestedSchema(projection)

  // a delete key column the file predates can never match (the row's key is
  // NULL under the anti-join) — skip it for this file
  private val delSets: Seq[(Int, Set[String])] = deletes.flatMap { case (c, keys) =>
    physicalOf.get(c).map(p => (projection.getFieldIndex(p), keys.toSet))
  }
  // output field -> (projection index, parquet primitive); None = the file
  // predates this column (always NULL)
  private val outFields: Array[Option[(Int, PrimitiveType, DataType)]] =
    required.fields.map { f =>
      physicalOf.get(f.name).map { p =>
        val idx = projection.getFieldIndex(p)
        val t = projection.getType(idx)
        require(t.isPrimitive, s"graft-catalog reader: column '${f.name}' is nested " +
          "(group type); only atomic columns are supported")
        (idx, t.asPrimitiveType(), f.dataType)
      }
    }

  // positional tombstones for THIS file: the running record count below is
  // exactly `_metadata.row_index` (row groups stream in file order)
  private val posSet: Set[Long] = posDeletes.toSet
  // THIS file's deletion vector, range-read once per task from the
  // snapshot's dv blob — the O(bitmap) task cost that replaces O(deleted
  // rows) driver planning
  private val dvBitmap: org.roaringbitmap.RoaringBitmap =
    dv.map { case (p, off, len) => graft.spark.DeletionVectors.load(p, off, len) }.orNull
  private def dvDeleted(ord: Long): Boolean =
    dvBitmap != null && ord <= Int.MaxValue && dvBitmap.contains(ord.toInt)
  private var ordinal: Long = -1L

  /** Direct-to-typed-slots record materialization — the per-row
    * `SimpleGroup` (one object + per-field list + boxed value each) that the
    * example `GroupRecordConverter` allocates is the read path's dominant
    * garbage at scale, so values land straight in one long slot (fixed-width
    * types, floating bits raw) or one ref slot (byte[] for BINARY/INT96)
    * per projected field; dictionary-encoded binary pages decode each
    * dictionary entry ONCE and share the byte[] across rows (immutable —
    * output wraps, never mutates).
    */
  private final class Slots extends RecordMaterializer[InternalRow] {
    val n = projection.getFieldCount
    val longs = new Array[Long](n)
    val refs = new Array[AnyRef](n)
    val nulls = new Array[Boolean](n)
    private val marker: InternalRow = new GenericInternalRow(0)
    private val root: GroupConverter = new GroupConverter {
      private val convs: Array[Converter] = Array.tabulate(n) { i =>
        import PrimitiveType.PrimitiveTypeName._
        projection.getType(i).asPrimitiveType().getPrimitiveTypeName match {
          case BINARY | FIXED_LEN_BYTE_ARRAY | INT96 => new PrimitiveConverter {
            private var dict: Array[Array[Byte]] = _
            override def addBinary(b: Binary): Unit = { refs(i) = b.getBytes; nulls(i) = false }
            override def hasDictionarySupport: Boolean = true
            override def setDictionary(d: org.apache.parquet.column.Dictionary): Unit =
              dict = Array.tabulate(d.getMaxId + 1)(k => d.decodeToBinary(k).getBytes)
            override def addValueFromDictionary(id: Int): Unit = {
              refs(i) = dict(id); nulls(i) = false
            }
          }
          case INT64 => new PrimitiveConverter {
            override def addLong(v: Long): Unit = { longs(i) = v; nulls(i) = false }
          }
          case INT32 => new PrimitiveConverter {
            override def addInt(v: Int): Unit = { longs(i) = v; nulls(i) = false }
          }
          case DOUBLE => new PrimitiveConverter {
            override def addDouble(v: Double): Unit = {
              longs(i) = java.lang.Double.doubleToRawLongBits(v); nulls(i) = false
            }
          }
          case FLOAT => new PrimitiveConverter {
            override def addFloat(v: Float): Unit = {
              longs(i) = java.lang.Float.floatToRawIntBits(v).toLong; nulls(i) = false
            }
          }
          case BOOLEAN => new PrimitiveConverter {
            override def addBoolean(v: Boolean): Unit = {
              longs(i) = if (v) 1L else 0L; nulls(i) = false
            }
          }
          case other => throw new IllegalStateException(
            s"graft-catalog reader: unsupported parquet primitive $other in $file")
        }
      }
      override def getConverter(i: Int): Converter = convs(i)
      override def start(): Unit = java.util.Arrays.fill(nulls, true)
      override def end(): Unit = ()
    }
    override def getRootConverter: GroupConverter = root
    override def getCurrentRecord: InternalRow = marker
  }

  private val slots = new Slots
  private var recordReader: org.apache.parquet.io.RecordReader[InternalRow] = _
  private var rowsLeft: Long = 0L

  private def nextRowGroup(): Boolean = {
    val pages = reader.readNextRowGroup()
    if (pages == null) false
    else {
      val columnIO = new ColumnIOFactory().getColumnIO(projection)
      recordReader = columnIO.getRecordReader(pages, slots)
      rowsLeft = pages.getRowCount
      true
    }
  }

  /** `CAST(column AS STRING)` replay for delete matching (string/long/int —
    * gated at planning). A null key column never matches (anti-join keeps
    * the row).
    */
  private def deleted(): Boolean = delSets.exists { case (idx, keys) =>
    !slots.nulls(idx) && {
      val prim = projection.getType(idx).asPrimitiveType()
      val s = prim.getPrimitiveTypeName match {
        case PrimitiveType.PrimitiveTypeName.BINARY =>
          UTF8String.fromBytes(slots.refs(idx).asInstanceOf[Array[Byte]]).toString
        case PrimitiveType.PrimitiveTypeName.INT64 => slots.longs(idx).toString
        case PrimitiveType.PrimitiveTypeName.INT32 => slots.longs(idx).toString
        case other => throw new IllegalStateException(s"undeletable primitive $other")
      }
      keys.contains(s)
    }
  }

  override def next(): Boolean = {
    while (true) {
      if (rowsLeft == 0L && !nextRowGroup()) return false
      while (rowsLeft > 0L) {
        val g = recordReader.read()
        rowsLeft -= 1
        ordinal += 1
        if (g != null && !posSet.contains(ordinal) && !dvDeleted(ordinal) && !deleted()) return true
      }
    }
    false
  }

  private val JULIAN_EPOCH_DAY = 2440588L // 1970-01-01 as a julian day

  override def get(): InternalRow = {
    val row = new GenericInternalRow(required.length)
    var i = 0
    while (i < outFields.length) {
      if (metaKind(i) == 1) { row.update(i, fileUtf8); i += 1 }
      else if (metaKind(i) == 2) { row.setLong(i, ordinal); i += 1 }
      else if (outFields(i).isEmpty) { row.setNullAt(i); i += 1 }
      else {
      val (idx, prim, dt) = outFields(i).get
      if (slots.nulls(idx)) row.setNullAt(i)
      else {
        import PrimitiveType.PrimitiveTypeName._
        (dt, prim.getPrimitiveTypeName) match {
          case (StringType, BINARY) => // wrap, never copy — slot bytes are per-row or immutable dict entries
            row.update(i, UTF8String.fromBytes(slots.refs(idx).asInstanceOf[Array[Byte]]))
          case (BinaryType, BINARY | FIXED_LEN_BYTE_ARRAY) =>
            row.update(i, slots.refs(idx))
          case (LongType, INT64) => row.setLong(i, slots.longs(idx))
          case (IntegerType | DateType, INT32) => row.setInt(i, slots.longs(idx).toInt)
          case (LongType, INT32) => row.setLong(i, slots.longs(idx))
          case (DoubleType, DOUBLE) =>
            row.setDouble(i, java.lang.Double.longBitsToDouble(slots.longs(idx)))
          case (FloatType, FLOAT) =>
            row.setFloat(i, java.lang.Float.intBitsToFloat(slots.longs(idx).toInt))
          case (BooleanType, BOOLEAN) => row.setBoolean(i, slots.longs(idx) != 0L)
          case (TimestampType, INT96) =>
            // spark's default parquet timestamp: 8B little-endian nanos-of-
            // day + 4B little-endian julian day
            val buf = java.nio.ByteBuffer.wrap(slots.refs(idx).asInstanceOf[Array[Byte]])
              .order(java.nio.ByteOrder.LITTLE_ENDIAN)
            val nanos = buf.getLong; val jday = buf.getInt
            row.setLong(i, (jday - JULIAN_EPOCH_DAY) * 86400000000L + nanos / 1000L)
          case (TimestampType, INT64) =>
            val micros = prim.getLogicalTypeAnnotation match {
              case ts: LogicalTypeAnnotation.TimestampLogicalTypeAnnotation
                  if ts.getUnit == LogicalTypeAnnotation.TimeUnit.MILLIS =>
                slots.longs(idx) * 1000L
              case _ => slots.longs(idx) // micros (spark's INT64 output)
            }
            row.setLong(i, micros)
          case (d, p) => throw new IllegalStateException(
            s"graft-catalog reader: unsupported column type $d / parquet $p " +
            s"for field '${required.fields(i).name}' in $file")
        }
      }
      i += 1
      }
    }
    row
  }

  override def close(): Unit = reader.close()
}
