package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{SparkSession, SparkSessionExtensions}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.parser.ParserInterface
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan}
import org.apache.spark.sql.execution.{LeafExecNode, SparkPlan, SparkStrategy}
import org.apache.spark.sql.types.{DataType, StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

import graft.spark.ParquetSnapshotCatalog

/** SQL `CALL` maintenance procedures (the Iceberg stored-procedure shape),
  * as the full Catalyst extension ladder: a delegating PARSER that turns
  * `CALL <catalog>.<proc>(...)` into the custom LOGICAL command [[GraftCall]],
  * an injected PLANNER STRATEGY mapping it to the custom PHYSICAL node
  * [[GraftCallExec]], and eager command execution through Spark's own
  * Command mechanics — so every catalog maintenance operation is drivable
  * from pure SQL:
  *
  *   CALL gsql.compact('pages')            -- bin-pack rewrite
  *   CALL gsql.compact_sorted('pages')     -- stats/bloom-preserving rewrite
  *   CALL gsql.expire_snapshots('pages', 3)
  *   CALL gsql.rollback('pages', 7)
  *   CALL gsql.tag('pages', 'audit', 7) / CALL gsql.drop_tag('pages', 'audit')
  *   CALL gsql.remove_orphans('pages')
  *   CALL gsql.rewrite_manifests('pages')
  *   CALL gsql.evolve_spec('pages', 'truncate(2,lang)')  -- spec evolution
  *   CALL gsql.zorder('pages', 'doc_id', 'ts', 16)       -- Morton rewrite
  *
  * Registration: `spark.sql.extensions=graft.sources.GraftSqlExtensions`
  * (composes with `graft.functions.GraftExtensions` — list both). Catalog
  * resolution goes through the session's catalog manager, so the procedure
  * operates on exactly the table the SQL name resolves to. Anything that is
  * not a `CALL <ident>.<ident>(...)` statement is delegated to Spark's
  * parser untouched.
  */
class GraftSqlExtensions extends (SparkSessionExtensions => Unit) {
  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectParser((s, delegate) => new GraftSqlParser(s, delegate))
    ext.injectPlannerStrategy(_ => GraftCallStrategy)
    ext.injectResolutionRule(s => ResolveGraftViews(s))
  }
}

/** The logical CALL command: output = (k, v) string pairs (the procedure's
  * report). A `Command`, so `spark.sql("CALL ...")` executes EAGERLY like
  * any DDL statement.
  */
final case class GraftCall(catalog: String, proc: String, args: Seq[String])
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("k", StringType, nullable = false)(),
    AttributeReference("v", StringType, nullable = false)())
}

final class GraftSqlParser(session: SparkSession, delegate: ParserInterface)
    extends ParserInterface {
  // CALL <catalog>.<proc>(<scalar args>) — intercepted unconditionally
  private val Call =
    """(?is)\s*CALL\s+([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*\((.*)\)\s*;?\s*""".r
  // view DDL — intercepted ONLY when the 2-part identifier's catalog is
  // configured as a GraftCatalog in this session (a session-catalog
  // `CREATE VIEW db.v` must reach Spark's own command untouched)
  private val CreateView =
    """(?is)\s*CREATE\s+(OR\s+REPLACE\s+)?VIEW\s+([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s+AS\s+(.+?)\s*;?\s*""".r
  private val DropView =
    """(?is)\s*DROP\s+VIEW\s+(IF\s+EXISTS\s+)?([A-Za-z_]\w*)\s*\.\s*([A-Za-z_]\w*)\s*;?\s*""".r
  private val ShowViews =
    """(?is)\s*SHOW\s+VIEWS\s+(?:IN|FROM)\s+([A-Za-z_]\w*)\s*;?\s*""".r

  private def mine(cat: String): Boolean = GraftViews.isGraftCatalog(session, cat)

  override def parsePlan(text: String): LogicalPlan = text match {
    case Call(cat, proc, argStr) =>
      // comma split OUTSIDE quotes only — 'truncate(2,lang)' is ONE arg
      val args = if (argStr.trim.isEmpty) Seq.empty[String] else {
        val out = Seq.newBuilder[String]
        val cur = new StringBuilder
        var inQ = false
        argStr.foreach {
          case '\'' => inQ = !inQ
          case ',' if !inQ => out += cur.result().trim; cur.clear()
          case c => cur += c
        }
        out += cur.result().trim
        out.result()
      }
      GraftCall(cat, proc.toLowerCase(java.util.Locale.ROOT), args)
    case CreateView(replace, cat, view, query) if mine(cat) =>
      GraftCreateView(cat, view, query, replace != null)
    case DropView(ifExists, cat, view) if mine(cat) =>
      GraftDropView(cat, view, ifExists != null)
    case ShowViews(cat) if mine(cat) =>
      GraftShowViews(cat)
    case _ => delegate.parsePlan(text)
  }
  override def parseExpression(s: String) = delegate.parseExpression(s)
  override def parseTableIdentifier(s: String) = delegate.parseTableIdentifier(s)
  override def parseFunctionIdentifier(s: String) = delegate.parseFunctionIdentifier(s)
  override def parseMultipartIdentifier(s: String) = delegate.parseMultipartIdentifier(s)
  override def parseQuery(s: String) = delegate.parseQuery(s)
  override def parseRoutineParam(s: String) = delegate.parseRoutineParam(s)
  override def parseDataType(s: String): DataType = delegate.parseDataType(s)
  override def parseTableSchema(s: String): StructType = delegate.parseTableSchema(s)
}

object GraftCallStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case c: GraftCall => GraftCallExec(c) :: Nil
    case c: GraftCreateView => GraftCreateViewExec(c) :: Nil
    case c: GraftDropView => GraftDropViewExec(c) :: Nil
    case c: GraftShowViews => GraftShowViewsExec(c) :: Nil
    case _ => Nil
  }
}

/** Driver-side execution of the procedure against the named [[GraftCatalog]]
  * (resolved through the session's catalog manager), reporting (k, v) rows.
  */
final case class GraftCallExec(call: GraftCall) extends LeafExecNode {
  override def output: Seq[Attribute] = call.output

  private def rows(): Seq[(String, String)] = {
    val spark = session
    val plugin = spark.sessionState.catalogManager.catalog(call.catalog)
    val g = plugin match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"CALL: catalog '${call.catalog}' is ${other.getClass.getName}, not a graft catalog")
    }
    val cat = new ParquetSnapshotCatalog(g.rootPath)
    def str(i: Int): String = call.args.lift(i).getOrElse(throw new IllegalArgumentException(
      s"CALL ${call.proc}: missing argument ${i + 1}"))
    def num(i: Int): Long = str(i).toLongOption.getOrElse(throw new IllegalArgumentException(
      s"CALL ${call.proc}: argument ${i + 1} must be a number, got '${str(i)}'"))
    call.proc match {
      case "compact" =>
        val target = call.args.lift(1).map(_.toLong << 20).getOrElse(128L << 20)
        Seq(("snapshot", cat.compact(spark, str(0), target).toString))
      case "compact_small" =>
        // incremental bin-pack: merge only undersized files (optional
        // target size in MB), large files untouched
        val target = call.args.lift(1).map(_.toLong << 20).getOrElse(128L << 20)
        Seq(("snapshot", cat.compactSmallFiles(spark, str(0), target).toString))
      case "compact_sorted" =>
        val sortCols = call.args.drop(1)
        Seq(("snapshot", cat.compactSorted(spark, str(0), sortCols).toString))
      case "expire_snapshots" =>
        cat.expireSnapshots(str(0), num(1).toInt).map(s => ("expired", s.toString))
      case "rollback" =>
        cat.rollbackTo(str(0), num(1))
        Seq(("current", num(1).toString))
      case "tag" =>
        cat.tagSnapshot(str(0), str(1), num(2))
        Seq(("tag", str(1)))
      case "drop_tag" =>
        cat.dropTag(str(0), str(1))
        Seq(("dropped", str(1)))
      case "remove_orphans" =>
        val grace = call.args.lift(1).map(_.toLong).getOrElse(3L * 24 * 3600 * 1000)
        cat.removeOrphanFiles(str(0), grace).map(f => ("removed", f))
      case "rewrite_manifests" =>
        Seq(("snapshot", cat.rewriteManifests(str(0)).toString))
      case "rewrite_position_deletes" =>
        Seq(("snapshot", cat.rewritePositionDeletes(str(0)).toString))
      case "evolve_spec" =>
        cat.evolveSpec(str(0), graft.spark.PartTransform.parse(str(1)))
        Seq(("spec", str(1)))
      case "zorder" =>
        val cols = call.args.drop(1).filter(_.toLongOption.isEmpty)
        val n = call.args.drop(1).flatMap(_.toLongOption).headOption.map(_.toInt).getOrElse(0)
        Seq(("snapshot", cat.compactZOrder(spark, str(0), cols, nFiles = n).toString))
      case "cherrypick" =>
        // arg 2 is a snapshot id, or a branch name whose head gets picked
        // (the common WAP-after-divergence publish)
        val snap = str(1).toLongOption.getOrElse(
          cat.branchHead(str(0), str(1)).getOrElse(throw new IllegalArgumentException(
            s"CALL cherrypick: '${str(1)}' is neither a snapshot id nor a branch of '${str(0)}'")))
        Seq(("snapshot", cat.cherryPick(str(0), snap).toString))
      case "create_mv" =>
        // create_mv(source, view, 'g1,g2'[, 's1,s2'[, 'm1,m2'[, 'd1,d2']]])
        // — materialize a count+sum(+max)(+approx-distinct) rollup; the
        // quote-aware arg parser keeps each comma-separated list one arg
        def cols(i: Int) = call.args.lift(i)
          .map(_.split(',').map(_.trim).filter(_.nonEmpty).toSeq)
          .getOrElse(Seq.empty)
        Seq(("snapshot", graft.spark.MaterializedView
          .create(spark, cat, str(0), str(1),
            str(2).split(',').map(_.trim).filter(_.nonEmpty).toSeq,
            cols(3), cols(4), cols(5)).toString))
      case "refresh_mv" =>
        val r = graft.spark.MaterializedView.refresh(spark, cat, str(0))
        Seq(("mode", r.mode), ("from", r.fromSnap.toString),
          ("to", r.toSnap.toString), ("snapshot", r.viewSnap.toString))
      case other => throw new IllegalArgumentException(
        s"CALL: unknown procedure '$other' (compact, compact_sorted, expire_snapshots, " +
        "rollback, tag, drop_tag, remove_orphans, rewrite_manifests, " +
        "rewrite_position_deletes, evolve_spec, zorder, cherrypick, " +
        "create_mv, refresh_mv)")
    }
  }

  override protected def doExecute(): RDD[InternalRow] = {
    val out = rows().map { case (k, v) =>
      new GenericInternalRow(Array[Any](
        UTF8String.fromString(k), UTF8String.fromString(v))): InternalRow
    }
    val outSchema = org.apache.spark.sql.types.StructType(
      output.map(a => org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    // downstream collect paths require UnsafeRow
    sparkContext.parallelize(out, 1).mapPartitions { it =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(outSchema)
      it.map(r => proj(r).copy(): InternalRow)
    }
  }
}
