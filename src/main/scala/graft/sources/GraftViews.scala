package graft.sources

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{AnalysisException, SparkSession}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference, GenericInternalRow}
import org.apache.spark.sql.catalyst.plans.logical.{Command, LeafNode, LogicalPlan, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.LeafExecNode
import org.apache.spark.sql.types.{StringType, StructType}
import org.apache.spark.unsafe.types.UTF8String

/** SQL VIEWS over the graft catalog — the Iceberg-views shape. OSS Spark 4.x
  * ships the `ViewCatalog` connector API but NO engine wiring (nothing in
  * catalyst calls `loadView`; `CREATE VIEW <cat>.<v>` still routes to the v1
  * session catalog), so — exactly like Iceberg's
  * `IcebergSparkSessionExtensions` — view DDL and read-side resolution ride
  * the session-extension ladder:
  *
  *   - the delegating parser intercepts `CREATE [OR REPLACE] VIEW cat.v AS
  *     <query>`, `DROP VIEW [IF EXISTS] cat.v` and `SHOW VIEWS IN cat`
  *     ONLY when `cat` is configured as a [[GraftCatalog]] in the active
  *     session (everything else delegates to Spark untouched);
  *   - an injected resolution rule ([[ResolveGraftViews]]) expands a view
  *     reference into its stored SQL during analysis — recursively, with an
  *     explicit seen-set so view-over-view works and cycles fail loudly
  *     instead of hanging the fixed-point analyzer.
  *
  * Storage is METADATA-ONLY and atomic: one `meta.view.<name>` KV (JSON:
  * sql text + create-time schema + properties) under the catalog's reserved
  * `__views__` metadata directory, written with the same atomic-swap
  * primitive every other catalog pointer uses. At 100 TB a view costs
  * exactly one small file; reads re-analyze the stored SQL against the
  * CURRENT table state (Spark's `schema evolution` binding mode — the
  * create-time schema is recorded for inspection, never enforced).
  *
  * Contract notes (documented, spec-pinned):
  *   - table references INSIDE a view body should be catalog-qualified
  *     (`gsql.t`); unqualified names resolve in the READER's context, the
  *     same trap Spark temp views have;
  *   - a view may reference other graft views (cycles refuse);
  *   - names are namespace-flat like the catalog's tables; a view cannot
  *     shadow a table (CREATE refuses both directions).
  */
object GraftViews {
  /** Reserved metadata directory holding view KVs (filtered from
    * SHOW TABLES; `createTable` refuses the `__` prefix).
    */
  private[sources] val Dir = "__views__"

  private def mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  /** Unquoted SQL identifiers are case-insensitive — views store and
    * resolve lowercase (the regex-grammar DDL has no quoted form).
    */
  private[sources] def key(name: String): String =
    s"view.${name.toLowerCase(java.util.Locale.ROOT)}"

  /** Encode a view record. `schemaJson` is the create-time analyzed schema
    * (inspection only — resolution re-analyzes).
    */
  private[sources] def encode(sql: String, schemaJson: String,
                              props: Map[String, String]): String = {
    val m = new java.util.LinkedHashMap[String, Object]()
    m.put("sql", sql)
    m.put("schema", schemaJson)
    val pm = new java.util.LinkedHashMap[String, String]()
    props.foreach { case (k, v) => pm.put(k, v) }
    m.put("properties", pm)
    mapper.writeValueAsString(m)
  }

  private[sources] def decode(js: String): (String, String, Map[String, String]) = {
    val n = mapper.readTree(js)
    val props = Option(n.get("properties")).map { p =>
      val b = Map.newBuilder[String, String]
      p.properties().forEach(e => b += (e.getKey -> e.getValue.asText()))
      b.result()
    }.getOrElse(Map.empty[String, String])
    (n.get("sql").asText(), n.get("schema").asText(), props)
  }

  /** Is `name` configured as a graft catalog in the active session? The
    * parse-time gate — interception must not swallow statements aimed at
    * the session catalog or other plugins.
    */
  private[sources] def isGraftCatalog(spark: SparkSession, name: String): Boolean =
    spark.conf.getOption(s"spark.sql.catalog.$name")
      .contains(classOf[GraftCatalog].getName)

  private[sources] def graftCat(spark: SparkSession, name: String): GraftCatalog =
    spark.sessionState.catalogManager.catalog(name) match {
      case g: GraftCatalog => g
      case other => throw new IllegalArgumentException(
        s"'$name' is ${other.getClass.getName}, not a graft catalog")
    }
}

/** Logical CREATE [OR REPLACE] VIEW — a Command, executes eagerly. */
final case class GraftCreateView(catalog: String, view: String, query: String,
                                 replace: Boolean)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("view", StringType, nullable = false)())
}

/** Logical DROP VIEW [IF EXISTS]. */
final case class GraftDropView(catalog: String, view: String, ifExists: Boolean)
    extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("dropped", StringType, nullable = false)())
}

/** Logical SHOW VIEWS IN cat. */
final case class GraftShowViews(catalog: String) extends LeafNode with Command {
  override def output: Seq[Attribute] = Seq(
    AttributeReference("namespace", StringType, nullable = false)(),
    AttributeReference("viewName", StringType, nullable = false)())
}

private[sources] abstract class GraftViewExecBase extends LeafExecNode {
  protected def rows(): Seq[Seq[String]]
  override protected def doExecute(): RDD[InternalRow] = {
    val out = rows().map { vs =>
      new GenericInternalRow(vs.map(UTF8String.fromString(_): Any).toArray): InternalRow
    }
    val outSchema = StructType(output.map(a =>
      org.apache.spark.sql.types.StructField(a.name, a.dataType, a.nullable)))
    sparkContext.parallelize(out, 1).mapPartitions { it =>
      val proj = org.apache.spark.sql.catalyst.expressions.UnsafeProjection.create(outSchema)
      it.map(r => proj(r).copy(): InternalRow)
    }
  }
}

final case class GraftCreateViewExec(c: GraftCreateView) extends GraftViewExecBase {
  override def output: Seq[Attribute] = c.output
  override protected def rows(): Seq[Seq[String]] = {
    val spark = session
    val g = GraftViews.graftCat(spark, c.catalog)
    val cat = new graft.spark.ParquetSnapshotCatalog(g.rootPath)
    require(c.view.matches("[A-Za-z_][A-Za-z0-9_]*"),
      s"CREATE VIEW: unsupported view name '${c.view}'")
    if (g.tableExists(org.apache.spark.sql.connector.catalog.Identifier.of(
          Array.empty[String], c.view)))
      throw new AnalysisException(
        errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS",
        messageParameters = Map("relationName" -> s"${c.catalog}.${c.view}"))
    if (!c.replace && cat.getMeta(GraftViews.Dir, GraftViews.key(c.view)).isDefined)
      throw new AnalysisException(
        errorClass = "TABLE_OR_VIEW_ALREADY_EXISTS",
        messageParameters = Map("relationName" -> s"${c.catalog}.${c.view}"))
    // analyze (not execute) the body now: catches bad SQL at CREATE time and
    // captures the create-time schema for inspection
    val analyzed = spark.sql(c.query)
    cat.putMeta(GraftViews.Dir, GraftViews.key(c.view),
      GraftViews.encode(c.query, analyzed.schema.json, Map.empty))
    Seq(Seq(s"${c.catalog}.${c.view}"))
  }
}

final case class GraftDropViewExec(c: GraftDropView) extends GraftViewExecBase {
  override def output: Seq[Attribute] = c.output
  override protected def rows(): Seq[Seq[String]] = {
    val g = GraftViews.graftCat(session, c.catalog)
    val cat = new graft.spark.ParquetSnapshotCatalog(g.rootPath)
    val exists = cat.getMeta(GraftViews.Dir, GraftViews.key(c.view)).isDefined
    if (!exists && !c.ifExists)
      throw new AnalysisException(
        errorClass = "TABLE_OR_VIEW_NOT_FOUND",
        messageParameters = Map("relationName" -> s"`${c.catalog}`.`${c.view}`"))
    if (exists) cat.removeMeta(GraftViews.Dir, GraftViews.key(c.view))
    Seq(Seq(if (exists) c.view else ""))
  }
}

final case class GraftShowViewsExec(c: GraftShowViews) extends GraftViewExecBase {
  override def output: Seq[Attribute] = c.output
  override protected def rows(): Seq[Seq[String]] = {
    val g = GraftViews.graftCat(session, c.catalog)
    val cat = new graft.spark.ParquetSnapshotCatalog(g.rootPath)
    cat.listMeta(GraftViews.Dir, "view.")
      .map(_._1.stripPrefix("view."))
      .map(v => Seq("default", v))
  }
}

/** Injected resolution rule: a 2-part `UnresolvedRelation` naming a stored
  * view of a graft catalog expands into its parsed SQL, aliased under the
  * view name. Expansion recurses through nested view references with an
  * explicit seen-set — `CREATE VIEW b AS SELECT * FROM gsql.a` works, and a
  * cycle (`a` → `b` → `a`) refuses with the path instead of spinning the
  * fixed-point analyzer.
  */
final case class ResolveGraftViews(spark: SparkSession) extends Rule[LogicalPlan] {

  private def viewSql(cat: String, name: String): Option[String] = {
    if (!GraftViews.isGraftCatalog(spark, cat)) return None
    val g = GraftViews.graftCat(spark, cat)
    new graft.spark.ParquetSnapshotCatalog(g.rootPath)
      .getMeta(GraftViews.Dir, GraftViews.key(name))
      .map(js => GraftViews.decode(js)._1)
  }

  private def expand(plan: LogicalPlan, seen: List[String]): LogicalPlan =
    plan.resolveOperatorsUp {
      case u @ UnresolvedRelation(Seq(cat, name), _, _) =>
        viewSql(cat, name) match {
          case Some(sql) =>
            val ref = s"$cat.${name.toLowerCase(java.util.Locale.ROOT)}"
            if (seen.contains(ref)) throw new AnalysisException(
              errorClass = "RECURSIVE_VIEW",
              messageParameters = Map(
                "viewIdent" -> ref,
                "newPath" -> (seen.reverse :+ ref).mkString(" -> ")))
            val body = spark.sessionState.sqlParser.parsePlan(sql)
            SubqueryAlias(Seq(cat, name), expand(body, ref :: seen))
          case None => u
        }
    }

  override def apply(plan: LogicalPlan): LogicalPlan = plan match {
    // never rewrite inside our own DDL commands
    case _: GraftCreateView | _: GraftDropView | _: GraftShowViews => plan
    case _ => expand(plan, Nil)
  }
}
