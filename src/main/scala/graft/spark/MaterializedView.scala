package graft.spark

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Incrementally-maintained materialized aggregate views over snapshot-
  * catalog tables — the warehouse feature whose whole point is 100 TB:
  * a grouped COUNT/SUM rollup (`SELECT g…, count(*), sum(c)… GROUP BY g…`)
  * kept current at **O(changed data)** refresh cost instead of re-scanning
  * the table (Iceberg/Snowflake incremental-refresh shape; the
  * self-maintainable-view theory is Gupta & Mumick, "Maintenance of
  * Materialized Views", IEEE DE Bulletin 1995 — COUNT and SUM are exactly
  * the aggregates maintainable from insert/delete deltas alone).
  *
  * Mechanics: the view is itself a catalog table (time-travelable,
  * compactable, readable by anything that reads tables). Each refresh pulls
  * the source's net-change CDC window via [[PageCatalog.readChangelog]] —
  * op='insert' rows weight +1, op='delete' pre-images weight −1 — and folds
  * the weighted delta aggregate into the stored state with one null-safe
  * full-outer merge keyed on the group columns. Groups whose maintained
  * count reaches 0 are dropped (bit-identical to recomputation: a group
  * with no rows does not appear). SUM is pinned to BIGINT inputs with
  * `COALESCE(SUM(x), 0)` semantics on both the build and merge paths — the
  * repo-wide integer-determinism contract (float sums are order-dependent
  * and could never match an oracle). MIN needs no machinery of its own:
  * `min(v) == -max(-v)` for integers, so maintain MAX over a negated
  * column and negate on read (spec-pinned; same insert-only maintenance
  * and delete-rebuild rule).
  *
  * Cost shape at scale: the insert side of the window is O(delta) planning
  * + O(drop) data by [[PageCatalog.readIncremental]]'s construction; the
  * delete side reads only fromSnap files whose zone maps overlap the
  * tombstone key range (all of fromSnap when no stats sidecar exists —
  * conservative, never wrong); the merge shuffles O(|view| + |delta|) rows
  * — group cardinality, not table rows. The source is NEVER re-scanned on
  * the incremental path (spec-proven by physically deleting pre-window
  * data files before a refresh).
  *
  * Fallback contract (degrade-never-wrong): any window the changelog
  * refuses — compaction/expiry/rollback rewrote the entry list, or the
  * window carries positional deletes, which have no key representation —
  * triggers a FULL recompute from the current snapshot (`mode="rebuild"`).
  * A refresh that crashed between committing the new state and advancing
  * the watermark leaves the view's current snapshot without a recorded
  * source watermark; the next refresh detects that and rebuilds (the state
  * is complete for *some* snapshot, but which one is unknowable — so the
  * recovery recomputes rather than guessing). Refreshers are single-writer
  * per view (the same one-lineage contract as streaming's batch ids).
  *
  * Watermark bookkeeping: `meta.mv.src.<viewSnap>` records which source
  * snapshot the view's snapshot `viewSnap` reflects; the view spec
  * (source table, group columns, sum columns) is pinned at create time
  * under `meta.mv.spec` and refresh re-derives everything from it — a
  * caller cannot silently refresh with a different shape.
  */
object MaterializedView {

  /** What a refresh did: `mode` ∈ noop | incremental | rebuild. */
  case class RefreshResult(mode: String, fromSnap: Long, toSnap: Long, viewSnap: Long)

  private val SpecKey = "mv.spec"
  private def srcKey(viewSnap: Long) = s"mv.src.$viewSnap"

  private def specStr(source: String, groupCols: Seq[String], sumCols: Seq[String],
                      maxCols: Seq[String], distinctCols: Seq[String]) = {
    val all = source +: (groupCols ++ sumCols ++ maxCols ++ distinctCols)
    require(all.forall(_.matches("[A-Za-z0-9._-]+")),
      s"unsupported name in MV spec (letters/digits/._- only): ${all.mkString(", ")}")
    require(groupCols.nonEmpty, "MV needs at least one group column")
    s"$source|${groupCols.mkString(",")}|${sumCols.mkString(",")}|" +
      s"${maxCols.mkString(",")}|${distinctCols.mkString(",")}"
  }

  private def parseSpec(s: String): (String, Seq[String], Seq[String], Seq[String], Seq[String]) = {
    def seg(i: Int): Seq[String] = {
      val parts = s.split('|')
      if (parts.length > i) parts(i).split(',').filter(_.nonEmpty).toSeq else Seq.empty
    }
    (s.split('|')(0), seg(1), seg(2), seg(3), seg(4))
  }

  /** The integer HLL estimate over a register-array column — the EXACT SQL
    * spelling of [[graft.operators.Sketch.hllDistinct]], so the maintained
    * estimate is bit-identical to a from-scratch sketch of the same rows
    * (registers are a MERGEABLE summary: union == element-wise max).
    */
  private def estExpr(regs: String): String = {
    val m2 = graft.operators.Sketch.hllM.toLong * graft.operators.Sketch.hllM
    s"""(((CAST($m2 AS BIGINT) * shiftleft(CAST(1 AS BIGINT), 33)) div
       |  aggregate($regs, CAST(0 AS BIGINT),
       |    (acc, r) -> acc + shiftleft(CAST(1 AS BIGINT), 33 - CAST(r AS INT))))
       |  * ${graft.operators.Sketch.hllAlphaScaled}L) div 1000000L""".stripMargin.replace("\n", " ")
  }

  /** Append the rendered `distinct_<c>` estimate columns after the register
    * columns (both the build and merge paths end here, so consumers always
    * see a current estimate without touching registers).
    */
  private def withEstimates(df: DataFrame, distinctCols: Seq[String]): DataFrame =
    if (distinctCols.isEmpty) df
    else df.selectExpr("*" +: distinctCols.map(c =>
      s"${estExpr(s"hllregs_$c")} AS distinct_$c"): _*)

  /** The full-recompute aggregate — also the semantics contract the
    * incremental path must match bit-for-bit.
    */
  private def fullState(df: DataFrame, groupCols: Seq[String],
                        sumCols: Seq[String], maxCols: Seq[String],
                        distinctCols: Seq[String]): DataFrame = {
    if (distinctCols.nonEmpty) graft.operators.Sketch.registerHll(df.sparkSession)
    val aggs = (count(lit(1)).as("mv_count") +: sumCols.map(c =>
      coalesce(sum(expr(s"CAST(`$c` AS BIGINT)")), lit(0L)).as(s"sum_$c"))) ++
      maxCols.map(c => max(expr(s"CAST(`$c` AS BIGINT)")).as(s"max_$c")) ++
      distinctCols.map(c =>
        expr(s"hll_sketch(CAST(`$c` AS STRING))").as(s"hllregs_$c"))
    withEstimates(df.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*),
      distinctCols)
  }

  /** The weighted delta aggregate over one CDC window (+1 insert /
    * −1 delete-pre-image) — same output schema as [[fullState]].
    */
  private def deltaState(changelog: DataFrame, groupCols: Seq[String],
                         sumCols: Seq[String], maxCols: Seq[String],
                         distinctCols: Seq[String]): DataFrame = {
    if (distinctCols.nonEmpty)
      graft.operators.Sketch.registerHll(changelog.sparkSession)
    val w = when(col("op") === "insert", 1L).otherwise(-1L)
    val aggs = (sum(w).as("mv_count") +: sumCols.map(c =>
      coalesce(sum(w * expr(s"CAST(`$c` AS BIGINT)")), lit(0L)).as(s"sum_$c"))) ++
      // max/hll only reached on insert-only windows (refresh rebuilds
      // otherwise), so the plain per-group window aggregate is the delta
      maxCols.map(c => max(expr(s"CAST(`$c` AS BIGINT)")).as(s"max_$c")) ++
      distinctCols.map(c =>
        expr(s"hll_sketch(CAST(`$c` AS STRING))").as(s"hllregs_$c"))
    changelog.groupBy(groupCols.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Null-safe full-outer fold of a delta into the stored state. Group
    * columns join with `<=>` (a plain equi-join would silently drop NULL
    * group keys — a real group in SQL semantics); zero-count groups vanish.
    */
  private def merge(old: DataFrame, delta: DataFrame, groupCols: Seq[String],
                    sumCols: Seq[String], maxCols: Seq[String],
                    distinctCols: Seq[String]): DataFrame = {
    val cond = groupCols.map(c => old(c) <=> delta(c)).reduce(_ && _)
    val joined = old.join(delta, cond, "full_outer")
    val keys = groupCols.map(c => coalesce(old(c), delta(c)).as(c))
    val cnt = (coalesce(old("mv_count"), lit(0L)) +
      coalesce(delta("mv_count"), lit(0L))).as("mv_count")
    val sums = sumCols.map(c => (coalesce(old(s"sum_$c"), lit(0L)) +
      coalesce(delta(s"sum_$c"), lit(0L))).as(s"sum_$c"))
    // greatest() skips nulls, so an absent side or an all-null group
    // composes exactly like SQL MAX (null only when both sides are null)
    val maxs = maxCols.map(c =>
      greatest(old(s"max_$c"), delta(s"max_$c")).as(s"max_$c"))
    // HLL register union IS element-wise max (the mergeable-summary
    // property); a one-sided group keeps that side's registers verbatim
    val regs = distinctCols.map(c => coalesce(
      zip_with(old(s"hllregs_$c"), delta(s"hllregs_$c"),
        (a, b) => greatest(a, b)),
      old(s"hllregs_$c"), delta(s"hllregs_$c")).as(s"hllregs_$c"))
    withEstimates(
      joined.select(((keys :+ cnt) ++ sums ++ maxs ++ regs): _*)
        .where(col("mv_count") > 0L),
      distinctCols)
  }

  /** Materialize the view from the source's CURRENT snapshot and pin its
    * spec + watermark. Returns the view table's snapshot id.
    */
  def create(spark: SparkSession, cat: ParquetSnapshotCatalog, source: String,
             view: String, groupCols: Seq[String],
             sumCols: Seq[String] = Seq.empty,
             maxCols: Seq[String] = Seq.empty,
             distinctCols: Seq[String] = Seq.empty): Long = {
    val spec = specStr(source, groupCols, sumCols, maxCols, distinctCols)
    val to = cat.currentSnapshot(source).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for source '$source'"))
    val vs = cat.commit(
      fullState(cat.readSnapshot(spark, source, to), groupCols, sumCols, maxCols,
        distinctCols), view)
    cat.putMeta(view, SpecKey, spec)
    cat.putMeta(view, srcKey(vs), to.toString)
    vs
  }

  /** Bring the view up to the source's CURRENT snapshot. Incremental when
    * the CDC window allows it; full rebuild otherwise (see the object doc's
    * fallback contract); no-op when already current. The new watermark is
    * recorded after the state commit and the old one GC'd after that, so
    * every crash window resolves to either the old consistent pair or a
    * detectable rebuild.
    */
  def refresh(spark: SparkSession, cat: ParquetSnapshotCatalog,
              view: String): RefreshResult = {
    val spec = cat.getMeta(view, SpecKey).getOrElse(
      throw new IllegalStateException(s"'$view' is not a materialized view (no $SpecKey)"))
    val (source, groupCols, sumCols, maxCols, distinctCols) = parseSpec(spec)
    val to = cat.currentSnapshot(source).getOrElse(
      throw new IllegalStateException(s"no committed snapshot for source '$source'"))
    val vCur = cat.currentSnapshot(view).getOrElse(
      throw new IllegalStateException(s"view '$view' has no committed state — create() it first"))

    def rebuild(from: Long): RefreshResult = {
      val vs = cat.commit(
        fullState(cat.readSnapshot(spark, source, to), groupCols, sumCols, maxCols,
          distinctCols), view)
      cat.putMeta(view, srcKey(vs), to.toString)
      cat.removeMeta(view, srcKey(vCur))
      RefreshResult("rebuild", from, to, vs)
    }

    cat.getMeta(view, srcKey(vCur)).map(_.toLong) match {
      case Some(from) if from == to => RefreshResult("noop", from, to, vCur)
      case Some(from) =>
        // the changelog validates its window EAGERLY (driver-side metadata
        // diff + tombstone listing), so refusals surface here, not mid-job.
        // MAX and HLL-distinct columns are self-maintainable only under
        // inserts (a delete may remove the current maximum / decrement a
        // register-covered value — unknowable from the aggregate); the
        // delete check is metadata-only (tombstone refs, no data).
        val clOpt =
          try {
            if ((maxCols.nonEmpty || distinctCols.nonEmpty) &&
                cat.deletedInWindow(spark, source, from, to).limit(1).collect().nonEmpty)
              None // max/hll not maintainable under deletes → rebuild
            else Some(cat.readChangelog(spark, source, from, to))
          } catch {
            case _: IllegalArgumentException | _: IllegalStateException => None
          }
        clOpt match {
          case Some(cl) =>
            val merged = merge(cat.readSnapshot(spark, view, vCur),
              deltaState(cl, groupCols, sumCols, maxCols, distinctCols),
              groupCols, sumCols, maxCols, distinctCols)
            val vs = cat.commit(merged, view)
            cat.putMeta(view, srcKey(vs), to.toString)
            cat.removeMeta(view, srcKey(vCur))
            RefreshResult("incremental", from, to, vs)
          case None => rebuild(from)
        }
      case None => rebuild(-1L) // crashed refresh left no watermark
    }
  }
}
