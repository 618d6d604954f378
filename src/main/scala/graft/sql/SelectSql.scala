package graft.sql

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.analysis.{RelationTimeTravel, UnresolvedRelation}
import org.apache.spark.sql.catalyst.plans.logical.{InsertIntoStatement, LogicalPlan, MergeIntoTable, SubqueryAlias}
import org.apache.spark.sql.catalyst.rules.Rule
import graft.lake.LakeTable

/** SQL read surface for registered lake tables: `SELECT ... FROM <name>`
  * resolves to the table's live snapshot, and Spark's native time-travel
  * syntax `SELECT ... FROM <name> VERSION AS OF <v>` resolves to
  * `snapshotAt(v)` — the parser already produces [[RelationTimeTravel]];
  * this rule gives it lake semantics (Iceberg-style reads, no connector
  * needed: parser reuse + resolution rule, the same route as the MERGE
  * surface).
  *
  * Resolution substitutes the snapshot's ANALYZED plan, so everything
  * downstream (predicate pushdown into the parquet scans, per-bucket MOR
  * resolve, column pruning) is ordinary Catalyst on ordinary operators.
  *
  * A `MERGE INTO <name> ...` statement's TARGET relation is deliberately
  * left unresolved — [[GraftMergeRule]] owns that node (rewriting it to a
  * scan would break the write path). A lake table that appears both as
  * the MERGE target and inside the source subquery in the SAME statement
  * is therefore not readable from the source side; split the statement.
  *
  * `TIMESTAMP AS OF <ts>` resolves through the commit wall-clock recorded
  * in manifest lineage ([[LakeTable.versionAtTimestamp]]): the GREATEST
  * version committed at or before the timestamp, failing loudly for
  * timestamps past the metadata-vacuum horizon or before the first
  * commit — never a silent nearest-pick.
  */
case class GraftSelectRule(session: SparkSession) extends Rule[LogicalPlan] {

  private def nameOf(u: UnresolvedRelation): String =
    u.multipartIdentifier.mkString(".")

  private def snapshotPlan(dir: String, version: Option[Long]): LogicalPlan = {
    val table = LakeTable.load(session, dir)
    val df = version match {
      case Some(v) => table.snapshotAt(v)
      case None => table.snapshot()
    }
    df.queryExecution.analyzed
  }

  /** The bare relation under any alias wrappers — a MERGE target parsed
    * from `MERGE INTO t AS x` arrives as SubqueryAlias(x, Unresolved(t)),
    * and the traversal below visits the INNER node, so the guard must
    * match what the traversal sees.
    */
  private def stripAliases(p: LogicalPlan): LogicalPlan = p match {
    case SubqueryAlias(_, child) => stripAliases(child)
    case other => other
  }

  override def apply(plan: LogicalPlan): LogicalPlan = {
    // DML statements own their target relation — the MERGE rule rewrites
    // its target, and INSERT INTO a lake table must fail Spark's own way,
    // not silently become a read of the snapshot. Skip those nodes
    // (structural equality; see scaladoc for the self-referential corner).
    val dmlTargets: Set[LogicalPlan] = plan.collect {
      case m: MergeIntoTable => stripAliases(m.targetTable)
      case i: InsertIntoStatement => stripAliases(i.table)
    }.toSet
    plan.resolveOperatorsUp {
      case tt @ RelationTimeTravel(u: UnresolvedRelation, ts, ver)
          if LakeCatalog.lookup(session, nameOf(u)).isDefined =>
        val dir = LakeCatalog.lookup(session, nameOf(u)).get
        val v = (ts, ver) match {
          case (Some(tsExpr), _) =>
            LakeTable.load(session, dir).versionAtTimestamp(evalTsMillis(nameOf(u), tsExpr))
          case (None, Some(verStr)) => verStr.toLongOption.getOrElse(
            throw new IllegalArgumentException(
              s"lake table '${nameOf(u)}': VERSION AS OF expects a numeric manifest " +
              s"version (got '$verStr')"))
          case _ => throw new IllegalArgumentException(
            s"lake table '${nameOf(u)}': time travel needs VERSION AS OF or TIMESTAMP AS OF")
        }
        snapshotPlan(dir, Some(v))
      case u: UnresolvedRelation
          if !dmlTargets.contains(u) && LakeCatalog.lookup(session, nameOf(u)).isDefined =>
        snapshotPlan(LakeCatalog.lookup(session, nameOf(u)).get, None)
    }
  }

  /** Evaluate the parsed TIMESTAMP AS OF operand (a literal or foldable
    * expression) to epoch millis in the session time zone; anything that
    * does not evaluate to a timestamp fails loudly by name.
    */
  private def evalTsMillis(name: String, e: org.apache.spark.sql.catalyst.expressions.Expression): Long = {
    import org.apache.spark.sql.catalyst.expressions.Cast
    import org.apache.spark.sql.types.TimestampType
    val zone = session.sessionState.conf.sessionLocalTimeZone
    val micros = try {
      val r = Cast(e, TimestampType, Some(zone)).eval(null)
      if (r == null) throw new IllegalArgumentException(s"'${e.sql}' is not a timestamp")
      r.asInstanceOf[Long]
    } catch {
      case ia: IllegalArgumentException => throw ia
      case other: Exception => throw new IllegalArgumentException(
        s"lake table '$name': TIMESTAMP AS OF operand '${e.sql}' did not evaluate " +
        "to a timestamp", other)
    }
    Math.floorDiv(micros, 1000L)
  }
}

/** Changelog as a table-valued function — the "read the lake table as a
  * CDC feed" API on the SQL surface (Delta's `table_changes` shape):
  *
  *   SELECT * FROM lake_changes('t', <fromVersion> [, <toVersion>])
  *
  * Rows are the delta rows committed in (from, to] including tombstones
  * (`_deleted` = true); refuses ranges crossing a RESTORE or vacuumed
  * deltas, exactly like [[LakeTable.changesBetween]].
  *
  * Resolved at PARSE time ([[GraftSqlParser]] rewrites the node in the
  * freshly parsed plan): the analyzer's own ResolveFunctions rule
  * fail-fasts on unknown table-valued functions BEFORE injected
  * resolution rules run, so an analyzer rule never sees the node.
  */
object LakeChangesTvf {
  import org.apache.spark.sql.catalyst.analysis.UnresolvedTableValuedFunction
  import org.apache.spark.sql.catalyst.expressions.Expression

  def rewrite(session: SparkSession, plan: LogicalPlan): LogicalPlan =
    plan.transformUp {
      case tvf: UnresolvedTableValuedFunction
          if tvf.name.map(_.toLowerCase) == Seq("lake_changes") =>
        val args = tvf.functionArgs
        require(args.size == 2 || args.size == 3,
          "lake_changes(<table name>, <fromVersion> [, <toVersion>]) takes 2 or 3 arguments")
        def evalStr(e: Expression): String = e.eval(null) match {
          case s: org.apache.spark.unsafe.types.UTF8String => s.toString
          case other => throw new IllegalArgumentException(
            s"lake_changes: expected a string table name, got '${e.sql}' ($other)")
        }
        def evalLong(e: Expression): Long = e.eval(null) match {
          case i: Int => i.toLong
          case l: Long => l
          case other => throw new IllegalArgumentException(
            s"lake_changes: expected a numeric version, got '${e.sql}' ($other)")
        }
        val name = evalStr(args.head)
        val dir = LakeCatalog.lookup(session, name).getOrElse(
          throw new IllegalArgumentException(
            s"lake_changes: '$name' is not a registered lake table"))
        val table = LakeTable.load(session, dir)
        val from = evalLong(args(1))
        val to = if (args.size == 3) evalLong(args(2)) else table.currentVersion
        table.changesBetween(from, to).queryExecution.analyzed
    }
}
