package graft.sql

import scala.collection.concurrent.TrieMap
import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{Attribute, AttributeReference}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, MergeIntoTable}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.execution.command.LeafRunnableCommand
import org.apache.spark.sql.types.{BooleanType, IntegerType, LongType}
import graft.lake.LakeTable
import graft.merge.CdcMerge

/** SQL surface for the lake MERGE (owid-etl analogue: the grapher upsert;
  * NOTES round-1 item 4): standard `MERGE INTO <name> USING <source> ON
  * ... WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  * against a lake table registered under `<name>`. Spark's own parser
  * produces the `MergeIntoTable` plan; a resolution rule (injected via
  * [[graft.functions.GraftExtensions]]) rewrites it into a
  * `RunnableCommand` that executes [[CdcMerge]] — the Spark-idiomatic
  * route for a custom whole-statement semantic (parser reuse + rule +
  * command, no hand-rolled SQL parsing).
  *
  * Semantics are the engine's LSN-gated CDC upsert: the source must carry
  * the change-event shape (key columns + `op` + `lsn`); the per-key
  * max-LSN winner is applied, `op = 'D'` deletes. The ON/WHEN clauses are
  * validated to be the canonical upsert shape in spirit (Spark has already
  * parsed them; we require UPDATE-all + INSERT-all actions).
  */
object LakeCatalog {
  private val reg = TrieMap.empty[String, String]

  /** Session conf key naming a catalog ROOT whose PUBLISHED index
    * ([[graft.ops.PublishedCatalog]]) persists SQL registrations: every
    * session configured with the same root — including one in another
    * process — resolves the same names, matching the reference's shared
    * remote catalog (`RemoteCatalog.find → load`,
    * `lib/catalog/owid/catalog/catalogs.py:249-407`). Without it,
    * registrations stay process-local (the round-3 behavior).
    */
  val ROOT_CONF = "spark.graft.catalog.root"
  private val SQL_CHANNEL = "sql"

  // per-root resolver cache, invalidated by the published token's version
  private val cache = TrieMap.empty[String, (Long, Map[String, String])]
  private val publishLock = new Object

  /** Register `name` as a SQL-addressable lake table rooted at `dir`
    * (process-local registry). */
  def register(name: String, dir: String): Unit = reg.put(name.toLowerCase, dir)
  def unregister(name: String): Unit = reg.remove(name.toLowerCase)
  def lookup(name: String): Option[String] = reg.get(name.toLowerCase)

  private def rootOf(session: SparkSession): Option[String] =
    session.conf.getOption(ROOT_CONF).filter(_.nonEmpty)

  /** Register durably when the session configures [[ROOT_CONF]]: the name
    * lands in the published catalog index under channel "sql" (one fresh
    * immutable version per registration — see PublishedCatalog's token
    * swap), visible to every session sharing the root. Falls back to the
    * process-local registry otherwise.
    */
  def register(session: SparkSession, name: String, dir: String): Unit =
    rootOf(session) match {
      case Some(root) => publishDelta(session, root,
        add = Some(name.toLowerCase -> dir), remove = None)
      case None => register(name, dir)
    }

  def unregister(session: SparkSession, name: String): Unit = {
    unregister(name)
    rootOf(session).foreach(root =>
      publishDelta(session, root, add = None, remove = Some(name.toLowerCase)))
  }

  /** Resolve a name: the process-local registry first (an explicit local
    * register wins), then the session's published catalog if configured.
    */
  def lookup(session: SparkSession, name: String): Option[String] =
    lookup(name).orElse(rootOf(session).flatMap(root =>
      publishedNames(session, root).get(name.toLowerCase)))

  /** Read-modify-publish of the root's full index with the "sql" channel
    * updated — other channels' entries are carried so a catalog that also
    * publishes data channels is never truncated by a SQL registration.
    * Committed through [[graft.ops.PublishedCatalog.publishCas]]: the
    * merge re-runs against the CURRENT entries on every attempt, so two
    * registrations racing from different PROCESSES both land (the old
    * last-writer-wins token swap dropped the loser's name). The in-process
    * lock stays only to avoid needless CAS churn between local threads.
    */
  private def publishDelta(session: SparkSession, root: String,
                           add: Option[(String, String)],
                           remove: Option[String]): Unit = publishLock.synchronized {
    graft.ops.PublishedCatalog.publishCas(session, root, { existing =>
      val dropped = existing.filterNot { case (ch, _, t, _, _) =>
        ch == SQL_CHANNEL && (add.exists(_._1 == t) || remove.contains(t)) }
      dropped ++ add.map { case (n, d) => (SQL_CHANNEL, "", n, d, true) }
    })
    cache.remove(rootKey(root))
  }

  private def rootKey(root: String): String =
    java.nio.file.Paths.get(root).toAbsolutePath.normalize.toString

  private def publishedNames(session: SparkSession, root: String): Map[String, String] = {
    // lookup runs for EVERY UnresolvedRelation on every analyzer pass —
    // validate the cache with the cheap token read alone; the parquet
    // frame reader is constructed only on an actual version change
    val version = graft.ops.PublishedCatalog.currentVersion(root)
    if (version.isEmpty) return Map.empty
    val key = rootKey(root)
    cache.get(key) match {
      case Some((v, m)) if version.contains(v) => m
      case _ =>
        val reader = graft.ops.PublishedCatalog.open(session, root)
        val m =
          if (!reader.channels.contains(SQL_CHANNEL)) Map.empty[String, String]
          else reader.find(channel = SQL_CHANNEL).select("table", "path")
            .collect().map(r => r.getString(0).toLowerCase -> r.getString(1)).toMap
        cache.put(key, (reader.version, m))
        m
    }
  }
}

/** Analyzer rule: MERGE INTO <registered lake table> → [[GraftMergeIntoCommand]].
  *
  * The statement's shape is VALIDATED, not ignored: exactly the CDC
  * shapes below are accepted; anything else (partial SET lists, extra
  * conditions, non-key ON) fails loudly instead of silently executing
  * different semantics than the user wrote.
  *
  *   1. `WHEN MATCHED THEN UPDATE SET * WHEN NOT MATCHED THEN INSERT *`
  *      — the upsert; op/lsn columns in the source drive deletes + order.
  *   2. `WHEN MATCHED AND <src-cond> THEN DELETE WHEN MATCHED THEN UPDATE
  *      SET * WHEN NOT MATCHED THEN INSERT *` — the Delta/Iceberg
  *      CDC-apply form: source rows satisfying `<src-cond>` (which must
  *      reference ONLY source columns) become tombstones, the rest
  *      upsert. DOCUMENTED divergence from strict SQL MERGE, same family
  *      as the existing multi-match LSN resolution: a condition-matching
  *      row whose key is ABSENT from the target is a tombstone no-op,
  *      never re-routed to the INSERT clause (re-inserting delete events
  *      is the classic CDC MERGE footgun).
  *   3. `WHEN MATCHED THEN DELETE` (no other clauses) — pure delete:
  *      every source row becomes a tombstone for its key; absent keys
  *      are no-ops.
  */
case class GraftMergeRule(session: SparkSession) extends Rule[LogicalPlan] {
  import org.apache.spark.sql.catalyst.plans.logical.{DeleteAction, InsertStarAction, UpdateStarAction}

  import org.apache.spark.sql.catalyst.expressions.{And, EqualTo, Expression}

  private def attrName(e: Expression): Option[String] = e match {
    case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
      Some(a.nameParts.last.toLowerCase)
    case a: Attribute => Some(a.name.toLowerCase)
    case _ => None
  }

  private def conjuncts(cond: Expression): Seq[Expression] = cond match {
    case And(l, r) => conjuncts(l) ++ conjuncts(r)
    case other => Seq(other)
  }

  /** The key columns equated by `cond`, iff it is EXACTLY a conjunction of
    * same-name attribute equalities (`t.k = s.k`). Anything else — crossed
    * comparisons (`t.conv_id = s.turn_idx`), non-equality predicates
    * (`t.conv_id < s.conv_id`), extra residual conditions — yields None so
    * validate fails loudly instead of executing different semantics.
    */
  private def equatedKeyCols(cond: Expression): Option[Set[String]] = {
    val pairs = conjuncts(cond).map {
      case EqualTo(l, r) =>
        (attrName(l), attrName(r)) match {
          // `l.sql != r.sql` rejects same-relation self-equalities
          // (t.conv_id = t.conv_id is a tautology, not a join key — the
          // name-pair check alone would validate it and silently execute
          // different semantics than the user wrote)
          case (Some(ln), Some(rn)) if ln == rn && l.sql != r.sql => Some(ln)
          case _ => None
        }
      case _ => None
    }
    if (pairs.forall(_.isDefined)) Some(pairs.flatten.toSet) else None
  }

  /** Validated statement shape: an optional source-side DELETE condition
    * (shape 2) or a pure delete (shape 3).
    */
  private case class MergeShape(deleteCond: Option[Expression], pureDelete: Boolean)

  private def validate(m: MergeIntoTable, name: String): MergeShape = {
    def fail(why: String): Nothing = throw new IllegalArgumentException(
      s"MERGE INTO lake table '$name': $why — the lake MERGE surface supports exactly " +
      "the CDC shapes: ON <key equality> with WHEN MATCHED THEN UPDATE SET * " +
      "WHEN NOT MATCHED THEN INSERT * (optionally preceded by WHEN MATCHED AND " +
      "<source condition> THEN DELETE), or WHEN MATCHED THEN DELETE alone " +
      "(op/lsn columns in the source drive deletes + ordering)")

    // a DELETE condition runs against the SOURCE rows (tombstone routing);
    // it must therefore reference only source columns — a target-side
    // predicate (t.ts < s.ts) cannot be evaluated pre-merge and is loud
    def sourceOnly(cond: Expression): Expression = {
      val srcAlias = m.sourceTable match {
        case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(id, _) =>
          Some(id.name.toLowerCase)
        case _ => None
      }
      val srcCols = m.sourceTable.output.map(_.name.toLowerCase).toSet
      cond.transform {
        case a: org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute =>
          val parts = a.nameParts
          val ok = (parts.size == 1 && srcCols.contains(parts.head.toLowerCase)) ||
            (parts.size == 2 && srcAlias.contains(parts.head.toLowerCase) &&
              srcCols.contains(parts.last.toLowerCase))
          if (!ok) fail(s"DELETE condition must reference only source columns " +
            s"(${srcCols.toSeq.sorted.mkString(", ")}); found '${a.sql}'")
          org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute(Seq(parts.last))
        case a: Attribute if !m.sourceTable.outputSet.contains(a) =>
          fail(s"DELETE condition must reference only source columns; found '${a.sql}'")
      }
    }

    val shape = m.matchedActions match {
      case Seq(UpdateStarAction(None)) => MergeShape(None, pureDelete = false)
      case Seq(DeleteAction(Some(c)), UpdateStarAction(None)) =>
        MergeShape(Some(sourceOnly(c)), pureDelete = false)
      case Seq(DeleteAction(None)) => MergeShape(None, pureDelete = true)
      case other => fail(s"unsupported WHEN MATCHED actions $other")
    }
    (m.notMatchedActions, shape.pureDelete) match {
      case (Seq(InsertStarAction(None)), false) =>
      case (Seq(), true) =>
      case (other, true) => fail(s"WHEN MATCHED THEN DELETE (pure delete) cannot be " +
        s"combined with NOT MATCHED actions $other")
      case (other, false) => fail(s"unsupported WHEN NOT MATCHED actions $other")
    }
    if (m.notMatchedBySourceActions.nonEmpty)
      fail("WHEN NOT MATCHED BY SOURCE is not supported")
    val keys = graft.model.Schemas.KEY_COLS.map(_.toLowerCase).toSet
    equatedKeyCols(m.mergeCondition) match {
      case Some(cols) if cols == keys =>
      case Some(cols) =>
        fail(s"ON condition must equate exactly the key columns ${keys.mkString(", ")} " +
          s"(found ${cols.mkString(", ")})")
      case None =>
        fail("ON condition must be a conjunction of same-name key equalities " +
          s"(t.k = s.k for k in ${keys.mkString(", ")}); found: ${m.mergeCondition.sql}")
    }
    shape
  }

  /** `MERGE INTO t AS x` parses as SubqueryAlias(x, UnresolvedRelation(t))
    * — the alias changes how the ON condition NAMES columns (name-based
    * validation is unaffected), not which table is merged into.
    */
  private def targetRelation(p: LogicalPlan): Option[UnresolvedRelation] = p match {
    case org.apache.spark.sql.catalyst.plans.logical.SubqueryAlias(_, child) =>
      targetRelation(child)
    case u: UnresolvedRelation => Some(u)
    case _ => None
  }

  override def apply(plan: LogicalPlan): LogicalPlan = plan.resolveOperators {
    case m: MergeIntoTable =>
      targetRelation(m.targetTable) match {
        case Some(u) if m.sourceTable.resolved &&
            LakeCatalog.lookup(session, u.multipartIdentifier.mkString(".")).isDefined =>
          val name = u.multipartIdentifier.mkString(".")
          val shape = validate(m, name)
          GraftMergeIntoCommand(LakeCatalog.lookup(session, name).get, m.sourceTable,
            shape.deleteCond.map(org.apache.spark.sql.graftglue.column),
            shape.pureDelete)
        case _ => m
      }
  }
}

/** Eagerly-executed command carrying the resolved source plan.
  *
  * `deleteCond` (shape 2) routes the source rows satisfying it to
  * `op = 'D'`; `pureDelete` (shape 3) tombstones every source row. Both
  * ride the engine's existing delete semantics — max-LSN resolution,
  * absent-key tombstones as no-ops.
  */
case class GraftMergeIntoCommand(
    tableDir: String, source: LogicalPlan,
    // the DELETE routing condition rides as a Column, NOT a catalyst
    // Expression field: an Expression field on a LEAF command is swept by
    // CheckAnalysis (no children to resolve against) and fails analysis;
    // the Column resolves naturally inside run()'s withColumn
    deleteCond: Option[org.apache.spark.sql.Column] = None,
    pureDelete: Boolean = false)
    extends LeafRunnableCommand {
  import org.apache.spark.sql.functions.{col, lit, when}

  override def output: Seq[Attribute] = Seq(
    AttributeReference("epoch", LongType, nullable = false)(),
    AttributeReference("applied", BooleanType, nullable = false)(),
    AttributeReference("batch_rows", LongType, nullable = false)(),
    AttributeReference("affected_buckets", IntegerType, nullable = false)())

  override def innerChildren: Seq[LogicalPlan] = Seq(source)

  override def run(session: SparkSession): Seq[Row] = {
    val table = LakeTable.load(session, tableDir)
    val df0 = org.apache.spark.sql.graftglue.ofRows(session, source)
    val df =
      if (pureDelete) df0.withColumn("op", lit("D"))
      else deleteCond match {
        case Some(c) =>
          // rows satisfying the DELETE clause become tombstones; the rest
          // keep their source op (or upsert when the source carries none)
          val fallback = if (df0.columns.exists(_.equalsIgnoreCase("op"))) col("op")
                         else lit("U")
          df0.withColumn("op", when(c, lit("D")).otherwise(fallback))
        case None => df0
      }
    val epoch = table.manifest.lastEpoch + 1
    val stats = CdcMerge.apply(table, df, epoch, streamId = "sql")
    Seq(Row(stats.epoch, stats.applied, stats.batchRows, stats.affectedBuckets))
  }
}
