package graft.sources

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.UnresolvedAttribute
import org.apache.spark.sql.catalyst.analysis.UnresolvedRelation
import org.apache.spark.sql.catalyst.expressions.{EqualTo, Expression, Literal}
import org.apache.spark.sql.catalyst.plans.logical._
import org.apache.spark.sql.functions.{expr, lit}

/** SQL `UPDATE` / `MERGE INTO` / `DELETE` for snapshot-log tables — the
  * row-level DML statements Spark's DSv2 can't route through
  * [[GraftCatalog]] (UPDATE/MERGE need `SupportsRowLevelOperations`,
  * which would force the raw-parquet delegate scan to mint row ids).
  * Instead the statement text is parsed by SPARK'S OWN SQL parser
  * (`spark.sessionState.sqlParser.parsePlan` — full ANSI grammar, not a
  * regex dialect), the resulting `UpdateTable` / `MergeIntoTable` /
  * `DeleteFromTable` logical plan is interpreted here, and execution
  * routes into the snapshot log's transactional one-evaluation DML
  * ([[SnapshotLog.updateWhere]] / [[SnapshotLog.mergeInto]] /
  * [[SnapshotLog.deleteWhereCow]]) under OCC retry. Reproduces the
  * reference's SQL-first posture (`HiveConnector.scala:29-32` — SQL text
  * is the query interface) for writes as well as reads.
  *
  * Semantics honored, refused loudly when not expressible:
  *   - qualifiers: target/source aliases resolve per ANSI scoping;
  *     an unqualified name present on BOTH sides of a MERGE is
  *     ambiguous and refused (the analyzer's rule).
  *   - MERGE clause order is first-match-wins in declaration order; the
  *     log API fixes delete-before-update, so a MERGE declaring UPDATE
  *     before DELETE (where the order could matter) is refused rather
  *     than silently reordered.
  *   - `WHEN NOT MATCHED THEN INSERT` must be the full-row insert
  *     (`INSERT *` or an identity column list) — the log's merge takes
  *     whole source rows.
  *   - DELETE takes the copy-on-write route ([[SnapshotLog
  *     .deleteWhereCow]]) so the table stays scan-clean for the SQL
  *     read path, same as [[GraftCatalog]]'s `DELETE FROM`.
  *
  * Scale: nothing here adds work past the underlying DML — UPDATE is
  * update-sized (merge-on-read), MERGE's rewrite scope stays
  * stats-pruned, DELETE rewrites only grazed files. The interpreter
  * itself is driver-side string/tree work, zero data motion.
  */
object GraftSqlDml {

  /** One committed DML statement's receipt. */
  final case class DmlResult(
      op: String,
      table: String,
      version: Long,
      rowsUpdated: Long,
      rowsDeleted: Long,
      rowsInserted: Long,
      occRetries: Int)

  /** Parse and execute one UPDATE / MERGE INTO / DELETE statement against
    * a `<catalog>.<table>` snapshot-log table. The catalog name must be
    * configured (`spark.sql.catalog.<name>.root`) exactly as for
    * [[GraftCatalog]] SQL reads.
    */
  def exec(spark: SparkSession, sql: String): DmlResult =
    execPlan(spark, spark.sessionState.sqlParser.parsePlan(sql))

  /** [[exec]] from an already-parsed plan — the entry the injected
    * parser's command wrapper uses (the session parser may BE
    * [[GraftSqlParser]], whose parsePlan re-wraps DML plans; accepting
    * the plan directly keeps one interpretation, no re-parse loop).
    */
  def execPlan(spark: SparkSession, plan: LogicalPlan): DmlResult =
    plan match {
      case UpdateTable(table, assignments, condition) =>
        execUpdate(spark, table, assignments, condition)
      case m: MergeIntoTable => execMerge(spark, m)
      case DeleteFromTable(table, condition) =>
        execDelete(spark, table, condition)
      case w: GraftSqlParser.GraftDmlCommand => execPlan(spark, w.inner)
      case other => throw new UnsupportedOperationException(
        s"GraftSqlDml: only UPDATE / MERGE INTO / DELETE statements run here " +
          s"(got ${other.nodeName}) — SELECT and INSERT go through spark.sql " +
          "with the GraftCatalog")
    }

  // ───────────────────────── table resolution ─────────────────────────

  /** (log, table name, the qualifier spellings that refer to it). */
  private def resolveTarget(
      spark: SparkSession,
      plan: LogicalPlan): (SnapshotLog, String, Set[String]) = plan match {
    case SubqueryAlias(alias, child) =>
      val (log, name, quals) = resolveTarget(spark, child)
      (log, name, quals + alias.name.toLowerCase)
    case r: UnresolvedRelation =>
      val parts = r.multipartIdentifier
      require(parts.length == 2,
        s"GraftSqlDml: target must be <catalog>.<table>, got ${parts.mkString(".")}")
      val root = spark.conf.getOption(s"spark.sql.catalog.${parts.head}.root")
        .getOrElse(throw new IllegalArgumentException(
          s"GraftSqlDml: '${parts.head}' is not a configured graft catalog " +
            s"(set spark.sql.catalog.${parts.head}.root)"))
      val log = new SnapshotLog(new java.io.File(root, parts(1)).toString)
      // mapped tables refuse UP FRONT with the real reason — the DML
      // machinery addresses rows by raw-file (file, pos) under LOGICAL
      // names, which a rename invalidates (without this the failure is a
      // confusing unresolved-column error deep in the plan)
      log.currentVersion.foreach { cur =>
        require(log.columnMapping(cur).isEmpty,
          s"GraftSqlDml: ${parts.mkString(".")} uses column mapping — SQL " +
            "UPDATE/MERGE/DELETE do not compose with renamed physical ids " +
            "yet; rewrite through the SnapshotLog API (readMapped + " +
            "appendMapped/overwrite) instead")
      }
      (log, parts(1), Set(parts(1).toLowerCase))
    case other => throw new UnsupportedOperationException(
      s"GraftSqlDml: unsupported target relation ${other.nodeName}")
  }

  // ─────────────────────── expression rewriting ───────────────────────

  /** Strip target qualifiers (`t.c` → `c`); used by UPDATE / DELETE where
    * only the target table is in scope.
    */
  private def stripQualifiers(e: Expression, quals: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute if a.nameParts.length > 1 &&
          quals.contains(a.nameParts.head.toLowerCase) =>
        UnresolvedAttribute(a.nameParts.tail)
    }

  private def toColumn(e: Expression): Column = expr(e.sql)

  /** MERGE scoping: source-qualified refs become `src_<name>` (the log
    * merge's source prefix), target-qualified refs drop the qualifier,
    * and unqualified refs resolve by schema membership — ambiguous or
    * unknown names refuse loudly.
    */
  private def rewriteMergeExpr(
      e: Expression,
      tgtQuals: Set[String], srcQuals: Set[String],
      tgtCols: Set[String], srcCols: Set[String]): Expression =
    e.transformUp {
      case a: UnresolvedAttribute =>
        val parts = a.nameParts
        if (parts.length > 1 && srcQuals.contains(parts.head.toLowerCase))
          UnresolvedAttribute(Seq("src_" + parts.last))
        else if (parts.length > 1 && tgtQuals.contains(parts.head.toLowerCase))
          UnresolvedAttribute(Seq(parts.last))
        else if (parts.length == 1) {
          val n = parts.head
          (tgtCols.contains(n), srcCols.contains(n)) match {
            case (true, false) => a
            case (false, true) => UnresolvedAttribute(Seq("src_" + n))
            case (true, true) => throw new IllegalArgumentException(
              s"GraftSqlDml: reference '$n' is ambiguous in MERGE — qualify it " +
                "with the target or source alias")
            case _ => throw new IllegalArgumentException(
              s"GraftSqlDml: unknown column '$n' in MERGE expression")
          }
        } else throw new IllegalArgumentException(
          s"GraftSqlDml: cannot resolve qualifier '${parts.head}' " +
            s"in ${a.sql} — use the target or source alias")
    }

  private def assignmentName(key: Expression, quals: Set[String]): String =
    stripQualifiers(key, quals) match {
      case a: UnresolvedAttribute if a.nameParts.length == 1 => a.nameParts.head
      case other => throw new IllegalArgumentException(
        s"GraftSqlDml: SET target must be a plain column, got ${other.sql}")
    }

  // ───────────────────────────── UPDATE ─────────────────────────────

  private def execUpdate(
      spark: SparkSession,
      table: LogicalPlan,
      assignments: Seq[Assignment],
      condition: Option[Expression]): DmlResult = {
    val (log, name, quals) = resolveTarget(spark, table)
    val set = assignments.map(a =>
      assignmentName(a.key, quals) -> toColumn(stripQualifiers(a.value, quals)))
    val cond = condition.map(c => toColumn(stripQualifiers(c, quals))).getOrElse(lit(true))
    // stored CHECK constraints gate the UPDATED rows too (Spark's
    // analyzer only plants enforcement into INSERT plans — this route
    // writes through the log's own machinery, so the gate rides the
    // staged write as a raise_error guard)
    val checks = storedChecks(log)
    val ((v, n), retries) =
      log.withOccRetry()(log.updateWhere(spark, cond, set, checks = checks))
    DmlResult("UPDATE", name, v, n, 0L, 0L, retries)
  }

  /** The table's stored `prop.check.<name>` CHECK constraints as
    * (name, predicate) pairs.
    */
  private def storedChecks(
      log: SnapshotLog): Seq[(String, org.apache.spark.sql.Column)] =
    log.currentVersion.toSeq.flatMap(cur => log.metaValues(cur).collect {
      case (k, sql) if k.startsWith("prop.check.") =>
        k.stripPrefix("prop.check.") -> org.apache.spark.sql.functions.expr(sql)
    }.toSeq.sortBy(_._1))

  // ───────────────────────────── DELETE ─────────────────────────────

  private def execDelete(
      spark: SparkSession,
      table: LogicalPlan,
      condition: Expression): DmlResult = {
    val (log, name, quals) = resolveTarget(spark, table)
    val cond = condition match {
      case Literal(true, _) => lit(true)
      case c => toColumn(stripQualifiers(c, quals))
    }
    val ((v, n), retries) = log.withOccRetry()(log.deleteWhereCow(spark, cond))
    DmlResult("DELETE", name, v, 0L, n, 0L, retries)
  }

  // ────────────────────────────── MERGE ──────────────────────────────

  private def execMerge(spark: SparkSession, m: MergeIntoTable): DmlResult = {
    require(!m.schemaEvolutionEnabled,
      "GraftSqlDml: MERGE ... WITH SCHEMA EVOLUTION is not supported — the log " +
        "merge requires source schema == target schema; evolve via append first")
    val (log, name, tgtQuals) = resolveTarget(spark, m.targetTable)

    // source: a named table / temp view (optionally aliased); arbitrary
    // subqueries would need the analyzer — register them as a view first
    val (srcDf, srcQuals) = m.sourceTable match {
      case SubqueryAlias(alias, r: UnresolvedRelation) =>
        (spark.table(r.multipartIdentifier.mkString(".")),
          Set(alias.name.toLowerCase, r.multipartIdentifier.last.toLowerCase))
      case r: UnresolvedRelation =>
        (spark.table(r.multipartIdentifier.mkString(".")),
          Set(r.multipartIdentifier.last.toLowerCase))
      case other => throw new UnsupportedOperationException(
        s"GraftSqlDml: MERGE source must be a table or view (got ${other.nodeName}) " +
          "— register a subquery as a temp view first")
    }
    val cur = log.currentVersion.getOrElse(throw new IllegalStateException(
      s"GraftSqlDml: MERGE target $name has no committed snapshot"))
    val tgtCols = log.read(spark, cur).columns.toSet
    val srcCols = srcDf.columns.toSet
    def rw(e: Expression): Column =
      toColumn(rewriteMergeExpr(e, tgtQuals, srcQuals, tgtCols, srcCols))

    // ON t.k = s.k — the single equi-key the log merge joins on
    val keyCol = m.mergeCondition match {
      case EqualTo(l: UnresolvedAttribute, r: UnresolvedAttribute) =>
        val (ln, rn) = (l.nameParts.last, r.nameParts.last)
        require(ln == rn,
          s"GraftSqlDml: MERGE ON must equate the same-named key column " +
            s"on both sides (got $ln = $rn)")
        ln
      case other => throw new UnsupportedOperationException(
        s"GraftSqlDml: MERGE ON must be a single equality t.k = s.k, " +
          s"got ${other.sql}")
    }

    // matched clauses: at most one DELETE and one UPDATE; the log API
    // evaluates delete-before-update, so an UPDATE declared first (whose
    // first-match-wins order could differ) is refused, not reordered
    var deleteWhen: Option[Column] = None
    var updateWhen: Option[Column] = None
    var updateSet: Seq[(String, Column)] = Nil
    m.matchedActions.foreach {
      case DeleteAction(cond) =>
        require(deleteWhen.isEmpty, "GraftSqlDml: one WHEN MATCHED DELETE clause only")
        require(updateWhen.isEmpty,
          "GraftSqlDml: declare WHEN MATCHED ... DELETE before WHEN MATCHED ... " +
            "UPDATE — the log merge evaluates delete first, and honoring an " +
            "update-first declaration would silently change first-match-wins")
        deleteWhen = Some(cond.map(rw).getOrElse(lit(true)))
      case UpdateAction(cond, assigns, _) =>
        require(updateWhen.isEmpty, "GraftSqlDml: one WHEN MATCHED UPDATE clause only")
        updateWhen = Some(cond.map(rw).getOrElse(lit(true)))
        updateSet = assigns.map(a =>
          assignmentName(a.key, tgtQuals) -> rw(a.value))
      case UpdateStarAction(cond) =>
        require(updateWhen.isEmpty, "GraftSqlDml: one WHEN MATCHED UPDATE clause only")
        updateWhen = Some(cond.map(rw).getOrElse(lit(true)))
        updateSet = log.read(spark, cur).columns.toSeq
          .map(c => c -> org.apache.spark.sql.functions.col("src_" + c))
      case other => throw new UnsupportedOperationException(
        s"GraftSqlDml: unsupported WHEN MATCHED action ${other.getClass.getSimpleName}")
    }

    // not matched: INSERT * (or an identity column list) only
    val insertNotMatched = m.notMatchedActions match {
      case Nil => false
      case Seq(InsertStarAction(None)) => true
      case Seq(InsertAction(None, assigns)) =>
        val pairs = assigns.map { a =>
          val tgt = assignmentName(a.key, tgtQuals)
          rewriteMergeExpr(a.value, tgtQuals, srcQuals, tgtCols, srcCols) match {
            case v: UnresolvedAttribute if v.nameParts == Seq("src_" + tgt) => tgt
            case other => throw new UnsupportedOperationException(
              s"GraftSqlDml: INSERT must map each column to the same-named source " +
                s"column (got $tgt <- ${other.sql}) — the log merge inserts whole " +
                "source rows; reshape the source view instead")
          }
        }
        require(pairs.toSet == tgtCols,
          s"GraftSqlDml: INSERT must cover every target column " +
            s"(missing ${(tgtCols -- pairs).mkString(", ")})")
        true
      case Seq(InsertStarAction(Some(_))) | Seq(InsertAction(Some(_), _)) =>
        throw new UnsupportedOperationException(
          "GraftSqlDml: conditional WHEN NOT MATCHED AND ... is not expressible " +
            "in the log merge — filter the source view instead")
      case _ => throw new UnsupportedOperationException(
        "GraftSqlDml: one WHEN NOT MATCHED clause only")
    }

    val deleteNmbs = m.notMatchedBySourceActions match {
      case Nil => None
      case Seq(DeleteAction(cond)) => Some(cond.map(rw).getOrElse(lit(true)))
      case _ => throw new UnsupportedOperationException(
        "GraftSqlDml: WHEN NOT MATCHED BY SOURCE supports a single DELETE only")
    }

    // MERGE writes updated/inserted images through the log's own
    // machinery, where CHECK enforcement is not folded in yet — refuse
    // LOUDLY on constrained tables rather than silently committing a
    // violation (the UPDATE route enforces; INSERTs ride Spark's gate)
    require(storedChecks(log).isEmpty,
      s"GraftSqlDml: MERGE INTO does not enforce the CHECK constraint(s) " +
        s"declared on $name yet — DROP CONSTRAINT first, or express the " +
        "change as UPDATE/INSERT statements, which do enforce")
    val ((v, (nUpd, nDel, nIns), _), retries) = log.withOccRetry()(
      log.mergeInto(srcDf, keyCol, updateWhen, updateSet, deleteWhen,
        insertNotMatched, deleteNmbs))
    DmlResult("MERGE", name, v, nUpd, nDel, nIns, retries)
  }
}
