package graft.query

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Sort direction (reference `src/database/dynamic-query-object.ts:1-3`). */
sealed trait SqlOrder { def sql: String }
object SqlOrder {
  case object ASC extends SqlOrder { val sql = "ASC" }
  case object DESC extends SqlOrder { val sql = "DESC" }
}

/** The reference's `DynamicQueryObject`
  * (`src/database/dynamic-query-object.ts:5-67`) re-expressed as a
  * DataFrame builder: instead of assembling a SQL string + parameter
  * array for Postgres, each build step extends a Catalyst logical plan —
  * so predicate pushdown, column pruning, and join strategy selection
  * (broadcast vs shuffle) come from the optimizer, not the builder.
  *
  * Semantics parity:
  *  - `buildSelect(table, columns)` — projection list (`:30-32`); applied
  *    LAST (SQL evaluates FROM/WHERE/ORDER before SELECT, so conditions
  *    and ordering may reference non-selected columns).
  *  - `buildInnerJoin(src, dst, col)` — single-column equi inner join,
  *    chainable (`:34-36`). The duplicate join column from the
  *    destination side is dropped (USING-join semantics) so later
  *    references by bare name stay unambiguous.
  *  - `condition(clause, value)` — AND-conjunction (`:18-28,38-41`);
  *    clause uses `?` placeholders; an array value expands to an IN list
  *    exactly like the reference's multi-placeholder expansion.
  *  - `buildOrder(column, order)` — single sort key (`:42-44`).
  *  - `buildPagination(page, size)` — defaults page=1, size=10; hard cap
  *    take ≤ 50; skip = (page-1)*size (`:45-58`).
  *  - `getQuery()` — select ⧺ where ⧺ order ⧺ limit ⧺ offset (`:60-62`),
  *    returned as a DataFrame.
  *
  * Scale note: nothing here materializes — a builder query over a 100 TB
  * table is one Catalyst plan whose scan prunes to `columns` and pushes
  * the conjunction down to the source format.
  */
final class DynamicQuery(resolve: String => DataFrame) {

  private var base: DataFrame = _
  private var columns: Seq[String] = Seq.empty
  private var conditions: Vector[Column] = Vector.empty
  private var order: Option[Column] = None
  private var takeSkip: Option[(Int, Int)] = None

  def buildSelect(tableName: String, cols: Seq[String]): this.type = {
    base = resolve(tableName)
    columns = cols
    this
  }

  /** Chainable inner equi-join on a same-named column. */
  def buildInnerJoin(sourceTableName: String, destinationTableName: String,
      joinColumn: String): this.type = {
    val dst = resolve(destinationTableName)
    base = base.join(dst, Seq(joinColumn), "inner")
    this
  }

  /** Inner equi-join where the key is named differently on each side. */
  def buildInnerJoinOn(destinationTableName: String, sourceColumn: String,
      destinationColumn: String): this.type = {
    val dst = resolve(destinationTableName)
    base = base
      .join(dst, base(sourceColumn) === dst(destinationColumn), "inner")
      .drop(dst(destinationColumn))
    this
  }

  /** AND-conjunction condition. `clause` is a SQL fragment with `?`
    * placeholders; an array/Seq value expands into an IN list.
    */
  def condition(clause: String, value: Any): this.type = {
    conditions :+= expr(bind(clause, value))
    this
  }

  /** Column-native condition (Spark-side convenience). */
  def condition(c: Column): this.type = { conditions :+= c; this }

  def buildOrder(column: String, sqlOrder: SqlOrder): this.type = {
    order = Some(if (sqlOrder == SqlOrder.DESC) col(column).desc else col(column).asc)
    this
  }

  def buildPagination(pageNo: Option[Int], pageSize: Option[Int]): this.type = {
    val page = pageNo.filter(_ >= 1).getOrElse(1)           // default/floor (:47-48)
    val size = pageSize.getOrElse(10)                       // default (:49-50)
    val skip = if (page == 1) 0 else (page - 1) * size      // (:51)
    val take = if (size > 50) 50 else size                  // hard cap (:52)
    takeSkip = Some((take, skip))
    this
  }

  def buildPagination(pageNo: Int, pageSize: Int): this.type =
    buildPagination(Some(pageNo), Some(pageSize))

  /** Assemble: FROM+JOINs → WHERE → ORDER → OFFSET → LIMIT → SELECT. */
  def getQuery(): DataFrame = {
    require(base != null, "buildSelect must be called first")
    var df = base
    if (conditions.nonEmpty) df = df.filter(conditions.reduce(_ && _))
    order.foreach(o => df = df.orderBy(o))
    takeSkip.foreach { case (take, skip) =>
      if (skip > 0) df = df.offset(skip)
      df = df.limit(take)
    }
    df.select(columns.map(col): _*)
  }

  // ---- placeholder binding ----------------------------------------------

  /** Replace `?` placeholders with SQL literals; a Seq bound to a single
    * `?` expands to the comma list of its elements (IN-clause parity with
    * the reference's per-element parameter push, `:20-27`).
    */
  private def bind(clause: String, value: Any): String = value match {
    case seq: Seq[_] => replaceFirst(clause, seq.map(literal).mkString(","))
    case arr: Array[_] => replaceFirst(clause, arr.map(literal).mkString(","))
    case v => replaceFirst(clause, literal(v))
  }

  private def replaceFirst(clause: String, lit: String): String = {
    val i = clause.indexOf('?')
    require(i >= 0, s"no placeholder in clause: $clause")
    clause.substring(0, i) + lit + clause.substring(i + 1)
  }

  private def literal(v: Any): String = v match {
    case null => "NULL"
    // Spark's SQL parser treats backslash as an escape inside string
    // literals (non-ANSI default), so escape it FIRST, then quotes — a
    // value ending in '\' must not swallow the closing quote.
    case s: String =>
      "'" + s.replace("\\", "\\\\").replace("'", "\\'") + "'"
    case t: java.sql.Timestamp => s"TIMESTAMP '${t.toString}'"
    case d: java.sql.Date => s"DATE '${d.toString}'"
    case b: Boolean => if (b) "true" else "false"
    case other => other.toString // numeric types
  }
}
