package graft.schema

import graft.{InvalidReferenceError, InvalidTableError}

/** Table metadata, mirroring the reference's pydantic `Table` model
  * (`sql_autoloader/schema.py:38-141`).
  *
  * @param name        table name
  * @param columns     natural (non-key) columns
  * @param primaryKey  primary key column name, "" when absent
  * @param foreignKeys foreign key column names
  */
final case class Table(
    name: String,
    columns: Seq[String],
    primaryKey: String = "",
    foreignKeys: Seq[String] = Nil,
) {
  // schema.py:46-55 — a table with no columns nor FKs is invalid
  if (columns.isEmpty && foreignKeys.isEmpty)
    throw new InvalidTableError(
      s"Table $name seems to be empty, what is it for?")

  /** FKs first then natural columns (schema.py:95-98). */
  val columnsAndForeignKeys: Seq[String] = foreignKeys ++ columns

  def hasPrimaryKey: Boolean = primaryKey.nonEmpty

  /** All-key tables are linking tables (schema.py:105-111). */
  def isLinking: Boolean = columns.isEmpty

  /** `table.column` -> `column`, in declaration order (schema.py:113-116). */
  val prefixColumnMap: Seq[(String, String)] =
    columnsAndForeignKeys.map(c => s"$name.$c" -> c)

  private val prefixKeys = prefixColumnMap.map(_._1).toSet
  private val bareKeys = columnsAndForeignKeys.toSet

  /** Bare or prefixed membership test (schema.py:118-135). */
  def contains(column: String): Boolean =
    bareKeys.contains(column) || prefixKeys.contains(column)

  /** Columns common to this table and `columns`, in table declaration
    * order (schema.py:57-69 returns an unordered set; we pin a
    * deterministic order so generated SQL is stable).
    */
  def getCommonColumns(columns: Seq[String]): Seq[String] = {
    val wanted = columns.toSet
    columnsAndForeignKeys.filter(wanted.contains)
  }

  /** For each input column present on this table, the pair
    * (prefixed, original-as-given) (schema.py:71-93). A bare input
    * column maps to its prefixed form; a prefixed input stays prefixed
    * and keeps the prefixed name as the output alias.
    */
  def getPrefixedColumns(columns: Seq[String]): Seq[(String, String)] =
    columns.flatMap {
      case c if !contains(c)         => None
      case c if prefixKeys.contains(c) => Some((c, c))
      case c                         => Some((s"$name.$c", c))
    }

  override def toString: String = {
    val pk = if (hasPrimaryKey) Seq(primaryKey) else Nil
    val cols = (pk ++ columnsAndForeignKeys).mkString("\n\t")
    s"Table $name (\n\t$cols\n)"
  }
}

/** FK reference between two tables (`sql_autoloader/schema.py:148-173`).
  * Renders as a join predicate; self-references are rejected.
  */
final case class Reference(
    fromTable: String,
    fromKey: String,
    toTable: String,
    toKey: String,
) {
  Seq(fromTable, fromKey, toTable, toKey).foreach { s =>
    if (s.trim.isEmpty)
      throw new InvalidReferenceError(s"Reference fields must be non-empty: $this")
  }
  if (fromTable == toTable)
    throw new InvalidReferenceError(s"$this is a reference to self.")

  /** `ON from.from_key = to.to_key` (schema.py:165-169). */
  def joinSql: String = s"ON $fromTable.$fromKey = $toTable.$toKey"
}

/** Parameters for one insert-and-retrieve step (schema.py:197-203). */
final case class InsertAndRetrieveSpec(
    table: String,
    alias: String,
    columns: Seq[(String, String)],
)

/** Parameters for one plain-insert step (schema.py:205-209). */
final case class InsertSpec(table: String, columns: Seq[(String, String)])

/** Ordered load plan (schema.py:212-234). */
final case class LoadInstructions(
    insertAndRetrieve: Seq[InsertAndRetrieveSpec],
    insert: Seq[InsertSpec],
) {
  def insertAndRetrieveTables: Seq[String] = insertAndRetrieve.map(_.table)
  def insertTables: Seq[String] = insert.map(_.table)
}
