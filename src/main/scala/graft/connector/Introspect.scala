package graft.connector

import java.sql.{Connection, DatabaseMetaData}

import scala.collection.mutable

import graft.schema.{Reference, Table}

/** Schema introspection over `java.sql.DatabaseMetaData` — one
  * dialect-independent implementation replacing the reference's
  * per-backend PRAGMA / information_schema queries (B8/B9:
  * `sql_autoloader/sqlite_connector.py:84-147`,
  * `sql_autoloader/postgres/postgres_connector.py:67-157`).
  *
  * Mapping to the reference's Table model: `primaryKey` is the single
  * pk column (≤1 asserted, as `sqlite_connector.py:132` does),
  * `foreignKeys` are FK child columns, `columns` are the remaining
  * natural columns. Also collects unique-constraint column sets,
  * which Derby's conflict-ignoring insert emulation needs.
  */
object Introspect {

  final case class IntrospectedSchema(
      tables: Seq[Table],
      references: Seq[Reference],
      uniqueKeySets: Map[String, Seq[Seq[String]]],
      notNullColumns: Map[String, Set[String]],
  )

  /** @param schemaPattern JDBC schema to scan (Derby default: "APP")
    * @param lowercase fold identifiers to lower case (Derby stores
    *   unquoted identifiers upper-case; the loader is case-sensitive)
    */
  def apply(
      conn: Connection,
      schemaPattern: String = "APP",
      lowercase: Boolean = true,
  ): IntrospectedSchema = {
    val md = conn.getMetaData
    def fold(s: String): String = if (lowercase && s != null) s.toLowerCase else s

    val tableNames = {
      val rs = md.getTables(null, schemaPattern, "%", Array("TABLE"))
      val buf = mutable.ArrayBuffer.empty[String]
      while (rs.next()) buf += rs.getString("TABLE_NAME")
      rs.close()
      buf.toSeq
    }

    val tables = mutable.ArrayBuffer.empty[Table]
    val references = mutable.ArrayBuffer.empty[Reference]
    val uniques = mutable.LinkedHashMap.empty[String, Seq[Seq[String]]]
    val notNulls = mutable.LinkedHashMap.empty[String, Set[String]]

    tableNames.foreach { tn =>
      // primary key (≤1 column, like the reference's assert)
      val pks = {
        val rs = md.getPrimaryKeys(null, schemaPattern, tn)
        val buf = mutable.ArrayBuffer.empty[String]
        while (rs.next()) buf += fold(rs.getString("COLUMN_NAME"))
        rs.close()
        buf.toSeq
      }
      assert(pks.size <= 1,
        s"table '${fold(tn)}' has a compound primary key: $pks")

      // FK columns + references (child -> parent)
      val fkCols = mutable.ArrayBuffer.empty[String]
      val rsFk = md.getImportedKeys(null, schemaPattern, tn)
      while (rsFk.next()) {
        val fromKey = fold(rsFk.getString("FKCOLUMN_NAME"))
        fkCols += fromKey
        references += Reference(
          fromTable = fold(tn),
          fromKey = fromKey,
          toTable = fold(rsFk.getString("PKTABLE_NAME")),
          toKey = fold(rsFk.getString("PKCOLUMN_NAME")))
      }
      rsFk.close()

      // all columns in ordinal order, with nullability
      val allCols = mutable.ArrayBuffer.empty[String]
      val notNull = mutable.ArrayBuffer.empty[String]
      locally {
        val rs = md.getColumns(null, schemaPattern, tn, "%")
        while (rs.next()) {
          val c = fold(rs.getString("COLUMN_NAME"))
          allCols += c
          if (rs.getInt("NULLABLE") == DatabaseMetaData.columnNoNulls) notNull += c
        }
        rs.close()
      }

      val natural =
        allCols.toSeq.filterNot(c => pks.contains(c) || fkCols.contains(c))
      tables += Table(fold(tn), natural, pks.headOption.getOrElse(""), fkCols.toSeq)
      notNulls(fold(tn)) = notNull.toSet

      // unique constraints (non-pk), grouped by index name
      val rsIx = md.getIndexInfo(null, schemaPattern, tn, true, false)
      val byIndex = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
      while (rsIx.next()) {
        val ixName = rsIx.getString("INDEX_NAME")
        val colName = rsIx.getString("COLUMN_NAME")
        if (ixName != null && colName != null)
          byIndex.getOrElseUpdate(ixName, mutable.ArrayBuffer.empty) += fold(colName)
      }
      rsIx.close()
      val uniqueSets = byIndex.values.map(_.toSeq).toSeq
        .filterNot(s => s == pks) // pk index is not a separate unique set
        .distinct
      uniques(fold(tn)) = uniqueSets
    }

    IntrospectedSchema(tables.toSeq, references.toSeq, uniques.toMap, notNulls.toMap)
  }
}
