package graft.schema

import scala.collection.mutable

import graft._

/** Database-schema planner — the Spark-side port of the reference's
  * `Schema` class (`sql_autoloader/schema.py:237-745`): column→table
  * resolution, relevant-table discovery (incl. linking-table walk),
  * load-instruction scheduling, and compare-query join-path planning.
  *
  * All of this is driver-side metadata planning over a DAG of tens of
  * nodes; the DataFrames it orchestrates stay distributed.
  */
final class Schema(tables: Seq[Table], references: Seq[Reference]) {

  val graph: SchemaGraph = SchemaGraph(tables, references)
  private val tableByName: Map[String, Table] =
    tables.map(t => t.name -> t).toMap

  // ---- Private helpers

  /** schema.py:275-294 */
  def getTable(tableName: String): Table =
    tableByName.getOrElse(
      tableName,
      throw new TableDoesNotExistError(
        s"table '$tableName' does not appear in schema."))

  /** Reverse column→tables index, node order (schema.py:718-729). */
  private lazy val columnTableMapping: Map[String, Seq[String]] = {
    val m = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    graph.nodes.foreach { tn =>
      getTable(tn).columnsAndForeignKeys.foreach { c =>
        m.getOrElseUpdate(c, mutable.ArrayBuffer.empty) += tn
      }
    }
    m.view.mapValues(_.toSeq).toMap
  }

  private lazy val topologicalSort: Seq[String] = graph.topologicalSort

  /** Bare or `table.column`-prefixed name → owning table
    * (schema.py:296-332).
    */
  def getTableNameByColumn(columnName: String): String = {
    if (columnName.contains(".")) {
      val tableName = columnName.split("\\.", 2)(0)
      val table = getTable(tableName)
      if (!table.contains(columnName))
        throw new NoSuchColumnForTableError(
          s"Columns '$columnName' does not exist for $tableName.")
      return table.name
    }
    columnTableMapping.get(columnName) match {
      case None =>
        throw new NoSuchColumnInSchemaError(
          s"No column with name '$columnName' appears anywhere in the schema.\n" +
            "Note, the loader does not allow directly setting primary keys.")
      case Some(ts) if ts.size > 1 =>
        throw new ColumnIsAmbiguousError(
          s"Column name '$columnName' is ambiguous, as it appears on tables '$ts'.\n" +
            "Please prefix the column name with the correct table using the format <table>.<column>.")
      case Some(ts) => ts.head
    }
  }

  /** Prefixed→bare rename pairs for this table restricted to `columns`
    * (schema.py:334-354), in table declaration order.
    */
  private def getTablePrefixMap(
      tableName: String, columns: Seq[String]): Seq[(String, String)] = {
    val wanted = columns.toSet
    getTable(tableName).prefixColumnMap.filter(p => wanted.contains(p._1))
  }

  /** Tables named by `columns` (sorted-unique, matching
    * `more_itertools.unique`) plus linking tables whose predecessors
    * are all already included, walked in topological order
    * (schema.py:356-397). The reference's subgraph-isomorphism sanity
    * assert (schema.py:392-395) is intentionally dropped — the
    * reference itself doubts it (schema.py:391).
    */
  def getRelevantTables(columns: Seq[String]): Seq[String] = {
    val tablesBuf = mutable.ArrayBuffer.from(
      columns.map(getTableNameByColumn).distinct.sorted)
    topologicalSort.foreach { node =>
      if (!tablesBuf.contains(node) && getTable(node).isLinking &&
        graph.predecessors(node).forall(tablesBuf.contains))
        tablesBuf += node
    }
    tablesBuf.toSeq
  }

  /** schema.py:399-421 */
  private def parseColumns(table: Table, columns: Seq[String]): Seq[String] = {
    if (columns.isEmpty)
      throw new EmptyColumnListError("Provided list of columns cannot be empty")
    if (!columns.exists(table.contains))
      throw new ColumnsDoNotExistOnTableError(
        s"None of '$columns' exist in table '${table.name}'. Table schema is:\n$table")
    table.getCommonColumns(columns)
  }

  // ---- Public methods

  /** schema.py:425-429 */
  def checkSchemaNotEmpty(): Unit =
    if (isEmpty)
      throw new EmptySchemaError("Database does not contain any tables.")

  def isEmpty: Boolean = graph.isEmpty

  /** Natural (non-key) columns of a table (schema.py:431-443). */
  def getColumns(tableName: String): Seq[String] = getTable(tableName).columns

  /** Auto-generate the multi-way LEFT JOIN reconstruction query
    * (schema.py:445-576): longest DAG path as the join spine, missing
    * tables spliced in as out-and-back loops along undirected shortest
    * paths (preferring targets whose path covers the most missing
    * tables), then an edge walk producing an ordered, de-duplicated
    * LEFT JOIN chain.
    *
    * @param aliasQuote quote character for output aliases — `"` matches
    *   the reference/ANSI exactly (`tests/test_schema.py:490`); pass
    *   "`" to produce Spark-SQL-parsable text.
    */
  def getCompareQuery(
      columns: Seq[String],
      where: Option[String] = None,
      aliasQuote: String = "\"",
  ): String = {
    val whereClause = where.map("\n" + _).getOrElse("")

    val relevant = getRelevantTables(columns)
    val sub = graph.subgraph(relevant)

    if (relevant.size > 1 && sub.isolates.nonEmpty)
      throw new IsolatedTablesError(
        s"Automatic compare query generation cannot handle any isolated tables, but '${sub.isolates}' " +
          s"do not link to any other table when considering '$relevant'.")

    if (relevant.size > 1 && sub.weaklyConnectedComponents.size > 1)
      throw new IsolatedSubgraphsError(
        "Automatic compare query generation cannot handle isolated subgraphs, but found weakly " +
          s"connected components: '${sub.weaklyConnectedComponents}'")

    // --- SELECT clause (schema.py:489-503)
    val selectColumns = relevant.flatMap(t => getTable(t).getPrefixedColumns(columns))
    val selectAliases = selectColumns.map { case (prefixed, original) =>
      s"$prefixed as $aliasQuote$original$aliasQuote"
    }
    val selectClause = s"SELECT\n${selectAliases.mkString(",\n")}"

    val joinClause =
      if (relevant.size == 1) s"FROM ${relevant.head}" // schema.py:505-508
      else {
        // --- JOIN path (schema.py:510-574)
        var path = sub.dagLongestPath
        assert(path.nonEmpty, "only found empty base path.")

        relevant.foreach { table =>
          if (!path.contains(table)) {
            val tablePaths = sub
              .undirectedShortestPaths(table)
              .filter { case (target, _) => path.contains(target) }
            assert(tablePaths.nonEmpty, "No valid node-paths found.")
            // most missing tables covered first; stable sort keeps
            // BFS discovery order among ties (schema.py:536-542)
            val target = tablePaths
              .sortBy { case (_, p) => -p.count(n => !path.contains(n)) }
              .head._1
            val targetPath = tablePaths.find(_._1 == target).get._2
            val index = path.indexOf(target) + 1
            val loop = targetPath.reverse ++ targetPath
            path = uniqueJustseen(path.take(index) ++ loop ++ path.drop(index))
          }
        }

        assert(sub.isUndirectedPath(path),
          "Adding missing tables resulted in an invalid path.")

        val refs = uniqueEverseen(
          path.sliding(2).collect { case Seq(u, v) =>
            sub.undirectedEdge(u, v).getOrElse(
              throw new AssertionError(s"No reference on path edge ($u,$v)"))
          }.toSeq)
        val joinTables = uniqueEverseen(path)
        val joinLines = joinTables.tail.zip(refs).map { case (t, r) =>
          s"LEFT JOIN $t ${r.joinSql}"
        }
        s"\nFROM ${joinTables.head}\n${joinLines.mkString("\n")}"
      }

    selectClause + joinClause + whereClause
  }

  /** Partition the relevant subgraph, in topological order, into
    * insert-and-retrieve steps (table has a pk AND successors in the
    * subgraph — its generated ids are needed downstream) vs plain
    * inserts (schema.py:578-651). The FK alias for a retrieved table
    * comes from its out-edges; disagreeing aliases raise
    * [[graft.AmbiguousAliasesError]].
    */
  def getLoadInstructions(columns: Seq[String]): LoadInstructions = {
    val relevant = getRelevantTables(columns)
    val sub = graph.subgraph(relevant)
    val order = sub.topologicalSort

    val insertAndRetrieve = mutable.ArrayBuffer.empty[InsertAndRetrieveSpec]
    val insert = mutable.ArrayBuffer.empty[InsertSpec]

    order.foreach { table =>
      val prefixMap = getTablePrefixMap(table, columns)
      val successors = sub.successors(table)
      if (getTable(table).hasPrimaryKey && successors.nonEmpty) {
        val aliases = successors.flatMap(child => graph.edge(table, child))
          .map(_.fromKey)
        assert(aliases.nonEmpty,
          s"No aliases were found, despite table '$table' having a primary key and successors '$successors'.")
        if (aliases.distinct.size > 1)
          throw new AmbiguousAliasesError(
            s"Table '$table' is referred to by multiple aliases: '$aliases', which alias to use is " +
              "ambiguous. Either use a consistent alias or insert data manually.")
        insertAndRetrieve += InsertAndRetrieveSpec(table, aliases.head, prefixMap)
      } else insert += InsertSpec(table, prefixMap)
    }
    LoadInstructions(insertAndRetrieve.toSeq, insert.toSeq)
  }

  /** schema.py:653-671 */
  def parseInsert(tableName: String, columns: Seq[String]): Seq[String] =
    parseColumns(getTable(tableName), columns)

  /** schema.py:673-714 */
  def parseRetrieve(
      tableName: String, alias: String, columns: Seq[String],
  ): (String, Seq[String]) = {
    val table = getTable(tableName)
    if (!table.hasPrimaryKey)
      throw new NoPrimaryKeyError(
        s"Table '$tableName' does not have a primary key. It does not make sense to retrieve ids from it.")
    val outRefs = graph.successors(tableName)
      .flatMap(child => graph.edge(tableName, child))
    assert(outRefs.nonEmpty,
      s"Table '$tableName' has a primary key but is not connected to any edges.")
    if (!outRefs.map(_.fromKey).contains(alias))
      throw new AliasDoesNotExistError(
        s"Alias '$alias' does not appear anywhere in the schema for table '$tableName'.")
    (table.primaryKey, parseColumns(table, columns))
  }

  override def toString: String =
    graph.nodes.map(n => getTable(n).toString).mkString("\n")

  // ---- small order-preserving helpers (more_itertools ports)

  /** Collapse consecutive duplicates (`unique_justseen`). */
  private def uniqueJustseen[A](xs: Seq[A]): Seq[A] =
    xs.foldLeft(Vector.empty[A]) { (acc, x) =>
      if (acc.nonEmpty && acc.last == x) acc else acc :+ x
    }

  /** First-seen-order dedup (`unique_everseen`). */
  private def uniqueEverseen[A](xs: Seq[A]): Seq[A] = {
    val seen = mutable.Set.empty[A]
    xs.filter(x => seen.add(x))
  }
}
