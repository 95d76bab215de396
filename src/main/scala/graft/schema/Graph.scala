package graft.schema

import scala.collection.mutable

/** Insertion-ordered directed graph over table names with a `Reference`
  * payload per edge — a minimal, dependency-free stand-in for the
  * reference's use of `networkx.DiGraph` (`sql_autoloader/schema.py:240-271`).
  *
  * Iteration-order semantics are deliberately networkx-faithful, because
  * the reference's generated compare SQL is pinned by its tests
  * (`tests/test_schema.py:490`) and depends on them:
  *   - nodes iterate in insertion order,
  *   - per-node successor/predecessor lists iterate in edge-insertion order,
  *   - topological sort is FIFO Kahn seeded in node order,
  *   - longest-path DP breaks ties by first-seen maximum,
  *   - undirected BFS discovers neighbors in global edge-scan order.
  *
  * Schemas are tens of nodes, so everything here is O(V+E) pure Scala —
  * this is metadata planning on the driver, never distributed data.
  */
final class SchemaGraph private (
    val nodes: Seq[String],
    val edges: Seq[(String, String, Reference)],
) {
  private val nodeSet: Set[String] = nodes.toSet

  /** successors in edge-insertion order. */
  val succ: Map[String, Seq[String]] = {
    val m = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    nodes.foreach(n => m(n) = mutable.ArrayBuffer.empty)
    edges.foreach { case (u, v, _) => m(u) += v }
    m.view.mapValues(_.toSeq).toMap
  }

  /** predecessors in edge-insertion order. */
  val pred: Map[String, Seq[String]] = {
    val m = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    nodes.foreach(n => m(n) = mutable.ArrayBuffer.empty)
    edges.foreach { case (u, v, _) => m(v) += u }
    m.view.mapValues(_.toSeq).toMap
  }

  private val edgeData: Map[(String, String), Reference] =
    edges.map { case (u, v, r) => (u, v) -> r }.toMap

  def successors(n: String): Seq[String] = succ.getOrElse(n, Nil)
  def predecessors(n: String): Seq[String] = pred.getOrElse(n, Nil)
  def edge(u: String, v: String): Option[Reference] = edgeData.get((u, v))

  /** Edge payload ignoring direction (for undirected path walks). */
  def undirectedEdge(u: String, v: String): Option[Reference] =
    edgeData.get((u, v)).orElse(edgeData.get((v, u)))

  def isEmpty: Boolean = nodes.isEmpty

  def isAcyclic: Boolean = topologicalSortOpt.isDefined

  /** FIFO Kahn topological sort in insertion order — reproduces
    * `nx.topological_sort` iteration (schema.py:731-734, 596-598).
    */
  def topologicalSort: Seq[String] =
    topologicalSortOpt.getOrElse(
      throw new AssertionError("Provided schema is not a DAG."))

  private def topologicalSortOpt: Option[Seq[String]] = {
    val indeg = mutable.LinkedHashMap.from(nodes.map(n => n -> predecessors(n).size))
    val queue = mutable.Queue.from(nodes.filter(n => indeg(n) == 0))
    val out = mutable.ArrayBuffer.empty[String]
    while (queue.nonEmpty) {
      val n = queue.dequeue()
      out += n
      successors(n).foreach { c =>
        indeg(c) -= 1
        if (indeg(c) == 0) queue.enqueue(c)
      }
    }
    if (out.size == nodes.size) Some(out.toSeq) else None
  }

  /** Node-induced subgraph preserving original node/edge insertion
    * order — matches `nx.subgraph` view semantics.
    */
  def subgraph(keep: Seq[String]): SchemaGraph = {
    val k = keep.toSet
    new SchemaGraph(
      nodes.filter(k.contains),
      edges.filter { case (u, v, _) => k.contains(u) && k.contains(v) },
    )
  }

  /** Nodes with no incident edges (`nx.is_isolate`). */
  def isolates: Seq[String] =
    nodes.filter(n => successors(n).isEmpty && predecessors(n).isEmpty)

  /** Weakly connected components (`nx.weakly_connected_components`). */
  def weaklyConnectedComponents: Seq[Set[String]] = {
    val seen = mutable.Set.empty[String]
    val comps = mutable.ArrayBuffer.empty[Set[String]]
    nodes.foreach { start =>
      if (!seen.contains(start)) {
        val comp = mutable.Set.empty[String]
        val queue = mutable.Queue(start)
        seen += start
        while (queue.nonEmpty) {
          val n = queue.dequeue()
          comp += n
          (successors(n) ++ predecessors(n)).foreach { m =>
            if (!seen.contains(m)) { seen += m; queue.enqueue(m) }
          }
        }
        comps += comp.toSet
      }
    }
    comps.toSeq
  }

  /** Undirected adjacency in global edge-scan order (node-major,
    * out-edge minor, first-seen dedup) — reproduces
    * `DiGraph.to_undirected()` neighbor ordering.
    */
  lazy val undirectedAdjacency: Map[String, Seq[String]] = {
    val m = mutable.LinkedHashMap.empty[String, mutable.ArrayBuffer[String]]
    nodes.foreach(n => m(n) = mutable.ArrayBuffer.empty)
    nodes.foreach { u =>
      successors(u).foreach { v =>
        if (!m(u).contains(v)) m(u) += v
        if (!m(v).contains(u)) m(v) += u
      }
    }
    m.view.mapValues(_.toSeq).toMap
  }

  /** Single-source undirected BFS shortest paths, results in discovery
    * order — reproduces `nx.shortest_path(undirected, source)`
    * (schema.py:527-533).
    */
  def undirectedShortestPaths(source: String): Seq[(String, Seq[String])] = {
    val paths = mutable.LinkedHashMap[String, Seq[String]](source -> Seq(source))
    var level = Seq(source)
    while (level.nonEmpty) {
      val next = mutable.ArrayBuffer.empty[String]
      level.foreach { v =>
        undirectedAdjacency(v).foreach { w =>
          if (!paths.contains(w)) {
            paths(w) = paths(v) :+ w
            next += w
          }
        }
      }
      level = next.toSeq
    }
    paths.toSeq
  }

  /** Longest path in the DAG — faithful port of
    * `nx.dag_longest_path` (used at schema.py:515): DP over the
    * topological order, predecessor iteration in edge-insertion order,
    * ties broken by first-seen maximum, end node is the first maximum
    * in topological order.
    */
  def dagLongestPath: Seq[String] = {
    if (nodes.isEmpty) return Nil
    val dist = mutable.LinkedHashMap.empty[String, (Int, String)]
    topologicalSort.foreach { v =>
      val us = predecessors(v).map(u => (dist(u)._1 + 1, u))
      val maxu = if (us.nonEmpty) us.maxBy(_._1) else (0, v)
      dist(v) = if (maxu._1 >= 0) maxu else (0, v)
    }
    var v = dist.keys.maxBy(dist(_)._1)
    var u: String = null
    val path = mutable.ArrayBuffer.empty[String]
    while (u != v) {
      path += v
      u = v
      v = dist(v)._2
    }
    path.reverse.toSeq
  }

  /** True when `path` walks existing undirected edges (`nx.is_path`). */
  def isUndirectedPath(path: Seq[String]): Boolean =
    path.forall(nodeSet.contains) &&
      path.sliding(2).forall {
        case Seq(a, b) => undirectedEdge(a, b).isDefined
        case _         => true
      }
}

object SchemaGraph {

  /** Build from ordered tables + references; rejects references to
    * unknown tables (schema.py:252-260) and cyclic graphs
    * (schema.py:266-271).
    */
  def apply(tables: Seq[Table], references: Seq[Reference]): SchemaGraph = {
    val names = tables.map(_.name)
    val nameSet = names.toSet
    references.foreach { r =>
      if (!nameSet.contains(r.toTable))
        throw new graft.TableDoesNotExistError(
          s"Table ${r.toTable} does not appear in list of tables. Is the following reference correct?\n" +
            s"On table '${r.fromTable}':\n\t${r.fromKey} REFERENCES ${r.toTable} (${r.toKey})")
      if (!nameSet.contains(r.fromTable))
        throw new graft.TableDoesNotExistError(
          s"Table ${r.fromTable} does not appear in list of tables for reference $r")
    }
    // edge direction: referenced -> referencing (schema.py:262-264)
    val g = new SchemaGraph(
      names,
      references.map(r => (r.toTable, r.fromTable, r)),
    )
    if (!g.isAcyclic) throw new AssertionError("Provided schema is not a DAG.")
    g
  }
}
