package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

import graft.core.{Catalog, ForeignKey}

/** Related-data closure — the reference's core algorithm, re-expressed as
  * Spark logical plans.
  *
  * The reference rewrites per-table SQL strings: for each FK of a selected
  * table it appends `UNION SELECT * FROM ftable WHERE fcol IN (SELECT col
  * FROM source)` and recurses (xdump/base.py:138
  * `update_non_recursive_relations`, base.py:154 `get_related_data_sql`);
  * self-FKs become a recursive CTE (base.py:253 `RECURSIVE_QUERY_TEMPLATE`).
  *
  * Here each pull is a LEFT SEMI join on the FK key — Catalyst turns small
  * key sets into broadcast-hash semi-joins and AQE handles the rest — and
  * the fixpoint runs over the *plan* graph on the driver (metadata-sized),
  * never collecting row data. Selections accumulate as `UNION` +
  * PK-dropDuplicates (cheaper than whole-row distinct, same semantics since
  * a PK identifies the row).
  */
object Closure {

  /** Max fixpoint sweeps for cyclic (non-self) FK graphs. DAGs converge in
    * one reverse-topological sweep; cycles are rare in real schemas and
    * bounded by this.
    */
  private val MaxSweeps = 10

  /** Computes the FK-closed selection set.
    *
    * @param fullTables tables dumped whole: they act as pull *sources* but
    *                   are never pulled *into* (xdump/base.py:150)
    * @param partial    seed selection per table (any DataFrame with the
    *                   table's schema)
    * @return final selection per partial table (full tables excluded — the
    *         caller dumps those with `catalog.table(t)`)
    */
  def relatedData(
      catalog: Catalog,
      fullTables: Seq[String] = Nil,
      partial: Map[String, DataFrame] = Map.empty): Map[String, DataFrame] = {
    val overlap = fullTables.toSet.intersect(partial.keySet)
    require(overlap.isEmpty, s"partial tables also listed as full: ${overlap.mkString(", ")}")

    val full = fullTables.toSet
    var selections: Map[String, DataFrame] = partial

    // One sweep: every selected table pushes rows across each outgoing FK.
    // Sweeping tables in reverse topological order (facts before the dims
    // they reference) makes a single sweep complete for DAG schemas.
    def sweep(): Boolean = {
      var changed = false
      val order = graft.core.TableGraph
        .loadOrder(catalog.tables, catalog.foreignKeys)
        .reverse
      for (t <- order if full(t) || selections.contains(t)) {
        // Self-FK first, exactly like update_partial_tables (base.py:127):
        // the recursive pull can widen the seed that non-recursive FKs see.
        for (fk <- catalog.foreignKeysOf(t, full, recursive = true)
             if selections.contains(t)) {
          selections += t -> recursiveClosure(
            catalog.table(t), selections(t), fk, catalog.primaryKey(t))
        }
        for (fk <- catalog.foreignKeysOf(t, full)) {
          val source = if (full(t)) catalog.table(t) else selections(t)
          val pulled = pull(catalog.table(fk.foreignTable), source, fk)
          val merged = selections.get(fk.foreignTable) match {
            case Some(existing) =>
              existing.unionByName(pulled)
                .dropDuplicates(catalog.primaryKey(fk.foreignTable))
            case None => pulled
          }
          if (!selections.contains(fk.foreignTable)) changed = true
          selections += fk.foreignTable -> merged
        }
      }
      changed
    }

    // DAG schemas: the reverse-topo sweep converges immediately; `changed`
    // only reports *new* tables entering the selection set, which is what a
    // cyclic graph needs to keep sweeping for.
    var sweeps = 0
    var changed = true
    while (changed && sweeps < MaxSweeps) { changed = sweep(); sweeps += 1 }
    selections
  }

  /** One FK pull: rows of `foreignTable` referenced by `source` —
    * `SELECT * FROM f WHERE fcol IN (SELECT col FROM source)` as a semi-join
    * (xdump/base.py:154).
    */
  def pull(foreignTable: DataFrame, source: DataFrame, fk: ForeignKey): DataFrame =
    foreignTable.join(
      source.select(col(fk.column).alias("__graft_key")).where(col("__graft_key").isNotNull),
      foreignTable(fk.foreignColumn) === col("__graft_key"),
      "left_semi")

  /** Transitive closure along a self-FK (xdump/base.py:253
    * `RECURSIVE_QUERY_TEMPLATE`): seed rows plus every ancestor reachable by
    * repeatedly following `fk.column → fk.foreignColumn` within the same
    * table.
    *
    * Semi-naive iteration: each step semi-joins the table against only the
    * previous frontier's keys, anti-joins out already-seen rows, and stops
    * when the frontier empties. Iteration count is the hierarchy *depth*
    * (log n for tree-shaped data), not the row count. Frontiers are
    * localCheckpointed to cut lineage growth.
    */
  def recursiveClosure(
      table: DataFrame,
      seed: DataFrame,
      fk: ForeignKey,
      primaryKey: Seq[String],
      maxDepth: Int = 100): DataFrame = {
    require(fk.isRecursive, s"$fk is not a self-FK")

    var acc = seed.dropDuplicates(primaryKey).localCheckpoint()
    var frontier = acc
    var depth = 0
    var converged = false
    while (!converged && depth < maxDepth) {
      // Parents of the frontier...
      val parents = table.join(
        frontier.select(col(fk.column).alias("__graft_key"))
          .where(col("__graft_key").isNotNull).distinct(),
        table(fk.foreignColumn) === col("__graft_key"),
        "left_semi")
      // ...minus rows already accumulated (semi-naive delta). Aliased key
      // columns avoid self-join ambiguity (both sides share lineage).
      val accKeys = acc.select(primaryKey.map(k => col(k).alias(s"__graft_acc_$k")): _*)
      val delta = parents
        .join(accKeys,
          primaryKey.map(k => parents(k) <=> col(s"__graft_acc_$k")).reduce(_ && _),
          "left_anti")
        .localCheckpoint()
      if (delta.isEmpty) converged = true
      else {
        acc = acc.unionByName(delta).localCheckpoint()
        frontier = delta
        depth += 1
      }
    }
    acc
  }
}
