package graft.core

/** Driver-side (metadata-only) analysis of the FK graph: topological load
  * order and cycle detection. The reference loads data files in archive
  * order inside one transaction (xdump/base.py:239 `load_data`); without
  * deferred constraints a referentially-safe order is dependency-first,
  * which is what this computes. The graph has O(tables) nodes — this never
  * touches row data.
  */
object TableGraph {

  /** `level(t)` = 0 for tables referencing nothing; otherwise
    * 1 + max(level of referenced tables), self-edges ignored. Loading in
    * ascending level order never violates an FK.
    */
  def loadLevels(tables: Seq[String], fks: Seq[ForeignKey]): Map[String, Int] = {
    val out: Map[String, Seq[String]] = fks
      .filterNot(_.isRecursive)
      .groupBy(_.table)
      .map { case (t, es) => t -> es.map(_.foreignTable).distinct }

    val memo = collection.mutable.Map.empty[String, Int]
    def level(t: String, stack: Set[String]): Int = memo.getOrElseUpdate(t, {
      require(!stack(t), s"FK cycle involving $t — load order undefined")
      out.getOrElse(t, Nil) match {
        case Nil => 0
        case deps => 1 + deps.map(level(_, stack + t)).max
      }
    })
    tables.map(t => t -> level(t, Set.empty)).toMap
  }

  /** Tables in a referentially-safe load order (level asc, name asc). */
  def loadOrder(tables: Seq[String], fks: Seq[ForeignKey]): Seq[String] = {
    val lv = loadLevels(tables, fks)
    tables.sortBy(t => (lv(t), t))
  }

  /** True iff the non-self FK graph has no cycle — the common case, where
    * the related-data closure converges in one reverse-topological sweep.
    */
  def isAcyclic(tables: Seq[String], fks: Seq[ForeignKey]): Boolean =
    try { loadLevels(tables, fks); true }
    catch { case _: IllegalArgumentException => false }
}
