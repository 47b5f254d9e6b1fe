package graft

import org.apache.spark.sql.functions._

import graft.core.{Catalog, ForeignKey, TableGraph}
import graft.operators.Closure

class ClosureSpec extends SparkSpec {
  private lazy val cat = Catalog.tpch(spark, sfDir)

  test("pull selects exactly the referenced rows") {
    val partialOrders = cat.table("orders").where(col("o_totalprice") > 400000)
    val pulled = Closure.pull(cat.table("customer"), partialOrders,
      ForeignKey("orders", "o_custkey", "customer", "c_custkey"))
    val expected = partialOrders.select("o_custkey").distinct().count()
    // every referenced custkey exists in customer (FK integrity of testdata)
    assert(pulled.count() === expected)
  }

  test("relatedData closes over multi-hop FK chains") {
    val seed = cat.table("lineitem").where(col("l_quantity") === 50)
    val sel = Closure.relatedData(cat, partial = Map("lineitem" -> seed))
    // the closure must have pulled every table on a path from lineitem
    assert(Set("orders", "customer", "nation", "region", "part", "supplier")
      .subsetOf(sel.keySet))
    // consistency: every l_orderkey in the seed exists in pulled orders
    val missing = seed.select(col("l_orderkey").as("k")).distinct()
      .join(sel("orders"), col("k") === col("o_orderkey"), "left_anti")
    assert(missing.count() === 0)
  }

  test("relatedData skips pulls into full tables and rejects overlap") {
    val seed = cat.table("orders").where(col("o_totalprice") > 400000)
    val sel = Closure.relatedData(cat, fullTables = Seq("customer"),
      partial = Map("orders" -> seed))
    assert(!sel.contains("customer")) // dumped whole, never pulled into
    // but customer (full) still pulls its own FKs → nation selected
    assert(sel.contains("nation"))
    intercept[IllegalArgumentException] {
      Closure.relatedData(cat, fullTables = Seq("orders"), partial = Map("orders" -> seed))
    }
  }

  test("recursiveClosure reaches all ancestors and terminates") {
    val base = cat.table("customer")
      .withColumn("c_mgrkey", floor(col("c_custkey") / 2).cast("long"))
    // ancestors of 100: 50,25,12,6,3,1,0 — and 0 is its own manager
    // (floor(0/2)=0), so the self-loop must not spin the iteration.
    val seed = base.where(col("c_custkey") === 100)
    val closed = Closure.recursiveClosure(base, seed,
      ForeignKey("customer", "c_mgrkey", "customer", "c_custkey"), Seq("c_custkey"))
    val keys = closed.select("c_custkey").collect().map(_.getLong(0)).toSet
    assert(keys === Set(100L, 50L, 25L, 12L, 6L, 3L, 1L, 0L))
  }

  test("recursiveClosure matches BFS reachability on seeded random graphs") {
    import spark.implicits._
    // random parent pointers with cycles and self-loops — the shapes a
    // real org/category hierarchy degrades into; compare the fixpoint
    // against a direct BFS over the parent relation
    val rnd = new scala.util.Random(31)
    val n = 200
    val rows = Seq.tabulate(n)(i => (i.toLong, rnd.nextInt(n).toLong))
    val base = rows.toDF("id", "parent")
    val parentOf = rows.toMap
    def bfs(start: Long): Set[Long] = {
      var seen = Set(start)
      var frontier = Set(start)
      while (frontier.nonEmpty) {
        val next = frontier.map(parentOf).diff(seen)
        seen ++= next
        frontier = next
      }
      seen
    }
    for (start <- Seq(0L, 17L, 123L, 199L)) {
      val seed = base.where(col("id") === start)
      val got = Closure.recursiveClosure(base, seed,
          ForeignKey("t", "parent", "t", "id"), Seq("id"))
        .select("id").collect().map(_.getLong(0)).toSet
      assert(got === bfs(start), s"closure from $start diverged from BFS")
    }
  }

  test("composite pull and recursive closure follow the whole key tuple") {
    import spark.implicits._
    // parent keyed (k1, k2); child references BOTH columns. A
    // first-column pull would drag (1, 'b') in; the exact pull must not.
    val parent = Seq((1L, "a", "p1"), (1L, "b", "p2"), (2L, "a", "p3"))
      .toDF("k1", "k2", "name")
    val child = Seq((10L, 1L, "a"), (11L, 3L, null)) // half-null: pulls nothing
      .toDF("id", "r1", "r2")
    val fk = ForeignKey("child", "r1", "parent", "k1", Seq(("r2", "k2")))
    val pulled = Closure.pull(parent, child, fk).collect()
    assert(pulled.map(_.getString(2)).toSeq === Seq("p1"))

    // composite self-FK: (dept, mgr) → (dept, emp) — the chain must stay
    // inside the department even where mgr ids collide across depts
    val emp = Seq(
      ("x", 1L, null.asInstanceOf[java.lang.Long]),
      ("x", 2L, java.lang.Long.valueOf(1L)),
      ("x", 3L, java.lang.Long.valueOf(2L)),
      ("y", 2L, null.asInstanceOf[java.lang.Long]), // same id 2, other dept
      ("y", 4L, java.lang.Long.valueOf(2L)))
      .toDF("dept", "emp_id", "mgr_id")
    val selfFk = ForeignKey("emp", "mgr_id", "emp", "emp_id", Seq(("dept", "dept")))
    val closed = Closure.recursiveClosure(
      emp, emp.where(col("dept") === "x" && col("emp_id") === 3),
      selfFk, Seq("dept", "emp_id"))
    val got = closed.select("dept", "emp_id").collect()
      .map(r => (r.getString(0), r.getLong(1))).toSet
    assert(got === Set(("x", 3L), ("x", 2L), ("x", 1L)),
      s"must not cross into dept y via the shared mgr id: $got")
  }

  test("relatedData converges row-wise on cyclic FK graphs") {
    // synthetic cycle: orders→customer and customer→orders (by pk);
    // row-level fixpoint must leave no dangling reference on either edge.
    val cyc = new Catalog(spark, sfDir, Seq("orders", "customer"),
      Seq(ForeignKey("orders", "o_custkey", "customer", "c_custkey"),
        ForeignKey("customer", "c_custkey", "orders", "o_orderkey")),
      Map("orders" -> Seq("o_orderkey"), "customer" -> Seq("c_custkey")))
    val seed = cyc.table("orders").where(col("o_totalprice") > 400000)
    val sel = Closure.relatedData(cyc, partial = Map("orders" -> seed))
    assert(sel.contains("orders") && sel.contains("customer"))
    val danglingCust = sel("orders").select(col("o_custkey").as("k")).distinct()
      .join(sel("customer"), col("k") === col("c_custkey"), "left_anti")
    assert(danglingCust.count() === 0)
    val danglingOrd = sel("customer").select(col("c_custkey").as("k")).distinct()
      .join(sel("orders"), col("k") === col("o_orderkey"), "left_anti")
      .join(cyc.table("orders"), col("k") === col("o_orderkey"), "left_semi")
    assert(danglingOrd.count() === 0) // every resolvable back-edge is closed
  }

  test("cyclic catalog with only full tables (no partial seeds) does not throw") {
    val cyc = new Catalog(spark, sfDir, Seq("orders", "customer"),
      Seq(ForeignKey("orders", "o_custkey", "customer", "c_custkey"),
        ForeignKey("customer", "c_custkey", "orders", "o_orderkey")),
      Map("orders" -> Seq("o_orderkey"), "customer" -> Seq("c_custkey")))
    // partial = empty: the first row-count probe sees no selections yet —
    // the guarded totalRows must return 0, not throw on an empty reduce
    val sel = Closure.relatedData(cyc, fullTables = Seq("orders", "customer"))
    // full tables are never pulled *into*, so nothing is selected
    assert(sel.isEmpty)
  }

  test("topo levels respect every FK edge") {
    val lv = TableGraph.loadLevels(cat.tables, cat.foreignKeys)
    cat.foreignKeys.filterNot(_.isRecursive).foreach { fk =>
      assert(lv(fk.table) > lv(fk.foreignTable), s"$fk violates load order")
    }
    assert(TableGraph.loadOrder(cat.tables, cat.foreignKeys).head === "documents")
  }

  test("loadLevels detects cycles") {
    val fks = Seq(ForeignKey("a", "x", "b", "y"), ForeignKey("b", "y", "a", "x"))
    intercept[IllegalArgumentException] {
      TableGraph.loadLevels(Seq("a", "b"), fks)
    }
  }

  test("rowCount answers from parquet footers and matches count()") {
    // exactness: the footer sum IS the scan count, for a single-file and
    // a multi-file table alike
    for (t <- Seq("region", "lineitem", "documents"))
      assert(cat.rowCount(t) === cat.table(t).count(), t)
    intercept[IllegalArgumentException] { cat.rowCount("nope") }
  }
}
