package graft

import org.scalacheck.{Gen, Prop, Properties}
import org.scalacheck.Prop.propBoolean

import graft.core.{ForeignKey, TableGraph}

/** Property-based coverage of the driver-side FK-graph analysis: the load
  * order must respect EVERY edge of ANY acyclic schema (not just the TPC-H
  * fixture), and any cycle must be detected. Generators build random DAGs
  * by only allowing edges from a higher-indexed table to a lower-indexed
  * one — acyclic by construction.
  */
object TableGraphProps extends Properties("TableGraph") {

  private def tableNames(n: Int): Seq[String] = (0 until n).map(i => s"t$i")

  /** Random DAG: edges t_i → t_j with i > j only. */
  private val genDag: Gen[(Seq[String], Seq[ForeignKey])] = for {
    n <- Gen.choose(2, 12)
    tables = tableNames(n)
    edges <- Gen.listOf(for {
      i <- Gen.choose(1, n - 1)
      j <- Gen.choose(0, i - 1)
    } yield ForeignKey(s"t$i", "c", s"t$j", "id"))
  } yield (tables, edges.distinct)

  property("loadOrder puts every referenced table before its referencer") =
    Prop.forAll(genDag) { case (tables, fks) =>
      val order = TableGraph.loadOrder(tables, fks)
      val pos = order.zipWithIndex.toMap
      order.toSet == tables.toSet &&
        fks.filterNot(_.isRecursive)
          .forall(fk => pos(fk.foreignTable) < pos(fk.table))
    }

  property("loadLevels: level(t) = 1 + max level of referenced tables") =
    Prop.forAll(genDag) { case (tables, fks) =>
      val lv = TableGraph.loadLevels(tables, fks)
      tables.forall { t =>
        val deps = fks.filter(fk => fk.table == t && !fk.isRecursive)
          .map(_.foreignTable).distinct
        if (deps.isEmpty) lv(t) == 0
        else lv(t) == 1 + deps.map(lv).max
      }
    }

  property("acyclic DAGs (self-edges allowed) are recognized") =
    Prop.forAll(genDag) { case (tables, fks) =>
      val withSelf = fks ++ tables.headOption.map(t => ForeignKey(t, "c", t, "id"))
      TableGraph.isAcyclic(tables, withSelf)
    }

  property("any closed 2-cycle is detected") =
    Prop.forAll(genDag) { case (tables, fks) =>
      val cyc = fks ++ Seq(
        ForeignKey(tables.head, "c", tables.last, "id"),
        ForeignKey(tables.last, "c", tables.head, "id"))
      !TableGraph.isAcyclic(tables, cyc) &&
        Prop.throws(classOf[IllegalArgumentException])(
          TableGraph.loadLevels(tables, cyc))
    }
}
