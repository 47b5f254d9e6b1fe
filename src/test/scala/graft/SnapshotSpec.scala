package graft

import java.lang.reflect.{InvocationHandler, Method, Proxy}

import scala.collection.mutable

import org.apache.spark.sql.SaveMode

import graft.core.Catalog
import graft.sources.{Jdbc, JdbcConfig, SnapshotHolder}

/** Turnkey snapshot-consistent live dump (reference: xdump/postgresql.py:66–81
  * runs the whole dump in one REPEATABLE READ transaction). Postgres itself is
  * not available here, so the protocol is specced in three separable layers:
  * the generated statements (pure), the holder-connection choreography
  * (recording java.sql proxies), and the Catalog wiring + holder lifecycle
  * (embedded Derby with an injected provider — everything downstream of
  * `pg_export_snapshot` is engine-agnostic).
  */
class SnapshotSpec extends SparkSpec {

  // --- recording JDBC proxies -------------------------------------------

  private def proxy[T](cls: Class[T])(handle: (String, Array[AnyRef]) => AnyRef): T =
    Proxy.newProxyInstance(cls.getClassLoader, Array(cls), new InvocationHandler {
      def invoke(p: Any, m: Method, a: Array[AnyRef]): AnyRef = handle(m.getName, a)
    }).asInstanceOf[T]

  /** A Connection whose export query yields `ids` (empty = no-rows failure),
    * recording every protocol-relevant call in order.
    */
  private def recordingConnection(
      calls: mutable.Buffer[String], ids: Seq[String]): java.sql.Connection = {
    val remaining = ids.iterator
    var current: String = null
    val rs = proxy(classOf[java.sql.ResultSet]) {
      case ("next", _) =>
        java.lang.Boolean.valueOf(
          if (remaining.hasNext) { current = remaining.next(); true } else false)
      case ("getString", _) => current
      case _                => null
    }
    val st = proxy(classOf[java.sql.Statement]) {
      case ("executeQuery", a) => calls += s"query:${a(0)}"; rs
      case _                   => null
    }
    proxy(classOf[java.sql.Connection]) {
      case ("setAutoCommit", a)           => calls += s"autocommit:${a(0)}"; null
      case ("setTransactionIsolation", a) => calls += s"isolation:${a(0)}"; null
      case ("createStatement", _)         => st
      case ("rollback", _)                => calls += "rollback"; null
      case ("close", _)                   => calls += "close"; null
      case _                              => null
    }
  }

  // --- generated statements ---------------------------------------------

  test("snapshot sessionInit opens the attaching transaction itself") {
    // SET TRANSACTION SNAPSHOT is only legal inside an explicit transaction
    // block, and Spark's sessionInitStatement runs on a fresh autocommit
    // connection — the statement must BEGIN, not just SET
    assert(Jdbc.snapshotSessionInit("00000003-0000001B-1") ===
      "BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY; " +
        "SET TRANSACTION SNAPSHOT '00000003-0000001B-1'")
    // server-generated ids are hex-and-dashes; anything else is rejected
    // rather than escaped into the literal
    assertThrows[IllegalArgumentException] {
      Jdbc.snapshotSessionInit("x'; DROP TABLE t; --")
    }
  }

  // --- holder-connection choreography ------------------------------------

  test("exportedSnapshot choreography: repeatable read, export, hold, rollback on close") {
    val calls = mutable.Buffer[String]()
    val holder = Jdbc.exportedSnapshotOn(
      recordingConnection(calls, Seq("00000003-0000001b-1")))

    // exporting transaction: autocommit off at REPEATABLE READ, then export
    assert(calls.toSeq === Seq(
      "autocommit:false",
      s"isolation:${java.sql.Connection.TRANSACTION_REPEATABLE_READ}",
      "query:SELECT pg_export_snapshot()"))
    assert(holder.snapshotId === "00000003-0000001b-1")
    assert(holder.sessionInit.contains("SET TRANSACTION SNAPSHOT '00000003-0000001b-1'"))
    // the holder keeps the exporting transaction OPEN (Postgres discards an
    // exported snapshot when its transaction ends)
    assert(!calls.contains("close"))

    // config rewrite for the partitioned readers
    val cfg = JdbcConfig(url = "jdbc:postgresql:x", user = "u", password = "p")
    assert(holder.config(cfg).sessionInit === Some(holder.sessionInit))

    holder.close()
    assert(calls.takeRight(2).toSeq === Seq("rollback", "close"))
  }

  test("exportedSnapshot failure path releases the connection") {
    val calls = mutable.Buffer[String]()
    assertThrows[IllegalArgumentException] {
      Jdbc.exportedSnapshotOn(recordingConnection(calls, Seq.empty)) // no rows
    }
    assert(calls.last === "close")
  }

  test("exportedSnapshot refuses non-Postgres engines loudly") {
    val derby = JdbcConfig(url = "jdbc:derby:memory:snapx;create=true",
      user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver")
    val e = intercept[IllegalArgumentException](Jdbc.exportedSnapshot(derby))
    assert(e.getMessage.contains("PostgreSQL"))
  }

  // --- Catalog wiring + holder lifecycle (Derby, injected provider) ------

  test("Catalog.jdbc(consistentSnapshot) propagates the init to reads and closes the holder") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("graft_derby_snap").toString + "/db"
    val cfg = JdbcConfig(
      url = s"jdbc:derby:$db;create=true", user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", numPartitions = 2)
    Jdbc.writeTable((1L to 10L).toDF("ID"), cfg, "t1", SaveMode.Overwrite)
    // marker table: the injected init INSERTs one row per new read
    // connection, so a nonzero count proves the init reached the readers
    Class.forName(cfg.driver)
    val setup = java.sql.DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = setup.createStatement()
      st.execute("CREATE TABLE SNAP_MARK (HIT INT)")
      st.close()
    } finally setup.close()

    // the provider's holder wraps a real (spare) connection so close()
    // semantics are observable; its init is Derby-runnable
    val spare = java.sql.DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    val provider = (c: JdbcConfig) =>
      new SnapshotHolder(spare, "fake-id", "INSERT INTO APP.SNAP_MARK VALUES (1)")

    val cat = Catalog.jdbcWith(spark, cfg, Some("APP"),
      consistent = false, consistentSnapshot = true, snapshotProvider = provider)
    assert(cat.table("T1").count() === 10)
    val marks = Jdbc.readQuery(spark, cfg, "SELECT count(*) AS N FROM APP.SNAP_MARK")
      .head().getAs[Number](0).longValue // this read itself has no init: cfg is unrewritten
    assert(marks >= 1, "sessionInit did not reach the catalog's read connections")

    // close() releases the exporting transaction's connection
    assert(!spare.isClosed)
    cat.close()
    assert(spare.isClosed)
  }
}
