package graft

import org.apache.spark.sql.SaveMode

import graft.sources.{Jdbc, JdbcConfig}

/** End-to-end JDBC source/sink exercise against embedded Apache Derby
  * (ships with Spark for the Hive metastore — no network, no server).
  * Uppercase column names sidestep Derby's case-folding of unquoted
  * identifiers in the min/max bounds probe.
  */
class JdbcSpec extends SparkSpec {

  test("jdbc write + partitioned read roundtrip against embedded Derby") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("graft_derby").toString + "/testdb"
    val cfg = JdbcConfig(
      url = s"jdbc:derby:$db;create=true", user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", numPartitions = 4)

    val src = (1L to 100L).map(i => (i, s"name_$i", i * 1.5)).toDF("ID", "LABEL", "AMOUNT")
    Jdbc.writeTable(src, cfg, "t1", SaveMode.Overwrite) // creates the table

    // range-partitioned read: bounds from the min/max probe, 4 partitions
    val back = Jdbc.readTable(spark, cfg, "t1", partitionColumn = Some("ID"))
    assert(back.rdd.getNumPartitions === 4)
    assert(back.count() === 100)
    assert(back.orderBy("ID").collect().map(_.getLong(0)).toSeq === (1L to 100L))

    // arbitrary selection query (the partial_tables entry point)
    val q = Jdbc.readQuery(spark, cfg, "SELECT ID, LABEL FROM t1 WHERE ID <= 10")
    assert(q.count() === 10)

    // Overwrite = truncate-then-load (the reference's cleanup path)
    Jdbc.writeTable(src.limit(5), cfg, "t1", SaveMode.Overwrite)
    assert(Jdbc.readTable(spark, cfg, "t1").count() === 5)

    // Append adds without clearing
    Jdbc.writeTable(src.limit(3), cfg, "t1", SaveMode.Append)
    assert(Jdbc.readTable(spark, cfg, "t1").count() === 8)
  }

  test("sessionInit SQL runs on every read connection") {
    import spark.implicits._
    val db = java.nio.file.Files.createTempDirectory("graft_derby_si").toString + "/db"
    val cfg = JdbcConfig(
      url = s"jdbc:derby:$db;create=true", user = "app", password = "app",
      driver = "org.apache.derby.jdbc.EmbeddedDriver", numPartitions = 2)
    Jdbc.writeTable((1L to 10L).toDF("ID"), cfg, "t1", SaveMode.Overwrite)

    // schema-qualified via the per-connection init statement (the Postgres
    // deployment passes SET TRANSACTION SNAPSHOT here — same mechanism)
    val init = cfg.copy(sessionInit = Some("SET SCHEMA APP"))
    assert(Jdbc.readTable(spark, init, "t1", partitionColumn = Some("ID")).count() === 10)

    // a failing init statement surfaces (proves it actually executes)
    val bad = cfg.copy(sessionInit = Some("SET SCHEMA NO_SUCH_SCHEMA"))
    assertThrows[Exception] {
      Jdbc.readTable(spark, bad, "t1").count()
    }

    // and the init shapes what the partitioned connections READ: a second
    // schema's same-named table is reachable only through the redirect, so
    // seeing exactly its rows proves every connection (bounds probe
    // included) ran the statement
    Class.forName(cfg.driver)
    val conn = java.sql.DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE SCHEMA OTHER")
      st.execute("CREATE TABLE OTHER.T1 (ID BIGINT)")
      st.execute("INSERT INTO OTHER.T1 VALUES (41), (42)")
      st.close()
    } finally conn.close()
    val redirected = cfg.copy(sessionInit = Some("SET SCHEMA OTHER"))
    assert(Jdbc.readTable(spark, redirected, "t1", partitionColumn = Some("ID"))
      .collect().map(_.getLong(0)).sorted.toSeq === Seq(41L, 42L))
  }

  test("charSqlType renders real lengths, drops sentinel 'unbounded' sizes") {
    assert(Jdbc.charSqlType("VARCHAR", 25) === Some("VARCHAR(25)"))
    assert(Jdbc.charSqlType("bpchar", 1) === Some("CHAR(1)"))
    assert(Jdbc.charSqlType("TEXT", 100) === None)
    assert(Jdbc.charSqlType("VARCHAR", 0) === None)
    // PostgreSQL JDBC reports COLUMN_SIZE=2147483647 for a bare varchar;
    // rendering it verbatim produced VARCHAR(2147483647), which exceeds
    // PG's 10485760 cap and aborted the whole recreate — sentinel sizes
    // must fall back to the dialect default (TEXT)
    assert(Jdbc.charSqlType("VARCHAR", Int.MaxValue) === None)
    assert(Jdbc.charSqlType("VARCHAR", 10485760) === None)
    assert(Jdbc.charSqlType("VARCHAR", 10485759) === Some("VARCHAR(10485759)"))
  }
}
