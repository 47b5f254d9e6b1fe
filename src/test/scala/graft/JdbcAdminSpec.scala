package graft

import java.sql.DriverManager

import graft.sources.{JdbcAdmin, JdbcConfig}

/** Database-level management against embedded Derby — the engine-side
  * analog of the reference's recreate_database/drop_connections
  * (xdump/postgresql.py:190–206; file-database semantics ≙ sqlite.py:114).
  */
class JdbcAdminSpec extends SparkSpec {

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"
  private def cfg = JdbcConfig(
    url = "unused-for-derby-admin", user = "app", password = "app",
    driver = DerbyDriver)

  private def withTable(db: String): Unit = {
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE T (ID INT PRIMARY KEY)")
      st.execute("INSERT INTO T VALUES (1), (2)")
      st.close()
    } finally conn.close()
  }

  private def tableCount(db: String): Int = {
    val conn = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val rs = conn.getMetaData.getTables(null, "APP", "%", Array("TABLE"))
      var n = 0
      while (rs.next()) n += 1
      rs.close()
      n
    } finally conn.close()
  }

  test("recreateDatabase empties a directory database") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_admin").toString
    val db = s"$tmp/db"
    withTable(db)
    assert(tableCount(db) === 1)

    JdbcAdmin.recreateDatabase(cfg, db)

    // the recreated database exists, is connectable, and has NO tables —
    // the reference's post-recreate_database state (base.py:202)
    assert(tableCount(db) === 0)
  }

  test("dropDatabase on a never-created database is success, not an error") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_admin_nx").toString
    JdbcAdmin.dropDatabase(cfg, s"$tmp/never_existed")
    // ≙ the reference's FileNotFoundError pass (sqlite.py:117)
  }

  test("memory: databases drop and recreate through the same surface") {
    val db = "memory:graft_admin_mem"
    withTable(db)
    assert(tableCount(db) === 1)
    JdbcAdmin.recreateDatabase(cfg, db)
    assert(tableCount(db) === 0)
    JdbcAdmin.dropDatabase(cfg, db) // cleanup; also: dropping twice is fine
  }

  test("dropConnections is a documented no-op on embedded engines") {
    assert(JdbcAdmin.dropConnections(cfg, "anything") === 0)
  }

  test("dropDatabase refuses to delete a directory that is not a Derby database") {
    val dir = java.nio.file.Files.createTempDirectory("notaderbydb")
    val precious = dir.resolve("precious.txt")
    java.nio.file.Files.writeString(precious, "do not delete")
    val ex = intercept[IllegalArgumentException] {
      JdbcAdmin.dropDatabase(cfg, dir.toString)
    }
    assert(ex.getMessage.contains("not a Derby database"))
    assert(java.nio.file.Files.exists(precious)) // nothing was touched
  }

  test("recreateDatabase works with an empty user (Derby needs no owner)") {
    val db = java.nio.file.Files.createTempDirectory("derbyadmin").toString + "/emptyuser"
    val anon = JdbcConfig(url = "unused", user = "", password = "", driver = DerbyDriver)
    JdbcAdmin.recreateDatabase(anon, db) // must not trip owner validation
    assert(new java.io.File(db, "service.properties").exists())
  }

  test("suspicious database names are refused before reaching DDL") {
    intercept[IllegalArgumentException] {
      JdbcAdmin.dropDatabase(cfg, "db; DROP TABLE users")
    }
    intercept[IllegalArgumentException] {
      JdbcAdmin.createDatabase(cfg.copy(driver = "org.postgresql.Driver"),
        "ok_name", owner = Some("evil owner"))
    }
  }
}
