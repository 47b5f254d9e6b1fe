package graft

import java.sql.DriverManager

import org.apache.spark.sql.functions.col

import graft.core.{Catalog, ForeignKey}
import graft.sources.{Dump, DumpSpec, Jdbc, JdbcConfig}

/** The reference's headline use case end-to-end: point the engine at a LIVE
  * database (embedded Derby standing in for Postgres), introspect its FK/PK
  * metadata from DatabaseMetaData — no hand-declared `--fk`/`--pk` — run the
  * FK-closed partial dump, and load the dump back into a second
  * FK-enforcing database (mirror of xdump/postgresql.py:66 + base.py:87).
  */
class JdbcCatalogSpec extends SparkSpec {

  private val DerbyDriver = "org.apache.derby.jdbc.EmbeddedDriver"

  private def cfgFor(db: String) = JdbcConfig(
    url = s"jdbc:derby:$db", user = "app", password = "app",
    driver = DerbyDriver, numPartitions = 4)

  /** CREATE the FK-constrained star schema in a fresh Derby db. INT keys on
    * purpose: exercises the non-BIGINT bounds probe in partitioned reads.
    */
  private def createSchema(db: String): Unit = {
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE REGION (R_ID INT PRIMARY KEY, R_NAME VARCHAR(32))")
      st.execute("CREATE TABLE NATION (N_ID INT PRIMARY KEY, N_NAME VARCHAR(32), " +
        "N_RID INT REFERENCES REGION(R_ID))")
      st.execute("CREATE TABLE CUST (C_ID INT PRIMARY KEY, C_NAME VARCHAR(32), " +
        "C_NID INT REFERENCES NATION(N_ID))")
      st.execute("CREATE TABLE ORDERS (O_ID INT PRIMARY KEY, O_TOTAL DOUBLE, " +
        "O_CID INT REFERENCES CUST(C_ID))")
      st.close()
    } finally conn.close()
  }

  private def insertData(db: String): Unit = {
    val conn = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("INSERT INTO REGION VALUES (1, 'emea'), (2, 'apac')")
      st.execute("INSERT INTO NATION VALUES (1, 'de', 1), (2, 'fr', 1), (3, 'jp', 2)")
      st.execute(
        "INSERT INTO CUST VALUES (1, 'ada', 1), (2, 'bob', 1), (3, 'eve', 2), (4, 'kai', 3)")
      st.execute("INSERT INTO ORDERS VALUES (1, 250.0, 1), (2, 50.0, 2), " +
        "(3, 120.0, 3), (4, 80.0, 1), (5, 300.0, 3), (6, 10.0, 4)")
      st.close()
    } finally conn.close()
  }

  test("introspected live-DB catalog drives the FK-closed dump end-to-end") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_cat").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    val cfg = cfgFor(db)

    // FK/PK metadata from DatabaseMetaData — nothing declared by hand.
    val cat = Catalog.jdbc(spark, cfg)
    assert(cat.tables.toSet === Set("REGION", "NATION", "CUST", "ORDERS"))
    assert(cat.primaryKey("ORDERS") === Seq("O_ID"))
    assert(cat.foreignKeys.toSet === Set(
      ForeignKey("NATION", "N_RID", "REGION", "R_ID"),
      ForeignKey("CUST", "C_NID", "NATION", "N_ID"),
      ForeignKey("ORDERS", "O_CID", "CUST", "C_ID")))

    // INT-keyed table range-partitions across executors (bounds probe must
    // accept non-BIGINT min/max); consistent mode forces one connection.
    assert(cat.table("ORDERS").rdd.getNumPartitions === 4)
    assert(Catalog.jdbc(spark, cfg, consistent = true)
      .table("ORDERS").rdd.getNumPartitions === 1)

    // FK-closed partial dump straight off the live database.
    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(
      fullTables = Seq("REGION"),
      partialTables = Map("ORDERS" -> cat.table("ORDERS").where(col("O_TOTAL") > 100))),
      dump)

    def dumped(t: String) = spark.read.parquet(s"$dump/data/$t")
    // orders 1, 3, 5 selected → customers {1, 3} pulled → nations {1, 2}.
    assert(dumped("ORDERS").select("O_ID").collect().map(_.getInt(0)).sorted === Seq(1, 3, 5))
    assert(dumped("CUST").select("C_ID").collect().map(_.getInt(0)).sorted === Seq(1, 3))
    assert(dumped("NATION").select("N_ID").collect().map(_.getInt(0)).sorted === Seq(1, 2))
    assert(dumped("REGION").count() === 2)
    assert(Dump.readManifest(spark, dump).loadOrder ===
      Seq("REGION", "NATION", "CUST", "ORDERS"))

    // Load the dump into a SECOND FK-enforcing database: manifest order
    // means parents land before children, so every constraint is satisfied.
    val db2 = s"$tmp/target"
    createSchema(db2)
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2))
    assert(Jdbc.readTable(spark, cfgFor(db2), "ORDERS").count() === 3)
    assert(Jdbc.readTable(spark, cfgFor(db2), "CUST").count() === 2)
    assert(Jdbc.readTable(spark, cfgFor(db2), "REGION").count() === 2)

    // truncate cleanup (reload over existing rows) — against the SAME
    // FK-enforcing target: the children-first DELETE pass clears
    // referencing rows before their parents, then the parent-first writes
    // re-satisfy every constraint.
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("truncate"))
    assert(Jdbc.readTable(spark, cfgFor(db2), "ORDERS").count() === 3)
    assert(Jdbc.readTable(spark, cfgFor(db2), "CUST").count() === 2)
  }

  test("recreate load into an EMPTY database restores PK/FK constraints") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_ddl").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    val dump = s"$tmp/dump"
    Dump.write(Catalog.jdbc(spark, cfgFor(db)), DumpSpec(
      fullTables = Seq("REGION"),
      partialTables = Map("ORDERS" ->
        Catalog.jdbc(spark, cfgFor(db)).table("ORDERS").where(col("O_TOTAL") > 100))),
      dump)

    // the target database exists but has NO tables — the reference's
    // recreate_database + initial_setup replay case (base.py:202, :227)
    val db2 = s"$tmp/empty"
    Class.forName(DerbyDriver)
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))

    // data arrived…
    assert(Jdbc.readTable(spark, cfgFor(db2), "ORDERS").count() === 3)
    assert(Jdbc.readTable(spark, cfgFor(db2), "REGION").count() === 2)
    // …and the PK/FK edges came back: introspecting the target yields the
    // same relational metadata the source had.
    val meta = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta.primaryKeys("ORDERS") === Seq("O_ID"))
    assert(meta.primaryKeys("REGION") === Seq("R_ID"))
    assert(meta.foreignKeys.toSet === Set(
      ForeignKey("NATION", "N_RID", "REGION", "R_ID"),
      ForeignKey("CUST", "C_NID", "NATION", "N_ID"),
      ForeignKey("ORDERS", "O_CID", "CUST", "C_ID")))
    // the restored constraints ENFORCE: an orphan order must be refused
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO ORDERS VALUES (99, 1.0, 404)")
      }
      st.close()
    } finally conn.close()
  }

  test("recreate load restores secondary indexes and column defaults (pg_dump -s parity)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_ixdef").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    // dress the source with the pg_dump -s surface a PK/FK-only dump
    // loses: a defaulted column, a plain secondary index, a unique index
    val conn0 = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn0.createStatement()
      st.execute("ALTER TABLE CUST ADD COLUMN C_TIER VARCHAR(16) DEFAULT 'basic'")
      st.execute("CREATE INDEX ORDERS_TOTAL_IX ON ORDERS (O_TOTAL, O_CID)")
      // numeric column: the recreate target types string columns through
      // Spark's JDBC dialect (CLOB on Derby), which Derby can't index —
      // an orthogonal typing limitation of bulk recreate, not of the
      // index DDL roundtrip under test here
      st.execute("ALTER TABLE REGION ADD COLUMN R_CODE INT DEFAULT 7")
      st.execute("UPDATE REGION SET R_CODE = R_ID")
      st.execute("CREATE UNIQUE INDEX REGION_CODE_UX ON REGION (R_CODE)")
      st.close()
    } finally conn0.close()

    // introspection carries them…
    val cat = Catalog.jdbc(spark, cfgFor(db))
    assert(cat.columnDefaults("CUST")("C_TIER") === "'basic'")
    val srcIdx = cat.indexes.getOrElse("ORDERS", Seq.empty)
      .find(_.name == "ORDERS_TOTAL_IX")
    assert(srcIdx.exists(ix => !ix.unique && ix.columns === Seq("O_TOTAL", "O_CID")),
      s"expected the composite index, got ${cat.indexes}")
    assert(cat.indexes.getOrElse("REGION", Seq.empty)
      .exists(ix => ix.name == "REGION_CODE_UX" && ix.unique &&
        ix.columns === Seq("R_CODE")))
    // …and never the PK's backing index (it rides the PK constraint)
    assert(!cat.indexes.values.flatten.exists(_.columns == Seq("R_ID")))

    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(
      fullTables = Seq("REGION"),
      partialTables = Map("ORDERS" ->
        cat.table("ORDERS").where(col("O_TOTAL") > 100))), dump)

    // recreate into an EMPTY database: indexes + defaults must come back
    val db2 = s"$tmp/empty"
    Class.forName(DerbyDriver)
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))

    val meta = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta.indexes.getOrElse("ORDERS", Seq.empty)
      .exists(ix => ix.name == "ORDERS_TOTAL_IX" && !ix.unique &&
        ix.columns === Seq("O_TOTAL", "O_CID")))
    assert(meta.indexes.getOrElse("REGION", Seq.empty)
      .exists(ix => ix.name == "REGION_CODE_UX" && ix.unique))
    assert(meta.columnDefaults("CUST")("C_TIER") === "'basic'")
    // the restored default FUNCTIONS: an insert omitting the column fills it
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("INSERT INTO CUST (C_ID, C_NAME, C_NID) VALUES (99, 'zoe', 1)")
      val rs = st.executeQuery("SELECT C_TIER FROM CUST WHERE C_ID = 99")
      rs.next()
      assert(rs.getString(1) === "basic")
      rs.close()
      // the restored UNIQUE index ENFORCES: R_CODE 1 is already taken
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO REGION (R_ID, R_NAME, R_CODE) VALUES (9, 'x', 1)")
      }
      st.close()
    } finally conn.close()
  }

  test("sequence state replays onto identity-column load targets") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_seq").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    val dump = s"$tmp/dump"
    Dump.write(Catalog.jdbc(spark, cfgFor(db)), DumpSpec(
      fullTables = Seq("REGION"),
      partialTables = Map("ORDERS" ->
        Catalog.jdbc(spark, cfgFor(db)).table("ORDERS").where(col("O_TOTAL") > 100))),
      dump)

    // schema-managed target: ORDERS.O_ID is an identity column (the Derby
    // analog of a Postgres serial backed by a sequence)
    val db2 = s"$tmp/target"
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE REGION (R_ID INT PRIMARY KEY, R_NAME VARCHAR(32))")
      st.execute("CREATE TABLE NATION (N_ID INT PRIMARY KEY, N_NAME VARCHAR(32), " +
        "N_RID INT REFERENCES REGION(R_ID))")
      st.execute("CREATE TABLE CUST (C_ID INT PRIMARY KEY, C_NAME VARCHAR(32), " +
        "C_NID INT REFERENCES NATION(N_ID))")
      st.execute("CREATE TABLE ORDERS (O_ID INT GENERATED BY DEFAULT AS IDENTITY " +
        "PRIMARY KEY, O_TOTAL DOUBLE, O_CID INT REFERENCES CUST(C_ID))")
      st.close()
    } finally conn.close()

    // dumped orders are 1, 3, 5 → sequence state 5; the load replays it
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2))
    val outcomes = Dump.replaySequences(spark, dump, cfgFor(db2))
    assert(outcomes("ORDERS") === None)      // identity column: replayed
    assert(outcomes("REGION").isDefined)     // plain INT: refused, reported

    // id generation resumes PAST the loaded rows (reference: sequences.sql
    // replayed on load, postgresql.py:144) — no collision with loaded ids
    val c2 = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = c2.createStatement()
      st.execute("INSERT INTO ORDERS (O_TOTAL, O_CID) VALUES (9.0, 1)")
      val rs = st.executeQuery("SELECT max(O_ID) FROM ORDERS")
      rs.next()
      assert(rs.getInt(1) === 6)
      rs.close(); st.close()
    } finally c2.close()
  }

  test("dump/load CLI runs against a live database with no --fk/--pk flags") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_cli").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)

    graft.cli.DumpMain.run(Seq(
      "--jdbc-url", s"jdbc:derby:$db",
      "--jdbc-user", "app", "--jdbc-password", "app",
      "--jdbc-driver", DerbyDriver,
      "-o", s"$tmp/dump",
      "-f", "REGION",
      "-p", "ORDERS:SELECT * FROM ORDERS WHERE O_TOTAL > 100"), spark)
    assert(spark.read.parquet(s"$tmp/dump/data/CUST").count() === 2)

    val db2 = s"$tmp/target"
    createSchema(db2)
    graft.cli.LoadMain.run(Seq(
      "-i", s"$tmp/dump",
      "--jdbc-url", s"jdbc:derby:$db2",
      "--jdbc-user", "app", "--jdbc-password", "app",
      "--jdbc-driver", DerbyDriver), spark)
    assert(Jdbc.readTable(spark, cfgFor(db2), "CUST").count() === 2)
  }

  test("--recreate-database load wipes a polluted target database first") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_rdb").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    graft.cli.DumpMain.run(Seq(
      "--jdbc-url", s"jdbc:derby:$db",
      "--jdbc-user", "app", "--jdbc-password", "app",
      "--jdbc-driver", DerbyDriver,
      "-o", s"$tmp/dump",
      "-f", "REGION",
      "-p", "ORDERS:SELECT * FROM ORDERS WHERE O_TOTAL > 100"), spark)

    // the target db exists and carries junk the dump does NOT cover — a
    // per-table cleanup would leave LEFTOVER standing; database-level
    // recreate (≙ xload -m recreate → recreate_database, load.py:34)
    // must not
    val db2 = s"$tmp/target"
    createSchema(db2)
    val junk = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = junk.createStatement()
      st.execute("CREATE TABLE LEFTOVER (X INT)")
      st.execute("INSERT INTO LEFTOVER VALUES (7)")
      st.close()
    } finally junk.close()

    graft.cli.LoadMain.run(Seq(
      "-i", s"$tmp/dump",
      "--jdbc-url", s"jdbc:derby:$db2",
      "--jdbc-user", "app", "--jdbc-password", "app",
      "--jdbc-driver", DerbyDriver,
      "--recreate-database", db2,
      "-m", "recreate"), spark)

    assert(Jdbc.readTable(spark, cfgFor(db2), "CUST").count() === 2)
    val meta = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(!meta.tables.contains("LEFTOVER"))
    // constraint DDL replayed into the fresh database (the -m recreate path)
    assert(meta.primaryKeys("CUST") === Seq("C_ID"))

    // -m truncate alongside --recreate-database is refused BEFORE the
    // database is touched: DELETE FROM on a freshly emptied database can
    // only abort after the original data is gone
    val ex = intercept[RuntimeException] {
      graft.cli.LoadMain.run(Seq(
        "-i", s"$tmp/dump",
        "--jdbc-url", s"jdbc:derby:$db2",
        "--jdbc-user", "app", "--jdbc-password", "app",
        "--jdbc-driver", DerbyDriver,
        "--recreate-database", db2,
        "-m", "truncate"), spark)
    }
    assert(ex.getMessage.contains("cannot combine"))
  }

  test("self-referencing FK introspects and closes recursively off a live DB") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_rec").toString
    val db = s"$tmp/src"
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      // employee → manager: the reference's recursive-CTE case (base.py:253)
      st.execute("CREATE TABLE EMP (E_ID INT PRIMARY KEY, E_NAME VARCHAR(32), " +
        "E_MGR INT REFERENCES EMP(E_ID))")
      // chain 1 ← 2 ← 3 ← 4, plus isolated 10
      st.execute("INSERT INTO EMP VALUES (1, 'root', NULL), (2, 'a', 1), " +
        "(3, 'b', 2), (4, 'c', 3), (10, 'solo', NULL)")
      st.close()
    } finally conn.close()

    val cat = Catalog.jdbc(spark, cfgFor(db))
    assert(cat.foreignKeys === Seq(ForeignKey("EMP", "E_MGR", "EMP", "E_ID")))
    assert(cat.foreignKeys.head.isRecursive)

    // seed = the leaf; the dump must pull the whole management chain
    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(
      partialTables = Map("EMP" -> cat.table("EMP").where(col("E_ID") === 4))), dump)
    assert(spark.read.parquet(s"$dump/data/EMP")
      .select("E_ID").collect().map(_.getInt(0)).sorted === Seq(1, 2, 3, 4))
  }

  test("interleaved anonymous composite FKs fail loudly instead of zipping") {
    import java.lang.reflect.{InvocationHandler, Method, Proxy}
    def proxy[T](cls: Class[T])(h: (String, Array[AnyRef]) => AnyRef): T =
      Proxy.newProxyInstance(cls.getClassLoader, Array[Class[_]](cls),
        new InvocationHandler {
          def invoke(p: AnyRef, m: Method, args: Array[AnyRef]): AnyRef =
            h(m.getName, if (args == null) Array.empty else args)
        }).asInstanceOf[T]
    def rs(rows: Seq[Map[String, AnyRef]]): java.sql.ResultSet = {
      var i = -1
      proxy(classOf[java.sql.ResultSet]) { (name, args) =>
        name match {
          case "next"      => i += 1; java.lang.Boolean.valueOf(i < rows.size)
          case "getString" => rows(i).getOrElse(args(0).asInstanceOf[String], null)
          case "getShort"  => rows(i)(args(0).asInstanceOf[String])
          case _           => null
        }
      }
    }
    def fkRow(seq: Int, fc: String, pc: String): Map[String, AnyRef] = Map(
      "KEY_SEQ" -> java.lang.Short.valueOf(seq.toShort),
      // FK_NAME absent → getString returns null: the anonymous case
      "FKTABLE_NAME" -> "FACT", "FKCOLUMN_NAME" -> fc,
      "PKTABLE_NAME" -> "DIM", "PKCOLUMN_NAME" -> pc)
    def metaFor(importedKeys: Seq[Map[String, AnyRef]]): java.sql.Connection = {
      val md = proxy(classOf[java.sql.DatabaseMetaData]) { (name, args) =>
        name match {
          case "getTables" => rs(Seq(
            Map("TABLE_SCHEM" -> null, "TABLE_NAME" -> "DIM"),
            Map("TABLE_SCHEM" -> null, "TABLE_NAME" -> "FACT")))
          case "getPrimaryKeys" => rs(Nil)
          case "getImportedKeys" =>
            if (args(2) == "FACT") rs(importedKeys) else rs(Nil)
          case _ => null
        }
      }
      proxy(classOf[java.sql.Connection]) { (name, _) =>
        if (name == "getMetaData") md else null
      }
    }
    // two ANONYMOUS composite FKs into the same parent, rows interleaved in
    // the (PKTABLE, KEY_SEQ) order real drivers return: the KEY_SEQ=1
    // adjacency fallback would zip them into one garbage constraint —
    // introspection must refuse instead
    val interleaved = Seq(
      fkRow(1, "F_A", "D_A"), fkRow(1, "G_A", "D_A"),
      fkRow(2, "F_B", "D_B"), fkRow(2, "G_B", "D_B"))
    val e = intercept[IllegalArgumentException] {
      Jdbc.introspectOn(metaFor(interleaved), schema = None)
    }
    assert(e.getMessage.contains("KEY_SEQ"))
    // a single anonymous composite FK arriving consecutively still
    // reconstructs — the guard only rejects what adjacency cannot split
    val consecutive = Seq(fkRow(1, "F_A", "D_A"), fkRow(2, "F_B", "D_B"))
    val meta = Jdbc.introspectOn(metaFor(consecutive), schema = None)
    assert(meta.foreignKeys === Seq(
      ForeignKey("FACT", "F_A", "DIM", "D_A", Seq(("F_B", "D_B")))))
    // drivers wrapping SQLite's PRAGMA foreign_key_list emit 0-based
    // KEY_SEQ — a consecutive 0-based run reconstructs identically
    val zeroBased = Seq(fkRow(0, "F_A", "D_A"), fkRow(1, "F_B", "D_B"))
    assert(Jdbc.introspectOn(metaFor(zeroBased), schema = None).foreignKeys ===
      Seq(ForeignKey("FACT", "F_A", "DIM", "D_A", Seq(("F_B", "D_B")))))
    // two separate 0-based anonymous FKs split on the non-consecutive
    // boundary (second 0 after a 0,1 run)
    val twoZero = Seq(fkRow(0, "F_A", "D_A"), fkRow(1, "F_B", "D_B"),
      fkRow(0, "G_A", "D_A"))
    assert(Jdbc.introspectOn(metaFor(twoZero), schema = None).foreignKeys === Seq(
      ForeignKey("FACT", "F_A", "DIM", "D_A", Seq(("F_B", "D_B"))),
      ForeignKey("FACT", "G_A", "DIM", "D_A", Seq.empty)))
    // 0-based INTERLEAVE (0,0,1,1) splits into mixed-base fragments whose
    // stray base-1 group would pass the run check alone — the same-base
    // guard must reject the table
    val zeroInterleaved = Seq(
      fkRow(0, "F_A", "D_A"), fkRow(0, "G_A", "D_A"),
      fkRow(1, "F_B", "D_B"), fkRow(1, "G_B", "D_B"))
    val e0 = intercept[IllegalArgumentException] {
      Jdbc.introspectOn(metaFor(zeroInterleaved), schema = None)
    }
    assert(e0.getMessage.contains("KEY_SEQ"))
  }

  test("composite FK introspects whole-key and closes exactly, not as a superset") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_comp").toString
    val db = s"$tmp/src"
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE DIM (D_A INT NOT NULL, D_B INT NOT NULL, " +
        "D_NAME VARCHAR(32), PRIMARY KEY (D_A, D_B))")
      st.execute("CREATE TABLE FACT (F_ID INT PRIMARY KEY, F_A INT, F_B INT, " +
        "FOREIGN KEY (F_A, F_B) REFERENCES DIM (D_A, D_B))")
      st.execute("INSERT INTO DIM VALUES (1, 1, 'aa'), (1, 2, 'ab'), (2, 1, 'ba'), (2, 2, 'bb')")
      // fact 3 has a half-null key: per MATCH SIMPLE it references nothing
      st.execute("INSERT INTO FACT VALUES (1, 1, 1), (2, 2, 2), (3, 1, NULL)")
      st.close()
    } finally conn.close()

    // adversarial grouping case: a second composite FK from the SAME child
    // into the SAME parent — getImportedKeys orders by (PKTABLE, KEY_SEQ),
    // interleaving the two constraints' rows; grouping must reassemble
    // each by FK_NAME, not by row adjacency
    val conn2 = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn2.createStatement()
      st.execute("ALTER TABLE FACT ADD COLUMN G_A INT")
      st.execute("ALTER TABLE FACT ADD COLUMN G_B INT")
      st.execute("ALTER TABLE FACT ADD CONSTRAINT FACT_G_FK " +
        "FOREIGN KEY (G_A, G_B) REFERENCES DIM (D_A, D_B)")
      st.close()
    } finally conn2.close()

    val cat = Catalog.jdbc(spark, cfgFor(db))
    // both composite FKs reassembled whole, each with its key parts in
    // KEY_SEQ order — never a zipped mix of the two
    assert(cat.foreignKeys.toSet === Set(
      ForeignKey("FACT", "F_A", "DIM", "D_A", Seq(("F_B", "D_B"))),
      ForeignKey("FACT", "G_A", "DIM", "D_A", Seq(("G_B", "D_B")))))

    // seed = facts 1 and 3 → referenced dims = {(1,1)} ONLY: a
    // first-column pull would also drag (1,2) in; the half-null key of
    // fact 3 must pull nothing at all
    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(
      partialTables = Map("FACT" -> cat.table("FACT").where(col("F_ID") =!= 2))), dump)
    val dims = spark.read.parquet(s"$dump/data/DIM")
      .collect().map(r => (r.getInt(0), r.getInt(1))).sorted
    assert(dims === Seq((1, 1)), s"expected exact closure, got ${dims.mkString(", ")}")

    // the dumped constraint DDL carries the whole key, and a recreate load
    // into an empty database restores + enforces it
    val db2 = s"$tmp/empty"
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))
    val meta = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta.foreignKeys.toSet === Set(
      ForeignKey("FACT", "F_A", "DIM", "D_A", Seq(("F_B", "D_B"))),
      ForeignKey("FACT", "G_A", "DIM", "D_A", Seq(("G_B", "D_B")))))
    val c2 = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = c2.createStatement()
      intercept[java.sql.SQLException] {
        // (1,2) not in the dump
        st.execute("INSERT INTO FACT VALUES (99, 1, 2, NULL, NULL)")
      }
      st.close()
    } finally c2.close()
  }

  test("introspection restricted to an explicit schema") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_schema").toString
    val db = s"$tmp/src"
    createSchema(db)
    // adversarial metadata-pattern case: TXID (numeric, declared first)
    // would match the PK name T_ID as an UNESCAPED getColumns pattern
    // ('_' = any char) — the probe must match the column name exactly and
    // classify the VARCHAR key as non-partitionable
    val conn = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE TAGS (TXID INT, T_ID VARCHAR(10) PRIMARY KEY)")
      st.close()
    } finally conn.close()

    val meta = Jdbc.introspect(cfgFor(db), schema = Some("APP"))
    assert(meta.tables.toSet === Set("REGION", "NATION", "CUST", "ORDERS", "TAGS"))
    assert(meta.qualifiedNames("ORDERS") === "APP.ORDERS")
    assert(meta.partitionColumns("ORDERS") === "O_ID")
    assert(!meta.partitionColumns.contains("TAGS"))
  }

  test("jdbc catalog serializes: metadata survives, reader is transient") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_ser").toString
    val db = s"$tmp/src"
    createSchema(db)
    val cat = Catalog.jdbc(spark, cfgFor(db))
    val bytes = new java.io.ByteArrayOutputStream()
    val oos = new java.io.ObjectOutputStream(bytes)
    oos.writeObject(cat)
    oos.close()
    val back = new java.io.ObjectInputStream(
      new java.io.ByteArrayInputStream(bytes.toByteArray)).readObject()
      .asInstanceOf[Catalog]
    assert(back.tables === cat.tables)
    assert(back.primaryKey("ORDERS") === Seq("O_ID"))
    assert(back.foreignKeys === cat.foreignKeys)
  }

  test("recreate load restores VIEWS (pg_dump -s parity, after indexes)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_view").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    val conn0 = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn0.createStatement()
      st.execute("CREATE VIEW BIG_ORDERS AS " +
        "SELECT O_ID, O_TOTAL, O_CID FROM ORDERS WHERE O_TOTAL > 100")
      // a view OVER a view: replay order must respect the dependency
      st.execute("CREATE VIEW BIG_ORDER_IDS AS SELECT O_ID FROM BIG_ORDERS")
      st.close()
    } finally conn0.close()

    // introspection carries name + definition, in dependency-safe order,
    // and views never leak into the TABLE set
    val cat = Catalog.jdbc(spark, cfgFor(db))
    assert(cat.views.map(_._1) === Seq("BIG_ORDERS", "BIG_ORDER_IDS"))
    assert(!cat.tables.contains("BIG_ORDERS"))

    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(fullTables = cat.tables), dump)

    val db2 = s"$tmp/empty"
    Class.forName(DerbyDriver)
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))

    // both views exist on the target and FUNCTION over the loaded rows
    val meta2 = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta2.views.map(_._1) === Seq("BIG_ORDERS", "BIG_ORDER_IDS"))
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = conn.createStatement()
      val rs = st.executeQuery("SELECT count(*) FROM BIG_ORDER_IDS")
      rs.next()
      assert(rs.getInt(1) === 3) // orders 1 (250), 3 (120), 5 (300)
      rs.close()
      st.close()
    } finally conn.close()
  }

  test("recreate load restores CHECK constraints (closing the last pg_dump -s gap)") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_check").toString
    val db = s"$tmp/src"
    createSchema(db)
    insertData(db)
    val conn0 = DriverManager.getConnection(s"jdbc:derby:$db", "app", "app")
    try {
      val st = conn0.createStatement()
      st.execute("ALTER TABLE ORDERS ADD CONSTRAINT ORDERS_TOTAL_CK " +
        "CHECK (O_TOTAL >= 0)")
      st.close()
    } finally conn0.close()

    // introspection carries (name, clause) from SYS.SYSCHECKS
    val cat = Catalog.jdbc(spark, cfgFor(db))
    val src = cat.checks.getOrElse("ORDERS", Seq.empty)
    assert(src.exists { case (nm, cl) =>
      nm == "ORDERS_TOTAL_CK" && cl.toUpperCase.contains("O_TOTAL") },
      s"check not introspected: ${cat.checks}")

    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(fullTables = cat.tables), dump)

    val db2 = s"$tmp/empty"
    Class.forName(DerbyDriver)
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))

    // the restored constraint exists AND enforces
    val meta2 = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta2.checks.getOrElse("ORDERS", Seq.empty)
      .exists(_._1 == "ORDERS_TOTAL_CK"), s"not restored: ${meta2.checks}")
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO ORDERS VALUES (99, -5.0, 1)")
      }
      st.execute("INSERT INTO ORDERS VALUES (99, 5.0, 1)") // satisfying row loads
      st.close()
    } finally conn.close()
  }

  test("a CHECK clause containing ' FOREIGN KEY ' in a string literal replays exactly once") {
    // the replay classifier must key on statement SHAPE: a substring match
    // lands this CHECK in the FK list too, executes it twice, and the
    // duplicate ADD CONSTRAINT aborts the whole load
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_ckfk").toString
    val db = s"$tmp/src"
    Class.forName(DerbyDriver)
    val conn0 = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn0.createStatement()
      st.execute("CREATE TABLE NOTES (ID INT PRIMARY KEY, KIND VARCHAR(32))")
      st.execute("ALTER TABLE NOTES ADD CONSTRAINT NOTES_KIND_CK " +
        "CHECK (KIND <> ' FOREIGN KEY ')")
      st.execute("INSERT INTO NOTES VALUES (1, 'plain')")
      st.close()
    } finally conn0.close()

    val cat = Catalog.jdbc(spark, cfgFor(db))
    val dump = s"$tmp/dump"
    Dump.write(cat, DumpSpec(fullTables = cat.tables), dump)

    val db2 = s"$tmp/empty"
    DriverManager.getConnection(s"jdbc:derby:$db2;create=true", "app", "app").close()
    Dump.loadIntoJdbc(spark, dump, cfgFor(db2), cleanup = Some("recreate"))

    // loaded once, constraint present and enforcing the literal-bearing clause
    val meta2 = Jdbc.introspect(cfgFor(db2), schema = Some("APP"))
    assert(meta2.checks.getOrElse("NOTES", Seq.empty).exists(_._1 == "NOTES_KIND_CK"),
      s"check lost in replay: ${meta2.checks}")
    // the recreated column kept its NATIVE bounded type — without the
    // dumped _column_types.json sidecar the writer re-creates VARCHAR(32)
    // as CLOB, which Derby can't even compare in the replayed CHECK
    assert(meta2.columnSqlTypes.getOrElse("NOTES", Map.empty).get("KIND")
      === Some("VARCHAR(32)"), s"native type lost: ${meta2.columnSqlTypes}")
    val conn = DriverManager.getConnection(s"jdbc:derby:$db2", "app", "app")
    try {
      val st = conn.createStatement()
      intercept[java.sql.SQLException] {
        st.execute("INSERT INTO NOTES VALUES (2, ' FOREIGN KEY ')")
      }
      st.execute("INSERT INTO NOTES VALUES (3, 'ok')")
      st.close()
    } finally conn.close()
  }

  test("a reverse-order lookup index over the PK's columns is NOT the PK's backing index") {
    val tmp = java.nio.file.Files.createTempDirectory("graft_jdbc_revix").toString
    val db = s"$tmp/src"
    Class.forName(DerbyDriver)
    val conn = DriverManager.getConnection(s"jdbc:derby:$db;create=true", "app", "app")
    try {
      val st = conn.createStatement()
      st.execute("CREATE TABLE PAIRS (A INT NOT NULL, B INT NOT NULL, " +
        "V VARCHAR(8), PRIMARY KEY (A, B))")
      // same column SET as the PK, different ORDER — a real, distinct
      // physical structure pg_dump -s keeps; set-equality dropped it
      st.execute("CREATE INDEX PAIRS_BA_IX ON PAIRS (B, A)")
      st.close()
    } finally conn.close()
    val meta = Jdbc.introspect(cfgFor(db), schema = Some("APP"))
    val idx = meta.indexes.getOrElse("PAIRS", Seq.empty)
    assert(idx.exists(ix => ix.name == "PAIRS_BA_IX" &&
      ix.columns === Seq("B", "A")), s"reverse-order index lost: $idx")
    // the PK's own backing index still never dumps
    assert(!idx.exists(ix => ix.columns == Seq("A", "B") && ix.unique))
  }
}
