package graft.sources

/** Database-level management — the engine-side analog of the reference's
  * `recreate_database` / `drop_connections` / `drop_database` /
  * `create_database` (xdump/postgresql.py:190–206, base.py:202,
  * sqlite.py:114). These are maintenance operations a dump/restore flow
  * occasionally owns outright: wipe the target database and load into a
  * genuinely empty one, rather than trusting per-table cleanup.
  *
  * Dialect routing (by `cfg.driver`, same rule as the constraint/sequence
  * DDL in [[Jdbc]]):
  *   - '''PostgreSQL''': `cfg.url` must point at a MAINTENANCE database
  *     (e.g. `jdbc:postgresql://host/postgres`) — an engine cannot drop the
  *     database it is connected to (the reference's separate "maintenance"
  *     connection, postgresql.py:26). `dropConnections` terminates every
  *     other backend on the target (postgresql.py:196) so the drop cannot
  *     hang on a lingering session.
  *   - '''Derby (embedded)''': a database is a directory (or a `memory:`
  *     name); `dbName` is that path, `cfg.url` is unused. Drop = engine
  *     shutdown of the single database + recursive delete (the documented
  *     Derby lifecycle — there is no DROP DATABASE statement), create =
  *     connect with `;create=true`. This is also the moral twin of the
  *     reference's SQLite file semantics (`os.remove` + reconnect,
  *     sqlite.py:114–122).
  *
  * Everything is driver-side, metadata-sized JDBC — nothing here touches an
  * executor, so cluster scale is irrelevant by construction.
  */
object JdbcAdmin {

  /** Guards identifiers interpolated into DDL (database names cannot be
    * bound as parameters). Conservative on purpose: a dump/restore target
    * named outside `[A-Za-z0-9_.:/-]` is a red flag, not a use case.
    */
  private def checkName(db: String): String = {
    require(db.nonEmpty && db.matches("[A-Za-z0-9_.:/-]+"),
      s"suspicious database name '$db' (allowed: letters, digits, _ . : / -)")
    db
  }

  private def withConnection[A](cfg: JdbcConfig)(f: java.sql.Connection => A): A = {
    Class.forName(cfg.driver)
    val props = new java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    val conn = java.sql.DriverManager.getConnection(cfg.url, props)
    try f(conn) finally conn.close()
  }

  private def isPostgres(cfg: JdbcConfig) = cfg.driver.contains("postgresql")
  private def isDerby(cfg: JdbcConfig) = cfg.driver.contains("derby")

  /** Terminates every OTHER session connected to `dbName`; returns how many
    * were told to go (≙ drop_connections, postgresql.py:196). Embedded
    * engines (Derby) have no remote sessions to terminate — their
    * connections die with the engine shutdown inside [[dropDatabase]] — so
    * this is a documented no-op returning 0.
    */
  def dropConnections(cfg: JdbcConfig, dbName: String): Int =
    if (isDerby(cfg)) 0
    else if (isPostgres(cfg)) withConnection(cfg) { conn =>
      val ps = conn.prepareStatement(
        "SELECT count(pg_terminate_backend(pid)) FROM pg_stat_activity " +
          "WHERE datname = ? AND pid <> pg_backend_pid()")
      try {
        ps.setString(1, dbName)
        val rs = ps.executeQuery()
        try { rs.next(); rs.getInt(1) } finally rs.close()
      } finally ps.close()
    }
    else throw new IllegalArgumentException(
      s"dropConnections: unsupported driver ${cfg.driver} (postgresql | derby)")

  /** Drops `dbName` if it exists (≙ drop_database, postgresql.py:203 /
    * sqlite.py:114 — both treat "absent" as success, as does this).
    */
  def dropDatabase(cfg: JdbcConfig, dbName: String): Unit = {
    checkName(dbName)
    if (isPostgres(cfg)) withConnection(cfg) { conn =>
      val st = conn.createStatement()
      try st.execute(s"DROP DATABASE IF EXISTS $dbName") finally st.close()
    }
    else if (isDerby(cfg)) dropDerby(cfg, dbName)
    else throw new IllegalArgumentException(
      s"dropDatabase: unsupported driver ${cfg.driver} (postgresql | derby)")
  }

  /** Creates `dbName` (≙ create_database, postgresql.py:207: Postgres gets
    * `WITH OWNER` defaulting to the connecting user, like the reference;
    * Derby "creates" by first connection with `;create=true`, like SQLite's
    * connect-to-create).
    */
  def createDatabase(cfg: JdbcConfig, dbName: String, owner: Option[String] = None): Unit = {
    checkName(dbName)
    if (isPostgres(cfg)) {
      // validate BEFORE any driver load / connection — a refused identifier
      // must not depend on the driver being present. Only Postgres ever
      // interpolates an owner; Derby must not trip over an empty cfg.user.
      val who = owner.getOrElse(cfg.user)
      require(who.matches("[A-Za-z0-9_]+"), s"suspicious owner '$who'")
      withConnection(cfg) { conn =>
        val st = conn.createStatement()
        try st.execute(s"CREATE DATABASE $dbName WITH OWNER $who") finally st.close()
      }
    }
    else if (isDerby(cfg)) {
      Class.forName(cfg.driver)
      java.sql.DriverManager
        .getConnection(s"jdbc:derby:$dbName;create=true", cfg.user, cfg.password)
        .close()
    }
    else throw new IllegalArgumentException(
      s"createDatabase: unsupported driver ${cfg.driver} (postgresql | derby)")
  }

  /** Drop connections → drop → create: the reference's `recreate_database`
    * composition (postgresql.py:190 → base.py:202). After this the target
    * is a genuinely empty database; load into it with
    * `Dump.loadIntoJdbc(cleanup = Some("recreate"))` so the dumped PK/FK
    * DDL replays onto the fresh tables (the drop-table pass is a no-op on
    * an empty database) — `cleanup = None` would leave the restored
    * schema constraint-less.
    */
  def recreateDatabase(cfg: JdbcConfig, dbName: String, owner: Option[String] = None): Unit = {
    dropConnections(cfg, dbName)
    dropDatabase(cfg, dbName)
    createDatabase(cfg, dbName, owner)
  }

  /** Derby drop: `memory:` databases honor `;drop=true`; directory databases
    * get a single-database shutdown (both "succeed" by raising SQLState
    * 08006 — the documented Derby contract) and then a recursive delete of
    * the directory. A database that was never created is success, matching
    * the reference's FileNotFoundError pass (sqlite.py:117). The delete
    * REFUSES a directory that exists but is not a Derby database (no
    * `service.properties` marker): a mistyped path must never be wiped
    * just because the engine said "no database there".
    */
  private def dropDerby(cfg: JdbcConfig, dbName: String): Unit = {
    Class.forName(cfg.driver)
    val suffix = if (dbName.startsWith("memory:")) ";drop=true" else ";shutdown=true"
    try {
      java.sql.DriverManager
        .getConnection(s"jdbc:derby:$dbName$suffix", cfg.user, cfg.password)
        .close()
      throw new IllegalStateException(s"derby shutdown of $dbName did not signal 08006")
    } catch {
      case e: java.sql.SQLException if e.getSQLState == "08006" => () // clean shutdown
      case e: java.sql.SQLException if e.getSQLState == "XJ004" => () // db does not exist
    }
    if (!dbName.startsWith("memory:")) {
      import java.nio.file.{Files, Path, Paths}
      val root: Path = Paths.get(dbName)
      if (Files.exists(root)) {
        require(Files.exists(root.resolve("service.properties")),
          s"refusing to delete '$dbName': directory exists but is not a Derby " +
            "database (no service.properties)")
        val all = Files.walk(root)
        try all.sorted(java.util.Comparator.reverseOrder[Path]())
          .forEach(p => Files.delete(p))
        finally all.close()
      }
    }
  }
}
