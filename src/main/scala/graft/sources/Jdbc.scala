package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

import graft.core.ForeignKey

/** Connection surface for live databases — the Spark-native counterpart of
  * the reference's PostgreSQL/SQLite backends (xdump/postgresql.py:66,
  * xdump/sqlite.py:28). Dumping from a live DB is a *partitioned* JDBC read
  * (every executor pulls a key range — the distributed replacement for a
  * single `COPY TO STDOUT`), and loading is a batched JDBC write.
  *
  * Exercised end-to-end against embedded Apache Derby (JdbcSpec,
  * JdbcCatalogSpec); the same code paths drive Postgres/MySQL/etc. with the
  * matching driver on the classpath.
  */
/** @param sessionInit SQL executed on every new read connection (Spark's
  *   `sessionInitStatement`) — the hook for server-side snapshot sharing:
  *   against Postgres, `BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ
  *   READ ONLY; SET TRANSACTION SNAPSHOT '<id>'` makes every partitioned
  *   connection read the SAME exported snapshot, restoring the reference's
  *   one-transaction consistency (postgresql.py:77) without giving up the
  *   parallel scan. [[Jdbc.exportedSnapshot]] builds this turnkey (and
  *   holds the exporting transaction open for you); set it by hand only
  *   for engines with their own snapshot-attach dialect. */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    driver: String = "org.postgresql.Driver",
    fetchSize: Int = 10000,
    batchSize: Int = 10000,
    numPartitions: Int = 32,
    sessionInit: Option[String] = None)

/** Relational metadata introspected from a live database — the engine-side
  * analog of the reference's pg_catalog / `PRAGMA foreign_key_list` queries
  * (xdump/postgresql.py:19, xdump/sqlite.py:71), obtained portably through
  * `java.sql.DatabaseMetaData` instead of per-engine SQL.
  *
  * @param tables           bare table names (unique across schemas, enforced)
  * @param foreignKeys      FK edges; composite FKs carry every key part (in
  *                         KEY_SEQ order — leading column + `moreColumns`),
  *                         so closure pulls semi-join on the whole key tuple
  *                         and select exactly the referenced rows
  * @param primaryKeys      PK columns in KEY_SEQ order
  * @param qualifiedNames   table → "SCHEMA.TABLE" as the server resolves it
  * @param partitionColumns tables whose first PK column is numeric — the
  *                         range-partitionable reads
  */
final case class DbMeta(
    tables: Seq[String],
    foreignKeys: Seq[ForeignKey],
    primaryKeys: Map[String, Seq[String]],
    qualifiedNames: Map[String, String],
    partitionColumns: Map[String, String],
    indexes: Map[String, Seq[IndexDef]] = Map.empty,
    columnDefaults: Map[String, Map[String, String]] = Map.empty,
    // (view name, definition text) in introspection order — a pg_dump -s
    // parity piece after indexes and DEFAULTs (reference postgresql.py:129
    // dumps the whole schema)
    views: Seq[(String, String)] = Nil,
    // table → (constraint name, check clause) — the last pg_dump -s piece:
    // CHECK constraints, introspected from the engine catalog (Derby
    // SYS.SYSCHECKS; H2/Postgres/MySQL INFORMATION_SCHEMA); single-column
    // IS NOT NULL rows (PG models NOT NULL as checks there) are skipped —
    // pg_dump doesn't emit those either
    checks: Map[String, Seq[(String, String)]] = Map.empty,
    // table → column → native length-parameterized character type
    // (VARCHAR(n)/CHAR(n)) — what a recreate load must pass to the JDBC
    // writer so the re-created column isn't the dialect's unbounded
    // string default (CLOB/TEXT)
    columnSqlTypes: Map[String, Map[String, String]] = Map.empty)

/** A secondary index as introspected from `DatabaseMetaData.getIndexInfo`:
  * the schema-dump parity piece a bare CREATE TABLE + PK/FK replay loses
  * (reference postgresql.py:129 — pg_dump -s carries secondary indexes).
  * Columns are in ORDINAL_POSITION order.
  */
final case class IndexDef(name: String, unique: Boolean, columns: Seq[String])

/** A server-side exported snapshot, held open by its exporting transaction —
  * the distributed re-expression of the reference's run-the-whole-dump-in-one-
  * REPEATABLE-READ-transaction guarantee (xdump/postgresql.py:77). The holder
  * connection's open transaction pins the snapshot on the server; every
  * partitioned read connection then attaches to it via
  * `SET TRANSACTION SNAPSHOT` in its `sessionInitStatement`, so all
  * partitions of all tables see the SAME point-in-time database state.
  *
  * Keep the holder open for the entire dump (Postgres discards an exported
  * snapshot when the exporting transaction ends); `close()` rolls the
  * transaction back and releases the connection. Use try-with-resources /
  * `Using`, or `Catalog.jdbc(consistentSnapshot = true)` which carries the
  * holder for you.
  */
final class SnapshotHolder private[graft] (
    conn: java.sql.Connection,
    val snapshotId: String,
    /** The per-connection init statement that attaches a new connection to
      * this snapshot. */
    val sessionInit: String) extends AutoCloseable {

  /** `cfg` rewritten so every read connection joins this snapshot. */
  def config(cfg: JdbcConfig): JdbcConfig = cfg.copy(sessionInit = Some(sessionInit))

  override def close(): Unit =
    try conn.rollback() finally conn.close()
}

object Jdbc {

  /** Exporting statement run on the holder connection (Postgres ≥ 9.2). */
  private[graft] val ExportSnapshotSql = "SELECT pg_export_snapshot()"

  /** The `sessionInitStatement` that attaches a fresh connection to an
    * exported snapshot. `SET TRANSACTION SNAPSHOT` is only legal inside an
    * explicit transaction block at the same isolation level, and Spark's
    * init statement runs on a just-opened autocommit connection — so the
    * statement must itself open the transaction (`BEGIN`), not merely `SET`
    * properties the next autocommit statement would discard. The partition's
    * SELECT then runs inside this transaction, reading the pinned snapshot.
    */
  private[graft] def snapshotSessionInit(snapshotId: String): String = {
    // ids are server-generated ("00000003-0000001B-1"); reject anything that
    // could escape the literal rather than quote-escaping blindly
    require(snapshotId.matches("[A-Fa-f0-9-]+"), s"implausible snapshot id: $snapshotId")
    s"BEGIN TRANSACTION ISOLATION LEVEL REPEATABLE READ READ ONLY; " +
      s"SET TRANSACTION SNAPSHOT '$snapshotId'"
  }

  /** Opens the holder connection and exports a snapshot — the turnkey form
    * of the consistency recipe documented on [[readTable]]. PostgreSQL-only
    * by nature (`pg_export_snapshot`); other engines need a quiesced source
    * or a frozen replica, and this fails loudly rather than pretending.
    *
    * Reference: xdump/postgresql.py:66–81 runs the whole dump inside one
    * REPEATABLE READ transaction; here that transaction is the holder, and
    * every partitioned reader joins it server-side.
    */
  def exportedSnapshot(cfg: JdbcConfig): SnapshotHolder = {
    require(cfg.driver.contains("postgresql"),
      s"exported-snapshot consistency requires PostgreSQL (pg_export_snapshot); " +
        s"driver is ${cfg.driver}. For other engines dump from a quiesced " +
        s"source or a frozen replica, or pass a dialect-appropriate " +
        s"JdbcConfig.sessionInit by hand.")
    exportedSnapshotOn(connect(cfg))
  }

  /** Protocol core, factored over an existing connection so the transaction
    * choreography is unit-testable without a Postgres server: REPEATABLE
    * READ + autocommit off (the exporting transaction must stay open),
    * export, hold.
    */
  private[graft] def exportedSnapshotOn(conn: java.sql.Connection): SnapshotHolder =
    try {
      conn.setAutoCommit(false)
      conn.setTransactionIsolation(java.sql.Connection.TRANSACTION_REPEATABLE_READ)
      val st = conn.createStatement()
      val id =
        try {
          val rs = st.executeQuery(ExportSnapshotSql)
          require(rs.next(), "pg_export_snapshot returned no rows")
          val s = rs.getString(1)
          rs.close()
          s
        } finally st.close()
      new SnapshotHolder(conn, id, snapshotSessionInit(id))
    } catch {
      case e: Throwable =>
        try conn.close() catch { case _: Throwable => () }
        throw e
    }

  private def connect(cfg: JdbcConfig): java.sql.Connection = {
    Class.forName(cfg.driver)
    val props = new java.util.Properties()
    props.setProperty("user", cfg.user)
    props.setProperty("password", cfg.password)
    java.sql.DriverManager.getConnection(cfg.url, props)
  }

  private def base(spark: SparkSession, cfg: JdbcConfig) = {
    val r = spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("fetchsize", cfg.fetchSize)
    cfg.sessionInit.fold(r)(sql => r.option("sessionInitStatement", sql))
  }

  /** Full-table read, range-partitioned on `partitionColumn` so the scan is
    * parallel across executors. Bounds default to a min/max probe query.
    *
    * CONSISTENCY CAVEAT: a partitioned read opens `numPartitions`
    * independent connections, each its own transaction — a table written
    * concurrently can be torn across partitions (rows moved between key
    * ranges seen twice or not at all). The reference avoids this by running
    * the whole dump inside one REPEATABLE READ transaction
    * (xdump/postgresql.py:77, sqlite.py:65 `BEGIN IMMEDIATE`); a
    * connection-pooled distributed engine cannot. `partitionColumn = None`
    * (what `Catalog.jdbc(consistent = true)` forces) reads each table over
    * a single connection — per-table snapshot consistency at the isolation
    * level the server grants that connection. Cross-TABLE consistency for
    * a live, concurrently-written database needs a quiesced source, a
    * replica frozen for the dump, or a server-side exported snapshot
    * shared by every connection — turnkey via [[exportedSnapshot]] /
    * `Catalog.jdbc(consistentSnapshot = true)` (Postgres
    * `SET TRANSACTION SNAPSHOT` on each partition's connection).
    */
  def readTable(
      spark: SparkSession,
      cfg: JdbcConfig,
      table: String,
      partitionColumn: Option[String] = None,
      bounds: Option[(Long, Long)] = None): DataFrame =
    partitionColumn match {
      case Some(pc) =>
        val (lo, hi) = bounds.getOrElse {
          // getAs[Number]: the probe's min/max come back as INT/SMALLINT/
          // DECIMAL depending on the key's SQL type — getLong would
          // ClassCastException on anything but BIGINT. Empty table → (0, 0),
          // a degenerate-but-valid single-partition range.
          val row = base(spark, cfg)
            .option("query", s"SELECT min($pc) AS lo, max($pc) AS hi FROM $table")
            .load().head()
          def num(i: Int): Long =
            Option(row.getAs[Number](i)).map(_.longValue).getOrElse(0L)
          (num(0), num(1))
        }
        base(spark, cfg)
          .option("dbtable", table)
          .option("partitionColumn", pc)
          .option("lowerBound", lo)
          .option("upperBound", hi)
          .option("numPartitions", cfg.numPartitions)
          .load()
      case None => base(spark, cfg).option("dbtable", table).load()
    }

  /** Arbitrary selection query — the `partial_tables` entry point when the
    * source is a live DB. Catalyst still pushes filters/projections it can
    * prove into the JDBC source.
    */
  def readQuery(spark: SparkSession, cfg: JdbcConfig, sql: String): DataFrame =
    base(spark, cfg).option("query", sql).load()

  /** Batched parallel load (≙ `COPY FROM STDIN` / executemany,
    * xdump/postgresql.py:216, xdump/sqlite.py:148). `Overwrite` is the
    * reference's `truncate()`-then-load path — it clears rows but keeps the
    * table (and its constraints); `recreate = true` drops and re-creates
    * the table instead (≙ recreate_database, base.py:202 — constraints are
    * NOT restored, Spark only knows column types).
    */
  def writeTable(
      df: DataFrame,
      cfg: JdbcConfig,
      table: String,
      mode: SaveMode,
      recreate: Boolean = false,
      columnTypes: Map[String, String] = Map.empty): Unit = {
    val w = df.write.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("dbtable", table)
      .option("batchsize", cfg.batchSize)
      .option("truncate", mode == SaveMode.Overwrite && !recreate)
      .option("numPartitions", cfg.numPartitions)
    // native types for columns the writer would otherwise create as the
    // dialect's unbounded string default — only meaningful when the write
    // CREATES the table (recreate loads); types for columns absent from
    // df would fail Spark's option validation, so they are filtered
    val applicable = columnTypes.filter { case (c, _) => df.columns.contains(c) }
    val w2 =
      if (applicable.isEmpty) w
      else w.option("createTableColumnTypes",
        applicable.map { case (c, t) => s"$c $t" }.mkString(", "))
    w2.mode(mode).save()
  }

  private def rows[A](rs: java.sql.ResultSet)(f: java.sql.ResultSet => A): Vector[A] = {
    // null-tolerant: spec-faked DatabaseMetaData returns null for calls it
    // doesn't stub, which must read as "no rows", not NPE
    if (rs == null) return Vector.empty
    val buf = Vector.newBuilder[A]
    while (rs.next()) buf += f(rs)
    rs.close()
    buf.result()
  }

  /** Escapes JDBC metadata search-pattern wildcards (`_`, `%`) in a literal
    * identifier — `getColumns` treats its table/column arguments as
    * patterns, and almost every real identifier contains `_` (O_ID,
    * c_custkey), which would otherwise match any character.
    */
  /** Renders a length-parameterized character type from getColumns
    * metadata, or None for everything else: only CHAR/VARCHAR lengths are
    * information Spark's own schema loses (decimals keep precision/scale
    * in DecimalType; integer widths survive as distinct Spark types).
    * The rendered form is both valid target DDL and parsable by Spark's
    * `createTableColumnTypes` option — the replay seam.
    */
  /** Sizes at/above this are sentinel "unbounded" lengths, not real
    * modifiers: PostgreSQL JDBC reports COLUMN_SIZE=2147483647 for a
    * bare `varchar`, and rendering that verbatim produces
    * VARCHAR(2147483647), which exceeds PG's 10485760 cap and aborts the
    * recreate. Such columns fall back to the dialect default (TEXT).
    */
  private val MaxSaneCharLength = 10485760

  private[graft] def charSqlType(typeName: String, size: Int): Option[String] =
    typeName.trim.toUpperCase match {
      case _ if size <= 0 || size >= MaxSaneCharLength => None
      case "VARCHAR" | "CHARACTER VARYING" | "NVARCHAR" | "VARCHAR2" |
          "NATIONAL CHARACTER VARYING" => Some(s"VARCHAR($size)")
      case "CHAR" | "CHARACTER" | "NCHAR" | "BPCHAR" |
          "NATIONAL CHARACTER" => Some(s"CHAR($size)")
      case _ => None
    }

  private def escapePattern(md: java.sql.DatabaseMetaData, s: String): String = {
    // JDBC-standard fallback: spec-faked metadata may not stub the escape
    val esc = Option(md.getSearchStringEscape).getOrElse("\\")
    s.replace(esc, esc + esc).replace("_", esc + "_").replace("%", esc + "%")
  }

  /** Dialect: make `t.c` NOT NULL — the prerequisite for ADD PRIMARY KEY
    * on a Spark-created table (the JDBC writer emits nullable columns).
    * Postgres uses `SET NOT NULL`; everything else gets the SQL-standard
    * `ALTER COLUMN c NOT NULL` (covers Derby/DB2/H2). Engines whose
    * syntax must restate the column type (MySQL's `MODIFY col type NOT
    * NULL`) are NOT supported here — the type is not available at this
    * layer, and the statement fails loudly on such a target rather than
    * guessing.
    */
  private[sources] def notNullSql(cfg: JdbcConfig, t: String, c: String): String =
    if (cfg.driver.contains("postgresql")) s"ALTER TABLE $t ALTER COLUMN $c SET NOT NULL"
    else s"ALTER TABLE $t ALTER COLUMN $c NOT NULL"

  /** Dialect: restart `t.c`'s id generator so the next generated value is
    * `next` — Postgres serial/identity via `setval` on the backing
    * sequence (`setval(seq, n)` ⇒ nextval n+1), Derby/DB2/H2 identity via
    * the standard `RESTART WITH`. The Postgres form COALESCEs the
    * sequence lookup into a nonexistent relation name: bare
    * `setval(pg_get_serial_sequence(...), n)` silently returns NULL when
    * the column has no backing sequence, which would report "replayed"
    * for a generator that was never restarted — the cast makes it error
    * like every other engine.
    */
  private[sources] def restartSequenceSql(
      cfg: JdbcConfig, t: String, c: String, next: Long): String =
    if (cfg.driver.contains("postgresql"))
      s"SELECT setval(COALESCE(pg_get_serial_sequence('$t', '$c'), " +
        s"'graft_no_sequence_for_${t}_$c')::regclass, ${next - 1})"
    else s"ALTER TABLE $t ALTER COLUMN $c RESTART WITH $next"

  /** Server-side row count over one driver-side connection — the cheap
    * integrity probe of `Dump.loadIntoJdbc`'s count verification (the
    * server scans its own table; no Spark job).
    */
  private[sources] def countTable(cfg: JdbcConfig, table: String): Long = {
    val conn = connect(cfg)
    try {
      val st = conn.createStatement()
      try {
        val rs = st.executeQuery(s"SELECT COUNT(*) FROM $table")
        rs.next()
        val n = rs.getLong(1)
        rs.close()
        n
      } finally st.close()
    } finally conn.close()
  }

  /** Runs statements over one driver-side connection — used by the
    * children-first cleanup pass of `Dump.loadIntoJdbc`.
    */
  private[sources] def execute(cfg: JdbcConfig, sqls: Seq[String]): Unit = {
    val conn = connect(cfg)
    try {
      val st = conn.createStatement()
      // each statement through the -v/-vv query log (reference
      // base.py:67 runs every write-path statement under log_query)
      try sqls.foreach { s =>
        QueryLog.query(s)
        QueryLog.time()(st.execute(s)): Unit
      } finally st.close()
    } finally conn.close()
  }

  /** FK/PK/table introspection over one metadata connection — what the
    * reference reads from pg_catalog (postgresql.py:19) or
    * `PRAGMA foreign_key_list` (sqlite.py:71), here via the portable
    * `DatabaseMetaData.getTables/getPrimaryKeys/getImportedKeys` so any
    * JDBC-speaking engine yields a ready-to-dump catalog with no
    * hand-declared metadata. Metadata-sized and driver-side by nature.
    *
    * @param schema schema pattern to restrict to (e.g. "APP", "public");
    *               None scans all non-system schemas — bare table names
    *               must then be unique across them.
    */
  def introspect(cfg: JdbcConfig, schema: Option[String] = None): DbMeta = {
    val conn = connect(cfg)
    try {
      // A sessionInit (snapshot-consistent dump) must cover introspection
      // too: the metadata queries below run on THIS connection, so running
      // the init first places them inside the attached snapshot
      // transaction — otherwise concurrent DDL between snapshot export and
      // introspection could yield schema metadata that disagrees with the
      // snapshotted data the partitioned reads will see.
      cfg.sessionInit.foreach { sql =>
        val st = conn.createStatement()
        try st.execute(sql) finally st.close()
      }
      introspectOn(conn, schema)
    } finally conn.close()
  }

  /** [[introspect]]'s metadata walk over an existing connection — the seam
    * that lets the grouping/validation logic be unit-tested against faked
    * DatabaseMetaData (drivers with anonymous FKs, interleaved orders, …)
    * without a server for each shape.
    */
  private[graft] def introspectOn(
      conn: java.sql.Connection, schema: Option[String]): DbMeta = {
    {
      val md = conn.getMetaData
      val tabs = rows(md.getTables(null, schema.orNull, "%", Array("TABLE")))(r =>
        (Option(r.getString("TABLE_SCHEM")).filter(_.nonEmpty), r.getString("TABLE_NAME")))
      val names = tabs.map(_._2)
      require(names.distinct.size == names.size,
        s"table names collide across schemas (${names.diff(names.distinct).distinct.mkString(", ")}); pass an explicit schema")

      val qualified = tabs.map { case (sc, t) =>
        t -> sc.map(s => s"$s.$t").getOrElse(t)
      }.toMap

      val pks = tabs.map { case (sc, t) =>
        t -> rows(md.getPrimaryKeys(null, sc.orNull, t))(r =>
          (r.getShort("KEY_SEQ"), r.getString("COLUMN_NAME"))).sortBy(_._1).map(_._2)
      }.toMap.filter { case (_, cols) => cols.nonEmpty }

      // FK edges whose parent lies outside the introspected table set (a
      // different schema under an explicit `schema` filter) are dropped:
      // the catalog could never resolve the pull's foreign table, and an
      // out-of-scope parent is by definition not part of this dump.
      val nameSet = names.toSet
      val fks = tabs.flatMap { case (sc, t) =>
        val parts = rows(md.getImportedKeys(null, sc.orNull, t))(r =>
          (r.getShort("KEY_SEQ").toInt, Option(r.getString("FK_NAME")),
            r.getString("FKTABLE_NAME"), r.getString("FKCOLUMN_NAME"),
            r.getString("PKTABLE_NAME"), r.getString("PKCOLUMN_NAME")))
        // Constraint grouping: by FK_NAME when the driver provides one
        // (unique per child table; first-encounter order preserved). The
        // JDBC result ordering is (PKTABLE, KEY_SEQ) — two composite FKs
        // into the SAME parent interleave their rows by KEY_SEQ, so a
        // consecutive-rows split would zip them together. Anonymous
        // constraints (null FK_NAME, rare) start a new group whenever the
        // sequence stops being consecutive — base-agnostic, so drivers
        // that emit 0-based KEY_SEQ (some SQLite wrappers around PRAGMA
        // foreign_key_list) group identically to 1-based ones.
        val named = scala.collection.mutable.LinkedHashMap
          .empty[String, Vector[(Int, String, String, String, String)]]
        var anonCur = Vector.empty[(Int, String, String, String, String)]
        val anon = Vector.newBuilder[Vector[(Int, String, String, String, String)]]
        parts.foreach { case (seq, name, ft, fc, pt, pc) =>
          val p = (seq, ft, fc, pt, pc)
          name match {
            case Some(nm) =>
              named.update(nm, named.getOrElse(nm, Vector.empty) :+ p)
            case None =>
              if (anonCur.nonEmpty && seq != anonCur.last._1 + 1) {
                anon += anonCur; anonCur = Vector(p)
              } else anonCur :+= p
          }
        }
        if (anonCur.nonEmpty) anon += anonCur
        // One driver emits ONE KEY_SEQ base. Interleaved 0-based composites
        // (0,0,1,1) split into groups whose bases disagree (0,0,1) — and
        // the stray base-1 fragment would pass the per-group run check
        // below, so mixed bases across anonymous groups must themselves
        // fail loudly.
        val anonGroups = anon.result()
        val anonBases = anonGroups.map(_.map(_._1).min).distinct
        require(anonBases.size <= 1,
          s"anonymous foreign-key groups on table '$t' start at different " +
            s"KEY_SEQ bases (${anonBases.sorted.mkString(",")}) — composite " +
            "constraints interleaved in the driver's getImportedKeys order; " +
            "name the constraints or declare them explicitly (--fk) instead.")
        (named.values.toVector ++ anonGroups).map { g =>
          val sorted = g.sortBy(_._1)
          // Guard against the silent failure mode of consecutive-rows
          // splitting: two ANONYMOUS composite FKs into the same parent
          // interleave under the (PKTABLE, KEY_SEQ) result order, and a
          // naive split would zip them into one garbage constraint whose
          // closure pulls wrong rows. A correctly split group's KEY_SEQs
          // are exactly base..base+n-1 for base ∈ {0, 1} (spec says
          // 1-based, but SQLite-style wrappers of PRAGMA foreign_key_list
          // emit 0-based) — anything else (interleaves, duplicates, a
          // group orphaned mid-run) must fail loudly, not dump quietly
          // wrong.
          val base = sorted.head._1
          require((base == 0 || base == 1) &&
              sorted.map(_._1) == (base until base + sorted.size).toVector,
            s"foreign-key rows on table '$t' do not form a consecutive KEY_SEQ " +
              s"run from 0 or 1 (got ${sorted.map(_._1).mkString(",")}). This " +
              "happens when anonymous composite constraints interleave in the " +
              "driver's getImportedKeys order; name the constraints or declare " +
              "them explicitly (--fk) instead.")
          val head = sorted.head
          ForeignKey(head._2, head._3, head._4, head._5,
            sorted.tail.map(p => (p._3, p._5)))
        }.filter(fk => nameSet(fk.foreignTable))
      }

      // Secondary indexes (getIndexInfo): rows grouped by INDEX_NAME in
      // first-encounter order; statistic rows (no name/column) skipped;
      // the PK's backing index — identified as a UNIQUE index whose
      // ORDERED column sequence equals the PK's — skipped, since its DDL
      // already rides the PRIMARY KEY constraint replay (a set-equality
      // test would also drop a user's reverse-order lookup index like
      // (b,a) over PK (a,b), which is a distinct physical structure a
      // pg_dump -s would keep); and
      // SYSTEM-GENERATED backing indexes — identified by a name that is
      // not a plain SQL identifier (Derby's FK/PK conglomerates carry
      // UUID-suffixed names like "SQL0000000082-c0a0c103-…") — skipped,
      // since the engine recreates them with the constraints themselves
      // and their names cannot replay as unquoted DDL anyway.
      val ident = "[A-Za-z_][A-Za-z0-9_]*".r
      val idxs = tabs.map { case (sc, t) =>
        val pkSeq = pks.getOrElse(t, Seq.empty)
        val parts = rows(md.getIndexInfo(null, sc.orNull, t, false, true))(r =>
          (Option(r.getString("INDEX_NAME")), r.getShort("ORDINAL_POSITION").toInt,
            Option(r.getString("COLUMN_NAME")), !r.getBoolean("NON_UNIQUE")))
        val grouped = scala.collection.mutable.LinkedHashMap
          .empty[String, Vector[(Int, String, Boolean)]]
        parts.foreach {
          case (Some(nm), pos, Some(cn), uq) =>
            grouped.update(nm, grouped.getOrElse(nm, Vector.empty) :+ ((pos, cn, uq)))
          case _ => () // tableIndexStatistic rows carry no index
        }
        t -> grouped.toVector.map { case (nm, ps) =>
          IndexDef(nm, ps.head._3, ps.sortBy(_._1).map(_._2))
        }.filter(ix => !(ix.unique && ix.columns == pkSeq) &&
          ident.matches(ix.name))
      }.toMap.filter(_._2.nonEmpty)

      // One getColumns walk carries two pg_dump -s parity pieces: column
      // DEFAULTs (COLUMN_DEF — identity/generated markers are engine
      // bookkeeping, not replayable value expressions: skipped; sequence
      // state travels via the manifest instead) and the length-
      // parameterized native character types (TYPE_NAME + COLUMN_SIZE).
      // The latter exist because Spark reads VARCHAR(n)/CHAR(n) as plain
      // string, so a recreate load through the JDBC writer would
      // otherwise re-create them as the dialect's unbounded default
      // (CLOB on Derby, TEXT on PG) — a type pg_dump would never emit,
      // and one Derby can't even compare in a replayed CHECK clause.
      val colWalk = tabs.map { case (sc, t) =>
        t -> rows(md.getColumns(null, sc.map(escapePattern(md, _)).orNull,
            escapePattern(md, t), "%"))(r =>
            (r.getString("COLUMN_NAME"), Option(r.getString("COLUMN_DEF")),
              Option(r.getString("TYPE_NAME")).getOrElse(""),
              r.getInt("COLUMN_SIZE")))
      }.toMap
      val defaults = colWalk.map { case (t, cols) =>
        t -> cols.collect { case (c, Some(d), _, _)
            if d.trim.nonEmpty &&
              !d.trim.toUpperCase.startsWith("AUTOINCREMENT") &&
              !d.trim.toUpperCase.startsWith("GENERATED") =>
          c -> d.trim }
          .toMap
      }.filter(_._2.nonEmpty)
      val colTypes = colWalk.map { case (t, cols) =>
        t -> cols.flatMap { case (c, _, tn, size) =>
          charSqlType(tn, size).map(c -> _) }.toMap
      }.filter(_._2.nonEmpty)

      val numeric = Set(java.sql.Types.TINYINT, java.sql.Types.SMALLINT,
        java.sql.Types.INTEGER, java.sql.Types.BIGINT, java.sql.Types.DECIMAL,
        java.sql.Types.NUMERIC)
      val partCols = tabs.flatMap { case (sc, t) =>
        pks.get(t).flatMap(_.headOption).flatMap { c =>
          // table/column args of getColumns are PATTERNS — escape them, and
          // match COLUMN_NAME exactly (O_ID as a pattern would also match
          // OWID and pick up the wrong column's type).
          rows(md.getColumns(null, sc.map(escapePattern(md, _)).orNull,
              escapePattern(md, t), escapePattern(md, c)))(r =>
              (r.getString("COLUMN_NAME"), r.getInt("DATA_TYPE")))
            .collectFirst { case (name, tpe) if name == c && numeric(tpe) => t -> c }
        }
      }.toMap

      // Views (getTables type VIEW) with their definition text where the
      // engine exposes it: Derby's SYS.SYSVIEWS, everything
      // INFORMATION_SCHEMA-shaped (H2, Postgres, MySQL) via
      // INFORMATION_SCHEMA.VIEWS. A view whose definition no catalog
      // query yields is SKIPPED (an empty CREATE VIEW would be a lie);
      // introspection order is preserved so a view over an earlier view
      // replays after its dependency on engines that list dependents
      // later (Derby and PG both do).
      val viewTabs = rows(md.getTables(null, schema.orNull, "%",
        Array("VIEW")))(r =>
        (Option(r.getString("TABLE_SCHEM")).filter(_.nonEmpty),
          r.getString("TABLE_NAME")))
      // Dialect-ROUTE the view/check catalog probes instead of
      // try-Derby-then-fall-back: on PostgreSQL a failed SYS.SYSVIEWS
      // probe ABORTS the open transaction (25P02), and under
      // consistentSnapshot the whole introspection runs inside the
      // snapshot transaction — the INFORMATION_SCHEMA fallback would
      // then fail too and views/checks would come back silently empty
      // on exactly the engine the pg_dump -s parity targets. Product
      // name is already on the connection; no probe ever fails by
      // design.
      val product = scala.util.Try(
        md.getDatabaseProductName.toLowerCase).getOrElse("")
      val isDerby = product.contains("derby")
      val isPostgres = product.contains("postgres")
      val views = viewTabs.flatMap { case (sc, v) =>
        viewDefinition(conn, sc, v, isDerby).map(d => v -> d)
      }

      // CHECK constraints per table — the final pg_dump -s piece.
      val checks = tabs.map { case (sc, t) =>
        t -> tableChecks(conn, sc, t, isDerby, isPostgres)
      }.toMap.filter(_._2.nonEmpty)

      DbMeta(names, fks, pks, qualified, partCols, idxs, defaults, views,
        checks, colTypes)
    }
  }

  /** One-value catalog query, absent on any failure — the probe shape
    * [[viewDefinition]] routes dialects with (an engine without the
    * probed catalog table just throws, which means "try the next").
    */
  private def queryOne(
      conn: java.sql.Connection, sql: String, args: Seq[String])
      : Option[String] =
    scala.util.Try {
      val ps = conn.prepareStatement(sql)
      try {
        args.zipWithIndex.foreach { case (a, i) => ps.setString(i + 1, a) }
        val rs = ps.executeQuery()
        try { if (rs.next()) Option(rs.getString(1)) else None }
        finally rs.close()
      } finally ps.close()
    }.toOption.flatten

  /** Two-column catalog query, empty on any failure — [[queryOne]]'s
    * row-list sibling for (name, definition) catalog walks.
    */
  private def queryPairs(
      conn: java.sql.Connection, sql: String, args: Seq[String])
      : Seq[(String, String)] =
    scala.util.Try {
      val ps = conn.prepareStatement(sql)
      try {
        args.zipWithIndex.foreach { case (a, i) => ps.setString(i + 1, a) }
        val rs = ps.executeQuery()
        try {
          val out = Seq.newBuilder[(String, String)]
          while (rs.next()) out += ((rs.getString(1), rs.getString(2)))
          out.result()
        } finally rs.close()
      } finally ps.close()
    }.getOrElse(Nil)

  /** Single-column `x IS NOT NULL` clauses are NOT user CHECK constraints:
    * Postgres models NOT NULL through information_schema.check_constraints
    * and pg_dump -s does not emit them as CHECKs (the NOT NULL rides the
    * column), so neither do we — the PK replay path handles nullability.
    */
  private val NotNullClause =
    """(?is)^\(?\s*"?[A-Za-z_][A-Za-z0-9_]*"?\s+IS\s+NOT\s+NULL\s*\)?$""".r

  /** A table's CHECK constraints as (name, clause), dialect-routed:
    * Derby reads SYS.SYSCHECKS; PostgreSQL reads pg_constraint keyed by
    * conrelid; everything else the INFORMATION_SCHEMA pair (H2, MySQL).
    *
    * PostgreSQL must NOT use the INFORMATION_SCHEMA join: PG constraint
    * names are unique only per TABLE, and CHECK_CONSTRAINTS carries no
    * table name — two tables with same-named CHECKs cross-match on
    * (name, schema) and each dumps the other's clause, so the replay
    * adds a wrong constraint on exactly the engine the pg_dump -s
    * parity targets. pg_get_constraintdef(oid) keyed by conrelid is
    * what pg_dump itself reads (pg_dump.c getTableAttrs); its output is
    * `CHECK (<expr>)` — normalized here to the bare parenthesized
    * clause the other catalogs return.
    */
  private[graft] def tableChecks(
      conn: java.sql.Connection, schema: Option[String], table: String,
      derby: Boolean, postgres: Boolean = false): Seq[(String, String)] = {
    val rows =
      if (derby) queryPairs(conn,
        "SELECT cons.CONSTRAINTNAME, ck.CHECKDEFINITION FROM SYS.SYSCHECKS ck " +
          "JOIN SYS.SYSCONSTRAINTS cons ON ck.CONSTRAINTID = cons.CONSTRAINTID " +
          "JOIN SYS.SYSTABLES t ON cons.TABLEID = t.TABLEID " +
          "JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID " +
          "WHERE t.TABLENAME = ?" +
          schema.map(_ => " AND s.SCHEMANAME = ?").getOrElse(""),
        Seq(table) ++ schema)
      else if (postgres) queryPairs(conn,
        "SELECT con.conname, pg_catalog.pg_get_constraintdef(con.oid) " +
          "FROM pg_catalog.pg_constraint con " +
          "JOIN pg_catalog.pg_class rel ON rel.oid = con.conrelid " +
          "JOIN pg_catalog.pg_namespace nsp ON nsp.oid = rel.relnamespace " +
          "WHERE con.contype = 'c' AND rel.relname = ?" +
          schema.map(_ => " AND nsp.nspname = ?").getOrElse(""),
        Seq(table) ++ schema).map { case (nm, defn) =>
          val d = Option(defn).map(_.trim).getOrElse("")
          (nm, if (d.toUpperCase.startsWith("CHECK")) d.drop(5).trim else d)
        }
      else queryPairs(conn,
        "SELECT tc.CONSTRAINT_NAME, cc.CHECK_CLAUSE " +
          "FROM INFORMATION_SCHEMA.TABLE_CONSTRAINTS tc " +
          "JOIN INFORMATION_SCHEMA.CHECK_CONSTRAINTS cc " +
          "ON tc.CONSTRAINT_NAME = cc.CONSTRAINT_NAME " +
          "AND tc.CONSTRAINT_SCHEMA = cc.CONSTRAINT_SCHEMA " +
          "WHERE tc.CONSTRAINT_TYPE = 'CHECK' AND tc.TABLE_NAME = ?" +
          schema.map(_ => " AND tc.TABLE_SCHEMA = ?").getOrElse(""),
        Seq(table) ++ schema)
    rows.filter { case (_, clause) =>
      clause != null && clause.nonEmpty &&
        NotNullClause.findFirstIn(clause.trim).isEmpty
    }
  }

  /** A view's definition text: Derby keeps it in SYS.SYSVIEWS
    * .VIEWDEFINITION; the INFORMATION_SCHEMA.VIEWS fallback covers H2,
    * Postgres and MySQL. Either form may be the bare SELECT or a full
    * CREATE VIEW statement — [[graft.sources.Dump]] normalizes at write
    * time.
    */
  private[graft] def viewDefinition(
      conn: java.sql.Connection, schema: Option[String], view: String,
      derby: Boolean): Option[String] =
    if (derby) queryOne(conn,
      "SELECT v.VIEWDEFINITION FROM SYS.SYSVIEWS v " +
        "JOIN SYS.SYSTABLES t ON v.TABLEID = t.TABLEID " +
        "JOIN SYS.SYSSCHEMAS s ON t.SCHEMAID = s.SCHEMAID " +
        "WHERE t.TABLENAME = ?" +
        schema.map(_ => " AND s.SCHEMANAME = ?").getOrElse(""),
      Seq(view) ++ schema)
    else queryOne(conn,
      "SELECT VIEW_DEFINITION FROM INFORMATION_SCHEMA.VIEWS " +
        "WHERE TABLE_NAME = ?" +
        schema.map(_ => " AND TABLE_SCHEMA = ?").getOrElse(""),
      Seq(view) ++ schema)
}
