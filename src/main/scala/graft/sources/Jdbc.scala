package graft.sources

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Connection surface for live databases — the Spark-native counterpart of
  * the reference's PostgreSQL/SQLite backends (xdump/postgresql.py:66,
  * xdump/sqlite.py:28). Dumping from a live DB is a *partitioned* JDBC read
  * (every executor pulls a key range — the distributed replacement for a
  * single `COPY TO STDOUT`), and loading is a batched JDBC write.
  *
  * Untestable in this offline environment (no database, no drivers) but
  * kept thin and standard so it is exercised by any real deployment.
  */
final case class JdbcConfig(
    url: String,
    user: String,
    password: String,
    driver: String = "org.postgresql.Driver",
    fetchSize: Int = 10000,
    batchSize: Int = 10000,
    numPartitions: Int = 32)

object Jdbc {

  private def base(spark: SparkSession, cfg: JdbcConfig) =
    spark.read.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("fetchsize", cfg.fetchSize)

  /** Full-table read, range-partitioned on `partitionColumn` so the scan is
    * parallel across executors. Bounds default to a min/max probe query.
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
    * xdump/postgresql.py:216, xdump/sqlite.py:148). `Overwrite` with
    * truncate=true is the reference's `truncate()`-then-load path.
    */
  def writeTable(df: DataFrame, cfg: JdbcConfig, table: String, mode: SaveMode): Unit =
    df.write.format("jdbc")
      .option("url", cfg.url)
      .option("user", cfg.user)
      .option("password", cfg.password)
      .option("driver", cfg.driver)
      .option("dbtable", table)
      .option("batchsize", cfg.batchSize)
      .option("truncate", mode == SaveMode.Overwrite)
      .option("numPartitions", cfg.numPartitions)
      .mode(mode)
      .save()
}
