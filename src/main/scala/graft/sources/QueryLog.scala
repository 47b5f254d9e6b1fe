package graft.sources

/** The reference's query-logging surface (reference/xdump/logging.py:10,
  * base.py:25 `log_query` / base.py:32 `log_time`, behind the CLI's
  * `-v`/`-vv`): verbosity 1 logs step timings (INFO), verbosity 2 also
  * logs every SQL statement the engine executes against a live database
  * (DEBUG). Plain stdout println in the reference's line format — this
  * is operator-facing CLI telemetry, not a logging framework; the
  * library default (0) is silent, exactly like the reference's
  * `DEFAULT_LOGGING_LEVEL = CRITICAL`.
  */
object QueryLog {

  @volatile var verbosity: Int = 0

  private def line(level: String, msg: String): Unit =
    println(s"${java.time.LocalDateTime.now()} - XDump - $level - $msg")

  /** Log an executed SQL statement (reference base.py:25). */
  def query(sql: String): Unit =
    if (verbosity >= 2) line("DEBUG", sql)

  /** Time `body`, logging `message.format(duration)` at verbosity ≥ 1
    * (reference base.py:32; message contract is a single `%s`).
    */
  def time[A](message: String = "Execution time: %s")(body: => A): A =
    if (verbosity < 1) body
    else {
      val t0 = System.nanoTime()
      try body
      finally line("INFO",
        message.format(f"${(System.nanoTime() - t0) / 1e9}%.3fs"))
    }
}
