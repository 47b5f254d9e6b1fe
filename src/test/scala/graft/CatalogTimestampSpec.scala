package graft

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

import graft.core.Catalog

/** Pins the Catalog's timestamp contract: `table("events")` yields `ts` as
  * epoch-nanos LONG regardless of which flavor the data generator shipped —
  * nanos-as-long (parquet TIMESTAMP(NANOS) / plain INT64) or timestamp[us]
  * (read by Spark 4 as TIMESTAMP_NTZ). The generator has silently switched
  * flavor between rounds before and broke every event-time operator; this
  * spec makes the next switch fail loudly in-repo.
  */
class CatalogTimestampSpec extends SparkSpec {

  // two instants, exercised in both flavors; micros precision (the
  // generator's timestamp[us] cannot carry sub-micro anyway)
  private val microsA = 1704067200000000L // 2024-01-01T00:00:00Z
  private val microsB = 1704112496789123L // 2024-01-01T12:34:56.789123Z

  private def writeEvents(dir: String, tsFlavor: String): Unit = {
    import spark.implicits._
    val base = Seq((1L, microsA, 10L, "click", 1.5),
                   (2L, microsB, 11L, "view", 2.5))
      .toDF("event_id", "us", "user_id", "event_type", "value")
    val withTs = tsFlavor match {
      // the nanos flavor post-read shape: plain INT64 epoch nanos
      case "long_nanos" => base.withColumn("ts", col("us") * lit(1000L))
      // the micros flavor: parquet timestamp[us] isAdjustedToUTC=false,
      // which Spark 4 reads back as TIMESTAMP_NTZ (UTC session tz makes
      // the wall-clock equal the instant)
      case "ntz_micros" =>
        base.withColumn("ts", timestamp_micros(col("us")).cast("timestamp_ntz"))
    }
    withTs.drop("us")
      .select("event_id", "ts", "user_id", "event_type", "value")
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def normalized(dir: String) = {
    val events = Catalog.tpch(spark, dir).table("events")
    assert(events.schema("ts").dataType === LongType,
      s"catalog must normalize ts to epoch-nanos LONG, got ${events.schema("ts").dataType}")
    events.select("event_id", "ts").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("Catalog.tpch yields epoch-nanos LONG for the nanos-as-long flavor") {
    val dir = Files.createTempDirectory("graft-ts-long").toString
    writeEvents(dir, "long_nanos")
    val got = normalized(dir)
    assert(got(1L) === microsA * 1000L)
    assert(got(2L) === microsB * 1000L)
  }

  test("Catalog.tpch yields epoch-nanos LONG for the timestamp[us] flavor") {
    val dir = Files.createTempDirectory("graft-ts-ntz").toString
    writeEvents(dir, "ntz_micros")
    val got = normalized(dir)
    assert(got(1L) === microsA * 1000L)
    assert(got(2L) === microsB * 1000L)
  }

  test("both flavors normalize to identical values even under a non-UTC session tz") {
    // Catalog.tpch must enforce UTC itself — callers cannot be trusted to
    val prior = spark.conf.get("spark.sql.session.timeZone")
    val dirL = Files.createTempDirectory("graft-ts-long2").toString
    val dirN = Files.createTempDirectory("graft-ts-ntz2").toString
    writeEvents(dirL, "long_nanos")
    writeEvents(dirN, "ntz_micros")
    try {
      spark.conf.set("spark.sql.session.timeZone", "America/New_York")
      assert(normalized(dirL) === normalized(dirN))
    } finally spark.conf.set("spark.sql.session.timeZone", prior)
  }
}
