package graft

import org.apache.spark.sql.Row
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Schema-drift guard for the events loader (the round-8 breakage class:
  * the lake regenerated `ts` as timestamp[us] where it had been
  * nanos-int64, and every downstream `ts div …` site threw
  * DATATYPE_MISMATCH). These tests pin the loader contract — `ts` is an
  * epoch-nanos BIGINT no matter which physical type the parquet carries —
  * by writing the SAME logical rows under each physical type and
  * asserting the normalized frames are identical. If someone removes the
  * normalization, the timestamp variants fail here before any operator
  * sees the drift.
  */
class TablesSpec extends SparkSpec {

  private def tmp(name: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_$name")
    d.toFile.deleteOnExit()
    d.toString
  }

  // One deterministic logical events table: epoch-nanos values chosen to
  // exercise sub-second digits (µs-representable, as every real drop is).
  private lazy val canonicalNanos: Seq[(Long, Long, Long, String, Double)] = Seq(
    (1L, 1672531200000000000L, 10L, "view", 1.5),     // 2023-01-01 00:00:00
    (2L, 1672531200123456000L, 10L, "click", 2.0),    // +123456 µs
    (3L, 1672617600000000000L, 11L, "purchase", 9.99) // +1 day
  )

  /** Write the canonical rows with `ts` in the given physical type, into
    * `<dir>/events.parquet`, so `Tables.events` reads it exactly like a
    * real SF directory.
    */
  private def writeEvents(dir: String, tsType: DataType): Unit = {
    import spark.implicits._
    val base = canonicalNanos
      .toDF("event_id", "ts", "user_id", "event_type", "value")
    val typed = tsType match {
      case LongType => base
      case TimestampType =>
        base.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case TimestampNTZType =>
        // LTZ → NTZ cast reads the instant in the session tz (pinned UTC
        // by SparkSpec) — the same naive-UTC wall clock pyarrow's default
        // timestamp[us] carries.
        base.withColumn("ts",
          timestamp_micros(expr("ts div 1000")).cast(TimestampNTZType))
      case other => fail(s"unhandled fixture type $other")
    }
    typed.coalesce(1).write.mode("overwrite").parquet(s"$dir/events.parquet")
  }

  private def loadNormalized(dir: String): Seq[Row] =
    Tables.events(spark, dir)
      .orderBy("event_id")
      .collect()
      .toSeq

  test("events loader yields the identical epoch-nanos bigint frame from " +
      "bigint, timestamp, and timestamp_ntz physical types") {
    val dirs = Map[DataType, String](
      LongType -> tmp("ev_long"),
      TimestampType -> tmp("ev_ltz"),
      TimestampNTZType -> tmp("ev_ntz"))
    dirs.foreach { case (t, d) => writeEvents(d, t) }

    // Every variant must come back as BIGINT…
    dirs.foreach { case (t, d) =>
      val dt = Tables.events(spark, d).schema("ts").dataType
      assert(dt == LongType, s"physical $t loaded as $dt, expected BIGINT")
    }
    // …with byte-identical rows (column order included — Verify hashes
    // depend on it).
    val frames = dirs.map { case (t, d) => t -> loadNormalized(d) }
    val reference = frames(LongType)
    assert(reference.map(_.getLong(1)) == canonicalNanos.map(_._2))
    frames.foreach { case (t, rows) =>
      assert(rows == reference, s"physical $t normalized differently")
    }
  }

  test("normalizeEventTs rejects an unexpected ts type loudly") {
    import spark.implicits._
    val bad = Seq(("a", "2023-01-01")).toDF("event_id", "ts")
    val e = intercept[IllegalStateException](Tables.normalizeEventTs(bad))
    assert(e.getMessage.contains("unsupported"))
  }

  test("the shipped testdata events table satisfies the bigint contract") {
    val schema = Tables.events(spark, sfDir).schema
    assert(schema("ts").dataType == LongType)
  }
}
