package graft

import graft.streaming.EventStreams
import graft.streaming.EventStreams.Event
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

/** Drives the Structured Streaming jobs end-to-end with a MemoryStream
  * source and memory sink, and checks agreement with the batch twins.
  */
class StreamingSpec extends SparkSpec {

  private def ts(minutes: Long): Timestamp = new Timestamp(minutes * 60000L)

  private val sample = Seq(
    Event(1, ts(0), 1, "click", 1.0),
    Event(2, ts(10), 1, "click", 2.0),
    Event(3, ts(70), 1, "view", 3.0),    // >30 min gap → new session, next window
    Event(4, ts(75), 2, "click", 4.0),
    Event(5, ts(200), 1, "click", 5.0))  // third session for user 1

  test("windowedAgg aggregates tumbling 1h windows per event_type") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStreams.windowedAgg(input.toDF())
      .writeStream.format("memory").queryName("win_agg")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("win_agg").collect()
      .map(r => (r.getAs[Timestamp]("window_start").getTime / 60000L,
        r.getAs[String]("event_type"), r.getAs[Long]("n_events")))
      .toSet
    assert(out == Set((0L, "click", 2L), (60L, "view", 1L), (60L, "click", 1L),
      (180L, "click", 1L)))
  }

  test("histogramSketch bins values per day-window and reads nearest-bin quantiles") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // one day window; values land in bins 0 (1.0), 6 (100), 31 (500), 31 (600 clamped)
    input.addData(
      Event(1, ts(0), 1, "click", 1.0),
      Event(2, ts(5), 1, "click", 100.0),
      Event(3, ts(10), 2, "click", 500.0),
      Event(4, ts(15), 2, "click", 600.0),
      Event(5, ts(20), 1, "view", -3.0)) // negative clamps to bin 0
    val q = EventStreams.histogramSketch(input.toDF())
      .writeStream.format("memory").queryName("hist_sketch")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val rows = spark.table("hist_sketch").collect()
    val click = rows.find(_.getAs[String]("event_type") == "click").get
    val bins = click.getAs[scala.collection.Seq[Long]]("bins")
    assert(bins.length == 32)
    assert(bins(0) == 1 && bins(6) == 1 && bins(31) == 2)
    assert(click.getAs[Long]("total") == 4)
    // cum at bin 6 = 2 ⇒ 2·2 ≥ 4 ⇒ p50 bin 6; p95 needs cum·20 ≥ 76 ⇒ bin 31
    assert(click.getAs[Long]("p50_bin") == 6)
    assert(click.getAs[Long]("p95_bin") == 31)
    val view = rows.find(_.getAs[String]("event_type") == "view").get
    assert(view.getAs[Long]("total") == 1)
    assert(view.getAs[scala.collection.Seq[Long]]("bins")(0) == 1)
    assert(view.getAs[Long]("p50_bin") == 0)
  }

  test("histogramSketch agrees with the batch daily histogram on the sf table") {
    // stream the real events table and compare per-(day, type) totals +
    // quantile bins against an independent batch recomputation
    val streamed = {
      val q = EventStreams.histogramSketch(
          EventStreams.eventsStream(spark, sfDir))
        .writeStream.format("memory").queryName("hist_sf")
        .outputMode("complete").start()
      try q.processAllAvailable() finally q.stop()
      spark.table("hist_sf").collect()
        .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 86400000L,
          r.getAs[String]("event_type")) ->
          (r.getAs[Long]("total"), r.getAs[Long]("p50_bin"), r.getAs[Long]("p95_bin")))
        .toMap
    }
    val batch = Tables.events(spark, sfDir)
      .select(expr("ts div 86400000000000").as("day"), col("event_type"),
        when(col("value") < 0, lit(0L)).when(col("value") >= 512, lit(31L))
          .otherwise(floor(col("value") / 16).cast("bigint")).as("bin"))
      .groupBy(col("day"), col("event_type"), col("bin"))
      .agg(count(lit(1)).as("n")).collect()
      .groupBy(r => (r.getAs[Long]("day"), r.getAs[String]("event_type")))
    assert(streamed.size == batch.size)
    batch.foreach { case (key, rs) =>
      val byBin = rs.map(r => r.getAs[Long]("bin") -> r.getAs[Long]("n")).toMap
      val total = byBin.values.sum
      val cums = (0L to 31L).scanLeft(0L)((a, b) => a + byBin.getOrElse(b, 0L)).tail
      val p50 = (0 until 32).find(b => cums(b) * 2 >= total).get.toLong
      val p95 = (0 until 32).find(b => cums(b) * 20 >= total * 19).get.toLong
      assert(streamed(key) == ((total, p50, p95)), s"mismatch at $key")
    }
  }

  test("heavyHittersStream: Misra-Gries guarantees hold against the exact counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // stream the real sf events in one batch
    val events = Tables.events(spark, sfDir)
      .select(col("event_id"), expr("timestamp_micros(ts div 1000)").as("ts"),
        col("user_id"), col("event_type"), col("value"))
      .as[Event].collect()
    input.addData(events.toIndexedSeq: _*)
    val q = EventStreams.heavyHittersStream(input.toDS())
      .writeStream.format("memory").queryName("mg_hh")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("mg_hh").collect()
      .groupBy(_.getAs[String]("event_type"))
    val exact = events.groupBy(_.event_type).view
      .mapValues(_.groupBy(_.user_id).view.mapValues(_.length.toLong).toMap).toMap
    out.foreach { case (etype, rows) =>
      val n = rows.head.getAs[Long]("n_seen")
      assert(n == exact(etype).values.sum, "state must count every event")
      val candidates = rows.map(r =>
        r.getAs[Long]("user_id") -> r.getAs[Long]("lower_bound")).toMap
      assert(candidates.size <= 8, "state is bounded by k counters")
      val bound = n / 9 // n/(k+1)
      exact(etype).foreach { case (u, c) =>
        if (c > bound)
          assert(candidates.contains(u),
            s"user $u with $c > $bound occurrences must survive Misra-Gries")
      }
      candidates.foreach { case (u, lb) =>
        val c = exact(etype).getOrElse(u, 0L)
        assert(lb <= c && lb >= c - bound,
          s"counter $lb outside [${c - bound}, $c] for user $u")
      }
    }
  }

  test("noveltyStream agrees with the batch daily_novelty first-touch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val q = EventStreams.noveltyStream(
        EventStreams.eventsStream(spark, sfDir).as[Event])
      .writeStream.format("memory").queryName("novelty_sf")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    // days whose corrections net to zero report 0 in the changelog sum
    // (complete mode can't retract a group); the batch twin simply has
    // no such day — compare the positive support
    val streamed = spark.table("novelty_sf").collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime / 86400000L ->
        r.getAs[Long]("n_new")).filter(_._2 > 0).toMap
    val batch = operators.EventScience.dailyNovelty(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day_ord") -> r.getAs[Long]("n_new"))
      .filter(_._2 > 0).toMap
    assert(streamed == batch,
      s"streaming first-touch diverged: stream=$streamed batch=$batch")
  }

  test("noveltyStream corrects a late-arriving earlier first touch across " +
      "micro-batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.noveltyStream(input.toDS())
      .writeStream.format("memory").queryName("novelty_corr")
      .outputMode("complete").start()
    def counts(): Map[Long, Long] = spark.table("novelty_corr").collect()
      .map(r => r.getAs[java.sql.Timestamp]("window_start").getTime / 86400000L ->
        r.getAs[Long]("n_new")).toMap
    try {
      // micro-batch 1: user 1's first sight lands on day 2
      input.addData(Event(10, new Timestamp(2 * 86400000L + 1000L), 1, "click", 1.0))
      q.processAllAvailable()
      assert(counts() == Map(2L -> 1L), s"pre-correction: ${counts()}")
      // micro-batch 2: a LATE event for user 1 with an EARLIER event
      // time (day 0), plus a genuinely new user on day 1 — the fold must
      // retract user 1 from day 2, credit day 0, and count user 2 once
      input.addData(
        Event(9, new Timestamp(1000L), 1, "view", 1.0),
        Event(11, new Timestamp(86400000L + 1000L), 2, "click", 1.0))
      q.processAllAvailable()
      assert(counts() == Map(0L -> 1L, 1L -> 1L, 2L -> 0L),
        s"post-correction: ${counts()}")
    } finally q.stop()
  }

  test("driftToTable: per-day mix TVD converges under late data, vanished " +
      "and novel sources both alarm, replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("drift_tbl")
    val path = dir.resolve("days").toString
    val ref = Map("click" -> 500000L, "view" -> 500000L)
    val input = MemoryStream[Event]
    val q = EventStreams.driftToTable(input.toDS(), ref, path)
    val b1 = Seq(
      Event(1, ts(1), 1, "click", 1.0), Event(2, ts(2), 2, "click", 1.0),
      Event(3, ts(3), 3, "click", 1.0), Event(4, ts(4), 4, "view", 1.0))
    val b2 = Seq(
      Event(5, ts(5), 5, "view", 1.0), Event(6, ts(6), 6, "view", 1.0),
      // day 2 is a complete source flip: a type the reference has
      // never seen, while both reference types vanish
      Event(7, ts(1441), 7, "purchase", 1.0),
      Event(8, ts(1442), 8, "purchase", 1.0))
    def tvd() = spark.read.parquet(path).select(col("day"), col("tvd_ppm"))
      .distinct().collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("tvd_ppm")).toMap
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      // 3:1 click:view against 1:1 → (250000 + 250000) / 2
      assert(tvd() == Map("1970-01-01" -> 250000L), s"got ${tvd()}")
      input.addData(b2: _*)
      q.processAllAvailable()
      // late views even day 1 out; day 2 flips completely → TVD = 1
      assert(tvd() == Map("1970-01-01" -> 0L, "1970-01-02" -> 1000000L),
        s"got ${tvd()}")
      // share rows carry the evidence: purchase is 100% of day 2
      val d2 = spark.read.parquet(path)
        .filter(col("day") === "1970-01-02").collect()
      assert(d2.length == 1 &&
        d2(0).getAs[String]("event_type") == "purchase" &&
        d2(0).getAs[Long]("share_ppm") == 1000000L &&
        d2(0).getAs[Long]("ref_ppm") == 0L)
      // replay: an applied batch id must not double the counts
      val before = spark.read.parquet(path).collect().toSet
      EventStreams.foldDriftBatch(b1.toDF(), batchId = 0L, ref, path)
      assert(spark.read.parquet(path).collect().toSet == before)
    } finally {
      q.stop()
    }
  }

  test("cdcToTable: cross-batch late updates lose to applied tombstones, " +
      "state equals the batch collapse, replay is a no-op") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("cdc_tbl")
    val path = dir.resolve("state").toString
    val input = MemoryStream[Event]
    val q = EventStreams.cdcToTable(input.toDS(), path)
    val b1 = Seq(
      Event(5, ts(1), 1, "click", 2.0),
      Event(10, ts(2), 2, "error", 0.0),  // tombstone for user 2
      Event(7, ts(3), 3, "signup", 1.0))
    val b2 = Seq(
      Event(9, ts(4), 2, "purchase", 4.0), // LATE update, lsn < tombstone
      Event(6, ts(5), 1, "error", 0.0),    // tombstone for user 1
      Event(8, ts(6), 3, "view", 3.0))
    def current() = EventStreams.cdcCurrentState(spark, path).collect()
      .map(r => r.getAs[Long]("user_id") ->
        (r.getAs[String]("last_op"), r.getAs[Long]("value_cents"),
          r.getAs[Long]("last_lsn"), r.getAs[Long]("n_changes"))).toMap
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(current() == Map(
        1L -> (("U", 200L, 5L, 1L)), 3L -> (("I", 100L, 7L, 1L))))
      input.addData(b2: _*)
      q.processAllAvailable()
      // user 2's late lsn-9 update must NOT resurrect the lsn-10 delete;
      // user 1 dies; user 3 advances with its full changelog depth
      assert(current() == Map(3L -> (("U", 300L, 8L, 2L))))
      // batch agreement: the standing table equals the one-shot collapse
      // over the union of both batches (including tombstoned keys)
      val twin = graft.sources.Ingest.cdcCollapse((b1 ++ b2).toDF())
        .collect().map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("last_op"), r.getAs[Long]("value_cents"),
            r.getAs[Long]("last_lsn"), r.getAs[Long]("n_changes"))).toMap
      val full = spark.read.parquet(path).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("last_op"), r.getAs[Long]("value_cents"),
            r.getAs[Long]("last_lsn"), r.getAs[Long]("n_changes"))).toMap
      assert(full == twin, s"table=$full batch=$twin")
      // replay: an already-applied batch id must not double-count
      val before = full
      EventStreams.foldCdcBatch(b1.toDF(), batchId = 0L, path)
      val after = spark.read.parquet(path).collect()
        .map(r => r.getAs[Long]("user_id") ->
          (r.getAs[String]("last_op"), r.getAs[Long]("value_cents"),
            r.getAs[Long]("last_lsn"), r.getAs[Long]("n_changes"))).toMap
      assert(after == before, "replayed batch id must be skipped")
    } finally {
      q.stop()
    }
  }

  test("noveltyToTable folds retractions into a day table that equals the " +
      "batch first-touch counts after late data") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val dir = java.nio.file.Files.createTempDirectory("novelty_tbl")
    val path = dir.resolve("days").toString
    val input = MemoryStream[Event]
    val q = EventStreams.noveltyToTable(input.toDS(), path)
    val b1 = Seq(Event(10, new Timestamp(2 * 86400000L + 1000L), 1, "click", 1.0))
    val b2 = Seq(
      Event(9, new Timestamp(1000L), 1, "view", 1.0),
      Event(11, new Timestamp(86400000L + 1000L), 2, "click", 1.0))
    def table() = spark.read.parquet(path).collect()
      .map(r => r.getAs[String]("day") -> r.getAs[Long]("n_new")).toMap
    try {
      input.addData(b1: _*)
      q.processAllAvailable()
      assert(table() == Map("1970-01-03" -> 1L), s"pre-correction: ${table()}")
      // late earlier first touch for user 1 + a genuinely new user 2:
      // the lake table (not just an in-memory agg) must retract day 3
      // and converge to the batch twin over the union of both batches
      input.addData(b2: _*)
      q.processAllAvailable()
      assert(table() == Map("1970-01-01" -> 1L, "1970-01-02" -> 1L,
        "1970-01-03" -> 0L), s"post-correction: ${table()}")
      val batchTwin = (b1 ++ b2).toDF()
        .groupBy(col("user_id"))
        .agg(date_format(min(col("ts")), "yyyy-MM-dd").as("day"))
        .groupBy(col("day")).agg(count(lit(1)).as("n_new"))
        .collect().map(r => r.getAs[String]("day") -> r.getAs[Long]("n_new"))
        .toMap
      assert(table().filter(_._2 > 0) == batchTwin,
        s"table=${table()} batch=$batchTwin")
      // replay skip: re-folding an already-applied batch id is a no-op
      // (the in-table watermark commits atomically with the counts)
      val before = table()
      EventStreams.foldNoveltyBatch(
        Seq(EventStreams.FirstTouch(99L, new Timestamp(1000L), 1L)).toDF(),
        batchId = 0L, path)
      assert(table() == before, "replayed batch id must be skipped")
      // a NEW batch id still folds
      EventStreams.foldNoveltyBatch(
        Seq(EventStreams.FirstTouch(99L, new Timestamp(3 * 86400000L + 5L), 1L))
          .toDF(), batchId = 100L, path)
      assert(table()("1970-01-04") == 1L)
      // the sink's commit crash window: between its two renames the
      // only full copy sits at <path>.old — the next fold must RECOVER
      // it (via the sink's recovery-aware read) and keep accumulating;
      // a bare exists() probe would see "no table" and let bare deltas
      // replace the accumulated counts
      val beforeCrash = table()
      java.nio.file.Files.move(java.nio.file.Paths.get(path),
        java.nio.file.Paths.get(path + ".old"))
      EventStreams.foldNoveltyBatch(
        Seq(EventStreams.FirstTouch(77L, new Timestamp(4 * 86400000L + 5L), 1L))
          .toDF(), batchId = 101L, path)
      assert(table() == beforeCrash + ("1970-01-05" -> 1L),
        s"mid-swap crash lost accumulated counts: ${table()}")
    } finally q.stop()
  }

  test("dauWordsStream reconstructs the batch stickiness_dau_mau exactly") {
    // drain the day×word bitmap words, rebuild dau / trailing-28d mau /
    // stickiness with the batch operator's own arithmetic, compare
    // row-for-row — the streamed words ARE the batch bitmap state
    val q = EventStreams.dauWordsStream(EventStreams.eventsStream(spark, sfDir))
      .writeStream.format("memory").queryName("dau_words")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val words = spark.table("dau_words").collect()
      .map(r => (r.getAs[java.sql.Timestamp]("window_start").getTime / 86400000L,
        r.getAs[Long]("word_idx")) -> r.getAs[Long]("word")).toMap
    val days = words.keys.map(_._1).toSeq.distinct.sorted
    val idxs = words.keys.map(_._2).toSeq.distinct
    val rebuilt = days.map { d =>
      val dau = idxs.map(i => java.lang.Long.bitCount(
        words.getOrElse((d, i), 0L)).toLong).sum
      val mau = idxs.map { i =>
        val union = days.filter(x => x >= d - 27 && x <= d)
          .map(x => words.getOrElse((x, i), 0L)).fold(0L)(_ | _)
        java.lang.Long.bitCount(union).toLong
      }.sum
      d -> ((dau, mau, dau * 1000000L / mau))
    }.toMap
    val batch = operators.EventScience.stickinessDauMau(spark, sfDir).collect()
      .map(r => r.getAs[Long]("day_ord") ->
        ((r.getAs[Long]("dau"), r.getAs[Long]("mau_28d"),
          r.getAs[Long]("stickiness_ppm")))).toMap
    assert(rebuilt == batch,
      s"streamed bitmap words diverged from batch stickiness")
  }

  test("bounceRateStream agrees with the batch rollup over CLOSED sessions") {
    import spark.implicits._
    val q = EventStreams.bounceRateStream(
        EventStreams.eventsStream(spark, sfDir).as[Event])
      .writeStream.format("memory").queryName("bounce_sf")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("bounce_sf").collect()
      .map(r => r.getAs[Long]("day_ord") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"),
          r.getAs[Long]("bounce_ppm")))).toMap
    // the CANONICAL batch session frame (EventOps.sessionAssigned — the
    // one place the 30-min gap rule lives; bounce_rate derives from it
    // too), restricted to CLOSED sessions (every session but each
    // user's last — a stream cannot finalize an open session's bounce
    // status). Using the canonical frame here is what keeps the
    // streaming state machine from silently forking the gap semantics.
    val batch = operators.EventOps.sessionAssigned(spark, sfDir)
      .groupBy(col("user_id"), col("session_id"))
      .agg(count(lit(1)).as("n_ev"),
        expr("min(t_us) div 86400000000").as("day_ord"))
      .withColumn("last_s", max(col("session_id")).over(
        org.apache.spark.sql.expressions.Window.partitionBy(col("user_id"))))
      .filter(col("session_id") < col("last_s"))
      .groupBy(col("day_ord"))
      .agg(count(lit(1)).as("n_sessions"),
        sum(when(col("n_ev") === 1, 1L).otherwise(0L)).as("n_bounces"))
      .collect()
      .map(r => r.getAs[Long]("day_ord") ->
        ((r.getAs[Long]("n_sessions"), r.getAs[Long]("n_bounces"),
          r.getAs[Long]("n_bounces") * 1000000L / r.getAs[Long]("n_sessions"))))
      .toMap
    assert(streamed == batch,
      s"closed-session bounce counts diverged from the batch gap rule")
  }

  test("sessionized assigns gap-based sessions with per-user state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStreams.sessionized(input.toDS())
      .writeStream.format("memory").queryName("sessions")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("sessions").collect()
      .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_id"))).toMap
    assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 2L, 4L -> 1L, 5L -> 3L))
  }

  test("sessionized: a within-gap late event never regresses the frontier " +
      "into a spurious split") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    val q = EventStreams.sessionized(input.toDS())
      .writeStream.format("memory").queryName("sessions_late")
      .outputMode("append").start()
    try {
      // batch 1: frontier at 10:00
      input.addData(Event(1, ts(600), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: late 09:35 (within gap — merges), then 10:08. The batch
      // rule over the sorted stream (09:35, 10:00, 10:08 — gaps 25 and
      // 8 min) keeps ONE session; a frontier regressed to 09:35 would
      // split at 10:08 (33 min from the regressed frontier).
      input.addData(
        Event(2, ts(575), 1, "view", 1.0),
        Event(3, ts(608), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("sessions_late").collect()
        .map(r => (r.getAs[Long]("event_id"), r.getAs[Long]("session_id"))).toMap
      assert(out == Map(1L -> 1L, 2L -> 1L, 3L -> 1L),
        s"late within-gap event split the session: $out")
    } finally q.stop()
  }

  test("closedSessions: late data re-dates the session start only within " +
      "one gap; an out-of-gap stray never re-dates the day") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    def dayMin(d: Long, m: Long) = ts(d * 1440 + m)
    val input = MemoryStream[Event]
    val q = EventStreams.closedSessions(input.toDS())
      .writeStream.format("memory").queryName("closed_late")
      .outputMode("append").start()
    try {
      // batch 1: open session starts day 10, 12:00
      input.addData(Event(1, dayMin(10, 720), 1, "click", 1.0))
      q.processAllAvailable()
      // batch 2: late 11:45 same day (within gap BEFORE the start — the
      // batch view re-dates the start); and a stray from day 3 (out of
      // gap — merges into the open session without re-dating it)
      input.addData(
        Event(2, dayMin(10, 705), 1, "view", 1.0),
        Event(3, dayMin(3, 0), 1, "view", 1.0))
      q.processAllAvailable()
      // close the session with a >30-min-later event, then drain: the
      // emitted ClosedSession must carry day 10 (not day 3) and all 3
      // merged events
      input.addData(Event(4, dayMin(10, 800), 1, "click", 1.0))
      q.processAllAvailable()
      val out = spark.table("closed_late").collect()
        .map(r => (r.getAs[Long]("session_id"), r.getAs[Long]("n_ev"),
          r.getAs[Long]("day_ord")))
      assert(out.toSeq == Seq((1L, 3L, 10L)),
        s"closed session mis-dated or mis-counted: ${out.toSeq}")
    } finally q.stop()
  }

  test("dedupedStream drops repeated event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // In-batch duplicates of events 1-2, then a second batch replaying
    // event 5 — still inside the 2 h watermark horizon, so its dedup
    // state is live. (Events older than the horizon are evicted and
    // WOULD re-emit: that's the documented state-bound trade-off.)
    // Times sit away from the epoch: an event at exactly the initial
    // watermark (t=0) is treated as late and silently dropped.
    val ev = (1 to 5).map(i => Event(i, ts(1000 + i * 10L), 1, "click", i.toDouble))
    input.addData(ev ++ ev.take(2): _*)
    input.addData(ev.last)
    val q = EventStreams.dedupedStream(input.toDF())
      .writeStream.format("memory").queryName("dedup_stream")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val ids = spark.table("dedup_stream").select("event_id")
      .collect().map(_.getLong(0)).sorted
    assert(ids.sameElements(Array(1L, 2L, 3L, 4L, 5L)), s"got: ${ids.mkString(",")}")
  }

  test("upsertSink absorbs replayed batches into an idempotent table") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val out = java.nio.file.Files.createTempDirectory("graft_stream_upsert")
      .toString + "/events"
    val input = MemoryStream[Event]
    val writer = EventStreams.upsertSink(input.toDF(), out, Seq("event_id"))
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graft_stream_ckpt").toString)
    val ev = (1 to 4).map(i => Event(i, ts(100 + i), 1, "click", i.toDouble))
    val q = writer.start()
    try {
      input.addData(ev: _*)
      q.processAllAvailable()
      assert(spark.read.parquet(out).count() == 4)

      // An at-least-once source redelivers the same four events plus one
      // new — the stock parquet sink would append 4 duplicates; the
      // MERGE sink absorbs them and only event 5 lands.
      input.addData(ev :+ Event(5, ts(110), 2, "view", 5.0): _*)
      q.processAllAvailable()
    } finally q.stop()
    val back = spark.read.parquet(out)
    assert(back.count() == 5, "redelivered rows must merge, not append")
    assert(back.select("event_id").as[Long].collect().sorted
      .sameElements(Array(1L, 2L, 3L, 4L, 5L)))
  }

  test("funnelStream latches steps in order and ignores out-of-order/duplicate steps") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(5), 1, "purchase", 0), // before any view/click: ignored
      Event(2, ts(10), 1, "view", 0),
      Event(3, ts(12), 1, "view", 0),    // later view: not re-latched
      Event(4, ts(20), 1, "click", 0),
      Event(5, ts(25), 1, "click", 0),   // later click: not re-latched
      Event(6, ts(30), 1, "purchase", 0),
      Event(7, ts(11), 2, "click", 0),   // user 2: click without view → level 0
      Event(8, ts(40), 3, "view", 0))    // user 3: view only → level 1
    val q = EventStreams.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_stream")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("funnel_stream").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("funnel_level"),
          Option(r.getAs[java.lang.Long]("t_view")).map(_.toLong / 60000000L),
          Option(r.getAs[java.lang.Long]("t_click")).map(_.toLong / 60000000L),
          Option(r.getAs[java.lang.Long]("t_purchase")).map(_.toLong / 60000000L))))
      .toMap
    assert(out(1L) === ((3, Some(10L), Some(20L), Some(30L))))
    assert(out(2L) === ((0, None, None, None)))
    assert(out(3L) === ((1, Some(40L), None, None)))
  }

  test("funnelStream agrees with the batch window_funnel on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    // Feed sf0.001's events in event-time order (the delivery assumption
    // the streaming funnel documents) and drain; the final per-user state
    // must equal the batch conditional-MIN formulation exactly.
    val events = Tables.events(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStreams.funnelStream(input.toDS())
      .writeStream.format("memory").queryName("funnel_equiv")
      .outputMode("update").start()
    try q.processAllAvailable() finally q.stop()
    val got = spark.table("funnel_equiv").collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("funnel_level"),
          Option(r.getAs[java.lang.Long]("t_view")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_click")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_purchase")).map(_.toLong)))).toMap
    val want = operators.EventOps.windowFunnel(spark, sfDir).collect()
      .map(r => r.getAs[Long]("user_id") ->
        ((r.getAs[Int]("funnel_level"),
          Option(r.getAs[java.lang.Long]("t_view")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_click")).map(_.toLong),
          Option(r.getAs[java.lang.Long]("t_purchase")).map(_.toLong)))).toMap
    assert(got === want)
  }

  test("attribution stream-stream join links purchases to recent clicks only") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(
      Event(1, ts(100), 1, "click", 0),     // within 30 min of purchase 3
      Event(2, ts(60), 1, "click", 0),      // too old (>30 min before)
      Event(3, ts(120), 1, "purchase", 9.99),
      Event(4, ts(110), 2, "click", 0),     // other user — must not match
      Event(5, ts(125), 3, "purchase", 1.0)) // no clicks at all
    val q = EventStreams.attribution(input.toDF())
      .writeStream.format("memory").queryName("attribution")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("attribution").collect()
      .map(r => (r.getAs[Long]("purchase_id"), r.getAs[Long]("click_id"))).toSet
    assert(out == Set((3L, 1L))) // inner join: only the attributable pair
  }

  test("attributionOuter emits unmatched purchases with null clicks at " +
      "watermark expiry and still matches a late-but-within-watermark " +
      "click") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // batch 1: a purchase whose click arrives LATE (stream order after
    // the purchase, event time inside the 30-min lookback and inside
    // the 1-hour watermark), and a purchase with no clicks at all
    input.addData(
      Event(1, ts(120), 1, "purchase", 9.99),
      Event(2, ts(100), 1, "click", 0), // late delivery, still matches
      Event(3, ts(125), 3, "purchase", 1.0)) // never matched
    // batch 2: far-future flush events — one PER SIDE, because each
    // side's watermark tracks the max event time its own filtered
    // stream has seen (a "view" flush would be filtered out before the
    // watermark operator and advance nothing). These advance the global
    // watermark past every purchase, forcing the outer join to emit the
    // null rows (a no-click purchase can only appear once no late click
    // could match). The flush purchase itself stays in state (nothing
    // outlives ITS expiry horizon) and must not surface.
    input.addData(
      Event(98, ts(600), 7, "click", 0),
      Event(99, ts(600), 8, "purchase", 0))
    val q = EventStreams.attributionOuter(input.toDF())
      .writeStream.format("memory").queryName("attribution_outer")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val out = spark.table("attribution_outer").collect()
      .map(r => (r.getAs[Long]("purchase_id"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong)))
      .toSet
    assert(out === Set((1L, Some(2L)), (3L, None)))
  }

  test("attributionOuter agrees with the batch LEFT OUTER interval join " +
      "on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"),
        col("event_type"), col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    // one flush per side (each side's watermark only sees its own
    // filtered stream); the flush users don't exist in the lake, so the
    // flush click matches nothing and the flush purchase — which nothing
    // can expire — stays in state and never surfaces
    val flushTs = new Timestamp(events.last.ts.getTime + 4L * 3600 * 1000)
    val input = MemoryStream[Event]
    input.addData(events: _*)
    input.addData(Event(-1L, flushTs, -1L, "click", 0),
      Event(-2L, flushTs, -2L, "purchase", 0))
    val q = EventStreams.attributionOuter(input.toDS().toDF())
      .writeStream.format("memory").queryName("attribution_outer_equiv")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    def key(r: org.apache.spark.sql.Row) =
      (r.getAs[Long]("purchase_id"),
        Option(r.getAs[java.lang.Long]("click_id")).map(_.toLong))
    val got = spark.table("attribution_outer_equiv").collect()
      .map(key).toSet
    // batch twin: the same LEFT OUTER interval join, computed on the
    // bounded frame (no watermark needed — the batch engine sees the
    // whole input, so expiry is just "no match exists")
    val ev = events.toSeq.toDF()
    val p = ev.filter(col("event_type") === "purchase")
      .select(col("event_id").as("purchase_id"), col("user_id"),
        col("ts").as("purchase_ts"))
    val c = ev.filter(col("event_type") === "click")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val want = p.join(c,
      col("user_id") === col("c_user")
        && col("click_ts") <= col("purchase_ts")
        && col("click_ts") >= col("purchase_ts") - expr("INTERVAL 30 MINUTES"),
      "left_outer").collect().map(key).toSet
    assert(got === want)
    // non-vacuity of BOTH classes on the lake: matched and unmatched
    assert(want.exists(_._2.isDefined))
    assert(want.exists(_._2.isEmpty))
  }

  test("logIngest parses and date-partitions a streamed log directory") {
    val dir = java.nio.file.Files.createTempDirectory("graft_logs").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/a.log"),
      """2024-03-01 10:00:01 [INFO] scheduler: run started
        |garbage line without structure
        |2024-03-02 11:30:00 [ERROR] worker: task failed
        |""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("graft_logs_out").toString
    val q = EventStreams.logIngest(spark, dir)
      .writeStream.format("parquet")
      .option("path", s"$out/logs").option("checkpointLocation", s"$out/ckpt")
      .partitionBy("log_date")
      .start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(s"$out/logs")
    val rows = back.collect()
    assert(rows.length == 2) // the garbage line is rejected
    assert(back.columns.toSet == Set("ts", "level", "logger", "message", "log_date"))
    assert(new java.io.File(s"$out/logs/log_date=2024-03-01").isDirectory)
    assert(new java.io.File(s"$out/logs/log_date=2024-03-02").isDirectory)
    assert(rows.exists(r => r.getAs[String]("level") == "ERROR"
      && r.getAs[String]("message") == "task failed"))
  }

  test("documentsJsonlStream streams schema'd JSONL, dropping malformed lines") {
    val dir = java.nio.file.Files.createTempDirectory("graft_jsonl_stream").toString
    java.nio.file.Files.writeString(java.nio.file.Paths.get(s"$dir/batch0.json"),
      """{"doc_id": 1, "text": "ok", "lang": "en", "source": "s", "n_chars": 2}
        |not json
        |{"doc_id": 2, "text": "fine", "lang": "de", "source": "s", "n_chars": 4}
        |""".stripMargin)
    val out = java.nio.file.Files.createTempDirectory("graft_jsonl_stream_out").toString
    val q = EventStreams.documentsJsonlStream(spark, dir)
      .writeStream.format("parquet")
      .option("path", s"$out/docs").option("checkpointLocation", s"$out/ckpt")
      .start()
    try q.processAllAvailable() finally q.stop()
    val back = spark.read.parquet(s"$out/docs")
    assert(back.count() == 2)
    assert(back.columns.toSet == Set("doc_id", "text", "lang", "source", "n_chars"))
  }

  test("streaming windowedAgg agrees with the batch stream_window_agg twin") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    input.addData(sample: _*)
    val q = EventStreams.windowedAgg(input.toDF())
      .writeStream.format("memory").queryName("win_agg_cmp")
      .outputMode("complete").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("win_agg_cmp")
      .select(
        (col("window_start").cast("long") * 1000000000L).as("window_start_ns"),
        col("event_type"), col("n_events"))
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2))).toSet
    // Batch twin logic on the same rows (ns arithmetic, as in EventOps).
    val hourNs = 3600L * 1000000000L
    val batch = sample
      .groupBy(e => (e.ts.getTime * 1000000L - (e.ts.getTime * 1000000L % hourNs), e.event_type))
      .map { case ((w, t), es) => (w, t, es.size.toLong) }.toSet
    assert(streamed == batch)
  }

  test("debounced chains against the last KEPT event across batches") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[Event]
    // 10-minute window; events at 0, 5, 9, 21 minutes for one key:
    // 0 kept; 5 dropped (5 < 10 from kept 0); 9 dropped vs kept 0 even
    // though it is only 4 min after the DROPPED 5 (raw-lag would judge
    // against 5); 21 kept (21 > 10 from kept 0). Split across two
    // addData batches so the chain must survive in state.
    val q = EventStreams.debounced(input.toDS(), gapUs = 600000000L)
      .writeStream.format("memory").queryName("debounced")
      .outputMode("append").start()
    try {
      input.addData(
        Event(1, ts(0), 1, "click", 0),
        Event(2, ts(5), 1, "click", 0))
      q.processAllAvailable()
      input.addData(
        Event(3, ts(9), 1, "click", 0),
        Event(4, ts(21), 1, "click", 0),
        Event(5, ts(3), 2, "click", 0)) // other key: independent chain
      q.processAllAvailable()
    } finally q.stop()
    val kept = spark.table("debounced").select("event_id").as[Long]
      .collect().sorted
    assert(kept.sameElements(Array(1L, 4L, 5L)))
  }

  test("debounced keeps a superset of the batch raw-lag rule on real events") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext
    val events = Tables.events(spark, sfDir)
      .withColumn("ts", timestamp_micros(expr("ts div 1000")))
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[Event].collect().sortBy(e => (e.ts.getTime, e.event_id))
    val input = MemoryStream[Event]
    input.addData(events: _*)
    val q = EventStreams.debounced(input.toDS())
      .writeStream.format("memory").queryName("debounced_real")
      .outputMode("append").start()
    try q.processAllAvailable() finally q.stop()
    val streamed = spark.table("debounced_real").select("event_id").as[Long]
      .collect().toSet
    val batchKept = operators.EventOps.eventDebounce(spark, sfDir)
      .select("event_id").as[Long].collect().toSet
    // The last KEPT event is never later than the raw predecessor, so
    // clearing the raw gap implies clearing the chained gap.
    assert(batchKept.subsetOf(streamed),
      s"chaining must keep every raw-lag survivor " +
        s"(missing ${(batchKept -- streamed).size})")
    // Chained survivors themselves respect the window key-by-key.
    val byKey = spark.table("debounced_real")
      .collect().groupBy(r => (r.getAs[Long]("user_id"),
        r.getAs[String]("event_type")))
    byKey.values.foreach { rs =>
      rs.map(_.getAs[Long]("t_us")).sorted.sliding(2).foreach {
        case Array(a, b) => assert(b - a > EventStreams.DebounceGapUs)
        case _ =>
      }
    }
  }
}
