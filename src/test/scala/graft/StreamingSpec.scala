package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.{SparkSession, functions => F}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.Trigger
import graft.streaming.StreamingOps

/** Structured Streaming operators driven through MemoryStream batches. */
class StreamingSpec extends AnyFunSuite with BeforeAndAfterAll {

  @transient lazy val spark: SparkSession = SparkSession.builder()
    .master("local[2]")
    .appName("graft-streaming-test")
    .config("spark.sql.shuffle.partitions", "2")
    .config("spark.ui.enabled", "false")
    .config("spark.sql.session.timeZone", "UTC")
    .getOrCreate()

  override def afterAll(): Unit = spark.stop()

  test("runningHistogram over a memory stream matches batch counts") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[Double]
    val hist = StreamingOps.runningHistogram(
      stream.toDF().withColumnRenamed("value", "x"), "x",
      binStart = 0.0, binWidth = 10.0, numBins = 5)
    stream.addData(Seq(1.0, 5.0, 15.0, 25.0, 49.9, 60.0, -3.0): _*)
    val q = hist.writeStream.format("memory").queryName("hist_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("hist_out").collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    // bins: [-inf→0]=clamped 0, [0,10)=0, [10,20)=1, [20,30)=2, [40,50)=4, 60→clamped 4
    assert(rows(0L) == 3, s"bin0=${rows.get(0L)}") // 1.0, 5.0, -3.0
    assert(rows(1L) == 1 && rows(2L) == 1)
    assert(rows(4L) == 2, s"bin4=${rows.get(4L)}") // 49.9 + clamped 60.0
  }

  test("windowedGroupedFit: streaming fits equal the batch fitByGroup") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp, Double)]
    // base aligned to a 10-minute boundary (1700000400 = :20:00) so the
    // 0..7-minute event times all land in ONE window and the batch twin
    // (which groups by key alone) sees the same populations
    def ts(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    // two keys inside one 10-minute window, positive values so every
    // family is admissible for key a; key b holds a negative value
    val rows = (1 to 40).map(i => ("a", ts(i % 8), math.exp(0.05 * i))) ++
      (1 to 10).map(i => ("b", ts(i % 8), i - 2.0))
    // watermark wider than the event-time span so no batching of the
    // memory source can late-drop rows — this test pins the FIT
    // arithmetic, not watermark semantics (windowedStats covers those)
    val out = StreamingOps.windowedGroupedFit(
      stream.toDF().toDF("k", "t", "v"), "v", Seq("k"), "t",
      window = "10 minutes", watermark = "30 minutes")
    stream.addData(rows: _*)
    val q = out.writeStream.format("memory").queryName("gfit_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("gfit_out")
      .select($"k", $"distribution", $"n", $"parameters", $"aic")
      .collect()
      .map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getSeq[Double](3), r.getDouble(4))).toMap
    // batch twin over the same rows (window constant — all data in one)
    val batch = operators.GroupedFit.fitByGroup(
        rows.toDF("k", "t", "v"), "v", Seq("k")).collect()
      .map(r => (r.getString(0), r.getAs[String]("distribution")) ->
        (r.getAs[Long]("n"), r.getSeq[Double](r.fieldIndex("parameters")),
          r.getAs[Double]("aic"))).toMap
    assert(streamed.keySet == batch.keySet, s"${streamed.keySet} vs ${batch.keySet}")
    assert(streamed.keys.count(_._1 == "a") == 7, "all 7 families for key a")
    streamed.foreach { case (key, (n, ps, aic)) =>
      val (nb, pb, ab) = batch(key)
      assert(n == nb)
      assert(ps.length == pb.length, s"$key parameter arity $ps vs $pb")
      ps.zip(pb).foreach { case (x, y) => assert(math.abs(x - y) < 1e-9, s"$key") }
      assert(math.abs(aic - ab) < 1e-6, s"$key aic $aic vs $ab")
    }
  }

  test("sessionStats closes gap-based sessions like the batch Sessionize") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp, Double)]
    def ts(min: Int) = new java.sql.Timestamp(1700000000000L + min * 60000L)
    val out = StreamingOps.sessionStats(
      stream.toDF().toDF("k", "t", "v"), "k", "t", "v", gap = "5 minutes")
    // u1: events at 0,2,4 min (one session), then 20 min (second session)
    stream.addData(("u1", ts(0), 1.0), ("u1", ts(2), 2.0), ("u1", ts(4), 3.0),
      ("u1", ts(20), 9.0), ("u2", ts(1), 5.0))
    val q = out.writeStream.format("memory").queryName("sess_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("sess_out")
      .select("k", "n_events", "value_sum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getDouble(2))).toSet
    assert(rows == Set(("u1", 3L, 6.0), ("u1", 1L, 9.0), ("u2", 1L, 5.0)), rows.toString)
    // batch Sessionize agrees on the same data (gap semantics parity)
    val batch = Seq(("u1", 0L), ("u1", 2L), ("u1", 4L), ("u1", 20L), ("u2", 1L))
      .toDF("k", "t")
    val b = operators.Sessionize.summarize(batch, "k", "t", gap = 5L)
      .select("k", "n_events").collect().map(r => (r.getString(0), r.getLong(1)))
    assert(b.toSet == Set(("u1", 3L), ("u1", 1L), ("u2", 1L)))
  }

  test("sessionizeWithState closes sessions by gap and by event-time timeout") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, java.sql.Timestamp, Double)]
    def ts(s: Int) = new java.sql.Timestamp(1700000000000L + s * 1000L)
    val input = stream.toDF().toDF("k", "t", "v")
      .withWatermark("t", "0 seconds")
      .as[(String, java.sql.Timestamp, Double)]
    val out = StreamingOps.sessionizeWithState(input, gapMs = 5000L)
    val q = out.writeStream.format("memory").queryName("fmgws_out")
      .outputMode("append").start()
    // batch 1: u1 opens a session (0s, 2s); u2 opens one (1s)
    stream.addData(("u1", ts(0), 1.0), ("u1", ts(2), 2.0), ("u2", ts(1), 5.0))
    q.processAllAvailable()
    assert(spark.table("fmgws_out").count() == 0) // nothing closed yet
    // batch 2: u1's event at 20s exceeds the 5s gap -> closes (0,2) inline;
    // the watermark advance to 20s then times out u2's idle session
    stream.addData(("u1", ts(20), 9.0))
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("fmgws_out")
      .select("key", "start", "end", "n", "valueSum").collect()
      .map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getDouble(4)))
      .toSet
    assert(rows == Set(
      ("u1", ts(0).getTime, ts(2).getTime, 2L, 3.0),
      ("u2", ts(1).getTime, ts(1).getTime, 1L, 5.0)), rows.toString)
    // u1's session at 20s is still open (no successor, watermark at 20s)
  }

  test("windowedStats groups by event-time window with a watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val stats = StreamingOps.windowedStats(
      stream.toDF().toDF("ts", "v"), "v", "ts",
      window = "1 minute", watermark = "1 minute")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(
      (ts("2026-01-01 00:00:10"), 10.0), (ts("2026-01-01 00:00:40"), 20.0),
      (ts("2026-01-01 00:01:10"), 30.0))
    val q = stats.writeStream.format("memory").queryName("stats_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("stats_out").collect()
    assert(rows.length == 2, s"windows=${rows.length}")
    val first = rows.minBy(_.getStruct(0).getTimestamp(0).getTime)
    assert(first.getAs[Long]("cnt") == 2 && first.getAs[Double]("mean") == 15.0)
  }

  test("windowedTopK: exact heavy hitters per window, state-capped beyond") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val hh = StreamingOps.windowedTopK(
      stream.toDF().toDF("ts", "k"), "k", "ts",
      cap = 16, window = "1 minute", watermark = "1 minute")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    // window 1: a×3, b×2, c×1; window 2: b×2, d×1 — split across two
    // micro-batches so the sketch state must MERGE across them
    stream.addData(
      (ts("2026-01-01 00:00:05"), "a"), (ts("2026-01-01 00:00:10"), "a"),
      (ts("2026-01-01 00:00:15"), "b"))
    stream.addData(
      (ts("2026-01-01 00:00:20"), "a"), (ts("2026-01-01 00:00:25"), "b"),
      (ts("2026-01-01 00:00:30"), "c"),
      (ts("2026-01-01 00:01:05"), "b"), (ts("2026-01-01 00:01:10"), "b"),
      (ts("2026-01-01 00:01:20"), "d"))
    val q = hh.writeStream.format("memory").queryName("topk_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("topk_out").collect()
      .map(r => (r.getStruct(0).getTimestamp(0).toString.substring(14, 16),
        r.getAs[String]("key")) -> (r.getAs[Long]("cnt"), r.getAs[Long]("err")))
      .toMap
    assert(rows(("00", "a")) == (3L, 0L))
    assert(rows(("00", "b")) == (2L, 0L))
    assert(rows(("00", "c")) == (1L, 0L))
    assert(rows(("01", "b")) == (2L, 0L))
    assert(rows(("01", "d")) == (1L, 0L))
  }

  test("windowedQuantiles: KLL state probes land on the exact quantiles") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val qs = StreamingOps.windowedQuantiles(
      stream.toDF().toDF("ts", "v"), "v", "ts", probs = Seq(0.5),
      k = 800, window = "1 minute", watermark = "1 minute")
    def ts(i: Int) =
      java.sql.Timestamp.valueOf(f"2026-01-01 00:00:${i % 60}%02d.${i}%03d")
    // 200 values 1..200 split across two micro-batches → p50 ≈ 100
    stream.addData((1 to 120).map(i => (ts(i % 50), i.toDouble)): _*)
    stream.addData((121 to 200).map(i => (ts(i % 50), i.toDouble)): _*)
    val q = qs.writeStream.format("memory").queryName("kllq_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("kllq_out").collect()
    assert(rows.length == 1)
    assert(rows.head.getAs[Long]("n") == 200L)
    val p50 = rows.head.getAs[Double]("q_50")
    // n < k → the sketch is exact; the inclusive-rank quantile at 0.5
    // of 1..200 is 100
    assert(math.abs(p50 - 100.0) <= 1.0, s"p50=$p50")
  }

  test("windowedDriftScore is near zero for on-model data, large off-model") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    val rng = new java.util.Random(7L)
    // window 1: uniform(0,100) samples (the reference model); window 2:
    // everything piled at 95 (drifted)
    val onModel = (1 to 400).map(i =>
      (ts(f"2026-01-01 00:00:${10 + i % 40}%02d"), rng.nextDouble() * 100.0))
    val drifted = (1 to 400).map(i =>
      (ts(f"2026-01-01 00:01:${10 + i % 40}%02d"), 95.0))
    val stream = MemoryStream[(java.sql.Timestamp, Double)]
    val drift = StreamingOps.windowedDriftScore(
      stream.toDF().toDF("ts", "v"), "v", "ts",
      "uniform", Array(0.0, 100.0), binStart = 0.0, binWidth = 10.0, numBins = 10,
      window = "1 minute", watermark = "5 minutes")
    stream.addData(onModel ++ drifted: _*)
    val q = drift.writeStream.format("memory").queryName("drift_out")
      .outputMode("complete").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("drift_out").collect()
      .map(r => r.getStruct(0).getTimestamp(0).getTime -> r.getAs[Double]("drift_sse"))
      .sortBy(_._1).map(_._2)
    assert(rows.length == 2)
    // on-model: each bin share ≈ 0.1 → SSE ~ sampling noise; drifted: one
    // bin holds everything → SSE ≈ (1-0.1)² + 9·0.1² = 0.9
    assert(rows(0) < 0.05, s"on-model drift ${rows(0)}")
    assert(rows(1) > 0.5, s"drifted drift ${rows(1)}")
  }

  test("streamingCusum accumulates the shift and carries state across batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(String, Long, Long, Double)]
      val out = StreamingOps.streamingCusum(stream.toDS(),
        target = 10.0, slack = 0.5, h = 3.0)
      val q = out.writeStream.format("memory").queryName("cusum_out")
        .outputMode("update").start()
      // batch 1: on-target values, S+ stays ~0
      stream.addData(("k", 1L, 1L, 10.0), ("k", 2L, 2L, 10.5),
        ("k", 3L, 3L, 9.5))
      q.processAllAvailable()
      // batch 2: persistent +2 shift — S+ = sum of (12 - 10.5) = 1.5/row
      stream.addData(("k", 4L, 4L, 12.0), ("k", 5L, 5L, 12.0),
        ("k", 6L, 6L, 12.0))
      q.processAllAvailable()
      q.stop()
      val last = spark.table("cusum_out").collect()
        .maxBy(_.getAs[Long]("n"))
      assert(last.getAs[Long]("n") == 6L)
      // hand recurrence: d = v-10.5: -.5, 0, -1, 1.5, 1.5, 1.5 ->
      // S+ clamps at 0 through batch 1, then 1.5, 3.0, 4.5
      val sHi = last.getAs[Double]("cumHi") - last.getAs[Double]("minHi")
      assert(math.abs(sHi - 4.5) < 1e-12)
      assert(last.getAs[Double]("maxHi") == sHi)
      assert(last.getAs[Long]("nAlarms") == 1L) // only 4.5 > 3.0
      val sLo = last.getAs[Double]("cumLo") - last.getAs[Double]("minLo")
      assert(sLo < 3.0) // no downward drift
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("streamingScd2 closes versions across batches and matches the " +
    "batch dimension") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(Long, Long, Long, String)]
      val out = StreamingOps.streamingScd2(stream.toDS())
      val q = out.writeStream.format("memory").queryName("scd2_out")
        .outputMode("update").start()
      // batch 1: A at t=1,2 then B at t=3 — closes v1 within the batch
      stream.addData((7L, 1L, 1L, "A"), (7L, 2L, 2L, "A"),
        (7L, 3L, 3L, "B"))
      q.processAllAvailable()
      // batch 2: the cross-batch close (B → A at t=5) is the part a
      // single availableNow replay cannot exercise
      stream.addData((7L, 4L, 4L, "B"), (7L, 5L, 5L, "A"))
      q.processAllAvailable()
      q.stop()
      // closed-wins dedup per (key, version)
      val dim = spark.table("scd2_out")
        .groupBy("key", "version")
        .agg(F.max("attr").as("attr"),
          F.min("validFrom").as("valid_from"),
          F.max("validTo").as("valid_to"))
        .orderBy("version").collect()
      assert(dim.length == 3)
      assert(dim.map(_.getAs[String]("attr")).toSeq == Seq("A", "B", "A"))
      assert(dim.map(_.getAs[Long]("valid_from")).toSeq == Seq(1L, 3L, 5L))
      assert(dim(0).getAs[Long]("valid_to") == 3L)
      assert(dim(1).getAs[Long]("valid_to") == 5L)
      assert(dim(2).isNullAt(dim(2).fieldIndex("valid_to")))
      // identical to the batch builder on the same rows
      val batch = graft.operators.Cdc.scd2Build(
        Seq((7L, 1L, 1L, "A"), (7L, 2L, 2L, "A"), (7L, 3L, 3L, "B"),
          (7L, 4L, 4L, "B"), (7L, 5L, 5L, "A"))
          .toDF("key", "ts", "id", "attr"),
        "key", "ts", Seq("attr"), Seq("id"))
        .orderBy("version").collect()
      assert(batch.map(_.getAs[String]("attr")).toSeq ==
        dim.map(_.getAs[String]("attr")).toSeq)
      assert(batch.map(_.getAs[Long]("valid_from")).toSeq ==
        dim.map(_.getAs[Long]("valid_from")).toSeq)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("prequentialAnomaly: flags against pre-event state, carries state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(String, Long, Long, Double)]
      val out = StreamingOps.prequentialAnomaly(
        stream.toDS(), zThreshold = 2.0, minN = 4L)
      val q = out.writeStream.format("memory").queryName("anom_out")
        .outputMode("append").start()
      // 4 baseline points (mean 0.5, var 0.25), then a level break at
      // t=5: z = (10 - 0.5)/0.5 = 19 -> flagged with n_before = 4
      stream.addData(("k", 1L, 1L, 0.0), ("k", 2L, 2L, 1.0),
        ("k", 3L, 3L, 0.0), ("k", 4L, 4L, 1.0), ("k", 5L, 5L, 10.0))
      q.processAllAvailable()
      q.stop()
      val rows = spark.table("anom_out").collect()
      assert(rows.length == 1)
      assert(rows(0).getAs[Long]("tns") == 5L)
      assert(rows(0).getAs[Double]("z") == 19.0)
      assert(rows(0).getAs[Long]("n_before") == 4L)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("keyedRunningStatsTws: transformWithState Welford over RocksDB state") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val saved = spark.conf.getOption("spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val stream = MemoryStream[(String, Double)]
      val out = StreamingOps.keyedRunningStatsTws(
        stream.toDS(), java.time.Duration.ofHours(1))
      val q = out.writeStream.format("memory").queryName("tws_out")
        .outputMode("update").start()
      // the TTL timer keeps scheduling micro-batches, so
      // processAllAvailable never settles — poll the sink instead
      def awaitRows(n: Long): Unit = {
        val deadline = System.currentTimeMillis() + 120000
        while (spark.table("tws_out").count() < n &&
          System.currentTimeMillis() < deadline) Thread.sleep(200)
        assert(spark.table("tws_out").count() >= n, s"timed out waiting for $n rows")
      }
      stream.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
      awaitRows(2)
      stream.addData(("a", 5.0)) // state must carry n=2, mean=2 across batches
      awaitRows(3)
      q.stop()
      val last = spark.table("tws_out").collect()
        .map(r => (r.getString(0), r.getLong(1), r.getDouble(2)))
        .groupBy(_._1).map { case (k, rs) => k -> rs.maxBy(_._2) }
      assert(last("a") == (("a", 3L, 3.0)), last.toString) // mean(1,3,5)=3
      assert(last("b") == (("b", 1L, 10.0)), last.toString)
    } finally {
      saved match {
        case Some(v) => spark.conf.set("spark.sql.streaming.stateStore.providerClass", v)
        case None => spark.conf.unset("spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("keyedRunningStats carries Welford state across micro-batches") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(String, Double)]
    val stats = StreamingOps.keyedRunningStats(stream.toDS())
    val q = stats.writeStream.format("memory").queryName("keystats_out")
      .outputMode("update").start()
    stream.addData(("a", 1.0), ("a", 3.0), ("b", 10.0))
    q.processAllAvailable()
    stream.addData(("a", 5.0), ("b", 30.0))
    q.processAllAvailable()
    q.stop()
    // memory sink in update mode appends updated rows; take the LAST row
    // per key
    val last = spark.table("keystats_out").collect()
      .map(r => (r.getAs[String]("key"), r.getAs[Long]("n"), r.getAs[Double]("mean"),
        r.getAs[Double]("m2")))
      .groupBy(_._1).map { case (k, rows) => k -> rows.maxBy(_._2) }
    val a = last("a")
    assert(a._2 == 3 && math.abs(a._3 - 3.0) < 1e-12, s"a=$a") // mean(1,3,5)=3
    assert(math.abs(a._4 - 8.0) < 1e-12, s"a.m2=${a._4}") // M2 = (1-3)²+(3-3)²+(5-3)²
    val b = last("b")
    assert(b._2 == 2 && math.abs(b._3 - 20.0) < 1e-12, s"b=$b")
  }

  test("streamingDedup drops repeated texts within the watermark") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    val stream = MemoryStream[(java.sql.Timestamp, String)]
    val deduped = StreamingOps.streamingDedup(
      stream.toDF().toDF("ts", "text"), "text", "ts", watermark = "10 minutes")
    def ts(s: String) = java.sql.Timestamp.valueOf(s)
    stream.addData(
      (ts("2026-01-01 00:00:01"), "alpha"), (ts("2026-01-01 00:00:02"), "beta"),
      (ts("2026-01-01 00:00:03"), "alpha"), (ts("2026-01-01 00:00:04"), "gamma"),
      (ts("2026-01-01 00:00:05"), "beta"))
    val q = deduped.writeStream.format("memory").queryName("dedup_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val texts = spark.table("dedup_out").collect().map(_.getAs[String]("text")).sorted
    assert(texts.toSeq == Seq("alpha", "beta", "gamma"), s"got ${texts.toSeq}")
  }

  test("funnelPaths chains interval joins into ordered triples") {
    import spark.implicits._
    implicit val sc = spark.sqlContext
    def ts(min: Int) = new java.sql.Timestamp(1700000400000L + min * 60000L)
    val views = MemoryStream[(Long, java.sql.Timestamp)]
    val clicks = MemoryStream[(Long, java.sql.Timestamp)]
    val buys = MemoryStream[(Long, java.sql.Timestamp)]
    // user 1: view(0) -> click(10) -> buy(20): one full path
    // user 2: click(5) BEFORE its view(10): no path
    // user 3: view(0) -> click(90): outside the 1h lookback
    views.addData((1L, ts(0)), (2L, ts(10)), (3L, ts(0)))
    clicks.addData((1L, ts(10)), (2L, ts(5)), (3L, ts(90)))
    buys.addData((1L, ts(20)), (2L, ts(15)), (3L, ts(95)))
    def df(m: MemoryStream[(Long, java.sql.Timestamp)]) =
      m.toDF().toDF("u", "t")
    val paths = StreamingOps.funnelPaths(df(views), df(clicks),
      df(buys), "u", "t", lookback = "1 hour", watermark = "1 hour")
    val q = paths.writeStream.format("memory").queryName("funnel_out")
      .outputMode("append").trigger(Trigger.AvailableNow()).start()
    q.processAllAvailable()
    q.stop()
    val rows = spark.table("funnel_out").collect()
    assert(rows.length == 1, s"got ${rows.length} paths")
    assert(rows.head.getAs[Long]("u") == 1L)
  }
}
