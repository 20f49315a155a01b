package graft

import org.scalatest.funsuite.AnyFunSuite
import org.scalatest.BeforeAndAfterAll
import org.apache.spark.sql.SparkSession
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
}
