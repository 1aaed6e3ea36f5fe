package graft.streaming

import java.util.concurrent.atomic.AtomicInteger

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import graft.model.OverrideType

/**
 * The transformWithState (state v2, named timers) form of the T8/T9
 * expiration punctuators, driven through the same scenarios as the FMGWS
 * form: arm-and-fire round trip, tombstone disarm, last-record-wins
 * re-arm. Runs on the RocksDB state store (required by the API).
 */
class TwsExpirySpec extends AnyFunSuite {

  private lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    s
  }

  import spark.implicits._

  private val ids = new AtomicInteger(0)

  private def startQuery(ms: MemoryStream[OverrideRecord], qn: String) =
    StreamRules.expirationTimersTws(ms.toDS(), OverrideType.Shelved)
      .writeStream.format("memory").queryName(qn).outputMode("append")
      .option("checkpointLocation",
        java.nio.file.Files.createTempDirectory("graftck").toString)
      .trigger(org.apache.spark.sql.streaming.Trigger.ProcessingTime("500 milliseconds"))
      .start()

  private def pollCount(qn: String, until: Long => Boolean, deadlineMs: Long): Long = {
    val deadline = System.currentTimeMillis() + deadlineMs
    var n = spark.table(qn).count()
    while (!until(n) && System.currentTimeMillis() < deadline) {
      Thread.sleep(250)
      n = spark.table(qn).count()
    }
    n
  }

  test("tws timers: shelve with short expiration fires a tombstone") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[OverrideRecord]
    val qn = s"tws${ids.incrementAndGet()}"
    val q = startQuery(ms, qn)
    try {
      ms.addData(Seq(OverrideRecord(1, "a", OverrideType.Shelved,
        oneshot = Some(false), expiration = Some(System.currentTimeMillis() + 3000))))
      val n = pollCount(qn, _ > 0, 45000)
      assert(n == 1)
      val fired = spark.table(qn).as[OverrideEmission].collect()
      assert(fired.head == OverrideEmission("a", OverrideType.Shelved, None))
    } finally q.stop()
  }

  test("tws timers: explicit tombstone cancels the armed timer") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[OverrideRecord]
    val qn = s"tws${ids.incrementAndGet()}"
    val q = startQuery(ms, qn)
    try {
      ms.addData(Seq(OverrideRecord(1, "a", OverrideType.Shelved,
        oneshot = Some(false), expiration = Some(System.currentTimeMillis() + 4000))))
      Thread.sleep(1000) // let the arm batch run
      ms.addData(Seq(OverrideRecord(2, "a", OverrideType.Shelved, tombstone = true)))
      val n = pollCount(qn, _ > 0, 9000)
      assert(n == 0, "cancelled timer must not fire")
    } finally q.stop()
  }

  test("tws timers: re-shelve replaces the timer (one firing, not two)") {
    implicit val sq = spark.sqlContext
    val ms = MemoryStream[OverrideRecord]
    val qn = s"tws${ids.incrementAndGet()}"
    val q = startQuery(ms, qn)
    try {
      ms.addData(Seq(OverrideRecord(1, "a", OverrideType.Shelved,
        oneshot = Some(false), expiration = Some(System.currentTimeMillis() + 2000))))
      Thread.sleep(800) // arm the first timer
      ms.addData(Seq(OverrideRecord(2, "a", OverrideType.Shelved,
        oneshot = Some(false), expiration = Some(System.currentTimeMillis() + 4000))))
      val n = pollCount(qn, _ > 0, 45000)
      assert(n == 1, "exactly one firing after re-arm")
      // nothing further fires from the replaced first timer
      Thread.sleep(2000)
      assert(spark.table(qn).count() == 1)
    } finally q.stop()
  }
}
