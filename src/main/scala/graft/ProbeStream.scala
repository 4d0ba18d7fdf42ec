package graft

import java.sql.Timestamp

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

import graft.streaming.Streaming

/** Streaming-operator throughput probe (the ProbeGraph sibling for the
  * stateful streaming family): events/second through the micro-batch
  * loop for the three state shapes — watermarked window aggregation
  * (windowedCounts), transformWithState value state (runningTotals),
  * and event-time-timer sessionization (sessionizeV2) — at increasing
  * event counts, RocksDB state store, MemoryStream source.
  *
  * Numbers here measure the LOCAL micro-batch loop (source is
  * in-memory, sink is the memory table): they bound operator+state
  * overhead, not network/Kafka. The scaling signal is events/sec
  * staying ~flat as the event count grows — per-event state cost is
  * O(1), so falling throughput would mean state or planning overhead
  * growing with history, the thing TTL/watermark eviction exists to
  * prevent.
  *
  * Usage: runMain graft.ProbeStream [eventCountsCsv]
  */
object ProbeStream {
  def main(args: Array[String]): Unit = {
    val counts = args.headOption.getOrElse("20000,100000,500000")
      .split(",").map(_.trim.toInt).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state." +
          "RocksDBStateStoreProvider")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // deterministic synthetic event stream: 1000 users, events 10s
    // apart per user with occasional 40-min gaps so sessions both
    // extend and split
    def events(n: Int): Seq[(Long, Timestamp, String, Double)] = {
      val base = Timestamp.valueOf("2024-01-01 00:00:00").getTime
      (0 until n).map { i =>
        val user = (i % 1000).toLong
        val step = i / 1000
        val gapMs = step.toLong * 10000 +
          (step / 120).toLong * 2400000 // a 40-min jump every 120 steps
        (user, new Timestamp(base + gapMs),
          if (i % 3 == 0) "click" else "view", (i % 100).toDouble)
      }
    }

    def timeIt(label: String, n: Int)(run: Seq[(Long, Timestamp, String,
        Double)] => Unit): Unit = {
      val data = events(n)
      val t0 = System.nanoTime()
      run(data)
      val sec = (System.nanoTime() - t0) / 1e9
      println(f"""{"probe":"stream","op":"$label","n_events":$n,""" +
        f""""sec":$sec%.2f,"events_per_sec":${(n / sec).toLong}}""")
    }

    for (n <- counts) {
      timeIt("windowed_counts", n) { data =>
        val mem = MemoryStream[(Long, Timestamp, String, Double)]
        val df = mem.toDF().toDF("user_id", "ts", "event_type", "value")
        val q = Streaming.windowedCounts(df, "ts", "10 minutes", "1 hour")
          .writeStream.format("memory").queryName(s"ps_wc_$n")
          .outputMode("append").start()
        data.grouped(math.max(1, data.length / 5 + 1)).foreach { c =>
          mem.addData(c); q.processAllAvailable()
        }
        q.stop()
      }
      timeIt("running_totals", n) { data =>
        val mem = MemoryStream[(Long, Timestamp, String, Double)]
        val ds = mem.toDS().map(t => Streaming.KeyedValue(t._3, t._4))
        val q = Streaming.runningTotals(ds).toDF()
          .writeStream.format("memory").queryName(s"ps_rt_$n")
          .outputMode("update").start()
        data.grouped(math.max(1, data.length / 5 + 1)).foreach { c =>
          mem.addData(c); q.processAllAvailable()
        }
        q.stop()
      }
      timeIt("sessionize_v2", n) { data =>
        val mem = MemoryStream[Streaming.SessionEvent]
        val q = Streaming.sessionizeV2(mem.toDS(), gapMinutes = 30,
          watermarkDelay = "0 seconds")
          .writeStream.format("memory").queryName(s"ps_sv2_$n")
          .outputMode("append").start()
        val evs = data.map(d => Streaming.SessionEvent(d._1, d._2))
        evs.grouped(math.max(1, evs.length / 5 + 1)).foreach { c =>
          mem.addData(c); q.processAllAvailable()
        }
        q.stop()
      }
    }
    spark.stop()
  }
}
