package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Bars

/** Hand-built-tape semantics test for the OHLC+VWAP bar rollup: two hubs,
  * two hourly bars, out-of-order inserts so open/close really test the
  * (ts, seq) arg-min/arg-max and not arrival order.
  */
class BarsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  // hour-aligned base (1700002800 = 23:00:00 UTC) so minute offsets < 60
  // stay inside one hourly bar
  private def ts(m: Int) = new Timestamp(1700002800000L + m * 60000L)

  // (seq, ts, hub, kind, side, mw, price_mwh) — the eventsAsMarket shape
  private def tape() = {
    import spark.implicits._
    Seq(
      // H0, bar 1: ticks out of arrival order; open = seq 2 @ min ts
      (5L, ts(30), "H0", "price", "", 0, 50.0),
      (2L, ts(1), "H0", "price", "", 0, 10.0),
      (9L, ts(55), "H0", "price", "", 0, 20.0),
      // same ts as seq 9 — seq breaks the close tie deterministically
      (8L, ts(55), "H0", "price", "", 0, 99.0),
      // H0, bar 1 trades: vwap = (10*100 + 30*20) / 30
      (3L, ts(5), "H0", "trade", "BUY", 10, 100.0),
      (4L, ts(6), "H0", "trade", "SELL", 20, 30.0),
      // H0, bar 2: single tick, no trades → NULL trade stats
      (11L, ts(70), "H0", "price", "", 0, 77.0),
      // H1: trades only → NULL price stats
      (6L, ts(10), "H1", "trade", "BUY", 5, 40.0)
    ).toDF("seq", "ts", "hub", "kind", "side", "mw", "price_mwh")
  }

  test("open/close follow (ts, seq) order; vwap exact; outer bars keep nulls") {
    val rows = Bars.ohlcVwap(tape()).orderBy("hub", "bucket_start_s").collect()
    assert(rows.length == 3)

    val b1 = rows(0) // H0 bar 1
    assert(b1.getAs[Double]("open") == 10.0, "open is the earliest (ts, seq) tick")
    assert(b1.getAs[Double]("close") == 20.0, "close ties on ts break to higher seq")
    assert(b1.getAs[Double]("high") == 99.0 && b1.getAs[Double]("low") == 10.0)
    assert(b1.getAs[Long]("n_ticks") == 4)
    assert(b1.getAs[Double]("vwap") == (10 * 100.0 + 20 * 30.0) / 30.0)
    assert(b1.getAs[Long]("mw_total") == 30 && b1.getAs[Long]("n_trades") == 2)

    val b2 = rows(1) // H0 bar 2: price side only
    assert(b2.getAs[Double]("open") == 77.0 && b2.getAs[Double]("close") == 77.0)
    assert(b2.isNullAt(b2.fieldIndex("vwap")) && b2.isNullAt(b2.fieldIndex("n_trades")))

    val b3 = rows(2) // H1: trade side only
    assert(b3.getAs[String]("hub") == "H1")
    assert(b3.isNullAt(b3.fieldIndex("open")) && b3.isNullAt(b3.fieldIndex("n_ticks")))
    assert(b3.getAs[Double]("vwap") == 40.0)
  }

  test("streaming bars equal batch bars on the planted tape, nulls included") {
    import spark.implicits._
    val rows = tape().collect().map(r => graft.operators.MarketEvent(
        r.getAs[Long]("seq"), r.getAs[Timestamp]("ts"), r.getAs[String]("hub"),
        r.getAs[String]("kind"), "", r.getAs[String]("side"),
        r.getAs[Int]("mw"), r.getAs[Double]("price_mwh")))
      .sortBy(e => (e.ts.getTime, e.seq)).toSeq
    val flush = graft.operators.MarketEvent(-1L,
      new Timestamp(rows.last.ts.getTime + 2 * 3600 * 1000L),
      "__flush", "price", "", "", 0, 0.0)
    val got = graft.streaming.MemoryReplay.replay(spark, rows :+ flush, nBatches = 3)(
        ds => graft.streaming.StreamingOps.barsStream(ds.toDF(), "1 hour", "0 seconds")
          .as[graft.streaming.BarRow])
      .filter(col("hub") =!= "__flush")
      .orderBy("hub", "bucket_start_s").collect()
    val want = Bars.ohlcVwap(tape()).orderBy("hub", "bucket_start_s").collect()
    assert(got.length == want.length && got.nonEmpty)
    got.zip(want).foreach { case (g, w) =>
      w.schema.fieldNames.foreach { f =>
        assert(g.getAs[Any](f) == w.getAs[Any](f), s"field $f: $g vs $w")
      }
    }
  }

  test("bar boundaries respect the requested length") {
    val out = Bars.ohlcVwap(tape(), barLen = "30 minutes")
      .filter(col("hub") === "H0").collect()
    // H0 ticks span minutes 1..70 → 30-minute bars: [0,30), [30,60), [60,90)
    assert(out.length == 3)
  }

  test("resampleFfill completes the grid and carries the close through gaps") {
    import spark.implicits._
    // H0 price ticks in hour-buckets 0, 1 and 4 → gaps at 2 and 3
    val df = Seq(
      (1L, ts(5), "H0", "price", "", 0, 10.0),
      (2L, ts(50), "H0", "price", "", 0, 12.0),  // bucket 0 close
      (3L, ts(65), "H0", "price", "", 0, 20.0),  // bucket 1
      (4L, ts(245), "H0", "price", "", 0, 30.0), // bucket 4
      // trades must be invisible to the price resample
      (5L, ts(125), "H0", "trade", "BUY", 5, 99.0)
    ).toDF("seq", "ts", "hub", "kind", "side", "mw", "price_mwh")
    val out = Bars.resampleFfill(df).orderBy("bucket_start_s").collect()
    assert(out.length == 5) // buckets 0..4 inclusive
    val byIdx = out.zipWithIndex.map(_.swap).toMap
    assert(byIdx(0).getAs[Long]("n_ticks") == 2
      && !byIdx(0).getAs[Boolean]("is_gap")
      && byIdx(0).getAs[Double]("close_ffill") == 12.0)
    assert(byIdx(2).getAs[Boolean]("is_gap")
      && byIdx(2).getAs[Long]("n_ticks") == 0
      && byIdx(2).getAs[Double]("close_ffill") == 20.0, "gap carries bucket-1 close")
    assert(byIdx(3).getAs[Double]("close_ffill") == 20.0)
    assert(!byIdx(4).getAs[Boolean]("is_gap")
      && byIdx(4).getAs[Double]("close_ffill") == 30.0)
  }
}
