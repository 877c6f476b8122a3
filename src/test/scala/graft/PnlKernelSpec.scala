package graft

import java.sql.Timestamp

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{AccState, HubState, MarketEvent, PnlKernel}

/** Golden-path scenarios from SURVEY.md §5.2 / FIXTURES.md §1, mirroring the
  * reference's netting cases (PnlAndExposureJob.java:113-143).
  */
class PnlKernelSpec extends AnyFunSuite {

  private var seq = 0L
  private def ts(s: Long) = new Timestamp(1700000000000L + s * 1000)
  private def trade(side: String, mw: Int, px: Double, account: String = "ACC1") = {
    seq += 1
    MarketEvent(seq, ts(seq), "HUB", "trade", account, side, mw, px)
  }
  private def price(px: Double) = {
    seq += 1
    MarketEvent(seq, ts(seq), "HUB", "price", "", "", 0, px)
  }

  private def run(events: MarketEvent*) = PnlKernel.runHub(events.iterator).toVector

  test("open long position: avg = trade px, lp falls back to trade px") {
    val out = run(trade("BUY", 10, 50.0))
    assert(out.size == 1)
    val r = out.head
    assert(r.position_mw == 10 && r.avg_price_mwh == 50.0 && r.last_price_mwh == 50.0)
    assert(r.realized_pnl == 0.0 && r.unrealized_pnl == 0.0 && r.total_pnl == 0.0)
  }

  test("same-side add computes weighted average cost") {
    val out = run(trade("BUY", 10, 50.0), trade("BUY", 10, 60.0))
    val r = out.last
    assert(r.position_mw == 20 && r.avg_price_mwh == 55.0)
    assert(r.realized_pnl == 0.0)
  }

  test("partial close realizes at closing qty AND zeroes position+avg (ref :125-126)") {
    // Reference-exact: residual = |qty| - closing == 0 for ANY |qty| <= |pos|,
    // and the residual==0 branch zeroes both position and avg
    // (PnlAndExposureJob.java:125-126) — partial closes included, not just
    // full closes. SELL 5 into +20 leaves position 0, not +15.
    val out = run(trade("BUY", 20, 55.0), trade("SELL", 5, 70.0))
    val r = out.last
    assert(r.position_mw == 0 && r.avg_price_mwh == 0.0)
    assert(r.realized_pnl == 5 * (70.0 - 55.0))
  }

  test("SELL 5 into +10 zeroes the position (ref :125-126 residual==0 branch)") {
    val out = run(trade("BUY", 10, 50.0), trade("SELL", 5, 60.0))
    val r = out.last
    assert(r.position_mw == 0 && r.avg_price_mwh == 0.0)
    assert(r.realized_pnl == 5 * (60.0 - 50.0))
    // subsequent BUY reopens from flat at the new trade's px
    val out2 = run(trade("BUY", 10, 50.0), trade("SELL", 5, 60.0), trade("BUY", 8, 52.0))
    val r2 = out2.last
    assert(r2.position_mw == 8 && r2.avg_price_mwh == 52.0)
  }

  test("full close zeroes both position and avg (ref :126)") {
    val out = run(trade("BUY", 10, 50.0), trade("SELL", 10, 60.0))
    val r = out.last
    assert(r.position_mw == 0 && r.avg_price_mwh == 0.0)
    assert(r.realized_pnl == 100.0)
  }

  test("flip: residual position at trade px (ref :127)") {
    val out = run(trade("BUY", 10, 50.0), trade("SELL", 25, 40.0))
    val r = out.last
    assert(r.position_mw == -15 && r.avg_price_mwh == 40.0)
    assert(r.realized_pnl == 10 * (40.0 - 50.0))
  }

  test("short side: realized uses avg - px; partial cover zeroes too (ref :123,:125-126)") {
    val out = run(trade("SELL", 10, 50.0), trade("BUY", 4, 45.0))
    val r = out.last
    assert(r.position_mw == 0 && r.avg_price_mwh == 0.0) // residual==0 zeroes (ref :125-126)
    assert(r.realized_pnl == 4 * (50.0 - 45.0))
  }

  test("price before any trade emits nothing (empty state sweep)") {
    assert(run(price(55.0)).isEmpty)
  }

  test("price tick after trade: mark-to-market sweep + lp update on next trade") {
    val out = run(trade("BUY", 10, 50.0), price(55.0), trade("BUY", 5, 56.0))
    assert(out.size == 3)
    val sweep = out(1)
    assert(sweep.last_price_mwh == 55.0 && sweep.unrealized_pnl == 10 * 5.0)
    // trade row uses the PREVIOUS tick's price, not the trade price (ref :130)
    val t2 = out(2)
    assert(t2.last_price_mwh == 55.0)
  }

  test("side is case-insensitive (ref :116)") {
    val out = run(trade("buy", 10, 50.0), trade("Sell", 10, 60.0))
    assert(out.last.realized_pnl == 100.0)
  }

  test("multi-account sweep emits per account in sorted order, closed accounts included") {
    val out = run(
      trade("BUY", 10, 50.0, "ACC2"),
      trade("BUY", 5, 50.0, "ACC1"),
      trade("SELL", 5, 52.0, "ACC1"), // ACC1 now flat, stays in state
      price(60.0))
    val sweep = out.drop(3)
    assert(sweep.map(_.account) == Vector("ACC1", "ACC2"))
    assert(sweep(0).position_mw == 0 && sweep(0).unrealized_pnl == 0.0)
    assert(sweep(1).unrealized_pnl == 10 * 10.0)
  }

  test("total = realized + unrealized on every row") {
    val out = run(trade("BUY", 25, 47.5), price(49.1), trade("SELL", 50, 51.2),
      price(48.0), trade("BUY", 25, 46.0), price(50.5))
    out.foreach(r => assert(r.total_pnl == r.realized_pnl + r.unrealized_pnl))
  }

  test("step on unknown account creates it from flat") {
    val (st, rows) = PnlKernel.step(HubState.empty, trade("SELL", 5, 10.0, "X"))
    assert(st.accounts("X") == AccState(-5, 10.0, 0.0))
    assert(rows.size == 1)
  }
}
