package graft.operators

import java.sql.Timestamp

/** Engine-typed market event: tagged union of the trade and price streams
  * feeding the PnL operator (reference PnlAndExposureJob.java:50 connects the
  * two keyed streams; SURVEY.md §2.5). `kind` ∈ {"trade","price"}; on price
  * events the trade-only fields are empty/0. `seq` pins arrival order
  * (FIXTURES.md §3): replay order is `(ts, seq)` per hub.
  */
final case class MarketEvent(
    seq: Long,
    ts: Timestamp,
    hub: String,
    kind: String,
    account: String,
    side: String,
    mw: Int,
    price_mwh: Double)

/** Output row — mirrors `positions_pnl` (postgres/init.sql:30-40), plus
  * `seq`: the triggering event's arrival id. Postgres uses an implicit SERIAL
  * for this; we carry it explicitly as the deterministic replay/order key.
  */
final case class PnlRow(
    seq: Long,
    ts: Timestamp,
    account: String,
    hub: String,
    position_mw: Int,
    avg_price_mwh: Double,
    last_price_mwh: Double,
    realized_pnl: Double,
    unrealized_pnl: Double,
    total_pnl: Double)

/** Exposure row — mirrors `price_exposure` (postgres/init.sql:53-61). */
final case class ExposureRow(
    seq: Long,
    ts: Timestamp,
    account: String,
    hub: String,
    position_mw: Int,
    last_price_mwh: Double,
    pnl01: Double,
    notional_usd: Double)

/** Per-account average-cost position state (reference
  * PnlAndExposureJob.java:86 `PositionAccumulator`).
  */
final case class AccState(position_mw: Int, avg_price_mwh: Double, realized_pnl: Double)

/** Per-hub operator state: last seen price + per-account positions (reference
  * PnlAndExposureJob.java:107-111 `ValueState<Double>` + `MapState`). A plain
  * immutable Map keeps the class encodable for `flatMapGroupsWithState`
  * state; the mark-to-market sweep sorts keys at emission time — the
  * reference iterates `MapState` in undefined order
  * (PnlAndExposureJob.java:136); we make the emission order deterministic
  * (SURVEY.md §7 "hard parts").
  */
final case class HubState(
    lastPrice: Double,
    hasPrice: Boolean,
    accounts: Map[String, AccState])

object HubState {
  val empty: HubState = HubState(0.0, hasPrice = false, Map.empty)
}

/** Pure average-cost PnL fold — the business logic of the reference's
  * `PnlCalculator` (`KeyedCoProcessFunction`, PnlAndExposureJob.java:106-144)
  * as side-effect-free functions shared by the batch replay
  * ([[Pnl.replay]]) and the streaming operator
  * (`flatMapGroupsWithState` in graft.streaming).
  *
  * Semantics preserved exactly (SURVEY.md §2.5):
  *   - BUY/SELL case-insensitive (ref :116); signed qty = ±mw.
  *   - Same-direction (or flat) trade: weighted-average cost
  *     `(|pos|*avg + |qty|*px) / |pos+qty|` (ref :117-120).
  *   - Opposite direction: `closing = min(|pos|,|qty|)` realizes
  *     `closing * (pos>0 ? px-avg : avg-px)`; then
  *     `residual = |qty| - closing` — when `residual == 0` (i.e. `|qty| <=
  *     |pos|`, which covers PARTIAL closes as well as full closes) the
  *     reference zeroes BOTH position and avg (ref :125-126: `if (residual
  *     == 0) { positionMw = 0; avgPriceMwh = 0.0; }`); a SELL 5 into +10
  *     leaves position 0, not +5. Only `residual > 0` (a flip) keeps a
  *     position: `sign(qty) * residual` at `avg = trade px` (ref :127).
  *     This is NOT standard average-cost netting (a partial close vaporizes
  *     the remaining position) but it is what the reference computes, and
  *     parity is the contract — see SURVEY.md §2.5 "partial-close
  *     semantics".
  *   - A trade emits one row; `last_price` falls back to the trade's own
  *     price until a tick has been seen (ref :130-131).
  *   - A price tick updates `lastPrice` then emits one row per account in
  *     state — mark-to-market sweep (ref :134-137); accounts stay in state
  *     forever (even at position 0), as the reference never clears MapState.
  *   - `unrealized = pos * (lastPrice - avg)`, `total = realized + unrealized`
  *     (ref :139-143).
  */
object PnlKernel {

  def applyTrade(acc: AccState, side: String, mw: Int, px: Double): AccState = {
    val signed = if (side.equalsIgnoreCase("BUY")) mw else -mw
    val pos = acc.position_mw
    if (pos == 0 || (pos > 0) == (signed > 0)) {
      // open or add in the same direction: weighted-average cost
      val newPos = pos + signed
      val newAvg =
        if (newPos == 0) 0.0
        else (math.abs(pos) * acc.avg_price_mwh + math.abs(signed) * px) / math.abs(newPos)
      AccState(newPos, newAvg, acc.realized_pnl)
    } else {
      // reduce / close / flip — reference-exact (PnlAndExposureJob.java:121-127):
      // residual == 0 covers BOTH full and partial closes, zeroing position+avg.
      val closing = math.min(math.abs(pos), math.abs(signed))
      val pnlPerUnit = if (pos > 0) px - acc.avg_price_mwh else acc.avg_price_mwh - px
      val realized = acc.realized_pnl + closing * pnlPerUnit
      val residual = math.abs(signed) - closing
      if (residual == 0) AccState(0, 0.0, realized)
      else AccState(Integer.signum(signed) * residual, px, realized) // flip: avg = trade px
    }
  }

  private def emit(seq: Long, ts: Timestamp, hub: String, account: String,
      acc: AccState, lp: Double): PnlRow = {
    val unrealized = acc.position_mw * (lp - acc.avg_price_mwh)
    PnlRow(seq, ts, account, hub, acc.position_mw, acc.avg_price_mwh, lp,
      acc.realized_pnl, unrealized, acc.realized_pnl + unrealized)
  }

  /** Process one event; returns updated state and emitted rows (1 row per
    * trade; one row per account in state per price tick).
    */
  def step(st: HubState, e: MarketEvent): (HubState, Seq[PnlRow]) =
    if (e.kind == "trade") {
      val acc = st.accounts.getOrElse(e.account, AccState(0, 0.0, 0.0))
      val next = applyTrade(acc, e.side, e.mw, e.price_mwh)
      val lp = if (st.hasPrice) st.lastPrice else e.price_mwh
      (st.copy(accounts = st.accounts.updated(e.account, next)),
        Seq(emit(e.seq, e.ts, e.hub, e.account, next, lp)))
    } else {
      val st2 = st.copy(lastPrice = e.price_mwh, hasPrice = true)
      val rows = st2.accounts.toSeq.sortBy(_._1).map { case (account, acc) =>
        emit(e.seq, e.ts, e.hub, account, acc, e.price_mwh)
      }
      (st2, rows)
    }

  /** Fold a (ts, seq)-sorted iterator of one hub's events. */
  def runHub(events: Iterator[MarketEvent]): Iterator[PnlRow] = {
    var st = HubState.empty
    events.flatMap { e =>
      val (st2, rows) = step(st, e)
      st = st2
      rows
    }
  }

  /** Derive the exposure projection (reference PnlAndExposureJob.java:65-69):
    * `pnl01` = PnL of a \$1 move = position; `notional = pos * last_price`.
    */
  def exposure(r: PnlRow): ExposureRow =
    ExposureRow(r.seq, r.ts, r.account, r.hub, r.position_mw, r.last_price_mwh,
      r.position_mw.toDouble, r.position_mw * r.last_price_mwh)
}
