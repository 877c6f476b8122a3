package graft.sources

import java.time.{LocalDateTime, ZoneOffset}
import java.time.format.DateTimeFormatter

import scala.util.Random

import graft.model.{DaLmp, PriceTick, RtLmp, Trade}

/** Seeded Scala counterpart of the reference's data producers — the price
  * random-walk / trade generator (producer.py:36-70) and the DA/RT LMP
  * generator (producer_da_rt.py:33-60): same hub/account alphabets, same
  * distributions, same wire JSON — but deterministic: an explicit seed and a
  * simulated clock replace wall time, so a tape can be replayed
  * bit-identically into tests and benches.
  *
  * Distribution parity (asserted in IngestJobsSpec):
  *   - init price ~ U(15, 75); step = drift U(-0.3, 0.3) + shock N(0, 0.8)
  *     + 0.05·(diurnal + solar) baseline, floored at 5.0, rounded to cents
  *   - a trade on ~50% of steps: uniform hub/account/side, mw ∈
  *     {5,10,25,50}, px = hub price + U(-1, 1); trade ids count every step
  *     (the reference increments before the coin flip, so ids skip)
  *   - DA components every 10 ticks: energy = base + U(-2,2),
  *     congestion N(0,1.5), loss U(-0.5,0.8), lmp = rounded sum
  *   - RT components every tick, higher vol: U(-3,3), N(0,3), U(-1,1.2)
  *   - prices/trades timestamps are naive ISO-8601 (producer.py:89), DA/RT
  *     are offset-aware `+00:00` (producer_da_rt.py:11-12)
  */
object MarketGen {

  val Hubs: Seq[String] = Seq("PJM-WEST", "ERCOT-HOUSTON", "NYISO-ZONEJ", "CAISO-NP15")
  val Accounts: Seq[String] = Seq("ACC1", "ACC2", "ACC3")
  val MwChoices: Seq[Int] = Seq(5, 10, 25, 50)

  /** 2024-01-15T10:00:00Z — fixed simulated epoch. */
  val DefaultStartMillis: Long = 1705312800000L

  final case class MarketTape(prices: Vector[PriceTick], trades: Vector[Trade])
  final case class LmpTape(da: Vector[DaLmp], rt: Vector[RtLmp])

  /** round(x, 2) with python's half-even semantics. */
  private def r2(x: Double): Double = math.rint(x * 100) / 100

  private val fracFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss.SSSSSS")
  private val wholeFmt = DateTimeFormatter.ofPattern("yyyy-MM-dd'T'HH:mm:ss")

  /** `datetime.utcnow().isoformat()`: micros when fractional, bare seconds
    * otherwise — both timestamp variants appear on the wire.
    */
  private[graft] def isoNaive(ms: Long): String = {
    val ldt = LocalDateTime.ofEpochSecond(ms / 1000, ((ms % 1000) * 1000000).toInt, ZoneOffset.UTC)
    if (ms % 1000 == 0) ldt.format(wholeFmt) else ldt.format(fracFmt)
  }

  /** `datetime.now(timezone.utc).isoformat()` — offset-aware variant. */
  private[graft] def isoUtc(ms: Long): String = isoNaive(ms) + "+00:00"

  private def hourOf(ms: Long): Int =
    LocalDateTime.ofEpochSecond(ms / 1000, 0, ZoneOffset.UTC).getHour

  /** Price-tick + trade tape (producer.py main loop, 200 ms cadence). */
  def marketTape(seed: Long, steps: Int,
                 startMillis: Long = DefaultStartMillis,
                 stepMillis: Long = 200): MarketTape = {
    val rnd = new Random(seed)
    val state = scala.collection.mutable.LinkedHashMap(
      Hubs.map(h => h -> r2(15.0 + rnd.nextDouble() * 60.0)): _*)
    val prices = Vector.newBuilder[PriceTick]
    val trades = Vector.newBuilder[Trade]
    var tradeId = 0L
    var i = 0
    while (i < steps) {
      val now = startMillis + i * stepMillis
      val hour = hourOf(now)
      val diurnal = 5.0 * (1.0 + (if (hour >= 7 && hour <= 20) 1.0 else -0.5))
      val solar = -3.0 * (if (hour >= 11 && hour <= 15) 1.0 else 0.0)
      val baseline = diurnal + solar
      Hubs.foreach { hub =>
        val drift = -0.3 + rnd.nextDouble() * 0.6
        val shock = rnd.nextGaussian() * 0.8
        state(hub) = math.max(5.0, r2(state(hub) + drift + shock + baseline * 0.05))
      }
      val nowIso = isoNaive(now)
      Hubs.foreach(hub => prices += PriceTick(nowIso, hub, state(hub)))
      tradeId += 1
      if (rnd.nextDouble() < 0.5) {
        val hub = Hubs(rnd.nextInt(Hubs.size))
        val px = state(hub) + (-1.0 + rnd.nextDouble() * 2.0)
        trades += Trade(tradeId, isoNaive(now), Accounts(rnd.nextInt(Accounts.size)),
          hub, if (rnd.nextInt(2) == 0) "BUY" else "SELL",
          MwChoices(rnd.nextInt(MwChoices.size)), r2(px))
      }
      i += 1
    }
    MarketTape(prices.result(), trades.result())
  }

  /** DA/RT LMP tape (producer_da_rt.py main loop, 1 s cadence; DA every
    * 10 ticks).
    */
  def lmpTape(seed: Long, steps: Int,
              startMillis: Long = DefaultStartMillis,
              stepMillis: Long = 1000): LmpTape = {
    val rnd = new Random(seed)
    val da = Vector.newBuilder[DaLmp]
    val rt = Vector.newBuilder[RtLmp]
    var i = 0
    while (i < steps) {
      val now = startMillis + i * stepMillis
      val hour = hourOf(now)
      var base = 25.0
      if (hour >= 6 && hour <= 22) {
        base += 12.0
        if (hour >= 12 && hour <= 17) base += 6.0
      } else base -= 5.0
      if (i % 10 == 0) {
        Hubs.foreach { hub =>
          val energy = base + (-2.0 + rnd.nextDouble() * 4.0)
          val cong = rnd.nextGaussian() * 1.5
          val loss = -0.5 + rnd.nextDouble() * 1.3
          da += DaLmp(isoUtc(now), hub, r2(energy + cong + loss), r2(energy), r2(cong), r2(loss))
        }
      }
      Hubs.foreach { hub =>
        val energy = base + (-3.0 + rnd.nextDouble() * 6.0)
        val cong = rnd.nextGaussian() * 3.0
        val loss = -1.0 + rnd.nextDouble() * 2.2
        rt += RtLmp(isoUtc(now), hub, r2(energy + cong + loss), r2(energy), r2(cong), r2(loss))
      }
      i += 1
    }
    LmpTape(da.result(), rt.result())
  }

  // -------------------------------------------------------------------------
  // Wire frames — the JSON the producers put on each topic
  // -------------------------------------------------------------------------

  def priceJson(p: PriceTick): String =
    s"""{"ts": "${p.ts}", "hub": "${p.hub}", "price_mwh": ${p.price_mwh}}"""

  def tradeJson(t: Trade): String =
    s"""{"trade_id": ${t.trade_id}, "ts": "${t.ts}", "account": "${t.account}", "hub": "${t.hub}", "side": "${t.side}", "mw": ${t.mw}, "price_mwh": ${t.price_mwh}}"""

  def daJson(d: DaLmp): String =
    s"""{"ts": "${d.ts}", "hub": "${d.hub}", "lmp_da": ${d.lmp_da}, "energy_da": ${d.energy_da}, "congestion_da": ${d.congestion_da}, "loss_da": ${d.loss_da}}"""

  def rtJson(r: RtLmp): String =
    s"""{"ts": "${r.ts}", "hub": "${r.hub}", "lmp_rt": ${r.lmp_rt}, "energy_rt": ${r.energy_rt}, "congestion_rt": ${r.congestion_rt}, "loss_rt": ${r.loss_rt}}"""
}
