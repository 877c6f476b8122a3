package graft

import java.sql.Timestamp

import scala.util.Random

import org.scalatest.funsuite.AnyFunSuite

import graft.operators.{MarketEvent, PnlKernel}

/** Property invariants from SURVEY.md §5.3, over seeded random event tapes. */
class PnlPropertySpec extends AnyFunSuite {

  private def randomTape(seed: Long, n: Int): List[MarketEvent] = {
    val rnd = new Random(seed)
    (0 until n).toList.map { i =>
      val isTrade = rnd.nextInt(10) < 3
      val px = math.rint((5.0 + rnd.nextDouble() * 115.0) * 100) / 100
      MarketEvent(i.toLong, new Timestamp(1700000000000L + i * 1000), "HUB",
        if (isTrade) "trade" else "price",
        if (isTrade) "ACC" + rnd.nextInt(3) else "",
        if (isTrade) Seq("BUY", "SELL", "buy", "sell")(rnd.nextInt(4)) else "",
        if (isTrade) Seq(5, 10, 25, 50)(rnd.nextInt(4)) else 0,
        px)
    }
  }

  test("position = sum of signed trade quantities per account") {
    for (seed <- 0L until 50L) {
      val events = randomTape(seed, 200)
      val out = PnlKernel.runHub(events.iterator).toVector
      val expected = events.filter(_.kind == "trade").groupBy(_.account).map {
        case (acc, ts) =>
          acc -> ts.map(e => if (e.side.equalsIgnoreCase("BUY")) e.mw else -e.mw).sum
      }
      val finalPos = out.groupBy(_.account).map { case (a, rows) =>
        a -> rows.maxBy(_.seq).position_mw
      }
      expected.foreach { case (a, p) => assert(finalPos(a) == p, s"seed=$seed account=$a") }
    }
  }

  test("total = realized + unrealized bit-exactly on every emitted row") {
    for (seed <- 0L until 50L) {
      PnlKernel.runHub(randomTape(seed, 200).iterator).foreach { r =>
        assert(r.total_pnl == r.realized_pnl + r.unrealized_pnl)
      }
    }
  }

  test("realized PnL only changes at trade events") {
    for (seed <- 0L until 50L) {
      val events = randomTape(seed, 200)
      val tradeSeqs = events.filter(_.kind == "trade").map(_.seq).toSet
      val out = PnlKernel.runHub(events.iterator).toVector
      out.groupBy(_.account).foreach { case (_, rows) =>
        rows.sortBy(_.seq).sliding(2).foreach {
          case Seq(a, b) if !tradeSeqs.contains(b.seq) =>
            assert(b.realized_pnl == a.realized_pnl)
          case _ => ()
        }
      }
    }
  }

  test("output cardinality = #trades + sum over ticks of accounts in state") {
    for (seed <- 0L until 20L) {
      val events = randomTape(seed, 100)
      val out = PnlKernel.runHub(events.iterator).toVector
      var known = Set.empty[String]
      var expected = 0
      events.foreach { e =>
        if (e.kind == "trade") { known += e.account; expected += 1 }
        else expected += known.size
      }
      assert(out.size == expected, s"seed=$seed")
    }
  }

  test("sharded replay is bit-identical to unsharded and spreads >4 partitions") {
    val spark = TestSpark.spark
    import spark.implicits._
    val rnd = new Random(7L)
    val tape = (0 until 4000).map { i =>
      val hub = "H" + rnd.nextInt(4)
      val isTrade = rnd.nextInt(10) < 4
      MarketEvent(i.toLong, new Timestamp(1700000000000L + i * 500), hub,
        if (isTrade) "trade" else "price",
        if (isTrade) "ACC" + rnd.nextInt(60) else "",
        if (isTrade) Seq("BUY", "SELL")(rnd.nextInt(2)) else "",
        if (isTrade) Seq(5, 10, 25, 50)(rnd.nextInt(4)) else 0,
        math.rint((5.0 + rnd.nextDouble() * 115.0) * 100) / 100)
    }
    val ds = tape.toDS()
    def key(r: graft.operators.PnlRow) = (r.seq, r.account)
    val unsharded = graft.operators.Pnl.replay(ds, shards = 1).collect().sortBy(key)
    val sharded = graft.operators.Pnl.replay(ds, shards = 8)
    val rows = sharded.collect().sortBy(key)
    assert(rows.length == unsharded.length)
    rows.zip(unsharded).foreach { case (a, b) => assert(a == b) }
    // 4 hubs x 8 shards must occupy more partitions than the 4-value hub
    // domain ever could (the 100 TB parallelism ceiling the salt removes).
    // AQE coalesces this tiny fixture to 1 partition, hiding the key
    // spread — pin it off and widen the shuffle for just this check.
    val aqe = spark.conf.get("spark.sql.adaptive.enabled")
    val sp = spark.conf.get("spark.sql.shuffle.partitions")
    try {
      spark.conf.set("spark.sql.adaptive.enabled", "false")
      spark.conf.set("spark.sql.shuffle.partitions", "32")
      val nonEmpty = graft.operators.Pnl.replay(ds, shards = 8).rdd
        .mapPartitions(it => Iterator(if (it.hasNext) 1 else 0)).sum().toInt
      assert(nonEmpty > 4, s"only $nonEmpty non-empty partitions")
    } finally {
      spark.conf.set("spark.sql.adaptive.enabled", aqe)
      spark.conf.set("spark.sql.shuffle.partitions", sp)
    }
  }

  test("splitting a trade into two same-price halves preserves position and realized") {
    for (seed <- 0L until 50L) {
      val rnd = new Random(seed)
      val px = math.rint((5.0 + rnd.nextDouble() * 95.0) * 100) / 100
      val mw = Seq(10, 20, 50)(rnd.nextInt(3))
      def t(seq: Long, side: String, m: Int, p: Double) =
        MarketEvent(seq, new Timestamp(1700000000000L + seq), "H", "trade", "A", side, m, p)
      val whole = PnlKernel.runHub(Iterator(t(0, "BUY", mw, px), t(1, "SELL", mw, px + 3))).toVector
      val split = PnlKernel.runHub(Iterator(
        t(0, "BUY", mw / 2, px), t(1, "BUY", mw - mw / 2, px),
        t(2, "SELL", mw, px + 3))).toVector
      assert(whole.last.position_mw == split.last.position_mw)
      assert(math.abs(whole.last.realized_pnl - split.last.realized_pnl) < 1e-9)
    }
  }
}
