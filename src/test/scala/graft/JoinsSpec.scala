package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators.Joins

/** Semantics checks for the generic join operators: as-of join against a
  * per-row computed expectation (incl. no-match nulls and equal-timestamp
  * ties), bucketed range join against the naive inequality join, and the
  * approx_count_distinct error bound backing q40.
  */
class JoinsSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  test("asOfJoin picks the latest right row at-or-before, null when none") {
    val sp = spark
    import sp.implicits._
    // left: (key, t, lseq); right: (key, t, rseq, px)
    val left = Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 20L, 3L),
      ("b", 7L, 4L), ("c", 1L, 5L)).toDF("k", "t", "lseq")
    val right = Seq(("a", 5L, 10L, 1.5), ("a", 15L, 11L, 2.5),
      ("b", 3L, 12L, 3.5), ("b", 7L, 13L, 4.5), ("d", 1L, 14L, 9.9))
      .toDF("k", "t", "rseq", "px")
    val out = Joins.asOfJoin(left, right, keys = Seq("k"),
        orderCols = Seq("t"), rightVals = Map("px" -> "px", "rseq" -> "src"))
      .select(col("lseq"), col("px"), col("src"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    // lseq=1: t=5 — right (a,5) counts (inclusive <=)
    assert(out(1L) == ((Some(1.5), Some(10L))))
    assert(out(2L) == ((Some(1.5), Some(10L)))) // t=10: only (a,5) at-or-before
    assert(out(3L) == ((Some(2.5), Some(11L)))) // t=20: (a,15) is latest
    assert(out(4L) == ((Some(4.5), Some(13L)))) // tie at t=7 counts (<=)
    assert(out(5L) == ((None, None)))           // key c has no right rows
  }

  test("asOfJoin forward picks the earliest right row at-or-after") {
    val sp = spark
    import sp.implicits._
    val left = Seq(("a", 5L, 1L), ("a", 10L, 2L), ("a", 20L, 3L),
      ("b", 7L, 4L), ("c", 1L, 5L)).toDF("k", "t", "lseq")
    val right = Seq(("a", 5L, 10L, 1.5), ("a", 15L, 11L, 2.5),
      ("b", 3L, 12L, 3.5), ("b", 7L, 13L, 4.5), ("d", 1L, 14L, 9.9))
      .toDF("k", "t", "rseq", "px")
    val out = Joins.asOfJoin(left, right, keys = Seq("k"),
        orderCols = Seq("t"), rightVals = Map("px" -> "px", "rseq" -> "src"),
        direction = "forward")
      .select(col("lseq"), col("px"), col("src"))
      .collect().map(r => r.getLong(0) -> ((Option(r.get(1)), Option(r.get(2))))).toMap
    assert(out(1L) == ((Some(1.5), Some(10L)))) // tie at t=5 counts (>=)
    assert(out(2L) == ((Some(2.5), Some(11L)))) // t=10: next is (a,15)
    assert(out(3L) == ((None, None)))           // t=20: nothing after
    assert(out(4L) == ((Some(4.5), Some(13L)))) // tie at t=7 counts (>=)
    assert(out(5L) == ((None, None)))           // key c has no right rows
  }

  test("operator argument contracts fail fast, not deep in a job") {
    val sp = spark
    import sp.implicits._
    val df = Seq((1L, "a")).toDF("id", "k")
    intercept[IllegalArgumentException] {
      Joins.asOfJoin(df, df, Seq("k"), Seq("id"), Map("id" -> "x"),
        direction = "sideways")
    }
    intercept[IllegalArgumentException] {
      Joins.saltedJoin(df, df, Seq("k"), salts = 0, saltBy = col("id"))
    }
    intercept[IllegalArgumentException] {
      Joins.rangeJoinBucketed(df, "id", df, "id", "id", bucketWidth = 0.0)
    }
    intercept[IllegalArgumentException] {
      graft.sources.Warehouse.zValue(col("id"), col("id"), bits = 40)
    }
    intercept[IllegalArgumentException] {
      operators.Percentiles.exact(df, col("k"), col("id"), Seq(("p", 1.5)))
    }
    intercept[IllegalArgumentException] {
      operators.Corpus.splitAssign(df, col("id"),
        Seq(("a", 0.8), ("b", 0.4))) // fractions sum over 1
    }
    intercept[IllegalArgumentException] {
      // corpus smaller than codebookSize: fail with a message, not an
      // ArrayIndexOutOfBounds deep inside plan build
      val tiny = Seq((1L, Seq(0.1f, 0.2f)), (2L, Seq(0.3f, 0.4f)))
        .toDF("vec_id", "embedding")
      operators.Quantize.pqCodebooks(tiny, m = 2, k = 256)
    }
  }

  test("saltedJoin equals the plain join and spreads hot keys over salts") {
    val sp = spark
    import sp.implicits._
    // one hot key carrying 90% of the facts
    val fact = (0L until 1000L).map(i =>
      (i, if (i < 900) "hot" else s"cold${i % 7}", i * 1.5)).toDF("id", "k", "v")
    val dim = fact.select(col("k")).distinct().withColumn("dlen", length(col("k")))
    val plain = fact.join(dim, Seq("k")).select(col("id"), col("k"), col("v"), col("dlen"))
    val salted = Joins.saltedJoin(fact, dim, Seq("k"), salts = 8, saltBy = col("id"))
      .select(col("id"), col("k"), col("v"), col("dlen"))
    assert(salted.count() == 1000)
    assert(plain.exceptAll(salted).count() == 0 && salted.exceptAll(plain).count() == 0,
      "salted join must equal the plain join exactly")
    // the hot key's rows really occupy multiple salt buckets
    val spread = fact.filter(col("k") === "hot")
      .select(pmod(xxhash64(col("id")), lit(8)).as("s")).distinct().count()
    assert(spread == 8, "hash salt must spread the hot key across all buckets")
  }

  test("deriveSalts: uniform keys derive 1, hot keys derive the skew multiple, cap holds") {
    // uniform: every key at the mean frequency → 1 (plain join)
    assert(Joins.deriveSalts(nKeys = 10, nRows = 1000, maxCount = 100) == 1)
    // 90% hot over 11 keys: ceil(900 * 11 / 1000) = 10
    assert(Joins.deriveSalts(nKeys = 11, nRows = 1000, maxCount = 900) == 10)
    // pathological single-key-dominates at high cardinality → clamped
    assert(Joins.deriveSalts(nKeys = 1000000, nRows = 1000001,
      maxCount = 1000000) == 64)
    assert(Joins.deriveSalts(nKeys = 1000000, nRows = 1000001,
      maxCount = 1000000, maxSalts = 8) == 8)
    // warehouse cardinalities: maxCount*nKeys would overflow Long
    assert(Joins.deriveSalts(nKeys = 1000000000L, nRows = 1000000000000L,
      maxCount = 1000000000000L) == 64)
    // degenerate inputs fall back to the plain join
    assert(Joins.deriveSalts(nKeys = 0, nRows = 0, maxCount = 0) == 1)
  }

  test("skewAwareJoin salts a skewed key, skips salting a uniform one, equals plain join") {
    val sp = spark
    import sp.implicits._
    val fact = (0L until 1000L).map(i =>
      (i, if (i < 900) "hot" else s"cold${i % 7}", i * 1.5)).toDF("id", "k", "v")
    val dim = fact.select(col("k")).distinct().withColumn("dlen", length(col("k")))
    val plain = fact.join(dim, Seq("k")).select(col("id"), col("k"), col("v"), col("dlen"))
    val adaptive = Joins.skewAwareJoin(fact, dim, Seq("k"), saltBy = col("id"),
      auditCol = Some("salts"))
    // 8 keys, hot at 900/1000 → ceil(900*8/1000) = 8 salts chosen
    assert(adaptive.select(col("salts")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(8))
    val rows = adaptive.select(col("id"), col("k"), col("v"), col("dlen"))
    assert(plain.exceptAll(rows).count() == 0 && rows.exceptAll(plain).count() == 0,
      "adaptive join must equal the plain join exactly")
    // uniform key: decision rule picks 1 → plain join path
    val uni = (0L until 700L).map(i => (i, s"k${i % 7}", i * 2.0)).toDF("id", "k", "v")
    val uniDim = uni.select(col("k")).distinct().withColumn("dlen", length(col("k")))
    val uniOut = Joins.skewAwareJoin(uni, uniDim, Seq("k"), saltBy = col("id"),
      auditCol = Some("salts"))
    assert(uniOut.select(col("salts")).distinct().collect()
      .map(_.getInt(0)).toSeq == Seq(1))
    assert(uniOut.count() == 700)
  }

  test("asOfJoin over market events matches a window-computed expectation") {
    val m = operators.Pnl.eventsAsMarket(Tables.events(spark, dir)).toDF().cache()
    val trades = m.filter(col("kind") === "trade")
      .select(col("seq"), col("ts"), col("hub"), col("price_mwh"))
    val prices = m.filter(col("kind") === "price")
      .select(col("hub"), col("ts"), col("seq"), col("price_mwh"))
    val viaOp = Joins.asOfJoin(trades, prices, Seq("hub"), Seq("ts", "seq"),
        Map("price_mwh" -> "last_px"))
      .select(col("seq"), col("last_px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    // independent construction: running last over the full tagged stream
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("hub")).orderBy(col("ts"), col("seq"))
      .rowsBetween(Long.MinValue, 0)
    val expect = m
      .withColumn("last_px", last(when(col("kind") === "price", col("price_mwh")),
        ignoreNulls = true).over(w))
      .filter(col("kind") === "trade")
      .select(col("seq"), col("last_px"))
      .collect().map(r => r.getLong(0) -> Option(r.get(1))).toMap
    assert(viaOp.nonEmpty && viaOp == expect)
    m.unpersist()
  }

  test("asOfJoin property: equals naive latest-at-or-before on random tapes") {
    val sp = spark
    import sp.implicits._
    val rnd = new scala.util.Random(7)
    // 40 keys × colliding small timestamps; globally unique seqn makes the
    // (t, seqn) order total so the expectation is well-defined
    val left = (0 until 400).map { i =>
      (s"k${rnd.nextInt(40)}", rnd.nextInt(50).toLong, 100000L + i)
    }
    val right = (0 until 300).map { i =>
      (s"k${rnd.nextInt(40)}", rnd.nextInt(50).toLong, i.toLong, rnd.nextDouble())
    }
    val out = Joins.asOfJoin(
        left.toDF("k", "t", "seqn"),
        right.toDF("k", "t", "seqn", "px"),
        keys = Seq("k"), orderCols = Seq("t", "seqn"),
        rightVals = Map("px" -> "px"))
      .collect().map(r => r.getLong(2) -> Option(r.get(3))).toMap
    val byKey = right.groupBy(_._1)
    left.foreach { case (k, t, seqn) =>
      val want = byKey.getOrElse(k, Seq.empty)
        .filter(r => r._2 < t || (r._2 == t && r._3 < seqn))
        .sortBy(r => (r._2, r._3)).lastOption.map(_._4)
      assert(out(seqn) == want, s"left ($k,$t,$seqn)")
    }
  }

  test("rangeJoinBucketed equals the naive inequality join") {
    val sp = spark
    import sp.implicits._
    val fact = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_linenumber"), col("l_quantity"))
    val bands = Seq(("small", 0.0, 10.0), ("mid", 10.0, 25.0),
      ("large", 25.0, 40.0), ("xl", 40.0, 55.0)).toDF("band", "lo", "hi")
    def key(df: org.apache.spark.sql.DataFrame) =
      df.select(col("l_orderkey"), col("l_linenumber"), col("band"))
        .collect().map(r => (r.getLong(0), r.get(1).toString, r.getString(2))).toSet
    val bucketed = key(Joins.rangeJoinBucketed(fact, "l_quantity", bands, "lo", "hi", 5.0))
    val naive = key(fact.join(bands,
      col("l_quantity") >= col("lo") && col("l_quantity") < col("hi")))
    assert(bucketed.nonEmpty && bucketed == naive)
  }

  test("equi-join variants (broadcast vs sort-merge) agree — SURVEY D9") {
    val orders = Tables.load(spark, dir, "orders").select(col("o_custkey"), col("o_totalprice"))
    val customer = Tables.load(spark, dir, "customer").select(col("c_custkey"), col("c_mktsegment"))
    def agg(j: org.apache.spark.sql.DataFrame) =
      j.groupBy(col("c_mktsegment"))
        .agg(count(lit(1)).as("n"), sum(col("o_totalprice").cast("decimal(18,6)")).as("s"))
        .collect().map(r => (r.getString(0), r.getLong(1), r.getDecimal(2))).toSet
    val cond = col("o_custkey") === col("c_custkey")
    val viaBroadcast = agg(orders.join(broadcast(customer), cond))
    val viaMerge = agg(orders.join(customer.hint("merge"), cond))
    assert(viaBroadcast.nonEmpty && viaBroadcast == viaMerge)
  }

  test("q127 deep join tree: dims broadcast, at most one big shuffle join") {
    val df = graft.SparkEntry.queries("q127_tpch_q5")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    val smj = "SortMergeJoin".r.findAllIn(p).length +
      "ShuffledHashJoin".r.findAllIn(p).length
    assert(bhj >= 3, s"expected >=3 broadcast joins, got $bhj:\n$p")
    assert(smj <= 2, s"expected <=2 shuffle joins (fact side), got $smj")
  }

  test("q131 TPC-H Q6: every predicate reaches the parquet scan, no join") {
    val df = graft.SparkEntry.queries("q131_tpch_q6")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(!p.contains("Join"), s"Q6 must be join-free:\n$p")
    val pushed = p.linesIterator.find(_.contains("PushedFilters")).getOrElse("")
    Seq("l_shipdate", "l_discount", "l_quantity").foreach(c =>
      assert(pushed.contains(c), s"$c not pushed to the scan: $pushed"))
  }

  test("q132 TPC-H Q10: aggregates before the customer join, nation broadcast, TakeOrdered top-20") {
    val df = graft.SparkEntry.queries("q132_tpch_q10")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).nonEmpty,
      s"nation (and at this scale customer) must broadcast:\n$p")
    assert(p.contains("TakeOrderedAndProject"),
      s"top-20 must be TakeOrdered, not a global sort:\n$p")
    // the revenue aggregate must sit BELOW the customer join — assert the
    // tree structure, not a string: find the Aggregate grouping on
    // o_custkey, check its subtree excludes the customer relation, and
    // check some Join has that Aggregate on one side and customer columns
    // on the other
    import org.apache.spark.sql.catalyst.plans.logical.{Aggregate, Join, LogicalPlan}
    val opt = df.queryExecution.optimizedPlan
    val aggs = opt.collect { case a: Aggregate
      if a.groupingExpressions.flatMap(_.references.toSeq)
        .exists(_.name == "o_custkey") => a }
    assert(aggs.nonEmpty, s"no Aggregate grouping on o_custkey:\n$opt")
    val revAgg = aggs.head
    assert(!revAgg.collectLeaves()
        .exists(_.output.exists(_.name == "c_custkey")),
      s"revenue aggregate subtree must not contain the customer relation:\n$opt")
    def hasAgg(p: LogicalPlan): Boolean =
      p.collect { case q if q eq revAgg => q }.nonEmpty
    def hasCustomer(p: LogicalPlan): Boolean =
      p.collectLeaves().exists(_.output.exists(_.name == "c_custkey"))
    val joins = opt.collect { case j: Join => j }
    assert(joins.exists(j =>
        (hasAgg(j.left) && hasCustomer(j.right)) ||
        (hasAgg(j.right) && hasCustomer(j.left))),
      s"no Join with the o_custkey Aggregate on one side and customer on the other:\n$opt")
  }

  test("q133 TPC-H Q14: part broadcasts, the month filter reaches the lineitem scan") {
    val df = graft.SparkEntry.queries("q133_tpch_q14")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).mkString("\n")
    assert(pushed.contains("l_shipdate"), s"date filter not pushed:\n$pushed")
  }

  test("q134 TPC-H Q18: partial agg collapses the fact scan before the exchange") {
    val df = graft.SparkEntry.queries("q134_tpch_q18")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // two HashAggregates (partial + final) around one exchange for the
    // per-order quantity sum — map-side combine is the Q18 scale shape
    assert("HashAggregate".r.findAllIn(p).length >= 2, p)
    assert(p.contains("TakeOrderedAndProject"), p)
  }

  test("q141 TPC-H Q19: part broadcasts; the disjunctive filter runs post-join by necessity") {
    val df = graft.SparkEntry.queries("q141_tpch_q19")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"), s"part must broadcast:\n$p")
    // the OR mixes l_quantity with p_brand/p_size, so it cannot be pushed
    // into either scan — it must survive as a Filter above the join
    assert("Filter .*l_quantity.*p_brand|Filter .*p_brand.*l_quantity".r
      .findFirstIn(p.replaceAll("\n", " ")).isDefined,
      s"cross-side disjunction must filter post-join:\n$p")
  }

  test("q136 matryoshka funnel: both stages rank through the bounded graft_topk aggregate") {
    val df = graft.SparkEntry.queries("q136_matryoshka_knn")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    // two funnel stages → two top-k aggregate pairs (partial+final each);
    // ObjectHashAggregate hosts the TypedImperativeAggregate
    val topkAggs = "ObjectHashAggregate".r.findAllIn(p).length
    assert(topkAggs >= 4, s"expected two partial+final graft_topk stages, got $topkAggs:\n$p")
    assert(!p.contains("Window"), s"no global-window ranking allowed:\n$p")
  }

  test("q137 tokenize: the vocab id lookup is a broadcast join") {
    val df = graft.SparkEntry.queries("q137_tokenize_ids")(
      spark, "/root/testdata/sf0.001")
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("BroadcastHashJoin"),
      s"the 100-row vocab must broadcast, never shuffle the token stream:\n$p")
  }

  test("approx_count_distinct within 5% of exact (q40 backing bound)") {
    val got = Tables.events(spark, dir).groupBy(col("event_type"))
      .agg(approx_count_distinct(col("user_id")).as("a"),
        countDistinct(col("user_id")).as("e"))
      .collect()
    assert(got.nonEmpty)
    got.foreach { r =>
      val (a, e) = (r.getAs[Long]("a").toDouble, r.getAs[Long]("e").toDouble)
      assert(math.abs(a - e) / e <= 0.05,
        s"${r.getString(0)}: approx $a vs exact $e off by ${math.abs(a - e) / e}")
    }
  }

  test("q148 TPC-H Q4: EXISTS is a semi join, the quarter filter reaches the orders scan") {
    val df = graft.SparkEntry.queries("q148_tpch_q4")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).mkString("\n")
    assert(pushed.contains("o_orderdate"),
      s"quarter filter not pushed to the orders scan:\n$pushed")
  }

  test("q149 TPC-H Q7: both nation-filtered dims broadcast; no cartesian product") {
    val df = graft.SparkEntry.queries("q149_tpch_q7")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert("BroadcastHashJoin".r.findAllIn(p).length >= 2,
      s"supplier-nation and customer-nation dims must broadcast:\n$p")
    assert(!p.contains("CartesianProduct"), p)
  }

  test("q154 TPC-H Q13: the priority predicate stays inside the left-outer join") {
    val df = graft.SparkEntry.queries("q154_tpch_q13")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftOuter"),
      s"zero-order customers need the outer join preserved:\n$p")
    // the predicate must prune the orders SIDE, not filter post-join
    // (post-join filtering would drop the customers it exists to keep)
    val pushed = "PushedFilters: \\[[^\\]]*\\]".r.findAllIn(p).mkString("\n")
    assert(pushed.contains("o_orderpriority"),
      s"priority predicate should prune the orders scan:\n$pushed")
  }

  test("q155 TPC-H Q15: the max-revenue scalar reuses the revenue exchange — one fact scan") {
    val df = graft.SparkEntry.queries("q155_tpch_q15")(spark, dir)
    df.collect() // AQE only materializes exchange reuse at runtime
    val p = finalPlan(df)
    assert(p.contains("ReusedExchange") || countLineitemScans(p) <= 1,
      s"rev is referenced twice; the groupBy exchange must be reused, not the fact rescanned:\n$p")
  }

  test("q157 TPC-H Q17: the correlated avg is a window over one fact scan, not a re-join") {
    val df = graft.SparkEntry.queries("q157_tpch_q17")(spark, dir)
    df.collect()
    val p = finalPlan(df)
    assert(countLineitemScans(p) <= 1,
      s"the per-part threshold must come from a window, not a second scan:\n$p")
    assert(p.contains("Window"), s"expected the partitioned window avg:\n$p")
  }

  test("q156 TPC-H Q16: the exclusion set is a broadcast anti join") {
    val df = graft.SparkEntry.queries("q156_tpch_q16")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
    assert("BroadcastHashJoin.*LeftAnti|LeftAnti.*BroadcastHashJoin".r
      .findFirstIn(p.replaceAll("\n", " ")).isDefined
      || "BroadcastNestedLoop".r.findFirstIn(p).isEmpty,
      s"the tiny exclusion list must broadcast:\n$p")
  }

  test("q159 TPC-H Q21: the double correlation plans as one semi and one anti join") {
    val df = graft.SparkEntry.queries("q159_tpch_q21")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("LeftSemi"), s"EXISTS must plan as a semi join:\n$p")
    assert(p.contains("LeftAnti"), s"NOT EXISTS must plan as an anti join:\n$p")
  }

  test("q160 TPC-H Q2: the per-part min reuses the cost exchange; dims broadcast") {
    val df = graft.SparkEntry.queries("q160_tpch_q2")(spark, dir)
    df.collect() // AQE only materializes exchange reuse at runtime
    val p = finalPlan(df)
    assert(p.contains("BroadcastHashJoin"), s"part/supplier dims must broadcast:\n$p")
    assert(p.contains("ReusedExchange") || countLineitemScans(p) <= 1,
      s"cost is referenced twice; its exchange must be reused, not the fact rescanned:\n$p")
  }

  test("bloomPrefilterJoin equals the plain join and actually prunes the fact side") {
    val li = Tables.load(spark, dir, "lineitem")
    val dim = Tables.load(spark, dir, "orders")
      .filter(col("o_orderpriority") === "1-URGENT"
        && col("o_orderdate") < lit("1995-06-01").cast("timestamp"))
      .select(col("o_orderkey"))
    val got = Joins.bloomPrefilterJoin(li, dim, "l_orderkey", "o_orderkey")
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect()
    val want = li.join(dim, col("l_orderkey") === col("o_orderkey"))
      .orderBy(col("l_orderkey"), col("l_linenumber")).collect()
    assert(got.toSeq == want.toSeq,
      "the Bloom prefilter must not change the join result")
    // the sketch must prune: with ~tens of keys in 2^22 bits the false
    // positive rate is ~0, so the prefilter survivor count should be close
    // to the true match count, far below the full fact table
    graft.functions.GraftFunctions.register(spark)
    val bf = dim.agg(call_function("graft_bloom",
      xxhash64(col("o_orderkey")), lit(1 << 22), lit(5))).head.getAs[Array[Byte]](0)
    val kept = li.filter(call_function("graft_bloom_contains", lit(bf),
      xxhash64(col("l_orderkey")))).count()
    val total = li.count()
    assert(kept < total / 4,
      s"prefilter kept $kept of $total fact rows — no real pruning")
    assert(kept >= want.length / 7 /* lineitems per order ≥ 1 */,
      s"prefilter kept $kept but the join returns ${want.length} rows")
  }

  test("q161: the bloom probe filters below the shuffle join, not above it") {
    val df = graft.SparkEntry.queries("q161_bloom_join")(spark, dir)
    val p = df.queryExecution.executedPlan.toString
    assert(p.contains("SortMergeJoin"),
      s"the merge hint must hold (models the unbroadcastable dim):\n$p")
    val joinIdx = p.indexOf("SortMergeJoin")
    val probeIdx = p.indexOf("graft_bloom_contains")
    assert(probeIdx > joinIdx && probeIdx >= 0,
      s"the bloom probe must sit in the join's subtree (below it in the plan print):\n$p")
  }

  /** The AQE final plan only (drops the `== Initial Plan ==` echo). */
  private def finalPlan(df: org.apache.spark.sql.DataFrame): String =
    df.queryExecution.executedPlan.toString.split("== Initial Plan ==")(0)

  /** Count FileScan references to the lineitem table in a physical plan. */
  private def countLineitemScans(p: String): Int =
    p.linesIterator.count(l => l.contains("FileScan") && l.contains("lineitem"))
}
