package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The bench harness must survive broken queries (round 6: one analysis
  * error before the JSON line printed zeroed the whole round's bench
  * signal). [[Bench.run]] with a poisoned map must still render parseable
  * JSON with the failure isolated in `errors`.
  */
class BenchSpec extends AnyFunSuite {
  private lazy val spark = TestSpark.spark

  test("a query that throws yields value -1 + errors entry, not a dead harness") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }
    val analysisBomb: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1).toDF("x").select(col("no_such_col")) }
    val runtimeBomb: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._
        Seq("boom").toDF("x").select(raise_error(col("x"))) }
    val json = Bench.run(spark, "/nowhere",
      Map("q_ok" -> ok, "q_analysis" -> analysisBomb, "q_runtime" -> runtimeBomb),
      reps = 2)
    // one line, parseable shape, failures isolated
    assert(!json.contains("\n"))
    assert(json.contains("\"q_analysis\":-1.0") && json.contains("\"q_runtime\":-1.0"),
      s"failed queries must record -1: $json")
    assert(json.contains("\"errors\":[\"q_analysis\",\"q_runtime\"]"),
      s"errors array must name exactly the failures: $json")
    assert(!json.contains("\"q_ok\":-1"), s"healthy query must keep its time: $json")
    assert(json.contains("\"metric\":\"total\""), json)
  }

  test("an outlier vs the previous run is requeued and both samples recorded") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1, 2, 3).toDF("x") }
    // prev says q_ok ran in 1µs — any real measurement is a >2x "outlier"
    // over the 0.25s floor only if it takes >0.25s, so use a prev of 0.3
    // with a deliberately slow query to trip the requeue deterministically
    val slow: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._
        Thread.sleep(700); Seq(1).toDF("x") }
    val json = Bench.run(spark, "/nowhere", Map("q_slow" -> slow), reps = 1,
      prev = Map("q_slow" -> 0.05))
    assert(json.contains("\"requeued\":{\"q_slow\":["),
      s"outlier must be requeued with both samples recorded: $json")
    // reported value = min of the two samples (both ~0.7s here; just check
    // it is a real positive number, not -1)
    assert(!json.contains("\"q_slow\":-1"), json)
  }

  test("parseQueriesMap round-trips the map run() renders") {
    val ok: (SparkSession, String) => DataFrame =
      (s, _) => { import s.implicits._; Seq(1).toDF("x") }
    val json = Bench.run(spark, "/nowhere", Map("q_a" -> ok, "q_b" -> ok), reps = 1)
    val m = Bench.parseQueriesMap(json)
    assert(m.keySet == Set("q_a", "q_b"), s"$m from $json")
    assert(m.values.forall(_ >= 0), s"$m")
    // garbage in -> empty map, never a throw
    assert(Bench.parseQueriesMap("not json").isEmpty)
    assert(Bench.parseQueriesMap("""{"queries":""").isEmpty)
  }
}
