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
}
