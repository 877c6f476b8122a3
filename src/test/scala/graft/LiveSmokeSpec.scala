package graft

import org.scalatest.funsuite.AnyFunSuite

/** Env-gated live-infrastructure check: CANCELLED (not failed) in the
  * sandbox, where no broker/Postgres exists — `assume` marks it canceled
  * unless GRAFT_SMOKE_* point at real services (smoke/run_smoke.sh brings
  * them up and sets the env). With the env set, this drives the same
  * kafka-source + jdbc-sink path as graft.tools.LiveSmoke.
  */
class LiveSmokeSpec extends AnyFunSuite {

  test("kafka -> jdbc ingest round-trips the published tape (live only)") {
    assume(sys.env.contains("GRAFT_SMOKE_BROKER") && sys.env.contains("GRAFT_SMOKE_JDBC"),
      "live smoke env not set - run smoke/run_smoke.sh on a networked host")
    // LiveSmoke prints PASS/FAIL per table and exits non-zero on FAIL; here
    // we call into it directly so a test runner reports the outcome.
    graft.tools.LiveSmoke.main(Array.empty)
  }
}
