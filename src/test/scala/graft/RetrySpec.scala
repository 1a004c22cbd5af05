package graft

import graft.sinks.Retry
import org.scalatest.funsuite.AnyFunSuite

class RetrySpec extends AnyFunSuite {

  test("succeeds immediately without sleeping") {
    var calls = 0
    val r = Retry.withBackoff(attempts = 3, baseDelayMs = 1) { calls += 1; 42 }
    assert(r == 42 && calls == 1)
  }

  test("retries transient failures, then succeeds") {
    var calls = 0
    val r = Retry.withBackoff(attempts = 5, baseDelayMs = 1) {
      calls += 1
      if (calls < 3) throw new RuntimeException("transient")
      "ok"
    }
    assert(r == "ok" && calls == 3)
  }

  test("exhausts attempts and rethrows the last failure") {
    var calls = 0
    val e = intercept[RuntimeException] {
      Retry.withBackoff(attempts = 4, baseDelayMs = 1) {
        calls += 1
        throw new RuntimeException(s"fail $calls")
      }
    }
    assert(calls == 4 && e.getMessage == "fail 4")
  }
}
