package graft

import org.scalatest.funsuite.AnyFunSuite

/** Unit coverage for Bench's self-attestation pieces: loadavg parsing,
  * the contention retry decision, and that the calibration probe runs
  * and returns a positive elapsed time on the shared session.
  */
class BenchSpec extends AnyFunSuite with SparkSpec {

  test("parseLoadAvg reads the 1-minute field of /proc/loadavg content") {
    assert(Bench.parseLoadAvg("0.52 0.58 0.59 1/1262 41733\n") == 0.52)
    assert(Bench.parseLoadAvg("17.25 12.00 8.50 5/999 1") == 17.25)
    assert(Bench.parseLoadAvg("") == -1.0)
    assert(Bench.parseLoadAvg("garbage line") == -1.0)
  }

  test("readLoadAvg returns a non-negative load on Linux") {
    // The sandbox is Linux; on other platforms readLoadAvg degrades to -1.
    assert(Bench.readLoadAvg() >= -1.0)
  }

  test("shouldRetry fires only on poisoned calibrations with attempts left") {
    val baseline = 0.1
    // Clean attempt: never retry.
    assert(!Bench.shouldRetry(calib = 0.15, baseline, attempt = 1))
    // Poisoned (>3x baseline) with attempts left: retry.
    assert(Bench.shouldRetry(calib = 0.5, baseline, attempt = 1))
    assert(Bench.shouldRetry(calib = 0.5, baseline, attempt = Bench.MaxAttempts - 1))
    // Poisoned but attempts exhausted: stop (the result gets flagged
    // contended instead).
    assert(!Bench.shouldRetry(calib = 0.5, baseline, attempt = Bench.MaxAttempts))
    // Exactly at the threshold is not poisoned.
    assert(!Bench.shouldRetry(calib = baseline * Bench.ContendedFactor, baseline, attempt = 1))
  }

  test("calibration probe runs on a live session and reports elapsed seconds") {
    val secs = Bench.calibrate(spark)
    assert(secs > 0.0 && secs < 60.0)
  }
}
