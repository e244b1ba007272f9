package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.stream.StreamSupervisor

/** OP-01 restart policy — the reference's reconnect-with-min-uptime-guard
  * semantics (TwitterStream.cs:82-113), driven with a fake clock. */
class StreamSupervisorSpec extends AnyFunSuite {

  /** Scripted incarnations: each entry is (uptimeMs, failure?). */
  private def run(script: Seq[(Long, Option[Throwable])],
      minUptime: Long = 1000L, backoff: Long = 100L, maxShort: Int = 2) = {
    var t = 0L
    var slept = 0L
    val it = script.iterator
    var current: (Long, Option[Throwable]) = null
    val out = StreamSupervisor.superviseLoop[Unit](
      start = () => { current = it.next() },
      run = _ => { t += current._1; current._2 },
      minUptimeMs = minUptime, backoffMs = backoff, maxShortLived = maxShort,
      now = () => t, sleep = ms => slept += ms)
    (out, slept)
  }

  private val boom = Some(new RuntimeException("connection dropped"))

  test("graceful termination ends supervision with no restart") {
    val (out, slept) = run(Seq((5000L, None)))
    assert(!out.gaveUp && out.restarts == 0 && slept == 0L)
  }

  test("long-lived failures reconnect forever (flap counter resets)") {
    // 10 long-lived drops, then a graceful stop: never gives up even
    // though 10 > maxShortLived, because each incarnation exceeded
    // min-uptime.
    val script = Seq.fill(10)((5000L, boom)) :+ ((5000L, None: Option[Throwable]))
    val (out, slept) = run(script)
    assert(!out.gaveUp && out.restarts == 10)
    assert(slept == 0L, "long-lived failures must not back off")
  }

  test("consecutive short-lived failures back off, then give up") {
    val (out, slept) = run(Seq((10L, boom), (10L, boom), (10L, boom)))
    assert(out.gaveUp && out.shortLived == 3)
    // backoff paid for the first maxShortLived flaps, not the final one
    assert(slept == 200L)
  }

  test("a long-lived incarnation resets the short-lived counter") {
    // short, short, LONG, short, short, graceful — never reaches 3
    // consecutive shorts, so it keeps reconnecting to the end.
    val script = Seq((10L, boom), (10L, boom), (5000L, boom),
      (10L, boom), (10L, boom), (5000L, None: Option[Throwable]))
    val (out, _) = run(script)
    assert(!out.gaveUp && out.restarts == 5)
  }
}
