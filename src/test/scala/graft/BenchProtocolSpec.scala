package graft

import org.scalatest.funsuite.AnyFunSuite

/** Pins the bench sampling-protocol constants to the documented v3.2
  * values (round-13 verdict stretch item 7). The v3.0 detour proved
  * the warm pass and sample counts are load-bearing BY MEASUREMENT
  * (DESIGN.md "Round-16 official recording": a warm-less variant
  * charged first-of-family rows their C2/codegen ramp in both samples
  * — fuzzy_join read 2.3x its steady state, a fake regression), so a
  * future "optimization" must not change them silently: any change
  * here requires bumping Bench.ProtocolVersion AND the DESIGN.md
  * "Sampling protocol" section, then re-pinning this spec — that
  * forced detour through the docs is the point of the test.
  *
  * No Spark session: these are plain constant reads.
  */
class BenchProtocolSpec extends AnyFunSuite {

  test("sampling protocol constants are pinned to v3.3") {
    // v3.3 (round 15, verdict item 2): main group warms once (was
    // twice), flagged-only attempts salvage via per-row TIME_OPS
    // retries. The SAMPLE statistics below are unchanged from v3.2,
    // so per-row values stay comparable round-over-round.
    assert(Bench.ProtocolVersion === "v3.3",
      "protocol version changed: re-pin this spec and DESIGN.md together")
    // 1 warm pass (structural: measureGroup forces every op once
    // before sampling) + 2 timed samples, +2 on escalation
    assert(Bench.TimedSamples === 2)
    assert(Bench.EscalationSamples === 2)
    // heavy-row suspect rule: relative spread > 1.5x AND absolute
    // spread > 0.2 s (one-outlier-tolerant at 3+ samples)
    assert(Bench.SpreadRel === 1.5)
    assert(Bench.SpreadAbsSec === 0.2)
    // rows at/above 2.0 s escalate to median-of-extended-set
    assert(Bench.HeavyRowFloorSec === 2.0)
    // light-row corroboration (v3.2): the reported min must be
    // reproduced by >= 2 samples within 1.5x + 50 ms
    assert(Bench.LightCorroborationRel === 1.5)
    assert(Bench.LightCorroborationAbsSec === 0.05)
  }

  test("scaling-interpretation thresholds are pinned (r14)") {
    // overhead-dominated floor: an exponent certifies only when the
    // xMult run outgrew fixed Spark overhead
    assert(Bench.OverheadFloorSec === 1.0)
    // sentinel excursion band: ~25x the healthy-window agreement
    // (±0.002), far under the smallest real excursion (+0.38)
    assert(Bench.SentinelExcursionBand === 0.05)
  }

  test("sentinel reference file is well-formed and carries its contracts") {
    // tools/sentinel_ref.json is load-bearing: Bench omits the
    // scaling_norm column when the xMult key is missing or the file
    // is unparseable (r13 advice item 1), so a malformed edit would
    // silently downgrade every future scaling artifact to raw-only.
    // Guard the shape here: it must parse, carry each landed
    // multiplier's reference in a sane band, and keep the documented
    // provenance/contract prose a future re-reference must update.
    import org.json4s._
    import org.json4s.jackson.JsonMethods
    val path = java.nio.file.Paths.get("tools/sentinel_ref.json")
    assert(java.nio.file.Files.exists(path), s"missing $path")
    val j = JsonMethods.parse(
      new String(java.nio.file.Files.readAllBytes(path), "UTF-8"))
    val refs = j.asInstanceOf[JObject].obj.collect {
      case (k, JDouble(v)) if k.forall(_.isDigit) => k -> v
    }.toMap
    assert(refs.keySet === Set("10", "30", "64"),
      "landed multipliers changed: re-pin this spec with the new set")
    // in-context exponents live well inside (0, 2); a value outside
    // means a raw runtime or a typo landed in a reference slot
    refs.foreach { case (k, v) =>
      assert(v > 0.3 && v < 1.5, s"x$k reference $v outside sane band")
    }
    val text = new String(java.nio.file.Files.readAllBytes(path), "UTF-8")
    for (key <- Seq("_doc", "_x30_provenance", "_x64_provenance"))
      assert(text.contains("\"" + key + "\""), s"provenance $key missing")
    // the x64 advisory contract (DESIGN.md "x64"): point reference
    // unstable, certification rests on paired marginal slopes
    assert(text.contains("paired same-window marginal"),
      "x64 advisory contract dropped from the provenance")
  }

  test("host-class bands match the DESIGN.md table") {
    def h(st: Double, pe: Double) =
      Map("st_canary" -> st, "par_eff32" -> pe)
    // the r13 X30 certification window
    assert(Bench.hostClassOf(h(0.42, 0.84)) === "fleet-healthy")
    // the r13 builder window (par_eff depressed, rows still clean)
    assert(Bench.hostClassOf(h(0.49, 0.56)) === "fleet-loaded")
    // the volatile afternoon fleet class (par_eff32 0.43-0.74 swings)
    assert(Bench.hostClassOf(h(0.45, 0.43)) === "fleet-volatile")
    // r12's bandwidth-starved host read ~1.5x single-thread
    assert(Bench.hostClassOf(h(0.63, 0.90)) === "fleet-volatile")
    assert(Bench.hostClassOf(Map.empty) === "unknown")
  }
}
