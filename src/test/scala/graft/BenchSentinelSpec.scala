package graft

import org.scalatest.funsuite.AnyFunSuite

/** The Bench contention sentinel is load-bearing for adjudication (the r12
  * judge read `contended` to decide which capture to believe), so its
  * arithmetic gets unit coverage on synthetic timing sequences — no Spark
  * session involved, these are the pure helpers Bench.main feeds with real
  * observations. Spread is max over the LOWER MEDIAN (not max/min): see
  * Bench.sentinelSpread's scaladoc for why both min-floor failure modes
  * are real.
  */
class BenchSentinelSpec extends AnyFunSuite {

  test("flat sequence reads as uncontended with spread ~1") {
    val times = Seq(0.21, 0.20, 0.22, 0.21)
    // sorted: .20 .21 .21 .22 -> lower median (index 1) = 0.21
    assert(Bench.sentinelSpread(times) === 0.22 / 0.21)
    assert(!Bench.isContended(times))
  }

  test("a contention episode (r12-shaped) flips the flag") {
    // BENCH_r12's observed shape: clean ~0.15s observations with one
    // episode sample at ~0.73s -> max/median 4.56, over the 3x bar
    val times = Seq(0.15, 0.16, 0.73, 0.15, 0.17)
    assert(Bench.sentinelSpread(times) === 0.73 / 0.16)
    assert(Bench.isContended(times))
  }

  test("one slow STARTUP sample over a fast floor stays clean") {
    // the r13 false-positive shape: first post-warmup sample 0.387s,
    // floor 0.124s -> max/min read 3.11 (flagged); max/median reads
    // 0.387/0.175 ~ 2.2 (clean, correctly)
    val times = Seq(0.387, 0.172, 0.154, 0.189, 0.199, 0.15, 0.172,
      0.167, 0.187, 0.174, 0.175, 0.212, 0.124)
    assert(Bench.sentinelSpread(times) < 3.0)
    assert(!Bench.isContended(times))
  }

  test("spread exactly at the 3x bar is NOT contended (strict >)") {
    // exactly-representable doubles; lower median of [1,1,3] is 1
    val times = Seq(1.0, 1.0, 3.0)
    assert(Bench.sentinelSpread(times) === 3.0)
    assert(!Bench.isContended(times))
    assert(Bench.isContended(Seq(1.0, 1.0, 3.01)))
  }

  test("non-positive samples are excluded, never a near-zero floor") {
    // a crashed sentinel must not fabricate spread: with the 0.0 and
    // the negative dropped, the sequence is flat
    val times = Seq(0.2, 0.0, 0.21, -1.0)
    assert(Bench.sentinelSpread(times) === 0.21 / 0.2)
    assert(!Bench.isContended(times))
  }

  test("empty or all-failed sentinel reads spread 1.0, uncontended") {
    assert(Bench.sentinelSpread(Nil) === 1.0)
    assert(Bench.sentinelSpread(Seq(0.0, 0.0)) === 1.0)
    assert(!Bench.isContended(Nil))
  }

  test("repass candidates = worst-n by first/best ratio UNION worst-n by best") {
    // (name, best, first): qa has the worst ratio (10x, first pass hit);
    // qd has the worst best (both passes hit, ratio clean); qb/qc clean+cheap
    val results = Seq(
      ("qa", 0.2, 2.0), // ratio 10
      ("qb", 0.3, 0.35), // ratio ~1.17
      ("qc", 0.25, 0.3), // ratio 1.2
      ("qd", 5.0, 5.5) // ratio 1.1 but slowest best
    )
    val picked = Bench.repassCandidates(results, 1)
    assert(picked.toSet === Set("qa", "qd"))
    // n=2 widens each list by one; union stays deduplicated
    val picked2 = Bench.repassCandidates(results, 2)
    assert(picked2.size === picked2.distinct.size)
    assert(Set("qa", "qd").subsetOf(picked2.toSet))
  }

  test("always-on repass: episodic first-pass query is picked by ratio") {
    // r14: the repass runs on EVERY battery (the r13 blind spot — a
    // sentinel-clean battery carried q146 at 4.60 s vs 0.82 s clean
    // because the 25-query sentinel grid straddled the episode). The
    // episodic-first-pass shape: first ≫ best on one query, everything
    // else flat — that query must be in the candidate set even though
    // nothing about the battery is globally contended.
    val results = ("q146", 0.9, 4.6) +: (1 to 20).map(i =>
      (f"q$i%03d", 0.5 + i * 0.001, 0.55 + i * 0.001))
    assert(Bench.repassCandidates(results, 8).contains("q146"))
  }

  test("always-on repass: episodic both-pass query is picked by best") {
    // both min-of-2 passes hit: the ratio looks clean (~1.1) but the
    // best is poisoned — only the worst-by-best list can catch it
    val results = ("q184", 4.2, 4.6) +: (1 to 20).map(i =>
      (f"q$i%03d", 0.5 + i * 0.001, 0.55 + i * 0.001))
    assert(Bench.repassCandidates(results, 8).contains("q184"))
  }

  test("always-on repass: clean battery still yields a BOUNDED set") {
    // on a clean battery the repass is ~n wasted-but-cheap re-runs, and
    // must never exceed 2n (ratio list ∪ best list, deduplicated)
    val results = (1 to 100).map(i =>
      (f"q$i%03d", 0.5 + i * 0.001, 0.55 + i * 0.001))
    val picked = Bench.repassCandidates(results, 8)
    assert(picked.size <= 16)
    assert(picked.distinct.size === picked.size)
    // deterministic: same inputs, same candidate set (the record the
    // judge diffs against committed captures must be reproducible)
    assert(picked === Bench.repassCandidates(results, 8))
  }

  test("floor trigger: a min-of-2 over 2x its committed floor is repassed") {
    // the q80 shape from the r14 capture diff: 1.61s min against a
    // 0.35s committed floor, ratio clean, not among the worst-8 — only
    // the floor comparison can catch it
    val results = Seq(("q80", 1.61, 1.86), ("qa", 0.3, 0.32))
    val floors = Map("q80" -> 0.352, "qa" -> 0.29)
    assert(Bench.floorCandidates(results, floors) === Seq("q80"))
    // exactly at 2x is NOT flagged (strict >): noise envelope, not a bar
    assert(Bench.floorCandidates(Seq(("qa", 0.58, 0.6)), Map("qa" -> 0.29)).isEmpty)
    // missing floor, zero floor -> inert, never a division artifact
    assert(Bench.floorCandidates(results, Map("qz" -> 0.1)).isEmpty)
    assert(Bench.floorCandidates(Seq(("qa", 9.0, 9.0)), Map("qa" -> 0.0)).isEmpty)
  }

  test("floor trigger is capped by worst excursion ratio") {
    // a uniformly slower box must not re-run the whole battery: the cap
    // keeps the worst offenders by best/floor
    val results = (1 to 50).map(i => (f"q$i%02d", 1.0 + i * 0.1, 1.2))
    val floors = results.map { case (n, _, _) => n -> 0.3 }.toMap
    val picked = Bench.floorCandidates(results, floors, cap = 5)
    assert(picked.size === 5)
    assert(picked.head === "q50") // largest best/floor first
  }

  test("committed floors load for the sf under test") {
    // scripts/bench_floors.tsv is committed alongside the captures; the
    // sentinel query must have a positive floor at every sf
    for (sf <- Seq("sf0.001", "sf0.01", "sf0.1")) {
      val floors = Bench.loadFloors(s"/root/testdata/$sf")
      assert(floors.get("q01_scan_project").exists(_ > 0), sf)
      assert(floors.size > 250, s"$sf floors look truncated")
    }
  }

  test("overwrite guard: a gate-failing battery keeps a gate-passing committed record") {
    // the r15 episode: the driver's post-commit refresh landed
    // floor_gate ok:false (contended) over a clean committed record and
    // the official headline inherited the dirty battery
    val committed = Some("""{"metric":"total","value":168.7,"unit":"sec","floor_gate":{"ok":true,"rounds":0,"max_vs_floor":1.91,"over":[]},"sf":"/root/testdata/sf0.1"}""")
    assert(Bench.keepCommitted(committed, newGateOk = false,
      "/root/testdata/sf0.1"))
    // a PASSING battery always lands, whatever the committed state
    assert(!Bench.keepCommitted(committed, newGateOk = true,
      "/root/testdata/sf0.1"))
    // a failing battery may replace a committed record that also failed
    // (no clean record to protect)
    val failedCommitted = Some(committed.get
      .replace("\"ok\":true", "\"ok\":false"))
    assert(!Bench.keepCommitted(failedCommitted, newGateOk = false,
      "/root/testdata/sf0.1"))
    // sf mismatch: a passing sf0.01 record must not block an sf0.1 landing
    assert(!Bench.keepCommitted(committed, newGateOk = false,
      "/root/testdata/sf0.01"))
    // no committed record at all -> nothing to keep
    assert(!Bench.keepCommitted(None, newGateOk = false,
      "/root/testdata/sf0.1"))
  }

  test("overwrite guard: the kept record is annotated machine-readably") {
    val committed = """{"metric":"total","value":168.7,"floor_gate":{"ok":true},"sf":"/root/testdata/sf0.1"}"""
    val kept = Bench.annotateKept(committed, 164.2)
    assert(kept.contains(""""guard":{"kept_committed":true"""))
    assert(kept.contains(""""rejected_total":164.2"""))
    assert(kept.contains(""""floor_gate":{"ok":true}""")) // original intact
    // still one JSON object: braces balance and it ends with }
    assert(kept.count(_ == '{') === kept.count(_ == '}'))
    assert(kept.endsWith("}"))
  }

  test("overwrite guard: re-annotating replaces the guard, never stacks it") {
    // two consecutive gate-failing batteries over the same kept record
    // used to append a SECOND "guard" key (r16 ADVICE) — the annotation
    // must be idempotent up to the rejected_total value
    val committed = """{"metric":"total","value":168.7,"floor_gate":{"ok":true},"sf":"/root/testdata/sf0.1"}"""
    val once = Bench.annotateKept(committed, 164.2)
    val twice = Bench.annotateKept(once, 171.9)
    assert(twice === Bench.annotateKept(committed, 171.9))
    // exactly one guard key, the newest total, braces still balanced
    assert("\"guard\":".r.findAllIn(twice).size === 1)
    assert(twice.contains(""""rejected_total":171.9"""))
    assert(!twice.contains("164.2"))
    assert(twice.count(_ == '{') === twice.count(_ == '}'))
  }

  test("floors raise-note arithmetic (gen_floors.py --selftest)") {
    // the header note Bench quotes into floor_gate provenance is
    // computed by gen_floors.py; its --selftest pins the raise
    // counting (strict raises only, worst ratio, zero-floor guard) and
    // the committed-round baseline resolution (r16 verdict note 1)
    val pb = new ProcessBuilder("python3", "scripts/gen_floors.py",
      "--selftest")
    pb.directory(new java.io.File("."))
    pb.redirectErrorStream(true)
    val p = pb.start()
    val out = scala.io.Source.fromInputStream(p.getInputStream).mkString
    assert(p.waitFor() === 0, s"selftest failed:\n$out")
    assert(out.contains("gen_floors selftest OK"))
  }

  test("A/B control: a kept-committed record can never be filed as a control") {
    // the r17 weak mark: the fresh r16-tree battery read 180.9 s, failed
    // its floor gate, and the overwrite guard substituted last round's
    // committed record (146.6 s) — which was then filed under
    // ab_r16tree_0.1.json and quoted as a same-day measurement. The A/B
    // path must route ANY guard-annotated record to a rejected_* name.
    val keptRec = """{"metric":"total","value":146.613,"floor_gate":{"ok":true},"guard":{"kept_committed":true,"rejected":"BENCH_REJECTED.json","rejected_total":180.891}}"""
    assert(Bench.isKeptRecord(keptRec))
    val req = "bench_captures/r18/ab_r17tree_0.1.json"
    assert(Bench.abCapturePath(req, keptRec, gateOk = true,
      contended = false)
      === "bench_captures/r18/rejected_ab_r17tree_0.1.json")
  }

  test("A/B control: fresh gate-ok uncontended battery files at the requested name") {
    val fresh = """{"metric":"total","value":150.2,"floor_gate":{"ok":true,"rounds":0},"contended":false}"""
    assert(!Bench.isKeptRecord(fresh))
    val req = "bench_captures/r18/ab_r17tree_0.1.json"
    assert(Bench.abCapturePath(req, fresh, gateOk = true,
      contended = false) === req)
    // its own gate failing, or a contended sentinel, demotes it — a
    // control that wasn't measured clean is evidence, not a control
    assert(Bench.abCapturePath(req, fresh, gateOk = false,
      contended = false).endsWith("rejected_ab_r17tree_0.1.json"))
    assert(Bench.abCapturePath(req, fresh, gateOk = true,
      contended = true).endsWith("rejected_ab_r17tree_0.1.json"))
  }

  test("rejected-battery archive: numbered slots never overwrite") {
    // r17 lost the 180.9 s A/B rejection because the 182.5 s one
    // overwrote the single BENCH_REJECTED.json
    assert(Bench.rejectedSlot(_ => false) === "BENCH_REJECTED.json")
    assert(Bench.rejectedSlot(Set("BENCH_REJECTED.json"))
      === "BENCH_REJECTED_2.json")
    assert(Bench.rejectedSlot(
      Set("BENCH_REJECTED.json", "BENCH_REJECTED_2.json"))
      === "BENCH_REJECTED_3.json")
  }

  test("fresh summary line always carries the fresh total and per-query map") {
    // r18 verdict item 1: when the overwrite guard fired, the final
    // stdout line reported the COMMITTED total with queries:{} — the
    // driver had now_bench_ok:false two rounds running and a genuine
    // regression would have hidden behind the old fast record. The
    // summary must report the fresh measurement with the guard verdict
    // as annotations, in both guard outcomes.
    val qs = """{"q01_scan_project":0.15,"q92_triangles":2.3}"""
    val kept = Bench.freshSummaryLine(198.77, gateOk = false,
      keptCommitted = true, committedTotal = Some(146.295),
      contended = false, qs, "{}", 314, 0, "/root/testdata/sf0.1")
    assert(kept.contains(""""value":198.77"""))          // FRESH, not committed
    assert(kept.contains(""""gate_ok":false"""))
    assert(kept.contains(""""kept_committed":true"""))
    assert(kept.contains(""""committed_total":146.295""")) // old number kept too
    assert(kept.contains(""""queries":{"q01_scan_project":0.15"""))
    assert(kept.count(_ == '{') === kept.count(_ == '}'))
    // clean path: no committed_total key, gate_ok true, same fresh map
    val clean = Bench.freshSummaryLine(151.2, gateOk = true,
      keptCommitted = false, committedTotal = None,
      contended = false, qs, "{}", 314, 0, "/root/testdata/sf0.1")
    assert(clean.contains(""""value":151.2"""))
    assert(clean.contains(""""gate_ok":true"""))
    assert(clean.contains(""""kept_committed":false"""))
    assert(!clean.contains("committed_total"))
    assert(clean.contains(""""queries":{"q01_scan_project":0.15"""))
    assert(clean.count(_ == '{') === clean.count(_ == '}'))
  }

  test("repass candidate ratio list skips non-positive bests") {
    // a zero best (pathological) must not win the ratio sort by division
    val results = Seq(("qz", 0.0, 1.0), ("qa", 0.2, 1.0), ("qd", 3.0, 3.1))
    val picked = Bench.repassCandidates(results, 1)
    assert(picked.contains("qa")) // ratio 5 among positive-best rows
    assert(picked.contains("qd")) // worst best overall
  }
}
