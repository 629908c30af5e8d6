"""Clean-window re-measure of the 1->4 core scaling pair.

The round-5 fresh pair at fingerprint f34fdf146f27 landed in a hypervisor
steal storm (18-29% steal on the 1-core legs, efficiency 0.742).  The
protocol (BENCH/BASELINE.md, round 3) is min-of-N per leg with per-run
steal ratios shipped, so this harness APPENDS clean-window runs to the
cached legs and recomputes the pair: it waits for ambient steal < 2%,
runs one interleaved (hi, lo) pair, and repeats until each leg has at
least MIN_CLEAN runs under MAX_STEAL or the wall budget expires.
All runs (storm-hit and clean) stay in the artifact.
"""
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
import bench  # noqa: E402

LO, HI, DOCS = 1, 4, 1_000_000
MAX_STEAL = 0.03
MIN_CLEAN = 2
BUDGET_S = int(os.environ.get("KIR_SCALE_BUDGET_S", "5400"))
AMBIENT_GATE = 0.02


def ambient_steal(window_s: float = 15.0) -> float:
    def snap():
        with open("/proc/stat") as f:
            return list(map(int, f.readline().split()[1:]))
    a = snap()
    time.sleep(window_s)
    b = snap()
    d = [y - x for x, y in zip(a, b)]
    return d[7] / max(1, sum(d))


def main() -> None:
    fp = bench._build_code_fingerprint()
    cache_key = os.path.join(
        bench.CACHE, f"scaling_{LO}_{HI}_{DOCS}_{fp}.json"
    )
    with open(cache_key) as f:
        art = json.load(f)
    print(f"starting from cached pair: eff={art['efficiency']} "
          f"lo_best={art['build_sec_low']} hi_best={art['build_sec_high']}",
          flush=True)
    bench.ensure_webtext(DOCS)
    t0 = time.time()
    log_path = os.path.join(
        REPO, "BENCH", os.environ.get("KIR_SCALE_LOG", "scaling_runs_r6.jsonl")
    )

    def clean_count(steals):
        return sum(1 for s in steals if s <= MAX_STEAL)

    def leg_steals(c):
        key = "steal_ratio_low" if c == LO else "steal_ratio_high"
        return art[key] + [b["steal_ratio"] for b in new[c]]

    new = {LO: [], HI: []}
    while time.time() - t0 < BUDGET_S:
        if all(clean_count(leg_steals(c)) >= MIN_CLEAN for c in (LO, HI)):
            print("enough clean runs per leg — stopping", flush=True)
            break
        amb = ambient_steal()
        if amb >= AMBIENT_GATE:
            print(f"ambient steal {amb:.3f} >= {AMBIENT_GATE} — waiting",
                  flush=True)
            time.sleep(45)
            continue
        print(f"clean window (ambient {amb:.3f}) — running pair", flush=True)
        for c in (HI, LO):
            if clean_count(leg_steals(c)) >= MIN_CLEAN:
                continue  # this leg is already satisfied (ADVICE fix)
            b = bench.build_in_subprocess(c, DOCS)
            if b:
                new[c].append(b)
                with open(log_path, "a") as f:
                    f.write(json.dumps(b) + "\n")
                print(f"  cpus={c}: {b['build_sec']}s "
                      f"steal={b['steal_ratio']}", flush=True)

    if not new[LO] and not new[HI]:
        print("no new runs collected — cache left untouched", flush=True)
        return
    art["runs_low"] += [b["build_sec"] for b in new[LO]]
    art["runs_high"] += [b["build_sec"] for b in new[HI]]
    art["steal_ratio_low"] += [b["steal_ratio"] for b in new[LO]]
    art["steal_ratio_high"] += [b["steal_ratio"] for b in new[HI]]

    def leg_min(runs, steals):
        """Minimum over CLEAN runs (steal <= MAX_STEAL) — a storm run that
        happened to finish fast must not become the headline (ADVICE fix);
        falls back to the overall min with an explicit flag if no run
        qualifies."""
        clean = [r for r, s in zip(runs, steals) if s <= MAX_STEAL]
        if clean:
            return min(clean), False
        return min(runs), True

    art["build_sec_low"], lo_dirty = leg_min(
        art["runs_low"], art["steal_ratio_low"]
    )
    art["build_sec_high"], hi_dirty = leg_min(
        art["runs_high"], art["steal_ratio_high"]
    )
    art["minimum_from_storm_run"] = bool(lo_dirty or hi_dirty)
    thr_lo = DOCS / art["build_sec_low"]
    thr_hi = DOCS / art["build_sec_high"]
    art["docs_per_sec_low"] = round(thr_lo, 1)
    art["docs_per_sec_high"] = round(thr_hi, 1)
    art["efficiency"] = round(thr_hi / (thr_lo * (HI / LO)), 3)
    art["note"] = (
        "compute-dominated pair (north_rule two-cluster-size criterion, "
        f"sandbox proxy: same job at {LO} vs {HI} cores, fresh subprocess "
        "each, warm page cache, legs interleaved in time, min of "
        f"{len(art['runs_low'])}/{len(art['runs_high'])} runs per leg with "
        "per-run hypervisor steal ratios recorded — the first 5/5 runs "
        "landed in an 18-29% steal storm; later clean-window runs appended "
        "by scripts/scaling_remeasure.py)"
    )
    with open(cache_key, "w") as f:
        json.dump(art, f)
    print(json.dumps({k: art[k] for k in
                      ("efficiency", "build_sec_low", "build_sec_high",
                       "docs_per_sec_low", "docs_per_sec_high")}),
          flush=True)


if __name__ == "__main__":
    main()
