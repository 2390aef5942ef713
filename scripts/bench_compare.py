#!/usr/bin/env python3
"""Compare two graft.Bench JSON lines (e.g. BENCH_r3.json vs BENCH_r4.json).

Usage: bench_compare.py OLD.json NEW.json [ratio_threshold=1.5] [abs_floor_sec=0.3]

Prints per-query deltas that exceed BOTH the ratio threshold and the
absolute floor (sub-floor timings are inside the co-tenant noise band
even under the median/min statistics — see BASELINE.md), plus totals
and the query sets added/removed. Exit code 1 if any regression
crosses both bars, so the script can gate a round's self-check.
"""
import json
import re
import sys

NON_QUERY_KEYS = {"metric", "value", "unit", "sf", "n", "rc", "cpus",
                  "failed", "gc_share", "cpu_vs_wall"}

# full parsed records by path, when the input carried the complete
# bench_out.json line (reps + exec_metrics available for attribution)
LOADED = {}


def attribution(rec, q, old_rec=None):
    """One-line root-cause summary for a flagged query from the r14
    self-attributing record: raw rep times, then per-rep GC share,
    cpu-vs-wall, spill, and shuffle bytes (stable bytes across
    reps/rounds = same plan → wall delta is session state, not a plan
    regression; flat cpu_ms under a grown run_ms = co-tenant steal).
    When the OLD record is also full (r15+: BENCH_FULL_r{N}.json), the
    prior round's steady-state shuffle bytes are printed alongside, so
    cross-round plan identity is read off one line."""
    reps = rec.get("reps", {}).get(q)
    ms = rec.get("exec_metrics", {}).get(q)
    if not reps or not ms:
        return None
    parts = [f"reps={'/'.join(f'{t:.2f}' for t in reps)}s"]
    for i, m in enumerate(ms):
        run = max(m.get("run_ms", 0), 1)
        gc = m.get("gc_ms", 0)
        cpu = m.get("cpu_ms")
        spill = m.get("spill_mem_bytes", 0) + m.get("spill_disk_bytes", 0)
        shuf = m.get("shuffle_write_bytes", 0)
        parts.append(
            f"r{i + 1}: gc {100.0 * gc / run:.0f}% of {run}ms"
            + (f", cpu/wall {cpu / run:.2f}" if cpu is not None else "")
            + (f", spill {spill >> 20}MiB" if spill else "")
            + f", shuffle {shuf}B")
    old_ms = (old_rec or {}).get("exec_metrics", {}).get(q)
    if old_ms:
        # steady-state rep (last one): rep 1 may carry cold builds
        parts.append(f"prev-round shuffle {old_ms[-1].get('shuffle_write_bytes', 0)}B")
    return "; ".join(parts)


def session_line(tag, rec):
    """The suite-level health scalar (r15): classifies the whole
    window — gc_share ≫ 0.05 = memory pressure, cpu_vs_wall ≪ 0.9 on
    a dedicated box = tasks waited (co-tenant steal), spill ≠ 0 =
    starvation. Printed FIRST so a loaded window is read before any
    per-query delta is believed."""
    s = rec.get("session")
    if not s:
        return None
    return (f"session[{tag}]: gc_share={s.get('gc_share', 0):.3f} "
            f"cpu_vs_wall={s.get('cpu_vs_wall', 0):.3f} "
            f"spill={s.get('spill_total_bytes', 0) >> 20}MiB "
            f"sched_delay={s.get('sched_delay_ms', 0)}ms "
            f"run_total={s.get('run_ms_total', 0)}ms")


def load(path):
    """Accept either a raw graft.Bench JSON line (possibly behind an
    sbt `[info] ` prefix) or the driver's BENCH_r{N}.json wrapper,
    whose `tail` holds a TRUNCATED copy of that line — per-query pairs
    are then recovered by regex, so comparisons work on the subset of
    queries that survived truncation. bench_out.json (written by
    graft.Bench itself since r5) parses as the complete first branch.
    Since r14 the full record also carries `reps` (raw per-rep wall
    times) and `exec_metrics` (per-rep executor-metric deltas), kept
    in LOADED[path] for the attribution printout."""
    # Prefer the full archived record when one exists (VERDICT r14 #1):
    # BENCH_r{N}.json is a 2000-char truncated tail, but round close
    # archives the complete bench_out.json as BENCH_FULL_r{N}.json —
    # comparing full-vs-full gives every shared query per-rep,
    # per-metric attribution instead of the ~50-query tail subset.
    orig = path
    m = re.fullmatch(r"(.*)BENCH_(r\d+\.json)", path)
    if m:
        import os
        full = f"{m.group(1)}BENCH_FULL_{m.group(2)}"
        if os.path.exists(full):
            print(f"(using full record {full} for {path})")
            path = full
    txt = open(path).read().strip()
    try:
        d = json.loads(txt)
        if isinstance(d, dict) and "tail" in d and "queries" not in d:
            # the preceding delimiter anchors the key: the tail window
            # can start MID-KEY, and an unanchored match would record a
            # truncated fragment as a (possibly colliding) query name.
            # Strip the nested session object FIRST — any float-valued
            # field inside it would otherwise register as a phantom
            # query the moment one is added (NON_QUERY_KEYS keeps the
            # two current float names as a belt-and-suspenders).
            tail = re.sub(r'"session":\{[^}]*\}', "", d["tail"])
            pairs = re.findall(r'[,{]"([a-z0-9_]+)":([0-9]+\.[0-9]+)', tail)
            qs = {k: float(v) for k, v in pairs if k not in NON_QUERY_KEYS}
            return qs, sum(qs.values()), {}  # partial total: visible tail only
        if isinstance(d, dict) and "queries" in d:
            LOADED[orig] = d  # keyed by the CALLER's path, pre-redirect
            return d["queries"], d["value"], d.get("estimators", {})
    except json.JSONDecodeError:
        pass
    # Multi-line capture (full sbt stdout): Bench prints in
    # significance order with the FULL record FIRST and a compact
    # headline (no "queries" key) LAST — scan for any line that parses
    # AND carries the per-query map rather than assuming a position.
    for line in txt.splitlines():
        if line.startswith("[info] "):
            line = line[len("[info] "):]
        try:
            d = json.loads(line)
        except json.JSONDecodeError:
            continue
        if isinstance(d, dict) and "queries" in d:
            return d["queries"], d["value"], d.get("estimators", {})
    raise SystemExit(f"{path}: no parseable bench record with a 'queries' map")


def main():
    old_path, new_path = sys.argv[1], sys.argv[2]
    ratio = float(sys.argv[3]) if len(sys.argv) > 3 else 1.5
    floor = float(sys.argv[4]) if len(sys.argv) > 4 else 0.3
    old, old_total, old_est = load(old_path)
    new, new_total, new_est = load(new_path)

    added = sorted(set(new) - set(old))
    removed = sorted(set(old) - set(new))
    shared = sorted(set(old) & set(new))

    regressions, improvements, flips = [], [], []
    for q in shared:
        a, b = old[q], new[q]
        if a <= 0 or b <= 0:
            continue
        # An estimator flip (median3 <-> min2) shifts the statistic —
        # min reads systematically LOWER than median. One-sided deltas
        # remain conclusive: a query whose new min2 figure still
        # exceeds the old median3 bar regressed DESPITE the low-bias
        # estimator (this is exactly the >5s-crossing regression class,
        # which always flips); symmetrically a new median3 below the
        # old min2 bar improved despite the high bias. Only the
        # bias-aligned directions are unjudgeable and get flagged.
        flipped = (old_est.get(q) and new_est.get(q)
                   and old_est[q] != new_est[q])
        if b > a * ratio and (b - a) > floor:
            if not flipped or new_est[q] == "min2":
                regressions.append((q, a, b))
            else:
                flips.append((q, a, b))
        elif a > b * ratio and (a - b) > floor:
            if not flipped or new_est[q] == "median3":
                improvements.append((q, a, b))
            else:
                flips.append((q, a, b))

    shared_old = sum(old[q] for q in shared)
    shared_new = sum(new[q] for q in shared)
    # session health FIRST: a loaded window discounts every delta below
    for tag, p in (("old", old_path), ("new", new_path)):
        line = session_line(tag, LOADED.get(p, {}))
        if line:
            print(line)
    print(f"totals: {old_total:.1f}s/{len(old)}q -> "
          f"{new_total:.1f}s/{len(new)}q "
          f"(shared {len(shared)}q: {shared_old:.1f}s -> {shared_new:.1f}s)")
    if added:
        print(f"added ({len(added)}): {', '.join(added)}")
    if removed:
        print(f"REMOVED ({len(removed)}): {', '.join(removed)}")
    for q, a, b in sorted(improvements, key=lambda t: t[1] - t[2]):
        print(f"  faster  {q:32s} {a:6.2f} -> {b:6.2f}")
    new_rec = LOADED.get(new_path, {})
    old_rec = LOADED.get(old_path, {})
    for q, a, b in sorted(regressions, key=lambda t: t[1] - t[2]):
        print(f"  SLOWER  {q:32s} {a:6.2f} -> {b:6.2f}")
        attr = attribution(new_rec, q, old_rec)
        if attr:
            print(f"          {attr}")
    for q, a, b in flips:
        print(f"  (estimator flip, not graded) {q:32s} {a:6.2f} -> {b:6.2f}")
    if not regressions:
        print("no regressions past the ratio+floor bars")
    sys.exit(1 if regressions else 0)


if __name__ == "__main__":
    main()
