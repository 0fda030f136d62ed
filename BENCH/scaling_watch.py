"""Load-gated scaling evidence collector.

The sandbox host is time-shared with violent co-tenant bursts (1-min
load swings 0.1 → 20 within minutes). The 32-thread level of the
two-cluster-size gate needs an actually-idle host to show its real
capability, while the 8-thread level can find 8 free cores almost any
time — so un-gated best-of sampling is asymmetrically biased AGAINST
the gate. This watcher fires a single fresh-JVM probe run ONLY when the
1-minute load average is below a threshold, alternating levels, and
accumulates every rep (with the load at launch) into
``BENCH/scaling_raw.json``. Efficiency is computed from the best rep
per level taken under quiet-load conditions.

Usage: python BENCH/scaling_watch.py [budget_min] [n_convs] [quiet_load] [levels] [work_dir]
``levels`` is "N,4N" core counts (default "8,32"). On afternoons with a
sustained ~6-core co-tenant, "4,16" keeps both pinned levels inside the
actually-available cores — the north rule allows any N vs 4N.
``work_dir`` reuses an existing scratch dir whose ``raw/`` input was
already generated (restart without paying setup again).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from scaling_probe import PROBE_BODY, pinned_cmd  # noqa: E402


def busy_frac(interval_sec: float = 3.0) -> float:
    """Fraction of total CPU time NOT idle over the interval, from
    /proc/stat deltas. On this sandbox loadavg counts D-state (measured
    loadavg 12 at 99.9% idle), so gating probe launches on loadavg
    starves the watcher on a free host — the busy fraction is the real
    contention signal."""

    def snap() -> tuple[int, int]:
        with open("/proc/stat") as f:
            v = list(map(int, f.readline().split()[1:]))
        return sum(v), v[3]

    t0, i0 = snap()
    time.sleep(interval_sec)
    t1, i1 = snap()
    return 1.0 - (i1 - i0) / max(t1 - t0, 1)


def main() -> None:
    budget_min = float(sys.argv[1]) if len(sys.argv) > 1 else 45
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    quiet = float(sys.argv[3]) if len(sys.argv) > 3 else 2.0
    levels = (sys.argv[4] if len(sys.argv) > 4 else "8,32").split(",")
    lo, hi = levels[0], levels[1]

    reuse = sys.argv[5] if len(sys.argv) > 5 else None
    if reuse:
        work = reuse
        raw = os.path.join(work, "raw")
    else:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        work = tempfile.mkdtemp(prefix="scaling_watch_", dir=base)
        raw = os.path.join(work, "raw")
        setup = (
            f"import sys; sys.path.insert(0, {REPO!r});"
            "from biomed_timeseries_preprocessing_spark.session import get_spark;"
            "from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts;"
            f"s = get_spark(master='local[16]');"
            f"synth_transcripts(s, {n_convs}).repartition(256).write.mode('overwrite').parquet({raw!r}); s.stop()  # 256 files: the scan must give BOTH pinned levels >=3 well-packed task waves (a ~35-split scan is exactly one wave at 32 cores -- half the slots idle in wave 2)"
        )
        subprocess.run([sys.executable, "-c", setup], check=True, capture_output=True)

    probe_src = PROBE_BODY.format(repo=REPO)
    reps: dict[str, list[dict]] = {lo: [], hi: []}
    n_turns = 0
    deadline = time.time() + budget_min * 60
    # 32 first: it needs the rarest resource (a fully idle host)
    order = [hi, lo]
    i = 0
    while time.time() < deadline:
        # gate on REAL CPU contention (/proc/stat busy fraction), not
        # loadavg (D-state-polluted on this host); `quiet` is interpreted
        # as a busy-core count: fire when busy cores < quiet
        bf = busy_frac(3.0)
        ncpu = os.cpu_count() or 32
        if bf * ncpu > quiet:
            time.sleep(15)
            continue
        load1 = os.getloadavg()[0]
        cpus = order[i % 2]
        i += 1
        # 2 timed reps per JVM: fits inside short quiet windows; pinned
        # to exactly its core budget (see scaling_probe docstring)
        out = subprocess.run(
            pinned_cmd(cpus) + [sys.executable, "-c", probe_src, cpus, raw, work, "3"],
            check=True,
            capture_output=True,
            text=True,
        )
        line = [ln for ln in out.stdout.splitlines() if ln.startswith("PROBE")][0]
        parts = line.split()
        n_turns = int(parts[2])
        for t in (float(x) for x in parts[3:]):
            reps[cpus].append(
                {
                    "sec": t,
                    "busy_cores_at_launch": round(bf * ncpu, 2),
                    "load1_at_launch": round(load1, 2),
                }
            )
        print(
            f"local[{cpus}] busy_cores={bf * ncpu:.2f} load1={load1:.2f}: {parts[3:]}",
            flush=True,
        )
        _write(reps, n_turns, lo, hi)
    _write(reps, n_turns, lo, hi)
    if not reuse:  # a reused dir may serve further restarts
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _write(reps, n_turns, lo="8", hi="32") -> None:
    have = {k: [r["sec"] for r in v] for k, v in reps.items() if v}
    summary = {
        "n_convs_note": "load-gated watcher (quiet-host reps only)",
        "turns": n_turns,
        "reps": reps,
    }
    if lo in have and hi in have:
        b_lo, b_hi = min(have[lo]), min(have[hi])
        t_lo, t_hi = n_turns / b_lo, n_turns / b_hi
        summary.update(
            {
                "levels": {"N": int(lo), "4N": int(hi)},
                "best_sec": {lo: b_lo, hi: b_hi},
                "throughput_turns_per_sec": {lo: round(t_lo, 1), hi: round(t_hi, 1)},
                "scaling_efficiency_N_to_4N": round(t_hi / (4 * t_lo), 3),
                "method": "load-gated (1-min load < threshold at launch) alternating "
                "CPU-pinned fresh-JVM runs, best per level, same on-disk input",
            }
        )
    with open(os.path.join(REPO, "BENCH", "scaling_watch_raw.json"), "w") as f:
        json.dump(summary, f, indent=2)
    if "scaling_efficiency_N_to_4N" in summary:
        print("eff so far:", summary["scaling_efficiency_N_to_4N"], flush=True)


if __name__ == "__main__":
    main()
