"""Simultaneous-pair scaling evidence: N and 4N pinned to DISJOINT core
sets, run at the same moment on the same input.

Sequential best-of sampling on this time-shared host confounds
parallelism with host weather (co-tenant load swings 0.1 → 20 between
— and during — runs). Running both levels concurrently on disjoint
pinned cores exposes them to the SAME weather window, so the ratio
T_N / (4 × T_4N) measures scaling, not scheduling luck. Memory-bandwidth
interaction between the two JVMs is second-order compared to the
temporal swings (and biases AGAINST the bigger level, so the reported
efficiency is conservative).

Per round: JVM A = local[N] pinned to cores [0, N), JVM B = local[4N]
pinned to cores [N, N+4N) — N+4N ≤ 20 leaves ≥12 cores for co-tenants.
Efficiency per round uses each JVM's best timed rep; the summary reports
every round plus the median (robust) and best-round values.

Usage: python BENCH/scaling_pair.py [rounds] [n_convs] [N] [work_dir]
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, os.path.join(REPO, "BENCH"))

from scaling_probe import PROBE_BODY  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 3
    n_convs = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    n_lo = int(sys.argv[3]) if len(sys.argv) > 3 else 4
    n_hi = 4 * n_lo

    reuse = sys.argv[4] if len(sys.argv) > 4 else None
    if reuse:
        work, raw = reuse, os.path.join(reuse, "raw")
        _setup = None
    else:
        base = "/dev/shm" if os.path.isdir("/dev/shm") else None
        work = tempfile.mkdtemp(prefix="scaling_pair_", dir=base)
        raw = os.path.join(work, "raw")
    setup = (
        f"import sys; sys.path.insert(0, {REPO!r});"
        "from biomed_timeseries_preprocessing_spark.session import get_spark;"
        "from biomed_timeseries_preprocessing_spark.sources.synth import synth_transcripts;"
        f"s = get_spark(master='local[16]');"
        f"synth_transcripts(s, {n_convs}).repartition(256).write.mode('overwrite').parquet({raw!r}); s.stop()  # 256 files: the scan must give BOTH pinned levels >=3 well-packed task waves (a ~35-split scan is exactly one wave at 32 cores -- half the slots idle in wave 2)"
    )
    if not reuse:
        subprocess.run([sys.executable, "-c", setup], check=True, capture_output=True)

    probe_src = PROBE_BODY.format(repo=REPO)
    lo_cores = f"0-{n_lo - 1}"
    hi_cores = f"{n_lo}-{n_lo + n_hi - 1}"
    per_round = []
    n_turns = 0
    for r in range(rounds):
        load1 = os.getloadavg()[0]
        procs = {}
        for cpus, cores in ((str(n_lo), lo_cores), (str(n_hi), hi_cores)):
            procs[cpus] = subprocess.Popen(
                ["taskset", "-c", cores, sys.executable, "-c", probe_src, cpus, raw, work, "4"],
                stdout=subprocess.PIPE,
                stderr=subprocess.DEVNULL,
                text=True,
            )
        reps = {}
        for cpus, p in procs.items():
            out, _ = p.communicate()
            line = [ln for ln in out.splitlines() if ln.startswith("PROBE")][0]
            parts = line.split()
            n_turns = int(parts[2])
            reps[cpus] = [float(x) for x in parts[3:]]
        b_lo, b_hi = min(reps[str(n_lo)]), min(reps[str(n_hi)])
        eff = b_lo / (4.0 * b_hi)
        per_round.append(
            {
                "load1_at_launch": round(load1, 2),
                "reps_sec": reps,
                "best_sec": {str(n_lo): b_lo, str(n_hi): b_hi},
                "efficiency": round(eff, 3),
            }
        )
        print(f"round {r}: load1={load1:.1f} best {n_lo}c={b_lo:.1f}s {n_hi}c={b_hi:.1f}s eff={eff:.3f}", flush=True)
        _write(per_round, n_turns, n_lo, n_hi)
    if not reuse:
        import shutil

        shutil.rmtree(work, ignore_errors=True)


def _write(per_round, n_turns, n_lo, n_hi) -> None:
    effs = [r["efficiency"] for r in per_round]
    best_round = max(per_round, key=lambda r: r["efficiency"])
    summary = {
        "levels": {"N": n_lo, "4N": n_hi},
        "turns": n_turns,
        "rounds": per_round,
        "efficiency_median": round(statistics.median(effs), 3),
        "efficiency_best_round": best_round["efficiency"],
        "throughput_turns_per_sec_best_round": {
            str(n_lo): round(n_turns / best_round["best_sec"][str(n_lo)], 1),
            str(n_hi): round(n_turns / best_round["best_sec"][str(n_hi)], 1),
        },
        "method": "simultaneous disjoint-pinned pair (identical weather window per "
        "round); per-JVM best of 3 timed reps; CPU-pinned via taskset",
    }
    with open(os.path.join(REPO, "BENCH", "scaling_pair_raw.json"), "w") as f:
        json.dump(summary, f, indent=2)


if __name__ == "__main__":
    main()
