"""Kill/resume rig for the restartable BPE trainer (r14, VERDICT r13
directive #6): run a production-cadence fit on the Zipf corpus
(tools/bpe_train_probe.py::zipf_docs — ~50k-word vocabulary), SIGKILL
the driver mid-fit at least twice, resume each time from the persisted
``state_dir`` generations, and verify the final merge table is
BIT-IDENTICAL to an uninterrupted fit. Also measures what a resume
costs: the state load + initial checkpoints (vocab read + pairs
recompute — one vocab-sized job) before the first new merge lands.

The fit itself runs in CHILD PROCESSES (``--fit``): a kill must take
the whole JVM down, exactly like a production driver loss — an
in-process exception rig would leave Spark state alive and prove
nothing about crash-window persistence.

Usage:   python tools/bpe_resume_probe.py [n_merges] [kill_after_s ...]
default: 240 merges, kills at 75s and 75s (two interruptions), then a
run to completion. Prints per-segment walls, the generations each kill
left behind, resume overhead, and the bit-identity verdict.
"""

from __future__ import annotations

import json
import os
import signal
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STATE = "/tmp/tsl_bpe_resume_probe"
PERSIST_EVERY = 48  # production-like: a few generations across the fit
CHECKPOINT_EVERY = 8


def fit(n_merges: int, state_dir: str | None, out_json: str) -> None:
    """Child-process body: one fit (cold or resumed), stats to JSON."""
    from pyspark.sql import functions as F  # noqa: F401

    from time_series_loader_spark.functions.bpe import train_bpe_merges
    from time_series_loader_spark.session import get_spark
    from tools.bpe_train_probe import zipf_docs

    spark = get_spark("tsl-bpe-resume-probe")
    spark.sparkContext.setLogLevel("ERROR")
    docs = zipf_docs(spark).localCheckpoint(eager=True)
    stats: list[dict] = []
    t0 = time.monotonic()
    merges = train_bpe_merges(
        docs, "text", n_merges=n_merges, min_count=2,
        checkpoint_every=CHECKPOINT_EVERY, stats=stats,
        state_dir=state_dir, persist_every=PERSIST_EVERY,
    )
    wall = time.monotonic() - t0
    # resume overhead = everything before the first new iteration's
    # work: state load, vocab checkpoint, pairs recompute (the one
    # vocab-sized job `train_bpe_merges` documents)
    iter_wall = sum(s["wall_s"] for s in stats)
    with open(out_json, "w") as fh:
        json.dump(
            {
                "wall_s": wall,
                "overhead_s": wall - iter_wall,
                "n_new_merges": len(stats),
                "n_merges_total": len(merges),
                "mean_batch_w": (
                    len(stats) / max(sum(1.0 / s.get("batch_w", 1) for s in stats), 1e-9)
                ),
                "merges": merges,
            },
            fh,
        )


def run_segment(n_merges: int, state_dir: str | None, kill_after: float | None):
    """Spawn a --fit child; SIGKILL it after ``kill_after`` seconds (or
    let it finish). Returns the child's JSON result, or None if
    killed."""
    out = f"{STATE}.seg.json"
    if os.path.exists(out):
        os.remove(out)
    cmd = [sys.executable, os.path.abspath(__file__), "--fit",
           str(n_merges), state_dir or "-", out]
    t0 = time.monotonic()
    proc = subprocess.Popen(cmd)
    if kill_after is None:
        proc.wait()
        wall = time.monotonic() - t0
        with open(out) as fh:
            return {"segment_wall_s": wall, **json.load(fh)}
    time.sleep(kill_after)
    os.kill(proc.pid, signal.SIGKILL)
    proc.wait()
    return None


def persisted_gens(state_dir: str) -> list[str]:
    if not os.path.isdir(state_dir):
        return []
    return sorted(
        d for d in os.listdir(state_dir)
        if d.startswith("upto=")
        and os.path.exists(os.path.join(state_dir, d, "_TSL_COMPLETE"))
    )


def main() -> None:
    if "--fit" in sys.argv:
        i = sys.argv.index("--fit")
        n_merges, state_dir, out = (
            int(sys.argv[i + 1]),
            sys.argv[i + 2],
            sys.argv[i + 3],
        )
        fit(n_merges, None if state_dir == "-" else state_dir, out)
        return

    args = [a for a in sys.argv[1:] if not a.startswith("-")]
    n_merges = int(args[0]) if args else 240
    kills = [float(a) for a in args[1:]] or [75.0, 75.0]

    import shutil

    state = f"{STATE}.state"
    shutil.rmtree(state, ignore_errors=True)

    print(f"== straight fit, {n_merges} merges (no state_dir) ==")
    straight = run_segment(n_merges, None, None)
    print(f"   wall {straight['wall_s']:.1f}s, "
          f"mean batch width {straight['mean_batch_w']:.2f}")

    segs = []
    for k, kill_after in enumerate(kills):
        print(f"== resumable segment {k}: SIGKILL after {kill_after:.0f}s ==")
        run_segment(n_merges, state, kill_after)
        gens = persisted_gens(state)
        print(f"   killed; complete generations on disk: {gens or 'NONE'}")
        segs.append(gens)

    print("== final segment: resume to completion ==")
    final = run_segment(n_merges, state, None)
    print(
        f"   wall {final['wall_s']:.1f}s for {final['n_new_merges']} new merges "
        f"(resumed past {final['n_merges_total'] - final['n_new_merges']}), "
        f"resume overhead {final['overhead_s']:.1f}s "
        f"(state load + vocab ckpt + pairs recompute)"
    )
    identical = final["merges"] == straight["merges"]
    print(f"bit-identity straight vs killed-twice-resumed: "
          f"{'IDENTICAL' if identical else 'DIVERGED'} "
          f"({len(final['merges'])} merges)")
    if not identical:
        for i, (a, b) in enumerate(zip(straight["merges"], final["merges"])):
            if a != b:
                print(f"   first divergence at rank {i}: {a} vs {b}")
                break
        sys.exit(1)


if __name__ == "__main__":
    main()
