"""One-time mechanical floor migration for the r11 `_libsrc` stamp
(VERDICT r10 directive #1).

Floors recorded BEFORE bench.py stamped slots with their transitive
library-source hash can be stale in exactly one undetectable way: the
slot's entry callable is unchanged but a library module it executes was
rewritten after the floor was recorded (r10 did this to
`dedup_incremental/incr` via the BIGINT signature store and to
`table_stats/profile` via the profiler/kernel work — both then read as
>1.5x "regressions" against floors for code that no longer existed).

This script re-baselines those floors from git evidence, not hand
judgment. A floor is popped iff BOTH:

1. it predates the r10 driver run — its value is strictly below the
   slot's BENCH_r10 best (bench.py writes `floors[name] = best`
   whenever a run sets a new minimum, so floor == r10 best means the
   floor IS the r10 measurement and its library state is current);
2. the slot's transitive library closure (bench.lib_closure — the same
   function the runtime stamp uses) intersects the set of package
   files git reports changed between the round-8 driver commit
   (f311a68, the last run that could have recorded the floor) and
   HEAD.

Popped floors re-record on the next bench run under the new dual-stamp
regime. Run from the repo root:  python tools/floor_migrate.py [--dry]
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import bench  # noqa: E402  (lib_closure / _pkg_module_file)
import __spark_entry__ as entrymod  # noqa: E402

R8_DRIVER_COMMIT = "f311a68"


def r10_bests() -> dict[str, float]:
    with open(os.path.join(REPO, "BENCH_r10.json")) as fh:
        rec = json.load(fh)
    tail = rec.get("tail", "")
    start = tail.rfind('{"metric"')
    if start < 0:
        raise SystemExit("BENCH_r10.json tail has no metric line")
    line = json.loads(tail[start:])
    return {**line.get("queries", {}), **line.get("sections", {})}


def changed_pkg_files() -> set[str]:
    out = subprocess.run(
        ["git", "diff", "--name-only", R8_DRIVER_COMMIT, "HEAD", "--",
         "time_series_loader_spark/"],
        cwd=REPO, capture_output=True, text=True, check=True,
    ).stdout
    return {ln.strip() for ln in out.splitlines() if ln.strip()}


def main() -> None:
    dry = "--dry" in sys.argv
    floors_path = os.path.join(REPO, "bench_floors.json")
    with open(floors_path) as fh:
        all_floors = json.load(fh)
    bests = r10_bests()
    changed = changed_pkg_files()
    print(f"# {len(changed)} package files changed since {R8_DRIVER_COMMIT}:")
    for f in sorted(changed):
        print(f"#   {f}")

    slots = {**entrymod.queries(), **entrymod.bench_sections()}
    sf01 = all_floors.get("0.1", {})
    popped: list[tuple[str, float, float, list[str]]] = []
    for name, floor in sorted(sf01.items()):
        fn = slots.get(name)
        if fn is None:
            continue
        r10 = bests.get(name)
        if r10 is None or floor >= r10 - 0.0005:
            continue  # floor IS the r10 measurement — library state current
        mods, _helpers = bench.lib_closure(fn)
        files = {
            os.path.relpath(bench._pkg_module_file(m), REPO)
            for m in mods
            if bench._pkg_module_file(m)
        }
        hit = sorted(files & changed)
        if hit:
            popped.append((name, floor, r10, hit))

    for name, floor, r10, hit in popped:
        print(
            f"POP {name}: floor {floor} < r10 best {r10}; closure files "
            f"changed since floor was recorded: {', '.join(hit)}"
        )
        if not dry:
            for key, sect in all_floors.items():
                if not key.startswith("_") and isinstance(sect, dict):
                    sect.pop(name, None)
    if not popped:
        print("no stale floors — nothing to migrate")

    # Harness-epoch seed: r11 changed bench_reset's between-slot
    # semantics (the pinned-ln cache memo is now evicted per slot —
    # ADVICE r10), and at least one floor (`table_stats/profile` 0.281)
    # was recorded under a measurement regime no subsequent full run
    # ever reproduced (r8 driver 0.358, r10 driver 0.436, library and
    # entry provably unchanged). Seeding a pre-epoch marker makes the
    # NEXT bench run pop all floors via the `_harness` stamp and
    # re-baseline loudly under the current discipline — the mechanical
    # alternative to hand-deleting individually unreachable floors.
    if all_floors.get("_harness") is None:
        print("SEED _harness = pre-r11-epoch (next bench run re-baselines all)")
        if not dry:
            all_floors["_harness"] = "pre-r11-epoch"

    if not dry:
        with open(floors_path, "w") as fh:
            json.dump(all_floors, fh, indent=1)
        print(f"# wrote {floors_path}")


if __name__ == "__main__":
    main()
