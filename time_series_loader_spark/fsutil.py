"""Hadoop-filesystem helpers for the engine's COMPLETION-MARKER
protocols (shared by `streaming/incremental.py`'s store compaction and
`functions/bpe.py`'s restartable-training state; factored r13 after the
two modules grew line-for-line copies).

The protocol these helpers implement: a persisted generation directory
(``<root>/<prefix>=<N>/``) is COMPLETE only when it carries a
DRIVER-written ``_TSL_COMPLETE`` file, created after the data writes
return. The committer's ``_SUCCESS`` is NOT a reliable completion
signal — dynamic ``partitionOverwriteMode`` and
``marksuccessfuljobs=false`` both suppress it (the r13 full-suite run
caught a leaked dynamic mode deleting inputs behind a snapshot the
reader then refused to see). Writers delete superseded inputs only
AFTER the marker lands, so a crash at any point leaves either the
previous complete generation or both — never a hole.

Everything resolves paths through Spark's OWN filesystem layer, never
the driver's local FS: the state must live wherever the cluster's
storage is (HDFS/S3/file://), and an ``os.listdir`` would silently
return ``[]`` in cluster mode (the r8 advisor's silent-corruption
finding).
"""

from __future__ import annotations

import os

COMPLETE_MARK = "_TSL_COMPLETE"


def hadoop_fs(spark, path: str):
    """(Hadoop FileSystem, Path) for ``path`` via Spark's conf."""
    hpath = spark._jvm.org.apache.hadoop.fs.Path(path)
    fs = hpath.getFileSystem(spark.sparkContext._jsc.hadoopConfiguration())
    return fs, hpath


def jpath(spark, path: str):
    """A JVM Hadoop Path for ``path``."""
    return spark._jvm.org.apache.hadoop.fs.Path(path)


def complete_generations(spark, root: str, prefix: str) -> list[int]:
    """Ids N of COMPLETE (marker-carrying) ``<root>/<prefix>=N``
    generation directories. Incomplete generations (crash mid-write, or
    written-but-unmarked) are invisible — replays overwrite them."""
    return [n for n, done in all_generations(spark, root, prefix).items() if done]


def all_generations(spark, root: str, prefix: str) -> dict[int, bool]:
    """Every ``<root>/<prefix>=N`` directory, id → marker-complete?.
    Writers use the incomplete entries to SWEEP crash orphans: a
    marker-less generation is invisible to every reader by construction
    (see `complete_generations`), so deleting one is always safe — but
    a replay only overwrites it if it lands on the same N, so without
    an explicit sweep an orphan whose N is never revisited leaks
    forever (r13 advisory on the BPE trainer's state)."""
    fs, hpath = hadoop_fs(spark, root)
    if not fs.exists(hpath):
        return {}
    out: dict[int, bool] = {}
    for status in fs.listStatus(hpath):
        name = status.getPath().getName()
        if not name.startswith(prefix + "="):
            continue
        try:
            n = int(name.split("=", 1)[1])
        except ValueError:
            continue
        out[n] = fs.exists(jpath(spark, os.path.join(root, name, COMPLETE_MARK)))
    return out


def write_complete_marker(spark, gen_dir: str) -> None:
    """Create the driver's completion marker — call ONLY after every
    data write into ``gen_dir`` has returned."""
    fs, _ = hadoop_fs(spark, gen_dir)
    fs.create(jpath(spark, os.path.join(gen_dir, COMPLETE_MARK)), True).close()


def delete_dir(spark, path: str) -> None:
    """Recursive delete through the Hadoop FS (no-op if absent)."""
    fs, hpath = hadoop_fs(spark, path)
    fs.delete(hpath, True)
