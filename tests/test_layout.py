"""Z-order layout (sources/layout.py): key math + real footer-stats
skipping measured with pyarrow against linear-sorted and unsorted
baselines."""

import pathlib

import pyarrow.parquet as pq
import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.sources.layout import zorder_key, zorder_write


def test_zorder_key_interleaves_bits(spark):
    # 2 cols x 2 bits over values {0..3}: z = interleave(x, y)
    rows = [(x, y) for x in range(4) for y in range(4)]
    df = spark.createDataFrame(rows, "x INT, y INT")
    got = {
        (r["x"], r["y"]): r["_zorder"]
        for r in zorder_key(df, ["x", "y"], bits_per_col=2).collect()
    }
    # min-max scaling maps {0..3} onto buckets {0..3} exactly (v/3*4 floors
    # to v for v<3, clamped to 3 at v=3)
    def morton(x, y):
        z = 0
        for i in range(2):
            z |= ((x >> i) & 1) << (2 * i)
            z |= ((y >> i) & 1) << (2 * i + 1)
        return z

    assert got == {(x, y): morton(x, y) for x, y in rows}


def test_zorder_key_edge_cases(spark):
    df = spark.createDataFrame([(None, 5.0), (1, 5.0), (2, 5.0)], "x INT, c DOUBLE")
    out = {r["x"]: r["_zorder"] for r in zorder_key(df, ["x", "c"], 4).collect()}
    # constant column contributes 0 bits; null scales to bucket 0
    assert out[None] == 0
    assert out[1] == 0  # min of x → bucket 0
    assert out[2] > 0
    with pytest.raises(ValueError, match="> 62"):
        zorder_key(df, ["x", "c"], 32)
    with pytest.raises(ValueError, match="at least one"):
        zorder_key(df, [], 8)


def _files_overlapping(path, x_rng, y_rng):
    """Count parquet files whose footer min/max stats overlap the 2-d
    predicate — exactly what a stats-pruning reader would scan."""
    hit = 0
    for p in sorted(pathlib.Path(path).glob("*.parquet")):
        md = pq.ParquetFile(p).metadata
        xmin = ymin = float("inf")
        xmax = ymax = float("-inf")
        for rg in range(md.num_row_groups):
            row = md.row_group(rg)
            for ci in range(row.num_columns):
                col = row.column(ci)
                name = col.path_in_schema
                st = col.statistics
                if st is None:
                    continue
                if name == "x":
                    xmin, xmax = min(xmin, st.min), max(xmax, st.max)
                if name == "y":
                    ymin, ymax = min(ymin, st.min), max(ymax, st.max)
        if xmin <= x_rng[1] and xmax >= x_rng[0] and ymin <= y_rng[1] and ymax >= y_rng[0]:
            hit += 1
    return hit


def test_zorder_write_skips_files_on_two_column_predicates(spark, tmp_path):
    """The honesty check: against REAL parquet footer stats, a z-ordered
    16-file layout must let a 2-d point-ish predicate skip most files,
    while a layout sorted by x alone cannot skip on y."""
    n = 1 << 14
    # deterministic pseudo-uniform 2-d points (no rand(): md5-derived)
    df = (
        spark.range(n)
        .withColumn("x", F.conv(F.substring(F.md5(F.col("id").cast("string")), 1, 4), 16, 10).cast("long"))
        .withColumn("y", F.conv(F.substring(F.md5(F.col("id").cast("string")), 5, 4), 16, 10).cast("long"))
    )
    zpath = str(tmp_path / "z")
    lpath = str(tmp_path / "linear")
    zorder_write(df, zpath, ["x", "y"], n_files=16)
    df.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(lpath)

    # ~1/8 x 1/8 of the domain: both dims prune under z-order
    xr = (20000, 28191)
    yr = (40000, 48191)
    assert _files_overlapping(zpath, xr, yr) <= 4

    # the separating case — predicate on y ALONE: a layout sorted by x
    # cannot skip a single file on y (every file spans all of y), while
    # z-order's interleaved high bits still bound y per file
    full_x = (0, 65535)
    z_y = _files_overlapping(zpath, full_x, yr)
    l_y = _files_overlapping(lpath, full_x, yr)
    assert l_y == 16
    assert z_y <= 8
    # data round-trips
    assert spark.read.parquet(zpath).count() == n
