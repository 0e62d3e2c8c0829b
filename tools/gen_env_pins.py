"""Generate ``resources/env_pins.json`` — the frozen environment
fingerprint the ``env_fingerprint`` gate slot compares against.

The slot (VERDICT r6 directive #5, r7 #1) makes environment drift between
the build machine and the correctness driver VISIBLE in the driver record
itself: each pinned value is emitted as a literal by ONE engine and
recomputed LIVE by the other, so

- ``ver_*``      — library/JVM versions (Spark live vs pin; duckdb pin vs
                   oracle ``version()`` live),
- ``py_ln_*``    — CPython ``math.log`` canaries (pin only; CPython is the
                   pin source, recorded for the record's sake),
- ``jvm_ln_*``   — the executing JVM's ``ln`` at 17 significant digits
                   (Spark live vs pin),
- ``duck_ln_*``  — the driver DuckDB's ``ln`` (pin vs oracle live),
- ``duck_lower`` / ``duck_ws_split_n`` / ``duck_nfc_md5`` — the driver
  DuckDB's Unicode lowering, ``\\s+`` whitespace classes, and NFC
  normalization (pin vs oracle live) — the exact engine-native functions
  a tokenization-divergence hypothesis for a red text slot would accuse,
- ``spark_lower`` / ``spark_ws_split_n`` — the same probes on the driver
  Spark build (live vs pin),

all as STRINGS, so a red ``env_fingerprint`` row names WHICH runtime
moved, and every other slot's red/green can be read against it.

Run: ``python tools/gen_env_pins.py`` (rewrites resources/env_pins.json).
"""

from __future__ import annotations

import json
import math
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from time_series_loader_spark.envpins import (  # single source of truth
    CASE_CANARY,
    LN_KS,
    NFC_CANARY,
    PINS_PATH,
    WS_CANARY,
)


def compute_pins(spark) -> dict[str, str]:
    """Every pin recomputed LIVE from the current environment — the
    generator writes these to env_pins.json; the freshness test compares
    them against the committed file so a library/JVM upgrade (or an ln-
    table regen on a drifted box) can't silently stale the fingerprint."""
    import duckdb
    import numpy
    import pandas
    import pyarrow
    import pyspark

    pins: dict[str, str] = {
        "ver_python": sys.version.split()[0],
        "ver_pyspark": pyspark.__version__,
        "ver_spark_jvm": spark.version,
        "ver_pyarrow": pyarrow.__version__,
        "ver_pandas": pandas.__version__,
        "ver_numpy": numpy.__version__,
        "ver_duckdb": duckdb.__version__,
        "ver_java": spark.sparkContext._jvm.java.lang.System.getProperty(
            "java.version"
        ),
    }
    for k in LN_KS:
        pins[f"py_ln_{k}"] = repr(math.log(float(k)))

    # JVM canaries via one tiny Spark job
    from pyspark.sql import functions as F

    jvm_rows = (
        spark.createDataFrame([(k,) for k in LN_KS], "k INT")
        .select(
            "k",
            F.format_string("%.17g", F.log(F.col("k").cast("double"))).alias("v"),
        )
        .collect()
    )
    for r in jvm_rows:
        pins[f"jvm_ln_{r['k']}"] = r["v"]
    pins["spark_lower"] = (
        spark.range(1).select(F.lower(F.lit(CASE_CANARY)).alias("v")).collect()[0]["v"]
    )
    pins["spark_ws_split_n"] = str(
        spark.range(1)
        .select(F.size(F.split(F.lit(WS_CANARY), r"\s+")).alias("v"))
        .collect()[0]["v"]
    )

    # DuckDB canaries, live from the build machine's duckdb
    con = duckdb.connect()
    for k in LN_KS:
        pins[f"duck_ln_{k}"] = con.execute(
            f"SELECT printf('%.17g', ln(CAST({k} AS DOUBLE)))"
        ).fetchone()[0]
    pins["duck_lower"] = con.execute(
        "SELECT lower(?)", [CASE_CANARY]
    ).fetchone()[0]
    pins["duck_ws_split_n"] = str(
        con.execute(
            r"SELECT len(string_split_regex(?, '\s+'))", [WS_CANARY]
        ).fetchone()[0]
    )
    pins["duck_nfc_md5"] = con.execute(
        "SELECT md5(nfc_normalize(?))", [NFC_CANARY]
    ).fetchone()[0]
    return pins


def main() -> None:
    from time_series_loader_spark.session import get_spark

    pins = compute_pins(get_spark("gen-env-pins"))
    with open(PINS_PATH, "w") as fh:
        json.dump(pins, fh, indent=1, ensure_ascii=False, sort_keys=True)
    print(f"wrote {len(pins)} pins to {PINS_PATH}")


if __name__ == "__main__":
    main()
