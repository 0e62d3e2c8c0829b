"""Timestamp parsing: strict format first, fixed fallback family second.

Replaces the reference's two-tier parse — strict ``pd.to_datetime(format=...)``
(reference ``load_file.py:1821-1824``) with a row-wise ``dateparser`` fallback
(reference ``load_file.py:1932-1955``, self-flagged slow at ``:1933``).

Spark-first design: a ``coalesce`` over ``try_to_timestamp`` candidates stays
entirely JVM-side and vectorized. The pathological dateparser behavior
(per-row natural-language dates) is deliberately NOT replicated by default —
documented divergence per SURVEY.md §7 hard-part (e); a Pandas-UDF compat
shim can be registered as a transform hook when needed.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Format families per the reference's DATE_ORDER settings (DMY/MDY/YMD,
# reference load_file.py:1984-1989), expressed as Spark datetime patterns.
DATE_ORDER_FORMATS: dict[str, tuple[str, ...]] = {
    "DMY": ("dd/MM/yyyy HH:mm:ss", "dd/MM/yyyy HH:mm", "dd-MM-yyyy HH:mm:ss", "dd/MM/yyyy"),
    "MDY": ("MM/dd/yyyy HH:mm:ss", "MM/dd/yyyy HH:mm", "MM-dd-yyyy HH:mm:ss", "MM/dd/yyyy"),
    "YMD": (
        "yyyy-MM-dd HH:mm:ss",
        "yyyy-MM-dd'T'HH:mm:ss",
        "yyyy/MM/dd HH:mm:ss",
        "yyyy-MM-dd HH:mm",
        "yyyy-MM-dd",
    ),
}


def parse_timestamp_multi(
    col: Column | str,
    primary_format: str | None = None,
    fallback_formats: tuple[str, ...] = (),
    date_order: str | None = None,
) -> Column:
    """Parse a string column to timestamp: strict format, then fallbacks.

    Null (not error) on rows no format matches — callers decide whether
    unparsed rows are fatal, mirroring the reference's NaT-on-failure
    fallback semantics.
    """
    c = F.col(col) if isinstance(col, str) else col
    candidates: list[str] = []
    if primary_format:
        candidates.append(primary_format)
    candidates.extend(fallback_formats)
    if date_order:
        candidates.extend(DATE_ORDER_FORMATS[date_order.upper()])
    if not candidates:
        return F.try_to_timestamp(c)
    parsed = [F.try_to_timestamp(c, F.lit(fmt)) for fmt in candidates]
    # Bare try_to_timestamp last: accepts ISO-ish strings nothing else caught.
    parsed.append(F.try_to_timestamp(c))
    return F.coalesce(*parsed)


def lenient_parse_udf(date_order: str = "DMY"):
    """OPT-IN compat shim for the reference's row-wise ``dateparser``
    fallback (reference ``load_file.py:1932-1955`` — flagged slow there
    too, TODO at ``:1933``).

    Arrow-batched pandas UDF wrapping ``pd.to_datetime`` with dayfirst /
    yearfirst derived from the reference's DATE_ORDER settings
    (``load_file.py:1984-1989``). ~100× faster than row-at-a-time parsing
    but still the slow path — the ``coalesce(try_to_timestamp...)`` family
    above stays JVM-side and should be preferred (documented divergence,
    SURVEY.md §7 hard-part (e)).
    """
    import pandas as pd
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import TimestampType

    dayfirst = date_order.upper() == "DMY"
    yearfirst = date_order.upper() == "YMD"

    # no type hints: pd is module-local, so string annotations can't resolve
    # during PySpark's hint inference — the legacy SCALAR form works
    def _parse(s):
        return pd.to_datetime(
            s, errors="coerce", dayfirst=dayfirst, yearfirst=yearfirst, format="mixed"
        )

    return pandas_udf(_parse, TimestampType())
