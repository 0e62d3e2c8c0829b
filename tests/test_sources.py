"""F1/F2/F5 source-layer tests: discovery, metadata, validation, CSV load."""

from datetime import datetime, timedelta

import pytest

from time_series_loader_spark.config import (
    ColumnNamingConfig,
    LoadingConfig,
    TimeSeriesConfig,
    ValidationStrategy,
)
from time_series_loader_spark.sources.csv import (
    clean_column_name,
    load_csv_timeseries,
    read_header,
    validate_headers,
)
from time_series_loader_spark.sources.discovery import discover_files
from time_series_loader_spark.sources.metadata import (
    TimeMetadataExtractor,
    extract_metadata,
)
from time_series_loader_spark.sources.validation import (
    coverage_report,
    is_valid_sequence,
    validate_file_sequence,
)


def _write(p, text):
    p.write_text(text, encoding="utf-8")
    return str(p)


@pytest.fixture()
def f5_dir(tmp_path):
    """F5: timestamp-named files + decoys."""
    content = "col1;col2\n1;2\n3;4\n"
    for day in (1, 2, 3):
        name = (
            f"E1 1A - Data - 01-0{day}-2023 00_00_00 - 01-0{day}-2023 23_59_59.csv"
        )
        _write(tmp_path / name, content)
    _write(tmp_path / "invalid_file.csv", content)          # no timestamps
    _write(tmp_path / "notes.txt", "hello")                  # wrong extension
    (tmp_path / "empty.csv").touch()                         # zero-byte
    return tmp_path


class TestDiscovery:
    def test_glob_and_filters(self, f5_dir):
        paths, stats = discover_files(base_path=str(f5_dir))
        names = [p.split("/")[-1] for p in paths]
        assert len(paths) == 4  # 3 timestamped + invalid_file.csv
        assert "notes.txt" not in names
        assert "empty.csv" not in names
        assert stats.invalid == 1 and stats.invalid_reasons  # empty.csv

    def test_empty_dir_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            discover_files(base_path=str(tmp_path))

    def test_exclusive_sources(self, f5_dir):
        with pytest.raises(ValueError):
            discover_files(base_path=str(f5_dir), files=["x.csv"])
        with pytest.raises(ValueError):
            discover_files()

    def test_direct_files_sorted_and_checked(self, f5_dir):
        some = sorted(str(p) for p in f5_dir.glob("*.csv"))[:2]
        paths, _ = discover_files(files=list(reversed(some)))
        assert paths == some
        with pytest.raises(FileNotFoundError):
            discover_files(files=[str(f5_dir / "missing.csv")])


class TestMetadata:
    def test_time_extractor(self, f5_dir):
        paths, _ = discover_files(base_path=str(f5_dir))
        metas, errors = extract_metadata(paths, TimeMetadataExtractor())
        timed = [m for m in metas if m.start_time]
        assert len(timed) == 3
        assert [m.start_time for m in timed] == sorted(m.start_time for m in timed)
        assert timed[0].start_time == datetime(2023, 1, 1)
        assert timed[0].end_time == datetime(2023, 1, 1, 23, 59, 59)
        assert len(errors) == 1  # invalid_file.csv

    def test_sequence_validation_strategies(self):
        from time_series_loader_spark.sources.metadata import FileMeta

        contiguous = [
            FileMeta("a.csv", datetime(2023, 1, 1), datetime(2023, 1, 1, 23, 59, 59)),
            FileMeta("b.csv", datetime(2023, 1, 2), datetime(2023, 1, 2, 23, 59, 59)),
        ]
        gap_cfg = TimeSeriesConfig(strategy=ValidationStrategy.STRICT,
                                   max_allowed_gap=timedelta(seconds=0))
        issues = validate_file_sequence(contiguous, gap_cfg)
        assert len(issues) == 1 and issues[0].kind == "gap"
        assert issues[0].duration == timedelta(seconds=1)

        valid, msgs = is_valid_sequence(contiguous, gap_cfg)
        assert not valid and "gap" in msgs[0]

        lenient = TimeSeriesConfig(strategy=ValidationStrategy.LENIENT)
        assert is_valid_sequence(contiguous, lenient)[0]  # gaps OK in LENIENT

        overlapping = [
            FileMeta("a.csv", datetime(2023, 1, 1), datetime(2023, 1, 2, 12)),
            FileMeta("b.csv", datetime(2023, 1, 2), datetime(2023, 1, 3)),
        ]
        assert not is_valid_sequence(overlapping, lenient)[0]
        none_cfg = TimeSeriesConfig(strategy=ValidationStrategy.NONE)
        assert is_valid_sequence(overlapping, none_cfg)[0]

    def test_coverage_report(self):
        from time_series_loader_spark.sources.metadata import FileMeta

        metas = [
            FileMeta("a.csv", datetime(2023, 1, 1), datetime(2023, 1, 2)),
            FileMeta("b.csv", datetime(2023, 1, 3), datetime(2023, 1, 4)),
        ]
        rep = coverage_report(metas, TimeSeriesConfig())
        assert rep["span"] == timedelta(days=3)
        assert rep["covered"] == timedelta(days=2)
        assert rep["coverage_pct"] == pytest.approx(200 / 3)
        assert len(rep["gaps"]) == 1


class TestCsvLoad:
    def test_header_and_freeze(self, tmp_path):
        a = _write(tmp_path / "a.csv", "x;y;t\n1;2;01/01/2023 10:00\n")
        b = _write(tmp_path / "b.csv", "x;y;t\n3;4;01/01/2023 11:00\n")
        c = _write(tmp_path / "c.csv", "x;z\n5;6\n")  # mismatched schema
        assert read_header(a) == ["x", "y", "t"]
        ok, rejects = validate_headers([a, b, c], ";", "utf-8")
        assert ok == [a, b]
        assert "schema_mismatch" in rejects[c]

    def test_clean_column_name(self):
        naming = ColumnNamingConfig(clean_names=True, rename_map={"Value": "V"})
        assert clean_column_name(" Type1 SubType - Column1 - Value ", naming) == "V"
        assert clean_column_name("Extra - Data", naming) == "Data"
        assert clean_column_name("plain", naming) == "plain"

    def test_f2_load_concat_sort(self, spark, tmp_path):
        # F2: two files, prefixed headers, %d/%m/%Y %H:%M timestamps
        hdr = "Type1 SubType - Column1 - Value;Type1 SubType - Time;Extra - Data"
        f1 = _write(
            tmp_path / "f1.csv",
            f"{hdr}\n10;01/01/2023 11:00;x\n11;01/01/2023 10:00;y\n",
        )
        f2 = _write(
            tmp_path / "f2.csv",
            f"{hdr}\n12;01/01/2023 09:00;z\n13;01/01/2023 12:00;w\n",
        )
        df = load_csv_timeseries(
            spark,
            [f1, f2],
            LoadingConfig(timestamp_column="Time"),
            ColumnNamingConfig(clean_names=True),
        )
        assert set(df.columns) >= {"Value", "Time", "Data", "source_file"}
        rows = df.collect()
        times = [r["Time"] for r in rows]
        assert times == sorted(times)  # O1 global sort
        assert times[0] == datetime(2023, 1, 1, 9)
        assert rows[0]["Value"] == 12.0  # P1 numeric coercion
        assert rows[0]["Data"] is None  # string coerced → null (F1 semantics)
        assert rows[0]["source_file"].endswith("f2.csv")

    def test_coercion_off_keeps_strings(self, spark, tmp_path):
        f1 = _write(tmp_path / "a.csv", "v;t\n1;01/01/2023 10:00\n")
        df = load_csv_timeseries(
            spark, [f1], LoadingConfig(timestamp_column="t", coerce_numeric=False)
        )
        assert dict(df.dtypes)["v"] == "string"
