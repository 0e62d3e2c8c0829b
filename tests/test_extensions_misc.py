"""Extension registry, pipeline builder, column-set algebra, error ledger,
in-memory buffers, multi-format loading, timestamp parsing."""

from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from time_series_loader_spark.config import LoadingConfig, TimeSeriesConfig, ValidationStrategy
from time_series_loader_spark.errors import ErrorLedger, ErrorSeverity
from time_series_loader_spark.functions.colsets import (
    columns_in_exactly_one,
    columns_intersection,
    columns_union,
)
from time_series_loader_spark.functions.timeparse import parse_timestamp_multi
from time_series_loader_spark.plans.pipeline import (
    ExtensionRegistry,
    Pipeline,
    create_pipeline,
    update_config,
)


class TestColsets:
    LISTS = [["a", "b", "c"], ["b", "c", "d"], ["c", "e"]]

    def test_union(self):
        assert columns_union(self.LISTS) == ["a", "b", "c", "d", "e"]

    def test_intersection(self):
        assert columns_intersection(self.LISTS) == ["c"]

    def test_exactly_one(self):
        assert columns_in_exactly_one(self.LISTS) == ["a", "d", "e"]

    def test_empty(self):
        assert columns_union([]) == []
        assert columns_intersection([]) == []


class TestPipeline:
    def test_ordered_steps_compose_lazily(self, spark):
        df = spark.range(10).withColumnRenamed("id", "x")
        p = create_pipeline(
            ("double", lambda d: d.withColumn("x", F.col("x") * 2)),
            ("filter", lambda d: d.where(F.col("x") >= 10)),
        )
        assert p.names() == ["double", "filter"]
        out = p.run(df)
        assert out.count() == 5

    def test_insert_remove(self, spark):
        p = Pipeline()
        p.add("a", lambda d: d).add("c", lambda d: d)
        p.insert(1, "b", lambda d: d)
        assert p.names() == ["a", "b", "c"]
        p.remove("b")
        assert p.names() == ["a", "c"]

    def test_registry_slots(self):
        r = ExtensionRegistry()
        r.register("metadata_extractor", "EXT").register("custom_thing", 42)
        r.register("post_processing_hook", "H1").register("post_processing_hook", "H2")
        assert r.get("metadata_extractor") == "EXT"
        assert r.get("custom_thing") == 42
        assert r.hooks == ["H1", "H2"]

    def test_update_config(self):
        cfg = TimeSeriesConfig()
        cfg2 = update_config(cfg, strategy=ValidationStrategy.STRICT,
                             max_allowed_gap=timedelta(hours=1))
        assert cfg2.strategy is ValidationStrategy.STRICT
        assert cfg.strategy is ValidationStrategy.LENIENT  # original untouched
        with pytest.raises(ValueError, match="unknown config fields"):
            update_config(cfg, nope=1)


class TestErrorLedger:
    def test_severity_counts_and_filtering(self, tmp_path):
        led = ErrorLedger()
        led.record(ErrorSeverity.WARNING, "w_type", "warn msg", file="f1.csv")
        led.record(ErrorSeverity.ERROR, "e_type", "err msg", file="f1.csv")
        led.record(ErrorSeverity.INFO, "i_type", "info msg")
        rep = led.report()
        assert rep["total_errors"] == 3
        assert rep["by_severity"] == {"WARNING": 1, "ERROR": 1, "INFO": 1}
        assert rep["by_file"] == {"f1.csv": 2}

        j = tmp_path / "errs.json"
        led.export_json(str(j), severities={ErrorSeverity.ERROR})
        import json

        data = json.loads(j.read_text())
        assert len(data) == 1 and data[0]["error_type"] == "e_type"

        c = tmp_path / "errs.csv"
        led.export_csv(str(c))
        assert len(c.read_text().strip().splitlines()) == 4  # header + 3

    def test_critical_raises(self):
        led = ErrorLedger()
        with pytest.raises(RuntimeError, match="CRITICAL"):
            led.record(ErrorSeverity.CRITICAL, "boom", "fatal")
        assert len(led.errors) == 1


class TestBuffers:
    def test_load_buffers_end_to_end(self, spark):
        from time_series_loader_spark.plans.loader import TimeSeriesLoader

        b1 = b"v;Time\n1;01/01/2023 10:00\n2;01/01/2023 11:00\n"
        b2 = b"v;Time\n3;01/01/2023 09:00\n"
        df = TimeSeriesLoader.from_buffers(
            spark,
            [("upload1.csv", b1), ("upload2.csv", b2)],
            loading=LoadingConfig(timestamp_column="Time"),
        )
        rows = df.collect()
        assert len(rows) == 3
        assert rows[0]["Time"] == datetime(2023, 1, 1, 9)
        assert rows[0]["source_file"] == "upload2.csv"
        assert rows[0]["v"] == 3.0

    def test_empty_buffer_rejected(self, spark):
        from time_series_loader_spark.sources.memory import validate_buffers

        ok, rejects = validate_buffers([("a.csv", b"x;y\n1;2\n"), ("e.csv", b"")])
        assert len(ok) == 1 and rejects == {"e.csv": "empty_content"}

    def test_schema_freeze_across_buffers(self, spark):
        from time_series_loader_spark.sources.memory import load_buffers

        with pytest.raises(ValueError, match="contract"):
            load_buffers(
                spark,
                [("a.csv", b"x;y\n1;2\n"), ("b.csv", b"x;z\n1;2\n")],
            )


class TestMultiFormat:
    def test_parquet_roundtrip_through_loader(self, spark, tmp_path):
        from time_series_loader_spark.sources.csv import load_csv_timeseries

        src = spark.createDataFrame(
            [(datetime(2023, 1, 1, h), float(h)) for h in range(4)],
            "ts TIMESTAMP, value DOUBLE",
        )
        p = str(tmp_path / "data.parquet")
        src.coalesce(1).write.parquet(p)
        df = load_csv_timeseries(
            spark,
            [p],
            LoadingConfig(format="parquet", timestamp_column="ts"),
        )
        rows = df.collect()
        assert len(rows) == 4
        assert dict(df.dtypes)["value"] == "double"  # typed cols untouched
        assert rows[0]["ts"] == datetime(2023, 1, 1, 0)


class TestTimestampParse:
    def test_multi_format_coalesce(self, spark):
        df = spark.createDataFrame(
            [("01/02/2023 10:30",), ("2023-02-01 10:30:00",), ("garbage",)],
            "s STRING",
        )
        out = df.select(
            parse_timestamp_multi(
                "s", "dd/MM/yyyy HH:mm", ("yyyy-MM-dd HH:mm:ss",)
            ).alias("t")
        ).collect()
        assert out[0]["t"] == datetime(2023, 2, 1, 10, 30)  # DMY primary
        assert out[1]["t"] == datetime(2023, 2, 1, 10, 30)  # fallback
        assert out[2]["t"] is None  # null, not error

    def test_date_order_families(self, spark):
        df = spark.createDataFrame([("02/03/2023 00:00",)], "s STRING")
        dmy = df.select(parse_timestamp_multi("s", date_order="DMY").alias("t")).collect()[0]["t"]
        mdy = df.select(parse_timestamp_multi("s", date_order="MDY").alias("t")).collect()[0]["t"]
        assert dmy == datetime(2023, 3, 2)
        assert mdy == datetime(2023, 2, 3)


def test_custom_validation_strategy():
    from time_series_loader_spark.sources.metadata import FileMeta
    from time_series_loader_spark.sources.validation import is_valid_sequence

    calls = []

    def validator(metas):
        calls.append(len(metas))
        return False, ["custom says no"]

    cfg = TimeSeriesConfig(strategy=ValidationStrategy.CUSTOM, validator=validator)
    ok, msgs = is_valid_sequence([FileMeta("a.csv")], cfg)
    assert not ok and msgs == ["custom says no"] and calls == [1]

    with pytest.raises(ValueError, match="CUSTOM strategy requires"):
        is_valid_sequence([], TimeSeriesConfig(strategy=ValidationStrategy.CUSTOM))


def test_lenient_parse_udf(spark):
    from time_series_loader_spark.functions.timeparse import lenient_parse_udf

    df = spark.createDataFrame(
        [("01/02/2023",), ("2023-06-07 10:30:00",), ("garbage",), (None,)],
        "s STRING",
    )
    out = df.select(lenient_parse_udf("DMY")(F.col("s")).alias("t")).collect()
    assert out[0]["t"] == datetime(2023, 2, 1)   # dayfirst
    assert out[1]["t"] == datetime(2023, 6, 7, 10, 30)
    assert out[2]["t"] is None
    assert out[3]["t"] is None
