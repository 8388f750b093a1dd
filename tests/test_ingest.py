"""Ingest path: CSV/NDJSON sources → preprocessing SQL → ledger append
with continuing offsets, then a transform over the ingested ledger."""

from __future__ import annotations

import glob
from datetime import datetime, timezone

import pyarrow.parquet as pq

from kamu_engine_datafusion_spark.plans.types import SqlQueryStep
from kamu_engine_datafusion_spark.sources.ingest import (
    ingest_batch,
    read_csv_source,
    read_ndjson_source,
    read_orc_source,
)
from kamu_engine_datafusion_spark.streaming.incremental import (
    IncrementalRunner,
    LedgerInput,
)

UTC = timezone.utc


def test_csv_ingest_appends_with_continuing_offsets(spark, tmp_path):
    csv1 = tmp_path / "batch1.csv"
    csv1.write_text("when,city,population\n2023-01-01,vancouver,675000\n2023-01-01,kyiv,2884000\n")
    csv2 = tmp_path / "batch2.csv"
    csv2.write_text("when,city,population\n2023-01-02,lyon,520000\n")

    ledger = str(tmp_path / "ledger")
    steps = [
        SqlQueryStep(
            query="SELECT CAST(`when` AS TIMESTAMP) AS event_time, city, "
            "population FROM input"
        )
    ]
    schema = "`when` STRING, city STRING, population LONG"

    n1 = ingest_batch(
        spark,
        read_csv_source(spark, [str(csv1)], schema=schema),
        ledger,
        datetime(2023, 2, 1, tzinfo=UTC),
        preprocess=steps,
    )
    n2 = ingest_batch(
        spark,
        read_csv_source(spark, [str(csv2)], schema=schema),
        ledger,
        datetime(2023, 2, 2, tzinfo=UTC),
        preprocess=steps,
    )
    assert (n1, n2) == (2, 1)
    parts = sorted(glob.glob(f"{ledger}/*.parquet"))
    assert len(parts) == 2
    all_rows = pq.read_table(parts).sort_by("offset").to_pydict()
    assert all_rows["offset"] == [0, 1, 2]  # offsets continue across batches
    assert all_rows["city"] == ["vancouver", "kyiv", "lyon"]
    assert all_rows["op"] == [0, 0, 0]

    # the ingested ledger is immediately transformable incrementally
    runner = IncrementalRunner(
        spark=spark,
        transform=[
            SqlQueryStep(
                query="SELECT event_time, city, population FROM src "
                "WHERE population > 600000"
            )
        ],
        inputs=[LedgerInput(dataset_alias="src", query_alias="src", ledger_dir=ledger)],
        output_dir=str(tmp_path / "out"),
    )
    resp = runner.tick(datetime(2023, 2, 3, tzinfo=UTC))
    assert resp.new_offset_interval.end == 1  # vancouver, kyiv pass


def test_ndjson_ingest(spark, tmp_path):
    nd = tmp_path / "events.ndjson"
    nd.write_text(
        '{"when": "2023-01-01T00:00:00", "kind": "click"}\n'
        '{"when": "2023-01-01T01:00:00", "kind": "view"}\n'
    )
    ledger = str(tmp_path / "ledger")
    n = ingest_batch(
        spark,
        read_ndjson_source(spark, [str(nd)], schema="`when` STRING, kind STRING"),
        ledger,
        datetime(2023, 2, 1, tzinfo=UTC),
        preprocess=[
            SqlQueryStep(
                query="SELECT CAST(`when` AS TIMESTAMP) AS event_time, kind FROM input"
            )
        ],
    )
    assert n == 2
    part = glob.glob(f"{ledger}/*.parquet")[0]
    s = pq.ParquetFile(part).schema_arrow
    assert str(s.field("event_time").type) == "timestamp[ms, tz=UTC]"


def test_orc_ingest(spark, tmp_path):
    """ORC source → preprocess → ledger append, same lifecycle as CSV."""
    orc_dir = str(tmp_path / "src_orc")
    spark.createDataFrame(
        [("2023-03-01", "osaka", 2691000)],
        "`when` STRING, city STRING, population LONG",
    ).write.orc(orc_dir)

    ledger = str(tmp_path / "ledger")
    steps = [
        SqlQueryStep(
            query="SELECT CAST(`when` AS TIMESTAMP) AS event_time, city, "
            "population FROM input"
        )
    ]
    n = ingest_batch(
        spark,
        read_orc_source(spark, [orc_dir]),
        ledger,
        datetime(2023, 3, 2, tzinfo=UTC),
        preprocess=steps,
    )
    assert n == 1
    part = sorted(glob.glob(ledger + "/*.parquet"))[0]
    d = pq.read_table(part).to_pydict()
    assert d["city"] == ["osaka"] and d["offset"] == [0]
