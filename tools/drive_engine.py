"""Drive the engine exactly as its two real consumers do:
(1) the driver contract: entry(spark) / queries()/oracle_sql();
(2) an ODF coordinator: execute_transform over a ledger parquet."""
import sys, os, tempfile
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# --- consumer 1: the driver contract ---------------------------------------
from pyspark.sql import SparkSession

spark = (
    SparkSession.builder.master("local[8]")
    .appName("verify-drive")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")

import __spark_entry__ as E

df = E.entry(spark)
print("== entry() flagship result ==")
df.show(10, truncate=False)
qs, os_ = E.queries(), E.oracle_sql()
print(f"queries: {len(qs)}  oracles: {len(os_)}  (rows-only: {sorted(set(qs)-set(os_))})")

# --- consumer 2: ODF coordinator lifecycle ---------------------------------
import pyarrow as pa, pyarrow.parquet as pq
from kamu_engine_datafusion_spark import (
    DatasetVocabulary, Engine, OffsetInterval, SqlQueryStep,
    TransformRequest, TransformRequestInput, Watermark, InvalidQueryError,
)

tmp = tempfile.mkdtemp(prefix="odf-verify-")
ledger = os.path.join(tmp, "cities.parquet")
utc = timezone.utc
tbl = pa.table({
    "offset": pa.array([0, 1, 2], pa.int64()),
    "op": pa.array([0, 0, 0], pa.int32()),
    "system_time": pa.array([datetime(2023, 1, 1, tzinfo=utc)] * 3,
                            pa.timestamp("ms", "UTC")),
    "event_time": pa.array([datetime(2023, 1, 1, tzinfo=utc)] * 3,
                           pa.timestamp("ms", "UTC")),
    "city": pa.array(["vancouver", "seattle", "kyiv"]),
    "population": pa.array([675000, 733000, 2884000], pa.int64()),
})
pq.write_table(tbl, ledger)

out_path = os.path.join(tmp, "result.parquet")
req = TransformRequest(
    dataset_alias="bar",
    system_time=datetime(2023, 2, 1, tzinfo=utc),
    next_offset=0,
    vocab=DatasetVocabulary(),
    transform=[SqlQueryStep(
        query="SELECT event_time, city, population + 100 as population FROM foo")],
    inputs=[TransformRequestInput(
        dataset_alias="foo", query_alias="foo", schema_file=ledger,
        data_paths=[ledger], offset_interval=OffsetInterval(0, 2),
        explicit_watermarks=[Watermark(datetime(2023, 1, 2, tzinfo=utc),
                                       datetime(2023, 1, 1, tzinfo=utc))],
    )],
    new_data_path=out_path,
)
eng = Engine(spark)
resp = eng.execute_transform(req)
print("== execute_transform response ==")
print(resp)
pf = pq.ParquetFile(out_path)
print("== output parquet schema ==")
print(pf.schema_arrow)
print(pq.read_table(out_path).to_pandas())
print("encodings:", {pf.schema_arrow.names[i]: pf.metadata.row_group(0).column(i).encodings
                     for i in range(len(pf.schema_arrow.names))})

# --- probes -----------------------------------------------------------------
# P1: invalid SQL -> structured InvalidQueryError, not a crash
try:
    req.transform = [SqlQueryStep(query="SELECT bogus syntax FROM FROM")]
    eng.execute_transform(req)
    print("P1 FAIL: no error raised")
except InvalidQueryError as e:
    print("P1 OK InvalidQueryError:", str(e).splitlines()[0][:90])

# P2: missing event_time -> InvalidQueryError
try:
    req.transform = [SqlQueryStep(query="SELECT city FROM foo")]
    eng.execute_transform(req)
    print("P2 FAIL: no error raised")
except InvalidQueryError as e:
    print("P2 OK InvalidQueryError:", str(e).splitlines()[0][:90])

# P3: empty result -> 0-row file, no offset interval, watermark still set
req.transform = [SqlQueryStep(
    query="SELECT event_time, city, population FROM foo WHERE city = 'mumbai'")]
req.new_data_path = os.path.join(tmp, "empty.parquet")
resp = eng.execute_transform(req)
print("P3 empty-result response:", resp,
      "rows:", pq.ParquetFile(req.new_data_path).metadata.num_rows)

# P4: non-zero start offset + multi-step chain
req.transform = [
    SqlQueryStep(query="SELECT event_time, city, population + 100 as population FROM foo",
                 alias="a"),
    SqlQueryStep(query="SELECT event_time, city, population + 50 as population FROM a"),
]
req.next_offset = 10
req.new_data_path = os.path.join(tmp, "chain.parquet")
resp = eng.execute_transform(req)
print("P4 chained response:", resp)
print(pq.read_table(req.new_data_path).to_pandas())

# P5: raw query entry point
from kamu_engine_datafusion_spark import RawQueryRequest, execute_raw_query
rq = RawQueryRequest(
    input_data_paths=[ledger],
    transform=[SqlQueryStep(query="SELECT city, population * 2 AS pop2 FROM input")],
    output_data_path=os.path.join(tmp, "raw.parquet"),
)
print("P5 raw query:", execute_raw_query(spark, rq))
print(pq.read_table(rq.output_data_path).to_pandas())
print("ALL DRIVES COMPLETE")
