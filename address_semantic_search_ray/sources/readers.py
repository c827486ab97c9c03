"""Input readers (SURVEY.md §2.1 S1-S3).

- S1 address-file reader: UTF-8 text, one address per line
  (``misc/ImportAddress.java:75-134`` — its 40k-line batching is Ray Data's
  block/batch machinery here);
- S2 semicolon format: ``省;市;区;详细地址`` concatenated before interpret
  (``misc/ImportAddress.java:26-32``);
- S3 quoted-CSV regression reader: 7 fields
  ``"order","prov","city","district","detail","MM/dd/yyyy HH:mm:ss","gridId"``,
  outer quotes stripped, split on ``","``, date defaulting to 1900-01-01 on
  parse failure (``misc/RegressionTestImportWLData.java:96-131``).
"""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa

import ray.data as rd

_DEFAULT_TS = datetime(1900, 1, 1)


def read_address_lines(path: str):
    """S1: one address per line -> Dataset(text)."""
    return rd.read_text(path)


def semicolon_to_text(batch: pa.Table, column: str = "text") -> pa.Table:
    """S2: '省;市;区;详细' -> concatenated address text (vectorized)."""
    import pyarrow.compute as pc

    joined = pc.replace_substring(batch.column(column), ";", "")
    return batch.set_column(batch.schema.get_field_index(column), column, joined)


def parse_regression_line(line: str) -> dict | None:
    """S3 line parser, faithful to the reference's strip-quotes + '","' split."""
    line = line.strip()
    if len(line) < 2 or not line.startswith('"') or not line.endswith('"'):
        return None
    fields = line[1:-1].split('","')
    if len(fields) != 7:
        return None
    order_no, prov, city, district, detail, ts_str, grid_id = fields
    try:
        ts = datetime.strptime(ts_str, "%m/%d/%Y %H:%M:%S")
    except ValueError:
        ts = _DEFAULT_TS
    return {
        "order_no": order_no,
        "text": prov + city + district + detail,
        "ts": ts,
        "grid_id": grid_id,
    }


def regression_lines_batch(batch: pa.Table) -> pa.Table:
    rows = [r for r in (parse_regression_line(t) for t in batch.column("text").to_pylist())
            if r is not None]
    return pa.table({
        "order_no": pa.array([r["order_no"] for r in rows], pa.string()),
        "text": pa.array([r["text"] for r in rows], pa.string()),
        "ts": pa.array([r["ts"] for r in rows], pa.timestamp("us")),
        "grid_id": pa.array([r["grid_id"] for r in rows], pa.string()),
    })


def read_regression_csv(path: str):
    """S3: quoted-CSV regression file -> Dataset(order_no, text, ts, grid_id)."""
    return rd.read_text(path).map_batches(regression_lines_batch, batch_format="pyarrow")


TRANSCRIPT_COLUMNS = ("conv_id", "turn_idx", "role", "text", "tool", "ts")


def read_transcripts_jsonl(path: str):
    """Transcript source from JSONL (one turn object per line) — the common
    conversational-data interchange format — normalized to the canonical F2
    schema (conv_id:str, turn_idx:int32, role:str, text:str, tool:str|null,
    ts:timestamp[us]); missing tool/ts become null, ts accepts ISO-8601
    strings or epoch microseconds."""

    def normalize(batch: pa.Table) -> pa.Table:
        def col(name, default_type):
            if name in batch.column_names:
                return batch.column(name)
            return pa.nulls(batch.num_rows, default_type)

        ts = col("ts", pa.timestamp("us"))
        if pa.types.is_integer(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        elif pa.types.is_string(ts.type):
            # ISO-8601: a zone-less column parses via the naive cast
            # (fractional seconds included); a zone-bearing column ('Z' or
            # offsets) via the UTC cast, normalized to naive UTC wall time.
            # A column MIXING zoned and zone-less strings is not supported
            # (Arrow casts are all-or-nothing) and raises ArrowInvalid.
            try:
                ts = ts.cast(pa.timestamp("us"))
            except pa.ArrowInvalid:
                ts = ts.cast(pa.timestamp("us", tz="UTC")) \
                    .cast(pa.timestamp("us"))
        elif pa.types.is_timestamp(ts.type):
            ts = ts.cast(pa.timestamp("us"))
        return pa.table({
            "conv_id": col("conv_id", pa.string()).cast(pa.string()),
            "turn_idx": col("turn_idx", pa.int64()).cast(pa.int32()),
            "role": col("role", pa.string()).cast(pa.string()),
            "text": col("text", pa.string()).cast(pa.string()),
            "tool": col("tool", pa.string()).cast(pa.string()),
            "ts": ts,
        })

    return rd.read_json(path).map_batches(normalize, batch_format="pyarrow")
