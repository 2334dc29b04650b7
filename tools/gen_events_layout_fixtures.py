#!/usr/bin/env python3
"""Regenerate fixtures/events_layouts/: two tiny events.parquet files with
the SAME logical rows but the two physical `ts` layouts the driver's
testdata has shipped with — TIMESTAMP(NANOS) (pre-r8) and timestamp[us]
(r8+). TablesSpec loads both through Tables.events so a future testdata
regeneration that changes the physical type again fails one named
assertion instead of 26 opaque analysis errors.

Deterministic: fixed rows, fixed schema, no timestamps of "now".
"""
import os
import sys

import pyarrow as pa
import pyarrow.parquet as pq

OUT = sys.argv[1] if len(sys.argv) > 1 else "fixtures/events_layouts"

# epoch micros for 2024-01-01T00:00:00Z .. +3 rows, 1h apart
BASE_US = 1704067200000000
ROWS = {
    "event_id": [1, 2, 3, 4],
    "user_id": [10, 11, 10, 12],
    "event_type": ["view", "click", "view", "purchase"],
    "ts_us": [BASE_US + i * 3600000000 for i in range(4)],
    "amount": [1.5, 2.5, 3.5, 4.5],
    "props": ['{"k":1}', '{"k":2}', '{"k":3}', '{"k":4}'],
}


def write(path, ts_type, ts_vals):
    schema = pa.schema([
        ("event_id", pa.int64()),
        ("user_id", pa.int64()),
        ("event_type", pa.string()),
        ("ts", ts_type),
        ("amount", pa.float64()),
        ("props", pa.string()),
    ])
    t = pa.table({
        "event_id": ROWS["event_id"],
        "user_id": ROWS["user_id"],
        "event_type": ROWS["event_type"],
        "ts": ts_vals,
        "amount": ROWS["amount"],
        "props": ROWS["props"],
    }, schema=schema)
    pq.write_table(t, path)
    print("wrote", path, "ts:", pq.ParquetFile(path).schema_arrow.field("ts").type)


os.makedirs(OUT, exist_ok=True)
write(os.path.join(OUT, "events_us.parquet"),
      pa.timestamp("us"), ROWS["ts_us"])
write(os.path.join(OUT, "events_ns.parquet"),
      pa.timestamp("ns"), [v * 1000 for v in ROWS["ts_us"]])
