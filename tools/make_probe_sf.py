"""Generate a PROBE-ONLY scaled copy of the testdata under /tmp.

The driver's round-end measurement runs at a larger, driver-generated
scale factor (sf1.0 in BENCH_r05.json: 10x sf0.1 row counts, one
single-row-group parquet per table).  That data is not present in the
sandbox, so this tool builds a *representative* 10x replica set from
sf0.1 for local before/after probing (bench_extra.py): each table is
replicated R times with key offsets; document text words are suffixed
with the replica index so replicas are unrelated (near-dup structure
per replica preserved, candidate counts scale ~linearly like the real
sf1.0 did).  Single row group per file to preserve the unsplittable-
scan property the real testdata has.

NOT part of any query, test, or the frozen bench defaults.  Usage:

  python tools/make_probe_sf.py [out_dir] [replicas]
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

SRC = "/root/testdata/sf0.1"


def _write(out_dir: str, name: str, table: pa.Table) -> None:
    pq.write_table(
        table, os.path.join(out_dir, f"{name}.parquet"),
        row_group_size=max(table.num_rows, 1), compression="snappy",
    )
    print(f"{name}: {table.num_rows} rows, 1 row group")


def _offset(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    return pc.add(col, pa.scalar(off, type=col.type))


def scale_simple(t: pa.Table, r: int, key_offsets: dict[str, int]) -> pa.Table:
    cols = {}
    for name in t.column_names:
        col = t.column(name)
        if name in key_offsets:
            col = _offset(col, r * key_offsets[name])
        cols[name] = col
    return pa.table(cols)


def mutate_text(col: pa.ChunkedArray, r: int) -> pa.Array:
    # suffix every word with the replica tag: replicas share NO
    # shingles with the base, so dup-pair structure scales linearly
    arr = col.combine_chunks()
    py = [
        None if v is None else " ".join(w + f"r{r}" for w in v.split())
        for v in arr.to_pylist()
    ]
    return pa.array(py, type=pa.string())


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/probedata_sf1"
    reps = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    os.makedirs(out_dir, exist_ok=True)

    docs = pq.read_table(os.path.join(SRC, "documents.parquet"))
    n_doc = docs.num_rows
    parts = []
    for r in range(reps):
        t = scale_simple(docs, r, {"doc_id": n_doc})
        if r:
            t = t.set_column(t.column_names.index("text"), "text",
                             mutate_text(docs.column("text"), r))
        parts.append(t)
    _write(out_dir, "documents", pa.concat_tables(parts))

    events = pq.read_table(os.path.join(SRC, "events.parquet"))
    n_ev = events.num_rows
    n_user = pc.max(events.column("user_id")).as_py() + 1
    _write(out_dir, "events", pa.concat_tables([
        scale_simple(events, r, {"event_id": n_ev, "user_id": n_user})
        for r in range(reps)
    ]))

    orders = pq.read_table(os.path.join(SRC, "orders.parquet"))
    n_ok = pc.max(orders.column("o_orderkey")).as_py() + 1
    n_ck = pc.max(orders.column("o_custkey")).as_py() + 1
    _write(out_dir, "orders", pa.concat_tables([
        scale_simple(orders, r, {"o_orderkey": n_ok, "o_custkey": n_ck})
        for r in range(reps)
    ]))

    lineitem = pq.read_table(os.path.join(SRC, "lineitem.parquet"))
    _write(out_dir, "lineitem", pa.concat_tables([
        scale_simple(lineitem, r, {"l_orderkey": n_ok})
        for r in range(reps)
    ]))

    customer = pq.read_table(os.path.join(SRC, "customer.parquet"))
    _write(out_dir, "customer", pa.concat_tables([
        scale_simple(customer, r, {"c_custkey": n_ck})
        for r in range(reps)
    ]))

    emb = pq.read_table(os.path.join(SRC, "embeddings.parquet"))
    n_vec = emb.num_rows
    _write(out_dir, "embeddings", pa.concat_tables([
        scale_simple(emb, r, {"vec_id": n_vec}) for r in range(reps)
    ]))

    for name in ("region", "nation", "supplier", "part"):
        src = os.path.join(SRC, f"{name}.parquet")
        if os.path.exists(src):
            _write(out_dir, name, pq.read_table(src))


if __name__ == "__main__":
    main()
