"""Derive an sf1 dataset (10× sf0.1) for scale-evidence runs.

The driver ships sf0.001/0.01/0.1 only (TESTDATA.md, read-only). For the
10× headline run (VERDICT r3 #7) we derive sf1 by concatenating 10
key-shifted copies of every sf0.1 table into ./testdata_sf1 (gitignored):

- every synthetic key column is shifted by copy_idx × stride (stride =
  next power of ten above the column's max), consistently across tables —
  so orders⋈lineitem⋈customer referential integrity holds in every copy;
- non-key columns are byte-identical, so value distributions (and
  therefore selectivities) are preserved, and the duplicated documents /
  embeddings corpus is a deliberate dup-heavy stress profile for the
  dedup/similarity tier (block sizes ×10 ⇒ pair work ×100 — exactly what
  the triangle caps exist for);
- pyarrow read/concat/write preserves physical types exactly, including
  the INT64 TIMESTAMP(NANOS) `events.ts` the readers special-case.

Deterministic (no RNG). Usage:
python scripts/make_sf1.py [src_dir] [out_dir] [copies]
(copies defaults to 10; e.g. 30 from sf0.1 yields an sf3 for scaling curves)
"""

from __future__ import annotations

import os
import sys

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

#: key columns to shift, per table (every other column is copied verbatim)
KEYS = {
    "region": [],
    "nation": [],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "orders": ["o_orderkey", "o_custkey"],
    "lineitem": ["l_orderkey", "l_partkey", "l_suppkey"],
    "events": ["event_id", "user_id"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
}

#: key families must share one stride so cross-table references line up
FAMILY = {
    "c_custkey": "cust",
    "o_custkey": "cust",
    "user_id": "cust",
    "o_orderkey": "order",
    "l_orderkey": "order",
    "s_suppkey": "supp",
    "l_suppkey": "supp",
    "p_partkey": "part",
    "l_partkey": "part",
    "event_id": "event",
    "doc_id": "doc",
    "vec_id": "vec",
}


def _stride(maxval: int) -> int:
    s = 10
    while s <= maxval:
        s *= 10
    return s


def main() -> int:
    src = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "testdata_sf1"
    )
    copies = int(sys.argv[3]) if len(sys.argv) > 3 else 10
    os.makedirs(out, exist_ok=True)

    # one stride per key family, from the max over every column in it
    fam_max: dict[str, int] = {}
    tables: dict[str, pa.Table] = {}
    for name, keys in KEYS.items():
        t = pq.read_table(os.path.join(src, f"{name}.parquet"))
        tables[name] = t
        for k in keys:
            fam = FAMILY[k]
            m = pc.max(t[k]).as_py()
            fam_max[fam] = max(fam_max.get(fam, 0), int(m))
    strides = {fam: _stride(m) for fam, m in fam_max.items()}

    for name, keys in KEYS.items():
        t = tables[name]
        if not keys:  # pure dims: one copy, unchanged
            pq.write_table(t, os.path.join(out, f"{name}.parquet"))
            print(f"{name}: {t.num_rows} rows (dim, unshifted)")
            continue
        # stream one shifted copy per row group: memory stays O(one copy)
        # regardless of `copies` (copies=1000 would need ~90 GB if
        # concatenated), and readers parallelize over row groups anyway.
        with pq.ParquetWriter(
            os.path.join(out, f"{name}.parquet"), t.schema
        ) as writer:
            for i in range(copies):
                shifted = t
                for k in keys:
                    off = i * strides[FAMILY[k]]
                    col = pc.add(
                        shifted[k], pa.scalar(off, type=shifted.schema.field(k).type)
                    )
                    shifted = shifted.set_column(
                        shifted.schema.get_field_index(k),
                        shifted.schema.field(k),
                        col,
                    )
                writer.write_table(shifted)
        print(f"{name}: {t.num_rows} -> {t.num_rows * copies} rows")
    print(f"wrote {out}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
