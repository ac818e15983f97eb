"""Near-degenerate testdata: the emptiness-edge SF the two gate scales
never exercise.

CLAUDE.md's sweep rule exists because emptiness bugs are SF-dependent —
but sf0.001 and sf0.01 are both tiny-yet-POPULATED, so every
"first/last/only row", "empty group", "NULLIF(n, 0)" edge in the 365
oracle pairs is structurally unreachable at the gate scales (holt's
n_err=0 edge was shipped fixed-but-untested for exactly this reason).
This tool slices the sf0.001 parquet into a schema-identical directory
where those edges are the COMMON case:

- region/nation: copied verbatim (fixed dims — joins stay populated);
- customer 3 / supplier 2 / part 2 rows;
- orders: 1 row, rewritten to reference a kept customer;
- lineitem: the 2 first rows, rewritten to the kept order/part/supplier
  keys so the single order has line items (referential integrity holds);
- events: 1 row;
- documents: EMPTY (0 rows, schema preserved) — every dedup/text/
  similarity-over-docs query must produce the same empty-or-aggregate
  result on both engines;
- embeddings: 1 row — pair/knn queries see a single vector (no pairs).

Slices, not synthesis: every kept row is a real driver-generated row,
so value distributions and physical types are exactly the gate data's.

    python tools/make_degenerate_sf.py          # -> .scaledata/sfdegen
    SPARK_GRAFT_SF_DIR=.scaledata/sfdegen python tools/verify_oracle.py
"""

from __future__ import annotations

import argparse
import os
import shutil

import pyarrow as pa
import pyarrow.parquet as pq


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default="/root/testdata/sf0.001")
    ap.add_argument("--out", default=".scaledata/sfdegen")
    ns = ap.parse_args()
    os.makedirs(ns.out, exist_ok=True)

    def load(t: str) -> pa.Table:
        return pq.read_table(os.path.join(ns.base, f"{t}.parquet"))

    def write(t: str, tbl: pa.Table) -> None:
        pq.write_table(tbl, os.path.join(ns.out, f"{t}.parquet"), compression="snappy")
        print(f"{t}: {tbl.num_rows} rows")

    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(ns.base, f"{t}.parquet"), os.path.join(ns.out, f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dim)")

    cust = load("customer").slice(0, 3)
    supp = load("supplier").slice(0, 2)
    part = load("part").slice(0, 2)
    write("customer", cust)
    write("supplier", supp)
    write("part", part)

    keep_cust = cust.column("c_custkey")[0].as_py()
    orders = load("orders").slice(0, 1)
    orders = orders.set_column(
        orders.schema.get_field_index("o_custkey"),
        orders.schema.field("o_custkey"),
        pa.array([keep_cust], type=orders.schema.field("o_custkey").type),
    )
    write("orders", orders)

    keep_order = orders.column("o_orderkey")[0].as_py()
    li = load("lineitem").slice(0, 2)
    n = li.num_rows

    def overwrite(tbl: pa.Table, col: str, values: list) -> pa.Table:
        i = tbl.schema.get_field_index(col)
        return tbl.set_column(
            i, tbl.schema.field(col), pa.array(values, type=tbl.schema.field(col).type)
        )

    li = overwrite(li, "l_orderkey", [keep_order] * n)
    li = overwrite(
        li, "l_partkey", [part.column("p_partkey")[i % 2].as_py() for i in range(n)]
    )
    li = overwrite(
        li, "l_suppkey", [supp.column("s_suppkey")[i % 2].as_py() for i in range(n)]
    )
    write("lineitem", li)

    write("events", load("events").slice(0, 1))
    write("documents", load("documents").slice(0, 0))  # EMPTY, schema kept
    write("embeddings", load("embeddings").slice(0, 1))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
