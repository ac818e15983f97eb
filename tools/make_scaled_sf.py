"""Deterministic scale-up of a driver testdata directory: sfX -> K*sfX.

The round driver ships sf0.001/0.01/0.1 only; the scale story has to be
*proved*, not asserted, so this tool manufactures an sf1 (or sf10)
directory from sf0.1 by writing K key-shifted replicas of every
SF-scaling table. The result is schema-identical parquet the whole
verify/bench stack can point at via SPARK_GRAFT_SF_DIR.

Replica design — chosen so per-query work scales the way a real corpus
would, not the way naive duplication would:

- region/nation: copied verbatim (fixed-size dims, like TPC-H).
- customer/supplier/part/orders/lineitem/events: replica r shifts every
  primary AND foreign key by r * (max_key + 1) of its home table, so
  referential integrity holds inside each replica and replicas never
  cross-join. Non-key payloads are kept verbatim: dates/amounts repeat,
  which only densifies time windows (the correct model for 10x traffic).
- documents: doc_id shifts; for r > 0 every 5th word (offset r mod 5)
  gets an alnum replica tag. Within a replica the near-dup structure is
  EXACTLY the base corpus's (both members of a near-dup pair perturb the
  same positions), so dup groups scale linearly; across replicas shingle
  overlap drops to ~0.1-0.25 Jaccard, below every registered threshold,
  so pair fan-out never goes quadratic in K. n_chars is recomputed.
- embeddings: vec_id shifts; label shifts by r*10 (a 10x corpus has more
  clusters, and label-blocked pair ops stay linear); for r > 0 the
  vector gets a per-replica signed permutation (an exact orthogonal
  transform: within-replica cosines are preserved bit-for-bit in the
  int-quantized pipeline's input space, cross-replica cosines collapse
  to ~N(0, 1/64) noise). Replica 0 is untouched, so the fixed query
  sets (vec_id < 10 etc.) still exist verbatim.

Determinism: numpy RNG seeded from (seed, replica) — no wall clock, no
global RNG. Output schema is cast to the base file's arrow schema so
physical types (int32 linenumbers, us timestamps, float lists) match.

Adversarial skew (--hot-key-pct p, p > 0): AFTER key-shifting, every
replica rewrites a deterministic p-fraction of orders.o_custkey to ONE
hot customer (base key 1) and p of lineitem.l_partkey to ONE hot part
(base key 1) — rows where row_index % round(1/p) == 0, so the hot key
owns exactly p of the fact table at every SF. Referential integrity
holds (key 1 exists in replica 0's dim), and the zipfian head this
manufactures is the shape that breaks non-salted shuffled joins at
100 TB: one reducer receives p × |fact| rows regardless of cluster
size. Used by tools/skew_bench.py to measure salted vs unsalted plans.
"""

from __future__ import annotations

import argparse
import os
import re
import shutil

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

TAG = re.compile(r"\S+")

KEY_OFFSETS = {
    # table -> [(column, home_table_for_offset)]
    "customer": [("c_custkey", "customer")],
    "supplier": [("s_suppkey", "supplier")],
    "part": [("p_partkey", "part")],
    "orders": [("o_orderkey", "orders"), ("o_custkey", "customer")],
    "lineitem": [
        ("l_orderkey", "orders"),
        ("l_partkey", "part"),
        ("l_suppkey", "supplier"),
    ],
    "events": [("event_id", "events.event_id"), ("user_id", "events.user_id")],
    "documents": [("doc_id", "documents")],
    "embeddings": [("vec_id", "embeddings")],
}

KEY_OF = {
    "customer": "c_custkey",
    "supplier": "s_suppkey",
    "part": "p_partkey",
    "orders": "o_orderkey",
    "documents": "doc_id",
    "embeddings": "vec_id",
}


def _offsets(base: str) -> dict[str, int]:
    """max_key + 1 for every home-table keyspace, read from footstats-
    cheap full scans of the key column only."""
    out: dict[str, int] = {}
    for t, key in KEY_OF.items():
        col = pq.read_table(os.path.join(base, f"{t}.parquet"), columns=[key])
        out[t] = int(np.max(col.column(0).to_numpy())) + 1
    ev = pq.read_table(
        os.path.join(base, "events.parquet"), columns=["event_id", "user_id"]
    )
    out["events.event_id"] = int(np.max(ev.column(0).to_numpy())) + 1
    out["events.user_id"] = int(np.max(ev.column(1).to_numpy())) + 1
    return out


def _perturb_text(text: str, r: int, stride: int = 5) -> str:
    """Tag every ``stride``-th word (offset r mod stride) with an alnum
    replica suffix. Alnum so whitespace/punct tokenizers keep the tag
    attached to the word instead of stripping it back to the original.

    Stride picks the cross-replica overlap regime. stride=5 (the sf1
    default) leaves 4-word untagged gaps, so same-residue replica pairs
    share the in-gap 3-gram shingles (~0.2 Jaccard) — fine at K=10
    (≤ 2 replicas per residue) but at K=100 there are 20 replicas per
    residue and the manufactured near-dup PAIR structure would grow
    ~K², which no real 10x corpus does. stride=3 puts a tagged word in
    EVERY 3-gram window, so cross-replica 3-shingle overlap is exactly
    0 and pair structure scales linearly in K — use it for sf10."""
    if not text:
        return text
    words = text.split(" ")
    res = r % stride
    tag = f"x{r}"
    for i in range(res, len(words), stride):
        if words[i]:
            words[i] = words[i] + tag
    return " ".join(words)


def _signed_perm(dims: int, seed: int, r: int) -> tuple[np.ndarray, np.ndarray]:
    rng = np.random.default_rng([seed, r])
    return rng.permutation(dims), rng.choice([-1.0, 1.0], size=dims).astype("float32")


# table -> (fk column, hot base key) rewritten under --hot-key-pct
HOT_KEYS = {"orders": ("o_custkey", 1), "lineitem": ("l_partkey", 1)}


def scale_table(
    base: str,
    out_dir: str,
    table: str,
    k: int,
    off: dict[str, int],
    seed: int,
    hot_key_pct: float = 0.0,
    tag_stride: int = 5,
) -> int:
    src = os.path.join(base, f"{table}.parquet")
    dst = os.path.join(out_dir, f"{table}.parquet")
    tbl = pq.read_table(src)
    schema = pa.schema([f.remove_metadata() for f in tbl.schema])
    tbl = tbl.cast(schema)
    total = 0
    with pq.ParquetWriter(dst, schema, compression="snappy") as w:
        for r in range(k):
            cols = {name: tbl.column(name) for name in schema.names}
            for key_col, home in KEY_OFFSETS.get(table, []):
                shift = r * off[home]
                arr = cols[key_col].to_numpy() + shift
                cols[key_col] = pa.array(arr)
            if hot_key_pct > 0 and table in HOT_KEYS:
                fk, hot = HOT_KEYS[table]
                stride = max(1, round(1.0 / hot_key_pct))
                arr = cols[fk].to_numpy().copy()
                arr[::stride] = hot  # base key 1 exists in replica 0's dim
                cols[fk] = pa.array(arr)
            if table == "documents" and r > 0:
                texts = [
                    _perturb_text(t, r, tag_stride) for t in cols["text"].to_pylist()
                ]
                cols["text"] = pa.array(texts)
                cols["n_chars"] = pa.array([len(t) for t in texts], type=pa.int64())
            if table == "embeddings":
                cols["label"] = pa.array(
                    cols["label"].to_numpy() + r * 10, type=pa.int32()
                )
                if r > 0:
                    mat = np.asarray(
                        cols["embedding"].combine_chunks().to_pylist(), dtype="float32"
                    )
                    perm, sign = _signed_perm(mat.shape[1], seed, r)
                    mat = mat[:, perm] * sign
                    cols["embedding"] = pa.array(list(mat))
            rep = pa.table({n: cols[n] for n in schema.names}).cast(schema)
            w.write_table(rep)
            total += rep.num_rows
    return total


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--base", default="/root/testdata/sf0.1")
    ap.add_argument("--out", default=".scaledata/sf1")
    ap.add_argument("--replicas", type=int, default=10)
    ap.add_argument("--seed", type=int, default=42)
    ap.add_argument(
        "--hot-key-pct",
        type=float,
        default=0.0,
        help="rewrite this fraction of orders.o_custkey / lineitem.l_partkey "
        "to ONE hot key (adversarial zipfian head for skew benchmarks)",
    )
    ap.add_argument(
        "--tag-stride",
        type=int,
        default=5,
        help="documents word-tag stride (see _perturb_text: 5 for K<=10, "
        "3 for K=100 so cross-replica shingle overlap is 0)",
    )
    ns = ap.parse_args()
    os.makedirs(ns.out, exist_ok=True)
    for t in ("region", "nation"):
        shutil.copyfile(
            os.path.join(ns.base, f"{t}.parquet"), os.path.join(ns.out, f"{t}.parquet")
        )
        print(f"{t}: copied (fixed dim)")
    off = _offsets(ns.base)
    for t in KEY_OFFSETS:
        n = scale_table(
            ns.base, ns.out, t, ns.replicas, off, ns.seed,
            ns.hot_key_pct, ns.tag_stride,
        )
        print(f"{t}: {n} rows ({ns.replicas} replicas)")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
