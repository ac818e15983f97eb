"""Streaming dedup-gate throughput bench: epoch latency vs store size.

    python tools/stream_bench.py --seed-keys 1000000 --epochs 8

The reference's consumer implies a 10 s micro-batch SLA
(/root/reference/Real_Time_Streaming/consumer/consumer_cassandra.py:266,
``processingTime='10 seconds'``): a gate whose per-epoch latency grows
with the STORE eventually outruns any trigger interval. Round 8 made
the gate's probe read bucket-pruned (KeyedUpsertSink.read_for_keys), so
the epoch's scan volume is (touched/n_buckets) x store instead of the
whole store; this harness produces the measured curve behind that
claim.

Protocol:

1. seed a band_key store with --seed-keys synthetic fingerprint keys
   (md5 hex tagged with a band index — the exact key shape
   minhash_band_keys persists), upserted in one epoch;
2. drive --epochs foreachBatch epochs of near_dedup_writer directly
   (the callable IS what writeStream dispatches; timing it measures
   the whole epoch body — shingle/minhash pass, pruned store probe,
   anti-joins, novel forward, store upsert — without the file-source
   polling jitter the e2e tests already cover);
3. each epoch's --batch-docs documents come from the sf0.1 documents
   table with every token epoch-tagged, so each epoch is all-novel
   (worst case: maximal store growth AND a full-size upsert per epoch);
4. report per-epoch seconds + store rows + touched buckets as JSON,
   for both the pruned probe (the shipped code) and --full-read
   (monkey-patched read()-based probe, the pre-round-8 plan) so the
   curve difference is measurable at the same store sizes.

Store growth per epoch = batch-docs x n_bands keys; the interesting
regime (batch << store) starts immediately with the 1M-key seed.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from etl_seattle_call_data_spark.session import get_spark
from etl_seattle_call_data_spark.sources.registry import load_table
from etl_seattle_call_data_spark.streaming.dedup_gate import near_dedup_writer
from etl_seattle_call_data_spark.streaming.sinks import KeyedUpsertSink


def seed_store(spark, store: KeyedUpsertSink, n_keys: int) -> None:
    keys = spark.range(n_keys).select(
        F.concat(
            (F.col("id") % 4).cast("string"), F.lit(":"), F.md5(F.col("id").cast("string"))
        ).alias("band_key"),
        # negative longs: disjoint from real doc ids AND type-compatible
        # with the documents table's BIGINT doc_id (the upsert unions
        # batch and store rows, so first_doc_id types must line up)
        (-F.col("id") - 1).alias("first_doc_id"),
    )
    store.upsert_batch(keys, epoch_id=0)


def epoch_batch(spark, sf_dir: str, n_docs: int, epoch: int):
    """n_docs documents with every token (epoch, doc)-tagged: each
    DOCUMENT's shingles are disjoint from every other document's and
    every other epoch's, so the gate sees a genuinely all-novel batch.
    (A plain epoch-level tag preserves the corpus's built-in near-dup
    pairs — both members get identical tags — and the within-batch
    single-linkage then drops ~70% of the batch, which is the gate
    working, not an all-novel workload.)"""
    docs = load_table(spark, sf_dir, "documents").limit(n_docs)
    tag = F.concat(F.lit(f" e{epoch}d"), F.col("doc_id").cast("string"), F.lit(" "))
    return docs.withColumn(
        "text", F.regexp_replace(F.col("text"), F.lit(" "), tag)
    )


def drive(spark, sf_dir: str, store_path: str, seed_keys: int, epochs: int,
          batch_docs: int, n_buckets: int, full_read: bool,
          compact_every: int = 0) -> list[dict]:
    if os.path.exists(store_path):
        shutil.rmtree(store_path)
    store = KeyedUpsertSink(store_path, key="band_key", n_buckets=n_buckets)
    t0 = time.perf_counter()
    seed_store(spark, store, seed_keys)
    print(f"# seeded {seed_keys} keys in {time.perf_counter()-t0:.1f}s "
          f"({n_buckets} buckets, full_read={full_read})", file=sys.stderr)
    if full_read:
        # pre-round-8 probe: read the WHOLE store each epoch
        store.read_for_keys = lambda keys_df: store.read(keys_df.sparkSession)

    forwarded: list[int] = []

    def write_unique(df, epoch_id):
        forwarded.append(df.count())

    writer = near_dedup_writer(store, write_unique)
    out = []
    store_rows = seed_keys
    for e in range(1, epochs + 1):
        batch = epoch_batch(spark, sf_dir, batch_docs, e)
        t0 = time.perf_counter()
        writer(batch, e)
        dt = time.perf_counter() - t0
        touched = len(
            {
                b
                for b, d in store._read_manifest().items()
                if d.startswith(f"epoch-{e:012d}")
            }
        )
        row = {
            "epoch": e,
            "seconds": round(dt, 3),
            "store_rows_before": store_rows,
            "novel_forwarded": forwarded[-1],
            "buckets_touched": touched,
        }
        store_rows += forwarded[-1] * 4  # 8 hashes / 2 rows-per-band = 4 keys/doc
        if compact_every and e % compact_every == 0:
            t0 = time.perf_counter()
            store.compact(spark)
            row["compact_seconds"] = round(time.perf_counter() - t0, 3)
        out.append(row)
        print(f"# {row}", file=sys.stderr)
    return out


def main() -> int:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--store", default="/tmp/stream_bench_store")
    ap.add_argument("--seed-keys", type=int, default=1_000_000)
    ap.add_argument("--epochs", type=int, default=8)
    ap.add_argument("--batch-docs", type=int, default=200)
    ap.add_argument("--n-buckets", type=int, default=1024)
    ap.add_argument("--full-read", action="store_true",
                    help="ALSO measure the naive full-store probe for comparison")
    ap.add_argument("--compact-every", type=int, default=0,
                    help="compact() the store every N epochs (0 = never): bounds "
                    "the read-leg growth that manifest fragmentation causes")
    ns = ap.parse_args()
    spark = get_spark()
    result = {
        "seed_keys": ns.seed_keys,
        "batch_docs": ns.batch_docs,
        "n_buckets": ns.n_buckets,
        "compact_every": ns.compact_every,
        "pruned": drive(spark, ns.sf_dir, ns.store, ns.seed_keys, ns.epochs,
                        ns.batch_docs, ns.n_buckets, full_read=False,
                        compact_every=ns.compact_every),
    }
    if ns.full_read:
        result["full_read"] = drive(
            spark, ns.sf_dir, ns.store + "_full", ns.seed_keys, ns.epochs,
            ns.batch_docs, ns.n_buckets, full_read=True,
        )
    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
