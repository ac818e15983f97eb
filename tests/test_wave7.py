"""Wave-7 semantics tests: BPE merge mechanics vs a Python reference,
directed containment vs Jaccard, Mann-Whitney U vs a brute-force rank
computation, and linear-kernel MMD vs a numpy reference — independent
re-derivations, not replays of the oracle SQL."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from etl_seattle_call_data_spark.operators import dedup, text
from etl_seattle_call_data_spark.plans.queries import REGISTRY
from etl_seattle_call_data_spark.sources.registry import load_table

SF = "/root/testdata/sf0.001"


# ---------------------------------------------------------------------------
# BPE canonical-form merge semantics
# ---------------------------------------------------------------------------


def _py_bpe_merge(tokens: list[str], pair: tuple[str, str]) -> list[str]:
    """Reference greedy left-to-right non-overlapping BPE merge."""
    out, i = [], 0
    while i < len(tokens):
        if i + 1 < len(tokens) and (tokens[i], tokens[i + 1]) == pair:
            out.append(tokens[i] + tokens[i + 1])
            i += 2
        else:
            out.append(tokens[i])
            i += 1
    return out


@pytest.mark.parametrize(
    "word,pair",
    [
        ("aaa", ("a", "a")),  # overlapping same-pair run: greedy-left
        ("aaaa", ("a", "a")),  # even run: both non-overlapping merges
        ("abab", ("a", "b")),  # repeated pair, non-adjacent merges
        ("aba", ("a", "b")),  # trailing singleton survives
        ("bab", ("a", "b")),  # mid-word match
        ("xyz", ("a", "b")),  # no match: unchanged
    ],
)
def test_bpe_canonical_merge_matches_reference(spark, word, pair):
    df = spark.createDataFrame([(word,)], "w string").select(
        text.bpe_canonical("w").alias("seq")
    )
    merged = df.select(
        text.bpe_tokens(text.bpe_apply_merge("seq", F.lit(" ".join(pair)))).alias("t")
    )
    got = merged.collect()[0]["t"]
    assert got == _py_bpe_merge(list(word), pair)


def test_bpe_multi_char_tokens_do_not_merge_across_interiors(spark):
    # tokens [aba, b]: the pair (a, b) must NOT match inside 'aba' or
    # across the 'aba'/'b' boundary via its trailing 'a'
    seq = "|aba||b|"
    df = spark.createDataFrame([(seq,)], "seq string").select(
        text.bpe_tokens(text.bpe_apply_merge("seq", F.lit("a b"))).alias("t")
    )
    assert df.collect()[0]["t"] == ["aba", "b"]
    # but the pair (aba, b) does merge
    df2 = spark.createDataFrame([(seq,)], "seq string").select(
        text.bpe_tokens(text.bpe_apply_merge("seq", F.lit("aba b"))).alias("t")
    )
    assert df2.collect()[0]["t"] == ["abab"]


def test_bpe_merge_rounds_query_shape(spark):
    out = REGISTRY["bpe_merge_rounds"].spark(spark, SF).collect()
    assert [r["round"] for r in out] == [1, 2, 3]
    # each merged pair is two space-separated non-empty tokens
    for r in out:
        x, y = r["merged_pair"].split(" ")
        assert x and y and r["n"] > 0


# ---------------------------------------------------------------------------
# Directed containment
# ---------------------------------------------------------------------------


def test_containment_detects_subset_duplicate(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    container = base + " with a very long extra tail " + " ".join(
        f"pad{i}" for i in range(40)
    )
    docs = spark.createDataFrame(
        [(1, base), (2, container), (3, "completely unrelated text body here")],
        "doc_id long, text string",
    )
    rows = {
        (r["contained_id"], r["container_id"]): r["containment"]
        for r in dedup.containment_pairs(docs, threshold=0.8).collect()
    }
    # every shingle of doc 1 occurs in doc 2 -> containment exactly 1.0
    assert rows.get((1, 2)) == 1.0
    # the reverse direction is diluted far below threshold
    assert (2, 1) not in rows
    # and plain Jaccard at the same threshold would have missed the pair
    jac = dedup.jaccard_pairs(docs, threshold=0.8).collect()
    assert not any(r["id_a"] == 1 and r["id_b"] == 2 for r in jac)


# ---------------------------------------------------------------------------
# Mann-Whitney U vs brute-force ranks
# ---------------------------------------------------------------------------


def test_mann_whitney_matches_bruteforce(spark):
    out = REGISTRY["mann_whitney_u_segments"].spark(spark, SF).collect()[0]
    o = load_table(spark, SF, "orders")
    c = load_table(spark, SF, "customer")
    rows = (
        o.join(c, o.o_custkey == c.c_custkey)
        .filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY"))
        .select("o_totalprice", "c_mktsegment")
        .collect()
    )
    vals = np.array([r["o_totalprice"] for r in rows])
    g1 = np.array([r["c_mktsegment"] == "BUILDING" for r in rows])
    order = np.argsort(vals, kind="stable")
    ranks = np.empty(len(vals))
    sv = vals[order]
    # tie-averaged ranks
    i = 0
    while i < len(sv):
        j = i
        while j < len(sv) and sv[j] == sv[i]:
            j += 1
        ranks[order[i:j]] = (i + 1 + j) / 2.0
        i = j
    n1, n2 = int(g1.sum()), int((~g1).sum())
    u1 = ranks[g1].sum() - n1 * (n1 + 1) / 2.0
    assert out["n1_tot"] == n1 and out["n2_tot"] == n2
    assert out["u1_x2"] == int(round(2 * u1))
    assert out["u1_x2"] + out["u2_x2"] == 2 * n1 * n2


# ---------------------------------------------------------------------------
# Linear-kernel MMD vs numpy
# ---------------------------------------------------------------------------


def test_mmd_matches_numpy(spark):
    out = REGISTRY["embedding_mean_shift_mmd"].spark(spark, SF).collect()
    emb = load_table(spark, SF, "embeddings").collect()
    by_label: dict[int, list[np.ndarray]] = {}
    for r in emb:
        by_label.setdefault(r["label"], []).append(
            np.round(np.array(r["embedding"], dtype=np.float64) * 1000)
        )
    for row in out[:3]:
        a = np.stack(by_label[row["label_a"]])
        b = np.stack(by_label[row["label_b"]])
        expect = float(np.sum((a.mean(axis=0) - b.mean(axis=0)) ** 2)) / 1e6
        assert abs(row["mmd2"] - expect) < 1e-6 * max(1.0, expect)
