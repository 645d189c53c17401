"""Operator-level unit tests (SURVEY §5 strategy item 1)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_azure_data_engineer_project_spark.functions import (
    dense_surrogate_key,
    next_key_offset,
    safe_div,
    split_part,
)
from sales_azure_data_engineer_project_spark.operators.dimensions import (
    DimensionSpec,
    build_scd1_dimension,
)
from sales_azure_data_engineer_project_spark.operators.upsert import merge_upsert


def test_split_part(spark):
    df = spark.createDataFrame([("BMW-M1",), ("KIA-M9",), ("NODELIM",)], ["m"])
    got = {r["m"]: r["cat"] for r in df.select("m", split_part("m", "-", 0).alias("cat")).collect()}
    assert got == {"BMW-M1": "BMW", "KIA-M9": "KIA", "NODELIM": "NODELIM"}


def test_safe_div_types_and_null(spark):
    df = spark.createDataFrame([(10, 4), (3, 0)], ["a", "b"])
    out = df.select(safe_div("a", "b").alias("q"))
    assert dict(out.dtypes)["q"] == "double"
    vals = [r["q"] for r in out.collect()]
    assert vals[0] == 2.5 and vals[1] is None  # long/long → double; x/0 → NULL


def test_dense_surrogate_key_deterministic(spark):
    df = spark.createDataFrame([("b",), ("a",), ("c",)], ["k"]).repartition(3)
    out1 = {r["k"]: r["id"] for r in dense_surrogate_key(df, "id", ["k"], 10).collect()}
    out2 = {r["k"]: r["id"] for r in dense_surrogate_key(df, "id", ["k"], 10).collect()}
    assert out1 == out2 == {"a": 11, "b": 12, "c": 13}


def test_next_key_offset_empty_and_nonempty(spark):
    empty = spark.createDataFrame([], "k long")
    assert next_key_offset(empty, "k") == 0
    df = spark.createDataFrame([(5,), (9,)], "k long")
    assert next_key_offset(df, "k") == 9


def test_merge_upsert_semantics(spark):
    target = spark.createDataFrame([(1, "old1"), (2, "old2")], ["k", "v"])
    source = spark.createDataFrame([(2, "new2"), (3, "new3")], ["k", "v"])
    got = {r["k"]: r["v"] for r in merge_upsert(target, source, ["k"]).collect()}
    # matched updated, unmatched-source inserted, unmatched-target kept
    assert got == {1: "old1", 2: "new2", 3: "new3"}


def test_merge_upsert_duplicate_source_raises(spark):
    target = spark.createDataFrame([(1, "x")], ["k", "v"])
    source = spark.createDataFrame([(1, "a"), (1, "b")], ["k", "v"])
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_upsert(target, source, ["k"])


def test_scd1_dimension_initial_and_incremental(spark):
    spec = DimensionSpec("dim_x", "dim_x_key", "nk", ("attr",))
    s1 = spark.createDataFrame([("b", "B"), ("a", "A")], ["nk", "attr"])
    d1 = build_scd1_dimension(s1, None, spec)
    got1 = {r["nk"]: (r["dim_x_key"], r["attr"]) for r in d1.collect()}
    assert got1 == {"a": (1, "A"), "b": (2, "B")}

    # incremental: update a's attr, add c; b vanishes from batch but is kept
    s2 = spark.createDataFrame([("a", "A2"), ("c", "C")], ["nk", "attr"])
    d2 = build_scd1_dimension(s2, d1, spec)
    got2 = {r["nk"]: (r["dim_x_key"], r["attr"]) for r in d2.collect()}
    assert got2 == {"a": (1, "A2"), "b": (2, "B"), "c": (3, "C")}


def test_scd1_dimension_keys_dense_unique(spark):
    spec = DimensionSpec("d", "key", "nk", ())
    src = spark.createDataFrame([(f"k{i:03d}",) for i in range(57)], ["nk"]).repartition(8)
    dim = build_scd1_dimension(src, None, spec)
    keys = sorted(r["key"] for r in dim.collect())
    assert keys == list(range(1, 58))


def test_union_by_name_order_insensitive(spark):
    a = spark.createDataFrame([(1, "x")], ["k", "v"])
    b = spark.createDataFrame([("y", 2)], ["v", "k"])
    out = a.unionByName(b).collect()
    assert {(r["k"], r["v"]) for r in out} == {(1, "x"), (2, "y")}


def test_resize_raw_tensor_exact(spark):
    """Nearest-neighbor raw-tensor resize is exact array math (no
    codec): a 2x2 RGB tensor upsampled to 4x4 replicates each pixel
    into a 2x2 block, and the Spark mapInPandas wrapper returns the
    identical bytes."""
    import numpy as np

    from sales_azure_data_engineer_project_spark.operators.multimodal import (
        resize_raw_tensor,
        resize_tensors,
    )

    t = np.arange(2 * 2 * 3, dtype=np.uint8).reshape(2, 2, 3)
    up = resize_raw_tensor(t.tobytes(), 2, 2, 4, 4)
    expect = t.repeat(2, axis=0).repeat(2, axis=1).tobytes()
    assert up == expect

    df = spark.createDataFrame(
        [(1, bytearray(t.tobytes()), 2, 2)], "doc_id long, content binary, width int, height int"
    )
    rows = resize_tensors(df, out_w=4, out_h=4).collect()
    assert len(rows) == 1
    assert bytes(rows[0]["content"]) == expect
    assert (rows[0]["width"], rows[0]["height"]) == (4, 4)

    down = resize_raw_tensor(expect, 4, 4, 2, 2)
    assert down == t.tobytes()


def test_dense_surrogate_key_initial_load_scale(spark):
    """Round-4: the two-phase path must produce the identical dense
    global sequence a single ORDER BY window would, at initial-load
    size (every key new — the case the old single-reducer window
    choked on), including key order and determinism across calls."""
    from pyspark.sql import functions as F

    df = spark.range(0, 50_000).select(
        ((F.col("id") * 2654435761) % 1_000_003).alias("nk")
    ).distinct()
    out = dense_surrogate_key(df, "sk", ["nk"], offset=100)
    rows = sorted((r["nk"], r["sk"]) for r in out.collect())
    n = len(rows)
    assert [sk for _, sk in rows] == list(range(101, 101 + n)), "keys not dense"
    assert all(rows[i][0] < rows[i + 1][0] for i in range(n - 1))
    again = {r["nk"]: r["sk"] for r in dense_surrogate_key(df, "sk", ["nk"], offset=100).collect()}
    assert again == dict(rows), "not deterministic across invocations"


def test_full_train_prep_funnel_monotone(spark):
    """The capstone funnel's doc stages must be non-increasing (each
    stage only drops), pack tokens must equal the final doc stage's
    tokens, and the split rows must partition the cleaned set."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        pipeline_full_train_prep,
    )

    rows = {r["stage"]: r for r in pipeline_full_train_prep(
        spark, "/root/testdata/sf0.001"
    ).collect()}
    chain = ["raw", "quality", "lang", "exact_dedup", "near_dedup",
             "semantic_dedup", "decontaminate"]
    for a, b in zip(chain, chain[1:]):
        assert rows[b]["n_units"] <= rows[a]["n_units"], (a, b)
        assert rows[b]["n_tokens"] <= rows[a]["n_tokens"], (a, b)
    assert rows["pack"]["n_tokens"] == rows["decontaminate"]["n_tokens"]
    split_docs = sum(rows[s]["n_units"] for s in ("split_train", "split_val", "split_test") if s in rows)
    split_toks = sum(rows[s]["n_tokens"] for s in ("split_train", "split_val", "split_test") if s in rows)
    assert split_docs == rows["decontaminate"]["n_units"]
    assert split_toks == rows["decontaminate"]["n_tokens"]


def test_ffd_packing_invariants_and_beats_singleton(spark):
    """FFD packing: no bin exceeds the budget (except dedicated
    overflow bins), bin count sits between the volume lower bound and
    the one-doc-per-bin upper bound, placement is deterministic across
    reruns, and every doc appears exactly once."""
    import math

    from sales_azure_data_engineer_project_spark.operators.packing import (
        pack_first_fit_decreasing,
        packing_report,
    )

    rows = []
    for i in range(200):
        # lengths 10..209 across 4 shards, plus two oversize docs
        rows.append((i, (i * 37) % 200 + 10, i % 4))
    rows.append((900, 5000, 0))
    rows.append((901, 600, 1))
    df = spark.createDataFrame(rows, ["doc_id", "n_tok", "shard"])
    B = 512
    out = pack_first_fit_decreasing(df, budget=B).collect()
    assert len(out) == len(rows)
    assert {r["doc_id"] for r in out} == {r[0] for r in rows}
    fills: dict = {}
    for r in out:
        if not r["overflow"]:
            key = (r["shard"], r["bin_idx"])
            fills[key] = fills.get(key, 0) + r["n_tok"]
        else:
            assert r["n_tok"] > B
    assert all(v <= B for v in fills.values())
    # per-shard bin count bounds
    per_shard: dict = {}
    for r in out:
        s = per_shard.setdefault(r["shard"], {"bins": set(), "tok": 0, "n": 0})
        s["bins"].add(r["bin_idx"])
        s["n"] += 1
        if not r["overflow"]:
            s["tok"] += r["n_tok"]
    for s in per_shard.values():
        assert len(s["bins"]) >= math.ceil(s["tok"] / B)
        assert len(s["bins"]) <= s["n"]
    # determinism
    again = pack_first_fit_decreasing(df, budget=B).collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))
    # report consistency
    rep = {r["shard"]: r for r in packing_report(
        pack_first_fit_decreasing(df, budget=B), budget=B
    ).collect()}
    for shard, s in per_shard.items():
        assert rep[shard]["n_bins"] == len(s["bins"])
        assert rep[shard]["n_overflow"] == sum(
            1 for r in out if r["shard"] == shard and r["overflow"]
        )
        # overflow docs count at most `budget` toward fill, so the
        # rate stays a true in-[0,1000] bin-utilization figure even on
        # shard 0 (one 5000-token oversize doc against B=512 bins)
        assert 0 <= rep[shard]["fill_permille"] <= 1000


def test_grid_quantiles_matches_percentile_disc(spark):
    """operators/quantiles.grid_quantiles vs plain-Python
    percentile_disc on a synthetic grouped frame with ties, negative
    values, and a singleton group."""
    from pyspark.sql import functions as F

    from sales_azure_data_engineer_project_spark.operators.quantiles import (
        grid_quantiles,
    )

    data = (
        [("a", v) for v in [5, 1, 1, -3, 9, 9, 9, 2, 0, 7]]
        + [("b", v) for v in [100, -100, 0, 0]]
        + [("c", 42)]
    )
    df = spark.createDataFrame(data, ["g", "v"]).repartition(8)
    got = {
        r["g"]: r
        for r in grid_quantiles(df, ["g"], "v", [25, 50, 75, 95]).collect()
    }
    per = {}
    for g, v in data:
        per.setdefault(g, []).append(v)
    for g, vs in per.items():
        vs.sort()
        n = len(vs)
        r = got[g]
        assert r["n"] == n
        for p in (25, 50, 75, 95):
            assert r[f"p{p}"] == vs[(p * n + 99) // 100 - 1], (g, p)
