"""Unit tests for the training-data extension operators (beyond the
oracle parity checks in tools/check_oracle.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from sales_azure_data_engineer_project_spark.operators import dedup as D
from sales_azure_data_engineer_project_spark.operators import multimodal as M
from sales_azure_data_engineer_project_spark.operators import similarity as S
from sales_azure_data_engineer_project_spark.operators import text as X


@pytest.fixture(scope="module")
def docs(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    return spark.createDataFrame(
        [
            (1, base),
            (2, base),  # exact dup of 1
            (3, base + " extra trailing words here"),  # near dup of 1
            (4, "completely different content about spark engines and data"),
            (5, "xy"),  # shorter than one shingle
        ],
        ["doc_id", "text"],
    )


def test_exact_dedup_groups(spark, docs):
    out = D.exact_dedup_groups(docs, "doc_id", "text").collect()
    by_keeper = {r["keeper_id"]: r["n_copies"] for r in out}
    assert by_keeper[1] == 2  # docs 1+2 collapse
    assert by_keeper[3] == 1 and by_keeper[4] == 1 and by_keeper[5] == 1


def test_word_shingles_short_doc_empty(spark, docs):
    sh = docs.select("doc_id", F.size(D.word_shingles("text", 3)).alias("n"))
    got = {r["doc_id"]: r["n"] for r in sh.collect()}
    assert got[5] == 0 and got[1] > 0


def test_jaccard_pairs_finds_near_dup(spark, docs):
    pairs = {(r["id_a"], r["id_b"]): r["jac_permille"] for r in
             D.jaccard_pairs(docs, "doc_id", "text", min_permille=300).collect()}
    assert pairs[(1, 2)] == 1000  # exact dup → jaccard 1.0
    assert (1, 3) in pairs  # near dup found
    assert all((4 not in p) for p in pairs)  # unrelated doc not paired


def test_posting_freq_cap_exactness_and_boilerplate_pruning(spark):
    """The posting_freq_cap valve contract: (a) a cap no shingle's df
    reaches reproduces the uncapped result exactly; (b) a boilerplate
    shingle present in EVERY doc is excluded at a firing cap — pairs
    linked only through it disappear while true near-dups survive with
    sizes recomputed over retained shingles."""
    boiler = "click here to read more"
    df = spark.createDataFrame(
        [
            (1, f"alpha beta gamma delta {boiler}"),
            (2, f"alpha beta gamma delta epsilon {boiler}"),  # near dup of 1
            (3, f"unrelated words entirely different topic {boiler}"),
            (4, f"another separate subject matter entirely {boiler}"),
        ],
        ["doc_id", "text"],
    )
    uncapped = {
        (r["id_a"], r["id_b"]): (r["common"], r["jac_permille"])
        for r in D.jaccard_pairs(df, "doc_id", "text", min_permille=1).collect()
    }
    high_cap = {
        (r["id_a"], r["id_b"]): (r["common"], r["jac_permille"])
        for r in D.jaccard_pairs(
            df, "doc_id", "text", min_permille=1, posting_freq_cap=10
        ).collect()
    }
    assert high_cap == uncapped  # (a) cap above max df → identical
    # the 5-token boilerplate tail yields shingles shared by all 4 docs;
    # uncapped links every doc pair through them
    assert (3, 4) in uncapped
    capped = {
        (r["id_a"], r["id_b"]): (r["common"], r["jac_permille"])
        for r in D.jaccard_pairs(
            df, "doc_id", "text", min_permille=1, posting_freq_cap=2
        ).collect()
    }
    assert (3, 4) not in capped  # boilerplate-only pair pruned
    assert (1, 2) in capped  # true near dup survives
    # sizes recomputed over RETAINED shingles: docs 1/2 keep 4 and 5
    # shingles (df ≤ 2), sharing 2 → jaccard 2000 div (4+5−2) = 285
    assert capped[(1, 2)] == (2, 285)

    cont = {
        (r["id_a"], r["id_b"])
        for r in D.containment_pairs(
            df, "doc_id", "text", min_permille=500, posting_freq_cap=2
        ).collect()
    }
    assert (1, 2) in cont and (3, 4) not in cont

    with pytest.raises(ValueError, match="posting_freq_cap"):
        D.jaccard_pairs(df, "doc_id", "text", posting_freq_cap=0)


def test_minhash_lsh_candidates(spark, docs):
    bands = D.minhash_bands(docs, "doc_id", "text")
    cands = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(bands, "doc_id").collect()}
    assert (1, 2) in cands  # identical docs always collide in every band
    assert all((4 not in p) for p in cands)


def test_minhash_verified_pairs_subset_of_jaccard(spark, docs):
    """LSH-verified pairs must be a SUBSET of the full posting-list
    Jaccard pairs (recall < 1 by banding), and every emitted pair must
    carry the IDENTICAL exact (common, jac_permille) — verification
    recomputes true Jaccard, so precision matches the brute path."""
    full = {
        (r["id_a"], r["id_b"]): (r["common"], r["jac_permille"])
        for r in D.jaccard_pairs(docs, "doc_id", "text", min_permille=300).collect()
    }
    lsh = {
        (r["id_a"], r["id_b"]): (r["common"], r["jac_permille"])
        for r in D.minhash_verified_pairs(
            docs, "doc_id", "text", min_permille=300
        ).collect()
    }
    assert set(lsh) <= set(full)
    for k, v in lsh.items():
        assert v == full[k]
    # identical docs collide in every band and verify at jaccard 1.0
    assert lsh[(1, 2)] == full[(1, 2)]


def test_pq_codes_and_adc_retrieval(spark):
    """PQ on two well-separated clusters: identical vectors share codes,
    and ADC ranks same-cluster vectors above the other cluster."""
    a = [10.0, 10.0, 0.0, 0.0]
    b = [0.0, 0.0, 10.0, 10.0]
    rows = [(i, [x + (i % 3) * 0.01 for x in a]) for i in range(6)]
    rows += [(100 + i, [x + (i % 3) * 0.01 for x in b]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes, books = S.pq_fit_codes(emb, m=2, k=2, max_iter=4)
    got = {r["vec_id"]: (r["c0"], r["c1"]) for r in codes.collect()}
    assert got[0] == got[3]  # identical vectors → identical codes
    assert got[0] != got[100]  # opposite clusters → different codes
    assert len(books) == 2 and all(len(cb) == 2 for cb in books)
    out = S.pq_adc_topk(codes, books, emb.filter("vec_id = 0"), k_neighbors=8).collect()
    top5 = [r["neighbor_id"] for r in out[:5]]
    assert set(top5) == {1, 2, 3, 4, 5}  # own cluster first


def test_sq8_codes_and_topk(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((9, [1.0, 0.001, 0.0, 0.0]))  # near-parallel to vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    codes = S.sq8_codes(emb)
    got = {r["vec_id"]: r["codes"] for r in codes.collect()}
    assert all(0 <= c <= 255 for cs in got.values() for c in cs)
    assert got[0] == [255, 0, 0, 0]  # max value clamps to 255
    out = S.sq8_topk(codes, codes.filter("vec_id = 0"), k=2).collect()
    assert [r["neighbor_id"] for r in out] == [9, 1]
    assert out[0]["approx_dot"] == 255 * 255


def test_simhash_identical_docs_equal(spark, docs):
    fp = {r["doc_id"]: r["simhash16"] for r in D.simhash16(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert len(fp[1]) == 16 and set(fp[1]) <= {"0", "1"}
    assert fp[1] != fp[4]


def test_simhash_hamming_pairs(spark, docs):
    """Exact duplicates are Hamming-0 pairs; unrelated content verifies
    far above the threshold and is excluded even if a block collides."""
    pairs = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(docs, "doc_id", "text", max_hamming=3).collect()
    }
    assert pairs[(1, 2)] == 0
    assert all(4 not in p for p in pairs)


def test_simhash_hamming_differential_brute(spark):
    """The 4-block pigeonhole is EXHAUSTIVE for Hamming <= 3 (any such
    pair agrees exactly on >= 1 block), so the operator's output must
    EQUAL brute-force all-pairs Hamming — same pairs, same distances."""
    from itertools import combinations

    base = "spark shuffles data between stages when a wide dependency appears"
    rows = [(i, base + f" variant {i % 4}") for i in range(24)]
    rows += [(100 + i, f"totally unrelated corpus line number {i} with words") for i in range(8)]
    df = spark.createDataFrame(rows, ["doc_id", "text"])

    sig = {
        r["doc_id"]: (r["b0"], r["b1"], r["b2"], r["b3"])
        for r in D._simhash64_blocks(df, "doc_id", "text").collect()
    }
    brute = {
        (a, b): sum(bin(sig[a][i] ^ sig[b][i]).count("1") for i in range(4))
        for a, b in combinations(sorted(sig), 2)
        if sum(bin(sig[a][i] ^ sig[b][i]).count("1") for i in range(4)) <= 3
    }
    got = {
        (r["id_a"], r["id_b"]): r["hamming"]
        for r in D.simhash_hamming_pairs(df, "doc_id", "text", max_hamming=3).collect()
    }
    assert got == brute
    assert brute  # the planted variants must actually produce low-hamming pairs


def test_cosine_topk_self_excluded_and_ranked(spark):
    rows = [(i, [float(i == j) for j in range(4)]) for i in range(4)]
    rows.append((9, [1.0, 0.001, 0.0, 0.0]))  # near-parallel to vec 0
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    out = S.cosine_topk(emb, emb.filter("vec_id = 0"), k=2).collect()
    assert [r["neighbor_id"] for r in out] == [9, 1]
    assert out[0]["cos_sim"] > 0.999
    assert all(r["neighbor_id"] != 0 for r in out)


def test_sign_bucket(spark):
    emb = spark.createDataFrame(
        [(1, [1.0, -2.0, 3.0, -4.0]), (2, [0.5, -1.0, 9.9, -0.1]), (3, [-1.0, 1.0, 1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = {r["vec_id"]: r["b"] for r in emb.select("vec_id", S.sign_bucket("embedding", 4).alias("b")).collect()}
    assert got[1] == got[2] == "1010" and got[3] == "0111"


def test_quality_columns_integer_exact(spark):
    df = spark.createDataFrame([(1, "aa bb aa")], ["doc_id", "text"])
    row = df.select(*X.quality_columns("text")).first()
    assert row["n_chars"] == 8
    assert row["n_tokens"] == 3
    assert row["n_types"] == 2
    assert row["avg_tok_len_milli"] == 2000
    assert row["ttr_permille"] == 666


def test_multimodal_stub_raises_without_fake():
    with pytest.raises(NotImplementedError):
        M.decode_image(b"\x00\x01")


def test_multimodal_extract_features(spark):
    df = spark.createDataFrame([(7, "hello world")], ["doc_id", "text"])
    out = M.extract_features(M.attach_binary_payload(df)).first()
    assert out["n_bytes"] == 11
    assert out["width"] == 11 % 640 and out["height"] == (7 * 11) % 480


def test_embedding_lsh_vs_blocked_brute(spark, sf_smoke):
    """The UNBLOCKED all-pairs cosine join (O(N²) — demoted from the
    registered query surface per VERDICT r1 item 6) survives here at
    sf0.001 as the ground truth that cross-validates both scale tiers:

    - the registered blocked brute force (`dedup_embedding_cosine`,
      equi-join on vec_id//512) must equal ground truth restricted to
      within-block pairs — i.e. it trades COVERAGE, never correctness;
    - the sign-LSH tier's candidate pairs must be a subset of the
      all-pairs universe with recall > 0 on this corpus (recall < 1 is
      by design; exactness of the scores is oracle-checked separately).
    """
    import __spark_entry__ as entry_mod

    from sales_azure_data_engineer_project_spark.io import load_testdata

    emb = S.with_norm(load_testdata(spark, sf_smoke, "embeddings"))
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("va"), F.col("_norm").alias("na")
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("vb"), F.col("_norm").alias("nb")
    )
    cos = S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))

    def all_pairs(threshold: float) -> set[tuple[int, int]]:
        return {
            (r["id_a"], r["id_b"])
            for r in a.join(b, F.col("id_a") < F.col("id_b"))
            .filter(cos >= threshold)
            .select("id_a", "id_b")
            .collect()
        }

    qs = entry_mod.queries()
    blocked = {
        (r["id_a"], r["id_b"])
        for r in qs["dedup_embedding_cosine"](spark, sf_smoke).collect()
    }
    within_block_truth = {
        (x, y) for x, y in all_pairs(0.45) if x // 512 == y // 512
    }
    assert blocked == within_block_truth

    # the LSH tier runs at its own threshold (0.4)
    truth_lsh = all_pairs(0.4)
    lsh = {
        (r["id_a"], r["id_b"])
        for r in qs["dedup_embedding_lsh"](spark, sf_smoke).collect()
    }
    assert lsh <= truth_lsh
    if truth_lsh:
        assert len(lsh) > 0


def test_arrow_assignment_matches_sql_fold(spark, sf_smoke):
    """Differential: the Arrow/numpy cluster assignment must agree with
    the interpreted SQL-fold assignment everywhere the argmin is
    unambiguous (summation order can only flip exact distance ties)."""
    from pyspark.sql import functions as F

    from sales_azure_data_engineer_project_spark.operators import similarity as S
    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        assign_clusters,
        assign_clusters_arrow,
    )

    emb = S.with_norm(spark.read.parquet(sf_smoke + "/embeddings.parquet"))
    base = emb.select("vec_id", F.col("_v").alias("v"))
    cents = [list(r["v"]) for r in base.orderBy("vec_id").limit(4).collect()]
    sql_rows = {
        r["vec_id"]: r["cluster"] for r in assign_clusters(base, cents, "v").collect()
    }
    arrow_rows = {
        r["vec_id"]: r["cluster"]
        for r in assign_clusters_arrow(base, cents, "v").collect()
    }
    assert sql_rows == arrow_rows


def test_training_prep_funnel_invariants(spark, sf_smoke):
    """The funnel's stage populations must be monotone non-increasing
    and stage 0 must equal the planted-corpus size."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    rows = entry_mod.queries()["pipeline_training_prep"](spark, sf_smoke).collect()
    assert [r["stage"] for r in rows] == [
        "raw", "quality", "lang", "exact_dedup", "near_dedup", "sample",
    ]
    docs = [r["n_docs"] for r in rows]
    toks = [r["n_tokens"] for r in rows]
    assert docs == sorted(docs, reverse=True)
    assert toks == sorted(toks, reverse=True)
    assert docs[0] == _dedup_corpus(spark, sf_smoke).count()
    assert docs[-1] > 0


def test_token_count_invariants(spark, sf_smoke):
    """BPE-ish pre-tokenization splits at least as fine as whitespace:
    bpe_tokens >= ws_tokens for every doc, and the density ratio is
    consistent with the counts it was derived from."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["text_token_counts"](spark, sf_smoke).collect()
    assert rows
    for r in rows:
        assert r["bpe_tokens"] >= r["ws_tokens"] > 0
        assert r["chars_per_bpe_milli"] == 1000 * r["n_chars"] // r["bpe_tokens"]


def test_decontaminate_flags_planted_eval_clones(spark, sf_smoke):
    """Every planted near-dup clone of an eval doc (doc_id%10==0 →
    clone at +100000) must be flagged as contaminated — the clone
    drops only the last 3 tokens, so nearly all of its 8-token spans
    exist verbatim in its eval original.  No eval doc may appear in
    the output (decontamination reports TRAINING docs only), and exact
    dup copies (+200000) of eval docs must be flagged too."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    out = entry_mod.queries()["pipeline_decontaminate"](spark, sf_smoke)
    flagged = {r["doc_id"] for r in out.collect()}
    assert flagged, "expected contaminated docs at smoke scale"
    # output contains no eval docs
    assert not any(d % 10 == 0 and d < 100000 for d in flagged)
    corpus_ids = {
        r["doc_id"] for r in _dedup_corpus(spark, sf_smoke).select("doc_id").collect()
    }
    # every near-dup clone of an eval doc whose original has >= 8+3
    # tokens shares spans; spot-check: all planted exact copies of eval
    # docs (ids ending the %170 residue chain) are flagged
    exact_eval_copies = {
        d for d in corpus_ids if d >= 200000 and (d - 200000) % 10 == 0
    }
    assert exact_eval_copies <= flagged


def test_pack_sequences_invariants(spark, sf_smoke):
    """Packing arithmetic: sequences = ceil(tokens/512) per shard, fill
    can never exceed 1000 permille, and straddling docs are bounded by
    doc count."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["pipeline_pack_sequences"](spark, sf_smoke).collect()
    assert rows, "expected shards"
    for r in rows:
        assert r["n_sequences"] == -(-r["n_tokens"] // 512)
        assert 0 < r["fill_permille"] <= 1000
        assert 0 <= r["n_straddling"] <= r["n_docs"]


def test_mixture_weighted_tracks_targets(spark, sf_smoke):
    """Deterministic hash-Bernoulli mixture: kept ⊆ total, and realized
    rates track targets (loose bound — smoke corpus has ~100 docs per
    source, so sampling noise is material)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["sample_mixture_weighted"](spark, sf_smoke).collect()
    assert [r["source"] for r in rows] == [0, 1, 2, 3, 4]
    for r in rows:
        assert 0 <= r["n_kept"] <= r["n_total"]
        assert abs(r["realized_permille"] - r["target_permille"]) <= 250
    # the full-rate source keeps everything
    assert rows[0]["n_kept"] == rows[0]["n_total"]


def test_incremental_matches_planted_copies(spark, sf_smoke):
    """Every planted EXACT copy (doc_id+200000) must match its original
    at 1000 permille; near-dup clones (+100000) match their original
    with high Jaccard; no new doc matches itself."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["dedup_incremental_batch"](spark, sf_smoke).collect()
    assert rows
    by_new = {r["new_id"]: r for r in rows}
    for new_id, r in by_new.items():
        assert new_id >= 100000 and r["match_id"] < 100000
    exact = [r for r in rows if r["new_id"] >= 200000]
    assert exact, "expected exact copies in the batch"
    for r in exact:
        assert r["jac_permille"] == 1000
        assert r["match_id"] == r["new_id"] - 200000


def test_semdedup_drop_list_vs_brute(spark, sf_smoke):
    """SemDeDup differential at sf0.001: the registered drop list must
    equal the brute-force rule 'drop b iff some a<b in b's k-means cell
    has cosine(a,b) >= 0.45, rep = lowest such a' computed directly
    from the cell assignment — i.e. the pair join, threshold, and
    keep-lowest-id window lose nothing."""
    import itertools

    import numpy as np

    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _sq8_kmeans_cells,
    )

    out = {
        r["vec_id"]: (r["cluster"], r["rep_id"])
        for r in entry_mod.queries()["dedup_semantic_semdedup"](spark, sf_smoke).collect()
    }
    cells = _sq8_kmeans_cells(spark, sf_smoke).select("vec_id", "cluster", "v").collect()
    by_cluster: dict[int, list] = {}
    for r in cells:
        by_cluster.setdefault(r["cluster"], []).append((r["vec_id"], np.asarray(r["v"])))
    expect = {}
    for cl, members in by_cluster.items():
        members.sort()
        for (ia, va), (ib, vb) in itertools.combinations(members, 2):
            cos = float(va @ vb) / (np.linalg.norm(va) * np.linalg.norm(vb))
            if cos >= 0.45 and ib not in expect:
                expect[ib] = (cl, ia)
    assert out == expect
    assert out, "expected a non-empty drop list on the smoke corpus"


def test_hierarchical_quantizer_partition_contract(spark, monkeypatch):
    """Round-8 scale fix: above _HIER_QUANTIZER_K the corpus-scaled
    quantizer goes hierarchical (coarse √k Lloyd + RECURSIVE bounded
    local refinement, ~linear total work vs the flat N²/64; the
    recursion is what survives coarse-Lloyd skew — the 300× probe
    measured a one-shot second level dying on a ⅓-corpus mega-cell).
    Forced on at sf0.01 via a lowered gate, the hierarchical cells must
    still satisfy every contract the SemDeDup pair join relies on:

    - exact partition: every vector labeled exactly once;
    - bounded cells: max |cell| ≤ slack·target_cell so Σ|cluster|²
      remains ∝ N (identical-vector cells are the documented escape);
    - identical vectors co-locate (argmin ties break identically), so
      planted exact duplicates stay catchable;
    - deterministic across runs.
    """
    from collections import Counter

    import sales_azure_data_engineer_project_spark.queries_extensions as QE
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _QUANTIZER_TARGET_CELL,
        _sq8_kmeans_cells,
    )

    monkeypatch.setattr(QE, "_HIER_QUANTIZER_K", 4)  # derived k=8 > 4 → hier
    sf = "/root/testdata/sf0.01"
    rows = _sq8_kmeans_cells(spark, sf, k=None, iters=3).select(
        "vec_id", "cluster", "v"
    ).collect()

    n_emb = spark.read.parquet(f"{sf}/embeddings.parquet").count()
    assert len(rows) == n_emb
    assert len({r["vec_id"] for r in rows}) == n_emb

    sizes = Counter(r["cluster"] for r in rows)
    assert max(sizes.values()) <= 3 * _QUANTIZER_TARGET_CELL
    assert len(sizes) > 1

    # identical vectors must share a final cell (deterministic argmin)
    by_vec: dict[tuple, set] = {}
    for r in rows:
        by_vec.setdefault(tuple(r["v"]), set()).add(r["cluster"])
    assert all(len(cells) == 1 for cells in by_vec.values())

    rows2 = _sq8_kmeans_cells(spark, sf, k=None, iters=3).select(
        "vec_id", "cluster"
    ).collect()
    assert sorted((r["vec_id"], r["cluster"]) for r in rows2) == sorted(
        (r["vec_id"], r["cluster"]) for r in rows
    )


def test_subcluster_cells_recursion_splits_mega_cell(spark):
    """The recursive splitter must take a single degenerate coarse cell
    (everything labeled 0, k₂ forced tiny by a low cap) down to bounded
    cells across MULTIPLE levels — the 300× mega-cell scenario in
    miniature — while preserving the exact-partition contract."""
    from collections import Counter

    import numpy as np

    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        subcluster_cells,
    )

    n, d = 2000, 8
    rng = np.random.RandomState(7)
    data = [
        (i, [float(x) for x in rng.rand(d)], 0) for i in range(n)
    ]
    df = spark.createDataFrame(data, "vec_id long, cvec array<double>, cluster int")

    out = subcluster_cells(
        df,
        id_col="vec_id",
        coarse_col="cluster",
        vec_col="cvec",
        target_cell=16,
        iters=2,
        k2_cap=4,  # forces ⌈2000/16⌉=125 ≫ 4 → recursion depth ≥ 4
        slack=3,
        max_levels=6,
    ).collect()

    assert len(out) == n
    assert len({r["vec_id"] for r in out}) == n
    sizes = Counter(r["cluster"] for r in out)
    assert max(sizes.values()) <= 3 * 16
    # depth actually recursed: with cap 4 one level can only make 4
    # cells of ~500 rows — far above the bound — so multiple levels ran
    assert len(sizes) > 16


def test_subcluster_cells_rejects_depth_beyond_tag_space(spark):
    """max_levels > 6 would overflow the 3-bit exit tag (7 is reserved
    for still-oversized leftovers) and collide path labels across
    recursion depths — the call must fail loudly at entry."""
    import pytest as _pytest

    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        subcluster_cells,
    )

    df = spark.createDataFrame(
        [(0, [0.0, 1.0], 0)], "vec_id long, cvec array<double>, cluster int"
    )
    for bad in (0, 7):
        with _pytest.raises(ValueError, match="max_levels"):
            subcluster_cells(
                df, id_col="vec_id", coarse_col="cluster", vec_col="cvec",
                max_levels=bad,
            )


def test_routed_argmin_agreement():
    """√√k routing contract (VERDICT r9 Next #3): the two-stage argmin
    must (a) partition the centroid set exactly across super-cells,
    (b) agree with the exact argmin on ≥97% of clustered points at
    nprobe=2 — the IVF recall trade the hierarchical tier accepts —
    and (c) never report a distance smaller than the exact minimum
    (it searches a subset, so its best is ≥ the true best), with every
    miss assigning a probed cell's genuine nearest member.  Numpy-only:
    the kernels run inside mapInPandas workers; clustered data mirrors
    the SQ8-coded embedding geometry the tier actually sees."""
    import numpy as np

    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        _dists_gemm,
        _fit_supercells,
        _routed_argmin,
    )

    rng = np.random.default_rng(7)
    k, d, per = 64, 16, 60
    centers = rng.normal(size=(k, d)) * 4.0
    X = np.repeat(centers, per, axis=0) + rng.normal(size=(k * per, d)) * 0.6
    C = centers + rng.normal(size=(k, d)) * 0.05

    SC, members = _fit_supercells(C)
    covered = np.sort(np.concatenate(members))
    assert covered.tolist() == list(range(k))  # exact partition
    assert 2 <= SC.shape[0] <= int(np.sqrt(k)) + 1

    exact = _dists_gemm(X, C)
    exact_lab = exact.argmin(1)
    routed_lab = _routed_argmin(X, C, SC, members, nprobe=2)
    agree = (routed_lab == exact_lab).mean()
    assert agree >= 0.97, f"routed/exact agreement {agree:.3f}"
    # subset-search property: routed distance ≥ exact minimum, always
    n = np.arange(len(X))
    assert (exact[n, routed_lab] >= exact[n, exact_lab] - 1e-12).all()
    # determinism: same inputs, same labels
    assert (routed_lab == _routed_argmin(X, C, SC, members, nprobe=2)).all()


def test_assign_clusters_routed_spark_contract(spark):
    """Spark-side routed assignment: same schema contract as
    assign_clusters_arrow, high agreement with the exact assignment on
    clustered data, deterministic across runs, and the k <
    _ROUTE_MIN_K fallback is the EXACT GEMM argmin (no routing layer
    at small k, where every oracle-SF fit lives)."""
    import numpy as np

    from sales_azure_data_engineer_project_spark.operators.kmeans import (
        _ROUTE_MIN_K,
        assign_clusters_arrow,
        assign_clusters_routed,
    )

    rng = np.random.default_rng(11)
    k, d, per = 48, 8, 25
    assert k >= _ROUTE_MIN_K
    centers = rng.normal(size=(k, d)) * 4.0
    pts = np.repeat(centers, per, axis=0) + rng.normal(size=(k * per, d)) * 0.5
    df = spark.createDataFrame(
        [(i, row.tolist()) for i, row in enumerate(pts)],
        "vec_id long, embedding array<double>",
    ).repartition(4)
    cents = [c.tolist() for c in centers]

    routed = dict(
        (r["vec_id"], r["cluster"])
        for r in assign_clusters_routed(df, cents).collect()
    )
    exact = dict(
        (r["vec_id"], r["cluster"])
        for r in assign_clusters_arrow(df, cents).collect()
    )
    assert set(routed) == set(exact) and len(routed) == len(pts)
    agree = sum(routed[i] == exact[i] for i in routed) / len(routed)
    assert agree >= 0.95, f"routed/exact agreement {agree:.3f}"
    routed2 = dict(
        (r["vec_id"], r["cluster"])
        for r in assign_clusters_routed(df, cents).collect()
    )
    assert routed == routed2

    # below the gate the routed entry point IS the exact argmin
    few = [c.tolist() for c in centers[: _ROUTE_MIN_K - 1]]
    small_routed = dict(
        (r["vec_id"], r["cluster"])
        for r in assign_clusters_routed(df, few).collect()
    )
    small_exact = dict(
        (r["vec_id"], r["cluster"])
        for r in assign_clusters_arrow(df, few).collect()
    )
    assert small_routed == small_exact


def test_funnel_staged_mode_matches_lazy(spark):
    """VERDICT r9 Next #4: above _FUNNEL_STAGE_RELEASE_DOCS the funnel
    collects stage stats eagerly and releases each cache after its last
    consumer (the 1000× tier OOM'd one 8 GB heap only because the
    CONCURRENT stage caches summed past it).  Staged execution must be
    a pure materialization-order change: identical rows to the lazy
    one-action shape, and the breadcrumb must prove the staged branch
    actually fired."""
    import sales_azure_data_engineer_project_spark.queries_extensions as QE

    sf = "/root/testdata/sf0.001"

    def rows():
        out = QE.pipeline_full_train_prep(spark, sf).collect()
        return sorted(tuple(r) for r in out)

    lazy = rows()
    assert QE._FUNNEL_LAST_MODE == "lazy"
    try:
        QE._FUNNEL_STAGE_RELEASE_DOCS, saved = 0, QE._FUNNEL_STAGE_RELEASE_DOCS
        staged = rows()
        assert QE._FUNNEL_LAST_MODE == "staged"
    finally:
        QE._FUNNEL_STAGE_RELEASE_DOCS = saved
    assert staged == lazy


def test_bpe_merges_vs_python_reference(spark, sf_smoke):
    """Third formulation cross-check: the registered BPE query (Spark
    F.aggregate fold; DuckDB replays it as windows) must equal a plain
    Python BPE trainer run on the same word-frequency table — greedy
    left-to-right merge, (count DESC, lhs, rhs) argmax tiebreak."""
    import re
    from collections import Counter

    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.io import load_testdata

    got = [
        (r["rnd"], r["lhs"], r["rhs"], r["merged"], r["pair_count"])
        for r in entry_mod.queries()["vocab_bpe_merges"](spark, sf_smoke).collect()
    ]

    texts = [
        r["text"] for r in load_testdata(spark, sf_smoke, "documents").select("text").collect()
    ]
    freq = Counter(w for t in texts for w in re.split(r"\s+", t.lower()) if w)
    vocab = sorted(freq.items(), key=lambda kv: (-kv[1], kv[0]))[:2000]
    words = {w: [*w, "</w>"] for w, _ in vocab}
    expect = []
    for rnd in range(1, 5):
        counts: Counter = Counter()
        for w, n in vocab:
            s = words[w]
            for a, b in zip(s, s[1:]):
                counts[(a, b)] += n
        (x, y), cnt = min(counts.items(), key=lambda kv: (-kv[1], kv[0]))
        for w, _ in vocab:
            s, out = words[w], []
            for sym in s:
                if out and out[-1] == x and sym == y:
                    out[-1] = x + y
                else:
                    out.append(sym)
            words[w] = out
        expect.append((rnd, x, y, x + y, cnt))
    assert got == expect


def test_exact_substring_dedup_removes_planted_copies(spark, sf_smoke):
    """Keep-first semantics: a planted exact copy (doc_id+200000) has
    every span occurrence preceded by its original, so its whole token
    range (for docs >= 8 tokens) collapses into removal intervals; the
    original keeps the first occurrences and must lose nothing to the
    copy alone (it may still share spans with OTHER docs, so we assert
    the copy side only)."""
    import __spark_entry__ as entry_mod

    rows = {
        r["doc_id"]: r
        for r in entry_mod.queries()["text_exact_substring_dedup"](
            spark, sf_smoke
        ).collect()
    }
    copies = [r for d, r in rows.items() if d >= 200000 and r["tokens_total"] >= 8]
    assert copies, "expected planted exact copies"
    for r in copies:
        assert r["n_remove_intervals"] == 1
        assert r["tokens_removed"] == r["tokens_total"]
        assert r["kept_permille"] == 0


def test_multiprobe_dominates_single_probe(spark, sf_smoke):
    """The 1-bit-flip probe set is a strict superset of the single
    bucket, so per query the multiprobe rank-1 cosine can never be
    worse than single-probe's — and some query should see strictly
    more candidates on this corpus."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    sp = {
        r["query_id"]: r["cos_sim"]
        for r in qs["similarity_ann_sign_lsh"](spark, sf_smoke).collect()
        if r["rk"] == 1
    }
    mp_rows = qs["similarity_ann_lsh_multiprobe"](spark, sf_smoke).collect()
    mp = {r["query_id"]: r["cos_sim"] for r in mp_rows if r["rk"] == 1}
    assert set(sp) <= set(mp), "multiprobe must serve every single-probe query"
    for qid, c in sp.items():
        assert mp[qid] >= c - 1e-9
    assert len(mp_rows) >= sum(
        1 for r in qs["similarity_ann_sign_lsh"](spark, sf_smoke).collect()
    )


def test_lsh_recall_exact_matches_oracle(spark, sf_smoke):
    """The exact-truth LSH recall calibrator was demoted from the
    registered surface in round 5 (its ground truth is the sf-bounded
    Σ bucket² posting join; the registered estimator is
    ``dedup_lsh_recall_sampled``) — this test keeps the demoted
    variant under the same DuckDB-twin gate it had as a query."""
    import duckdb

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        DEDUP_LSH_RECALL_EXACT_ORACLE_SQL,
        dedup_lsh_recall,
    )

    got = dedup_lsh_recall(spark, sf_smoke).collect()
    assert len(got) == 1
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM "
        f"read_parquet('{sf_smoke}/documents.parquet')"
    )
    exp = con.execute(DEDUP_LSH_RECALL_EXACT_ORACLE_SQL).fetchall()[0]
    row = got[0]
    assert (
        row["n_truth"], row["n_candidates"], row["n_hit"], row["recall_permille"]
    ) == tuple(exp)


def test_pq_adc_cell_restriction_equals_postfilter(spark):
    """`pq_adc_topk(restrict_col=...)` (the IVF-PQ probe) must equal
    scoring ALL candidates and keeping same-cell ones afterwards — the
    restriction is a pushdown, never a semantics change."""
    from pyspark.sql import functions as F

    from sales_azure_data_engineer_project_spark.operators import similarity as S

    n, d = 120, 8
    emb = spark.range(n).select(
        F.col("id").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(0), F.lit(d - 1)),
            lambda i: ((F.col("id") * 7 + i * 13) % 19).cast("double"),
        ).alias("embedding"),
        (F.col("id") % 4).cast("int").alias("cell"),
    )
    codes, books = S.pq_fit_codes(
        emb.select("vec_id", "embedding"), m=2, k=4, max_iter=2
    )
    codes = codes.join(emb.select("vec_id", "cell"), "vec_id")
    queries = emb.filter(F.col("vec_id") < 5)

    restricted = S.pq_adc_topk(
        codes, books, queries, k_neighbors=3, restrict_col="cell"
    ).collect()

    # reference: flat ADC over everything, filter to same cell, re-rank
    flat = S.pq_adc_topk(codes, books, queries, k_neighbors=n).collect()
    cell_of = {r["vec_id"]: r["cell"] for r in emb.select("vec_id", "cell").collect()}
    expected = {}
    for r in flat:
        q = r["query_id"]
        if cell_of[r["neighbor_id"]] == cell_of[q]:
            expected.setdefault(q, []).append((r["neighbor_id"], r["approx_ip"]))
    for q in expected:
        expected[q] = sorted(expected[q], key=lambda t: (-t[1], t[0]))[:3]

    got = {}
    for r in restricted:
        got.setdefault(r["query_id"], []).append(
            (r["neighbor_id"], r["approx_ip"], r["rk"])
        )
    assert set(got) == set(expected)
    for q in expected:
        got_sorted = [ (n_, ip) for n_, ip, _ in sorted(got[q], key=lambda t: t[2]) ]
        assert got_sorted == expected[q], f"query {q}"


def test_containment_catches_subset_jaccard_misses(spark):
    """A short doc wholly contained in a long one: containment from the
    short side is 1000‰ while symmetric Jaccard stays below any dedup
    threshold — the quote-inclusion case the asymmetric measure exists
    for."""
    words = [f"tok{i}x" for i in range(60)]
    long_doc = " ".join(words)
    short_doc = " ".join(words[:10])  # shingles(short) ⊂ shingles(long)
    df = spark.createDataFrame(
        [(1, long_doc), (2, short_doc), (3, "unrelated totally different words entirely")],
        ["doc_id", "text"],
    )
    cont = D.containment_pairs(df, "doc_id", "text", min_permille=800).collect()
    assert len(cont) == 1
    r = cont[0]
    assert (r["id_a"], r["id_b"]) == (1, 2)
    # short side: 8 shingles, all present in long
    assert r["cont_b_permille"] == 1000
    # long side: 8/58 shingles shared
    assert r["cont_a_permille"] == 1000 * 8 // 58
    # symmetric Jaccard would NOT flag this pair at the same bar
    jac = D.jaccard_pairs(df, "doc_id", "text", min_permille=800).collect()
    assert jac == []


def test_containment_symmetric_on_exact_dup(spark):
    df = spark.createDataFrame(
        [(1, "a b c d e f g h"), (2, "a b c d e f g h")], ["doc_id", "text"]
    )
    r = D.containment_pairs(df, "doc_id", "text").collect()[0]
    assert r["cont_a_permille"] == r["cont_b_permille"] == 1000


def test_dsir_importance_prefers_target_profile(spark, sf_smoke):
    """Docs from the designated target sources must score at least as
    high on average as the rest of the corpus — the defining property
    of an importance weight (their own bigram profile IS the target
    distribution)."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        text_dsir_importance,
    )

    out = text_dsir_importance(spark, sf_smoke).collect()
    tgt = [r["score_milli"] for r in out if r["source"] in ("src0", "src1")]
    rest = [r["score_milli"] for r in out if r["source"] not in ("src0", "src1")]
    assert sum(tgt) / len(tgt) >= sum(rest) / len(rest)
    # every doc with >=1 bigram is scored
    assert all(r["n_feats"] >= 1 for r in out)


def test_hashed_classifier_matches_python_reference(spark):
    """Inference must equal a per-token Python reimplementation of the
    same hashed-weight model (md5-prefix bucket, (37j+11)%41−20)."""
    import hashlib

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        text_quality_classifier_hashed,
    )

    texts = {1: "alpha beta gamma delta", 2: "one two three four five six"}

    def score(text):
        toks = [t for t in text.lower().split() if t]
        ws = []
        for t in toks:
            j = int(hashlib.md5(f"qc:{t}".encode()).hexdigest()[:2], 16)
            ws.append((j * 37 + 11) % 41 - 20)
        return len(toks), sum(ws)

    import os
    import tempfile

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(k, v, "en", "srcT", len(v)) for k, v in texts.items()],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {
            r["doc_id"]: r
            for r in text_quality_classifier_hashed(spark, d).collect()
        }
    for k, v in texts.items():
        n, s = score(v)
        assert out[k]["n_toks"] == n and out[k]["wsum"] == s
        assert out[k]["avg_w_milli"] == int(1000 * s / n) if s >= 0 else -(
            1000 * (-s) // n
        )


def test_adaptive_thresholds_per_source_quartile(spark, sf_smoke):
    """Each source keeps at least 3/4 of its docs (cutoff is its own
    25th percentile) and cutoffs genuinely differ across sources when
    distributions differ."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        quality_adaptive_thresholds,
    )

    out = quality_adaptive_thresholds(spark, sf_smoke).collect()
    assert len(out) == 20
    for r in out:
        # rank-based p25: at least ceil(3n/4) docs sit at/above cutoff
        assert r["n_kept"] * 4 >= r["n_docs"] * 3
        assert r["kept_permille"] == 1000 * r["n_kept"] // r["n_docs"]


def test_boilerplate_chunks_flags_planted_dups(spark, sf_smoke):
    """Docs with a planted exact copy must have every chunk shared
    (boiler_permille == 1000 on both the original and the copy); the
    corpus-wide shared mass must be nonzero and bounded by n_chunks."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        text_boilerplate_chunks,
    )

    out = {r["doc_id"]: r for r in text_boilerplate_chunks(spark, sf_smoke).collect()}
    exact_originals = [d for d in out if d < 100000 and d % 17 == 0]
    assert exact_originals
    for d in exact_originals:
        assert out[d]["boiler_permille"] == 1000, d
        assert out[d + 200000]["boiler_permille"] == 1000, d
    for r in out.values():
        assert 0 <= r["n_shared"] <= r["n_chunks"]


def test_containment_estimator_calibrated_at_extremes(spark, sf_smoke):
    """Background (adjacent-id) pairs anchor decile 0, planted dups
    anchor decile 10; the signature-based estimate must be within
    150 permille of exact containment at both extremes."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        dedup_minhash_containment_estimate,
    )

    rows = {
        r["cont_decile"]: r
        for r in dedup_minhash_containment_estimate(spark, sf_smoke).collect()
    }
    assert 0 in rows and 10 in rows
    assert rows[0]["n_pairs"] > 0 and rows[10]["n_pairs"] > 0
    assert rows[0]["avg_abs_err_permille"] <= 150
    assert rows[10]["avg_abs_err_permille"] <= 150


def test_pca_power_iteration_matches_numpy(spark, sf_smoke):
    """Three quantized power iterations must agree with numpy's exact
    eigendecomposition of the same SQ8 second-moment matrix: loading
    direction cosine > 0.999 and eigenvalue within 2%."""
    import numpy as np

    from sales_azure_data_engineer_project_spark.io import load_testdata
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        embedding_pca_power_iteration,
    )

    out = embedding_pca_power_iteration(spark, sf_smoke).collect()
    got = np.array([r["loading_micro"] for r in sorted(out, key=lambda r: r["dim"])])
    lam = out[0]["lambda_floor"]

    emb = load_testdata(spark, sf_smoke, "embeddings").collect()
    vs = np.array([r["embedding"] for r in emb], dtype=np.float64)
    mn, mx = vs.min(), vs.max()
    codes = np.clip(np.floor((vs - mn) * 256.0 / max(mx - mn, 1e-12)), 0, 255)
    s_mat = codes.T @ codes
    w_eig, v_eig = np.linalg.eigh(s_mat)
    top_val, top_vec = w_eig[-1], v_eig[:, -1]
    if top_vec.sum() < 0:
        top_vec = -top_vec  # power iteration from all-ones → positive orientation

    cos = float(got @ top_vec) / (np.linalg.norm(got) * np.linalg.norm(top_vec))
    assert cos > 0.999, cos
    assert abs(lam - top_val) / top_val < 0.02, (lam, top_val)


def test_ccnet_buckets_partition_and_order(spark, sf_smoke):
    """Per language the three buckets partition the scored docs and the
    per-bucket mean familiarity is ordered tail < middle < head (they
    are score ranges, so ordering is structural — a violation means the
    cutoff extraction is wrong)."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark import functions as _  # noqa: F401
    from sales_azure_data_engineer_project_spark.io import load_testdata
    from pyspark.sql import functions as F

    rows = entry_mod.queries()["text_ccnet_perplexity_buckets"](
        spark, sf_smoke
    ).collect()
    assert {r["bucket"] for r in rows} <= {"head", "middle", "tail"}

    per_lang: dict = {}
    for r in rows:
        per_lang.setdefault(r["lang"], {})[r["bucket"]] = r

    docs = load_testdata(spark, sf_smoke, "documents")
    scored_counts = {
        r["lang"]: r["n"]
        for r in docs.filter(F.length(F.lower("text")) >= 3)
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    for lang, buckets in per_lang.items():
        assert sum(b["n_docs"] for b in buckets.values()) == scored_counts[lang]
        if {"tail", "middle", "head"} <= set(buckets):
            t = buckets["tail"]["avg_familiarity_permille"]
            m = buckets["middle"]["avg_familiarity_permille"]
            h = buckets["head"]["avg_familiarity_permille"]
            assert t <= m <= h, (lang, t, m, h)


def test_bottomk_sketch_is_mergeable(spark, sf_smoke):
    """The defining sketch property: bottom-k(A ∪ B) ==
    bottom-k(bottom-k(A) ∪ bottom-k(B)) — partial sketches combine
    associatively, so per-shard/day sketches roll up without re-reading
    data.  Checked in pure Python on the real keyed rows."""
    import hashlib

    from sales_azure_data_engineer_project_spark.io import load_testdata

    k = 256
    li = load_testdata(spark, sf_smoke, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice"
    )
    rows = [
        (
            hashlib.md5(f"{r['l_orderkey']}_{r['l_linenumber']}".encode()).hexdigest(),
            r["l_extendedprice"],
        )
        for r in li.collect()
    ]
    assert len(rows) > 2 * k  # the property is vacuous otherwise
    mid = len(rows) // 2
    a, b = rows[:mid], rows[mid:]

    def bottomk(rs):
        return sorted(rs)[:k]

    merged_of_sketches = bottomk(bottomk(a) + bottomk(b))
    direct = bottomk(a + b)
    assert merged_of_sketches == direct


def test_bottomk_estimates_are_sane(spark, sf_smoke):
    """Monotone quantile estimates drawn from the group's own values,
    sample size min(k, n_rows)."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.io import load_testdata
    from pyspark.sql import functions as F

    out = entry_mod.queries()["quantile_sketch_bottomk"](spark, sf_smoke).collect()
    li = load_testdata(spark, sf_smoke, "lineitem")
    cents_by_flag = {
        r["l_returnflag"]: set(r["cs"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.collect_set(
                F.floor(F.col("l_extendedprice") * 100).cast("bigint")
            ).alias("cs")
        )
        .collect()
    }
    n_by_flag = {
        r["l_returnflag"]: r["n"]
        for r in li.groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in out:
        flag = r["l_returnflag"]
        assert r["n_rows"] == n_by_flag[flag]
        assert r["n_sample"] == min(256, r["n_rows"])
        assert r["est_p50_cents"] <= r["est_p90_cents"] <= r["est_p99_cents"]
        for c in ("est_p50_cents", "est_p90_cents", "est_p99_cents"):
            assert r[c] in cents_by_flag[flag], (flag, c, r[c])


def test_global_shuffle_partitions_and_balances(spark, sf_smoke):
    """Shards partition the corpus (Σ n_docs == N), shard ids live in
    [0, 16), and the report is deterministic across reruns (content
    hashing, not rand())."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.io import load_testdata

    fn = entry_mod.queries()["pipeline_global_shuffle"]
    rows1 = [tuple(r) for r in fn(spark, sf_smoke).collect()]
    rows2 = [tuple(r) for r in fn(spark, sf_smoke).collect()]
    assert rows1 == rows2

    n = load_testdata(spark, sf_smoke, "documents").count()
    assert sum(r[1] for r in rows1) == n
    assert all(0 <= r[0] < 16 for r in rows1)
    # md5 is uniform: no shard should be empty or >3x fair share even
    # at the smoke SF
    assert all(0 < r[1] < 3 * (n / 16) + 16 for r in rows1)


def test_curriculum_phases_partition_and_escalate(spark, sf_smoke):
    """Phases 1..4 partition the tokenized docs and mean difficulty is
    strictly ordered phase1 < ... < phase4 (structural: phases are
    difficulty ranges)."""
    import __spark_entry__ as entry_mod
    from sales_azure_data_engineer_project_spark.io import load_testdata
    from sales_azure_data_engineer_project_spark.operators import text as X
    from pyspark.sql import functions as F

    rows = sorted(
        entry_mod.queries()["pipeline_curriculum_order"](spark, sf_smoke).collect(),
        key=lambda r: r["phase"],
    )
    assert [r["phase"] for r in rows] == list(range(1, len(rows) + 1))
    docs = load_testdata(spark, sf_smoke, "documents")
    n_tokenized = docs.filter(
        F.size(F.split("text", X.TOKEN_RE)) > 0
    ).count()
    assert sum(r["n_docs"] for r in rows) == n_tokenized
    diffs = [r["avg_difficulty_permille"] for r in rows]
    assert diffs == sorted(diffs)


def test_unimax_waterfill_invariants(spark, sf_smoke):
    """UniMax allocation: every language's allocation respects its cap,
    capped languages take exactly the cap, uncapped languages share one
    uniform quota, and the budget is conserved up to integer-division
    remainder (< m tokens left on the table)."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["pipeline_unimax_language_budget"](
        spark, sf_smoke
    ).collect()
    total = sum(r["tokens_available"] for r in rows)
    budget = (3 * total) // 2
    m = len(rows)
    for r in rows:
        assert r["allocated_tokens"] <= r["cap_tokens"]
        assert r["cap_tokens"] == 2 * r["tokens_available"]
        if r["capped"]:
            assert r["allocated_tokens"] == r["cap_tokens"]
    uncapped = {r["allocated_tokens"] for r in rows if not r["capped"]}
    assert len(uncapped) <= 1  # uniform share
    allocated = sum(r["allocated_tokens"] for r in rows)
    if uncapped:
        assert 0 <= budget - allocated < m
    else:
        assert allocated <= budget


def test_cross_source_matrix_covers_all_lsh_pairs(spark, sf_smoke):
    """The matrix's total pair mass equals the LSH candidate-pair count
    (every pair lands in exactly one unordered source cell) and
    source_a <= source_b everywhere."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    n_pairs = qs["dedup_minhash_lsh"](spark, sf_smoke).count()
    rows = qs["dedup_cross_source_matrix"](spark, sf_smoke).collect()
    assert sum(r["n_pairs"] for r in rows) == n_pairs
    for r in rows:
        assert r["source_a"] <= r["source_b"]
        assert r["cross_source"] == (r["source_a"] != r["source_b"])
        assert 0 <= r["n_strong"] <= r["n_pairs"]


def test_calibration_buckets_partition_scored_docs(spark, sf_smoke):
    """Bucket populations sum to the classifier-scored doc count and
    every count is internally consistent."""
    import __spark_entry__ as entry_mod

    qs = entry_mod.queries()
    n_scored = qs["text_quality_classifier_hashed"](spark, sf_smoke).count()
    rows = qs["quality_score_calibration"](spark, sf_smoke).collect()
    assert sum(r["n_docs"] for r in rows) == n_scored
    for r in rows:
        assert 0 <= r["n_keep"] <= r["n_docs"]
        assert 0 <= r["n_gopher_pass"] <= r["n_docs"]
        assert r["gopher_pass_permille"] == (1000 * r["n_gopher_pass"]) // r["n_docs"]


def test_unimax_closed_form_equals_sequential_waterfill(spark, sf_smoke):
    """Differential test of the closed form: simulate UniMax's
    SEQUENTIAL water-filling (the paper's algorithm — repeatedly give
    every remaining language the uniform share; any language whose cap
    is smaller takes the cap and exits) in plain Python on the real
    per-language inventories and require the Spark/closed-form
    allocation to match exactly."""
    import __spark_entry__ as entry_mod

    rows = entry_mod.queries()["pipeline_unimax_language_budget"](
        spark, sf_smoke
    ).collect()
    avail = {r["lang"]: r["tokens_available"] for r in rows}
    got = {r["lang"]: r["allocated_tokens"] for r in rows}
    budget = (3 * sum(avail.values())) // 2

    remaining = dict(avail)
    alloc: dict = {}
    b = budget
    # sequential water-filling with integer shares, languages whose cap
    # (2*avail) is under the current uniform share exit each round
    while remaining:
        share = b // len(remaining)
        capped = {l for l, a in remaining.items() if 2 * a <= share}
        if not capped:
            # everyone takes the uniform share and we're done
            for l in remaining:
                alloc[l] = share
            break
        for l in capped:
            alloc[l] = 2 * remaining[l]
            b -= alloc[l]
            del remaining[l]
    assert got == alloc


# ---------------------------------------------------------------------------
# Round-5 session-4 additions
# ---------------------------------------------------------------------------


def test_hard_negatives_labels_differ_and_bounded_by_unrestricted(spark, sf_smoke):
    """Every mined negative carries a label different from its query's,
    ranks are consecutive with non-increasing similarity, and the top
    hard negative can never be MORE similar than the unrestricted
    top-1 neighbor (the label filter only removes candidates)."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        similarity_cosine_topk,
        similarity_hard_negatives,
    )

    hard = similarity_hard_negatives(spark, sf_smoke).collect()
    assert hard
    by_q: dict = {}
    for r in hard:
        assert r["neighbor_label"] != r["query_label"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rows in by_q.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        sims = [r["cos_sim"] for r in rows]
        assert sims == sorted(sims, reverse=True)
    top_any = {
        r["query_id"]: r["cos_sim"]
        for r in similarity_cosine_topk(spark, sf_smoke).collect()
        if r["rk"] == 1
    }
    for q, rows in by_q.items():
        assert rows[0]["cos_sim"] <= top_any[q] + 1e-9


def test_k_anonymity_planted_small_groups(spark):
    """A fixture with one 3-record QI class and one singleton: k=2
    flags exactly the singleton; k=5 flags all 4 records."""
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        quality_k_anonymity,
    )

    rows = [
        # three customers sharing (nation 1, SEG_A, same $1000 band)
        (1, "a", 1, 1500.00, "SEG_A"),
        (2, "b", 1, 1600.00, "SEG_A"),
        (3, "c", 1, 1999.99, "SEG_A"),
        # one re-identifiable singleton
        (4, "d", 2, 8000.00, "SEG_B"),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"]
        ).write.parquet(os.path.join(d, "customer.parquet"))
        out = {r["k"]: r for r in quality_k_anonymity(spark, d).collect()}
    assert out[2]["n_groups"] == 2 and out[2]["min_group_size"] == 1
    assert out[2]["groups_below_k"] == 1 and out[2]["records_below_k"] == 1
    assert out[2]["at_risk_permille"] == 250
    assert out[5]["groups_below_k"] == 2 and out[5]["records_below_k"] == 4
    assert out[10]["records_below_k"] == 4


def test_temperature_mixture_exact_isqrt_and_flattening(spark, sf_smoke):
    """The weight must equal math.isqrt(n_tokens) exactly (the ±1
    correction defends the libm sqrt), and temperature scaling must
    flatten the mixture: the temp share spread across sources is no
    wider than the proportional spread."""
    import math

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        sample_temperature_mixture,
    )

    rows = sample_temperature_mixture(spark, sf_smoke).collect()
    assert len(rows) == 20
    for r in rows:
        assert r["wt"] == math.isqrt(r["n_tokens"])
    prop = [r["prop_permille"] for r in rows]
    temp = [r["temp_permille"] for r in rows]
    assert max(temp) - min(temp) <= max(prop) - min(prop)


def test_sequence_packing_python_differential(spark, sf_smoke):
    """Full Python replay of the packer on the same corpus: shard by
    md5(doc_id) 48-bit prefix mod 8, concat in (hash, doc_id) order,
    chop at 256 — every reported number must match exactly."""
    import hashlib
    import re

    from sales_azure_data_engineer_project_spark.io import load_testdata
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        pipeline_sequence_packing,
    )

    docs = load_testdata(spark, sf_smoke, "documents").select("doc_id", "text").collect()
    per_shard: dict = {}
    for r in docs:
        h = hashlib.md5(str(r["doc_id"]).encode()).hexdigest()
        shard = int(h[:12], 16) % 8
        n_tok = len(re.split(r"\s+", r["text"]))
        per_shard.setdefault(shard, []).append((h, r["doc_id"], n_tok))
    expect = {}
    for shard, items in per_shard.items():
        items.sort()
        cum = 0
        splits = 0
        for _, _, n in items:
            start, end = cum, cum + n
            if start // 256 != (end - 1) // 256:
                splits += 1
            cum = end
        n_seqs = (cum + 255) // 256
        expect[shard] = (
            len(items), cum, n_seqs, splits, 1000 * cum // (256 * n_seqs)
        )
    got = {
        r["shard"]: (
            r["n_docs"], r["n_tokens"], r["n_seqs"], r["n_split_docs"],
            r["fill_permille"],
        )
        for r in pipeline_sequence_packing(spark, sf_smoke).collect()
    }
    assert got == expect


def test_bm25_planted_relevant_doc_ranks_first(spark):
    """A doc stuffed with the query's rare terms must outrank docs that
    share only a corpus-universal term (df == N ⇒ idf 0 ⇒ the
    stopword contributes nothing)."""
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        text_bm25_topk,
    )

    docs = [(0, "zebra yak the quartz")]
    for i in range(1, 8):
        docs.append((i, f"the filler{i} filler{i} common common"))
    docs.append((9, "zebra yak the zebra quartz"))
    docs.append((10, "the common common"))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            [(i, t, "en", "s", len(t)) for i, t in docs],
            ["doc_id", "text", "lang", "source", "n_chars"],
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = text_bm25_topk(spark, d).collect()
    q0 = sorted([r for r in out if r["query_id"] == 0], key=lambda r: r["rk"])
    assert q0 and q0[0]["doc_id"] == 9
    # docs sharing only the universal 'the' never score above zero-idf
    for r in q0:
        if r["doc_id"] == 10:
            assert r["score_milli"] == 0


def test_tokenizer_fertility_hand_counted(spark):
    """GPT-2 piece counts on hand-tokenizable strings: contraction
    splits and punctuation runs raise fertility above 1000 exactly as
    the regex defines."""
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        text_tokenizer_fertility,
    )

    # 'hello world' -> ['hello', ' world'] (2 pieces, 2 ws tokens)
    # "don't stop!" -> ['don', "'t", ' stop', '!'] (4 pieces, 2 ws tokens)
    rows = [
        (1, "hello world", "aa", "s", 11),
        (2, "don't stop!", "bb", "s", 11),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["lang"]: r for r in text_tokenizer_fertility(spark, d).collect()}
    assert out["aa"]["bpe_tokens"] == 2 and out["aa"]["ws_tokens"] == 2
    assert out["aa"]["fertility_milli"] == 1000
    assert out["bb"]["bpe_tokens"] == 4 and out["bb"]["ws_tokens"] == 2
    assert out["bb"]["fertility_milli"] == 2000


def test_knn_label_noise_flags_planted_mislabel(spark):
    """Two tight, well-separated clusters; one probe carries the wrong
    label — it must be flagged (its whole neighborhood disagrees) and
    every correctly-labeled probe must not be."""
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        quality_knn_label_noise,
    )

    def vec(axis, jitter):
        v = [0.0] * 64
        v[axis] = 10.0
        v[axis + 2] = jitter
        return v

    rows = []
    # labels 0 and 1: 8 clean members each, probed (vec_id < 50)
    for i in range(8):
        rows.append((i, vec(0, 0.1 * i), 0))
        rows.append((10 + i, vec(1, 0.1 * i), 1))
    # planted mislabel: sits in cluster 0's region but labeled 1
    rows.append((30, vec(0, 0.45), 1))
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, ["vec_id", "embedding", "label"]).write.parquet(
            os.path.join(d, "embeddings.parquet")
        )
        out = {r["label"]: r for r in quality_knn_label_noise(spark, d).collect()}
    assert out[0]["n_flagged"] == 0
    assert out[1]["n_flagged"] == 1  # exactly the planted mislabel
    # the mislabel sits inside cluster 0, so it may appear in label-0
    # neighborhoods (lowering agreement below 1000) but never flips a
    # clean probe's majority
    assert out[0]["agreement_permille"] >= 800
    assert out[1]["agreement_permille"] < 1000


def test_embedding_outliers_consistent_with_cluster_radius(spark, sf_smoke):
    """The rank-1 outlier's scaled distance² per cluster must equal the
    radius embedding_cluster_quality reports for that cluster (the two
    queries share the distance chain verbatim), and ranks must be
    consecutive with non-increasing distances."""
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        embedding_cluster_quality,
        embedding_outliers_topk,
    )

    radius = {
        r["cluster"]: r["radius_scaled"]
        for r in embedding_cluster_quality(spark, sf_smoke).collect()
    }
    by_c: dict = {}
    for r in embedding_outliers_topk(spark, sf_smoke).collect():
        by_c.setdefault(r["cluster"], []).append(r)
    assert set(by_c) == set(radius)
    for c, rows in by_c.items():
        rows.sort(key=lambda r: r["rk"])
        assert [r["rk"] for r in rows] == list(range(1, len(rows) + 1))
        ds = [r["d2s_scaled"] for r in rows]
        assert ds == sorted(ds, reverse=True)
        assert ds[0] == radius[c]


def test_bootstrap_ci_python_differential(spark):
    """Exact Python replay of the Poisson-bootstrap on a small fixture:
    identical md5-derived inverse-CDF weights, identical integer-milli
    replica means — the determinism that makes the error bars
    reproducible across engines and reruns."""
    import hashlib
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _POIS1_CUTS,
        stats_bootstrap_ci,
    )

    rows = []
    for i in range(30):
        flag = "AB"[i % 2]
        price = float(100 + 7 * i) + 0.25  # clean 2-decimal doubles
        rows.append((1000 + i, 1, 1, i % 7, 10.0, price, 0.0, 0.0, flag, "O"))
    cols = [
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag", "l_linestatus",
    ]

    def weight(key, r):
        g, j = divmod(r, 4)
        h = hashlib.md5(f"{key}:{'abcd'[g]}".encode()).hexdigest()
        u = int(h[8 * j : 8 * j + 8], 16)
        for k, c in enumerate(_POIS1_CUTS):
            if u < c:
                return k
        return 5

    expect = {}
    for flag in "AB":
        sub = [r for r in rows if r[8] == flag]
        cents = {
            f"{r[0]}|{r[3]}|{r[5]}|{r[4]}": round(r[5] * 100) for r in sub
        }
        boots = []
        for rep in range(16):
            num = sum(weight(k, rep) * c for k, c in cents.items())
            den = sum(weight(k, rep) for k in cents)
            boots.append(1000 * num // (100 * den))
        mean = 1000 * sum(cents.values()) // (100 * len(cents))
        expect[flag] = (
            len(sub), mean, min(boots), max(boots), max(boots) - min(boots)
        )

    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(rows, cols).write.parquet(
            os.path.join(d, "lineitem.parquet")
        )
        got = {
            r["flag"]: (
                r["n_rows"], r["mean_milli"], r["boot_min_milli"],
                r["boot_max_milli"], r["spread_milli"],
            )
            for r in stats_bootstrap_ci(spark, d).collect()
        }
    assert got == expect


def test_metadata_consistency_flags_planted_drift(spark):
    """A doc whose stored n_chars disagrees with its payload by 7 must
    be the only mismatch, with the drift magnitude reported."""
    import os
    import tempfile

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        quality_metadata_consistency,
    )

    rows = [
        (1, "hello world", "en", "sA", 11),
        (2, "goodbye", "en", "sA", 14),   # planted: off by 7
        (3, "ok then", "en", "sB", 7),
    ]
    with tempfile.TemporaryDirectory() as d:
        spark.createDataFrame(
            rows, ["doc_id", "text", "lang", "source", "n_chars"]
        ).write.parquet(os.path.join(d, "documents.parquet"))
        out = {r["source"]: r for r in quality_metadata_consistency(spark, d).collect()}
    assert out["sA"]["n_mismatch"] == 1 and out["sA"]["max_abs_drift"] == 7
    assert out["sA"]["mismatch_permille"] == 500
    assert out["sB"]["n_mismatch"] == 0 and out["sB"]["max_abs_drift"] == 0


def test_hybrid_rrf_fuses_both_tiers(spark, sf_smoke):
    """RRF output must reproduce div(1e6, 60+rk) per tier exactly, rank
    by fused score, and agree with the standalone BM25 tier on lexical
    ranks (the helper refactor must not change the chain)."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["text_hybrid_rrf_topk"](spark, sf_smoke).collect()
    assert rows, "hybrid retrieval returned nothing"
    per_q = {}
    for r in rows:
        lex = 1000000 // (60 + r["lex_rk"]) if r["lex_rk"] > 0 else 0
        vec = 1000000 // (60 + r["vec_rk"]) if r["vec_rk"] > 0 else 0
        assert r["rrf_micro"] == lex + vec
        per_q.setdefault(r["query_id"], []).append((r["rk"], r["rrf_micro"]))
    for qid, lst in per_q.items():
        lst.sort()
        assert len(lst) == 5
        scores = [s for _, s in lst]
        assert scores == sorted(scores, reverse=True), f"rank order broken for {qid}"
    lex5 = {
        (r["query_id"], r["doc_id"]): r["rk"]
        for r in Q.QUERIES["text_bm25_topk"](spark, sf_smoke).collect()
    }
    hyb = {(r["query_id"], r["doc_id"]): r["lex_rk"] for r in rows}
    for key, rk in lex5.items():
        if key in hyb and hyb[key] > 0:
            assert hyb[key] == rk, f"lexical rank drifted for {key}"


def test_bloom_decontam_no_false_negatives(spark, sf_smoke):
    """Bloom filters admit false positives but NEVER false negatives:
    the exactly-confirmed doc set inside the Bloom report must equal
    the doc set the exact-join decontaminate query flags."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rep = Q.QUERIES["pipeline_bloom_decontam"](spark, sf_smoke).collect()[0]
    exact_docs = Q.QUERIES["pipeline_decontaminate"](spark, sf_smoke).count()
    assert rep["n_exact_docs"] == exact_docs
    assert rep["n_bloom_docs"] >= rep["n_exact_docs"]
    assert rep["n_fp_docs"] == rep["n_bloom_docs"] - rep["n_exact_docs"]
    assert rep["n_bloom_spans"] >= rep["n_exact_spans"]
    assert 0 < rep["bloom_bits_set"] <= 65536


def test_kcenter_radius_monotone_and_picks_distinct(spark, sf_smoke):
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = sorted(
        Q.QUERIES["sample_coreset_kcenter"](spark, sf_smoke).collect(),
        key=lambda r: r["pick_idx"],
    )
    assert [r["pick_idx"] for r in rows] == [1, 2, 3, 4]
    picks = [r["vec_id"] for r in rows]
    assert len(set(picks)) == 4, "centers must be distinct"
    radii = [r["radius2"] for r in rows]
    assert radii == sorted(radii, reverse=True), "coverage radius must shrink"
    assert radii[-1] >= 0


def test_hll_error_within_band(spark, sf_smoke):
    """HLL with LinearCounting small-range correction: realized error
    stays within the expected band at every tested cardinality (the
    uncorrected raw estimator reads ~2.4x high at n=100)."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["approx_distinct_hll"](spark, sf_smoke).collect()
    assert len(rows) == 3
    for r in rows:
        assert r["exact_distinct"] > 0
        assert r["err_permille"] <= 200, (
            f"{r['column_name']}: est {r['est_milli']} vs {r['exact_distinct']}"
        )


def test_bucketed_cumsum_matches_global_window(spark):
    """The two-level scan must equal the naive global-window cumsum
    exactly, across groups, bucket boundaries, and zero-count rows."""
    from pyspark.sql import Window
    from pyspark.sql import functions as F
    from sales_azure_data_engineer_project_spark.operators.prefixsum import bucketed_cumsum

    rows = [
        (g, v, (v * 7 + ord(g) * 3) % 5)
        for g in ("a", "b")
        for v in list(range(0, 25)) + [99, 100, 101, 250]
    ]
    df = spark.createDataFrame(rows, "grp string, v long, x long")
    got = {
        (r["grp"], r["v"]): r["cum_x"]
        for r in bucketed_cumsum(df, ["grp"], "v", ["x"], bucket_width=10).collect()
    }
    w = Window.partitionBy("grp").orderBy("v")
    want = {
        (r["grp"], r["v"]): r["ref"]
        for r in df.withColumn("ref", F.sum("x").over(w)).collect()
    }
    assert got == want


def test_ks_two_sample_differential(spark, sf_smoke):
    """d_micro and the argmax location must match a NumPy ECDF
    recomputation from the raw rows."""
    import numpy as np
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["stats_ks_two_sample"](spark, sf_smoke).collect()
    }
    import pyarrow.parquet as pq
    import os

    t = pq.read_table(
        os.path.join(sf_smoke, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice"],
    ).to_pandas()
    v = np.rint(t["l_extendedprice"].to_numpy() * 100).astype(np.int64)
    grp = t["l_returnflag"].to_numpy()
    grid = np.unique(v)
    n_all = len(v)
    for flag in np.unique(grp):
        a = np.sort(v[grp == flag])
        b = np.sort(v[grp != flag])
        ca = np.searchsorted(a, grid, side="right").astype(object)
        cb = np.searchsorted(b, grid, side="right").astype(object)
        diff = abs(ca * len(b) - cb * len(a))
        maxdiff = max(diff)
        r = got[str(flag)]
        assert r["n_grp"] == len(a) and r["n_rest"] == len(b)
        assert r["diff_scaled"] == maxdiff
        assert r["d_micro"] == (1_000_000 * maxdiff) // (len(a) * len(b))
        assert r["ks_at_centi"] == int(grid[diff == maxdiff].min())


def test_set_ops_kmv_invariants(spark, sf_smoke):
    """10 unordered type pairs; intersection ≤ union on both the exact
    and estimated sides; Jaccards in [0, 1000]; the k=64 estimate
    stays inside a generous 3σ band (RSE ≈ 1/√62 ≈ 12.7%)."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["approx_set_ops_kmv"](spark, sf_smoke).collect()
    assert len(rows) == 10
    assert len({(r["type_a"], r["type_b"]) for r in rows}) == 10
    for r in rows:
        assert r["type_a"] < r["type_b"]
        assert 0 <= r["exact_inter"] <= r["exact_union"]
        assert 0 <= r["est_inter"] <= r["est_union"]
        assert 0 <= r["jaccard_exact_milli"] <= 1000
        assert 0 <= r["jaccard_est_milli"] <= 1000
        assert r["err_union_permille"] <= 400, (
            f"{r['type_a']}×{r['type_b']}: est {r['est_union']}"
            f" vs exact {r['exact_union']}"
        )


def test_priority_sample_matches_python_reference(spark, sf_smoke):
    """Sample membership, τ, and the Σ max(w, τ) estimator recomputed
    exactly in Python from the raw rows; plus the 3σ error band."""
    import hashlib
    import os

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["l_returnflag"]: r
        for r in Q.QUERIES["sample_priority_topk"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "lineitem.parquet"),
        columns=["l_returnflag", "l_orderkey", "l_linenumber", "l_extendedprice"],
    ).to_pandas()
    by_grp = {}
    for flag, ok, ln, px in t.itertuples(index=False):
        w = int(round(px * 100))
        u32 = int(hashlib.md5(f"{ok}#{ln}".encode()).hexdigest()[:8], 16) + 1
        q = (w * 4294967296) // u32
        by_grp.setdefault(flag, []).append((q, ok, ln, w))
    for flag, rows in by_grp.items():
        rows.sort(key=lambda x: (-x[0], x[1], x[2]))
        tau = rows[128][0] if len(rows) > 128 else 0
        est = sum(max(w, tau) for _, _, _, w in rows[:128])
        exact = sum(w for _, _, _, w in rows)
        r = got[flag]
        assert r["n_items"] == len(rows)
        assert r["sample_k"] == min(len(rows), 128)
        assert r["tau_centi"] == tau
        assert r["exact_total_centi"] == exact
        assert r["est_total_centi"] == est
        assert r["err_permille"] <= 350, f"{flag}: est {est} vs exact {exact}"


def test_priority_sample_plan_has_partial_window_group_limit(spark, sf_smoke):
    """The per-group top-129 rank must push a Partial WindowGroupLimit
    below the shuffle (map tasks emit ≤129 rows per group)."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    plan = (
        Q.QUERIES["sample_priority_topk"](spark, sf_smoke)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "WindowGroupLimit" in plan and "Partial" in plan


def test_hll_merged_equals_direct(spark, sf_smoke):
    """Register-wise max of per-day sketches must reproduce the direct
    single-pass estimate bit-exactly (mergeability), within the error
    band vs the exact count."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    r = Q.QUERIES["approx_distinct_hll_merged"](spark, sf_smoke).collect()[0]
    assert r["n_days"] >= 2, "mergeability needs multiple daily sketches"
    assert r["merged_equals_direct"] == 1
    assert r["est_merged_milli"] == r["est_direct_milli"]
    assert r["exact_distinct"] > 0 and r["err_permille"] <= 200


def test_chi2_independence_differential(spark, sf_smoke):
    """Cell counts, milli-exact expecteds, and the double-fold
    contribution recomputed from the raw rows."""
    import math
    import os

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        (r["l_returnflag"], r["l_linestatus"]): r
        for r in Q.QUERIES["stats_chi2_independence"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "lineitem.parquet"),
        columns=["l_returnflag", "l_linestatus"],
    ).to_pandas()
    obs = t.groupby(["l_returnflag", "l_linestatus"]).size()
    rr = t.groupby("l_returnflag").size()
    cc = t.groupby("l_linestatus").size()
    n = len(t)
    assert len(got) == len(obs)
    for (f, s), o in obs.items():
        r = got[(f, s)]
        assert r["observed"] == o
        assert r["expected_milli"] == (1000 * rr[f] * cc[s]) // n
        diff = float(o * n - rr[f] * cc[s])
        want = math.floor(
            (1000000.0 * diff * diff)
            / (float(rr[f]) * float(cc[s]) * float(n) * float(n))
        )
        assert r["contrib_micro"] == want


def test_decayed_engagement_differential(spark, sf_smoke):
    """Dyadic decay sums recomputed exactly in Python."""
    import os

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["event_type"]: r
        for r in Q.QUERIES["events_decayed_engagement"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "events.parquet"),
        columns=["event_type", "value", "ts"],
    ).to_pandas()
    days = t["ts"].dt.normalize()
    mx = days.max()
    age = (mx - days).dt.days.clip(upper=210)
    vm = (t["value"] * 1000).round().astype(int)
    w7 = vm // (2 ** (age // 7))
    w30 = vm // (2 ** (age // 30))
    agg = {}
    for et, a, b in zip(t["event_type"], w7, w30):
        d = agg.setdefault(et, [0, 0, 0, 0])
        d[0] += 1
        d[1] += int(a)
        d[2] += int(b)
        d[3] += 1 if a > 0 else 0
    assert set(agg) == set(got)
    for et, (ne, s7, s30, alive) in agg.items():
        r = got[et]
        assert (r["n_events"], r["decayed_7d_milli"], r["decayed_30d_milli"], r["n_alive_7d"]) == (ne, s7, s30, alive)


def test_mannwhitney_auc_differential(spark, sf_smoke):
    """Doubled midranks, U, and AUC recomputed exactly in Python."""
    import os
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["event_type"]: r
        for r in Q.QUERIES["events_mannwhitney_auc"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "events.parquet"), columns=["event_type", "value"]
    ).to_pandas()
    v = (t["value"] * 1000).round().astype(int)
    total = Counter(v)
    mid2 = {}
    cum = 0
    for val in sorted(total):
        m = total[val]
        mid2[val] = 2 * cum + m + 1
        cum += m
    n_all = len(v)
    for et in t["event_type"].unique():
        sel = v[t["event_type"] == et]
        n1 = len(sel)
        r2 = sum(mid2[x] for x in sel)
        u2 = r2 - n1 * (n1 + 1)
        r = got[et]
        assert (r["n_grp"], r["n_rest"], r["r2_sum"], r["u2"]) == (
            n1, n_all - n1, r2, u2,
        )
        assert r["auc_micro"] == (1_000_000 * u2) // (2 * n1 * (n_all - n1))
        assert 0 <= r["auc_micro"] <= 1_000_000


def test_source_token_tvd_differential(spark, sf_smoke):
    """TVD recomputed from full dense distributions in Python — proves
    the vocab-restricted sum + absent-mass correction is exact."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)
    from sales_azure_data_engineer_project_spark.operators.text import TOKEN_RE

    got = {
        r["source"]: r
        for r in Q.QUERIES["text_source_token_tvd"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "documents.parquet"), columns=["source", "text"]
    ).to_pandas()
    per_src: dict[str, Counter] = {}
    tot: Counter = Counter()
    for src, text in zip(t["source"], t["text"]):
        toks = re.split(TOKEN_RE, text)
        per_src.setdefault(src, Counter()).update(toks)
        tot.update(toks)
    n = sum(tot.values())
    assert set(got) == set(per_src)
    for src, cs in per_src.items():
        n_s = sum(cs.values())
        n_r = n - n_s
        mass = sum(
            abs(cs.get(tok, 0) * n_r - (ct - cs.get(tok, 0)) * n_s)
            for tok, ct in tot.items()
        )
        r = got[src]
        assert (r["n_tokens"], r["n_rest"]) == (n_s, n_r)
        assert r["tvd_micro"] == (1_000_000 * mass) // (2 * n_s * n_r)


def test_vocab_coverage_differential(spark, sf_smoke):
    """Coverage thresholds recomputed by brute-force frequency-sorted
    walk over the raw token counts."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)
    from sales_azure_data_engineer_project_spark.operators.text import TOKEN_RE

    got = {
        r["target_permille"]: r
        for r in Q.QUERIES["vocab_coverage_curve"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "documents.parquet"), columns=["text"]
    ).to_pandas()
    tot: Counter = Counter()
    for text in t["text"]:
        tot.update(re.split(TOKEN_RE, text))
    counts = sorted(tot.values(), reverse=True)
    n_total = sum(counts)
    for target in (500, 900, 990, 999):
        need = -(-target * n_total // 1000)  # ceil
        acc = k = 0
        while acc < need:
            acc += counts[k]
            k += 1
        r = got[target]
        assert r["n_vocab"] == len(counts) and r["n_total"] == n_total
        assert r["vocab_needed"] == k, f"target {target}: {r['vocab_needed']} != {k}"
        assert r["vocab_share_micro"] == (1_000_000 * k) // len(counts)


def test_cusum_changepoint_differential(spark, sf_smoke):
    """CUSUM series recomputed exactly in Python (per-row milli
    rounding before the integer sum — the order-independence
    contract)."""
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["event_type"]: r
        for r in Q.QUERIES["events_cusum_changepoint"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "events.parquet"),
        columns=["event_type", "ts", "value"],
    ).to_pandas()
    daily: dict = defaultdict(int)
    for et, ts, v in zip(t["event_type"], t["ts"], t["value"]):
        daily[(et, ts.date())] += int(round(v * 1000))
    by_type: dict = defaultdict(dict)
    for (et, d), x in daily.items():
        by_type[et][d] = x
    for et, series in by_type.items():
        days = sorted(series)
        n, total = len(days), sum(series.values())
        s = 0
        best = (-1, None, None)
        for d in days:
            s += series[d] * n - total
            if abs(s) > best[0]:
                best = (abs(s), d, 1 if s > 0 else -1)
        r = got[et]
        assert r["n_days"] == n
        assert r["cusum_peak_scaled"] == best[0]
        assert r["peak_day"] == str(best[1])
        assert r["direction"] == best[2]
        assert r["peak_share_permille"] == (1000 * best[0]) // (n * max(total, 1))


def test_benford_deviation_differential(spark, sf_smoke):
    import os
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions as QE

    got = {
        r["first_digit"]: r
        for r in Q.QUERIES["orders_benford_deviation"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "orders.parquet"), columns=["o_totalprice"]
    ).to_pandas()
    digits = Counter(int(str(int(round(p * 100)))[0]) for p in t["o_totalprice"])
    n = len(t)
    assert set(got) == set(digits)
    for d, c in digits.items():
        r = got[d]
        assert r["n_obs"] == c
        assert r["obs_share_milli"] == (1000 * c) // n
        assert r["benford_share_milli"] == QE._BENFORD_MILLI[d]
        assert r["dev_milli"] == (1000 * c) // n - QE._BENFORD_MILLI[d]


def test_token_burstiness_differential(spark, sf_smoke):
    """Fano factors recomputed from dense per-doc count vectors
    (zeros included) — proves the common-denominator shortcut."""
    import os
    import re
    from collections import Counter, defaultdict

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)
    from sales_azure_data_engineer_project_spark.operators.text import TOKEN_RE

    rows = Q.QUERIES["text_token_burstiness"](spark, sf_smoke).collect()
    t = pq.read_table(
        os.path.join(sf_smoke, "documents.parquet"), columns=["doc_id", "text"]
    ).to_pandas()
    per_tok: dict = defaultdict(list)
    for _, (doc, text) in enumerate(zip(t["doc_id"], t["text"])):
        for tok, x in Counter(re.split(TOKEN_RE, text)).items():
            per_tok[tok].append(x)
    d = len(t)
    for r in rows:
        xs = per_tok[r["tok"]]
        total, sumsq = sum(xs), sum(x * x for x in xs)
        assert r["total"] == total and r["docfreq"] == len(xs)
        # dense check: mean/var over ALL docs including zeros
        mean_num, mean_den = total, d
        var_num = d * sumsq - total * total  # d² · population variance
        assert r["fano_milli"] == (1000 * var_num) // (total * d)
        # glue words ~Poisson: at least one token should exceed fano 1.0
    assert any(r["fano_milli"] > 1000 for r in rows), "no bursty token found"


def test_kappa_differential(spark, sf_smoke):
    """Confusion matrix and κ recomputed exactly in Python."""
    import os
    import re
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)
    from sales_azure_data_engineer_project_spark.operators.text import (
        EN_STOPWORDS,
        TOKEN_RE,
    )

    r = Q.QUERIES["quality_rater_agreement_kappa"](spark, sf_smoke).collect()[0]
    t = pq.read_table(
        os.path.join(sf_smoke, "documents.parquet"),
        columns=["doc_id", "lang", "text"],
    ).to_pandas()
    sw = set(EN_STOPWORDS)
    cm = Counter()
    for lang, text in zip(t["lang"], t["text"]):
        toks = re.split(TOKEN_RE, text)
        a = 1 if lang == "en" else 0
        b = 1 if sum(tok in sw for tok in toks) * 20 >= len(toks) else 0
        cm[(a, b)] += 1
    n = len(t)
    a_, b_, c_, d_ = cm[(1, 1)], cm[(1, 0)], cm[(0, 1)], cm[(0, 0)]
    assert (r["n_docs"], r["both_en"], r["meta_only"], r["pred_only"], r["both_other"]) == (n, a_, b_, c_, d_)
    pe_n2 = (a_ + b_) * (a_ + c_) + (d_ + c_) * (d_ + b_)
    assert r["po_milli"] == (1000 * (a_ + d_)) // n
    assert r["pe_milli"] == (1000 * pe_n2) // (n * n)

    def tdiv(x: int, y: int) -> int:
        # both engines' integer div truncates toward zero (κ can be
        # negative — Python's // floors, so mirror truncation here)
        q = abs(x) // abs(y)
        return q if (x >= 0) == (y >= 0) else -q

    assert r["kappa_micro"] == tdiv(1_000_000 * (n * (a_ + d_) - pe_n2), n * n - pe_n2)
    assert -1_000_000 <= r["kappa_micro"] <= 1_000_000


def test_cube_margins_consistent(spark, sf_smoke):
    """All four grouping sets must be internally consistent: cell rows
    sum to each margin and to the grand total."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["cube_revenue_by_flag_status"](spark, sf_smoke).collect()
    cells = [r for r in rows if r["grouping_id"] == 0]
    by_flag = {r["l_returnflag"]: r for r in rows if r["grouping_id"] == 1}
    by_stat = {r["l_linestatus"]: r for r in rows if r["grouping_id"] == 2}
    grand = [r for r in rows if r["grouping_id"] == 3]
    assert len(grand) == 1
    for margin, key in ((by_flag, "l_returnflag"), (by_stat, "l_linestatus")):
        for val, m in margin.items():
            sub = [c for c in cells if c[key] == val]
            assert m["n_items"] == sum(c["n_items"] for c in sub)
            assert m["revenue_centi"] == sum(c["revenue_centi"] for c in sub)
    assert grand[0]["n_items"] == sum(c["n_items"] for c in cells)
    assert grand[0]["revenue_centi"] == sum(c["revenue_centi"] for c in cells)


def test_mutual_knn_reciprocity_invariants(spark, sf_smoke):
    """Every pair must be reciprocal within rank 3, symmetric-unique,
    within-cluster, and cosine-consistent with a direct recompute."""
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["similarity_mutual_knn_pairs"](spark, sf_smoke).collect()
    assert rows, "no mutual pairs found"
    seen = set()
    for r in rows:
        assert r["vec_a"] < r["vec_b"]
        assert (r["vec_a"], r["vec_b"]) not in seen
        seen.add((r["vec_a"], r["vec_b"]))
        assert 1 <= r["rk_ab"] <= 3 and 1 <= r["rk_ba"] <= 3
        assert -1.0 <= r["cos_sim"] <= 1.0 + 1e-9
    # spot-check cosine against a raw numpy recompute for 5 pairs
    import os

    import numpy as np
    import pyarrow.parquet as pq

    emb = pq.read_table(os.path.join(sf_smoke, "embeddings.parquet")).to_pandas()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in zip(emb["vec_id"], emb["embedding"])}
    for r in rows[:5]:
        a, b = vecs[r["vec_a"]], vecs[r["vec_b"]]
        cos = float(a @ b / (np.linalg.norm(a) * np.linalg.norm(b)))
        assert abs(cos - r["cos_sim"]) < 1e-5


def test_concentration_profile_differential(spark, sf_smoke):
    """Gini via the per-row sorted-rank formula and HHI recomputed in
    Python — proves the grouped tie-closed-form."""
    import math
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["c_mktsegment"]: r
        for r in Q.QUERIES["customer_concentration_profile"](spark, sf_smoke).collect()
    }
    od = pq.read_table(
        os.path.join(sf_smoke, "orders.parquet"), columns=["o_custkey", "o_totalprice"]
    ).to_pandas()
    cu = pq.read_table(
        os.path.join(sf_smoke, "customer.parquet"),
        columns=["c_custkey", "c_mktsegment"],
    ).to_pandas()
    seg_of = dict(zip(cu["c_custkey"], cu["c_mktsegment"]))
    spend: dict = defaultdict(int)
    for ck, p in zip(od["o_custkey"], od["o_totalprice"]):
        spend[ck] += int(round(p * 100))
    per_seg: dict = defaultdict(list)
    for ck, centi in spend.items():
        per_seg[seg_of[ck]].append(centi // 100)
    assert set(got) == set(per_seg)
    for segn, xs in per_seg.items():
        xs.sort()
        n, s = len(xs), sum(xs)
        two_sum = 2 * sum((i + 1) * x for i, x in enumerate(xs))
        r = got[segn]
        assert (r["n_customers"], r["total_dollars"]) == (n, s)
        assert r["gini_milli"] == (1000 * (two_sum - (n + 1) * s)) // (n * s)
        sumsq = sum(x * x for x in xs)
        assert r["hhi_micro"] == math.floor(
            (1000000.0 * float(sumsq)) / (float(s) * float(s))
        )
        assert 0 <= r["gini_milli"] <= 1000


def test_maxsim_differential(spark, sf_smoke):
    """MaxSim scores recomputed with numpy: per-query-token best
    cosine over each candidate doc, floored to micro, summed."""
    import math
    import os

    import numpy as np
    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    rows = Q.QUERIES["similarity_maxsim_late_interaction"](spark, sf_smoke).collect()
    emb = pq.read_table(os.path.join(sf_smoke, "embeddings.parquet")).to_pandas()
    vecs = {int(i): np.asarray(v, dtype=np.float64) for i, v in zip(emb["vec_id"], emb["embedding"])}
    docs: dict = {}
    for i, v in vecs.items():
        docs.setdefault(i // 8, []).append(v / np.linalg.norm(v))
    want: dict = {}
    for qd in (0, 1):
        for cd, dvs in docs.items():
            if cd < 2:
                continue
            score = 0
            for qv in docs[qd]:
                best = max(float(qv @ dv) for dv in dvs)
                score += math.floor(best * 1_000_000)
            want[(qd, cd)] = score
    assert len(rows) == 10
    for r in rows:
        assert r["maxsim_micro"] == want[(r["query_doc"], r["cand_doc"])]
    for qd in (0, 1):
        qrows = sorted([r for r in rows if r["query_doc"] == qd], key=lambda r: r["rk"])
        scores = [r["maxsim_micro"] for r in qrows]
        assert scores == sorted(scores, reverse=True)
        top5 = sorted(
            [s for (q_, c_), s in want.items() if q_ == qd], reverse=True
        )[:5]
        assert scores == top5


def test_dataset_card_differential(spark, sf_smoke):
    import hashlib
    import os
    import re

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)
    from sales_azure_data_engineer_project_spark.operators.text import TOKEN_RE

    r = Q.QUERIES["pipeline_dataset_card"](spark, sf_smoke).collect()[0]
    t = pq.read_table(os.path.join(sf_smoke, "documents.parquet")).to_pandas()
    toks = [len(re.split(TOKEN_RE, x)) for x in t["text"]]
    hashes = {hashlib.md5(x.encode()).hexdigest() for x in t["text"]}
    n = len(t)
    assert r["n_docs"] == n
    assert r["n_tokens"] == sum(toks)
    assert r["n_sources"] == t["source"].nunique()
    assert r["n_langs"] == t["lang"].nunique()
    assert r["n_exact_dup_docs"] == n - len(hashes)
    assert r["dup_rate_milli"] == (1000 * (n - len(hashes))) // n
    assert r["en_share_milli"] == (1000 * int((t["lang"] == "en").sum())) // n
    assert r["mean_doc_tokens_milli"] == (1000 * sum(toks)) // n
    assert (r["min_doc_tokens"], r["max_doc_tokens"]) == (min(toks), max(toks))


def test_join_size_estimate_differential(spark, sf_smoke):
    """Exact Σf², the CMS inner product (min over 4 md5 rows), and the
    never-underestimates guarantee recomputed in Python."""
    import hashlib
    import os
    from collections import Counter

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        r["column_name"]: r
        for r in Q.QUERIES["stats_join_size_estimate"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "lineitem.parquet"),
        columns=["l_partkey", "l_suppkey"],
    ).to_pandas()
    for col in ("l_partkey", "l_suppkey"):
        ks = [int(x) for x in t[col]]
        f = Counter(ks)
        exact = sum(v * v for v in f.values())
        ips = []
        for row in range(4):
            buckets = Counter(
                int(hashlib.md5(f"{row}#{k}".encode()).hexdigest()[:8], 16) % 4096
                for k in ks
            )
            ips.append(sum(c * c for c in buckets.values()))
        r = got[col]
        assert r["exact_selfjoin"] == exact
        assert r["cms_estimate"] == min(ips)
        assert r["cms_estimate"] >= exact, "CMS inner product must not underestimate"
        assert r["overcount_permille"] == (1000 * (min(ips) - exact)) // exact


def test_rfm_segments_differential(spark, sf_smoke):
    """Per-customer R/F/M and competition-rank quintiles recomputed in
    Python; segment grid must match cell-for-cell."""
    import os
    from collections import defaultdict

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions  # noqa: F401 (registers)

    got = {
        (r["r_score"], r["f_score"], r["m_score"]): r
        for r in Q.QUERIES["customers_rfm_segments"](spark, sf_smoke).collect()
    }
    t = pq.read_table(
        os.path.join(sf_smoke, "orders.parquet"),
        columns=["o_custkey", "o_orderdate", "o_totalprice"],
    ).to_pandas()
    days = t["o_orderdate"].dt.normalize()
    mxd = days.max()
    per: dict = defaultdict(lambda: [None, 0, 0])
    for ck, d, p in zip(t["o_custkey"], days, t["o_totalprice"]):
        e = per[ck]
        gap = (mxd - d).days
        e[0] = gap if e[0] is None else min(e[0], gap)
        e[1] += 1
        e[2] += int(round(p * 100))
    rows = [(-gap, f, centi // 100) for gap, f, centi in per.values()]
    n = len(rows)

    def quint(vals):
        order = sorted(set(vals))
        cum = 0
        score = {}
        from collections import Counter

        cnt = Counter(vals)
        for v in order:
            score[v] = 1 + (5 * cum) // n
            cum += cnt[v]
        return score

    sr = quint([r[0] for r in rows])
    sf_ = quint([r[1] for r in rows])
    sm = quint([r[2] for r in rows])
    want: dict = defaultdict(lambda: [0, 0, 0])
    for rneg, f, m in rows:
        key = (sr[rneg], sf_[f], sm[m])
        w = want[key]
        w[0] += 1
        w[1] += f
        w[2] += m
    assert set(got) == set(want)
    for key, (nc, no, td) in want.items():
        r = got[key]
        assert (r["n_customers"], r["n_orders"], r["total_dollars"]) == (nc, no, td)


def test_apportionment_sums_to_budget(spark, sf_smoke):
    """Hamilton allocations must sum EXACTLY to the budget, respect
    floor quotas, and match a Python recompute."""
    import os
    import re
    from collections import defaultdict

    import pyarrow.parquet as pq
    from sales_azure_data_engineer_project_spark import queries_core as Q
    from sales_azure_data_engineer_project_spark import queries_extensions as QE
    from sales_azure_data_engineer_project_spark.operators.text import TOKEN_RE

    rows = Q.QUERIES["pipeline_token_budget_apportion"](spark, sf_smoke).collect()
    B = QE._APPORTION_BUDGET
    assert sum(r["allocation"] for r in rows) == B
    t = pq.read_table(
        os.path.join(sf_smoke, "documents.parquet"), columns=["source", "text"]
    ).to_pandas()
    mass: dict = defaultdict(int)
    for src, text in zip(t["source"], t["text"]):
        mass[src] += len(re.split(TOKEN_RE, text))
    total = sum(mass.values())
    quotas = {s: (B * m) // total for s, m in mass.items()}
    rems = sorted(mass, key=lambda s: (-((B * mass[s]) % total), s))
    k = B - sum(quotas.values())
    extra = set(rems[:k])
    for r in rows:
        assert r["n_tokens"] == mass[r["source"]]
        assert r["floor_quota"] == quotas[r["source"]]
        assert r["got_extra"] == (1 if r["source"] in extra else 0)
        assert r["allocation"] == quotas[r["source"]] + r["got_extra"]


def test_registered_capped_lsh_star_shape(spark):
    """The registered hot-bucket query (dedup_lsh_hot_bucket_capped)
    actually exercises star emission: the planted boilerplate (all even
    doc_ids) collapses into one bucket per band, so the hub (min even
    id) pairs with every other even doc across BOTH bands, and no
    even-even pair bypasses the hub."""
    import __spark_entry__ as m

    rows = m.queries()["dedup_lsh_hot_bucket_capped"](
        spark, "/root/testdata/sf0.001"
    ).collect()
    import duckdb

    n_even, hub = duckdb.sql(
        "SELECT count(*), min(doc_id) FROM "
        "'/root/testdata/sf0.001/documents.parquet' WHERE doc_id % 2 = 0"
    ).fetchone()
    star = [r for r in rows if r["id_a"] == hub]
    assert len(star) == n_even - 1
    assert all(r["shared_bands"] == 2 for r in star)  # identical docs: both bands
    assert {r["id_b"] % 2 for r in star} == {0}
    # star, not clique: every even-even pair goes through the hub
    assert not [
        r for r in rows
        if r["id_a"] % 2 == 0 and r["id_b"] % 2 == 0 and r["id_a"] != hub
    ]
    # cold (odd-id) docs still deduplicate via exact all-pairs
    assert all(r["id_a"] < r["id_b"] for r in rows)


def test_shard_checksum_differential_and_rerun_invariance(spark):
    """pipeline_shard_checksum vs hashlib on the real sf0.001 corpus,
    plus the property the operator exists for: the checksum triple is
    identical across reruns and insensitive to input row order."""
    import hashlib

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {r["shard"]: r for r in m.queries()["pipeline_shard_checksum"](spark, sf).collect()}
    docs = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet'"
    ).fetchall()
    exp: dict = {}
    for doc_id, text in docs:
        h = hashlib.md5(str(doc_id).encode()).hexdigest()
        shard = int(h[:12], 16) % 16
        d32 = int(hashlib.md5(f"{doc_id}:{text}".encode()).hexdigest()[:12], 16) % 4294967296
        s = exp.setdefault(shard, [0, 0, 0, None, None])
        s[0] += 1
        s[1] += len(text)
        s[2] += d32
        s[3] = doc_id if s[3] is None else min(s[3], doc_id)
        s[4] = doc_id if s[4] is None else max(s[4], doc_id)
    assert set(got) == set(exp)
    for shard, (n, chars, ck, mn, mx) in exp.items():
        r = got[shard]
        assert (r["n_docs"], r["n_chars_total"], r["checksum_sum"]) == (n, chars, ck)
        assert (r["min_doc_id"], r["max_doc_id"]) == (mn, mx)
    # rerun invariance (the audit contract): second run, same triples
    again = {
        r["shard"]: (r["n_docs"], r["n_chars_total"], r["checksum_sum"])
        for r in m.queries()["pipeline_shard_checksum"](spark, sf).collect()
    }
    assert again == {
        s: (r["n_docs"], r["n_chars_total"], r["checksum_sum"]) for s, r in got.items()
    }


def test_incremental_manifest_accounts_for_every_doc(spark):
    """pipeline_incremental_manifest totals must reconcile exactly with
    the planted edit rates: removed = multiples of 31, added = multiples
    of 41, changed = multiples of 13 that survive removal."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = m.queries()["pipeline_incremental_manifest"](spark, sf).collect()
    by_status: dict = {}
    for r in rows:
        by_status[r["status"]] = by_status.get(r["status"], 0) + r["n_docs"]
    n, n31, n41, n13s = duckdb.sql(f"""
        SELECT COUNT(*),
               SUM(CASE WHEN doc_id % 31 = 0 THEN 1 ELSE 0 END),
               SUM(CASE WHEN doc_id % 41 = 0 THEN 1 ELSE 0 END),
               SUM(CASE WHEN doc_id % 13 = 0 AND doc_id % 31 != 0 THEN 1 ELSE 0 END)
        FROM '{sf}/documents.parquet'
    """).fetchone()
    assert by_status.get("removed", 0) == n31
    assert by_status.get("added", 0) == n41
    assert by_status.get("changed", 0) == n13s
    assert by_status.get("unchanged", 0) == n - n31 - n13s
    assert sum(by_status.values()) == n + n41


def test_simpson_diversity_differential(spark):
    """quality_simpson_diversity vs collections.Counter on sf0.001."""
    import collections
    import re as _re

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {r["source"]: r for r in m.queries()["quality_simpson_diversity"](spark, sf).collect()}
    rows = duckdb.sql(f"SELECT source, text FROM '{sf}/documents.parquet'").fetchall()
    per: dict = {}
    for source, text in rows:
        per.setdefault(source, collections.Counter()).update(_re.split(r"\s+", text))
    assert set(got) == set(per)
    for source, cnt in per.items():
        n = sum(cnt.values())
        coll2 = sum(c * (c - 1) for c in cnt.values())
        r = got[source]
        assert r["n_tokens"] == n and r["n_types"] == len(cnt)
        assert r["simpson_micro"] == (1000000 * coll2) // (n * (n - 1))
        assert r["diversity_micro"] == 1000000 - r["simpson_micro"]


def test_skew_report_differential(spark):
    """pipeline_skew_report vs a plain-Python pass over the real key
    distribution (p50/p99 from the count-of-counts grid, ceiling-rank
    semantics: smallest cnt whose cumulative key share reaches q)."""
    import collections

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    r = m.queries()["pipeline_skew_report"](spark, sf).collect()[0]
    keys = [
        k for (k,) in duckdb.sql(
            f"SELECT l_partkey FROM '{sf}/lineitem.parquet'"
        ).fetchall()
    ]
    cnt = collections.Counter(keys)
    grid = collections.Counter(cnt.values())
    n_keys, n_rows, mx = len(cnt), len(keys), max(cnt.values())

    def q_at(q_num, q_den):
        ck = 0
        for c in sorted(grid):
            ck += grid[c]
            if q_den * ck >= q_num * n_keys:
                return c

    assert (r["n_keys"], r["n_rows"], r["max_cnt"]) == (n_keys, n_rows, mx)
    assert r["p50_cnt"] == q_at(1, 2)
    assert r["p99_cnt"] == q_at(99, 100)
    assert r["top_share_micro"] == (1000000 * mx) // n_rows
    assert r["skew_ratio_milli"] == (1000 * mx) // r["p50_cnt"]


def test_oov_rate_differential(spark):
    """vocab_oov_rate_by_source vs Counter-based top-256 vocab."""
    import collections
    import re as _re

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {r["source"]: r for r in m.queries()["vocab_oov_rate_by_source"](spark, sf).collect()}
    rows = duckdb.sql(f"SELECT source, text FROM '{sf}/documents.parquet'").fetchall()
    glob: collections.Counter = collections.Counter()
    per: dict = {}
    for source, text in rows:
        toks = _re.split(r"\s+", text)
        glob.update(toks)
        per.setdefault(source, collections.Counter()).update(toks)
    vocab = {t for t, _ in sorted(glob.items(), key=lambda kv: (-kv[1], kv[0]))[:256]}
    for source, cnt in per.items():
        n = sum(cnt.values())
        oov = sum(c for t, c in cnt.items() if t not in vocab)
        r = got[source]
        assert (r["n_tokens"], r["n_oov"]) == (n, oov)
        assert r["oov_permille"] == (1000 * oov) // n


def test_ols_trend_differential(spark):
    """events_value_trend_ols vs a plain-Python daily-mean OLS on the
    real sf0.001 events: exact integer identity for the slope, plus a
    float sanity bound vs numpy.polyfit over the same daily points."""
    import datetime as dt

    import duckdb
    import numpy as np

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {r["event_type"]: r for r in m.queries()["events_value_trend_ols"](spark, sf).collect()}
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), CAST(round(value * 1000) AS BIGINT) FROM '{sf}/events.parquet'"
    ).fetchall()
    anchor = dt.date(2024, 1, 1)
    per: dict = {}
    for ty, d, y in rows:
        per.setdefault(ty, {}).setdefault((d - anchor).days, []).append(int(y))
    assert set(got) == set(per)

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    for ty, days in per.items():
        pts = [(x, trunc_div(sum(ys), len(ys))) for x, ys in sorted(days.items())]
        n = len(pts)
        sx = sum(p[0] for p in pts); sy = sum(p[1] for p in pts)
        sxx = sum(p[0] * p[0] for p in pts); sxy = sum(p[0] * p[1] for p in pts)
        expect = trunc_div(1000000 * (n * sxy - sx * sy), n * sxx - sx * sx)
        r = got[ty]
        assert r["slope_micro_per_day"] == expect
        assert r["n_days"] == n
        assert r["n_events"] == sum(len(ys) for ys in days.values())
        xs = np.array([p[0] for p in pts], dtype=float)
        ys_ = np.array([p[1] for p in pts], dtype=float)
        assert abs(r["slope_micro_per_day"] - 1e6 * np.polyfit(xs, ys_, 1)[0]) <= 1.0


def test_record_linkage_fs_plants_are_recovered(spark):
    """customers_record_linkage_fs: the planted truth must land where
    FS theory says — untouched copies score all-agree 'match'; a
    single perturbed field drops to its expected pattern/class; and
    every one of the N true pairs appears in exactly one pattern cell."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = m.queries()["customers_record_linkage_fs"](spark, sf).collect()
    by_pat = {(r["g_name"], r["g_bal"], r["g_seg"]): r for r in rows}
    n = duckdb.sql(
        f"SELECT count(*) FROM '{sf}/customer.parquet'"
    ).fetchone()[0]
    # every true pair lands somewhere; blocking loses none (prefix-17
    # survives the last-char perturbation) and admits few false pairs
    assert sum(r["n_pairs"] for r in rows) >= n
    # all-agree pattern: ids untouched by all three perturbations
    clean = sum(
        1 for i in range(n) if i % 7 != 0 and i % 5 != 0 and i % 11 != 0
    )
    assert by_pat[(1, 1, 1)]["n_pairs"] >= clean
    assert by_pat[(1, 1, 1)]["class"] == "match"
    assert by_pat[(1, 1, 1)]["score"] == 40 + 22 + 8
    # name-only disagreement is still a (weaker) match; all-disagree is not
    assert by_pat[(0, 1, 1)]["score"] == -12 + 22 + 8
    assert by_pat[(0, 0, 0)]["class"] == "non_match"


def test_source_length_emd_differential(spark):
    """text_source_length_emd vs a plain-Python EMD over the same
    32-bucket histograms, plus metric properties (symmetry is implicit
    in the a<b output; identity EMD(x,x)=0 checked by construction)."""
    import re as _re

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    got = {
        (r["source_a"], r["source_b"]): r
        for r in m.queries()["text_source_length_emd"](spark, sf).collect()
    }
    rows = duckdb.sql(f"SELECT source, text FROM '{sf}/documents.parquet'").fetchall()
    lens: dict = {}
    for source, text in rows:
        lens.setdefault(source, []).append(len(_re.split(r"\s+", text)))
    mn = min(v for vs in lens.values() for v in vs)
    mx = max(v for vs in lens.values() for v in vs)
    hist = {
        s: [0] * 32 for s in lens
    }
    for s, vs in lens.items():
        for v in vs:
            hist[s][min(32 * (v - mn) // (mx - mn + 1), 31)] += 1
    for (sa, sb), r in got.items():
        na, nb = sum(hist[sa]), sum(hist[sb])
        ca = cb = numer = 0
        for b in range(32):
            ca += hist[sa][b]
            cb += hist[sb][b]
            numer += abs(ca * nb - cb * na)
        assert (r["n_a"], r["n_b"]) == (na, nb)
        assert r["emd_micro_buckets"] == (1000000 * numer) // (na * nb)
    # completeness: all unordered source pairs present exactly once
    import itertools

    assert set(got) == {
        (a, b) for a, b in itertools.combinations(sorted(lens), 2)
    }


def test_touch_attribution_differential(spark):
    """events_touch_attribution vs a plain-Python session walk on a
    hand-built frame covering: purchase opening a session ('direct'),
    first != last touch, multiple purchases in one session, and a
    session split by the 30-minute gap."""
    import datetime as dt

    import __spark_entry__ as m

    base = dt.datetime(2024, 1, 1)
    rows = [
        # user 1, session 1: view -> click -> purchase(10) -> purchase(5)
        (1, base, 1, "view", 0.0),
        (2, base + dt.timedelta(minutes=5), 1, "click", 0.0),
        (3, base + dt.timedelta(minutes=10), 1, "purchase", 10.0),
        (4, base + dt.timedelta(minutes=15), 1, "purchase", 5.0),
        # user 1, session 2 (gap > 30 min): purchase opens it -> direct
        (5, base + dt.timedelta(minutes=60), 1, "purchase", 7.0),
        # user 2: error -> purchase (single-touch: first == last)
        (6, base, 2, "error", 0.0),
        (7, base + dt.timedelta(minutes=1), 2, "purchase", 3.0),
    ]
    df = spark.createDataFrame(
        [(i, ts, u, ty, v, "{}") for i, ts, u, ty, v in rows],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    )
    import os, tempfile
    with tempfile.TemporaryDirectory() as td:
        df.write.parquet(os.path.join(td, "events.parquet"))
        got = {r["channel"]: tuple(r)[1:] for r in m.queries()["events_touch_attribution"](spark, td).collect()}
    # purchases: p3 first=view last=click; p4 first=view last=click
    # (the purchase between doesn't count as a touch); p5 direct;
    # p7 first=last=error
    assert got == {
        "click": (0, 0, 2, 15000),
        "direct": (1, 7000, 1, 7000),
        "error": (1, 3000, 1, 3000),
        "view": (2, 15000, 0, 0),
    }


def test_label_propagation_invariants(spark):
    """dedup_graph_label_propagation: labels are node ids; communities
    refine connected components (two nodes in different CCs can never
    share a label — propagation only crosses edges); isolated docs keep
    their own id; planted exact dups adopt a shared label."""
    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    lpa = {r["doc_id"]: r["community"] for r in m.queries()["dedup_graph_label_propagation"](spark, sf).collect()}
    cc = {r["doc_id"]: r["component"] for r in m.queries()["dedup_clusters_minhash"](spark, sf).collect()}
    assert set(lpa) == set(cc)
    # refinement: same LPA label -> same CC component
    by_lbl: dict = {}
    for d, l in lpa.items():
        by_lbl.setdefault(l, set()).add(cc[d])
    assert all(len(comps) == 1 for comps in by_lbl.values())
    # isolated docs (singleton components) keep their own id
    from collections import Counter

    comp_sizes = Counter(cc.values())
    for d, comp in cc.items():
        if comp_sizes[comp] == 1:
            assert lpa[d] == d
    # planted exact dups (doc_id + 200000, every 17th) share a label
    # with their original after 2 rounds of a direct edge
    planted = [d for d in lpa if d >= 200000]
    assert planted and all(lpa[d] == lpa[d - 200000] for d in planted)


def test_audience_overlap_jaccard_differential(spark):
    """events_audience_overlap_jaccard vs brute-force Python sets on
    the real sf0.001 events: the bitmask-inventory shape must produce
    the EXACT per-pair |A|, |B|, |A∩B|, |A∪B| that materializing the
    user sets gives, for every type pair, plus the permille contract."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT DISTINCT event_type, user_id FROM '{sf}/events.parquet'"
    ).fetchall()
    sets: dict = {}
    for ty, u in rows:
        sets.setdefault(ty, set()).add(u)
    types = sorted(sets)
    got = {
        (r["type_a"], r["type_b"]): r
        for r in m.queries()["events_audience_overlap_jaccard"](spark, sf).collect()
    }
    expected_pairs = {
        (a, b) for i, a in enumerate(types) for b in types[i + 1 :]
    }
    assert set(got) == expected_pairs
    for (a, b), r in got.items():
        inter = len(sets[a] & sets[b])
        union = len(sets[a] | sets[b])
        assert r["n_users_a"] == len(sets[a])
        assert r["n_users_b"] == len(sets[b])
        assert r["n_intersection"] == inter
        assert r["n_union"] == union
        assert r["jaccard_permille"] == (1000 * inter) // union


def test_autocorr_daily_differential(spark):
    """events_autocorr_daily vs a plain-Python replication of the
    integer permille-normalized estimator on the real sf0.001 events,
    plus a float sanity bound vs the classic biased ACF on the same
    daily series (tolerance covers the 1e-6 integer-rounding steps)."""
    import datetime as dt

    import duckdb
    import numpy as np

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT event_type, CAST(ts AS DATE), COUNT(*) FROM '{sf}/events.parquet' GROUP BY 1, 2"
    ).fetchall()
    anchor = dt.date(2024, 1, 1)
    per: dict = {}
    for ty, d, c in rows:
        per.setdefault(ty, {})[(d - anchor).days] = int(c)
    got = {
        (r["event_type"], r["lag"]): r
        for r in m.queries()["events_autocorr_daily"](spark, sf).collect()
    }
    assert set(got) == {(ty, k) for ty in per for k in (1, 7)}
    for ty, days in per.items():
        s = sum(days.values())
        pm = {x: (1000000 * c) // s for x, c in days.items()}
        mu = sum(pm.values()) // len(pm)
        cv = {x: v - mu for x, v in pm.items()}
        d2 = sum(v * v for v in cv.values())
        for k in (1, 7):
            pairs = [(cv[x], cv[x + k]) for x in cv if x + k in cv]
            nm = sum(a * b for a, b in pairs)
            q = abs(1000000 * nm) // d2
            expect = -q if nm < 0 else q
            r = got[(ty, k)]
            assert r["n_days"] == len(days)
            assert r["n_pairs"] == len(pairs)
            assert r["acf_micro"] == expect
            # float sanity: same estimator in numpy over the same series
            xs = sorted(cv)
            v = np.array([cv[x] for x in xs], dtype=float)
            num_f = sum(
                cv[x] * cv[x + k] for x in cv if x + k in cv
            )
            assert abs(r["acf_micro"] - 1e6 * num_f / float(d2)) <= 1.0


def test_spearman_daily_differential(spark):
    """stats_spearman_daily vs plain-Python classical Spearman with
    average ranks (scipy semantics) on the real sf0.001 events: the
    doubled-integer-rank formulation must agree with the float
    average-rank computation to within the 1e-6 floor step."""
    import math

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT event_type, CAST(ts AS DATE) AS d, COUNT(*) AS cnt,
                   SUM(CAST(round(value*1000) AS BIGINT)) // COUNT(*) AS ybar
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for ty, _, cnt, ybar in rows:
        per.setdefault(ty, []).append((int(cnt), int(ybar)))
    got = {
        r["event_type"]: r
        for r in m.queries()["stats_spearman_daily"](spark, sf).collect()
    }
    assert set(got) == set(per)

    def avg_ranks(vals):
        order = sorted(range(len(vals)), key=lambda i: vals[i])
        ranks = [0.0] * len(vals)
        i = 0
        while i < len(order):
            j = i
            while j + 1 < len(order) and vals[order[j + 1]] == vals[order[i]]:
                j += 1
            r = (i + j) / 2.0 + 1.0
            for k in range(i, j + 1):
                ranks[order[k]] = r
            i = j + 1
        return ranks

    for ty, pts in per.items():
        ra = avg_ranks([p[0] for p in pts])
        rb = avg_ranks([p[1] for p in pts])
        n = len(pts)
        ma = sum(ra) / n
        mb = sum(rb) / n
        num = sum((a - ma) * (b - mb) for a, b in zip(ra, rb))
        da = sum((a - ma) ** 2 for a in ra)
        db = sum((b - mb) ** 2 for b in rb)
        rho = num / math.sqrt(da * db)
        assert got[ty]["n_days"] == n
        assert abs(got[ty]["rho_micro"] - 1e6 * rho) <= 2.0


def test_theil_sen_differential(spark):
    """stats_theil_sen_trend vs plain-Python positional median of the
    exact pairwise slope list on the real sf0.001 events."""
    import math

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
                   SUM(CAST(round(value*1000) AS BIGINT)) // COUNT(*) AS ybar
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for ty, x, ybar in rows:
        per.setdefault(ty, {})[int(x)] = int(ybar)
    got = {
        r["event_type"]: r
        for r in m.queries()["stats_theil_sen_trend"](spark, sf).collect()
    }
    for ty, days in per.items():
        xs = sorted(days)
        slopes = []
        for i, x1 in enumerate(xs):
            for x2 in xs[i + 1 :]:
                s = int(math.floor(1e6 * (days[x2] - days[x1]) / float(x2 - x1)))
                slopes.append((s, x1, x2))
        slopes.sort()
        n_pairs = len(slopes)
        med = slopes[(n_pairs + 1) // 2 - 1][0]
        r = got[ty]
        assert r["n_days"] == len(xs)
        assert r["n_pairs"] == n_pairs
        assert r["median_slope_micro"] == med


def test_interarrival_quantiles_differential(spark):
    """events_interarrival_quantiles vs plain-Python sorted-gap
    percentile_disc (smallest value at cumulative rank ⌈p·n/100⌉) on
    the real sf0.001 events."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT user_id, event_id, epoch_ms(ts) FROM '{sf}/events.parquet'"
    ).fetchall()
    per_user: dict = {}
    for u, eid, ems in rows:
        per_user.setdefault(u, []).append((int(ems), int(eid)))
    gaps = []
    for seq in per_user.values():
        seq.sort()
        gaps.extend(seq[i + 1][0] - seq[i][0] for i in range(len(seq) - 1))
    gaps.sort()
    n = len(gaps)
    [r] = m.queries()["events_interarrival_quantiles"](spark, sf).collect()
    assert r["n_gaps"] == n
    for p in (50, 90, 99):
        rank = (p * n + 99) // 100
        assert r[f"p{p}_ms"] == gaps[rank - 1]


def test_kcore_peeling_differential(spark):
    """dedup_graph_kcore vs a plain-Python 3-round degree-2 peel over
    the SAME candidate edge list (extracted via the same minhash/LSH
    operators at sf0.001): distributed peeling must match the
    sequential reference exactly, including residual degrees and the
    (degree desc, doc_id) top-50 order."""
    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = _dedup_corpus(spark, sf)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in D.lsh_candidate_pairs(bands, "doc_id")
        .select("id_a", "id_b")
        .distinct()
        .collect()
    }
    adj: dict = {}
    for u, v in pairs:
        adj.setdefault(u, set()).add(v)
        adj.setdefault(v, set()).add(u)
    active = set(adj)
    for _ in range(3):
        active = {n for n in active if len(adj[n] & active) >= 2}
        # restrict adjacency to the surviving set for the next round
        adj = {n: adj[n] & active for n in active}
    expect = sorted(
        ((n, len(adj[n])) for n in active), key=lambda t: (-t[1], t[0])
    )[:50]
    got = [
        (r["doc_id"], r["core_degree"])
        for r in m.queries()["dedup_graph_kcore"](spark, sf).collect()
    ]
    assert got == expect


def test_heaps_growth_differential(spark):
    """vocab_heaps_growth vs a sequential Python scan: walk documents
    in doc_id order accumulating a seen-token set; the cumulative
    vocab at each decile boundary must equal the first-occurrence
    histogram formulation exactly."""
    import re

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT doc_id, text FROM '{sf}/documents.parquet' ORDER BY doc_id"
    ).fetchall()
    mx = max(r[0] for r in rows)
    seen: set = set()
    docs_cum = [0] * 10
    vocab_at = [0] * 10
    for doc_id, text in rows:
        dec = min((doc_id * 10) // (mx + 1), 9)
        docs_cum[dec] += 1
        for t in re.split(r"\s+", text):
            seen.add(t)
        vocab_at[dec] = len(seen)
    # forward-fill vocab (a decile inherits the running set) and
    # accumulate docs
    for i in range(1, 10):
        if vocab_at[i] == 0:
            vocab_at[i] = vocab_at[i - 1]
        docs_cum[i] += docs_cum[i - 1]
    got = m.queries()["vocab_heaps_growth"](spark, sf).collect()
    assert [r["decile"] for r in got] == list(range(10))
    assert [r["docs_cum"] for r in got] == docs_cum
    assert [r["vocab_cum"] for r in got] == vocab_at
    # Heaps sanity: cumulative vocab is monotone and positive (the
    # sf0.001 generator vocab saturates in decile 0 — 31 tokens — so
    # strict growth only appears at larger SFs)
    assert vocab_at[9] >= vocab_at[0] > 0


def test_tukey_fences_differential(spark):
    """quality_tukey_fences_by_source vs plain-Python per-source
    quartiles (percentile_disc at ⌈p·n/100⌉) and fence counts."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT source, n_chars FROM '{sf}/documents.parquet'"
    ).fetchall()
    per: dict = {}
    for s, nc in rows:
        per.setdefault(s, []).append(int(nc))
    got = {
        r["source"]: r
        for r in m.queries()["quality_tukey_fences_by_source"](spark, sf).collect()
    }
    assert set(got) == set(per)
    for s, lens in per.items():
        lens.sort()
        n = len(lens)
        q1 = lens[(25 * n + 99) // 100 - 1]
        q3 = lens[(75 * n + 99) // 100 - 1]
        iqr = q3 - q1
        n_low = sum(1 for v in lens if 2 * v < 2 * q1 - 3 * iqr)
        n_high = sum(1 for v in lens if 2 * v > 2 * q3 + 3 * iqr)
        r = got[s]
        assert (r["q1"], r["q3"], r["n_docs"]) == (q1, q3, n)
        assert (r["n_low"], r["n_high"]) == (n_low, n_high)


def test_journey_trigrams_differential(spark):
    """events_journey_trigrams vs a plain-Python per-user sequence
    walk with (ts, event_id) ordering on the real sf0.001 events."""
    from collections import Counter

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT user_id, ts, event_id, event_type FROM '{sf}/events.parquet'"
    ).fetchall()
    per: dict = {}
    for u, ts, eid, ty in rows:
        per.setdefault(u, []).append((ts, eid, ty))
    cnt: Counter = Counter()
    for seq in per.values():
        seq.sort()
        types = [t[2] for t in seq]
        for i in range(len(types) - 2):
            cnt[">".join(types[i : i + 3])] += 1
    expect = sorted(cnt.items(), key=lambda kv: (-kv[1], kv[0]))[:20]
    got = [
        (r["journey"], r["n"])
        for r in m.queries()["events_journey_trigrams"](spark, sf).collect()
    ]
    assert got == expect


def test_weekday_deseasonalized_differential(spark):
    """events_weekday_deseasonalized_anomalies vs plain-Python weekday
    means and permille scoring on the real sf0.001 events."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),
                   COUNT(*)
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    daily = {(ty, int(x)): int(c) for ty, x, c in rows}
    wk: dict = {}
    for (ty, x), c in daily.items():
        wk.setdefault((ty, x % 7), []).append(c)
    wmean = {k: sum(v) // len(v) for k, v in wk.items()}

    def trunc_div(a, b):
        q = abs(a) // abs(b)
        return -q if (a < 0) != (b < 0) else q

    scored = [
        (
            ty,
            x,
            c,
            wmean[(ty, x % 7)],
            trunc_div(1000 * (c - wmean[(ty, x % 7)]), wmean[(ty, x % 7)]),
        )
        for (ty, x), c in daily.items()
    ]
    scored.sort(key=lambda t: (-abs(t[4]), t[0], t[1]))
    expect = scored[:20]
    got = [
        (r["event_type"], r["day_idx"], r["cnt"], r["weekday_mean"], r["excess_permille"])
        for r in m.queries()["events_weekday_deseasonalized_anomalies"](
            spark, sf
        ).collect()
    ]
    assert got == expect


def test_balanced_downsample_differential(spark):
    """sample_balanced_class_downsample vs plain-Python md5-ordered
    selection: identical kept SET per label (checksummed), minority
    size everywhere, and determinism — the kept set of a label never
    depends on other labels' rows."""
    import hashlib

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT vec_id, label FROM '{sf}/embeddings.parquet'"
    ).fetchall()
    per: dict = {}
    for vid, lab in rows:
        per.setdefault(lab, []).append(int(vid))
    mn = min(len(v) for v in per.values())
    got = {
        r["label"]: r
        for r in m.queries()["sample_balanced_class_downsample"](spark, sf).collect()
    }
    assert set(got) == set(per)
    for lab, ids in per.items():
        ranked = sorted(ids, key=lambda i: (hashlib.md5(str(i).encode()).hexdigest(), i))
        kept = ranked[:mn]
        r = got[lab]
        assert r["n_orig"] == len(ids)
        assert r["n_kept"] == mn
        assert r["kept_id_sum"] == sum(kept)


def test_dau_wau_differential(spark):
    """events_dau_wau_stickiness vs plain-Python day sets: WAU(d) must
    equal |union of active sets over [d-6, d]| exactly."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
            FROM '{sf}/events.parquet'"""
    ).fetchall()
    per_day: dict = {}
    for u, x in rows:
        per_day.setdefault(int(x), set()).add(u)
    got = {
        r["day_idx"]: r
        for r in m.queries()["events_dau_wau_stickiness"](spark, sf).collect()
    }
    assert set(got) == set(per_day)
    for d, users in per_day.items():
        wau_set = set()
        for k in range(7):
            wau_set |= per_day.get(d - k, set())
        r = got[d]
        assert r["dau"] == len(users)
        assert r["wau"] == len(wau_set)
        assert r["stickiness_permille"] == (1000 * len(users)) // len(wau_set)


def test_linkage_clusters_match_true_cc(spark):
    """customers_linkage_clusters: the 3-round min-label propagation
    must equal TRUE connected components on the planted linkage graph
    (i.e. the fixture converges — a 4th round would be a no-op), and
    the histogram must match a plain-Python union-find."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    # rebuild the match edge set exactly as the query defines it
    rows = duckdb.sql(
        f"""
        WITH a AS (
            SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                   c_mktsegment AS seg
            FROM '{sf}/customer.parquet'
        ),
        b AS (
            SELECT id + 1000000 AS id,
                   CASE WHEN id % 7 = 0 THEN substr(name, 1, length(name) - 1) || 'X'
                        ELSE name END AS name,
                   nat,
                   CASE WHEN id % 5 = 0 THEN bal_c + 1 ELSE bal_c END AS bal_c,
                   CASE WHEN id % 11 = 0 THEN 'AUTOMOBILE' ELSE seg END AS seg
            FROM a
        )
        SELECT a.id, b.id FROM a JOIN b
          ON a.nat = b.nat AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
        WHERE (CASE WHEN a.name = b.name THEN 40 ELSE -12 END
             + CASE WHEN a.bal_c = b.bal_c THEN 22 ELSE -4 END
             + CASE WHEN a.seg = b.seg THEN 8 ELSE -9 END) >= 45
        """
    ).fetchall()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in rows:
        parent[find(u)] = find(v)
    from collections import Counter

    sizes = Counter()
    for node in list(parent):
        sizes[find(node)] += 1
    hist = Counter(sizes.values())
    expect = sorted(
        (s, c, s * c) for s, c in hist.items()
    )
    got = [
        (r["entity_size"], r["n_entities"], r["n_records"])
        for r in m.queries()["customers_linkage_clusters"](spark, sf).collect()
    ]
    assert got == expect


def test_split_leakage_matrix_differential(spark):
    """pipeline_split_leakage_check vs a Python split-tagging of the
    SAME candidate pairs (extracted via the shared LSH operators):
    matrix cells must match and the planted copies must produce
    at least one cross-split (is_leak) cell."""
    import hashlib
    from collections import Counter

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = _dedup_corpus(spark, sf)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    pairs = [
        (r["id_a"], r["id_b"], r["shared_bands"])
        for r in D.lsh_candidate_pairs(bands, "doc_id").collect()
    ]

    def split_of(doc_id: int) -> str:
        hv = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:4], 16)
        return "train" if hv < 58982 else ("val" if hv < 62258 else "test")

    cells: Counter = Counter()
    strong: Counter = Counter()
    for ia, ib, sb_ in pairs:
        key = tuple(sorted((split_of(ia), split_of(ib))))
        cells[key] += 1
        if sb_ == 2:
            strong[key] += 1
    got = {
        (r["split_a"], r["split_b"]): r
        for r in m.queries()["pipeline_split_leakage_check"](spark, sf).collect()
    }
    assert set(got) == set(cells)
    for key, r in got.items():
        assert r["n_candidate_pairs"] == cells[key]
        assert r["n_strong"] == strong[key]
        assert r["is_leak"] == (key[0] != key[1])
    assert any(r["is_leak"] for r in got.values()), "planted copies must leak"


def test_ship_latency_quantiles_differential(spark):
    """orders_ship_latency_quantiles vs plain-Python percentile_disc
    per priority on the real sf0.001 join."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT o.o_orderpriority,
                   datediff('day', o.o_orderdate, l.l_shipdate)
            FROM '{sf}/lineitem.parquet' l
            JOIN '{sf}/orders.parquet' o ON l.l_orderkey = o.o_orderkey"""
    ).fetchall()
    per: dict = {}
    for pr, d in rows:
        per.setdefault(pr, []).append(int(d))
    got = {
        r["priority"]: r
        for r in m.queries()["orders_ship_latency_quantiles"](spark, sf).collect()
    }
    assert set(got) == set(per)
    for pr, ds in per.items():
        ds.sort()
        n = len(ds)
        r = got[pr]
        assert r["n_items"] == n
        for p in (25, 50, 75, 95):
            assert r[f"p{p}_days"] == ds[(p * n + 99) // 100 - 1]


def test_multiband_sweep_differential(spark):
    """dedup_minhash_multiband_sweep vs plain-Python bucket moments
    over the SAME signature frame, plus the S-curve invariant: wider
    banding (smaller r) always flags a superset of docs."""
    from collections import Counter

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators.dedup import (
        minhash_signatures,
    )
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    sig = minhash_signatures(
        _dedup_corpus(spark, sf), "doc_id", "text", n_hashes=8
    ).collect()
    got = {
        r["band_size"]: r
        for r in m.queries()["dedup_minhash_multiband_sweep"](spark, sf).collect()
    }
    flagged_by_r = {}
    for band_size in (4, 2, 1):
        buckets: Counter = Counter()
        members: dict = {}
        for row in sig:
            for b in range(8 // band_size):
                # h columns are 16-byte binary (round-10) — the tuple
                # of bytes is the injective bucket key the fixed-width
                # concat produces
                cols = [bytes(row[f"h{b * band_size + j}"]) for j in range(band_size)]
                key = (b, tuple(cols))
                buckets[key] += 1
                members.setdefault(key, []).append(row["doc_id"])
        collision = sum(c * (c - 1) // 2 for c in buckets.values())
        flagged = {d for k, ds in members.items() for d in ds if buckets[k] >= 2}
        flagged_by_r[band_size] = flagged
        r = got[band_size]
        assert r["n_bands"] == 8 // band_size
        assert r["collision_pairs"] == collision
        assert r["max_bucket"] == max(buckets.values())
        assert r["n_flagged_docs"] == len(flagged)
    # S-curve: r=1 flags a superset of r=2, which flags a superset of r=4
    assert flagged_by_r[4] <= flagged_by_r[2] <= flagged_by_r[1]


def test_user_lifetime_differential(spark):
    """events_user_lifetime_stats vs plain-Python per-user min/max."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),
                   COUNT(*)
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for u, x, c in rows:
        lo, hi, n = per.get(u, (10**9, -(10**9), 0))
        per[u] = (min(lo, x), max(hi, x), n + c)
    from collections import defaultdict

    agg = defaultdict(lambda: [0, 0])
    for lo, hi, n in per.values():
        wk = (hi - lo) // 7
        agg[wk][0] += 1
        agg[wk][1] += n
    got = {
        r["lifetime_weeks"]: r
        for r in m.queries()["events_user_lifetime_stats"](spark, sf).collect()
    }
    assert set(got) == set(agg)
    for wk, (nu, te) in agg.items():
        r = got[wk]
        assert r["n_users"] == nu
        assert r["total_events"] == te
        assert r["events_per_user"] == te // nu


def test_crossmodal_coverage_differential(spark):
    """crossmodal_coverage_report vs plain-Python id-set coverage."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    docs = duckdb.sql(
        f"SELECT doc_id, source FROM '{sf}/documents.parquet'"
    ).fetchall()
    vecs = {
        r[0]
        for r in duckdb.sql(
            f"SELECT vec_id FROM '{sf}/embeddings.parquet'"
        ).fetchall()
    }
    per: dict = {}
    for did, src in docs:
        n, w = per.get(src, (0, 0))
        per[src] = (n + 1, w + (1 if did in vecs else 0))
    got = {
        r["source"]: r
        for r in m.queries()["crossmodal_coverage_report"](spark, sf).collect()
    }
    assert set(got) == set(per)
    for src, (n, wv) in per.items():
        r = got[src]
        assert (r["n_docs"], r["n_with_embedding"]) == (n, wv)
        assert r["coverage_permille"] == (1000 * wv) // n


def test_removal_bias_audit_differential(spark):
    """dedup_removal_bias_audit vs Python: flagged set from the shared
    LSH operators, quartiles from the sorted length list, exact cell
    counts — plus the planted-corpus expectation that flagged docs
    exist in more than one quartile (copies span the length range)."""
    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = {
        r["doc_id"]: r["text"] for r in _dedup_corpus(spark, sf).collect()
    }
    bands = D.minhash_bands(
        _dedup_corpus(spark, sf), "doc_id", "text", n_hashes=8, band_size=4
    )
    pairs = D.lsh_candidate_pairs(bands, "doc_id").select("id_a", "id_b").collect()
    flagged = {r["id_a"] for r in pairs} | {r["id_b"] for r in pairs}
    lens = sorted(len(t) for t in corpus.values())
    n = len(lens)
    q1, q2, q3 = (lens[(p * n + 99) // 100 - 1] for p in (25, 50, 75))

    def quart(ln):
        return 0 if ln <= q1 else (1 if ln <= q2 else (2 if ln <= q3 else 3))

    cells = {qi: [0, 0] for qi in range(4)}
    for did, text in corpus.items():
        qi = quart(len(text))
        cells[qi][0] += 1
        cells[qi][1] += 1 if did in flagged else 0
    got = {
        r["length_quartile"]: r
        for r in m.queries()["dedup_removal_bias_audit"](spark, sf).collect()
    }
    assert set(got) == {k for k, v in cells.items() if v[0] > 0}
    for qi, (nd, nf) in cells.items():
        if nd == 0:
            continue
        r = got[qi]
        assert (r["n_docs"], r["n_flagged"]) == (nd, nf)
        assert r["flagged_permille"] == (1000 * nf) // nd
    assert sum(1 for r in got.values() if r["n_flagged"] > 0) >= 2


def test_repeat_purchase_intervals_differential(spark):
    """orders_repeat_purchase_intervals vs plain-Python per-customer
    gap walk + percentile_disc per segment."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    orders = duckdb.sql(
        f"""SELECT o_custkey,
                   datediff('day', DATE '1992-01-01', o_orderdate),
                   o_orderkey
            FROM '{sf}/orders.parquet'"""
    ).fetchall()
    seg = dict(
        duckdb.sql(
            f"SELECT c_custkey, c_mktsegment FROM '{sf}/customer.parquet'"
        ).fetchall()
    )
    per: dict = {}
    for ck, x, ok in orders:
        per.setdefault(ck, []).append((int(x), int(ok)))
    gaps: dict = {}
    for ck, seq in per.items():
        seq.sort()
        for i in range(1, len(seq)):
            gaps.setdefault(seg[ck], []).append(seq[i][0] - seq[i - 1][0])
    got = {
        r["segment"]: r
        for r in m.queries()["orders_repeat_purchase_intervals"](spark, sf).collect()
    }
    assert set(got) == set(gaps)
    for s, gs in gaps.items():
        gs.sort()
        n = len(gs)
        r = got[s]
        assert r["n_gaps"] == n
        assert r["p50_days"] == gs[(50 * n + 99) // 100 - 1]
        assert r["p90_days"] == gs[(90 * n + 99) // 100 - 1]


def test_hash_collision_audit_differential(spark):
    """text_hash_collision_audit vs plain-Python 16-bit bucketing of
    the distinct trigram set."""
    import hashlib
    import re
    from collections import Counter

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    feats = set()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet'"
    ).fetchall():
        toks = re.split(r"\s+", text)
        for i in range(len(toks) - 2):
            feats.add(" ".join(toks[i : i + 3]))
    buckets = Counter(
        int(hashlib.md5(f.encode()).hexdigest()[:4], 16) for f in feats
    )
    [r] = m.queries()["text_hash_collision_audit"](spark, sf).collect()
    assert r["n_features"] == len(feats)
    assert r["n_buckets_used"] == len(buckets)
    assert r["n_collided_features"] == sum(c - 1 for c in buckets.values())
    assert r["max_bucket"] == max(buckets.values())
    assert r["collision_permille"] == (1000 * sum(c - 1 for c in buckets.values())) // len(feats)


def test_wilson_ci_differential(spark):
    """events_wilson_ci_error_rate vs the same IEEE double arithmetic
    in Python (CPython floats are IEEE-754 doubles; identical op order
    gives bit-identical results), plus interval sanity."""
    import math

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),
                   COUNT(*),
                   SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END)
            FROM '{sf}/events.parquet' GROUP BY 1"""
    ).fetchall()
    got = {
        r["day_idx"]: r
        for r in m.queries()["events_wilson_ci_error_rate"](spark, sf).collect()
    }
    assert set(got) == {int(x) for x, _, _ in rows}
    for x, n, e in rows:
        n_f, e_f = float(n), float(e)
        p = e_f / n_f
        z2 = 1.96 * 1.96
        half = 1.96 * math.sqrt((p * (1.0 - p) + z2 / (4.0 * n_f)) / n_f)
        lo = math.floor(1e6 * ((p + z2 / (2.0 * n_f) - half) / (1.0 + z2 / n_f)))
        hi = math.floor(1e6 * ((p + z2 / (2.0 * n_f) + half) / (1.0 + z2 / n_f)))
        r = got[int(x)]
        assert (r["n_events"], r["n_errors"]) == (n, e)
        assert r["wilson_lo_micro"] == lo
        assert r["wilson_hi_micro"] == hi
        # interval sanity: lo ≤ point rate ≤ hi, and inside [0, 1e6]
        assert 0 <= r["wilson_lo_micro"] <= 1000 * r["rate_permille"] + 1
        assert 1000 * r["rate_permille"] <= r["wilson_hi_micro"] <= 1000000


def test_runs_test_differential(spark):
    """stats_runs_test_daily vs a plain-Python runs count and the same
    IEEE z computation on the real sf0.001 events."""
    import math

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT event_type,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE)),
                   COUNT(*)
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    per: dict = {}
    for ty, x, c in rows:
        per.setdefault(ty, {})[int(x)] = int(c)
    got = {
        r["event_type"]: r
        for r in m.queries()["stats_runs_test_daily"](spark, sf).collect()
    }
    for ty, days in per.items():
        xs = sorted(days)
        signs = []
        for i in range(1, len(xs)):
            d = days[xs[i]] - days[xs[i - 1]]
            if d != 0:
                signs.append(1 if d > 0 else -1)
        runs = 1 + sum(1 for i in range(1, len(signs)) if signs[i] != signs[i - 1])
        n_up = sum(1 for s in signs if s == 1)
        n_dn = len(signs) - n_up
        r = got[ty]
        assert (r["runs"], r["n_up"], r["n_down"]) == (runs, n_up, n_dn)
        if n_up and n_dn and n_up + n_dn >= 2:
            nf = float(n_up) + n_dn
            two_nn = 2.0 * n_up * n_dn
            var = (two_nn * (two_nn - n_up - n_dn)) / (nf * nf * (nf - 1.0))
            if var > 0:
                z = math.floor(1e6 * (float(runs) - (1.0 + two_nn / nf)) / math.sqrt(var))
                assert r["z_micro"] == z


def test_good_turing_differential(spark):
    """vocab_good_turing_unseen_mass vs plain-Python token counting."""
    import re
    from collections import Counter

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    cnt: Counter = Counter()
    for (text,) in duckdb.sql(
        f"SELECT text FROM '{sf}/documents.parquet'"
    ).fetchall():
        cnt.update(re.split(r"\s+", text))
    n = sum(cnt.values())
    v = len(cnt)
    n1 = sum(1 for c in cnt.values() if c == 1)
    n2 = sum(1 for c in cnt.values() if c == 2)
    [r] = m.queries()["vocab_good_turing_unseen_mass"](spark, sf).collect()
    assert (r["n_tokens"], r["vocab_size"]) == (n, v)
    assert (r["n_hapax"], r["n_dis_legomena"]) == (n1, n2)
    assert r["unseen_mass_permille"] == (1000 * n1) // n
    assert r["hapax_vocab_permille"] == (1000 * n1) // v


def test_type_mix_drift_differential(spark):
    """events_type_mix_drift_weekly vs plain-Python weekly TVD."""
    from collections import Counter

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7,
                   event_type, COUNT(*)
            FROM '{sf}/events.parquet' GROUP BY 1, 2"""
    ).fetchall()
    wt: dict = {}
    ot: Counter = Counter()
    for wk, ty, c in rows:
        wt.setdefault(int(wk), Counter())[ty] = int(c)
        ot[ty] += int(c)
    n = sum(ot.values())
    got = {
        r["week"]: r
        for r in m.queries()["events_type_mix_drift_weekly"](spark, sf).collect()
    }
    assert set(got) == set(wt)
    for wk, cc in wt.items():
        nw = sum(cc.values())
        sdev = sum(
            abs((1000000 * cc.get(ty, 0)) // nw - (1000000 * ot[ty]) // n)
            for ty in ot  # FULL type set: zero cells contribute |0 - p_all|
        )
        r = got[wk]
        assert r["n_events"] == nw
        assert r["tvd_permille"] == sdev // 2000


def test_token_savings_differential(spark):
    """dedup_token_savings_report vs a Python union-find with min-id
    representatives over the SAME verified pair set, plus the planted
    expectation that dedup saves a nonzero token mass."""
    import re

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = {r["doc_id"]: r["text"] for r in _dedup_corpus(spark, sf).collect()}
    pairs = D.minhash_verified_pairs(
        _dedup_corpus(spark, sf), "doc_id", "text",
        n_hashes=8, band_size=4, min_permille=300,
    ).select("id_a", "id_b").collect()
    parent = {d: d for d in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            # union by min id so the root IS the representative
            lo, hi = (a, b) if a < b else (b, a)
            parent[hi] = lo
    comp = {d: find(d) for d in corpus}
    toks = {d: len(re.split(r"\s+", t)) for d, t in corpus.items()}
    removed = [d for d in corpus if comp[d] != d]
    [r] = m.queries()["dedup_token_savings_report"](spark, sf).collect()
    assert r["n_docs"] == len(corpus)
    assert r["n_clusters"] == len(set(comp.values()))
    assert r["n_removed_docs"] == len(removed)
    assert r["tokens_total"] == sum(toks.values())
    assert r["tokens_removed"] == sum(toks[d] for d in removed)
    assert r["tokens_removed_permille"] == (
        1000 * sum(toks[d] for d in removed)
    ) // sum(toks.values())
    assert r["tokens_removed"] > 0, "planted copies must yield savings"


def test_time_to_convert_differential(spark):
    """events_time_to_convert_quantiles vs plain-Python first-view /
    first-purchase-after walk + percentile_disc."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"SELECT user_id, event_type, epoch_ms(ts) FROM '{sf}/events.parquet'"
    ).fetchall()
    fv: dict = {}
    for u, ty, ems in rows:
        if ty == "view":
            fv[u] = min(fv.get(u, ems), ems)
    fp: dict = {}
    for u, ty, ems in rows:
        if ty == "purchase" and u in fv and ems >= fv[u]:
            fp[u] = min(fp.get(u, ems), ems)
    gaps = sorted((fp[u] - fv[u]) // 60000 for u in fp)
    n = len(gaps)
    [r] = m.queries()["events_time_to_convert_quantiles"](spark, sf).collect()
    assert r["n_converters"] == n
    for p in (50, 90, 99):
        assert r[f"p{p}_min"] == gaps[(p * n + 99) // 100 - 1]


def test_new_vs_returning_differential(spark):
    """events_new_vs_returning_daily vs plain-Python first-day sets,
    including the identity new + returning = active."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT DISTINCT user_id,
                   datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
            FROM '{sf}/events.parquet'"""
    ).fetchall()
    per_day: dict = {}
    first: dict = {}
    for u, x in rows:
        per_day.setdefault(int(x), set()).add(u)
        first[u] = min(first.get(u, int(x)), int(x))
    got = {
        r["day_idx"]: r
        for r in m.queries()["events_new_vs_returning_daily"](spark, sf).collect()
    }
    assert set(got) == set(per_day)
    for d, users in per_day.items():
        new = sum(1 for u in users if first[u] == d)
        r = got[d]
        assert r["active_users"] == len(users)
        assert r["new_users"] == new
        assert r["returning_users"] == len(users) - new
        assert r["new_users"] + r["returning_users"] == r["active_users"]
        assert r["new_share_permille"] == (1000 * new) // len(users)


def test_hour_weekday_heatmap_differential(spark):
    """events_hour_weekday_heatmap vs plain-Python epoch bucketing."""
    from collections import Counter

    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7,
                   (epoch_ms(ts) // 3600000) % 24
            FROM '{sf}/events.parquet'"""
    ).fetchall()
    cells = Counter((int(w), int(h)) for w, h in rows)
    wt = Counter()
    for (w, _), n in cells.items():
        wt[w] += n
    got = {
        (r["weekday"], r["hour_utc"]): r
        for r in m.queries()["events_hour_weekday_heatmap"](spark, sf).collect()
    }
    assert set(got) == set(cells)
    for (w, h), r in got.items():
        assert r["n_events"] == cells[(w, h)]
        assert r["weekday_share_permille"] == (1000 * cells[(w, h)]) // wt[w]


def test_revenue_ma7_differential(spark):
    """orders_daily_revenue_7d_ma vs plain-Python trailing average
    over present days, including partial head windows."""
    import duckdb

    import __spark_entry__ as m

    sf = "/root/testdata/sf0.001"
    rows = duckdb.sql(
        f"""SELECT datediff('day', DATE '1992-01-01', o_orderdate),
                   SUM(CAST(round(o_totalprice * 100) AS BIGINT))
            FROM '{sf}/orders.parquet' GROUP BY 1"""
    ).fetchall()
    daily = {int(x): int(r) for x, r in rows}
    got = {
        r["day_idx"]: r
        for r in m.queries()["orders_daily_revenue_7d_ma"](spark, sf).collect()
    }
    assert set(got) == set(daily)
    for x, rev in daily.items():
        window = [daily[d] for d in range(x - 6, x + 1) if d in daily]
        r = got[x]
        assert r["revenue_cents"] == rev
        assert r["window_days"] == len(window)
        assert r["ma7_cents"] == sum(window) // len(window)


def test_soft_dedup_weights_differential(spark):
    """sample_soft_dedup_weights vs the same union-find in Python:
    per-size weights, doc counts, raw and effective token mass — plus
    the conservation law Σ effective ≤ 1000·Σ raw with equality iff
    every cluster is a singleton."""
    import re
    from collections import Counter

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = {r["doc_id"]: r["text"] for r in _dedup_corpus(spark, sf).collect()}
    pairs = D.minhash_verified_pairs(
        _dedup_corpus(spark, sf), "doc_id", "text",
        n_hashes=8, band_size=4, min_permille=300,
    ).select("id_a", "id_b").collect()
    parent = {d: d for d in corpus}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for r in pairs:
        a, b = find(r["id_a"]), find(r["id_b"])
        if a != b:
            parent[max(a, b)] = min(a, b)
    comp = {d: find(d) for d in corpus}
    sizes = Counter(comp.values())
    toks = {d: len(re.split(r"\s+", t)) for d, t in corpus.items()}
    agg: dict = {}
    for d in corpus:
        s = sizes[comp[d]]
        row = agg.setdefault(s, [0, 0, 0])
        row[0] += 1
        row[1] += toks[d]
        row[2] += (1000 * toks[d]) // s
    got = {
        r["cluster_size"]: r
        for r in m.queries()["sample_soft_dedup_weights"](spark, sf).collect()
    }
    assert set(got) == set(agg)
    for s, (nd, tr, te) in agg.items():
        r = got[s]
        assert r["weight_permille"] == 1000 // s
        assert (r["n_docs"], r["tokens_raw"], r["tokens_effective_milli"]) == (
            nd, tr, te,
        )
    total_eff = sum(r["tokens_effective_milli"] for r in got.values())
    total_raw = sum(r["tokens_raw"] for r in got.values())
    assert total_eff <= 1000 * total_raw
    assert any(s > 1 for s in got), "planted clusters must exist"


def test_lsh_precision_differential(spark):
    """dedup_lsh_precision_report vs Python verification of the same
    candidate set, plus the S-curve monotonicity: 2-band agreers
    verify at a rate ≥ 1-band candidates."""
    import re

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import dedup as D
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _dedup_corpus,
    )

    sf = "/root/testdata/sf0.001"
    corpus = {r["doc_id"]: r["text"] for r in _dedup_corpus(spark, sf).collect()}

    def shingles(text):
        toks = re.split(r"\s+", text)
        return {
            " ".join(toks[i : i + 3]) for i in range(max(len(toks) - 2, 0))
        } or {text}  # fall back like the operator for short docs

    sh = {d: shingles(t) for d, t in corpus.items()}
    bands = D.minhash_bands(
        _dedup_corpus(spark, sf), "doc_id", "text", n_hashes=8, band_size=4
    )
    cand = [
        (r["id_a"], r["id_b"], r["shared_bands"])
        for r in D.lsh_candidate_pairs(bands, "doc_id").collect()
    ]
    per = {}
    for a, b, sb_ in cand:
        inter = len(sh[a] & sh[b])
        union = len(sh[a]) + len(sh[b]) - inter
        ok = (1000 * inter) // union >= 300
        row = per.setdefault(sb_, [0, 0])
        row[0] += 1
        row[1] += 1 if ok else 0
    got = {
        r["shared_bands"]: r
        for r in m.queries()["dedup_lsh_precision_report"](spark, sf).collect()
    }
    assert set(got) == set(per)
    for sb_, (nc, nv) in per.items():
        r = got[sb_]
        assert (r["n_candidates"], r["n_verified"]) == (nc, nv)
        assert r["precision_permille"] == (1000 * nv) // nc
    if 1 in got and 2 in got:
        assert got[2]["precision_permille"] >= got[1]["precision_permille"]


def test_linkage_capped_equals_uncapped_cc_and_bounds_candidates(spark):
    """customers_linkage_clusters_capped: on the planted repeat-heavy
    fixture the hot blocks are identical-record cliques, so two-star
    emission must yield EXACTLY the entity histogram that exact
    all-pairs blocking yields (true CC via plain-Python union-find over
    the uncapped match edges), while emitting far fewer candidates.
    sf0.01 so the cap actually engages (~20 hot ids per nation per
    side -> 400 candidates/block > 128; sf0.001 blocks stay cold)."""
    import duckdb

    import __spark_entry__ as m
    from sales_azure_data_engineer_project_spark.operators import linkage as LK
    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _FS_HOT_CAP,
        _FS_MATCH,
        _FS_W,
        _fs_sides,
    )
    from sales_azure_data_engineer_project_spark.io import load_testdata

    sf = "/root/testdata/sf0.01"
    planted = f"""
        WITH a0 AS (
            SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
                   CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
                   c_mktsegment AS seg
            FROM '{sf}/customer.parquet'
        ),
        a AS (
            SELECT id,
                   CASE WHEN id % 3 = 0 THEN 'Customer#HOTBLOCK' ELSE name END AS name,
                   nat,
                   CASE WHEN id % 3 = 0 THEN CAST(424242 + nat AS BIGINT)
                        ELSE bal_c END AS bal_c,
                   CASE WHEN id % 3 = 0 THEN 'BUILDING' ELSE seg END AS seg
            FROM a0
        ),
        b AS (
            SELECT id + 1000000 AS id,
                   CASE WHEN id % 3 <> 0 AND id % 7 = 0
                        THEN substr(name, 1, length(name) - 1) || 'X'
                        ELSE name END AS name,
                   nat,
                   CASE WHEN id % 3 <> 0 AND id % 5 = 0 THEN bal_c + 1
                        ELSE bal_c END AS bal_c,
                   CASE WHEN id % 3 <> 0 AND id % 11 = 0 THEN 'AUTOMOBILE'
                        ELSE seg END AS seg
            FROM a
        )
    """
    # TRUE components: exact all-pairs blocking (no cap) -> union-find.
    # Weights interpolated from _FS_W/_FS_MATCH (ADVICE r7) so a future
    # weight change keeps this baseline in sync with the registered
    # oracle instead of silently diverging.
    edges = duckdb.sql(
        planted
        + f"""
        SELECT a.id, b.id FROM a JOIN b
          ON a.nat = b.nat AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
        WHERE (CASE WHEN a.name = b.name THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END
             + CASE WHEN a.bal_c = b.bal_c THEN {_FS_W['bal'][0]} ELSE {_FS_W['bal'][1]} END
             + CASE WHEN a.seg = b.seg THEN {_FS_W['seg'][0]} ELSE {_FS_W['seg'][1]} END)
              >= {_FS_MATCH}
        """
    ).fetchall()
    parent: dict = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for u, v in edges:
        parent[find(u)] = find(v)
    from collections import Counter

    sizes = Counter()
    for node in list(parent):
        sizes[find(node)] += 1
    hist = Counter(sizes.values())
    expect = sorted((s, c, s * c) for s, c in hist.items())
    got = [
        (r["entity_size"], r["n_entities"], r["n_records"])
        for r in m.queries()["customers_linkage_clusters_capped"](
            spark, sf
        ).collect()
    ]
    assert got == expect
    # the fixture genuinely engages the cap...
    max_block = duckdb.sql(
        planted
        + """
        , sa AS (SELECT nat, substr(name,1,17) AS blk, COUNT(*) AS n
                 FROM a GROUP BY 1, 2),
        sb AS (SELECT nat, substr(name,1,17) AS blk, COUNT(*) AS n
               FROM b GROUP BY 1, 2)
        SELECT MAX(sa.n * sb.n) FROM sa JOIN sb
          ON sb.nat = sa.nat AND sb.blk = sa.blk
        """
    ).fetchone()[0]
    assert max_block > _FS_HOT_CAP
    # ...and star emission bounds the candidate set well below all-pairs
    cust = load_testdata(spark, sf, "customer")
    aa, bb = _fs_sides(cust, planted_hot=True)
    capped_n = LK.blocked_bipartite_pairs(
        aa, bb, ["nat", "blk"], "id", "b_id", hot_block_cap=_FS_HOT_CAP
    ).count()
    uncapped_n = LK.blocked_bipartite_pairs(
        aa, bb, ["nat", "blk"], "id", "b_id", hot_block_cap=None
    ).count()
    assert capped_n < uncapped_n / 2
    # every hot-block candidate the star emits still scores as a match
    # (clique fixture), so CC preservation is by construction, not luck
    assert len(edges) > 0


def test_blocked_bipartite_pairs_edges(spark):
    """Operator edge cases: one-sided blocks emit nothing, cold blocks
    are exact all-pairs, hot blocks emit exactly n_a + n_b - 1 star
    edges with the min-id hubs."""
    from sales_azure_data_engineer_project_spark.operators import linkage as LK

    a = spark.createDataFrame(
        # block 'x': 3 A rows; block 'y': 1 A row; block 'z': A only
        [(1, "x"), (2, "x"), (3, "x"), (10, "y"), (20, "z")],
        ["id", "blk"],
    )
    b = spark.createDataFrame(
        # block 'x': 2 B rows; block 'y': 1; block 'w': B only
        [(101, "x"), (102, "x"), (110, "y"), (120, "w")],
        ["b_id", "blk"],
    )
    exact = LK.blocked_bipartite_pairs(a, b, ["blk"], "id", "b_id")
    got = {(r["id"], r["b_id"]) for r in exact.collect()}
    assert got == {
        (1, 101), (1, 102), (2, 101), (2, 102), (3, 101), (3, 102),
        (10, 110),
    }  # one-sided blocks z/w emit nothing
    # cap=10: block x (3*2=6 <= 10) stays exact -> identical output
    capped10 = LK.blocked_bipartite_pairs(
        a, b, ["blk"], "id", "b_id", hot_block_cap=10
    )
    assert {(r["id"], r["b_id"]) for r in capped10.collect()} == got
    # cap=5: block x goes hot -> two-star: hub_a=1 x {101,102} plus
    # {2,3} x hub_b=101 — exactly n_a + n_b - 1 = 4 edges
    capped5 = LK.blocked_bipartite_pairs(
        a, b, ["blk"], "id", "b_id", hot_block_cap=5
    )
    hot = {(r["id"], r["b_id"]) for r in capped5.collect()}
    assert hot == {(1, 101), (1, 102), (2, 101), (3, 101), (10, 110)}


def test_ivf_cadence_engine_parity():
    """The sqrt(N) centroid cadence must compute identically in Python
    (_ivf_cadence) and the oracle SQL (GREATEST(61, ceil(sqrt(N)))) for
    any corpus size — including the perfect-square boundary (61^2) and
    the oracle-SF floor region."""
    import duckdb

    from sales_azure_data_engineer_project_spark.queries_extensions import (
        _ivf_cadence,
    )

    sizes = [1, 60, 61, 150, 1500, 3720, 3721, 3722, 15000, 15360,
             150000, 460800, 460801, 10**9]
    for n in sizes:
        sql = duckdb.sql(
            f"SELECT GREATEST(61, CAST(ceil(sqrt({n})) AS BIGINT))"
        ).fetchone()[0]
        assert _ivf_cadence(n) == sql, n


def test_dedup_clusters_cap16_reproduces_uncapped_components():
    """The round-10 default-path swap (capped pair tier feeding CC) must
    NOT change what `dedup_clusters` computes at oracle SFs: cap=16 was
    chosen precisely because an old-vs-new oracle differential showed
    cap=4 drops real edges at sf0.001 (max shingle df 14) and sf0.1
    (max df 32).  This pins (a) the registered cap value and (b) the
    capped oracle == uncapped oracle equality at both small SFs, so a
    future cap change re-triggers the verification instead of silently
    altering the registered query's results."""
    import duckdb

    import os as _os

    import __spark_entry__ as entry_mod

    from sales_azure_data_engineer_project_spark.schemas import TESTDATA_TABLES

    sql = entry_mod.oracle_sql()["dedup_clusters"]
    assert "d.df <= 16" in sql, "registered cap changed - re-verify vs uncapped"
    uncapped = sql.replace("d.df <= 16", "d.df <= 1000000000")
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        con = duckdb.connect()
        for t in TESTDATA_TABLES:
            p = f"{sf}/{t}.parquet"
            if _os.path.exists(p):
                con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
        a = con.execute(sql).df().sort_values(["doc_id"]).reset_index(drop=True)
        b = con.execute(uncapped).df().sort_values(["doc_id"]).reset_index(drop=True)
        assert a.equals(b), f"cap=16 changes components at {sf}"
        con.close()
