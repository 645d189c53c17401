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


def test_minhash_lsh_candidates(spark, docs):
    bands = D.minhash_bands(docs, "doc_id", "text")
    cands = {(r["id_a"], r["id_b"]) for r in D.lsh_candidate_pairs(bands, "doc_id").collect()}
    assert (1, 2) in cands  # identical docs always collide in every band
    assert all((4 not in p) for p in cands)


def test_simhash_identical_docs_equal(spark, docs):
    fp = {r["doc_id"]: r["simhash16"] for r in D.simhash16(docs, "doc_id", "text").collect()}
    assert fp[1] == fp[2]
    assert len(fp[1]) == 16 and set(fp[1]) <= {"0", "1"}
    assert fp[1] != fp[4]


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
