r"""Training-data extension queries: dedup, similarity, text analysis,
multimodal — each registered with a DuckDB oracle where SQL-expressible.

The dedup queries run over a *planted-duplicate corpus* built in-query
(documents ∪ near-dups with the last 3 tokens dropped ∪ exact copies)
so the operators demonstrably find duplicates; both sides build the
identical corpus.

Engine-parity contracts used throughout:
- tokenization: regex split on ``\s+`` (Spark split == DuckDB
  string_split_regex)
- hashes: md5 hex; minhash min is lexicographic over hex strings
- ratios: integer ``div`` (never float division)
- cosine: strict index-order double folds — bit-identical to DuckDB's
  list_dot_product (verified), so raw-double threshold compares are safe
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .io import load_testdata
from .operators import dedup as D
from .operators import linkage as LK
from .operators import multimodal as M
from .operators import similarity as S
from .operators import text as X
from .queries_core import register
from .caching import tracked_persist

# ---------------------------------------------------------------------------
# Shared corpora
# ---------------------------------------------------------------------------


def _fan_out(df: DataFrame) -> DataFrame:
    """Spread a small-file input across all cores before compute-heavy
    per-row work (shingling, hashing, vector folds).

    A sub-128MB parquet arrives as ONE partition, which serializes the
    downstream O(N²)/O(N·H) compute on a single thread; at production
    scale the inputs are multi-GB and partition naturally, so this
    repartition reproduces the real parallelism locally.  Cost: a tiny
    shuffle of the small table.

    Width = the session's configured shuffle partitions, NOT
    ``defaultParallelism`` (round 11): the two agree at bench/oracle
    SFs (session.py sizes both from $SPARK_GRAFT_CPUS), but the scale
    harness raises ``spark.sql.shuffle.partitions`` per blow-up tier
    precisely so per-task state shrinks — a hardcoded cores-width here
    overrode that, and at 3000× the quantizer's wide-cache build
    unrolled ~190 MB of rows per task × 32 concurrent tasks and
    heap-OOM'd a stock 8 GB JVM (guide §2.2 "scale-adaptive, not a
    constant tuned for local mode")."""
    spark = df.sparkSession
    width = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(width)


def _ivf_cadence(n_vectors: int) -> int:
    """Centroid cadence for the inline-IVF coarse quantizers (the
    ``vec_id % cadence == 0`` stand-in that keeps the oracle
    deterministic): ``max(61, ceil(sqrt(N)))``, i.e. k = N/cadence ≈ √N
    once the corpus outgrows 61² vectors — the standard FAISS sizing
    rule.  Round-7 measurement (SCALING.md): the historical FIXED
    cadence 61 means k ∝ N, and the broadcast coarse-assignment's N·k
    dot products go quadratic — similarity_ann_ivf_sq8 measured decade
    α 0.78 with a 10×→30× segment of ~1.7.  √N-scaled k caps assignment
    at N^1.5 (and at true 100 TB the assignment itself goes
    hierarchical — route through √k super-cells first; same contract
    note as the kmeans seeding in ``_sq8_kmeans_cells``).  At every
    oracle SF (N ≤ 3721) the floor keeps cadence = 61, bit-identical to
    the historical behavior; both engines compute the same expression.
    """
    import math

    return max(61, math.ceil(math.sqrt(n_vectors)))


def _ivf_centroids(n: DataFrame) -> DataFrame:
    """Centroid frame (cid, cv) for the inline-IVF coarse quantizers,
    with the ``_ivf_cadence`` √N rule derived INSIDE the plan (ADVICE
    r7): the corpus count is a 1-row aggregate broadcast-cross-joined
    under the centroid filter — the same shape as the oracle's ``cadc``
    CTE — instead of an eager ``.count()`` driver action that cost a
    separate full-scan job per IVF query even at oracle SFs where the
    floor pins the cadence to 61.  ``n`` must expose (vec_id, v)."""
    cnt = n.agg(F.count(F.lit(1)).alias("_n"))
    cad = F.greatest(
        F.lit(61).cast("bigint"),
        F.ceil(F.sqrt(F.col("_n"))).cast("bigint"),
    )
    return (
        n.crossJoin(F.broadcast(cnt))
        .filter(F.col("vec_id") % cad == 0)
        .select(F.col("vec_id").alias("cid"), F.col("v").alias("cv"))
    )



def _dedup_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ planted near-dups (doc_id+100000, last 3 tokens cut,
    every 10th doc) ∪ planted exact dups (doc_id+200000, every 17th)."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents").select("doc_id", "text"))
    toks = F.split(F.col("text"), X.TOKEN_RE)
    near = docs.filter(F.col("doc_id") % 10 == 0).select(
        (F.col("doc_id") + 100000).alias("doc_id"),
        F.concat_ws(
            " ", F.slice(toks, F.lit(1), F.greatest(F.size(toks) - 3, F.lit(1)))
        ).alias("text"),
    )
    exact = docs.filter(F.col("doc_id") % 17 == 0).select(
        (F.col("doc_id") + 200000).alias("doc_id"), "text"
    )
    return docs.unionByName(near).unionByName(exact)


_CORPUS_SQL = r"""
    base AS (SELECT doc_id, text FROM documents),
    tk0 AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM base),
    near AS (SELECT doc_id + 100000 AS doc_id,
                    array_to_string(toks[1:greatest(len(toks)-3, 1)], ' ') AS text
             FROM tk0 WHERE doc_id % 10 = 0),
    ex AS (SELECT doc_id + 200000 AS doc_id, text FROM base WHERE doc_id % 17 = 0),
    corpus AS (SELECT * FROM base UNION ALL SELECT * FROM near
               UNION ALL SELECT * FROM ex)
"""

_SHINGLE_SQL = r"""
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END)) AS sh
        FROM (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus)
    )
"""

# ---------------------------------------------------------------------------
# Text analysis
# ---------------------------------------------------------------------------


@register(
    "text_quality_stats",
    r"""
    WITH t AS (SELECT doc_id, text, string_split_regex(text, '\s+') AS toks
               FROM documents)
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(len(toks) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(toks)) AS BIGINT) AS n_types,
           CAST((1000 * list_sum(list_transform(toks, t -> length(t)))) // len(toks) AS BIGINT) AS avg_tok_len_milli,
           CAST((1000 * len(list_distinct(toks))) // len(toks) AS BIGINT) AS ttr_permille
    FROM t
    ORDER BY doc_id
    """,
)
def text_quality_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select("doc_id", *X.quality_columns("text")).orderBy("doc_id")


@register(
    "text_lang_id",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ), agg AS (
        SELECT doc_id,
               CAST(COUNT(*) AS BIGINT) AS n_tokens,
               CAST(SUM(CASE WHEN tok IN ('the','a','an','of','and','to','is','in','it','for')
                        THEN 1 ELSE 0 END) AS BIGINT) AS stop_hits
        FROM tok GROUP BY doc_id
    )
    SELECT doc_id, n_tokens, stop_hits,
           CASE WHEN stop_hits * 20 >= n_tokens THEN 'en-like' ELSE 'other' END AS predicted
    FROM agg
    ORDER BY doc_id
    """,
)
def text_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """N-gram/stopword-ratio language heuristic (≥5% stopword tokens →
    'en-like').  A real lang-id model would be a Pandas UDF; the
    heuristic keeps the operator oracle-checkable."""
    docs = load_testdata(spark, sf_dir, "documents")
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
    agg = tok.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("tok").isin(*X.EN_STOPWORDS), 1).otherwise(0))
        .cast("bigint")
        .alias("stop_hits"),
    )
    return agg.select(
        "doc_id",
        "n_tokens",
        "stop_hits",
        F.when(F.col("stop_hits") * 20 >= F.col("n_tokens"), "en-like")
        .otherwise("other")
        .alias("predicted"),
    ).orderBy("doc_id")


@register(
    "text_fingerprints",
    r"""
    SELECT doc_id,
           md5(text) AS content_md5,
           md5(array_to_string(list_sort(list_distinct(string_split_regex(text, '\s+'))), ' ')) AS bag_md5
    FROM documents
    ORDER BY doc_id
    """,
)
def text_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_testdata(spark, sf_dir, "documents")
    return docs.select(
        "doc_id",
        X.fingerprint_md5("text").alias("content_md5"),
        X.fingerprint_sorted_tokens("text").alias("bag_md5"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Dedup family (over the planted-duplicate corpus)
# ---------------------------------------------------------------------------


@register(
    "dedup_exact",
    f"""
    WITH {_CORPUS_SQL}
    SELECT md5(text) AS text_md5,
           CAST(MIN(doc_id) AS BIGINT) AS keeper_id,
           CAST(COUNT(*) AS BIGINT) AS n_copies
    FROM corpus
    GROUP BY md5(text)
    ORDER BY text_md5
    """,
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dedup_corpus(spark, sf_dir)
    return D.exact_dedup_groups(corpus, "doc_id", "text").orderBy("text_md5")


@register(
    "dedup_ngram_jaccard",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(c AS BIGINT) AS common,
           CAST((1000 * c) // (sa.sz + sb.sz - c) AS BIGINT) AS jac_permille
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dedup_corpus(spark, sf_dir)
    return D.jaccard_pairs(corpus, "doc_id", "text", min_permille=300).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_ngram_jaccard_capped",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
    kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfreq d ON s.sh = d.sh
             WHERE d.df <= 4),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(c AS BIGINT) AS common,
           CAST((1000 * c) // (sa.sz + sb.sz - c) AS BIGINT) AS jac_permille
    FROM common
    JOIN sizes sa ON sa.doc_id = id_a
    JOIN sizes sb ON sb.doc_id = id_b
    WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ORDER BY id_a, id_b
    """,
)
def dedup_ngram_jaccard_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact n-gram tier with its ``posting_freq_cap`` valve ON —
    the 100 TB form of ``dedup_ngram_jaccard`` (VERDICT r8 "Next" #4):
    shingles whose document frequency exceeds 4 are treated as
    boilerplate and excluded, with per-doc sizes recomputed over the
    retained shingles, so the score is integer-exact Jaccard over the
    df-filtered shingle universe.  Every retained posting bucket is
    ≤ cap rows ⇒ the self-join output is ≤ cap·|postings|/2 — linear
    in the corpus no matter how skewed the df head gets (the uncapped
    tier is Σ bucket², the fleet's worst 300× exponent).  On this
    corpus the cap fires on 463 shingles at sf0.01 yet preserves all
    116 uncapped pairs: boilerplate shingles connect docs whose
    pairwise Jaccard never clears 300‰ anyway — the precision framing
    behind Broder's stop-shingle lists (SPIRE 2000)."""
    corpus = _dedup_corpus(spark, sf_dir)
    return D.jaccard_pairs(
        corpus, "doc_id", "text", min_permille=300, posting_freq_cap=4
    ).orderBy("id_a", "id_b")


@register(
    "pipeline_filter_ablation",
    r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               (1000 * len(list_distinct(toks))) // len(toks) AS ttr_permille,
               (1000 * len(list_filter(toks,
                    x -> contains(x, '#') OR contains(x, '...'))))
                    // len(toks) AS symbol_permille,
               len(list_distinct(list_filter(toks, x -> x IN
                   ('the','a','an','of','and','to','is','in','it','for'))))
                   AS n_stop_distinct
        FROM t WHERE len(toks) > 0
    ),
    fl AS (
        SELECT doc_id,
               CASE WHEN n_tokens BETWEEN 50 AND 100000 THEN 0 ELSE 1 END AS f_len,
               CASE WHEN ttr_permille >= 300 THEN 0 ELSE 1 END AS f_ttr,
               CASE WHEN symbol_permille < 100 THEN 0 ELSE 1 END AS f_sym,
               CASE WHEN n_stop_distinct >= 2 THEN 0 ELSE 1 END AS f_stop
        FROM m
    ),
    agg AS (
        SELECT COUNT(*) AS n_docs,
               SUM(f_len) AS len_fail,
               SUM(CASE WHEN f_len = 1 AND f_ttr + f_sym + f_stop = 0
                        THEN 1 ELSE 0 END) AS len_uniq,
               SUM(f_ttr) AS ttr_fail,
               SUM(CASE WHEN f_ttr = 1 AND f_len + f_sym + f_stop = 0
                        THEN 1 ELSE 0 END) AS ttr_uniq,
               SUM(f_sym) AS sym_fail,
               SUM(CASE WHEN f_sym = 1 AND f_len + f_ttr + f_stop = 0
                        THEN 1 ELSE 0 END) AS sym_uniq,
               SUM(f_stop) AS stop_fail,
               SUM(CASE WHEN f_stop = 1 AND f_len + f_ttr + f_sym = 0
                        THEN 1 ELSE 0 END) AS stop_uniq,
               SUM(CASE WHEN f_len + f_ttr + f_sym + f_stop = 0
                        THEN 1 ELSE 0 END) AS pass_all
        FROM fl
    )
    SELECT filter_name,
           CAST(n_fail AS BIGINT) AS n_fail,
           CAST(n_unique_fail AS BIGINT) AS n_unique_fail,
           CAST((1000 * n_fail) // n_docs AS BIGINT) AS fail_permille,
           CAST(pass_all AS BIGINT) AS n_pass_all
    FROM (
        SELECT 'length' AS filter_name, len_fail AS n_fail,
               len_uniq AS n_unique_fail, n_docs, pass_all FROM agg
        UNION ALL
        SELECT 'stopwords', stop_fail, stop_uniq, n_docs, pass_all FROM agg
        UNION ALL
        SELECT 'symbol', sym_fail, sym_uniq, n_docs, pass_all FROM agg
        UNION ALL
        SELECT 'ttr', ttr_fail, ttr_uniq, n_docs, pass_all FROM agg
    )
    ORDER BY filter_name
    """,
)
def pipeline_filter_ablation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-ablation report — the observability query every corpus
    pipeline runs before tuning thresholds: for each quality filter
    (length bounds, type-token-ratio floor, symbol-ratio ceiling,
    stopword-diversity floor), how many documents it kills in total
    and how many it UNIQUELY kills (fails it while passing all
    others).  Unique-kill counts are what tell you a filter is pulling
    its weight vs merely shadowing another — the standard ablation
    framing in Gopher §A1.1 / Dolma's filter analyses.

    Scale shape: ONE narrow pass binds the token array and derives all
    four flags per document, then ONE map-side-combined global
    aggregate computes every count; the 4-row report is produced by a
    union over that single aggregate row (Spark: ``stack``) — no
    second scan, no join, no per-filter pass."""
    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select("doc_id", F.split("text", X.TOKEN_RE).alias("toks"))
    m = t.filter(F.size("toks") > 0).select(
        "doc_id",
        F.size("toks").alias("n_tokens"),
        F.expr("div(1000 * size(array_distinct(toks)), size(toks))").alias(
            "ttr_permille"
        ),
        F.expr(
            "div(1000 * size(filter(toks, x -> contains(x, '#')"
            " OR contains(x, '...'))), size(toks))"
        ).alias("symbol_permille"),
        F.size(
            F.array_distinct(F.filter(F.col("toks"), lambda x: x.isin(*X.EN_STOPWORDS)))
        ).alias("n_stop_distinct"),
    )
    fl = m.select(
        F.when(F.col("n_tokens").between(50, 100000), 0).otherwise(1).alias("f_len"),
        F.when(F.col("ttr_permille") >= 300, 0).otherwise(1).alias("f_ttr"),
        F.when(F.col("symbol_permille") < 100, 0).otherwise(1).alias("f_sym"),
        F.when(F.col("n_stop_distinct") >= 2, 0).otherwise(1).alias("f_stop"),
    )
    others = {
        "len": "f_ttr + f_sym + f_stop",
        "ttr": "f_len + f_sym + f_stop",
        "sym": "f_len + f_ttr + f_stop",
        "stop": "f_len + f_ttr + f_sym",
    }
    aggs = [F.count(F.lit(1)).alias("n_docs")]
    for k, rest in others.items():
        aggs.append(F.sum(f"f_{k}").alias(f"{k}_fail"))
        aggs.append(
            F.sum(F.expr(f"CASE WHEN f_{k} = 1 AND {rest} = 0 THEN 1 ELSE 0 END")).alias(
                f"{k}_uniq"
            )
        )
    aggs.append(
        F.sum(
            F.expr("CASE WHEN f_len + f_ttr + f_sym + f_stop = 0 THEN 1 ELSE 0 END")
        ).alias("pass_all")
    )
    agg = fl.agg(*aggs)
    return (
        agg.select(
            F.expr(
                "stack(4,"
                " 'length', len_fail, len_uniq,"
                " 'stopwords', stop_fail, stop_uniq,"
                " 'symbol', sym_fail, sym_uniq,"
                " 'ttr', ttr_fail, ttr_uniq"
                ") AS (filter_name, n_fail, n_unique_fail)"
            ),
            "n_docs",
            "pass_all",
        )
        .select(
            "filter_name",
            F.col("n_fail").cast("bigint"),
            F.col("n_unique_fail").cast("bigint"),
            F.expr("div(1000 * n_fail, n_docs)").cast("bigint").alias("fail_permille"),
            F.col("pass_all").cast("bigint").alias("n_pass_all"),
        )
        .orderBy("filter_name")
    )


@register(
    "text_dsir_importance",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               list_filter(string_split_regex(text, '\s+'), x -> x <> '') AS toks
        FROM documents
    ),
    bg AS (
        SELECT doc_id, source,
               unnest(CASE WHEN len(toks) >= 2
                      THEN list_transform(generate_series(1, len(toks)-1),
                           i -> concat(toks[i], '_', toks[i+1]))
                      ELSE []::VARCHAR[] END) AS bg
        FROM t
    ),
    f AS (SELECT doc_id, source, substr(md5(concat('dsir:', bg)), 1, 2) AS b
          FROM bg),
    raw AS (SELECT b, COUNT(*) AS r_b FROM f GROUP BY b),
    tgt AS (SELECT b, COUNT(*) AS t_b FROM f
            WHERE source IN ('src0', 'src1') GROUP BY b),
    tot AS (SELECT (SELECT COUNT(*) FROM f) AS tot_r,
                   (SELECT COUNT(*) FROM f
                    WHERE source IN ('src0', 'src1')) AS tot_t),
    w AS (
        SELECT raw.b,
               (1000 * (COALESCE(t_b, 0) + 1) * tot_r)
                   // ((r_b + 1) * tot_t) AS w_milli
        FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN tot
    ),
    doc AS (
        SELECT f.doc_id, f.source, COUNT(*) AS n_feats, SUM(w_milli) AS wsum
        FROM f JOIN w ON f.b = w.b
        GROUP BY 1, 2
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id, source,
           CAST(n_feats AS BIGINT) AS n_feats,
           CAST(wsum // n_feats AS BIGINT) AS score_milli,
           (wsum // n_feats) >= 1000 AS selected
    FROM doc ORDER BY doc_id
    """,
)
def text_dsir_importance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR-style data selection (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): hash every token
    bigram into 256 buckets (md5-prefix, portable), estimate the
    target-domain vs raw-corpus bucket distributions with add-1
    smoothing (target here = sources src0/src1 standing in for the
    curated domain), and score each document by its mean per-feature
    likelihood ratio — docs whose hashed-bigram profile looks more
    like the target than the raw pool get ``selected``.  DSIR proper
    uses log-ratio sums and Gumbel resampling; this twin keeps the
    per-bucket ratio in integer permille (monotone per feature) so
    both engines agree bit-for-bit — at 100 TB you'd flip the weight
    column to float log-ratios, which changes no part of the plan.

    Scale shape: one explode → ONE map-side-combined groupBy for the
    256-bucket raw histogram (target histogram is a filtered second
    aggregate of the same frame), weight table is ≤256 rows broadcast
    back onto the feature stream, per-doc score is one groupBy on
    doc_id.  Nothing driver-side; no global sort except the display
    ORDER BY."""
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id", "source", "text")
    base = docs.select(
        "doc_id",
        "source",
        F.filter(F.split("text", X.TOKEN_RE), lambda x: x != "").alias("toks"),
    )
    # adjacent-pair bigrams via zip_with over two shifted slices of the
    # BOUND token array — measured 20× faster than the
    # transform(sequence, element_at) spelling at sf0.1 (0.5 s vs 11 s:
    # per-index element_at through a higher-order lambda defeats
    # codegen, while slice+zip_with streams both arrays once); for
    # size<2 both slices are empty, matching DuckDB's generate_series
    toks = F.col("toks")
    pair_len = F.greatest(F.size(toks) - 1, F.lit(0))
    bigs = base.select(
        "doc_id",
        "source",
        F.zip_with(
            F.slice(toks, 1, pair_len),
            F.slice(toks, 2, pair_len),
            lambda a, b: F.concat(a, F.lit("_"), b),
        ).alias("bigs"),
    )
    feats = (
        bigs.select("doc_id", "source", F.explode("bigs").alias("bg"))
        .select(
            "doc_id",
            "source",
            F.substring(
                F.md5(F.concat(F.lit("dsir:"), F.col("bg")).cast("binary")), 1, 2
            ).alias("b"),
        )
        .transform(tracked_persist)
    )
    is_tgt = F.col("source").isin("src0", "src1")
    raw = feats.groupBy("b").agg(
        F.count(F.lit(1)).alias("r_b"),
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("t_b"),
    )
    tot = raw.agg(
        F.sum("r_b").alias("tot_r"), F.sum("t_b").alias("tot_t")
    )
    w = raw.crossJoin(F.broadcast(tot)).select(
        "b",
        F.expr("div(1000 * (t_b + 1) * tot_r, (r_b + 1) * tot_t)").alias("w_milli"),
    )
    doc = (
        feats.join(F.broadcast(w), "b")
        .groupBy("doc_id", "source")
        .agg(F.count(F.lit(1)).alias("n_feats"), F.sum("w_milli").alias("wsum"))
    )
    return doc.select(
        F.col("doc_id").cast("bigint"),
        "source",
        F.col("n_feats").cast("bigint"),
        F.expr("div(wsum, n_feats)").cast("bigint").alias("score_milli"),
        (F.expr("div(wsum, n_feats)") >= 1000).alias("selected"),
    ).orderBy("doc_id")


@register(
    "text_quality_classifier_hashed",
    r"""
    WITH t AS (
        SELECT doc_id,
               list_filter(string_split_regex(lower(text), '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    f AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(concat('qc:', unnest(toks))), 1, 2))
                    AS BIGINT) AS j
        FROM t
    ),
    wt AS (SELECT range AS j, ((range * 37 + 11) % 41) - 20 AS w
           FROM range(256)),
    doc AS (
        SELECT f.doc_id, COUNT(*) AS n_toks, SUM(wt.w) AS wsum
        FROM f JOIN wt ON f.j = wt.j
        GROUP BY f.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_toks AS BIGINT) AS n_toks,
           CAST(wsum AS BIGINT) AS wsum,
           CAST(CASE WHEN wsum >= 0 THEN (1000 * wsum) // n_toks
                     ELSE -((1000 * (-wsum)) // n_toks) END AS BIGINT)
               AS avg_w_milli,
           (CASE WHEN wsum >= 0 THEN (1000 * wsum) // n_toks
                 ELSE -((1000 * (-wsum)) // n_toks) END) + 500 >= 0 AS keep
    FROM doc ORDER BY doc_id
    """,
)
def text_quality_classifier_hashed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashed-feature linear quality classifier inference — the
    fastText/CCNet-style model-based filter (Joulin et al. 2016;
    Wenzek et al. 2019) as it actually runs in a Spark pipeline: the
    trained weight vector is a small broadcast table (here 256 hashed
    unigram buckets with a deterministic stand-in weight ((37j+11) mod
    41) − 20, since no trained artifact ships with the repo), each
    token hashes to its bucket JVM-side (md5-prefix → int, portable),
    and the document score is one join + one groupBy — margin =
    mean token weight + bias, ``keep`` = margin ≥ 0.  Swapping the
    arithmetic weights for real trained ones changes only the content
    of the 256-row table, not one operator in the plan.

    Division truncates toward zero in both engines for the negative
    sums (Spark ``div``), so the oracle mirrors that with an explicit
    sign-split floor — the one place integer semantics differ between
    `//` (floor) and ``div`` (truncate).

    Scale shape: explode → broadcast-hash-join against a 256-row
    weight table → map-side-combined groupBy(doc_id).  No shuffle
    wider than the per-doc aggregate; weight lookup never leaves the
    executor."""
    docs = load_testdata(spark, sf_dir, "documents")
    return _hashed_classifier_scores(spark, docs).orderBy("doc_id")


def _hashed_classifier_scores(spark: SparkSession, docs: DataFrame) -> DataFrame:
    """Per-doc hashed-linear-classifier margin (doc_id, n_toks, wsum,
    avg_w_milli, keep) — shared by ``text_quality_classifier_hashed``
    and the calibration query."""
    toks = docs.select(
        "doc_id",
        F.explode(
            F.filter(F.split(F.lower("text"), X.TOKEN_RE), lambda x: x != "")
        ).alias("tok"),
    )
    feats = toks.select(
        "doc_id",
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("qc:"), F.col("tok")).cast("binary")), 1, 2
            ),
            16,
            10,
        )
        .cast("bigint")
        .alias("j"),
    )
    wt = spark.range(256).select(
        F.col("id").alias("j"), ((F.col("id") * 37 + 11) % 41 - 20).alias("w")
    )
    doc = (
        feats.join(F.broadcast(wt), "j")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_toks"), F.sum("w").alias("wsum"))
    )
    avg_w = F.expr("div(1000 * wsum, n_toks)")
    return doc.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_toks").cast("bigint"),
        F.col("wsum").cast("bigint"),
        avg_w.cast("bigint").alias("avg_w_milli"),
        (avg_w + 500 >= 0).alias("keep"),
    )


@register(
    "quality_adaptive_thresholds",
    r"""
    WITH t AS (
        SELECT doc_id, source,
               string_split_regex(text, '\s+') AS toks
        FROM documents
    ),
    m AS (
        SELECT doc_id, source,
               (1000 * len(list_distinct(toks))) // len(toks) AS ttr_permille
        FROM t WHERE len(toks) > 0
    ),
    rk AS (
        SELECT source, ttr_permille,
               ROW_NUMBER() OVER (PARTITION BY source
                   ORDER BY ttr_permille, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM m
    ),
    cut AS (
        SELECT source, n AS n_docs, ttr_permille AS p25_cutoff
        FROM rk WHERE rn = (n + 3) // 4
    )
    SELECT c.source, CAST(c.n_docs AS BIGINT) AS n_docs,
           CAST(c.p25_cutoff AS BIGINT) AS p25_cutoff,
           CAST(SUM(CASE WHEN m.ttr_permille >= c.p25_cutoff
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((1000 * SUM(CASE WHEN m.ttr_permille >= c.p25_cutoff
                                 THEN 1 ELSE 0 END)) // c.n_docs AS BIGINT)
               AS kept_permille
    FROM cut c JOIN m ON m.source = c.source
    GROUP BY c.source, c.n_docs, c.p25_cutoff
    ORDER BY c.source
    """,
)
def quality_adaptive_thresholds(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain adaptive quality cutoffs — the FineWeb/RefinedWeb
    lesson that one global threshold over-filters some domains and
    under-filters others: compute a quality metric per document
    (type-token ratio in permille), derive each SOURCE's own 25th-
    percentile cutoff (rank-based, integer-exact: the value at row
    ⌈n/4⌉ of the per-source ascending order), and report how much of
    each domain survives its own bar.  Rank-based percentiles rather
    than interpolated quantiles keep the oracle exact.

    Scale shape: metric is a narrow map; the percentile is a window
    over (source) — partitions are per-domain, so the sort is
    domain-local and parallel across domains (at 100 TB a skewed mega-
    domain would switch to approx_percentile per partition, same
    plan shape); the cutoff table is |domains| rows, broadcast back
    for the survivor count."""
    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select("doc_id", "source", F.split("text", X.TOKEN_RE).alias("toks"))
    m = (
        t.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "source",
            F.expr("div(1000 * size(array_distinct(toks)), size(toks))").alias(
                "ttr_permille"
            ),
        )
        .transform(tracked_persist)
    )
    w = Window.partitionBy("source").orderBy("ttr_permille", "doc_id")
    wn = Window.partitionBy("source")
    rk = m.select(
        "source",
        "ttr_permille",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n"),
    )
    cut = rk.filter(F.col("rn") == F.expr("div(n + 3, 4)")).select(
        "source", F.col("n").alias("n_docs"), F.col("ttr_permille").alias("p25_cutoff")
    )
    return (
        m.join(F.broadcast(cut), "source")
        .groupBy("source", "n_docs", "p25_cutoff")
        .agg(
            F.sum(
                F.when(F.col("ttr_permille") >= F.col("p25_cutoff"), 1).otherwise(0)
            ).alias("n_kept")
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            F.col("p25_cutoff").cast("bigint"),
            F.col("n_kept").cast("bigint"),
            F.expr("div(1000 * n_kept, n_docs)").cast("bigint").alias("kept_permille"),
        )
        .orderBy("source")
    )


@register(
    "dedup_shingle_containment",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT id_a, id_b, c,
               (1000 * c) // sa.sz AS cont_a_permille,
               (1000 * c) // sb.sz AS cont_b_permille
        FROM common
        JOIN sizes sa ON sa.doc_id = id_a
        JOIN sizes sb ON sb.doc_id = id_b
    )
    SELECT CAST(id_a AS BIGINT) AS id_a, CAST(id_b AS BIGINT) AS id_b,
           CAST(c AS BIGINT) AS common,
           CAST(cont_a_permille AS BIGINT) AS cont_a_permille,
           CAST(cont_b_permille AS BIGINT) AS cont_b_permille,
           CAST(greatest(cont_a_permille, cont_b_permille) AS BIGINT)
               AS cont_max_permille
    FROM scored
    WHERE greatest(cont_a_permille, cont_b_permille) >= 800
    ORDER BY id_a, id_b
    """,
)
def dedup_shingle_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Asymmetric containment dedup — C(A→B) = |shingles(A) ∩
    shingles(B)| / |shingles(A)|, the Broder containment measure and
    the set-level analogue of suffix-array substring dedup (Lee et al.
    2022): a short document wholly quoted inside a long one has
    containment ≈ 1000‰ from the short side even though its symmetric
    Jaccard is low (union dominated by the long doc).  The planted
    truncated near-dups in ``_dedup_corpus`` are exactly this shape —
    the cut copy's shingles are a subset of the original's — so every
    planted pair must appear here at cont ≥ 800‰.

    Scale shape: identical to ``jaccard_pairs`` — xxhash64'd shingle
    posting-list equi-join (never all-pairs), per-doc sizes carried
    through the posting rows (no size-table join or broadcast — that
    relation grows ∝ corpus), one extra integer division per
    surviving pair.  At 100 TB
    the posting join is the same LSH-prunable bucket join as the
    symmetric path; containment is a post-filter, not a new plan."""
    corpus = _dedup_corpus(spark, sf_dir)
    return D.containment_pairs(corpus, "doc_id", "text", min_permille=800).orderBy(
        "id_a", "id_b"
    )


@register(
    "text_boilerplate_chunks",
    f"""
    WITH {_CORPUS_SQL},
    tk AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus),
    ch AS (
        SELECT doc_id,
               md5(array_to_string(
                   toks[(i-1)*10+1 : least((i-1)*10+10, len(toks))], ' ')) AS h
        FROM tk,
             unnest(generate_series(1,
                 CAST(ceil(len(toks) / 10.0) AS BIGINT))) AS u(i)
        WHERE len(toks) > 0
    ),
    freq AS (SELECT h, COUNT(*) AS n FROM ch GROUP BY h),
    doc AS (
        SELECT c.doc_id, COUNT(*) AS n_chunks,
               SUM(CASE WHEN f.n >= 2 THEN 1 ELSE 0 END) AS n_shared
        FROM ch c JOIN freq f ON c.h = f.h
        GROUP BY c.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_shared AS BIGINT) AS n_shared,
           CAST((1000 * n_shared) // n_chunks AS BIGINT) AS boiler_permille
    FROM doc ORDER BY doc_id
    """,
)
def text_boilerplate_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level boilerplate detection — the CCNet/RefinedWeb line-
    dedup step re-expressed over fixed 10-token chunks (the synthetic
    corpus is single-line, so chunks stand in for lines): hash every
    non-overlapping chunk, count corpus-wide occurrences, and report
    each document's fraction of chunks that appear verbatim elsewhere
    (``boiler_permille``).  Documents dominated by shared chunks are
    the navboxes/cookie-banners/licence-footers a web pipeline strips
    before model-based filtering; the planted near/exact dups in
    ``_dedup_corpus`` guarantee measurable shared mass here.

    Scale shape: chunking is narrow (explode sequence + slice on the
    bound token array); the frequency table is ONE map-side-combined
    groupBy on a 16-byte hash, joined back on the same key — at 100 TB
    both sides partition by chunk hash, and the frequency side can be
    pre-filtered to n ≥ 2 (the only rows that change any doc's count)
    before the join."""
    corpus = _dedup_corpus(spark, sf_dir)
    tk = corpus.select("doc_id", F.split("text", X.TOKEN_RE).alias("toks")).filter(
        F.size("toks") > 0
    )
    n_chunks = F.ceil(F.size("toks") / F.lit(10.0)).cast("long")
    ch = (
        tk.select(
            "doc_id", F.explode(F.sequence(F.lit(1), n_chunks)).alias("i"), "toks"
        )
        .select(
            "doc_id",
            F.md5(
                F.concat_ws(
                    " ",
                    F.slice(
                        F.col("toks"),
                        (F.col("i") - 1) * 10 + 1,
                        F.least(F.lit(10), F.size("toks") - (F.col("i") - 1) * 10),
                    ),
                ).cast("binary")
            ).alias("h"),
        )
        .transform(tracked_persist)
    )
    freq = ch.groupBy("h").agg(F.count(F.lit(1)).alias("n"))
    doc = (
        ch.join(freq, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return doc.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_chunks").cast("bigint"),
        F.col("n_shared").cast("bigint"),
        F.expr("div(1000 * n_shared, n_chunks)").cast("bigint").alias("boiler_permille"),
    ).orderBy("doc_id")


@register(
    "dedup_incremental_batch",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT n.doc_id AS new_id, o.doc_id AS match_id, COUNT(*) AS c
        FROM sh n JOIN sh o ON n.sh = o.sh
        WHERE n.doc_id >= 100000 AND o.doc_id < 100000
        GROUP BY 1, 2
    ),
    scored AS (
        SELECT new_id, match_id, c,
               (1000 * c) // (sn.sz + so.sz - c) AS jac_permille
        FROM common
        JOIN sizes sn ON sn.doc_id = new_id
        JOIN sizes so ON so.doc_id = match_id
        WHERE (1000 * c) // (sn.sz + so.sz - c) >= 300
    ),
    best AS (
        SELECT new_id, match_id, c, jac_permille,
               ROW_NUMBER() OVER (PARTITION BY new_id
                   ORDER BY jac_permille DESC, match_id) AS rk
        FROM scored
    )
    SELECT CAST(new_id AS BIGINT) AS new_id,
           CAST(match_id AS BIGINT) AS match_id,
           CAST(c AS BIGINT) AS common,
           CAST(jac_permille AS BIGINT) AS jac_permille
    FROM best WHERE rk = 1
    ORDER BY new_id
    """,
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental (batch-vs-corpus) near-dup matching — the form a
    continuous-ingest pipeline actually runs: each new crawl batch
    (here the planted copies, ``doc_id >= 100000``) is matched against
    the EXISTING corpus (``doc_id < 100000``) only, never old × old.
    Per-batch cost is Σ over shingle buckets of new·old — proportional
    to the batch — and each new doc reports its best existing match,
    the provenance row an ingest job logs before dropping the
    duplicate.  See ``operators/dedup.py::incremental_jaccard_matches``
    for the 100 TB layout (maintained posting-list table, bucket
    pruning per batch)."""
    corpus = _dedup_corpus(spark, sf_dir)
    old = corpus.filter(F.col("doc_id") < 100000)
    new = corpus.filter(F.col("doc_id") >= 100000)
    return D.incremental_jaccard_matches(
        old, new, "doc_id", "text", min_permille=300
    ).orderBy("new_id")


@register(
    "dedup_minhash_lsh",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    )
    SELECT CAST(a.doc_id AS BIGINT) AS id_a, CAST(b.doc_id AS BIGINT) AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_bands
    FROM bands a
    JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                AND a.doc_id < b.doc_id
    GROUP BY 1, 2
    ORDER BY id_a, id_b
    """,
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    return D.lsh_candidate_pairs(bands, "doc_id").orderBy("id_a", "id_b")


_SIMHASH_NIBS = "('8','9','a','b','c','d','e','f')"


@register(
    "dedup_simhash",
    f"""
    WITH {_CORPUS_SQL},
    tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM corpus),
    h AS (SELECT doc_id, md5(tok) AS h FROM tok),
    v AS (
        SELECT doc_id,
               {', '.join(f"SUM(CASE WHEN substr(h, {i + 1}, 1) IN {_SIMHASH_NIBS} THEN 1 ELSE -1 END) AS s{i}" for i in range(16))}
        FROM h GROUP BY doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           {" || ".join(f"(CASE WHEN s{i} > 0 THEN '1' ELSE '0' END)" for i in range(16))} AS simhash16
    FROM v
    ORDER BY doc_id
    """,
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    corpus = _dedup_corpus(spark, sf_dir)
    return D.simhash16(corpus, "doc_id", "text").orderBy("doc_id")


def _duck_simhash64_votes() -> str:
    out = []
    for b in range(4):
        for p in range(16):
            j = 4 * b + p // 4 + 1
            k = p % 4
            out.append(
                f"SUM(CASE WHEN ((strpos('0123456789abcdef', substr(h, {j}, 1)) - 1) "
                f"// {2 ** (3 - k)}) % 2 = 1 THEN 1 ELSE -1 END) AS s_{b}_{p}"
            )
    return ", ".join(out)


def _duck_simhash64_blocks() -> str:
    return ", ".join(
        "("
        + " + ".join(
            f"CASE WHEN s_{b}_{p} > 0 THEN {2 ** (15 - p)} ELSE 0 END"
            for p in range(16)
        )
        + f") AS b{b}"
        for b in range(4)
    )


@register(
    "dedup_simhash_hamming",
    f"""
    WITH {_CORPUS_SQL},
    tok AS (SELECT doc_id, unnest(string_split_regex(text, '\\s+')) AS tok FROM corpus),
    h AS (SELECT doc_id, md5(tok) AS h FROM tok),
    votes AS (SELECT doc_id, {_duck_simhash64_votes()} FROM h GROUP BY doc_id),
    sig AS (SELECT doc_id, {_duck_simhash64_blocks()} FROM votes),
    blk AS (
        SELECT doc_id, 0 AS blk_idx, b0 AS blk_val FROM sig
        UNION ALL SELECT doc_id, 1, b1 FROM sig
        UNION ALL SELECT doc_id, 2, b2 FROM sig
        UNION ALL SELECT doc_id, 3, b3 FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM blk a JOIN blk b ON a.blk_idx = b.blk_idx AND a.blk_val = b.blk_val
                  AND a.doc_id < b.doc_id
    )
    SELECT CAST(c.id_a AS BIGINT) AS id_a, CAST(c.id_b AS BIGINT) AS id_b,
           CAST(bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
                bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) AS BIGINT) AS hamming
    FROM cand c JOIN sig sa ON sa.doc_id = c.id_a JOIN sig sb ON sb.doc_id = c.id_b
    WHERE bit_count(xor(sa.b0, sb.b0)) + bit_count(xor(sa.b1, sb.b1)) +
          bit_count(xor(sa.b2, sb.b2)) + bit_count(xor(sa.b3, sb.b3)) <= 3
    ORDER BY id_a, id_b
    """,
)
def dedup_simhash_hamming(spark: SparkSession, sf_dir: str) -> DataFrame:
    """64-bit SimHash near-dup pairs at Hamming ≤ 3 — the production
    simhash tier (VERDICT r1 follow-up to the 16-bit SQL-exact toy).
    Candidates via Manku et al.'s 4-block pigeonhole (a pair within
    Hamming 3 agrees exactly on ≥ 1 of 4 16-bit blocks → four equality
    self-joins, never an all-pairs scan), verified with
    bit_count(xor) over the block ints.  Fingerprints stay as 4×16-bit
    BIGINT blocks so both engines compute in exact integer arithmetic."""
    corpus = _dedup_corpus(spark, sf_dir)
    return D.simhash_hamming_pairs(corpus, "doc_id", "text", max_hamming=3).orderBy(
        "id_a", "id_b"
    )


@register(
    "dedup_embedding_cosine",
    """
    WITH n AS (
        SELECT vec_id, vec_id // 512 AS blk, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    )
    SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
           CAST(CAST(ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim
    FROM n a JOIN n b ON a.blk = b.blk AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs within id-blocks of 512
    (threshold 0.45, exact doubles).

    Blocked brute-force tier: the self-join is an EQUI-join on the
    block id, so total work is (N/512)·512² = 512·N — linear in N, and
    each block's pair set fits one task.  An UNBOUNDED all-pairs join
    (round 1's version) is O(N²): at 100× data that is 10,000× work, a
    scale-killer for a registered headline query (VERDICT r1 item 6).
    Full-coverage near-dup at scale is the LSH tier
    (``dedup_embedding_lsh``); the unblocked brute force survives as a
    pytest cross-validation at sf0.001
    (tests/test_extensions.py::test_embedding_lsh_vs_blocked_brute)."""
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings")))
    blk = F.expr("vec_id div 512")
    a = emb.select(
        F.col("vec_id").alias("id_a"), blk.alias("blk_a"),
        F.col("_v").alias("va"), F.col("_norm").alias("na"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), blk.alias("blk_b"),
        F.col("_v").alias("vb"), F.col("_norm").alias("nb"),
    )
    cos = S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("blk_a") == F.col("blk_b")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.45)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Similarity search
# ---------------------------------------------------------------------------


@register(
    "similarity_cosine_topk",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 10
    ORDER BY query_id, rk
    """,
)
def similarity_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    out = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 10), k=10)
    return out.select(
        F.col("query_id").cast("bigint"),
        F.col("neighbor_id").cast("bigint"),
        F.round("cos_sim", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
        "rk",
    ).orderBy("query_id", "rk")


@register(
    "similarity_ann_sq8",
    """
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT unnest(v) AS x FROM e)),
    q AS (
        SELECT vec_id,
               list_transform(v, x -> least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12)) AS INTEGER)))) AS qv
        FROM e, mm
    ),
    scored AS (
        SELECT a.vec_id AS query_id, b.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, len(a.qv)),
                        i -> a.qv[i] * b.qv[i])) AS approx_dot
        FROM q a JOIN q b ON b.vec_id != a.vec_id
        WHERE a.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, neighbor_id, approx_dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY approx_dot DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(approx_dot AS BIGINT) AS approx_dot, rk
    FROM ranked WHERE rk <= 10
    ORDER BY query_id, rk
    """,
)
def similarity_ann_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar-quantized (SQ8) top-k — the COMPRESSION tier of ANN,
    complementing the partitioning (IVF) and hashing (sign-LSH) tiers:
    8-bit codes over the global value range cut the scanned bytes 4×
    and turn the distance into an exact BIGINT dot product.  One tiny
    min/max aggregate broadcasts into the quantization map; scoring is
    the same broadcast-queries scan-candidates shape as the brute
    baseline.  Both engines quantize with the identical double
    expression, so codes — and therefore ranks — match exactly."""
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    codes = S.sq8_codes(emb)
    out = S.sq8_topk(codes, codes.filter(F.col("vec_id") < 10), k=10)
    return out.select(
        F.col("query_id").cast("bigint"),
        F.col("neighbor_id").cast("bigint"),
        F.col("approx_dot").cast("bigint"),
        "rk",
    ).orderBy("query_id", "rk")


@register(
    "similarity_ann_ivf_sq8",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    ),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT unnest(v) AS x FROM n)),
    codes AS (
        SELECT vec_id,
               list_transform(v, x -> least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12)) AS INTEGER)))) AS qv
        FROM n, mm
    ),
    cadc AS (SELECT GREATEST(61, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))
             AS cad FROM n),
    cents AS (SELECT vec_id AS cid, v AS cv FROM n, cadc WHERE vec_id % cad = 0),
    assigned AS (
        SELECT n.vec_id, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.v, c.cv) DESC, c.cid) AS crk
        FROM n CROSS JOIN cents c
    ),
    cells AS (
        SELECT a.vec_id, a.cid, k.qv
        FROM assigned a JOIN codes k ON k.vec_id = a.vec_id
        WHERE a.crk = 1
    ),
    q AS (SELECT * FROM cells WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_sum(list_transform(generate_series(1, len(q.qv)),
                        i -> q.qv[i] * c.qv[i])) AS approx_dot
        FROM q JOIN cells c ON q.cid = c.cid AND c.vec_id != q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, approx_dot,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY approx_dot DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(approx_dot AS BIGINT) AS approx_dot, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_ann_ivf_sq8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF × SQ8 — the production ANN composition (FAISS ``IVF,SQ8``):
    the coarse quantizer routes each vector to a centroid cell (exact
    double dot, broadcast centroids), and IN-cell scoring runs on 8-bit
    codes with a BIGINT dot product.  At 100 TB the probe touches one
    cell's worth of candidates AND scans them at a quarter of the
    bytes; both reductions multiply.  Cell assignment and codes are
    each computed once (persisted inverted file carries the codes)."""
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    n = emb.select("vec_id", S.as_double_vec("embedding").alias("v"))
    cents = _ivf_centroids(n)  # √N cadence derived in-plan (ADVICE r7)
    # argmax-by-struct cell assignment (≡ row_number()=1 over d DESC,
    # cid ASC): partial-aggregated groupBy, no full-corpus sort
    # exchange, nothing wider than (vec_id, cid, d) shuffles
    assigned = (
        n.crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", S.dot(F.col("v"), F.col("cv")).alias("d"))
        .groupBy("vec_id")
        .agg(F.max(F.struct(F.col("d"), (-F.col("cid")).alias("nc"))).alias("m"))
        .select("vec_id", (-F.col("m.nc")).alias("cid"))
    )
    codes = S.sq8_codes(emb)
    cells = (
        assigned.join(codes, "vec_id")
        .select("vec_id", "cid", "codes")
        .transform(tracked_persist)
    )
    q = cells.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("cid").alias("qcid"),
        F.col("codes").alias("qv"),
    )
    idot = F.aggregate(
        F.zip_with(F.col("qv"), F.col("codes"), lambda x, y: (x * y).cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    scored = cells.join(
        F.broadcast(q),
        (F.col("qcid") == F.col("cid")) & (F.col("query_id") != F.col("vec_id")),
    ).withColumn("approx_dot", idot)
    w = Window.partitionBy("query_id").orderBy(
        F.col("approx_dot").desc(), F.col("vec_id")
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("vec_id").cast("bigint").alias("neighbor_id"),
            F.col("approx_dot").cast("bigint"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "similarity_ann_sign_lsh",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM n q JOIN n c ON q.bkt = c.bkt AND c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_ann_sign_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed ANN: compare only within 4-bit sign-LSH buckets — the
    scale path (bucket equi-join instead of an N² nested loop)."""
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).withColumn(
        "bkt", S.sign_bucket("embedding", bits=4)
    )
    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"), F.col("bkt").alias("qbkt"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"), F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"), "bkt",
    )
    scored = (
        c.join(F.broadcast(q), (F.col("qbkt") == F.col("bkt")) & (F.col("query_id") != F.col("neighbor_id")))
        .withColumn("cos_raw", S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    )
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id").asc())
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


# ---------------------------------------------------------------------------
# Multimodal plumbing (Pandas-UDF path; decode stubbed deterministically)
# ---------------------------------------------------------------------------


@register(
    "multimodal_features",
    """
    SELECT doc_id,
           CAST(strlen(text) AS BIGINT) AS n_bytes,
           CAST(strlen(text) % 640 AS INTEGER) AS width,
           CAST((7 * strlen(text)) % 480 AS INTEGER) AS height
    FROM documents
    ORDER BY doc_id
    """,
)
def multimodal_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Binary payload → mapInPandas feature extraction (decode stubbed
    deterministically; see operators/multimodal.py)."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents"))
    packed = M.attach_binary_payload(docs)
    # no final orderBy: a global sort above mapInPandas re-executes the
    # Python stage for range-partition sampling (~9× this query's cost),
    # and result comparison is order-insensitive
    return M.extract_features(packed, fake_decode=True)


@register(
    "dedup_embedding_lsh",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM embeddings
    )
    SELECT CAST(a.vec_id AS BIGINT) AS id_a, CAST(b.vec_id AS BIGINT) AS id_b,
           CAST(CAST(ROUND(list_dot_product(a.v, b.v) / (a.nrm * b.nrm), 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim
    FROM n a JOIN n b ON a.bkt = b.bkt AND a.vec_id < b.vec_id
    WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.4
    ORDER BY id_a, id_b
    """,
)
def dedup_embedding_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale-path embedding near-dup: candidate pairs restricted to the
    same sign-LSH bucket (equi-join on the bucket key instead of the
    brute N² nested loop; recall < 1 by design — similar vectors agree
    on leading-coordinate signs with high probability)."""
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).withColumn(
        "bkt", S.sign_bucket("embedding", bits=4)
    )
    a = emb.select(
        F.col("vec_id").alias("id_a"), F.col("_v").alias("va"),
        F.col("_norm").alias("na"), F.col("bkt").alias("ba"),
    )
    b = emb.select(
        F.col("vec_id").alias("id_b"), F.col("_v").alias("vb"),
        F.col("_norm").alias("nb"), F.col("bkt").alias("bb"),
    )
    cos = S.dot(F.col("va"), F.col("vb")) / (F.col("na") * F.col("nb"))
    return (
        a.join(b, (F.col("ba") == F.col("bb")) & (F.col("id_a") < F.col("id_b")))
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.4)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
        )
        .orderBy("id_a", "id_b")
    )


# ---------------------------------------------------------------------------
# Training-data pipeline staples: chunking, deterministic sampling,
# vocabulary statistics
# ---------------------------------------------------------------------------


@register(
    "text_chunking",
    r"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
    chunks AS (
        SELECT doc_id,
               CAST(i AS INTEGER) AS chunk_idx,
               array_to_string(toks[(i*24 + 1):least((i*24 + 32), len(toks))], ' ') AS chunk_text
        FROM t, unnest(generate_series(0, CAST(greatest(ceil((len(toks) - 8) / 24.0), 1) AS BIGINT) - 1)) AS u(i)
    )
    SELECT doc_id, chunk_idx, chunk_text,
           CAST(len(string_split_regex(chunk_text, '\s+')) AS BIGINT) AS chunk_tokens
    FROM chunks
    ORDER BY doc_id, chunk_idx
    """,
)
def text_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size token chunking with overlap (window 32, stride 24 →
    8-token overlap) — the standard pre-tokenization step for LLM
    training corpora.  Pure narrow ops: split → sequence → transform →
    explode; no shuffle until the presentation sort."""
    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), X.TOKEN_RE).alias("toks"))
    n_chunks = F.greatest(
        F.ceil((F.size("toks") - F.lit(8)) / F.lit(24.0)), F.lit(1)
    ).cast("long")
    chunks = toks.select(
        "doc_id",
        F.explode(F.sequence(F.lit(0), n_chunks - 1)).alias("i"),
        "toks",
    ).select(
        "doc_id",
        F.col("i").cast("int").alias("chunk_idx"),
        F.concat_ws(
            " ",
            F.slice(
                F.col("toks"),
                F.col("i") * 24 + 1,
                F.least(
                    F.lit(32),
                    F.size("toks") - F.col("i") * 24,
                ),
            ),
        ).alias("chunk_text"),
    )
    return chunks.select(
        "doc_id",
        "chunk_idx",
        "chunk_text",
        F.size(F.split(F.col("chunk_text"), X.TOKEN_RE)).cast("bigint").alias("chunk_tokens"),
    ).orderBy("doc_id", "chunk_idx")


@register(
    "sample_stratified_deterministic",
    """
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_sampled,
           CAST(MIN(doc_id) AS BIGINT) AS first_doc
    FROM documents
    WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 2) < '1a'
    GROUP BY lang
    ORDER BY lang
    """,
)
def sample_stratified_deterministic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic ~10% sample via content-hash thresholding
    (md5 prefix < '1a' ≈ 26/256) — reproducible across engines and
    runs, unlike rand()-based sampling; the pattern training pipelines
    use for held-out splits."""
    docs = load_testdata(spark, sf_dir, "documents")
    return (
        docs.filter(
            F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 2) < "1a"
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_sampled"),
            F.min("doc_id").cast("bigint").alias("first_doc"),
        )
        .orderBy("lang")
    )


_HEX12 = (
    "("
    + " + ".join(
        f"(strpos('0123456789abcdef', substr(h, {i}, 1)) - 1) * {16 ** (12 - i)}"
        for i in range(1, 13)
    )
    + ")"
)


@register(
    "sample_weighted_poisson",
    f"""
    WITH u AS (
        SELECT doc_id, n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    keyed AS (
        SELECT doc_id, n_chars,
               CAST({_HEX12} AS DOUBLE) / n_chars AS priority
        FROM u
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chars AS BIGINT) AS weight,
           priority
    FROM keyed
    ORDER BY priority, doc_id
    LIMIT 100
    """,
)
def sample_weighted_poisson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequential Poisson sampling (Ohlsson 1998): weighted sample of
    100 docs where selection probability ∝ weight (here n_chars —
    length-weighted subset selection, the way training pipelines bias
    a sample toward longer documents without dropping short ones
    entirely).  Priority = u/w with u a deterministic 48-bit content
    hash; smallest-k priorities win.

    Cross-engine exactness: u is an INTEGER (md5-prefix parsed to 48
    bits — Spark ``conv``, DuckDB nibble-sum, identical values) and
    u/w is ONE correctly-rounded IEEE division of exact integers, so
    both engines produce bit-identical priorities.  Plan: a map pass +
    TakeOrderedAndProject — no full sort at any scale."""
    docs = load_testdata(spark, sf_dir, "documents")
    u = F.conv(
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 12),
        16,
        10,
    ).cast("long")
    return (
        docs.select(
            F.col("doc_id").cast("bigint"),
            F.col("n_chars").cast("bigint").alias("weight"),
            (u.cast("double") / F.col("n_chars")).alias("priority"),
        )
        .orderBy("priority", "doc_id")
        .limit(100)
    )


@register(
    "pipeline_pack_sequences",
    r"""
    WITH t AS (
        SELECT doc_id, doc_id % 8 AS shard,
               len(string_split_regex(text, '\s+')) AS n_tok
        FROM documents
    ),
    c AS (
        SELECT doc_id, shard, n_tok,
               SUM(n_tok) OVER (PARTITION BY shard ORDER BY doc_id
                                ROWS UNBOUNDED PRECEDING) AS cum
        FROM t
    ),
    b AS (
        SELECT shard, n_tok, cum,
               (cum - n_tok) // 512 AS first_bin,
               CASE WHEN n_tok > 0 THEN (cum - 1) // 512 ELSE (cum - n_tok) // 512 END AS last_bin
        FROM c
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST((MAX(cum) + 511) // 512 AS BIGINT) AS n_sequences,
           CAST(SUM(CASE WHEN n_tok > 0 AND first_bin != last_bin
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_straddling,
           CAST((1000 * SUM(n_tok)) // (512 * ((MAX(cum) + 511) // 512)) AS BIGINT)
               AS fill_permille
    FROM b
    GROUP BY shard
    ORDER BY shard
    """,
)
def pipeline_pack_sequences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing — the step that turns a filtered corpus into
    fixed-length training sequences: documents are concatenated in
    deterministic order within hash shards and split every 512 tokens
    (document-concatenation packing, the GPT/T5 default).  Reports the
    packing profile per shard: sequence count, docs straddling a
    sequence boundary (candidates for attention-mask resets), and fill
    rate (how close packing gets to zero padding).

    Scale shape: the cumulative count is a window PARTITIONED by shard
    — at 100 TB each shard's running sum is independent, so the plan is
    one hash Exchange(shard) + per-shard sort, never a global
    single-partition window; everything after is a per-shard aggregate
    over scalars (doc text itself is never shuffled — only token
    counts)."""
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        (F.col("doc_id") % 8).alias("shard"),
        F.size(F.split(F.col("text"), X.TOKEN_RE)).alias("n_tok"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    c = t.withColumn("cum", F.sum("n_tok").over(w))
    # div() truncates toward zero in Spark but DuckDB's // floors —
    # identical on the non-negative operands here; the n_tok = 0 guard
    # keeps (cum - 1) from ever going negative on a leading empty doc
    b = c.select(
        "shard",
        "n_tok",
        "cum",
        F.expr("div(cum - n_tok, 512)").alias("first_bin"),
        F.when(F.col("n_tok") > 0, F.expr("div(cum - 1, 512)"))
        .otherwise(F.expr("div(cum - n_tok, 512)"))
        .alias("last_bin"),
    )
    return (
        b.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("n_tokens"),
            F.expr("div(max(cum) + 511, 512)").cast("bigint").alias("n_sequences"),
            F.sum(
                F.when(
                    (F.col("n_tok") > 0) & (F.col("first_bin") != F.col("last_bin")),
                    1,
                ).otherwise(0)
            )
            .cast("bigint")
            .alias("n_straddling"),
            F.expr("div(1000 * sum(n_tok), 512 * div(max(cum) + 511, 512))")
            .cast("bigint")
            .alias("fill_permille"),
        )
        .select(
            F.col("shard").cast("bigint"),
            "n_docs",
            "n_tokens",
            "n_sequences",
            "n_straddling",
            "fill_permille",
        )
        .orderBy("shard")
    )


@register(
    "sample_mixture_weighted",
    f"""
    WITH t AS (
        SELECT doc_id, doc_id % 5 AS source,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    rates(source, rate) AS (VALUES (0, 1000), (1, 800), (2, 600), (3, 400), (4, 200)),
    keyed AS (
        SELECT t.doc_id, t.source, r.rate,
               {_HEX12} % 1000 AS u
        FROM t JOIN rates r ON r.source = t.source
    )
    SELECT CAST(source AS BIGINT) AS source,
           CAST(ANY_VALUE(rate) AS BIGINT) AS target_permille,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN u < rate THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST((1000 * SUM(CASE WHEN u < rate THEN 1 ELSE 0 END)) // COUNT(*) AS BIGINT)
               AS realized_permille
    FROM keyed
    GROUP BY source
    ORDER BY source
    """,
)
def sample_mixture_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mixture sampling across sources — the per-corpus rate control of
    training-data mixing (the Pile / DoReMi pattern: each source gets a
    target inclusion rate; documents are kept by a deterministic hash
    Bernoulli, so the mixture is reproducible and resumable with no RNG
    state).  Source here is ``doc_id % 5`` as a 5-corpus stand-in;
    rates 1000/800/600/400/200‰.  Output compares realized vs target
    rate per source — the drift check a mixing job alerts on.

    Scale shape: map-only keep decision (48-bit md5 prefix mod 1000 <
    rate, broadcast rate table) + one per-source aggregate; nothing
    shuffles but the counts."""
    rates = spark.createDataFrame(
        [(0, 1000), (1, 800), (2, 600), (3, 400), (4, 200)],
        "source bigint, rate bigint",
    )
    docs = load_testdata(spark, sf_dir, "documents")
    u = (
        F.conv(
            F.substring(
                F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 12
            ),
            16,
            10,
        ).cast("long")
        % 1000
    )
    keyed = (
        docs.select("doc_id", (F.col("doc_id") % 5).alias("source"), u.alias("u"))
        .join(F.broadcast(rates), "source")
    )
    return (
        keyed.groupBy("source")
        .agg(
            F.any_value("rate").cast("bigint").alias("target_permille"),
            F.count(F.lit(1)).cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("u") < F.col("rate"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.expr(
                "div(1000 * sum(case when u < rate then 1 else 0 end), count(1))"
            )
            .cast("bigint")
            .alias("realized_permille"),
        )
        .select(
            F.col("source").cast("bigint"),
            "target_permille",
            "n_total",
            "n_kept",
            "realized_permille",
        )
        .orderBy("source")
    )


@register(
    "vocab_top_tokens",
    r"""
    WITH tok AS (SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents),
    counts AS (SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok GROUP BY tok)
    SELECT tok, n,
           CAST(ROW_NUMBER() OVER (ORDER BY n DESC, tok) AS INTEGER) AS rk
    FROM counts
    ORDER BY rk
    LIMIT 30
    """,
)
def vocab_top_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus vocabulary top-k — explode → count (map-side combined) →
    distributed top-k; the frequency table driving BPE-style tokenizer
    builds.

    Scale note: the top-30 is taken with ``orderBy().limit()`` which
    plans as TakeOrderedAndProject (per-partition heap + driver merge of
    30-row heads) — NOT a global-window sort.  At web-corpus scale the
    vocabulary count table is 10⁷–10⁸ rows; a ``row_number`` over an
    un-partitioned window would funnel all of it through one reducer
    (the round-2 scale hazard).  The rank column is derived AFTER the
    limit, over the 30 surviving rows only.  The partition key is
    ``spark_partition_id()`` — constant 0 over the single-partition
    limit result, but non-foldable, so Catalyst cannot strip it the way
    it strips a ``lit()`` and WindowExec stays off its move-everything-
    to-one-partition warning path (the input is ≤30 rows by
    construction either way)."""
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents")
    counts = (
        docs.select(F.explode(X.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    top = counts.orderBy(F.col("n").desc(), F.col("tok")).limit(30)
    w = Window.partitionBy(F.spark_partition_id()).orderBy(
        F.col("n").desc(), F.col("tok")
    )
    return (
        top.withColumn("rk", F.row_number().over(w).cast("int"))
        .select("tok", "n", "rk")
        .orderBy("rk")
    )


@register(
    "dedup_clusters",
    f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLE_SQL},
    dfreq AS (SELECT sh, COUNT(*) AS df FROM sh GROUP BY sh),
    kept AS (SELECT s.doc_id, s.sh FROM sh s JOIN dfreq d ON s.sh = d.sh
             WHERE d.df <= 16),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM kept GROUP BY doc_id),
    common AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM kept a JOIN kept b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(least(c.doc_id, coalesce(MIN(r.v), c.doc_id)) AS BIGINT) AS component
    FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS: Jaccard pairs (≥0.3) → connected components →
    every corpus doc labeled with its duplicate-group id (min member).
    The keep-one-per-cluster step of a production dedup pipeline; see
    operators/graph.py for the iterative formulation.  Oracle: DuckDB
    recursive CTE computing the same transitive closure.

    Round-10 default-path swap (VERDICT r9 "Next" #6): pairs now come
    from the ``posting_freq_cap=16`` exact tier — the same df-filtered
    integer-exact Jaccard as ``dedup_ngram_jaccard_capped``, whose
    self-join output is ≤ cap·|postings|/2 (linear in the corpus) —
    because the UNCAPPED Σ bucket² posting join made exact-pairs CC
    the family's α ceiling (0.67 at 300×, 196.6 s).  The oracle
    replays the identical filtered semantics (dfreq/kept CTEs), so the
    gate stays hash-exact.  The cap is 16, NOT the capped tier's 4:
    an old-oracle-vs-new-oracle DuckDB differential showed cap=4
    CHANGES the cluster labels at sf0.001 and sf0.1 (max shingle df
    there is 14/32 — docs legitimately linked through df∈(4,16]
    shingles lose their edge), while cap=16 reproduces the uncapped
    components EXACTLY at sf0.001, sf0.01 and sf0.1 — so the swap
    keeps every oracle-SF result bit-identical to the r1–r9 history
    while the join output stays ≤ 16·|postings|/2, linear in the
    corpus.  The uncapped pair tier remains registered as
    ``dedup_ngram_jaccard``; the LSH candidate tier as
    ``dedup_clusters_minhash``."""
    from .operators.graph import connected_components

    corpus = _dedup_corpus(spark, sf_dir)
    pairs = D.jaccard_pairs(
        corpus, "doc_id", "text", min_permille=300, posting_freq_cap=16
    )
    nodes = corpus.select(F.col("doc_id").alias("id"))
    labels = connected_components(
        nodes, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return labels.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("doc_id")


_MINHASH_BANDS_SQL = f"""
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    )
"""


@register(
    "dedup_clusters_minhash",
    f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(least(c.doc_id, coalesce(MIN(r.v), c.doc_id)) AS BIGINT) AS component
    FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
    GROUP BY c.doc_id
    ORDER BY doc_id
    """,
)
def dedup_clusters_minhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup clusters with LSH candidate generation — the 100 TB
    clustering path.

    ``dedup_clusters`` generates pairs from the full shingle
    posting-list join (Σ bucket² work over every shingle in the
    corpus); here candidates come from banded minhash signatures
    (constant-size per doc — the shuffle is |docs|·2 band rows no
    matter how long the documents are), each candidate is verified
    with exact Jaccard over just that pair's shingle arrays, and the
    verified edges feed the same connected-components loop.  Recall
    is bounded by the banding probability (recall < 1 by design);
    precision matches ``dedup_clusters`` exactly, since verification
    recomputes true Jaccard.  Oracle: DuckDB recursive CTE over the
    identically-banded, identically-verified edge set."""
    from .operators.graph import connected_components

    corpus = _dedup_corpus(spark, sf_dir)
    pairs = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=300
    )
    nodes = corpus.select(F.col("doc_id").alias("id"))
    labels = connected_components(
        nodes, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    return labels.select(
        F.col("id").cast("bigint").alias("doc_id"),
        F.col("component").cast("bigint").alias("component"),
    ).orderBy("doc_id")


@register(
    "dedup_cluster_representatives",
    f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    members AS (SELECT DISTINCT u AS doc_id FROM edges),
    labeled AS (
        SELECT m.doc_id,
               least(m.doc_id, MIN(r.v)) AS component
        FROM members m JOIN reach r ON r.u = m.doc_id
        GROUP BY m.doc_id
    ),
    toks AS (
        SELECT c.doc_id, len(string_split_regex(c.text, '\\s+')) AS n_tokens
        FROM corpus c
    ),
    ranked AS (
        SELECT l.component, l.doc_id, t.n_tokens,
               ROW_NUMBER() OVER (PARTITION BY l.component
                   ORDER BY t.n_tokens DESC, l.doc_id) AS rk
        FROM labeled l JOIN toks t ON t.doc_id = l.doc_id
    )
    SELECT CAST(component AS BIGINT) AS component,
           CAST(COUNT(*) AS BIGINT) AS n_members,
           CAST(MIN(CASE WHEN rk = 1 THEN doc_id END) AS BIGINT) AS rep_doc_id,
           CAST(MIN(CASE WHEN rk = 1 THEN n_tokens END) AS BIGINT) AS rep_n_tokens,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens
    FROM ranked
    GROUP BY component
    ORDER BY component
    """,
)
def dedup_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection per near-dup cluster (round-5) —
    the step production pipelines actually run after clustering: keep
    the HIGHEST-QUALITY member (here: most tokens, doc_id tiebreak),
    not the arbitrary min-id.  Clusters come from the 100 TB path
    (banded minhash candidates → exact-Jaccard verification →
    connected components, exactly ``dedup_clusters_minhash``); output
    is one row per real duplicate group: component id, member count,
    the chosen representative with its token count, and the group's
    total token mass (= how much the dedup saves).

    Scale shape: everything up to labels is the proven clusters
    pipeline; representative selection is one window over (component)
    — group sizes are duplicate-cluster sizes, bounded by the dedup
    semantics themselves — plus a single conditional aggregate.
    Singleton docs never enter (members = pair endpoints only), so the
    window input is |dup docs|, not |corpus|."""
    from .operators.graph import connected_components

    corpus = _dedup_corpus(spark, sf_dir)
    pairs = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=300
    ).transform(tracked_persist)
    members = (
        pairs.select(F.col("id_a").alias("id"))
        .unionByName(pairs.select(F.col("id_b").alias("id")))
        .distinct()
    )
    labels = connected_components(
        members, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    # join BEFORE tokenizing: the member join prunes corpus rows first
    # (labels = dup members only, ≪ N — AQE broadcasts it), so the
    # tokenize cost is O(|dup docs|), not O(corpus).  Tokenizing in a
    # projection above the scan would run for every corpus row —
    # Catalyst prunes columns, it does not defer expensive expressions
    # past a join.
    ranked = (
        corpus.join(
            labels.select(F.col("id").alias("doc_id"), "component"), "doc_id"
        )
        .select(
            "doc_id",
            "component",
            F.size(F.split(F.col("text"), X.TOKEN_RE)).alias("n_tokens"),
        )
        .withColumn(
            "rk",
            F.row_number().over(
                Window.partitionBy("component").orderBy(
                    F.col("n_tokens").desc(), F.col("doc_id")
                )
            ),
        )
    )
    return (
        ranked.groupBy("component")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_members"),
            F.min(F.when(F.col("rk") == 1, F.col("doc_id")))
            .cast("bigint")
            .alias("rep_doc_id"),
            F.min(F.when(F.col("rk") == 1, F.col("n_tokens")))
            .cast("bigint")
            .alias("rep_n_tokens"),
            F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        )
        .select(
            F.col("component").cast("bigint"),
            "n_members",
            "rep_doc_id",
            "rep_n_tokens",
            "total_tokens",
        )
        .orderBy("component")
    )


# ---------------------------------------------------------------------------
# Pandas-UDF tier (Arrow-batched Python): grouped-map, grouped-agg.
# Integer arithmetic inside pandas keeps them oracle-exact.
# ---------------------------------------------------------------------------


@register(
    "grouped_map_normalize",
    """
    SELECT user_id, event_id,
           CAST(CAST(floor(value * 100) AS BIGINT) -
                MIN(CAST(floor(value * 100) AS BIGINT)) OVER (PARTITION BY user_id)
                AS BIGINT) AS value_rel_cents
    FROM events
    WHERE user_id < 20
    ORDER BY user_id, event_id
    """,
)
def grouped_map_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map: per-user min-normalization done in
    pandas (integer cents, so Python arithmetic is oracle-exact).  The
    grouped-map escape hatch for per-group logic Spark SQL can't
    express — here deliberately something it CAN, so DuckDB verifies
    the plumbing end-to-end."""
    import pandas as pd

    ev = (
        load_testdata(spark, sf_dir, "events")
        .filter(F.col("user_id") < 20)
        .select(
            "user_id",
            "event_id",
            (F.col("value") * 100).cast("bigint").alias("cents"),
        )
    )

    def normalize(pdf: pd.DataFrame) -> pd.DataFrame:
        out = pdf[["user_id", "event_id"]].copy()
        out["value_rel_cents"] = pdf["cents"] - pdf["cents"].min()
        return out

    return (
        ev.groupBy("user_id")
        .applyInPandas(normalize, "user_id long, event_id long, value_rel_cents long")
        .orderBy("user_id", "event_id")
    )


@register(
    "pandas_udaf_weighted",
    """
    WITH ev AS (
        SELECT event_type, CAST(floor(value * 100) AS BIGINT) AS cents,
               CAST(json_extract_string(props, '$.k') AS BIGINT) AS w
        FROM events
    )
    SELECT event_type,
           CAST(SUM(cents * w) AS BIGINT) AS weighted_cents,
           CAST(SUM(w) AS BIGINT) AS total_w
    FROM ev
    GROUP BY event_type
    ORDER BY event_type
    """,
)
def pandas_udaf_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped-aggregate pandas UDF (vectorized UDAF): weighted sums in
    integer space — numpy int64 accumulation is order-independent and
    exact, so the DuckDB oracle matches bit-for-bit."""
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    # no type hints: `from __future__ import annotations` stringizes
    # them, which pandas_udf's signature inference rejects — declare
    # GROUPED_AGG explicitly instead
    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def wsum(cents, w):
        return int((cents * w).sum())

    @pandas_udf("long", PandasUDFType.GROUPED_AGG)
    def swsum(w):
        return int(w.sum())

    ev = load_testdata(spark, sf_dir, "events").select(
        "event_type",
        (F.col("value") * 100).cast("bigint").alias("cents"),
        F.get_json_object("props", "$.k").cast("bigint").alias("w"),
    )
    return (
        ev.groupBy("event_type")
        .agg(
            wsum("cents", "w").alias("weighted_cents"),
            swsum("w").alias("total_w"),
        )
        .orderBy("event_type")
    )


@register(
    "approx_distinct_stats",
    """
    SELECT l_returnflag,
           CAST(COUNT(*) AS BIGINT) AS n,
           CAST(COUNT(DISTINCT l_partkey) AS BIGINT) AS exact_parts,
           TRUE AS hll_within_3rsd,
           TRUE AS median_within_band
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def approx_distinct_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch surface: HyperLogLog distinct + approximate median — now
    with a BOUNDED-ERROR oracle (round-4, VERDICT r3 "Next" #4; the
    pattern ``approx_distinct_kmv`` established).  The raw sketch
    values are engine-private (Spark's HLL++ and GK-quantile internals
    have no DuckDB twin), so the query emits the EXACT aggregates plus
    two booleans asserting each sketch landed inside its documented
    accuracy contract; the oracle computes the exact columns and claims
    ``TRUE`` for the bounds.  A sketch drifting outside its bound flips
    the boolean and fails the driver's hash — a real gate, not
    rows-only.

    Bounds: ``approx_count_distinct`` default rsd = 0.05 ⇒ 3·rsd = 15%
    (≈3σ; floor of 5 absolute for tiny groups where HLL sparse mode is
    exact anyway).  ``percentile_approx`` default accuracy 10⁴ ⇒ rank
    error ≤ n/10⁴, far inside the exact 49th–51st percentile band it is
    checked against."""
    li = load_testdata(spark, sf_dir, "lineitem")
    # TWO aggregates joined on the 3-row group key, NOT one: mixing
    # countDistinct with four non-distinct aggregates makes Catalyst
    # plan an Expand (one row copy per aggregate class) — measured
    # 9.5 s vs 3.2 s split at sf0.1.  The join is |groups| rows.
    counts = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.countDistinct("l_partkey").cast("bigint").alias("exact_parts"),
    )
    sketches = li.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_partkey").alias("_hll"),
        F.percentile_approx("l_extendedprice", 0.5).alias("_amed"),
        # one percentile(col, array(...)) call — the exact aggregate
        # buffers the group's values once per CALL (price_percentiles
        # lesson)
        F.expr("percentile(l_extendedprice, array(0.49D, 0.51D))").alias("_band"),
    )
    agg = counts.join(F.broadcast(sketches), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "n",
        "exact_parts",
        (
            F.abs(F.col("_hll") - F.col("exact_parts"))
            <= F.greatest(F.ceil(F.col("exact_parts") * 0.15), F.lit(5))
        ).alias("hll_within_3rsd"),
        (
            (F.col("_amed") >= F.element_at("_band", 1))
            & (F.col("_amed") <= F.element_at("_band", 2))
        ).alias(
            "median_within_band"
        ),
    ).orderBy("l_returnflag")


@register(
    "similarity_ann_ivf",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    cadc AS (SELECT GREATEST(61, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))
             AS cad FROM n),
    cents AS (SELECT vec_id AS cid, v AS cv FROM n, cadc WHERE vec_id % cad = 0),
    assigned AS (
        SELECT n.vec_id, n.v, n.nrm, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.v, c.cv) DESC, c.cid) AS crk
        FROM n CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, v, nrm, cid FROM assigned WHERE crk = 1),
    q AS (SELECT * FROM cells WHERE vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM q JOIN cells c ON q.cid = c.cid AND c.vec_id != q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-style ANN: a coarse quantizer assigns every vector to its
    nearest centroid cell (centroids = every 61st vector — a k-means
    stand-in that keeps the oracle deterministic); queries probe only
    their own cell.  The inverted-file structure is the cell equi-join:
    at scale, candidates shrink by ~|cells|× versus brute force, and the
    centroid set stays broadcast-sized.  nprobe>1 = also joining the
    next-ranked cells (crk <= nprobe)."""
    from pyspark.sql import Window

    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings")))
    n = emb.select("vec_id", F.col("_v").alias("v"), F.col("_norm").alias("nrm"))
    cents = _ivf_centroids(n)  # √N cadence derived in-plan (ADVICE r7)
    # the cell assignment IS the inverted file: build it once (persist)
    # — unpersisted, the N×|cents| quantization crossJoin would run
    # twice (query side + probe side), the dominant cost.  Assignment is
    # argmax-by-struct in a partial-aggregated groupBy (max(struct(d,
    # -cid)) ≡ row_number()=1 over (d DESC, cid ASC), ties included) —
    # a map-side-combined HashAggregate instead of a full-corpus sort
    # exchange; v/nrm ride along via first() (constant per group), so
    # nothing recomputes and no join-back is needed.
    cells = (
        n.crossJoin(F.broadcast(cents))
        .select(
            "vec_id", "cid", S.dot(F.col("v"), F.col("cv")).alias("d"), "v", "nrm"
        )
        .groupBy("vec_id")
        .agg(
            F.max(F.struct(F.col("d"), (-F.col("cid")).alias("nc"))).alias("m"),
            F.first("v").alias("v"),
            F.first("nrm").alias("nrm"),
        )
        .select("vec_id", "v", "nrm", (-F.col("m.nc")).alias("cid"))
        .transform(tracked_persist)
    )
    q = cells.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("cid").alias("qcid"),
    )
    scored = (
        cells.join(
            F.broadcast(q),
            (F.col("qcid") == F.col("cid")) & (F.col("query_id") != F.col("vec_id")),
        )
        .withColumn("cos_raw", S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm")))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("vec_id").cast("bigint").alias("neighbor_id"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "tfidf_distinctive_terms",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents WHERE doc_id < 50
    ),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
           FROM tok GROUP BY doc_id, tok),
    df AS (SELECT tok, CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS df FROM tok GROUP BY tok),
    scored AS (
        SELECT tf.doc_id, tf.tok, tf.tf, df.df,
               CAST((1000 * tf.tf) // df.df AS BIGINT) AS tfidf_milli
        FROM tf JOIN df ON tf.tok = df.tok
    )
    SELECT doc_id, tok, tf, df, tfidf_milli
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY tfidf_milli DESC, tok) AS rk
        FROM scored
    )
    WHERE rk <= 3
    ORDER BY doc_id, tfidf_milli DESC, tok
    """,
)
def tfidf_distinctive_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF-style distinctive-term extraction with EXACT integer
    scoring (tf·1000 div df — the rank-equivalent of tf/df; a float idf
    log would not oracle-match across engines' libm)."""
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents").filter(F.col("doc_id") < 50)
    tok = docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    # df from a WINDOW over the tf aggregate: tf has exactly one row
    # per (doc, tok), so count-over-partition(tok) IS the document
    # frequency — no second tokenize+explode pass and no join (the
    # aggregate-and-join-back form re-scanned and re-exploded the
    # corpus for the df side)
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(Window.partitionBy("tok"))
    ).withColumn("tfidf_milli", F.expr("div(1000 * tf, df)").cast("bigint"))
    w = Window.partitionBy("doc_id").orderBy(F.col("tfidf_milli").desc(), F.col("tok"))
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("doc_id", "tok", "tf", "df", "tfidf_milli")
        .orderBy("doc_id", F.col("tfidf_milli").desc(), "tok")
    )


@register(
    "bigram_stats",
    r"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
    bi AS (
        SELECT toks[i] AS w1, toks[i+1] AS w2
        FROM t, unnest(generate_series(1, len(toks) - 1)) AS u(i)
    ),
    counts AS (SELECT w1, w2, CAST(COUNT(*) AS BIGINT) AS n FROM bi GROUP BY w1, w2),
    uni AS (SELECT w1, CAST(SUM(n) AS BIGINT) AS n1 FROM counts GROUP BY w1)
    SELECT c.w1, c.w2, c.n,
           CAST((1000 * c.n) // u.n1 AS BIGINT) AS p_cond_permille
    FROM counts c JOIN uni u ON c.w1 = u.w1
    WHERE c.n >= 20
    ORDER BY c.w1, c.w2
    """,
)
def bigram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bigram conditional probabilities (×1000, integer-exact) — the
    n-gram language-model statistic behind perplexity-style quality
    filters.  Narrow shingle generation, one aggregation shuffle."""
    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select(F.split(F.col("text"), X.TOKEN_RE).alias("toks"))
    idx = F.sequence(F.lit(0), F.size("toks") - 2)
    bi = (
        toks.filter(F.size("toks") >= 2)
        .select(
            F.explode(
                F.transform(
                    idx,
                    lambda i: F.struct(
                        F.element_at("toks", i + 1).alias("w1"),
                        F.element_at("toks", i + 2).alias("w2"),
                    ),
                )
            ).alias("b")
        )
        .select("b.w1", "b.w2")
    )
    counts = bi.groupBy("w1", "w2").agg(F.count(F.lit(1)).alias("n"))
    uni = counts.groupBy("w1").agg(F.sum("n").cast("bigint").alias("n1"))
    return (
        counts.join(uni, "w1")
        .filter(F.col("n") >= 20)
        .select(
            "w1", "w2", F.col("n").cast("bigint").alias("n"),
            F.expr("div(1000 * n, n1)").cast("bigint").alias("p_cond_permille"),
        )
        .orderBy("w1", "w2")
    )


@register(
    "ann_recall_at_k",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM embeddings
    ),
    q AS (SELECT * FROM n WHERE vec_id < 20),
    brute AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                                c.vec_id) AS rk
            FROM q JOIN n c ON c.vec_id != q.vec_id
        ) WHERE rk <= 5
    ),
    approx AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id
        FROM q JOIN n c ON q.bkt = c.bkt AND c.vec_id != q.vec_id
    ),
    hits AS (
        SELECT b.query_id,
               CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        FROM brute b LEFT JOIN approx a
          ON b.query_id = a.query_id AND b.neighbor_id = a.neighbor_id
        GROUP BY b.query_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, n_hit,
           CAST((1000 * n_hit) // 5 AS BIGINT) AS recall_permille
    FROM hits
    ORDER BY query_id
    """,
)
def ann_recall_at_k(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the sign-LSH candidate set against exact brute-force
    top-5, computed entirely in-engine — the evaluation loop an ANN
    deployment needs (approximation quality as a first-class query, not
    a notebook afterthought)."""
    from pyspark.sql import Window

    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).withColumn(
        "bkt", S.sign_bucket("embedding", bits=4)
    )
    # ONE scoring pass: a brute-top-5 pair (q, n) is an LSH candidate
    # iff the two sign buckets are equal, so the "did the approximate
    # index retrieve it" flag rides the exact-ranking join directly —
    # no second N×|Q| scan, no cached intermediate, and no join-back
    # (the round-2 version ran brute and bucketed passes separately off
    # a persisted frame and left-joined them: half the fold work and a
    # cache materialization saved).  Vectors are projected away before
    # the ranking exchange — the window shuffles (ids, cos, hit) only.
    n = emb.select(
        "vec_id", F.col("_v").alias("v"), F.col("_norm").alias("nrm"), "bkt"
    )
    q = n.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bkt").alias("qbkt"),
    )
    cos = S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    pairs = (
        n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id",
            "vec_id",
            cos.alias("cos"),
            (F.col("qbkt") == F.col("bkt")).cast("int").alias("hit"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    hits = pairs.groupBy("query_id").agg(
        F.sum("hit").cast("bigint").alias("n_hit")
    )
    return hits.select(
        F.col("query_id").cast("bigint"),
        "n_hit",
        F.expr("div(1000 * n_hit, 5)").cast("bigint").alias("recall_permille"),
    ).orderBy("query_id")


@register(
    "text_winnowing_fingerprints",
    r"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents),
    grams AS (
        SELECT doc_id, i AS pos,
               md5(concat_ws(' ', toks[i], toks[i+1], toks[i+2], toks[i+3], toks[i+4])) AS h
        FROM t, unnest(generate_series(1, len(toks) - 4)) AS u(i)
        WHERE len(toks) >= 5
    ),
    winnowed AS (
        SELECT doc_id,
               MIN(h) OVER (PARTITION BY doc_id ORDER BY pos
                            ROWS BETWEEN CURRENT ROW AND 3 FOLLOWING) AS sel
        FROM grams
    ),
    sel AS (SELECT DISTINCT doc_id, sel FROM winnowed)
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_fingerprints,
           md5(string_agg(sel, '|' ORDER BY sel)) AS doc_fingerprint
    FROM sel
    GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_winnowing_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprinting (winnowing, à la MOSS):
    hash every 5-gram, keep the window-of-4 minimum at each position,
    fingerprint = digest of the selected hash set.  Guarantees any
    shared run of ≥8 tokens yields a shared selected hash — the
    plagiarism/near-dup detector that survives local edits."""
    from pyspark.sql import Window

    docs = load_testdata(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split(F.col("text"), X.TOKEN_RE).alias("toks"))
    idx = F.sequence(F.lit(0), F.size("toks") - 5)
    grams = (
        toks.filter(F.size("toks") >= 5)
        .select(
            "doc_id",
            F.posexplode(
                F.transform(
                    idx,
                    lambda i: F.concat_ws(
                        " ", *[F.element_at("toks", i + j + 1) for j in range(5)]
                    ),
                )
            ).alias("pos", "gram"),
        )
        .select("doc_id", "pos", F.md5(F.col("gram").cast("binary")).alias("h"))
    )
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(0, 3)
    sel = grams.select("doc_id", F.min("h").over(w).alias("sel")).distinct()
    return (
        sel.groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_fingerprints"),
            F.md5(
                F.concat_ws("|", F.array_sort(F.collect_list("sel"))).cast("binary")
            ).alias("doc_fingerprint"),
        )
        .orderBy("doc_id")
    )


@register(
    "skew_salted_aggregation",
    """
    SELECT l_returnflag,
           CAST(SUM(CAST(l_quantity AS BIGINT)) AS BIGINT) AS total_qty,
           CAST(SUM(CAST(floor(l_extendedprice * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM lineitem
    GROUP BY l_returnflag
    ORDER BY l_returnflag
    """,
)
def skew_salted_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The skew-safe two-phase aggregation (operators/skew.py) under the
    oracle gate: l_returnflag has only 3 values — the definitional hot
    key — so the heavy shuffle carries (key, salt) pre-aggregates.
    Result is provably identical to the plain GROUP BY the oracle runs."""
    from .operators.skew import salted_sum

    li = load_testdata(spark, sf_dir, "lineitem").select(
        "l_returnflag",
        F.col("l_orderkey").alias("uid"),
        F.col("l_quantity").cast("bigint").alias("qty"),
        F.floor(F.col("l_extendedprice") * 100).cast("bigint").alias("cents"),
    )
    out = salted_sum(
        li, ["l_returnflag"], {"qty": "total_qty", "cents": "total_cents"},
        salt_from="uid", buckets=16,
    )
    return out.select(
        "l_returnflag",
        F.col("total_qty").cast("bigint"),
        F.col("total_cents").cast("bigint"),
    ).orderBy("l_returnflag")


@register(
    "crossmodal_doc_embedding_join",
    r"""
    SELECT d.doc_id,
           CAST(len(string_split_regex(d.text, '\s+')) AS BIGINT) AS n_tokens,
           e.label,
           CAST(CAST(ROUND(sqrt(list_dot_product(e.embedding::DOUBLE[], e.embedding::DOUBLE[])), 6) AS DECIMAL(12,6)) AS DOUBLE) AS vec_norm
    FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id
    ORDER BY d.doc_id
    """,
)
def crossmodal_doc_embedding_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal record assembly: text features joined to the embedding
    modality by id — the join every multimodal training pipeline runs to
    build (text, vector, label) examples."""
    docs = load_testdata(spark, sf_dir, "documents")
    emb = S.with_norm(load_testdata(spark, sf_dir, "embeddings"))
    return (
        docs.join(emb, docs.doc_id == emb.vec_id, "inner")
        .select(
            "doc_id",
            F.size(F.split(F.col("text"), X.TOKEN_RE)).cast("bigint").alias("n_tokens"),
            "label",
            F.round("_norm", 6).cast("decimal(12,6)").cast("double").alias("vec_norm"),
        )
        .orderBy("doc_id")
    )


@register(
    "dedup_tf_cosine",
    f"""
    WITH {_CORPUS_SQL},
    tok AS (
        SELECT doc_id, unnest(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END) AS tok
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus)
    ),
    tf AS (SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY doc_id, tok),
    norms AS (SELECT doc_id, CAST(SUM(tf * tf) AS BIGINT) AS norm2 FROM tf GROUP BY doc_id),
    dots AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, CAST(SUM(a.tf * b.tf) AS BIGINT) AS dot
        FROM tf a JOIN tf b ON a.tok = b.tok AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    )
    SELECT id_a, id_b, dot,
           CAST(na.norm2 AS BIGINT) AS norm2_a, CAST(nb.norm2 AS BIGINT) AS norm2_b
    FROM dots
    JOIN norms na ON na.doc_id = id_a
    JOIN norms nb ON nb.doc_id = id_b
    WHERE dot * dot * 100 >= 81 * na.norm2 * nb.norm2
    ORDER BY id_a, id_b
    """,
)
def dedup_tf_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sparse term-frequency cosine near-dup over 3-gram shingle terms:
    cos(a,b) ≥ 0.9 expressed ENTIRELY in integers
    (dot²·100 ≥ 81·‖a‖²·‖b‖²) — no floats, no boundary risk.  The
    explode-join sparse dot product is THE scalable sparse-vector
    similarity: cost Σ posting-list².  Terms are shingles, not unigrams
    — this corpus has a ~31-word vocabulary, so unigram posting lists
    are nearly the whole corpus (measured 600M join rows at sf0.1);
    trigram terms keep lists short (df-pruning is the other standard
    fix)."""
    corpus = _dedup_corpus(spark, sf_dir)
    toks = corpus.select(
        F.col("doc_id"), F.split(F.col("text"), X.TOKEN_RE).alias("toks")
    )
    grams = F.when(
        F.size("toks") >= 3,
        F.transform(
            F.sequence(F.lit(0), F.size("toks") - 3),
            lambda i: F.concat_ws(
                " ", *[F.element_at("toks", i + j + 1) for j in range(3)]
            ),
        ),
    ).otherwise(F.array())
    # trigram identity, not content, drives the tf/dot pipeline —
    # xxhash64 to longs before the groupBy/self-join (same trick as
    # operators/dedup.jaccard_pairs: ~4× smaller shuffles, long
    # compares; the DuckDB oracle intersects raw strings, so any
    # collision would surface as a hash mismatch there)
    tok = toks.select("doc_id", F.explode(grams).alias("tok_raw")).select(
        "doc_id", F.xxhash64("tok_raw").alias("tok")
    )
    tf = tok.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
    tf = tf.transform(tracked_persist)
    norms = tf.groupBy("doc_id").agg(F.sum(F.col("tf") * F.col("tf")).alias("norm2"))
    b = tf.select(F.col("doc_id").alias("id_b"), "tok", F.col("tf").alias("tf_b"))
    dots = (
        tf.join(b, on="tok")
        .filter(F.col("doc_id") < F.col("id_b"))
        .groupBy(F.col("doc_id").alias("id_a"), "id_b")
        .agg(F.sum(F.col("tf") * F.col("tf_b")).alias("dot"))
    )
    na = norms.select(F.col("doc_id").alias("id_a"), F.col("norm2").alias("norm2_a"))
    nb = norms.select(F.col("doc_id").alias("id_b"), F.col("norm2").alias("norm2_b"))
    return (
        dots.join(na, "id_a")
        .join(nb, "id_b")
        .filter(
            F.col("dot") * F.col("dot") * 100 >= 81 * F.col("norm2_a") * F.col("norm2_b")
        )
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("dot").cast("bigint"),
            F.col("norm2_a").cast("bigint"),
            F.col("norm2_b").cast("bigint"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "similarity_ann_ivf_nprobe2",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    cadc AS (SELECT GREATEST(61, CAST(ceil(sqrt(COUNT(*))) AS BIGINT))
             AS cad FROM n),
    cents AS (SELECT vec_id AS cid, v AS cv FROM n, cadc WHERE vec_id % cad = 0),
    assigned AS (
        SELECT n.vec_id, n.v, n.nrm, c.cid,
               ROW_NUMBER() OVER (PARTITION BY n.vec_id
                   ORDER BY list_dot_product(n.v, c.cv) DESC, c.cid) AS crk
        FROM n CROSS JOIN cents c
    ),
    cells AS (SELECT vec_id, v, nrm, cid FROM assigned WHERE crk = 1),
    probes AS (SELECT vec_id, cid FROM assigned WHERE crk <= 2 AND vec_id < 10),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM probes p
        JOIN n q ON q.vec_id = p.vec_id
        JOIN cells c ON c.cid = p.cid AND c.vec_id != p.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_ann_ivf_nprobe2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with nprobe=2: queries probe their two nearest cells —
    the recall/cost knob of inverted-file ANN (recall ↑ with probes,
    candidates ∝ nprobe/|cells|)."""
    from pyspark.sql import Window

    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings")))
    n = emb.select("vec_id", F.col("_v").alias("v"), F.col("_norm").alias("nrm"))
    cents = _ivf_centroids(n)  # √N cadence derived in-plan (ADVICE r7)
    # Cell assignment WITHOUT a ranking window: argmax-by-struct in a
    # partial-aggregated groupBy.  max(struct(d, -cid)) picks the
    # best-scoring cell with smallest-cid tie-break — identical
    # semantics to row_number()=1 over (d DESC, cid ASC) — but plans as
    # a map-side-combined HashAggregate over the broadcast-join output:
    # no full-corpus sort exchange, and nothing wider than (vec_id,
    # cid, d) ever shuffles (the round-2 regression shuffled and cached
    # 64-dim vectors through the window).  The top-2 probe ranking DOES
    # still use a window, but only over the |Q|·|cells| probe rows.
    scored_cells = n.crossJoin(F.broadcast(cents)).select(
        "vec_id", "cid", S.dot(F.col("v"), F.col("cv")).alias("d")
    )
    cellmap = (
        scored_cells.groupBy("vec_id")
        .agg(F.max(F.struct(F.col("d"), (-F.col("cid")).alias("nc"))).alias("m"))
        .select("vec_id", (-F.col("m.nc")).alias("cid"))
    )
    cells = cellmap.join(n, "vec_id")
    crk_w = Window.partitionBy("vec_id").orderBy(F.col("d").desc(), F.col("cid"))
    probes = (
        n.filter(F.col("vec_id") < 10)
        .crossJoin(F.broadcast(cents))
        .select("vec_id", "cid", S.dot(F.col("v"), F.col("cv")).alias("d"))
        .withColumn("crk", F.row_number().over(crk_w))
        .filter(F.col("crk") <= 2)
        .select(F.col("vec_id").alias("query_id"), F.col("cid").alias("pcid"))
    )
    # broadcast only the PROBING vectors (vec_id < 10), not the whole
    # corpus — the round-2 version broadcast all N query-side rows with
    # their vectors, which at scale is a full-corpus driver collect
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"), F.col("nrm").alias("qn")
    )
    cand = cells.select(
        F.col("vec_id").alias("neighbor_id"), F.col("v").alias("cv"),
        F.col("nrm").alias("cn"), F.col("cid").alias("ccid"),
    )
    scored = (
        probes.join(F.broadcast(q), "query_id")
        .join(cand, (F.col("ccid") == F.col("pcid")) & (F.col("neighbor_id") != F.col("query_id")))
        .withColumn("cos_raw", S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .select("query_id", "neighbor_id", "cos_raw")
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("neighbor_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "text_repetition_ratios",
    r"""
    WITH t AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks
        FROM documents
    ),
    uni AS (
        SELECT doc_id, CAST(MAX(c) AS BIGINT) AS top_tok_count
        FROM (
            SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(toks) AS tok FROM t)
            GROUP BY doc_id, tok
        )
        GROUP BY doc_id
    ),
    bi AS (
        SELECT doc_id,
               CAST(len(toks) AS BIGINT) AS n_tokens,
               CASE WHEN len(toks) >= 2
                    THEN list_transform(range(1, len(toks)),
                                        i -> toks[i] || ' ' || toks[i + 1])
                    ELSE [] END AS bigrams
        FROM t
    )
    SELECT bi.doc_id AS doc_id,
           bi.n_tokens,
           CAST((1000 * uni.top_tok_count) // bi.n_tokens AS BIGINT) AS top_unigram_permille,
           CAST(CASE WHEN len(bi.bigrams) > 0
                     THEN (1000 * (len(bi.bigrams) - len(list_distinct(bi.bigrams)))) // len(bi.bigrams)
                     ELSE 0 END AS BIGINT) AS dup_bigram_permille
    FROM bi JOIN uni ON bi.doc_id = uni.doc_id
    ORDER BY doc_id
    """,
)
def text_repetition_ratios(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gopher-style repetition quality signals (Rae et al. 2021 §A1.1):
    fraction of tokens taken by the single most-frequent token, and
    fraction of duplicated 2-grams — the two cheapest high-precision
    filters for boilerplate/spam in a training corpus.

    Spark-first shapes: the top-unigram count is explode → two map-side-
    combined aggregations keyed by doc_id (never a per-doc UDF); the
    bigram list is a pure array expression (``transform`` over
    ``sequence``) so it stays in whole-stage codegen.  Ratios are
    integer permille (``div``) for cross-engine hash stability.
    Empty/1-token docs guard the ``sequence`` (Spark counts DOWN for
    sequence(1,0) — NOTES pitfall)."""
    from pyspark.sql import Window

    # ONE posexplode pass feeds BOTH aggregation grains via GROUPING
    # SETS ((doc,tok),(doc,bigram)) — the naive form tokenized the
    # corpus twice (explode branch for unigrams, array branch for
    # bigrams).  The bigram is lead(tok) over the in-doc position
    # window, whose Exchange(doc_id) is the same partitioning the
    # grouping-sets aggregate and the final per-doc rollup reuse.
    docs = load_testdata(spark, sf_dir, "documents")
    pe = docs.select(
        "doc_id", F.posexplode(X.tokens("text")).alias("pos", "tok")
    )
    wd = Window.partitionBy("doc_id").orderBy("pos")
    pe = pe.withColumn(
        "bg", F.concat_ws(" ", F.col("tok"), F.lead("tok").over(wd))
    ).withColumn(
        "bg", F.when(F.lead("tok").over(wd).isNotNull(), F.col("bg"))
    )
    g = pe.groupingSets(
        [["doc_id", "tok"], ["doc_id", "bg"]], "doc_id", "tok", "bg"
    ).agg(
        F.count(F.lit(1)).alias("c"),
        F.grouping("bg").alias("is_tok_grain"),
        F.count("bg").alias("c_bg"),
    )
    per_doc = g.groupBy("doc_id").agg(
        F.max(F.when(F.col("is_tok_grain") == 1, F.col("c"))).alias("top_tok_count"),
        F.sum(F.when(F.col("is_tok_grain") == 1, F.col("c"))).cast("bigint").alias("n_tokens"),
        # bigram grain, NULL-bg group excluded: c_bg==0 there
        F.sum(
            F.when((F.col("is_tok_grain") == 0) & (F.col("c_bg") > 0), F.col("c"))
        ).cast("bigint").alias("n_bigrams"),
        F.count(
            F.when((F.col("is_tok_grain") == 0) & (F.col("c_bg") > 0), F.lit(1))
        ).cast("bigint").alias("n_distinct_bigrams"),
    )
    return (
        per_doc.withColumn(
            "n_dup_bigrams", F.col("n_bigrams") - F.col("n_distinct_bigrams")
        )
        .select(
            "doc_id",
            "n_tokens",
            F.expr("div(1000 * top_tok_count, n_tokens)")
            .cast("bigint")
            .alias("top_unigram_permille"),
            F.when(
                F.col("n_bigrams") > 0,
                F.expr("div(1000 * n_dup_bigrams, n_bigrams)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dup_bigram_permille"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_cdc_chunks",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    pe AS (
        SELECT doc_id, u.pos AS pos, u.tok AS tok
        FROM (SELECT doc_id,
                     unnest(list_transform(generate_series(1, len(toks)),
                            i -> {{'pos': i, 'tok': toks[i]}})) AS u
              FROM t)
    ),
    cid AS (
        SELECT doc_id, pos, tok,
               SUM(CASE WHEN substr(md5(tok), 1, 1) IN ('0', '1') THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS chunk_id
        FROM pe
    ),
    chunks AS (
        SELECT doc_id, chunk_id,
               md5(string_agg(tok, ' ' ORDER BY pos)) AS fp
        FROM cid GROUP BY doc_id, chunk_id
    ),
    cnt AS (SELECT fp, COUNT(*) AS n_docs FROM chunks GROUP BY fp),
    per_doc AS (
        SELECT c.doc_id, COUNT(*) AS n_chunks,
               SUM(CASE WHEN t.n_docs >= 2 THEN 1 ELSE 0 END) AS n_shared
        FROM chunks c JOIN cnt t ON t.fp = c.fp
        GROUP BY c.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_chunks AS BIGINT) AS n_chunks,
           CAST(n_shared AS BIGINT) AS n_shared_chunks,
           CAST((1000 * n_shared) // n_chunks AS BIGINT) AS shared_permille
    FROM per_doc
    ORDER BY doc_id
    """,
)
def text_cdc_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined chunking — rolling-hash boundaries instead of
    fixed strides (the rsync/LBFS trick): a token opens a new chunk
    when its hash lands in a 1/8 target band, so chunk boundaries are
    determined by CONTENT and survive insertions/deletions that shift
    every fixed-window frame (``text_chunking``'s weakness as a dedup
    unit).  Per doc: how many chunks, and how many also appear verbatim
    in another document — the storage-dedup / near-dup signal.

    Spark-first shape: posexplode → one Exchange(doc_id) where the
    boundary cumsum window AND the per-chunk grouping both live →
    chunk fingerprints → cross-doc count via groupBy(fp) joined back
    (same reused-exchange pattern as ``text_span_dup_stats``) → per-doc
    aggregate.  Chunk text is rebuilt with an order-struct sort inside
    the aggregate (collect_list alone is order-nondeterministic)."""
    corpus = _dedup_corpus(spark, sf_dir)
    pe = corpus.select(
        "doc_id", F.posexplode(F.split(F.col("text"), X.TOKEN_RE)).alias("pos", "tok")
    )
    flag = F.when(
        F.substring(F.md5(F.col("tok").cast("binary")), 1, 1).isin("0", "1"), 1
    ).otherwise(0)
    w = Window.partitionBy("doc_id").orderBy("pos").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cid = pe.withColumn("chunk_id", F.sum(flag).over(w))
    chunks = cid.groupBy("doc_id", "chunk_id").agg(
        F.md5(
            F.concat_ws(
                " ",
                F.transform(
                    F.array_sort(F.collect_list(F.struct("pos", "tok"))),
                    lambda x: x.tok,
                ),
            ).cast("binary")
        ).alias("fp")
    )
    cnt = chunks.groupBy("fp").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        chunks.join(cnt, "fp")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_shared"),
        )
    )
    return per_doc.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_chunks").cast("bigint"),
        F.col("n_shared").cast("bigint").alias("n_shared_chunks"),
        F.expr("div(1000 * n_shared, n_chunks)").cast("bigint").alias("shared_permille"),
    ).orderBy("doc_id")


_SPAN8 = ", ".join(f"toks[i+{j}]" for j in range(8))


@register(
    "text_span_dup_stats",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    spans AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM t
    ),
    cnt AS (SELECT span, COUNT(*) AS n_docs FROM spans GROUP BY span),
    per_doc AS (
        SELECT s.doc_id, COUNT(*) AS n_spans,
               SUM(CASE WHEN c.n_docs >= 2 THEN 1 ELSE 0 END) AS n_dup
        FROM spans s JOIN cnt c ON s.span = c.span
        GROUP BY s.doc_id
    )
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.n_dup, 0) AS BIGINT) AS n_dup_spans,
           CAST(CASE WHEN coalesce(p.n_spans, 0) > 0
                     THEN (1000 * p.n_dup) // p.n_spans ELSE 0 END AS BIGINT)
               AS dup_span_permille
    FROM corpus c LEFT JOIN per_doc p ON p.doc_id = c.doc_id
    ORDER BY doc_id
    """,
)
def text_span_dup_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Duplicated-span profile per document — the C4-style span-dedup
    signal (Raffel et al. 2020 §2.2 removed repeated three-sentence
    spans; here the span is a fixed 8-token window since the corpus has
    no sentence structure).  A doc whose spans mostly appear in other
    docs is boilerplate or a near-copy; ``dup_span_permille`` is the
    filter column a training pipeline thresholds on.

    Spark-first shape: distinct 8-gram spans per doc (array expression,
    codegen), explode, cross-doc span frequency via groupBy(span hash)
    joined back to the posting list — the grouped side and the probe
    side are the IDENTICAL subtree, so Catalyst reuses one Exchange(h)
    for both (measured 4.8 s vs 6.6 s for a window-count form: ~260k
    one-row window partitions pay per-group sort overhead the hash
    aggregate doesn't) — then one per-doc aggregate.  Span identity
    travels as xxhash64 longs (8 bytes vs ~50-byte strings in the wide
    shuffle); the oracle groups raw strings, so a collision would fail
    the hash gate at sf0.01.  Skew bound: a span's posting list tracks
    its duplicate-group size, not corpus size."""
    corpus = _dedup_corpus(spark, sf_dir)
    # Explode the INLINE generator expression: binding the span array as
    # a named projection column first makes GenerateExec re-evaluate the
    # whole transform per OUTPUT row under codegen — O(spans²) per doc,
    # measured 31.9 s vs 2.1 s at sf0.1.  (The "bind tokens first" rule
    # from NOTES applies to multi-consumer projections, not to a single
    # explode; persisted `_shingled` consumers are unaffected.)
    sp = D.shingle_explode(corpus, "doc_id", "text", 8).select(
        "doc_id", F.xxhash64("sh").alias("h")
    )
    cnt = sp.groupBy("h").agg(F.count(F.lit(1)).alias("n_docs"))
    per_doc = (
        sp.join(cnt, "h")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_spans"),
            F.sum(F.when(F.col("n_docs") >= 2, 1).otherwise(0)).alias("n_dup"),
        )
    )
    return (
        corpus.select("doc_id")
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            F.coalesce("n_spans", F.lit(0)).cast("bigint").alias("n_spans"),
            F.coalesce("n_dup", F.lit(0)).cast("bigint").alias("n_dup_spans"),
            F.when(
                F.coalesce("n_spans", F.lit(0)) > 0,
                F.expr("div(1000 * n_dup, n_spans)"),
            )
            .otherwise(F.lit(0))
            .cast("bigint")
            .alias("dup_span_permille"),
        )
        .orderBy("doc_id")
    )


@register(
    "pipeline_decontaminate",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    spans AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM t
    ),
    ev AS (SELECT DISTINCT span FROM spans
           WHERE doc_id % 10 = 0 AND doc_id < 100000),
    hits AS (
        SELECT s.doc_id, COUNT(*) AS n_shared_spans
        FROM spans s JOIN ev ON ev.span = s.span
        WHERE NOT (s.doc_id % 10 = 0 AND s.doc_id < 100000)
        GROUP BY s.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_shared_spans AS BIGINT) AS n_shared_spans
    FROM hits ORDER BY doc_id
    """,
)
def pipeline_decontaminate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination — flag every training document that
    shares an 8-token span with the held-out evaluation set (here the
    eval stand-in is the corpus docs with ``doc_id % 10 == 0``, whose
    planted near/exact duplicates play the role of leaked eval text).
    This is the n-gram-overlap contamination check LLM training runs
    before training (GPT-3 used 13-gram overlap, Llama/FineWeb n-gram
    dedup against eval suites): any doc returned here would be dropped
    or span-redacted before the corpus ships.

    Scale shape: the eval span set is BENCHMARK-sized (thousands of
    docs), so it broadcasts; the training side is one linear scan whose
    span stream semi-joins the broadcast set — only actual hits ever
    shuffle, and nothing is quadratic in corpus size.  Span identity
    travels as xxhash64 longs; the oracle joins raw strings, so a hash
    collision would fail the sf0.01 gate."""
    corpus = _dedup_corpus(spark, sf_dir)
    is_eval = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000)
    sp = D.shingle_explode(corpus, "doc_id", "text", 8).select(
        "doc_id", F.xxhash64("sh").alias("h")
    )
    eval_spans = sp.filter(is_eval).select("h").distinct()
    hits = (
        sp.filter(~is_eval)
        .join(F.broadcast(eval_spans), "h")
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_shared_spans"))
    )
    return hits.select(
        F.col("doc_id").cast("bigint"),
        F.col("n_shared_spans").cast("bigint"),
    ).orderBy("doc_id")


@register(
    "dedup_minhash_containment_estimate",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    bg AS (
        SELECT a.doc_id AS id_a, a.doc_id + 1 AS id_b
        FROM sizes a JOIN sizes b ON b.doc_id = a.doc_id + 1
    ),
    cand2 AS (SELECT id_a, id_b FROM cand UNION SELECT id_a, id_b FROM bg),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand2 c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    cp AS (
        SELECT c2.id_a, c2.id_b, COALESCE(cm.c, 0) AS c,
               sa.sz AS sz_a, sb.sz AS sz_b,
               (1000 * COALESCE(cm.c, 0)) // least(sa.sz, sb.sz)
                   AS cont_permille
        FROM cand2 c2
        LEFT JOIN common cm ON cm.id_a = c2.id_a AND cm.id_b = c2.id_b
        JOIN sizes sa ON sa.doc_id = c2.id_a
        JOIN sizes sb ON sb.doc_id = c2.id_b
    ),
    est AS (
        SELECT cp.cont_permille,
               least(1000,
                   (1000 * ({' + '.join(f'CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END' for i in range(8))})
                    * (cp.sz_a + cp.sz_b))
                   // ((8 + ({' + '.join(f'CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END' for i in range(8))}))
                       * least(cp.sz_a, cp.sz_b))) AS est_permille
        FROM cp JOIN sig a ON a.doc_id = cp.id_a JOIN sig b ON b.doc_id = cp.id_b
    )
    SELECT CAST(cont_permille // 100 AS BIGINT) AS cont_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(est_permille) // COUNT(*) AS BIGINT) AS avg_est_permille,
           CAST(SUM(abs(est_permille - cont_permille)) // COUNT(*) AS BIGINT)
               AS avg_abs_err_permille
    FROM est
    GROUP BY cont_decile
    ORDER BY cont_decile
    """,
)
def dedup_minhash_containment_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment ESTIMATOR calibration — the asymmetric companion of
    ``dedup_minhash_estimate_calibration``: MinHash agreement m/8
    estimates Jaccard, and with the (cheaply known) shingle-set sizes
    the containment follows algebraically — C_max = J·(|A|+|B|) /
    ((1+J)·min(|A|,|B|)), here in integer permille with m/(8+m)
    substituted for J/(1+J) and clamped at 1000.  Per exact-containment
    decile: pair count, mean estimate, mean absolute error.  This is
    what lets the LSH tier flag quote-inclusion pairs
    (``dedup_shingle_containment`` semantics) WITHOUT a posting-list
    join — signatures + sizes only — so its error profile must be
    measured, not assumed.

    The decile spread needs NEGATIVES as well as the LSH positives, so
    the scored pair set is the banded candidates UNION a deterministic
    background set (each doc paired with doc_id+1 where present) —
    the low-containment pairs an evaluation would otherwise never see.

    Scale shape: candidates from the banded join (never all-pairs)
    plus an O(N) background set; sizes and signatures are
    constant-size per doc; the estimate is 8 column equalities + one
    division per candidate pair; output ≤ 11 decile rows from one
    map-side-combinable aggregate."""
    corpus = _dedup_corpus(spark, sf_dir)
    # arrays + signature from ONE tokenization pass; zero-shingle docs
    # absent, exactly the old nonempty filter's survivors
    sig = D._shingled_with_sig(corpus, "doc_id", "text", 3, n_hashes=8)
    nonempty = sig
    bands = D._bands_from_sig(sig, "doc_id", n_hashes=8, band_size=4)
    cand = D.lsh_candidate_pairs(bands, "doc_id").select("id_a", "id_b")
    ids = nonempty.select("doc_id")
    bg = ids.select(
        F.col("doc_id").alias("id_a"), (F.col("doc_id") + 1).alias("id_b")
    ).join(ids.select(F.col("doc_id").alias("id_b")), "id_b", "left_semi")
    cand2 = cand.unionByName(bg).distinct()
    a_sh = nonempty.select(
        F.col("doc_id").alias("id_a"),
        F.col("shingles").alias("sh_a"),
        F.size("shingles").alias("sz_a"),
    )
    b_sh = nonempty.select(
        F.col("doc_id").alias("id_b"),
        F.col("shingles").alias("sh_b"),
        F.size("shingles").alias("sz_b"),
    )
    cp = (
        cand2.join(a_sh, "id_a")
        .join(b_sh, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "cont_permille", F.expr("div(1000 * common, least(sz_a, sz_b))")
        )
        .select("id_a", "id_b", "sz_a", "sz_b", "cont_permille")
    )
    a = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)]
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)]
    )
    agree = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8))
    est = (
        cp.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("m", agree)
        .select(
            "cont_permille",
            F.least(
                F.lit(1000),
                F.expr("div(1000 * m * (sz_a + sz_b), (8 + m) * least(sz_a, sz_b))"),
            ).alias("est_permille"),
        )
    )
    return (
        est.groupBy(
            F.expr("div(cont_permille, 100)").cast("bigint").alias("cont_decile")
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("div(sum(est_permille), count(1))")
            .cast("bigint")
            .alias("avg_est_permille"),
            F.expr("div(sum(abs(est_permille - cont_permille)), count(1))")
            .cast("bigint")
            .alias("avg_abs_err_permille"),
        )
        .orderBy("cont_decile")
    )


@register(
    "dedup_minhash_estimate_calibration",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    jp AS (
        SELECT id_a, id_b, (1000 * c) // (sa.sz + sb.sz - c) AS jac_permille
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
    ),
    est AS (
        SELECT jp.id_a, jp.id_b, jp.jac_permille,
               (1000 * ({' + '.join(f'CASE WHEN a.h{i} = b.h{i} THEN 1 ELSE 0 END' for i in range(8))})) // 8
                   AS est_permille
        FROM jp JOIN sig a ON a.doc_id = jp.id_a JOIN sig b ON b.doc_id = jp.id_b
    )
    SELECT CAST(jac_permille // 100 AS BIGINT) AS jac_decile,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(est_permille) // COUNT(*) AS BIGINT) AS avg_est_permille,
           CAST(SUM(abs(est_permille - jac_permille)) // COUNT(*) AS BIGINT)
               AS avg_abs_err_permille
    FROM est
    GROUP BY jac_decile
    ORDER BY jac_decile
    """,
)
def dedup_minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash ESTIMATOR calibration (round-5) — how well does 8-hash
    signature agreement estimate true Jaccard on the candidate pairs
    the pipeline actually scores?  Per exact-Jaccard decile: pair
    count, mean signature-agreement estimate (agreeing hashes / 8, in
    permille), and mean absolute error.  This is the measurement that
    justifies (or indicts) the signature size: E[agreement] = J per
    MinHash theory, with per-pair std √(J(1-J)/8) — a fat observed
    error says buy more hashes, a thin one says 8 suffice.  Completes
    the calibration family: recall gates measure what the index
    RETRIEVES, this measures what the sketch ESTIMATES.

    Scale shape: candidates from the banded join (never all-pairs),
    signatures constant-size per doc and shared via the same persisted
    frame the bands are built from; the estimate is 8 column equalities
    per candidate pair; the output is ≤ 11 decile rows from one
    map-side-combinable aggregate.  Integer-exact on both engines
    (integer divisions, no float averages)."""
    corpus = _dedup_corpus(spark, sf_dir)
    sig = D.minhash_signatures(corpus, "doc_id", "text", n_hashes=8)
    jp = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=0
    ).select("id_a", "id_b", "jac_permille")
    a = sig.select(
        F.col("doc_id").alias("id_a"), *[F.col(f"h{i}").alias(f"a{i}") for i in range(8)]
    )
    b = sig.select(
        F.col("doc_id").alias("id_b"), *[F.col(f"h{i}").alias(f"b{i}") for i in range(8)]
    )
    agree = sum((F.col(f"a{i}") == F.col(f"b{i}")).cast("int") for i in range(8))
    est = (
        jp.join(a, "id_a")
        .join(b, "id_b")
        .select(
            "jac_permille",
            (F.lit(1000) * agree).alias("agree1000"),
        )
        .select(
            "jac_permille",
            F.expr("div(agree1000, 8)").alias("est_permille"),
        )
    )
    return (
        est.groupBy(F.expr("div(jac_permille, 100)").cast("bigint").alias("jac_decile"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_pairs"),
            F.expr("div(sum(est_permille), count(1))")
            .cast("bigint")
            .alias("avg_est_permille"),
            F.expr("div(sum(abs(est_permille - jac_permille)), count(1))")
            .cast("bigint")
            .alias("avg_abs_err_permille"),
        )
        .orderBy("jac_decile")
    )


@register(
    "pipeline_contamination_report",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    spans AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM t
    ),
    ev AS (SELECT doc_id AS eval_doc_id, span FROM spans
           WHERE doc_id % 10 = 0 AND doc_id < 100000),
    tr AS (SELECT doc_id, span FROM spans
           WHERE NOT (doc_id % 10 = 0 AND doc_id < 100000)),
    pairs AS (
        SELECT ev.eval_doc_id, tr.doc_id, ev.span
        FROM tr JOIN ev ON ev.span = tr.span
    )
    SELECT CAST(eval_doc_id AS BIGINT) AS eval_doc_id,
           CAST(COUNT(DISTINCT doc_id) AS BIGINT) AS n_contaminating_docs,
           CAST(COUNT(DISTINCT span) AS BIGINT) AS n_leaked_spans,
           CAST(COUNT(*) AS BIGINT) AS n_span_hits
    FROM pairs
    GROUP BY eval_doc_id
    ORDER BY eval_doc_id
    """,
)
def pipeline_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EVAL-side contamination report (round-5) — the inverse view of
    ``pipeline_decontaminate``: instead of flagging training docs to
    drop, report per EVAL document how compromised it is — how many
    distinct training docs share an 8-token span with it, how many of
    its spans leaked, and the total hit count.  This is the benchmark-
    integrity table an eval owner reads to decide whether a benchmark
    is still trustworthy against a given corpus (the
    GPT-3/Llama-style "dirty eval" audit).

    Scale shape: same as the decontaminate pass — the eval span set is
    benchmark-sized and BROADCASTS (with eval doc ids retained this
    time); the training side is one linear span scan; only true
    contamination pairs survive the join, so the aggregate input is
    bounded by leak volume, not corpus size.  The two DISTINCT counts
    are computed as separate joined aggregates over the persisted pair
    frame rather than one multi-distinct agg (the
    ``approx_distinct_stats`` Expand lesson).  Span identity travels
    as xxhash64 longs; the oracle joins raw strings, so a collision
    would fail the sf0.01 gate."""
    corpus = _dedup_corpus(spark, sf_dir)
    is_eval = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000)
    sp = D.shingle_explode(corpus, "doc_id", "text", 8).select(
        "doc_id", F.xxhash64("sh").alias("h")
    )
    ev = sp.filter(is_eval).select(F.col("doc_id").alias("eval_doc_id"), "h")
    pairs = (
        sp.filter(~is_eval)
        .join(F.broadcast(ev), "h")
        .select("eval_doc_id", "doc_id", "h")
        .transform(tracked_persist)
    )
    docs_ct = (
        pairs.select("eval_doc_id", "doc_id")
        .distinct()
        .groupBy("eval_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_contaminating_docs"))
    )
    spans_ct = (
        pairs.select("eval_doc_id", "h")
        .distinct()
        .groupBy("eval_doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_leaked_spans"))
    )
    hits_ct = pairs.groupBy("eval_doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_span_hits")
    )
    return (
        docs_ct.join(spans_ct, "eval_doc_id")
        .join(hits_ct, "eval_doc_id")
        .select(
            F.col("eval_doc_id").cast("bigint"),
            "n_contaminating_docs",
            "n_leaked_spans",
            "n_span_hits",
        )
        .orderBy("eval_doc_id")
    )


@register(
    "text_pii_scrub",
    r"""
    WITH seeded AS (
        SELECT doc_id,
               text || ' contact user' || doc_id || '@example.com or +1-555-01' ||
               lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0') || '-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') AS text
        FROM documents
    ),
    scrubbed AS (
        SELECT doc_id, text,
               regexp_replace(
                   regexp_replace(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
                   '\+?\d[\d-]{7,}\d', '<PHONE>', 'g') AS clean
        FROM seeded
    )
    SELECT doc_id,
           CAST(length(text) - length(clean) AS BIGINT) AS len_delta,
           CAST(len(regexp_extract_all(text, '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT) AS n_emails,
           CAST(len(regexp_extract_all(text, '\+?\d[\d-]{7,}\d')) AS BIGINT) AS n_phones,
           substr(clean, length(clean) - 29, 30) AS clean_tail
    FROM scrubbed
    ORDER BY doc_id
    """,
)
def text_pii_scrub(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII scrubbing (emails + phone numbers → typed placeholder
    tokens) — a mandatory pass in any web-scale training pipeline.  The
    corpus is synthetic and PII-free, so both sides SEED one
    deterministic email + phone per doc before scrubbing; the query then
    proves detection (n_emails/n_phones), redaction (len_delta) and
    exact output bytes (clean_tail) all match.

    Pure ``regexp_replace``/``regexp_extract_all`` — JVM-side codegen,
    no UDF; at 100 TB this runs as a map-only pass over the text
    column with zero shuffle."""
    docs = load_testdata(spark, sf_dir, "documents")
    email_re = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
    phone_re = r"\+?\d[\d-]{7,}\d"
    seeded = docs.select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit("-"),
            F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        ).alias("text"),
    )
    clean = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_re, "<EMAIL>"), phone_re, "<PHONE>"
    )
    return (
        seeded.withColumn("clean", clean)
        .select(
            "doc_id",
            (F.length("text") - F.length("clean")).cast("bigint").alias("len_delta"),
            F.size(F.regexp_extract_all("text", F.lit(email_re), 0))
            .cast("bigint")
            .alias("n_emails"),
            F.size(F.regexp_extract_all("text", F.lit(phone_re), 0))
            .cast("bigint")
            .alias("n_phones"),
            F.substring(F.col("clean"), F.length("clean") - 29, 30).alias("clean_tail"),
        )
        .orderBy("doc_id")
    )


@register(
    "text_token_counts",
    r"""
    WITH t AS (
        SELECT doc_id, text,
               regexp_extract_all(text,
                   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               ) AS bpe
        FROM documents
    )
    SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars,
           CAST(octet_length(encode(text)) AS BIGINT) AS n_bytes,
           CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(bpe) AS BIGINT) AS bpe_tokens,
           CAST((1000 * length(text)) // len(bpe) AS BIGINT) AS chars_per_bpe_milli
    FROM t
    ORDER BY doc_id
    """,
)
def text_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token counting, the budget currency of every LLM
    training pipeline: whitespace tokens AND a BPE-ish pre-tokenizer
    count (the GPT-2 split regex — contraction suffixes, letter runs,
    digit runs, punctuation runs, whitespace — which upper-bounds real
    BPE merge counts and is deterministic without a vocab file).
    chars/token (milli) is the packing-density signal used to filter
    boilerplate/code-like shards.  Verified engine-exact: the Java and
    RE2 dialects agree on this pattern over the whole corpus (no
    lookarounds, which RE2 lacks).

    Scale shape: map-only over the text column — no shuffle, no UDF;
    the regex runs inside whole-stage codegen.  ``_fan_out`` spreads
    the small local file so the regex work uses every core; a real
    multi-GB input partitions naturally."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents"))
    bpe_pat = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    bpe = F.regexp_extract_all(F.col("text"), F.lit(bpe_pat), F.lit(0))
    counted = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.octet_length("text").cast("bigint").alias("n_bytes"),
        F.size(F.split(F.trim(F.col("text")), r"\s+"))
        .cast("bigint")
        .alias("ws_tokens"),
        F.size(bpe).cast("bigint").alias("bpe_tokens"),
    )
    return counted.select(
        "*",
        F.expr("div(1000 * n_chars, bpe_tokens)")
        .cast("bigint")
        .alias("chars_per_bpe_milli"),
    ).orderBy("doc_id")


@register(
    "pipeline_training_prep",
    f"""
    WITH {_CORPUS_SQL},
    tk AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks
           FROM corpus),
    scored AS (
        SELECT doc_id, text,
               len(toks) AS n_tokens,
               (1000 * len(list_distinct(toks))) // len(toks) AS ttr,
               len(list_filter(toks, x -> x IN
                   ('the','a','an','of','and','to','is','in','it','for')))
                   AS stop_hits
        FROM tk
    ),
    quality AS (SELECT * FROM scored WHERE n_tokens >= 20 AND ttr >= 300),
    lang AS (SELECT * FROM quality WHERE stop_hits * 20 >= n_tokens),
    exd AS (SELECT * FROM lang
           QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))),
    exsh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END)) AS sh
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM exd)
    ),
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM exsh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    drops AS (
        SELECT DISTINCT b.doc_id
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
    ),
    nd AS (SELECT * FROM exd WHERE doc_id NOT IN (SELECT doc_id FROM drops)),
    samp AS (SELECT * FROM nd
             WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) <= 'c'),
    funnel AS (
        SELECT 0 AS stage_idx, 'raw' AS stage, COUNT(*) AS n_docs, SUM(n_tokens) AS n_tokens FROM scored
        UNION ALL SELECT 1, 'quality', COUNT(*), SUM(n_tokens) FROM quality
        UNION ALL SELECT 2, 'lang', COUNT(*), SUM(n_tokens) FROM lang
        UNION ALL SELECT 3, 'exact_dedup', COUNT(*), SUM(n_tokens) FROM exd
        UNION ALL SELECT 4, 'near_dedup', COUNT(*), SUM(n_tokens) FROM nd
        UNION ALL SELECT 5, 'sample', COUNT(*), SUM(n_tokens) FROM samp
    )
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM funnel ORDER BY stage_idx
    """,
)
def pipeline_training_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end training-data prep funnel — the composed pipeline every
    stage in this module exists to serve, as ONE query: quality filter
    (length + lexical diversity) → language filter (stopword heuristic)
    → exact dedup (keep min doc id per content digest) → near-dup
    removal (MinHash-LSH candidates, drop the higher id of every
    candidate pair) → deterministic hash sample (md5 first nibble,
    ~13/16 keep rate).  Output: per-stage surviving document and
    token counts, the shape of a pipeline-health dashboard.

    Scale shape: the scored corpus is ONE scan, persisted and reused by
    every stage; exact dedup is a window-min over the 16-byte digest
    (one shuffle); near-dup reuses the banded-minhash machinery
    (constant-size signatures, band-bucket equi-join — the 100 TB
    path).  The six stage counts come from THREE conditional-aggregate
    jobs, not six: quality/lang are per-row flags of the scored corpus
    (stages 0-2 in one pass), the sample predicate is a per-row flag of
    the near-dedup survivors (stages 4-5 in one pass) — a row-level
    filter never deserves its own scan.  Every boundary is a built-in
    function — no Python anywhere.
    """
    corpus = _dedup_corpus(spark, sf_dir)
    # bind the token array ONCE before deriving from it: Spark does no
    # CSE through higher-order lambdas, so inlining split() into each
    # derived column re-runs the regex tokenization per use (measured
    # 3× slowdown on this very stage)
    tk = corpus.select("doc_id", "text", F.split(F.col("text"), X.TOKEN_RE).alias("toks"))
    base = (
        tk.select(
            "doc_id",
            "text",
            F.size("toks").cast("bigint").alias("n_tokens"),
            F.expr("div(1000 * size(array_distinct(toks)), size(toks))").alias("ttr"),
            F.size(F.filter(F.col("toks"), lambda t: t.isin(*X.EN_STOPWORDS)))
            .cast("bigint")
            .alias("stop_hits"),
        )
        .transform(tracked_persist)
    )
    q_pass = (F.col("n_tokens") >= 20) & (F.col("ttr") >= 300)
    l_pass = q_pass & (F.col("stop_hits") * 20 >= F.col("n_tokens"))
    lang = base.filter(l_pass)
    ex = (
        lang.withColumn(
            "keep",
            F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text").cast("binary")))),
        )
        .filter(F.col("doc_id") == F.col("keep"))
        # persist (doc_id, n_tokens) only — text re-reads base's ONE
        # cache through the id semi-join (round-8 funnel memory fix,
        # same shape as pipeline_full_train_prep)
        .select("doc_id", "n_tokens")
        .transform(tracked_persist)
    )
    ex_txt = base.join(ex.select("doc_id"), "doc_id", "left_semi")
    bands = D.minhash_bands(ex_txt, "doc_id", "text", n_hashes=8, band_size=4)
    drops = (
        D.lsh_candidate_pairs(bands, "doc_id")
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # no broadcast hint: the drop set grows with duplicate volume —
    # AQE broadcasts when it fits, shuffles when it doesn't (the
    # fuzzy_name_pairs_symspell r4 lesson)
    nd = ex.join(drops, "doc_id", "left_anti").transform(tracked_persist)
    s_pass = (
        F.substring(F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1) <= "c"
    )

    def _cnt(flag):
        return F.count(F.when(flag, F.lit(1)))

    def _tok(flag):
        return F.coalesce(F.sum(F.when(flag, F.col("n_tokens"))), F.lit(0)).cast(
            "bigint"
        )

    def _row(idx: int, name: str, c, t):
        return F.struct(
            F.lit(idx).alias("stage_idx"),
            F.lit(name).alias("stage"),
            c.alias("n_docs"),
            t.alias("n_tokens"),
        )

    true = F.lit(True)
    s012 = base.agg(
        F.inline(
            F.array(
                _row(0, "raw", _cnt(true), _tok(true)),
                _row(1, "quality", _cnt(q_pass), _tok(q_pass)),
                _row(2, "lang", _cnt(l_pass), _tok(l_pass)),
            )
        )
    )
    s3 = ex.agg(F.inline(F.array(_row(3, "exact_dedup", _cnt(true), _tok(true)))))
    s45 = nd.agg(
        F.inline(
            F.array(
                _row(4, "near_dedup", _cnt(true), _tok(true)),
                _row(5, "sample", _cnt(s_pass), _tok(s_pass)),
            )
        )
    )
    return s012.unionByName(s3).unionByName(s45).orderBy("stage_idx")


# SemDeDup's scale contract: cluster count grows with corpus size so the
# Σ|cluster|² within-cluster pair join stays ~linear in N (Abbas et al.
# 2023 train k ∝ N for a roughly constant cluster size).  64 vectors per
# cell is the target here; the floor of 8 pins the oracle's unrolled-Lloyd
# replay at the driver's sf0.01 gate (500 vecs → k=8, bitwise-identical to
# the fixed-k history).  Both sides MUST compute k identically — the Spark
# helper below and the DuckDB scalar subquery are the same integer
# ceil-division.
_QUANTIZER_TARGET_CELL = 64
_QUANTIZER_K_FLOOR = 8
# Above this derived k the quantizer switches to the two-level
# hierarchical fit (coarse √k Lloyd + per-cell local refinement,
# operators/kmeans.subcluster_cells) — the flat N·k assignment is
# N²/64 in the SemDeDup k ∝ N regime, measured as the fleet's worst
# 100× row (102 s, α 0.83) before this gate.  128 keeps every
# oracle-verified SF (k ≤ 32 at sf0.1) and the k=8 fixed-k callers on
# the flat path, so the DuckDB flat-Lloyd replays stay bit-exact —
# the same gate pattern as the IVF cadence floor of 61.
_HIER_QUANTIZER_K = 128
_K_SCALED_SQL = (
    f"(SELECT GREATEST({_QUANTIZER_K_FLOOR}, "
    f"(COUNT(*) + {_QUANTIZER_TARGET_CELL - 1}) // {_QUANTIZER_TARGET_CELL}) "
    "FROM embeddings)"
)


def _scaled_quantizer_k(n: int) -> int:
    """k = max(floor, ceil(N / target_cell)) — integer-exact twin of
    ``_K_SCALED_SQL`` so Spark and DuckDB train identical quantizers."""
    return max(
        _QUANTIZER_K_FLOOR,
        (n + _QUANTIZER_TARGET_CELL - 1) // _QUANTIZER_TARGET_CELL,
    )


def _sq8_kmeans_cells(
    spark: SparkSession, sf_dir: str, k: int | None = 8, iters: int = 3
) -> DataFrame:
    """Train the SQ8-domain k-means quantizer and assign every vector
    to its cell.  Two output schemas: the flat path (explicit ``k``, or
    corpus-scaled k ≤ ``_HIER_QUANTIZER_K``) returns a persisted frame
    (vec_id, v, nrm, cvec, cluster INT); the hierarchical path
    (``k=None`` AND k > ``_HIER_QUANTIZER_K``) returns (vec_id, v, nrm,
    cluster BIGINT) — ``cvec`` is consumed by the recursive refinement
    and dropped, and ``cluster`` is a composite path label (see
    ``subcluster_cells``).  Consumers must treat cluster as an opaque
    join key and not read cvec unless they pinned the flat path.
    Shared by ``similarity_ann_ivf_kmeans`` (probe routing) and
    ``dedup_semantic_semdedup`` (cluster-scoped dedup).

    ``k=None`` derives k from the corpus size (``_scaled_quantizer_k``,
    one cheap parquet count) — the SemDeDup regime where cluster sizes
    stay ~constant as N grows.  Seeds are the lowest-k vec_ids (dense
    ids in the testdata; at production scale you'd seed from a bounded
    sample instead).  Above ``_HIER_QUANTIZER_K`` the corpus-scaled fit
    goes TWO-LEVEL (coarse √k Lloyd here + local per-cell refinement in
    ``operators/kmeans.subcluster_cells``): flat N·k assignment is
    N²/64 once k ∝ N — the round-8 100× sweep measured it at 102 s /
    α 0.83 before the gate — and the two balanced levels cut it to
    ~N^1.5 with the driver holding only √k×d doubles.

    ONE scan derives v, norm AND the SQ8 code vector (quantization
    stats broadcast in) — round-3's first cut joined a second
    sq8_codes scan back by vec_id, a whole extra pass for a column
    that is a pure projection of the one already in hand.  Per Lloyd
    iteration: one narrow assignment pass (broadcast k×d centroids)
    fused with the (k·d)-row partial-sum shuffle — only the centroid
    matrix ever reaches the driver."""
    from .operators.kmeans import (
        assign_clusters_arrow,
        assign_clusters_routed,
        kmeans_fit,
        subcluster_cells,
    )

    hier = False
    if k is None:
        k = _scaled_quantizer_k(load_testdata(spark, sf_dir, "embeddings").count())
        # corpus-scaled k only: the flat N·k assignment is N²/64 once
        # k tracks N — gate to the two-level fit above the
        # oracle-verified range (constant note on _HIER_QUANTIZER_K)
        hier = k > _HIER_QUANTIZER_K
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings")))
    stats = S.sq8_stats(load_testdata(spark, sf_dir, "embeddings"))
    base = (
        emb.crossJoin(F.broadcast(stats))
        .select(
            "vec_id",
            F.col("_v").alias("v"),
            F.col("_norm").alias("nrm"),
            F.transform(
                S.sq8_quant_expr(F.col("_v")), lambda x: x.cast("double")
            ).alias("cvec"),
        )
        # batch_rows (round 11): this is the quantizer's ONE wide cache
        # (v + cvec ≈ 1 KB/row of ARRAY columns) — its per-batch
        # builders grow by buffer doubling between memory checks, and
        # at the 3000× tier (15M vectors, 32 concurrent builders) the
        # build's transient spike heap-OOM'd a stock 8 GB JVM inside
        # ArrayTransform eval while the cache itself would have spilled
        # fine (same class as the r9 minhash-cache fix; stacks in
        # OPTIMIZATION_r11.md)
        .transform(lambda d: tracked_persist(d, batch_rows=2000))
    )
    # deterministic seeds = lowest-k vec_ids, fetched once — sorting the
    # whole frame inside the fit would re-run the sort on every
    # iteration's scan.  Hierarchical tier fits √k COARSE cells with the
    # same JVM loop (N·√k work), then refines each coarse cell locally
    # (operators/kmeans.subcluster_cells) — final cell sizes stay
    # ~_QUANTIZER_TARGET_CELL, so Σ|cluster|² consumers are unchanged.
    from math import isqrt

    k_fit = max(2, isqrt(k)) if hier else k
    seed_rows = (
        base.filter(F.col("vec_id") < k_fit).orderBy("vec_id").select("cvec").collect()
    )
    # column pruning does NOT reach through mapInPandas: the Arrow fit
    # passes transfer every column of their input, so hand them the
    # (vec_id, cvec) projection — v/nrm are dead weight in every Lloyd
    # iteration's batch stream (half the transferred bytes at 64 dims)
    fit_in = base.select("vec_id", "cvec")
    # hier tier: both the coarse fit's per-iteration assignment and the
    # final assignment route through √√k_fit super-cells (VERDICT r9
    # Next #3) — the exact N·√k pass was the quantizer's designed N^1.5
    # component, phase-attributed at 1000× (predicted 6.05× vs measured
    # 6.08 over a 3.33× step); routing cuts it to ~N·k^¼.  The flat
    # (oracle-replayed) path keeps the fold-order kernels untouched —
    # kmeans_fit only routes when routed=True AND k ≥ _ROUTE_MIN_K,
    # and every oracle SF fits flat (k ≤ 128 ⇒ hier is False).
    centroids, _ = kmeans_fit(
        fit_in,
        k=k_fit,
        vec_col="cvec",
        max_iter=iters,
        tol=0.0,
        seeds=[list(r["cvec"]) for r in seed_rows],
        compute_inertia=False,
        routed=hier,
    )
    assigned = (
        assign_clusters_routed(fit_in, centroids, "cvec")
        if hier
        else assign_clusters_arrow(base, centroids, "cvec")
    )
    if hier:
        # the recursion shuffles and persists per level — feed it the
        # SLIM (id, cvec, label) projection (v/nrm are dead weight in
        # every level's exchange and cache; measured half the level
        # bytes at 300×), then join the final labels back to the one
        # persisted base.  cvec itself is dropped from the output: the
        # k=None consumers (SemDeDup, the funnel, mutual-kNN) read only
        # (vec_id, v, nrm, cluster) — the code vectors served the fit.
        labels = subcluster_cells(
            assigned,  # already the slim (vec_id, cvec, cluster)
            id_col="vec_id",
            coarse_col="cluster",
            vec_col="cvec",
            target_cell=_QUANTIZER_TARGET_CELL,
            iters=iters,
        ).select("vec_id", "cluster")
        out = (
            base.select("vec_id", "v", "nrm")
            .join(labels, "vec_id")
            # v is a 64-double ARRAY column — bound the batch builders
            # (same transient-spike class as the base cache above)
            .transform(lambda d: tracked_persist(d, batch_rows=2000))
        )
        # Stage-scoped release (VERDICT r9 Next #4): one eager count
        # materializes the slim output, after which the WIDE internal
        # SQ8 cache (v + cvec ≈ 1 KB/row — ~2 GB at the 1000× tier) has
        # no remaining consumer: seeds collected, fit iterations done,
        # labels checkpointed, and the (vec_id, v, nrm) projection just
        # cached.  Holding it through the downstream Σ|cell|² pair join
        # was dead residency on the shared heap.  Hier tier only — the
        # flat (oracle/bench) path keeps its lazy single-action shape.
        out.count()
        base.unpersist(blocking=False)
        return out
    return assigned.transform(tracked_persist)


def _kmeans_cells_cte(
    k: int = 8, dim: int = 64, iters: int = 3, k_sql: str | None = None
) -> str:
    """Shared unrolled-Lloyd CTE prefix: trains the SQ8-domain k-means
    quantizer and ends at the ``cells`` CTE (vec_id → cluster), with
    ``e`` (full-precision vectors + norms) still in scope.  Used by the
    ``similarity_ann_ivf_kmeans`` and ``dedup_semantic_semdedup``
    oracles — the replayability argument lives on
    ``_ivf_kmeans_oracle_sql``.  ``k_sql`` (a scalar-subquery string)
    replaces the literal k for corpus-scaled quantizers
    (``_K_SCALED_SQL``); only the SEED selection depends on k — the
    Lloyd unrolling itself is k-agnostic (centroids are rows)."""
    k_expr = k_sql if k_sql is not None else str(k)
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
               FROM embeddings),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT unnest(v) AS x FROM e)),
    cv AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12)) AS INTEGER))) AS DOUBLE)) AS cvec
        FROM e, mm
    ),
    cents0 AS (
        SELECT CAST(ROW_NUMBER() OVER (ORDER BY vec_id) AS INTEGER) - 1 AS c,
               cvec AS cent
        FROM cv WHERE vec_id < ({k_expr})
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i}p AS (
        SELECT s.vec_id, c.c,
               list_transform(range(1,{dim + 1}), t -> s.cvec[t] - c.cent[t]) AS d
        FROM cv s CROSS JOIN cents{i - 1} c
    ),
    a{i} AS (
        SELECT vec_id, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id
                   ORDER BY list_dot_product(d, d) ASC, c) AS rk
        FROM a{i}p
    ),
    u{i} AS (
        SELECT a.c, t.i AS pos, SUM(s.cvec[t.i]) AS sm, COUNT(*) AS n
        FROM a{i} a
        JOIN cv s ON s.vec_id = a.vec_id
        CROSS JOIN (SELECT unnest(range(1,{dim + 1})) AS i) t
        WHERE a.rk = 1
        GROUP BY a.c, t.i
    ),
    m{i} AS (SELECT c, list(sm / n ORDER BY pos) AS cent FROM u{i} GROUP BY c),
    cents{i} AS (
        SELECT p.c, coalesce(mm.cent, p.cent) AS cent
        FROM cents{i - 1} p LEFT JOIN m{i} mm ON mm.c = p.c
    )""")
    fin = iters + 1
    parts.append(f""",
    a{fin}p AS (
        SELECT s.vec_id, c.c,
               list_transform(range(1,{dim + 1}), t -> s.cvec[t] - c.cent[t]) AS d
        FROM cv s CROSS JOIN cents{iters} c
    ),
    cells AS (
        SELECT vec_id, c AS cluster FROM (
            SELECT vec_id, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id
                       ORDER BY list_dot_product(d, d) ASC, c) AS rk
            FROM a{fin}p
        ) WHERE rk = 1
    )""")
    return "".join(parts)


def _ivf_kmeans_oracle_sql(k: int = 8, dim: int = 64, iters: int = 3) -> str:
    """Unrolled-Lloyd DuckDB twin of ``similarity_ann_ivf_kmeans`` —
    same replayability argument as ``_pq_oracle_sql``: the quantizer
    trains on integer-valued SQ8 code vectors (exact partial sums, one
    rounded division per centroid mean) with index-order distance folds
    and a pinned iteration count, so cells match bitwise; in-cell
    scoring is the full-precision cosine both engines compute with the
    same fold."""
    return _kmeans_cells_cte(k, dim, iters) + """,
    scored AS (
        SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
               list_dot_product(qe.v, n.v) / (qe.nrm * n.nrm) AS cos_raw
        FROM cells q
        JOIN e qe ON qe.vec_id = q.vec_id
        JOIN cells kc ON kc.cluster = q.cluster AND kc.vec_id != q.vec_id
        JOIN e n ON n.vec_id = kc.vec_id
        WHERE q.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """


@register("similarity_ann_ivf_kmeans", _ivf_kmeans_oracle_sql())
def similarity_ann_ivf_kmeans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF with a TRAINED coarse quantizer: Lloyd's k-means (k=8,
    deterministic first-k seeding over vec_id order, 3 pinned
    iterations) fits the centroid set, then the inverted file and
    probing work exactly like ``similarity_ann_ivf``.  The quantizer
    trains on the SQ8 code vectors — the production FAISS shape where
    the coarse index lives in the compressed domain — which is also
    what makes training SQL-replayable (integer-exact partial sums;
    see ``_pq_oracle_sql``): this query graduated from rows-only to a
    full DuckDB oracle in round 3.  In-cell scoring stays
    full-precision cosine.

    Scale shape: per k-means iteration one narrow assignment pass
    (broadcast k×d centroids) + one (k·d)-row partial-sum shuffle —
    only the centroid matrix ever reaches the driver.  The probe join
    is a broadcast equi-join on the cell id, identical to the stride
    IVF.
    """
    cells = _sq8_kmeans_cells(spark, sf_dir, k=8, iters=3)
    q = cells.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("cluster").alias("qcluster"),
    )
    scored = cells.join(
        F.broadcast(q),
        (F.col("qcluster") == F.col("cluster")) & (F.col("query_id") != F.col("vec_id")),
    ).withColumn(
        "cos_raw", S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos_raw").desc(), F.col("vec_id"))
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("vec_id").cast("bigint").alias("neighbor_id"),
            F.round("cos_raw", 6)
            .cast("decimal(10,6)")
            .cast("double")
            .alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


def _semdedup_oracle_sql(tau: float = 0.45) -> str:
    """DuckDB twin of ``dedup_semantic_semdedup``: replays the SQ8
    k-means training bitwise (see ``_ivf_kmeans_oracle_sql``), then the
    within-cluster cosine pairs and the keep-lowest-id rule are plain
    exact-fold SQL.  The quantizer k is corpus-scaled on BOTH sides
    (``_K_SCALED_SQL`` here, ``_scaled_quantizer_k`` in Spark)."""
    return _kmeans_cells_cte(k_sql=_K_SCALED_SQL) + f""",
    sl AS (SELECT c.vec_id, c.cluster, e.v, e.nrm
           FROM cells c JOIN e ON e.vec_id = c.vec_id),
    pairs AS (
        SELECT b.vec_id, b.cluster, a.vec_id AS id_a,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_raw
        FROM sl a JOIN sl b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= {tau}
    ),
    reps AS (
        SELECT vec_id, cluster, id_a, cos_raw,
               ROW_NUMBER() OVER (PARTITION BY vec_id ORDER BY id_a) AS rk
        FROM pairs
    )
    SELECT CAST(vec_id AS BIGINT) AS vec_id, CAST(cluster AS BIGINT) AS cluster,
           CAST(id_a AS BIGINT) AS rep_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_to_rep
    FROM reps WHERE rk = 1
    ORDER BY vec_id
    """


@register("dedup_semantic_semdedup", _semdedup_oracle_sql())
def dedup_semantic_semdedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic deduplication à la SemDeDup (Abbas et al. 2023,
    arXiv:2303.09540): k-means clusters the embedding space, then
    near-duplicate pairs are searched ONLY within each cluster and
    every vector that has a lower-id within-cluster neighbor at
    cosine ≥ 0.45 is dropped, keeping the lowest id as the
    representative.  Output = the drop list (vec_id, cluster, rep_id,
    cos_to_rep) — the anti-join side of a training-data prep pipeline.

    Scale shape: the quantizer is the shared SQ8-domain Lloyd fit
    (broadcast centroids, partial-sum shuffle — see
    ``_sq8_kmeans_cells``); the pair search is an EQUI-join on the
    cluster id, so work is Σ|cluster|².  k is the knob that bounds it,
    and since round 5 it SCALES with the corpus: k = max(8,
    ceil(N / 64)) on both engines (``_scaled_quantizer_k`` /
    ``_K_SCALED_SQL``), holding cluster sizes ~constant so the pair
    join is linear in N — the paper's regime, measured sub-quadratic in
    ``tools/scale_experiment.py``.  Vectors are projected to
    (vec_id, cluster, v, nrm) BEFORE the pair exchange so the code
    vectors used in training never shuffle (round-3 ANN-regression
    lesson)."""
    return semdedup_drops(spark, sf_dir, k=None, iters=3)


def semdedup_drops(
    spark: SparkSession, sf_dir: str, *, k: int | None = None, iters: int = 3
) -> DataFrame:
    """Parameterized SemDeDup body — ``k`` is the scale knob (cluster
    count grows ∝ N to hold cluster sizes, and thus the Σ|cluster|²
    pair join, linear; see ``tools/scale_experiment.py`` which measures
    both regimes).  ``k=None`` (the default and the registered query's
    setting) derives k from the corpus size."""
    cells = _sq8_kmeans_cells(spark, sf_dir, k=k, iters=iters)
    slim = cells.select("vec_id", "cluster", "v", "nrm")
    a = slim.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster").alias("cl_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    cos = S.dot(F.col("va"), F.col("v")) / (F.col("na") * F.col("nrm"))
    pairs = (
        slim.join(
            a, (F.col("cl_a") == F.col("cluster")) & (F.col("id_a") < F.col("vec_id"))
        )
        .withColumn("cos_raw", cos)
        .filter(F.col("cos_raw") >= 0.45)
        .select("vec_id", "cluster", "id_a", "cos_raw")
    )
    w = Window.partitionBy("vec_id").orderBy("id_a")
    return (
        pairs.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .select(
            F.col("vec_id").cast("bigint"),
            # BIGINT: hierarchical path labels exceed int32 above the
            # gate (ANSI cast would throw); lossless at oracle SFs
            F.col("cluster").cast("bigint"),
            F.col("id_a").cast("bigint").alias("rep_id"),
            F.round("cos_raw", 6)
            .cast("decimal(10,6)")
            .cast("double")
            .alias("cos_to_rep"),
        )
        .orderBy("vec_id")
    )


def _full_train_prep_oracle_sql() -> str:
    """DuckDB twin of ``pipeline_full_train_prep`` — the composed
    funnel.  Assembled from the proven fragments: the unrolled-Lloyd
    k-means cells (``_kmeans_cells_cte``), the corpus + quality/lang/
    exact/minhash chain (``pipeline_training_prep``'s oracle), the
    SemDeDup pair CTEs, the 8-token decontamination spans, the packing
    window, and the hash split.  The quantizer k is corpus-scaled
    (``_K_SCALED_SQL``), matching the funnel's ``k=None`` cells."""
    sig_cols = ", ".join(
        f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8)
    )
    return _kmeans_cells_cte(k_sql=_K_SCALED_SQL) + f""",
    {_CORPUS_SQL},
    tk AS (SELECT doc_id, text, string_split_regex(text, '\\s+') AS toks
           FROM corpus),
    scored AS (
        SELECT doc_id, text, toks,
               len(toks) AS n_tokens,
               (1000 * len(list_distinct(toks))) // len(toks) AS ttr,
               len(list_filter(toks, x -> x IN
                   ('the','a','an','of','and','to','is','in','it','for')))
                   AS stop_hits
        FROM tk
    ),
    quality AS (SELECT * FROM scored WHERE n_tokens >= 20 AND ttr >= 300),
    lang AS (SELECT * FROM quality WHERE stop_hits * 20 >= n_tokens),
    exd AS (SELECT * FROM lang
           QUALIFY doc_id = MIN(doc_id) OVER (PARTITION BY md5(text))),
    exsh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END)) AS sh
        FROM exd
    ),
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM exsh CROSS JOIN seeds
    ),
    sig AS (SELECT doc_id, {sig_cols} FROM hashed GROUP BY doc_id),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    lsh_drops AS (
        SELECT DISTINCT b.doc_id
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
    ),
    nd AS (SELECT * FROM exd WHERE doc_id NOT IN (SELECT doc_id FROM lsh_drops)),
    sl AS (SELECT c.vec_id, c.cluster, e.v, e.nrm
           FROM cells c JOIN e ON e.vec_id = c.vec_id),
    slv AS (SELECT sl.* FROM sl JOIN nd ON nd.doc_id = sl.vec_id),
    sem_pairs AS (
        SELECT b.vec_id
        FROM slv a JOIN slv b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
        WHERE list_dot_product(a.v, b.v) / (a.nrm * b.nrm) >= 0.45
    ),
    sd AS (SELECT * FROM nd
           WHERE doc_id NOT IN (SELECT DISTINCT vec_id FROM sem_pairs)),
    evtk AS (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM corpus
             WHERE doc_id % 10 = 0 AND doc_id < 100000),
    evspans AS (
        SELECT DISTINCT unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM evtk
    ),
    sdspans AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM (SELECT doc_id, toks FROM sd
              WHERE NOT (doc_id % 10 = 0 AND doc_id < 100000))
    ),
    contam AS (SELECT DISTINCT s.doc_id
               FROM sdspans s JOIN evspans e ON e.span = s.span),
    dc AS (SELECT * FROM sd WHERE doc_id NOT IN (SELECT doc_id FROM contam)),
    pkc AS (
        SELECT doc_id, doc_id % 8 AS shard, n_tokens AS n_tok,
               SUM(n_tokens) OVER (PARTITION BY doc_id % 8 ORDER BY doc_id
                                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM dc
    ),
    pk AS (
        SELECT COALESCE(SUM(ns), 0) AS n_units, COALESCE(SUM(nt), 0) AS n_tokens
        FROM (SELECT shard, (MAX(cum) + 511) // 512 AS ns, SUM(n_tok) AS nt
              FROM pkc GROUP BY shard)
    ),
    sp AS (
        SELECT CASE WHEN hv < 58982 THEN 'train'
                    WHEN hv < 62258 THEN 'val' ELSE 'test' END AS split,
               n_tokens
        FROM (SELECT CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 4))
                          AS BIGINT) AS hv,
                     n_tokens
              FROM dc)
    ),
    funnel AS (
        SELECT 0 AS stage_idx, 'raw' AS stage, COUNT(*) AS n_units,
               COALESCE(SUM(n_tokens), 0) AS n_tokens FROM scored
        UNION ALL SELECT 1, 'quality', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM quality
        UNION ALL SELECT 2, 'lang', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM lang
        UNION ALL SELECT 3, 'exact_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM exd
        UNION ALL SELECT 4, 'near_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM nd
        UNION ALL SELECT 5, 'semantic_dedup', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM sd
        UNION ALL SELECT 6, 'decontaminate', COUNT(*), COALESCE(SUM(n_tokens), 0) FROM dc
        UNION ALL SELECT 7, 'pack', n_units, n_tokens FROM pk
        UNION ALL SELECT 8 + CASE split WHEN 'train' THEN 0 WHEN 'val' THEN 1 ELSE 2 END,
               'split_' || split, COUNT(*), COALESCE(SUM(n_tokens), 0)
        FROM sp GROUP BY split
    )
    SELECT CAST(stage_idx AS INT) AS stage_idx, stage,
           CAST(n_units AS BIGINT) AS n_units,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM funnel ORDER BY stage_idx
    """


# Above this corpus size the composed funnel switches to STAGED
# execution: each stage's survivor stats are collected eagerly and
# every cache is unpersisted right after its last consumer stage —
# without it, the funnel's CONCURRENT stage caches (text + survivor
# frames + LSH bands + quantizer state) sum past a single 8 GB heap at
# the 1000× tier even though every component passes standalone
# (SCALING.md round-9; VERDICT r9 Next #4).  Below the gate the funnel
# keeps its measured-faster lazy one-action shape (the sf0.1 A/B: 24 s
# eager vs 18 s lazy — barrier count, not data), so every oracle/bench
# SF is untouched; test_funnel_staged_mode_matches_lazy pins value
# equality across the gate.  1M docs ≈ the 200× tier on this corpus.
_FUNNEL_STAGE_RELEASE_DOCS = 1_000_000
# breadcrumb for the pytest that pins staged mode actually firing
_FUNNEL_LAST_MODE: str | None = None


@register("pipeline_full_train_prep", _full_train_prep_oracle_sql())
def pipeline_full_train_prep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The CAPSTONE composed pipeline (round-4, VERDICT r3 "Next" #8):
    every major train-prep operator family chained over ONE corpus pass
    with per-stage survivor counts — quality filter → language filter →
    exact dedup → MinHash-LSH near-dedup → SemDeDup semantic dedup
    (embedding k-means cells, cos ≥ 0.45 to a lower-id neighbor) →
    8-token-span decontamination against the eval stand-in → 512-token
    sequence packing → deterministic 90/5/5 split.  Output: one row per
    stage (``n_units`` = surviving docs, or packed sequences for the
    ``pack`` row; token totals alongside) — the end-to-end funnel a
    data-prep owner reads before shipping a corpus.

    Composition semantics: each stage consumes the previous stage's
    survivors.  Semantic dedup drops survivors whose embedding
    (vec_id = doc_id) has a lower-id same-cluster neighbor at
    cosine ≥ 0.45; docs without embeddings (the planted dup ids) pass
    through.  Decontamination drops non-eval survivors sharing any
    8-token span with the eval set.  Packing and the split both run on
    the final cleaned set.

    Scale shape: every stage reuses the proven scale pattern of its
    standalone query — one persisted scored scan feeds stages 0-3, the
    LSH drop set is banded (never all-pairs), SemDeDup's pair join is
    cluster-equi-join Σ|cluster|² with k ∝ N, eval spans broadcast,
    packing windows are per-shard, and the split is a map-side hash.
    Stage counts come from per-frame aggregates, not re-scans.
    Persist policy: the final lazy action is ONE job whose union
    branches share the stage frames, and an eager count() per EVERY
    stage measured 24 s vs 18 s lazy at sf0.1 (each materialization is
    a full serial job barrier) — but the TWO heavy caches (``base``,
    the corpus-text frame, and ``ex``, the exact-dedup window output)
    are eagerly count()-ed anyway: at 300× the union branches raced to
    first-build them concurrently (getOrCompute has no cross-task
    build dedup) and the duplicated in-flight builds OOM'd the shared
    heap.  Round-10: in LAZY mode the slim survivor frames (ex, nd,
    sd, dc) are ``localCheckpoint(eager=False)`` rather than persists
    — see the ``_hold`` comment in the body (sf0.1 24.0→8.6 s, output
    identical); STAGED mode keeps real persists for the stage-release
    machinery.

    Known sf0.1 cost profile (round-5 stage audit): of a ~16 s wall
    only ~9 s is task time spread over ~67 stages whose LARGEST is
    0.65 s — the rest is AQE per-exchange orchestration (materialize,
    re-plan, resubmit × ~30 exchanges; the same run measures 8.2 s
    with AQE off, 6.8 s with AQE off + 8 shuffle partitions).  That
    fixed cost amortizes to noise once stages carry real data, and AQE
    is what right-sizes the funnel's data-dependent drop-set joins at
    100 TB, so the query keeps AQE on and accepts the small-SF floor;
    a thread overlapping quantizer training with the text chain was
    A/B'd and removed (±0 — the wall is barrier count, not overlap)."""
    corpus = _dedup_corpus(spark, sf_dir)
    # staged-vs-lazy gate: one metadata-only parquet count-star (the
    # same cheap hint the corpus-scaled quantizer already pays on
    # embeddings) — see _FUNNEL_STAGE_RELEASE_DOCS
    staged = (
        load_testdata(spark, sf_dir, "documents").count()
        >= _FUNNEL_STAGE_RELEASE_DOCS
    )
    # Survivor-frame holder (round-10 optimization; guide §3.3/§5 —
    # truncate the plan).  LAZY mode: ``localCheckpoint(eager=False)``
    # — the slim (doc_id, n_tokens) frames chain dc→sd→nd→ex and SEVEN
    # report branches re-render that nested lineage (93.5M plan chars
    # at sf0.01, truncated at the 20M cap, re-rendered per execution),
    # so Catalyst/AQE orchestration owned the one-action wall: sf0.1
    # A/B 24.0→8.6 s with collect-identical output — the lazy path now
    # matches the round-5 "AQE off" floor (8.2 s) WITH AQE on.  STAGED
    # mode keeps tracked persists: the stage-release machinery below
    # unpersists each frame after its last consumer, which is the whole
    # 1000×-tier fix — checkpoint blocks would outlive their stage.
    _hold = tracked_persist if staged else (
        lambda d: d.localCheckpoint(eager=False)
    )
    tk = corpus.select(
        "doc_id", "text", F.split(F.col("text"), X.TOKEN_RE).alias("toks")
    )
    stat_cols = [
        F.size("toks").cast("bigint").alias("n_tokens"),
        F.expr("div(1000 * size(array_distinct(toks)), size(toks))").alias("ttr"),
        F.size(F.filter(F.col("toks"), lambda t: t.isin(*X.EN_STOPWORDS)))
        .cast("bigint")
        .alias("stop_hits"),
    ]
    if staged:
        # STAGED tier (round 11, VERDICT r10 "Next" #5): cache only the
        # per-doc SCALAR stats — at 15M docs (3000×) the raw-text cache
        # build is a genuine heap OOM on a stock 8 GB JVM (32 concurrent
        # batch builders over ~200 B texts; measured, stacks in
        # OPTIMIZATION_r11.md).  The three text consumers (exact-dedup
        # window, LSH bands, contamination shingles) re-scan the corpus
        # parquet and attach their survivor stats by equi-join instead —
        # at 100 TB a sequential re-scan is the cheap side of that trade
        # (guide §5: cache only when recompute beats memory pressure).
        base = tk.select("doc_id", *stat_cols).transform(tracked_persist)
    else:
        # LAZY tier: one wide (raw-text) cache, all consumers share it.
        # batch_rows: the string column's per-batch builder has the same
        # doubling-allocation spike the 1000× tier measured on the
        # dedup array caches (caching.tracked_persist docstring)
        base = tk.select("doc_id", "text", *stat_cols).transform(
            lambda d: tracked_persist(d, batch_rows=2000)
        )
    # Materialize the base cache EAGERLY (one count job): the
    # final report is ONE action whose union branches (stage counts,
    # bands, contamination) otherwise race to build this cache
    # concurrently - at 300x the duplicated in-flight builds OOM'd the
    # shared heap even after the per-stage text caches below were
    # slimmed away.  Stage-by-stage the same workload fits with GBs to
    # spare; serializing the ONE heavy build is the whole fix.
    base.count()
    q_pass = (F.col("n_tokens") >= 20) & (F.col("ttr") >= 300)
    l_pass = q_pass & (F.col("stop_hits") * 20 >= F.col("n_tokens"))
    lang = base.filter(l_pass)
    # exact-dedup input: (doc_id, text, n_tokens) of lang survivors —
    # from the text cache directly in LAZY mode, by re-scan + equi-join
    # in STAGED mode (same rows either way)
    ex_in = (
        corpus.join(lang.select("doc_id", "n_tokens"), "doc_id")
        if staged
        else lang
    )
    ex = (
        ex_in.withColumn(
            "keep",
            F.min("doc_id").over(Window.partitionBy(F.md5(F.col("text").cast("binary")))),
        )
        .filter(F.col("doc_id") == F.col("keep"))
        .select("doc_id", "n_tokens")
        .transform(_hold)
    )
    # Stage survivor frames persist (doc_id, n_tokens) ONLY — two
    # bigints per doc.  Round-8: the pre-r8 funnel persisted the full
    # text column at four stages (base/ex/nd/sd ≈ 4× the corpus in
    # cache), which OOM'd the 300× decade tier; text-needing consumers
    # re-read the ONE persisted text cache (base) through an id
    # semi-join instead — an AQE-sized equi-join, noise next to a
    # second corpus-text cache at any scale.
    # same reason as base.count() above: SIX report branches read this
    # cache; if it is lazy they race to first-build the 1.7M-row
    # dedup window concurrently (getOrCompute has no cross-task build
    # dedup) and the multiplied sort memory OOMs the shared heap —
    # every stage fits with GBs to spare when built once
    ex.count()
    # text source for the survivor semi-joins: the wide cache in LAZY
    # mode, a fresh corpus scan in STAGED mode (no text cache exists)
    txt_src = corpus if staged else base
    ex_txt = txt_src.join(ex.select("doc_id"), "doc_id", "left_semi")
    bands = D.minhash_bands(ex_txt, "doc_id", "text", n_hashes=8, band_size=4)
    # Production-shaped LSH config (VERDICT r5 "Next" #4): the hot-bucket
    # star-emission valve is ON in the composed funnel.  The drop set is
    # IDENTICAL either way — all-pairs drops every id that appears as
    # id_b (everything but each bucket's min id), and a star's id_b set
    # is exactly the same members — so the unrolled all-pairs DuckDB
    # twin below remains the exact oracle.  Measured max bucket size on
    # the raw corpus is 4 at sf0.001/0.01/0.1 (cap never fires on test
    # data); `dedup_lsh_hot_bucket_capped` plants a hot band and
    # hash-checks the capped semantics cross-engine.
    lsh_drops = (
        D.lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=64)
        .select(F.col("id_b").alias("doc_id"))
        .distinct()
    )
    # drop sets are data-dependent (duplicate/contamination volume):
    # no hard broadcast hints anywhere in the funnel — AQE decides
    nd = ex.join(lsh_drops, "doc_id", "left_anti").transform(_hold)
    # SemDeDup restricted to the docs still IN the pipeline: the
    # quantizer is trained on the full embedding space (reusable across
    # runs), but the Σ|cluster|² pair join only pays for near-dedup
    # SURVIVORS — dedup among dropped docs is wasted work, and at scale
    # the survivor semi-join is an equi-join AQE sizes itself.  k=None →
    # corpus-scaled quantizer, same as the standalone SemDeDup query.
    cells = _sq8_kmeans_cells(spark, sf_dir, k=None, iters=3)
    # persisted: both sides of the pair self-join read it, and without
    # the persist the survivor semi-join (and the cells projection
    # under it) runs twice
    slv = (
        cells.select("vec_id", "cluster", "v", "nrm")
        .join(nd.select(F.col("doc_id").alias("vec_id")), "vec_id")
        # v is a 64-double ARRAY column — bound the batch builders
        # (same transient-spike class as the quantizer's wide cache)
        .transform(lambda d: tracked_persist(d, batch_rows=2000))
    )
    a_side = slv.select(
        F.col("vec_id").alias("id_a"),
        F.col("cluster").alias("cl_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    sem_cos = S.dot(F.col("va"), F.col("v")) / (F.col("na") * F.col("nrm"))
    sem_drops = (
        slv.join(
            a_side,
            (F.col("cl_a") == F.col("cluster")) & (F.col("id_a") < F.col("vec_id")),
        )
        .filter(sem_cos >= 0.45)
        .select(F.col("vec_id").alias("doc_id"))
        .distinct()
    )
    sd = nd.join(sem_drops, "doc_id", "left_anti").transform(_hold)
    is_eval = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000)
    ev_spans = (
        D.shingle_explode(corpus.filter(is_eval), "doc_id", "text", 8)
        .select(F.xxhash64("sh").alias("h"))
        .distinct()
    )
    sd_txt = txt_src.join(sd.select("doc_id"), "doc_id", "left_semi")
    contam = (
        D.shingle_explode(sd_txt.filter(~is_eval), "doc_id", "text", 8)
        .select("doc_id", F.xxhash64("sh").alias("h"))
        .join(F.broadcast(ev_spans), "h")
        .select("doc_id")
        .distinct()
    )
    dc = sd.join(contam, "doc_id", "left_anti").transform(_hold)
    wsh = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    pkc = dc.select(
        "doc_id", (F.col("doc_id") % 8).alias("shard"), F.col("n_tokens").alias("n_tok")
    ).withColumn("cum", F.sum("n_tok").over(wsh))
    pack = (
        pkc.groupBy("shard")
        .agg(
            F.expr("div(max(cum) + 511, 512)").alias("ns"),
            F.sum("n_tok").alias("nt"),
        )
        .agg(
            F.coalesce(F.sum("ns"), F.lit(0)).cast("bigint").alias("n_units"),
            F.coalesce(F.sum("nt"), F.lit(0)).cast("bigint").alias("n_tokens"),
        )
        .select(
            F.lit(7).cast("int").alias("stage_idx"),
            F.lit("pack").alias("stage"),
            "n_units",
            "n_tokens",
        )
    )
    hv = F.conv(
        F.substring(
            F.md5(
                F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast("binary")
            ),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    sp = dc.select(
        F.when(hv < 58982, "train").when(hv < 62258, "val").otherwise("test").alias(
            "split"
        ),
        "n_tokens",
    )
    splits = sp.groupBy("split").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_units"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("bigint").alias("n_tokens"),
    ).select(
        (
            F.lit(8)
            + F.when(F.col("split") == "train", 0)
            .when(F.col("split") == "val", 1)
            .otherwise(2)
        )
        .cast("int")
        .alias("stage_idx"),
        F.concat(F.lit("split_"), F.col("split")).alias("stage"),
        "n_units",
        "n_tokens",
    )

    def _cnt(flag):
        return F.count(F.when(flag, F.lit(1))).cast("bigint")

    def _tok(flag):
        return F.coalesce(F.sum(F.when(flag, F.col("n_tokens"))), F.lit(0)).cast(
            "bigint"
        )

    def _row(idx: int, name: str, c, t):
        return F.struct(
            F.lit(idx).cast("int").alias("stage_idx"),
            F.lit(name).alias("stage"),
            c.alias("n_units"),
            t.alias("n_tokens"),
        )

    true = F.lit(True)
    s012 = base.agg(
        F.inline(
            F.array(
                _row(0, "raw", _cnt(true), _tok(true)),
                _row(1, "quality", _cnt(q_pass), _tok(q_pass)),
                _row(2, "lang", _cnt(l_pass), _tok(l_pass)),
            )
        )
    )
    s3 = ex.agg(F.inline(F.array(_row(3, "exact_dedup", _cnt(true), _tok(true)))))
    s4 = nd.agg(F.inline(F.array(_row(4, "near_dedup", _cnt(true), _tok(true)))))
    s5 = sd.agg(F.inline(F.array(_row(5, "semantic_dedup", _cnt(true), _tok(true)))))
    s6 = dc.agg(F.inline(F.array(_row(6, "decontaminate", _cnt(true), _tok(true)))))
    global _FUNNEL_LAST_MODE
    if staged:
        # STAGED tier (≥ _FUNNEL_STAGE_RELEASE_DOCS): run the stage
        # aggregates eagerly IN DEPENDENCY ORDER and unpersist each
        # cache right after its last consumer completes.  Values are
        # identical to the lazy union — same frames, same expressions —
        # only materialization timing and cache lifetime change.
        _FUNNEL_LAST_MODE = "staged"
        # Round 11 (VERDICT r10 "Next" #6): s012/s3/s4 merged into ONE
        # action — base and ex are already eagerly built (the count()
        # barriers above), so the merged job's branches read caches
        # instead of racing to build them, and neither frame's cache
        # lifetime moves (ex is released after s4 either way; base
        # lives to s6 regardless).  6 serial stage barriers → 4.
        # s5/s6 stay separate: merging them would force nd+slv (s5's
        # inputs) to stay cached until dc completes — exactly the
        # working-set growth the staged mode exists to avoid — and
        # their union would race to first-build the slim sd cache.
        lit_rows = list(
            s012.unionByName(s3).unionByName(s4).collect()
        )                                        # base+ex stats, builds nd
        # round 11: the slim base cache's LAST consumer is s012 (the
        # text semi-joins read fresh corpus scans in staged mode), so
        # it is released here instead of after s6
        base.unpersist(blocking=False)
        ex.unpersist(blocking=False)             # nd built, ex_txt consumed
        slv.count()                              # survivor cells cached
        cells.unpersist(blocking=False)          # slv was its only consumer
        lit_rows += s5.collect()                 # materializes sd (pair join)
        nd.unpersist(blocking=False)
        slv.unpersist(blocking=False)
        lit_rows += s6.collect()                 # materializes dc (contam)
        sd.unpersist(blocking=False)
        lit_df = spark.createDataFrame(
            lit_rows, "stage_idx int, stage string, n_units bigint, n_tokens bigint"
        )
        # pack + splits read dc, the ONE cache the final action needs —
        # the harness-level release_caches() frees it after collection
        return (
            lit_df.unionByName(pack).unionByName(splits).orderBy("stage_idx")
        )
    _FUNNEL_LAST_MODE = "lazy"
    return (
        s012.unionByName(s3)
        .unionByName(s4)
        .unionByName(s5)
        .unionByName(s6)
        .unionByName(pack)
        .unionByName(splits)
        .orderBy("stage_idx")
    )


def _pq_ctes(m: int = 4, k: int = 16, subdim: int = 16, iters: int = 3) -> str:
    """Unrolled-Lloyd DuckDB twin of ``similarity_ann_pq``, through the
    ``ranked`` CTE (ADC-approx top-k per query).  Shared by the
    full-SELECT twin ``_pq_oracle_sql`` and the recall gate
    ``ann_recall_pq``.

    Replayable because every float op is order-pinned or exact:
    - training inputs are SQ8 codes (integer-valued doubles), so the
      per-cluster partial SUMs are exact in float64 regardless of
      aggregation order, and each centroid mean is ONE correctly-rounded
      division — bitwise identical to the Spark driver's ``s / count``;
    - distances fold dimension-by-dimension in index order on BOTH
      engines (``list_dot_product`` ≡ the Spark SQL fold ≡ the Arrow
      tier's ``_dists_fold_order``), so argmins — ties included — agree;
    - the iteration count is pinned (``tol=0.0`` → exactly ``iters``
      updates), so the unrolled CTE chain replays training step-for-step.
    """
    js = ", ".join(str(j) for j in range(m))
    parts = [
        f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT unnest(v) AS x FROM e)),
    cv AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12)) AS INTEGER))) AS DOUBLE)) AS cvec
        FROM e, mm
    ),
    sub AS (
        SELECT vec_id, j, cvec[j*{subdim}+1 : j*{subdim}+{subdim}] AS sv
        FROM cv, (SELECT unnest([{js}]) AS j)
    ),
    cents0 AS (
        SELECT j,
               CAST(ROW_NUMBER() OVER (PARTITION BY j ORDER BY vec_id) AS INTEGER) - 1 AS c,
               sv AS cent
        FROM sub
        WHERE vec_id IN (SELECT vec_id FROM cv ORDER BY vec_id LIMIT {k})
    )"""
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
    a{i}p AS (
        SELECT s.vec_id, s.j, c.c,
               list_transform(range(1,{subdim + 1}), t -> s.sv[t] - c.cent[t]) AS d
        FROM sub s JOIN cents{i - 1} c ON c.j = s.j
    ),
    a{i} AS (
        SELECT vec_id, j, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY list_dot_product(d, d) ASC, c) AS rk
        FROM a{i}p
    ),
    u{i} AS (
        SELECT a.j, a.c, t.i AS pos, SUM(s.sv[t.i]) AS sm, COUNT(*) AS n
        FROM a{i} a
        JOIN sub s ON s.vec_id = a.vec_id AND s.j = a.j
        CROSS JOIN (SELECT unnest(range(1,{subdim + 1})) AS i) t
        WHERE a.rk = 1
        GROUP BY a.j, a.c, t.i
    ),
    m{i} AS (SELECT j, c, list(sm / n ORDER BY pos) AS cent FROM u{i} GROUP BY j, c),
    cents{i} AS (
        SELECT p.j, p.c, coalesce(mm.cent, p.cent) AS cent
        FROM cents{i - 1} p LEFT JOIN m{i} mm ON mm.j = p.j AND mm.c = p.c
    )""")
    fin = iters + 1
    parts.append(f""",
    a{fin}p AS (
        SELECT s.vec_id, s.j, c.c,
               list_transform(range(1,{subdim + 1}), t -> s.sv[t] - c.cent[t]) AS d
        FROM sub s JOIN cents{iters} c ON c.j = s.j
    ),
    codesf AS (
        SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                       ORDER BY list_dot_product(d, d) ASC, c) AS rk
            FROM a{fin}p
        ) WHERE rk = 1
    ),
    lut AS (
        SELECT q.vec_id AS qid, c.j, c.c, list_dot_product(q.sv, c.cent) AS ip
        FROM sub q JOIN cents{iters} c ON c.j = q.j
        WHERE q.vec_id < 10
    ),
    scored AS (
        SELECT l.qid AS query_id, kk.vec_id AS neighbor_id,
               MAX(CASE WHEN kk.j = 0 THEN l.ip END)
             + MAX(CASE WHEN kk.j = 1 THEN l.ip END)
             + MAX(CASE WHEN kk.j = 2 THEN l.ip END)
             + MAX(CASE WHEN kk.j = 3 THEN l.ip END) AS approx_ip
        FROM codesf kk
        JOIN lut l ON l.j = kk.j AND l.c = kk.c AND kk.vec_id != l.qid
        GROUP BY l.qid, kk.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, approx_ip,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY approx_ip DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )""")
    return "".join(parts)


def _pq_oracle_sql(m: int = 4, k: int = 16, subdim: int = 16, iters: int = 3) -> str:
    """Full-SELECT DuckDB twin of ``similarity_ann_pq``: the shared PQ
    CTE chain plus the ADC top-5 projection."""
    return _pq_ctes(m, k, subdim, iters) + """
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(approx_ip AS DOUBLE) AS approx_ip, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """


def _pq_recall_oracle_sql() -> str:
    """DuckDB twin of ``ann_recall_pq``: exact cosine top-5 truth over
    the RAW vectors vs the PQ-ADC approx top-5 (both SQ8+PQ training
    and ADC scoring replayed by the shared ``_pq_ctes`` chain)."""
    return _pq_ctes() + """,
    approx AS (SELECT query_id, neighbor_id FROM ranked WHERE rk <= 5),
    truth AS (
        SELECT query_id, neighbor_id FROM (
            SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
                   ROW_NUMBER() OVER (PARTITION BY q.vec_id
                       ORDER BY list_dot_product(q.v, c.v)
                                / (sqrt(list_dot_product(q.v, q.v))
                                   * sqrt(list_dot_product(c.v, c.v))) DESC,
                                c.vec_id) AS rk
            FROM e q JOIN e c ON c.vec_id != q.vec_id
            WHERE q.vec_id < 10
        ) WHERE rk <= 5
    ),
    hits AS (
        SELECT t.query_id,
               CAST(SUM(CASE WHEN a.neighbor_id IS NOT NULL
                             THEN 1 ELSE 0 END) AS BIGINT) AS n_hit
        FROM truth t LEFT JOIN approx a
          ON a.query_id = t.query_id AND a.neighbor_id = t.neighbor_id
        GROUP BY t.query_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id, n_hit,
           CAST((1000 * n_hit) // 5 AS BIGINT) AS recall_permille
    FROM hits ORDER BY query_id
    """


@register("ann_recall_pq", _pq_recall_oracle_sql())
def ann_recall_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the PQ-ADC tier against exact cosine brute force —
    completes the recall-gate family (sign-LSH: ``ann_recall_at_k``,
    IVF: ``ann_recall_ivf``, multiprobe: ``ann_recall_multiprobe``):
    PQ is the LOSSY-COMPRESSION tier (SQ8 then 4×16 codebooks), so its
    approximation error comes from quantization, not candidate
    pruning, and deserves its own measured gate rather than an assumed
    one.  Truth is exact cosine over the raw float vectors; approx is
    the same ADC top-5 the registered ``similarity_ann_pq`` serves.

    Scale shape: training/encoding inherits ``pq_fit_codes``'s bounded
    driver transfers (k centroids per subspace per round); the truth
    pass is the O(|Q|·N) brute scan with the bounded 10-query
    broadcast — the gate's cost is controlled by |Q|, not corpus size,
    exactly like the other recall gates."""
    from pyspark.sql import Window

    emb = load_testdata(spark, sf_dir, "embeddings")
    cvec = S.sq8_codes(emb).select(
        "vec_id",
        F.transform("codes", lambda x: x.cast("double")).alias("embedding"),
    )
    codes, books = S.pq_fit_codes(cvec, m=4, k=16, max_iter=3)
    codes = codes.transform(tracked_persist)
    approx = S.pq_adc_topk(
        codes, books, cvec.filter(F.col("vec_id") < 10), k_neighbors=5
    ).select("query_id", "neighbor_id")

    n = S.with_norm(emb).select(
        "vec_id", F.col("_v").alias("v"), F.col("_norm").alias("nrm")
    )
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    cos = S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    truth = (
        n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id", cos.alias("cos"))
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .select("query_id", F.col("vec_id").alias("neighbor_id"))
    )
    hits = (
        truth.join(
            approx.withColumn("is_hit", F.lit(1)),
            ["query_id", "neighbor_id"],
            "left",
        )
        .groupBy("query_id")
        .agg(F.sum(F.coalesce("is_hit", F.lit(0))).cast("bigint").alias("n_hit"))
    )
    return hits.select(
        F.col("query_id").cast("bigint"),
        "n_hit",
        F.expr("div(1000 * n_hit, 5)").cast("bigint").alias("recall_permille"),
    ).orderBy("query_id")


@register(
    "embedding_pca_power_iteration",
    r"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx
           FROM (SELECT unnest(v) AS x FROM e)),
    cv AS (
        SELECT vec_id,
               list_transform(v, x -> CAST(least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12))
                        AS INTEGER))) AS DOUBLE)) AS cvec
        FROM e, mm
    ),
    ij AS (
        SELECT ii.i, jj.j, SUM(cvec[ii.i] * cvec[jj.j]) AS sm
        FROM cv,
             (SELECT unnest(range(1, 65)) AS i) ii,
             (SELECT unnest(range(1, 65)) AS j) jj
        GROUP BY ii.i, jj.j
    ),
    s AS (SELECT i, list(sm ORDER BY j) AS row FROM ij GROUP BY i),
    n1 AS (SELECT i, list_dot_product(row,
               list_transform(range(1, 65), t -> 1.0)) AS y FROM s),
    m1 AS (SELECT MAX(y) AS m FROM n1),
    x1 AS (SELECT list(floor((1024 * y) / m) / 1024 ORDER BY i) AS x
           FROM n1, m1),
    n2 AS (SELECT i, list_dot_product(row, x) AS y FROM s, x1),
    m2 AS (SELECT MAX(y) AS m FROM n2),
    x2 AS (SELECT list(floor((1024 * y) / m) / 1024 ORDER BY i) AS x
           FROM n2, m2),
    n3 AS (SELECT i, list_dot_product(row, x) AS y FROM s, x2),
    m3 AS (SELECT MAX(y) AS m FROM n3)
    SELECT CAST(i AS BIGINT) AS dim,
           CAST(floor((1000000 * y) / m) AS BIGINT) AS loading_micro,
           CAST(floor(m) AS BIGINT) AS lambda_floor
    FROM n3, m3 ORDER BY dim
    """,
)
def embedding_pca_power_iteration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dominant principal direction of the embedding corpus by power
    iteration — the tall-skinny PCA pattern every embedding pipeline
    runs (drift monitoring, whitening, anisotropy checks): the ONLY
    O(N) work is the 64×64 second-moment matrix S = Σ vvᵀ, computed
    distributedly as one map-side-combined aggregate over the SQ8 code
    vectors; the eigensolve then runs on the driver over 4,096 numbers
    (the same bounded-model pattern as the k-means Lloyd rounds, which
    collect k centroids per iteration).

    Cross-engine exactness is engineered, not hoped for: training
    inputs are SQ8 codes (integer-valued ⇒ S is exact in float64 in
    ANY summation order), the start vector is all-ones, and between
    iterations the iterate is renormalized by its max element and
    QUANTIZED to 11-bit dyadic rationals (floor(1024·y/m)/1024) — so
    every matrix-vector product is a sum of exact dyadic values below
    2⁵³, order-independent on both engines; the only rounding ops are
    correctly-rounded divisions of identical operands.  Three unrolled
    iterations; output is the 64 loadings (millionths, floored) and
    the dominant-eigenvalue floor of S.

    The returned frame is the 64-row driver-built result (plan: local
    scan), exactly like the broadcast-centroid frames the ANN tier
    serves — the distributed aggregate ran when it was built."""
    import math

    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    cv = S.sq8_codes(emb)
    ex = cv.select(F.posexplode("codes").alias("i0", "ci"), F.col("codes"))
    srows = ex.groupBy("i0").agg(
        *[
            F.sum(F.col("ci").cast("long") * F.col("codes")[j].cast("long")).alias(
                f"s{j}"
            )
            for j in range(64)
        ]
    )
    smat = {
        r["i0"]: [float(r[f"s{j}"]) for j in range(64)] for r in srows.collect()
    }
    s_rows = [smat[i] for i in range(64)]
    x = [1.0] * 64
    m = 1.0
    for it in range(3):
        y = []
        for i in range(64):
            acc = 0.0
            row = s_rows[i]
            for j in range(64):
                acc = acc + row[j] * x[j]
            y.append(acc)
        m = max(y)
        if it < 2:
            x = [math.floor((1024 * yi) / m) / 1024 for yi in y]
    out = [
        (i + 1, int(math.floor((1000000 * y[i]) / m)), int(math.floor(m)))
        for i in range(64)
    ]
    return spark.createDataFrame(
        out, "dim long, loading_micro long, lambda_floor long"
    ).orderBy("dim")


@register("similarity_ann_pq", _pq_oracle_sql())
def similarity_ann_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-quantization ADC top-k — completes the FAISS quantization
    triad (IVF = partition, SQ8 = scalar compress, PQ = vector
    compress).  The pipeline is the production ``SQ8 → PQ`` composition:
    vectors are first scalar-quantized to 8-bit codes (storage tier),
    then the PQ codebooks are TRAINED ON THE CODE VECTORS (m=4 subspaces
    × k=16 codewords × 3 Lloyd iterations, first-k-by-id seeding) and
    each vector stored as 4 small codes.  Queries keep their (quantized)
    full vector and score candidates through a broadcast
    (query × subspace × codeword) inner-product lookup table — m table
    reads + adds per candidate, never a d-dim scan.

    Training on integer-valued inputs is what makes this oracle-exact
    (round-2 demand): cluster partial sums are exact in float64 (order-
    independent), centroid means are one rounded division each, and
    distance folds are index-order on both engines — so the DuckDB twin
    (``_pq_oracle_sql``) replays training, encoding, and ADC scoring
    bitwise.  ``tests/test_extensions.py`` additionally pins code
    determinism and cluster-structured retrieval."""
    # no _fan_out: PQ's per-row work is tiny (16-dim argmin), so the
    # driver-loop job cost is TASK COUNT, not compute — training jobs
    # on the input's natural partitioning run 32× fewer tasks locally
    # (measured 6.5 → 4.1 s); at scale the input partitions naturally
    emb = load_testdata(spark, sf_dir, "embeddings")
    # not persisted here: pq_fit_codes persists its own projection of
    # this frame (training + encode), and the query side below touches
    # it once more with a pushed-down vec_id filter — one cheap rescan
    # beats materializing the same 8-bit vectors into a second cache
    cvec = S.sq8_codes(emb).select(
        "vec_id",
        F.transform("codes", lambda x: x.cast("double")).alias("embedding"),
    )
    codes, books = S.pq_fit_codes(cvec, m=4, k=16, max_iter=3)
    codes = codes.transform(tracked_persist)
    out = S.pq_adc_topk(
        codes, books, cvec.filter(F.col("vec_id") < 10), k_neighbors=5
    )
    return out.select(
        F.col("query_id").cast("bigint"),
        F.col("neighbor_id").cast("bigint"),
        F.col("approx_ip").cast("double"),
        "rk",
    ).orderBy("query_id", "rk")


def _ivfpq_oracle_sql(m: int = 4, k: int = 16, subdim: int = 16, iters: int = 3) -> str:
    """DuckDB twin of ``similarity_ann_ivf_pq`` — the two proven
    unrolled-Lloyd chains composed: the coarse-cell CTEs
    (``_kmeans_cells_cte``, shared ``e``/``mm``/``cv``) followed by the
    PQ training/encoding/ADC chain of ``_pq_oracle_sql`` with
    ``q``-prefixed CTE names (the two Lloyd fits would otherwise
    collide on cents/a/u/m), and scoring restricted to same-cell
    candidates.  Replayability is inherited unchanged from both parents
    (integer-valued training inputs, index-order folds, pinned
    iterations)."""
    js = ", ".join(str(j) for j in range(m))
    parts = [
        _kmeans_cells_cte(),
        f""",
    sub AS (
        SELECT vec_id, j, cvec[j*{subdim}+1 : j*{subdim}+{subdim}] AS sv
        FROM cv, (SELECT unnest([{js}]) AS j)
    ),
    qcents0 AS (
        SELECT j,
               CAST(ROW_NUMBER() OVER (PARTITION BY j ORDER BY vec_id) AS INTEGER) - 1 AS c,
               sv AS cent
        FROM sub
        WHERE vec_id IN (SELECT vec_id FROM cv ORDER BY vec_id LIMIT {k})
    )""",
    ]
    for i in range(1, iters + 1):
        parts.append(f""",
    qa{i}p AS (
        SELECT s.vec_id, s.j, c.c,
               list_transform(range(1,{subdim + 1}), t -> s.sv[t] - c.cent[t]) AS d
        FROM sub s JOIN qcents{i - 1} c ON c.j = s.j
    ),
    qa{i} AS (
        SELECT vec_id, j, c,
               ROW_NUMBER() OVER (PARTITION BY vec_id, j
                   ORDER BY list_dot_product(d, d) ASC, c) AS rk
        FROM qa{i}p
    ),
    qu{i} AS (
        SELECT a.j, a.c, t.i AS pos, SUM(s.sv[t.i]) AS sm, COUNT(*) AS n
        FROM qa{i} a
        JOIN sub s ON s.vec_id = a.vec_id AND s.j = a.j
        CROSS JOIN (SELECT unnest(range(1,{subdim + 1})) AS i) t
        WHERE a.rk = 1
        GROUP BY a.j, a.c, t.i
    ),
    qm{i} AS (SELECT j, c, list(sm / n ORDER BY pos) AS cent FROM qu{i} GROUP BY j, c),
    qcents{i} AS (
        SELECT p.j, p.c, coalesce(mm2.cent, p.cent) AS cent
        FROM qcents{i - 1} p LEFT JOIN qm{i} mm2 ON mm2.j = p.j AND mm2.c = p.c
    )""")
    fin = iters + 1
    adc = "\n             + ".join(
        f"MAX(CASE WHEN kk.j = {j} THEN l.ip END)" for j in range(m)
    )
    parts.append(f""",
    qa{fin}p AS (
        SELECT s.vec_id, s.j, c.c,
               list_transform(range(1,{subdim + 1}), t -> s.sv[t] - c.cent[t]) AS d
        FROM sub s JOIN qcents{iters} c ON c.j = s.j
    ),
    codesf AS (
        SELECT vec_id, j, c FROM (
            SELECT vec_id, j, c,
                   ROW_NUMBER() OVER (PARTITION BY vec_id, j
                       ORDER BY list_dot_product(d, d) ASC, c) AS rk
            FROM qa{fin}p
        ) WHERE rk = 1
    ),
    lut AS (
        SELECT q.vec_id AS qid, c.j, c.c, list_dot_product(q.sv, c.cent) AS ip
        FROM sub q JOIN qcents{iters} c ON c.j = q.j
        WHERE q.vec_id < 10
    ),
    scored AS (
        SELECT l.qid AS query_id, kk.vec_id AS neighbor_id,
               {adc} AS approx_ip
        FROM codesf kk
        JOIN lut l ON l.j = kk.j AND l.c = kk.c AND kk.vec_id != l.qid
        JOIN cells nc ON nc.vec_id = kk.vec_id
        JOIN cells qc ON qc.vec_id = l.qid AND qc.cluster = nc.cluster
        GROUP BY l.qid, kk.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, approx_ip,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY approx_ip DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(approx_ip AS DOUBLE) AS approx_ip, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """)
    return "".join(parts)


@register("similarity_ann_ivf_pq", _ivfpq_oracle_sql())
def similarity_ann_ivf_pq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ — the canonical FAISS composite index (round-5): the
    trained coarse quantizer routes each vector to a cell
    (``_sq8_kmeans_cells``, k=8 pinned index config) and candidates are
    scored with PQ asymmetric distance INSIDE the query's cell only.
    This is the shape a 100 TB vector store actually deploys: the scan
    side holds 4-byte PQ codes partitioned by cell (one inverted list
    per probe), the query side broadcasts a |Q|·m·k LUT, and neither
    full-precision vectors nor cross-cell candidates ever move.

    Reuses the PERSISTED cells frame for PQ training input (its
    ``cvec`` column is exactly the SQ8 code vector the flat PQ query
    trains on — one scan serves routing and training).  The DuckDB twin
    composes the two proven unrolled-Lloyd chains; both inherit the
    integer-exact replay argument of ``_pq_oracle_sql``."""
    cells = _sq8_kmeans_cells(spark, sf_dir, k=8, iters=3)
    cvec = cells.select("vec_id", F.col("cvec").alias("embedding"), "cluster")
    codes, books = S.pq_fit_codes(
        cvec.select("vec_id", "embedding"), m=4, k=16, max_iter=3
    )
    codes = codes.join(cells.select("vec_id", "cluster"), "vec_id").transform(
        tracked_persist
    )
    out = S.pq_adc_topk(
        codes,
        books,
        cvec.filter(F.col("vec_id") < 10),
        k_neighbors=5,
        restrict_col="cluster",
    )
    return out.select(
        F.col("query_id").cast("bigint"),
        F.col("neighbor_id").cast("bigint"),
        F.col("approx_ip").cast("double"),
        "rk",
    ).orderBy("query_id", "rk")


@register(
    "text_trigram_lm_score",
    r"""
    WITH lowered AS (SELECT doc_id, lower(text) AS t FROM documents),
    pos AS (
        SELECT doc_id, t,
               unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i
        FROM lowered WHERE length(t) >= 3
    ),
    tg AS (SELECT doc_id, substr(t, i, 3) AS tg FROM pos),
    counts AS (SELECT tg, COUNT(*) AS n FROM tg GROUP BY tg),
    scored AS (
        SELECT g.doc_id,
               COUNT(*) AS n_trigrams,
               SUM(length(format('{:b}', c.n)) - 1) AS bucket_sum
        FROM tg g JOIN counts c ON c.tg = g.tg
        GROUP BY g.doc_id
    )
    SELECT CAST(doc_id AS BIGINT) AS doc_id,
           CAST(n_trigrams AS BIGINT) AS n_trigrams,
           CAST((1000 * bucket_sum) // n_trigrams AS BIGINT) AS familiarity_permille
    FROM scored
    ORDER BY doc_id
    """,
)
def text_trigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Char-trigram language-model familiarity score — the
    integer-exact stand-in for CCNet's KenLM perplexity filter: a
    document whose character trigrams are all corpus-frequent scores
    high; gibberish / boilerplate-free rare text scores low.  Score =
    per-doc mean of floor(log2(corpus_count(trigram))) in permille.

    floor(log2 n) is computed as ``length(bin(n)) - 1`` — an INTEGER
    derivation on both engines, because float log2 may round a hair
    differently across libm implementations and flip a floor.

    Scale shape: the LOWERED TEXT is persisted (compact, ~1× input)
    and each consumer re-derives the char array in one streamed O(len)
    split per row, so every emitted trigram is three O(1) array reads —
    the first cut evaluated ``substring(lower(text), i, 3)`` inside the
    explode lambda, an O(len) lower + O(i) UTF8 seek PER TRIGRAM =
    O(len²) per doc, measured 8.1 s vs 3.0 s at sf0.1; a later cut
    persisted the char ARRAY itself, whose ~56-bytes-per-char columnar
    cache batches OOM'd the 100× blow-up.  The count table's key space
    is bounded by charset³ regardless of corpus size, so it aggregates
    with map-side partial combine and BROADCASTS back to the stream —
    per-doc scoring is then a map-side join + one groupBy(doc_id)
    shuffle.  Nothing here grows faster than the char stream itself."""
    docs = load_testdata(spark, sf_dir, "documents")
    # length filter runs on the LOWERED text (size(cs) counts it) so it
    # agrees with the oracle's WHERE length(lower(text)) even for
    # Unicode chars whose lowercase expands (e.g. U+0130).
    # PERSIST THE COMPACT FORM: caching the char ARRAY inflates every
    # character to a ~56-byte UTF8String inside the columnar cache
    # builder (10k-row batches held on-heap per task) — the 100×
    # blow-up OOM'd exactly there.  Persist lower(text) (~1× the
    # input) and re-derive cs per consumer: the split is O(len) per
    # row, streamed and GC-able, and the two consumers pay 2× split
    # CPU instead of a memory-bound cache of the inflated form.
    lowered = docs.select(
        "doc_id", F.lower("text").alias("lt")
    ).transform(tracked_persist)
    chars = lowered.select(
        "doc_id", F.split("lt", "(?!^)").alias("cs")
    ).filter(F.size("cs") >= 4)
    tg = chars.select(
        "doc_id",
        # split("(?!^)") leaves one trailing "" element, so the char
        # count is size(cs) - 1 and valid trigram starts are 1..n-2 =
        # 1..size(cs)-3 (0-based reads below)
        F.expr(
            "explode(transform(sequence(1, size(cs) - 3),"
            " i -> concat(cs[i-1], cs[i], cs[i+1])))"
        ).alias("tg"),
    )
    counts = tg.groupBy("tg").agg(F.count("*").alias("n"))
    bucket = F.length(F.expr("bin(n)")) - 1
    # counts is charset³-BOUNDED (char trigrams saturate; it does NOT
    # grow ∝ corpus the way word-vocab tables do), so the explicit
    # broadcast is sound at any corpus size — and load-bearing: the
    # round-8 audit briefly demoted it to a plain join, which forced
    # the corpus-sized trigram STREAM through a shuffle and OOM'd the
    # 100× blow-up; map-side broadcast join keeps the stream shuffle-
    # free all the way to the one groupBy(doc_id).
    return (
        tg.join(F.broadcast(counts), "tg")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_trigrams"),
            F.sum(bucket).alias("bucket_sum"),
        )
        .select(
            F.col("doc_id").cast("bigint"),
            "n_trigrams",
            F.expr("div(1000 * bucket_sum, n_trigrams)").alias("familiarity_permille"),
        )
        .orderBy("doc_id")
    )


def _bpe_apply_sql(src: str, dst: str, m: str, pre: str) -> str:
    """One gaps-and-islands merge-application block: apply merge ``m``
    to every symbol array in ``src``, emitting ``dst``.  Within every
    run of consecutive matching positions (only possible when
    lhs = rhs), odd ranks merge and the position after a merge is
    consumed — exactly the left-fold the Spark side computes."""
    return f""",
    {pre}f AS (
        SELECT word, freq, i, syms[i] AS s,
               (i < len(syms) AND syms[i] = (SELECT lhs FROM {m})
                AND syms[i+1] = (SELECT rhs FROM {m})) AS m
        FROM (SELECT word, freq, syms,
                     unnest(generate_series(1, len(syms))) AS i FROM {src})
    ),
    {pre}g AS (
        SELECT word, freq, i, s, m,
               (m AND ROW_NUMBER() OVER (PARTITION BY word, isl, m ORDER BY i) % 2 = 1) AS greedy
        FROM (SELECT *, i - ROW_NUMBER() OVER (PARTITION BY word, m ORDER BY i) AS isl
              FROM {pre}f)
    ),
    {pre}h AS (
        SELECT word, freq, i,
               CASE WHEN greedy THEN (SELECT lhs || rhs FROM {m})
                    WHEN lag(greedy, 1, false) OVER (PARTITION BY word ORDER BY i)
                         THEN NULL
                    ELSE s END AS emit
        FROM {pre}g
    ),
    {dst} AS (
        SELECT word, freq,
               list(emit ORDER BY i) FILTER (WHERE emit IS NOT NULL) AS syms
        FROM {pre}h GROUP BY word, freq
    )"""


def _bpe_train_ctes(rounds: int, vocab: int) -> str:
    """Shared CTE chain: word frequencies (wall), the top-``vocab``
    training table (w0/v0), and per round the pair count (p{r}),
    argmax merge (m{r}), and trained symbol table v{r}."""
    parts = [rf"""
    WITH wx AS (SELECT unnest(string_split_regex(lower(text), '\s+')) AS word
                FROM documents),
    wall AS (SELECT word, CAST(COUNT(*) AS BIGINT) AS freq FROM wx
             WHERE word <> '' GROUP BY word),
    w0 AS (SELECT word, freq FROM wall ORDER BY freq DESC, word LIMIT {vocab}),
    v0 AS (SELECT word, freq,
                  list_append(list_transform(generate_series(1, length(word)),
                                             i -> substr(word, i, 1)), '</w>') AS syms
           FROM w0)"""]
    for r in range(1, rounds + 1):
        parts.append(f""",
    p{r} AS (
        SELECT lhs, rhs, SUM(freq) AS cnt FROM (
            SELECT freq, unnest(syms[1:len(syms)-1]) AS lhs,
                   unnest(syms[2:len(syms)]) AS rhs
            FROM v{r - 1}
        ) GROUP BY lhs, rhs
    ),
    m{r} AS (SELECT lhs, rhs, cnt FROM p{r} ORDER BY cnt DESC, lhs, rhs LIMIT 1)"""
        )
        parts.append(_bpe_apply_sql(f"v{r - 1}", f"v{r}", f"m{r}", f"f{r}"))
    return "".join(parts)


def _bpe_oracle_sql(rounds: int = 4, vocab: int = 2000) -> str:
    """Unrolled DuckDB twin of ``vocab_bpe_merges``: the shared
    training chain, outputting the merge table."""
    parts = [_bpe_train_ctes(rounds, vocab)]
    unions = "\n        UNION ALL ".join(
        f"SELECT {r} AS rnd, lhs, rhs, lhs || rhs AS merged, CAST(cnt AS BIGINT) AS pair_count FROM m{r}"
        for r in range(1, rounds + 1)
    )
    parts.append(f"""
    SELECT * FROM (
        {unions}
    ) ORDER BY rnd
    """)
    return "".join(parts)


@register("vocab_bpe_merges", _bpe_oracle_sql())
def vocab_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Byte-pair-encoding merge induction (Sennrich et al. 2016) — the
    tokenizer-training step of an LLM data pipeline, run in-engine: 4
    merge rounds over the corpus vocabulary, returning the learned
    merge table (round, lhs, rhs, merged, weighted pair count).

    The classic BPE scale trick does the heavy lifting: training
    operates on the WORD-FREQUENCY table (top-2000 word forms by
    frequency, deterministic tiebreak), never the token stream — the
    corpus is scanned once to build it, after which every round touches
    only ~2000 tiny symbol arrays.  Per round: pair counts via an
    inline-generator explode (bounded: Σ word-length rows), one
    map-side-combined groupBy, a 1-row argmax to the driver, and the
    merge applied as an ``F.aggregate`` left fold per word (greedy
    non-overlapping, ANSI-safe CaseWhen short-circuit guards the
    empty-accumulator element_at).  DuckDB replays the fold as a
    gaps-and-islands window program — two independent formulations of
    the same greedy semantics."""
    return spark.createDataFrame(
        _bpe_train(spark, sf_dir),
        schema="rnd int, lhs string, rhs string, merged string, pair_count bigint",
    ).orderBy("rnd")


_BPE_SYMS0 = (
    "concat(slice(split(word, '(?!^)'), 1, size(split(word, '(?!^)')) - 1),"
    " array('</w>'))"
)


def _bpe_merge_fold(x: str, y: str):
    """Greedy left-to-right application of merge (x, y) as an
    ANSI-safe F.aggregate fold over a ``syms`` column (CaseWhen
    short-circuit guards the empty-accumulator element_at)."""
    return F.aggregate(
        F.col("syms"),
        F.expr("cast(array() as array<string>)"),
        lambda acc, s: F.when(F.size(acc) == 0, F.concat(acc, F.array(s)))
        .when(
            (F.element_at(acc, -1) == F.lit(x)) & (s == F.lit(y)),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(F.lit(x + y))),
        )
        .otherwise(F.concat(acc, F.array(s))),
    )


def _bpe_train(
    spark: SparkSession, sf_dir: str, rounds: int = 4, words: DataFrame | None = None
):
    """Train the merge table on the top-2000 word-frequency table;
    returns [(rnd, lhs, rhs, merged, pair_count), ...].  Pass ``words``
    (a one-column token stream) to reuse an already-tokenized corpus —
    ``vocab_bpe_encode`` shares its persisted stream this way instead
    of paying a second scan+split pass (review finding)."""
    if words is None:
        words = (
            load_testdata(spark, sf_dir, "documents")
            .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
            .filter(F.col("word") != "")
        )
    vocab = (
        words.groupBy("word")
        .agg(F.count("*").alias("freq"))
        .orderBy(F.desc("freq"), "word")
        .limit(2000)
    )
    vdf = vocab.withColumn("syms", F.expr(_BPE_SYMS0)).transform(tracked_persist)
    merges = []
    for rnd in range(1, rounds + 1):
        pairs = vdf.select(
            "freq",
            F.expr(
                "explode(transform(sequence(1, size(syms) - 1),"
                " i -> struct(syms[i-1] AS lhs, syms[i] AS rhs)))"
            ).alias("p"),
        ).select("freq", "p.lhs", "p.rhs")
        top = (
            pairs.groupBy("lhs", "rhs")
            .agg(F.sum("freq").alias("cnt"))
            .orderBy(F.desc("cnt"), "lhs", "rhs")
            .limit(1)
            .collect()[0]
        )
        x, y, cnt = top["lhs"], top["rhs"], int(top["cnt"])
        vdf = vdf.withColumn("syms", _bpe_merge_fold(x, y)).transform(tracked_persist)
        merges.append((rnd, x, y, x + y, cnt))
    return merges


@register(
    "text_lang_classifier_nb",
    r"""
    WITH tok AS (
        SELECT doc_id, lang,
               unnest(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents
    ),
    tok2 AS (SELECT * FROM tok WHERE tok <> ''),
    wt AS (
        SELECT lang AS cls, tok,
               CAST(length(format('{:b}', COUNT(*))) AS BIGINT) AS wt
        FROM tok2 WHERE doc_id % 5 <> 0 GROUP BY lang, tok
    ),
    scored AS (
        SELECT t.doc_id, t.lang, w.cls, SUM(w.wt) AS score
        FROM tok2 t JOIN wt w ON w.tok = t.tok
        WHERE t.doc_id % 5 = 0
        GROUP BY t.doc_id, t.lang, w.cls
    ),
    pred AS (
        SELECT doc_id, lang, cls,
               ROW_NUMBER() OVER (PARTITION BY doc_id
                   ORDER BY score DESC, cls) AS rk
        FROM scored
    )
    SELECT lang AS actual, cls AS predicted,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM pred WHERE rk = 1
    GROUP BY lang, cls
    ORDER BY actual, predicted
    """,
)
def text_lang_classifier_nb(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trained multinomial-Naive-Bayes-style language classifier — the
    model-based tier of quality/language filtering (the fasttext
    supervised classifier's role in CCNet/RefinedWeb pipelines),
    expressed entirely in integer arithmetic so both engines agree
    bitwise: per-class token weights are floor(log2(count))+1 =
    ``length(bin(count))`` (the same libm-free derivation as
    ``text_trigram_lm_score``), a doc's class score is the sum of its
    tokens' class weights, argmax with a (score DESC, class ASC)
    tiebreak.  Deterministic train/test split by doc_id % 5; output is
    the test-set confusion matrix.

    Scale shape: the weight table is bounded by vocab × classes and
    BROADCASTS to the test-token stream (map-side join); scoring is one
    groupBy(doc, class) with partial combine, and the per-doc argmax
    window partitions on doc_id with ≤|classes| rows each.  Train and
    test are disjoint filters over ONE persisted token stream, so the
    corpus is tokenized once."""
    toks = (
        load_testdata(spark, sf_dir, "documents")
        .select(
            "doc_id",
            "lang",
            F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"),
        )
        .filter(F.col("tok") != "")
        .transform(tracked_persist)
    )
    wt = (
        toks.filter(F.col("doc_id") % 5 != 0)
        .groupBy(F.col("lang").alias("cls"), "tok")
        .agg(F.count("*").alias("n"))
        .select("cls", "tok", F.length(F.expr("bin(n)")).cast("bigint").alias("wt"))
    )
    # wt is one row per (class, token) — vocab-sized, grows ∝ corpus:
    # plain equi-join on tok (AQE broadcasts it while small; at web
    # scale it shuffles against the eval-split token stream).
    scored = (
        toks.filter(F.col("doc_id") % 5 == 0)
        .join(wt, "tok")
        .groupBy("doc_id", "lang", "cls")
        .agg(F.sum("wt").alias("score"))
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), "cls")
    return (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 1)
        .groupBy(F.col("lang").alias("actual"), F.col("cls").alias("predicted"))
        .agg(F.count("*").cast("bigint").alias("n_docs"))
        .orderBy("actual", "predicted")
    )


_SPAN8_POS = ", ".join(f"toks[pos+{j}]" for j in range(8))
_SPAN8_SPARK = ",".join(f"toks[i+{j}]" for j in range(-1, 7))


@register(
    "text_exact_substring_dedup",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    occ AS (
        SELECT doc_id, toks, unnest(generate_series(1, len(toks)-7)) AS pos
        FROM t WHERE len(toks) >= 8
    ),
    sp AS (SELECT doc_id, pos, concat_ws(' ', {_SPAN8_POS}) AS span FROM occ),
    g AS (SELECT span, COUNT(*) AS n,
                 MIN(struct_pack(d := doc_id, p := pos)) AS fk
          FROM sp GROUP BY span),
    rem AS (
        SELECT s.doc_id, s.pos FROM sp s JOIN g ON g.span = s.span
        WHERE g.n >= 2 AND NOT (s.doc_id = g.fk.d AND s.pos = g.fk.p)
    ),
    isl AS (
        SELECT doc_id, pos,
               SUM(CASE WHEN prev IS NULL OR pos > prev + 8 THEN 1 ELSE 0 END)
                   OVER (PARTITION BY doc_id ORDER BY pos
                         ROWS UNBOUNDED PRECEDING) AS island
        FROM (SELECT doc_id, pos,
                     lag(pos) OVER (PARTITION BY doc_id ORDER BY pos) AS prev
              FROM rem)
    ),
    iv AS (SELECT doc_id, island, MIN(pos) AS s, MAX(pos) + 7 AS e
           FROM isl GROUP BY doc_id, island),
    per_doc AS (SELECT doc_id, COUNT(*) AS n_iv, SUM(e - s + 1) AS n_rm
                FROM iv GROUP BY doc_id)
    SELECT CAST(c.doc_id AS BIGINT) AS doc_id,
           CAST(coalesce(p.n_iv, 0) AS BIGINT) AS n_remove_intervals,
           CAST(coalesce(p.n_rm, 0) AS BIGINT) AS tokens_removed,
           CAST(len(t2.toks) AS BIGINT) AS tokens_total,
           CAST((1000 * (len(t2.toks) - coalesce(p.n_rm, 0))) // len(t2.toks)
                AS BIGINT) AS kept_permille
    FROM corpus c JOIN t t2 ON t2.doc_id = c.doc_id
    LEFT JOIN per_doc p ON p.doc_id = c.doc_id
    ORDER BY doc_id
    """,
)
def text_exact_substring_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring deduplication plan (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better"): every 8-token span
    occurrence that repeats anywhere in the corpus is REMOVED except the
    globally first occurrence (min (doc_id, pos)), and per doc the
    surviving removal positions merge into maximal intervals — the exact
    token ranges a training pipeline would cut, with per-doc removal
    stats.  Unlike ``text_span_dup_stats`` (a per-doc profile over
    DISTINCT spans) this is position-level with keep-one semantics.

    Spark-first shape: span occurrences stream out of one INLINE
    generator explode (positions ride along); the span-frequency +
    first-occurrence aggregate and the probe side share the identical
    subtree, so Catalyst reuses one Exchange on the span hash.  The
    interval merge exploits fixed-length spans: removal intervals sorted
    by position have monotone ends, so one lag() compare (pos >
    prev + 8) starts a new island and a running sum numbers them — two
    narrow windows over only the REMOVED positions, partitioned by doc.
    Span identity travels as xxhash64 longs; the oracle groups raw
    strings, so a collision would fail the sf0.01 hash gate."""
    corpus = _dedup_corpus(spark, sf_dir)
    toks = corpus.select(
        "doc_id", F.split("text", X.TOKEN_RE).alias("toks")
    )
    sp = toks.filter(F.size("toks") >= 8).select(
        "doc_id",
        F.expr(
            "explode(transform(sequence(1, size(toks) - 7),"
            f" i -> struct(i AS pos, xxhash64(concat_ws(' ', {_SPAN8_SPARK})) AS h)))"
        ).alias("s"),
    ).select("doc_id", "s.pos", "s.h")
    # first occurrence = lexicographic MIN over (doc_id, pos) structs —
    # collision-free for any doc length, unlike an arithmetic
    # doc_id*K + pos encoding (review finding: K bounds token count)
    g = sp.groupBy("h").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(F.struct(F.col("doc_id"), F.col("pos"))).alias("fk"),
    )
    rem = (
        sp.join(g, "h")
        .filter(
            (F.col("n") >= 2)
            & ~((F.col("doc_id") == F.col("fk.doc_id")) & (F.col("pos") == F.col("fk.pos")))
        )
        .select("doc_id", "pos")
    )
    w = Window.partitionBy("doc_id").orderBy("pos")
    isl = (
        rem.withColumn("prev", F.lag("pos").over(w))
        .withColumn(
            "new_isl",
            F.when(
                F.col("prev").isNull() | (F.col("pos") > F.col("prev") + 8), 1
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_isl").over(w.rowsBetween(Window.unboundedPreceding, 0)),
        )
    )
    iv = isl.groupBy("doc_id", "island").agg(
        F.min("pos").alias("s"), (F.max("pos") + 7).alias("e")
    )
    per_doc = iv.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_iv"), F.sum(F.col("e") - F.col("s") + 1).alias("n_rm")
    )
    return (
        toks.select("doc_id", F.size("toks").alias("n_toks"))
        .join(per_doc, "doc_id", "left")
        .select(
            F.col("doc_id").cast("bigint"),
            F.coalesce("n_iv", F.lit(0)).cast("bigint").alias("n_remove_intervals"),
            F.coalesce("n_rm", F.lit(0)).cast("bigint").alias("tokens_removed"),
            F.col("n_toks").cast("bigint").alias("tokens_total"),
            F.expr("div(1000 * (n_toks - coalesce(n_rm, 0)), n_toks)")
            .cast("bigint")
            .alias("kept_permille"),
        )
        .orderBy("doc_id")
    )


@register(
    "interval_overlap_sweep",
    """
    WITH iv0 AS (
        SELECT l_suppkey AS s,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01' AS BIGINT) AS st,
               CAST(CAST(l_shipdate AS DATE) - DATE '1970-01-01'
                    + 1 + CAST(l_quantity AS INTEGER) % 14 AS BIGINT) AS en
        FROM lineitem
    ),
    -- pairing id must be unique PER ROW (the synthetic lineitem is not
    -- unique on (orderkey, linenumber) — duplicate interval instances
    -- are distinct intervals and their pairs count)
    iv AS (SELECT s, st, en,
                  ROW_NUMBER() OVER (PARTITION BY s ORDER BY st, en) AS rid
           FROM iv0),
    pairs AS (
        SELECT a.s, COUNT(*) AS n_pairs
        FROM iv a JOIN iv b
          ON a.s = b.s AND a.rid < b.rid AND a.st < b.en AND b.st < a.en
        GROUP BY a.s
    ),
    per AS (SELECT s, COUNT(*) AS n_intervals FROM iv GROUP BY s)
    SELECT CAST(per.s AS BIGINT) AS suppkey,
           CAST(per.n_intervals AS BIGINT) AS n_intervals,
           CAST(coalesce(pairs.n_pairs, 0) AS BIGINT) AS n_overlapping_pairs
    FROM per LEFT JOIN pairs ON pairs.s = per.s
    ORDER BY suppkey
    """,
)
def interval_overlap_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap counting via a boundary SWEEP — the O(n log n)
    distributed form of a problem users reach for an O(n²) non-equi
    self-join to solve.  Shipment busy-intervals per supplier
    ([shipdate, shipdate + 1 + quantity%14 days), half-open), counting
    per supplier how many pairs of its shipments overlap in time.

    Sweep formulation: each interval contributes a (+1 at start, −1 at
    end) boundary row; within a supplier, boundaries sort by (t, delta)
    so ends release before same-day starts (half-open semantics), and a
    running sum gives the number of intervals active at each start —
    summing (active − 1) over start events counts every overlapping
    pair exactly once.  Tied starts see each other cumulatively, so the
    per-supplier SUM is order-invariant under any tie order.  One
    window per supplier over 2n rows replaces the Σ n² self-join the
    ORACLE runs — the oracle being brute force is the point: two
    formulations, one answer.  At 100 TB the sweep shuffles each fact
    row twice (boundary explode) and sorts within supplier partitions —
    linear-log work, no pair blowup.  Algorithm lives in
    ``operators.sweeps.interval_overlap_counts`` (property-tested
    against Python brute force on random intervals)."""
    from .operators.sweeps import interval_overlap_counts

    li = load_testdata(spark, sf_dir, "lineitem")
    iv = li.select(
        F.col("l_suppkey").alias("s"),
        F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
        .cast("bigint")
        .alias("st"),
        (
            F.datediff(F.to_date("l_shipdate"), F.lit("1970-01-01").cast("date"))
            + 1
            + F.col("l_quantity").cast("int") % 14
        )
        .cast("bigint")
        .alias("en"),
    )
    return (
        interval_overlap_counts(iv, "s", "st", "en")
        .select(
            F.col("s").cast("bigint").alias("suppkey"),
            F.col("n_intervals").cast("bigint"),
            F.col("n_overlapping_pairs").cast("bigint"),
        )
        .orderBy("suppkey")
    )


@register(
    "tokens_heavy_hitters_cms",
    r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(lower(text), '\s+')) AS tok
        FROM documents
    ),
    tok2 AS (SELECT tok FROM tok WHERE tok <> ''),
    exact AS (
        SELECT tok, CAST(COUNT(*) AS BIGINT) AS n FROM tok2 GROUP BY tok
        ORDER BY n DESC, tok LIMIT 20
    ),
    rows0 AS (SELECT unnest([0, 1, 2, 3]) AS seed),
    cells AS (
        SELECT r.seed,
               substr(md5(concat('cms', r.seed, ':', t.tok)), 1, 3) AS bucket,
               COUNT(*) AS cnt
        FROM tok2 t CROSS JOIN rows0 r
        GROUP BY r.seed, substr(md5(concat('cms', r.seed, ':', t.tok)), 1, 3)
    ),
    est AS (
        SELECT e.tok, e.n, MIN(c.cnt) AS cms_n
        FROM exact e
        JOIN rows0 r ON TRUE
        JOIN cells c ON c.seed = r.seed
                    AND c.bucket = substr(md5(concat('cms', r.seed, ':', e.tok)), 1, 3)
        GROUP BY e.tok, e.n
    )
    SELECT tok, n, CAST(cms_n AS BIGINT) AS cms_n,
           CAST(cms_n - n AS BIGINT) AS overcount
    FROM est
    ORDER BY n DESC, tok
    """,
)
def tokens_heavy_hitters_cms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min Sketch heavy hitters (Cormode & Muthukrishnan 2005) —
    the fixed-memory frequency sketch a streaming/telemetry pipeline
    keeps instead of a full count table: d=4 hash rows × 4096 buckets
    (md5-hex prefix buckets, portable across engines), point estimate =
    min over rows, verified here against the exact top-20 token counts
    (``overcount`` = cms_n − n ≥ 0 always; collisions only ever
    overestimate).

    Scale shape: the sketch build is ONE map-side-combined aggregate
    over (seed, bucket) — at most d·4096 cells regardless of corpus
    size (the whole point); the estimate probe broadcasts 20·d cell
    keys.  Everything is deterministic (seeded md5), so the sketch is
    exactly replayable by the oracle — an APPROXIMATE structure with an
    EXACT differential gate, unlike ``approx_distinct_stats`` whose HLL
    internals are engine-private (rows-only)."""
    toks = (
        load_testdata(spark, sf_dir, "documents")
        .select(F.explode(F.split(F.lower("text"), r"\s+")).alias("tok"))
        .filter(F.col("tok") != "")
        .transform(tracked_persist)
    )
    exact = (
        toks.groupBy("tok")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "tok")
        .limit(20)
    )
    seeds = spark.range(4).select(F.col("id").cast("int").alias("seed"))

    def bucket(tok_col, seed_col):
        return F.substring(
            F.md5(
                F.concat(
                    F.lit("cms"), seed_col.cast("string"), F.lit(":"), tok_col
                ).cast("binary")
            ),
            1,
            3,
        )

    cells = (
        toks.crossJoin(F.broadcast(seeds))
        .groupBy("seed", bucket(F.col("tok"), F.col("seed")).alias("bucket"))
        .agg(F.count("*").alias("cnt"))
    )
    probes = exact.crossJoin(F.broadcast(seeds)).select(
        "tok", "n", "seed", bucket(F.col("tok"), F.col("seed")).alias("bucket")
    )
    return (
        probes.join(F.broadcast(cells), ["seed", "bucket"])
        .groupBy("tok", "n")
        .agg(F.min("cnt").alias("cms_n"))
        .select(
            "tok",
            F.col("n").cast("bigint"),
            F.col("cms_n").cast("bigint"),
            (F.col("cms_n") - F.col("n")).cast("bigint").alias("overcount"),
        )
        .orderBy(F.desc("n"), "tok")
    )


@register(
    "approx_distinct_kmv",
    """
    WITH pairs AS (
        SELECT DISTINCT event_type, user_id FROM events
    ),
    hashed AS (
        SELECT event_type, md5(CAST(user_id AS VARCHAR)) AS h FROM pairs
    ),
    ranked AS (
        SELECT event_type, h,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY h) AS rk
        FROM hashed
    ),
    kth AS (SELECT event_type, h AS h64 FROM ranked WHERE rk = 64),
    exact AS (SELECT event_type, CAST(COUNT(*) AS BIGINT) AS exact_distinct
              FROM pairs GROUP BY event_type)
    SELECT e.event_type AS event_type, e.exact_distinct,
           CAST(CASE WHEN k.h64 IS NULL THEN e.exact_distinct
                ELSE (63 * 4294967296)
                     // greatest(CAST(concat('0x', substr(k.h64, 1, 8)) AS BIGINT), 1)
                END AS BIGINT) AS kmv_estimate,
           CAST(CASE WHEN k.h64 IS NULL THEN 0
                ELSE (1000 * abs((63 * 4294967296)
                     // greatest(CAST(concat('0x', substr(k.h64, 1, 8)) AS BIGINT), 1)
                     - e.exact_distinct)) // e.exact_distinct END AS BIGINT)
               AS err_permille
    FROM exact e LEFT JOIN kth k ON k.event_type = e.event_type
    ORDER BY event_type
    """,
)
def approx_distinct_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """K-minimum-values distinct-count sketch (Bar-Yossef et al. 2002)
    — the deterministic cousin of HLL: hash every (event_type, user)
    once, keep the k=64 smallest hashes per group, and estimate
    |distinct| = (k−1) / h_(k) with h_(k) read as a 2³²-scaled integer
    fraction of its first 8 md5 hex chars.  Groups with fewer than k
    members fall back to the exact count (standard KMV).  Every step is
    integer/md5-deterministic, so unlike ``approx_distinct_stats``
    (HLL, engine-private internals, rows-only) this sketch has an EXACT
    DuckDB oracle — the approximate-distinct family's differential
    gate, with ``err_permille`` showing the sketch error against the
    exact count it sits next to.

    Scale shape: one distinct (shuffle on the pair), one md5 map, then
    a per-group sort to rank the k smallest (fixed-width hex ⇒ lexical
    = numeric order).  At 100 TB the refinement is partial top-k per
    map task before the merge; the estimate itself only ever moves k
    hashes per group."""
    pairs = (
        load_testdata(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .transform(tracked_persist)
    )
    hashed = pairs.select(
        "event_type", F.md5(F.col("user_id").cast("string").cast("binary")).alias("h")
    )
    w = Window.partitionBy("event_type").orderBy("h")
    kth = (
        hashed.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") == 64)
        .select("event_type", F.col("h").alias("h64"))
    )
    exact = pairs.groupBy("event_type").agg(
        F.count("*").cast("bigint").alias("exact_distinct")
    )
    hexval = F.greatest(
        F.conv(F.substring("h64", 1, 8), 16, 10).cast("bigint"), F.lit(1)
    )
    # integer floor division via div() to match DuckDB's //
    return (
        exact.join(F.broadcast(kth), "event_type", "left")
        .withColumn("hexval", hexval)
        .withColumn(
            "kmv_estimate",
            F.when(F.col("h64").isNull(), F.col("exact_distinct")).otherwise(
                F.expr("div(63 * 4294967296, hexval)")
            ).cast("bigint"),
        )
        .withColumn(
            "err_permille",
            F.when(F.col("h64").isNull(), F.lit(0)).otherwise(
                F.expr(
                    "div(1000 * abs(div(63 * 4294967296, hexval) - exact_distinct),"
                    " exact_distinct)"
                )
            ).cast("bigint"),
        )
        .select("event_type", "exact_distinct", "kmv_estimate", "err_permille")
        .orderBy("event_type")
    )


@register(
    "events_distribution_drift",
    """
    WITH span AS (
        SELECT (epoch_us(MIN(ts)) + epoch_us(MAX(ts))) // 2 AS mid FROM events
    ),
    ev AS (
        SELECT value, CASE WHEN epoch_us(ts) < mid THEN 0 ELSE 1 END AS win
        FROM events, span
    ),
    bounds AS (
        SELECT quantile_cont(value, [0.1,0.2,0.3,0.4,0.5,0.6,0.7,0.8,0.9]) AS bs
        FROM ev WHERE win = 0
    ),
    bucketed AS (
        SELECT win, len(list_filter(bs, b -> b <= value)) AS bucket
        FROM ev, bounds
    ),
    cnt AS (
        SELECT bucket, win, COUNT(*) AS n FROM bucketed GROUP BY bucket, win
    ),
    tot AS (SELECT win, COUNT(*) AS t FROM bucketed GROUP BY win),
    grid AS (SELECT unnest(range(0, 10)) AS bucket),
    wide AS (
        SELECT g.bucket,
               coalesce(MAX(CASE WHEN c.win = 0 THEN c.n END), 0) AS n_a,
               coalesce(MAX(CASE WHEN c.win = 1 THEN c.n END), 0) AS n_b
        FROM grid g LEFT JOIN cnt c ON c.bucket = g.bucket
        GROUP BY g.bucket
    )
    SELECT CAST(w.bucket AS INTEGER) AS bucket,
           CAST(w.n_a AS BIGINT) AS n_a, CAST(w.n_b AS BIGINT) AS n_b,
           CAST((1000 * w.n_a) // ta.t AS BIGINT) AS p_a_permille,
           CAST((1000 * w.n_b) // tb.t AS BIGINT) AS p_b_permille,
           CAST(abs((1000 * w.n_a) // ta.t - (1000 * w.n_b) // tb.t) AS BIGINT)
               AS drift_permille
    FROM wide w,
         (SELECT t FROM tot WHERE win = 0) ta,
         (SELECT t FROM tot WHERE win = 1) tb
    ORDER BY bucket
    """,
)
def events_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor between two time halves of the event
    stream — the data-mixture drift check a training pipeline runs
    between crawl snapshots (PSI's role, but as total-variation
    distance in integer permille: PSI's ln() would hash-differ across
    libm builds).  Reference window A = first half by event time;
    deciles of A's value distribution (exact interpolating percentile —
    the ``price_percentiles`` parity recipe) bucket BOTH windows, and
    per-bucket share deltas expose where the distribution moved.

    Scale shape: one scalar (min,max) aggregate broadcasts the time
    midpoint; the decile boundary row broadcasts to the bucketing scan
    (10-element literal-array filter per row, branch-free); histogram =
    one map-side-combined groupBy over ≤ 20 (bucket, win) cells.  The
    exact percentile over window A is the one sort — swap in
    approx_percentile at 100 TB if boundary exactness stops mattering
    before the sort does."""
    ev0 = load_testdata(spark, sf_dir, "events").select("ts", "value")
    span = ev0.agg(
        F.expr("div(unix_micros(min(ts)) + unix_micros(max(ts)), 2)").alias("mid")
    )
    ev = (
        ev0.crossJoin(F.broadcast(span))
        .select(
            "value",
            F.when(F.expr("unix_micros(ts)") < F.col("mid"), 0)
            .otherwise(1)
            .alias("win"),
        )
        .transform(tracked_persist)
    )
    bounds = ev.filter(F.col("win") == 0).agg(
        F.expr(
            "percentile(value, array(0.1D,0.2D,0.3D,0.4D,0.5D,0.6D,0.7D,0.8D,0.9D))"
        ).alias("bs")
    )
    bucketed = ev.crossJoin(F.broadcast(bounds)).select(
        "win",
        F.size(F.filter(F.col("bs"), lambda b: b <= F.col("value"))).alias("bucket"),
    )
    cnt = bucketed.groupBy("bucket", "win").agg(F.count("*").alias("n"))
    tot = bucketed.groupBy("win").agg(F.count("*").alias("t"))
    grid = spark.range(10).select(F.col("id").cast("int").alias("bucket"))
    wide = (
        grid.join(cnt, "bucket", "left")
        .groupBy("bucket")
        .agg(
            F.coalesce(F.max(F.when(F.col("win") == 0, F.col("n"))), F.lit(0)).alias("n_a"),
            F.coalesce(F.max(F.when(F.col("win") == 1, F.col("n"))), F.lit(0)).alias("n_b"),
        )
    )
    ta = tot.filter(F.col("win") == 0).select(F.col("t").alias("ta"))
    tb = tot.filter(F.col("win") == 1).select(F.col("t").alias("tb"))
    return (
        wide.crossJoin(F.broadcast(ta))
        .crossJoin(F.broadcast(tb))
        .select(
            F.col("bucket").cast("int"),
            F.col("n_a").cast("bigint"),
            F.col("n_b").cast("bigint"),
            F.expr("div(1000 * n_a, ta)").cast("bigint").alias("p_a_permille"),
            F.expr("div(1000 * n_b, tb)").cast("bigint").alias("p_b_permille"),
            F.abs(F.expr("div(1000 * n_a, ta) - div(1000 * n_b, tb)"))
            .cast("bigint")
            .alias("drift_permille"),
        )
        .orderBy("bucket")
    )


@register(
    "pipeline_split_train_val_test",
    r"""
    WITH d AS (
        SELECT doc_id, lang,
               CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 4))
                    AS BIGINT) AS hv,
               len(string_split_regex(text, '\s+')) AS n_toks
        FROM documents
    ),
    tagged AS (
        SELECT lang,
               CASE WHEN hv < 58982 THEN 'train'
                    WHEN hv < 62258 THEN 'val'
                    ELSE 'test' END AS split,
               n_toks
        FROM d
    )
    SELECT lang, split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS n_tokens
    FROM tagged
    GROUP BY lang, split
    ORDER BY lang, split
    """,
)
def pipeline_split_train_val_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 90/5/5 train/val/test split — hash-of-id
    thresholds (md5 16-bit prefix: train < 0.9·2¹⁶ = 58982, val <
    0.95·2¹⁶ = 62258), so membership is a pure function of doc_id:
    stable under re-runs, additions, and repartitioning — the property
    random() splits lack and the reason leakage audits can re-derive
    any doc's split offline.  Output: per-(lang, split) doc/token
    stats, the table you eyeball to confirm the split is stratified
    enough before training.

    Scale shape: one map-side hash + one bounded groupBy — nothing
    else."""
    docs = load_testdata(spark, sf_dir, "documents")
    hv = F.conv(
        F.substring(
            F.md5(F.concat(F.lit("split:"), F.col("doc_id").cast("string")).cast("binary")),
            1,
            4,
        ),
        16,
        10,
    ).cast("bigint")
    tagged = docs.select(
        "lang",
        F.when(hv < 58982, "train").when(hv < 62258, "val").otherwise("test").alias("split"),
        F.size(F.split("text", r"\s+")).alias("n_toks"),
    )
    return (
        tagged.groupBy("lang", "split")
        .agg(
            F.count("*").cast("bigint").alias("n_docs"),
            F.sum("n_toks").cast("bigint").alias("n_tokens"),
        )
        .orderBy("lang", "split")
    )


@register(
    "sample_domain_quota",
    r"""
    WITH d AS (
        SELECT doc_id, source,
               md5(concat('quota:', doc_id)) AS pri,
               len(string_split_regex(text, '\s+')) AS n_toks
        FROM documents
    ),
    ranked AS (
        SELECT source, n_toks,
               ROW_NUMBER() OVER (PARTITION BY source ORDER BY pri, doc_id) AS rk
        FROM d
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_total,
           CAST(SUM(CASE WHEN rk <= 15 THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN rk <= 15 THEN n_toks ELSE 0 END) AS BIGINT)
               AS kept_tokens
    FROM ranked
    GROUP BY source
    ORDER BY source
    """,
)
def sample_domain_quota(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-domain quota capping (RefinedWeb §3.2 caps any single
    domain's contribution): each source keeps at most 15 documents,
    chosen by deterministic hash priority (md5, doc_id tiebreak) so the
    survivors are a stable pseudo-random sample — re-running or
    re-sharding the corpus keeps the same docs.  Output: per-source
    total vs kept with kept token mass.

    Scale shape: rank-within-group via a window partitioned on the
    domain — the partition IS the bounded unit (a domain too large for
    one task's sort is past any sane quota anyway, and WindowGroupLimit
    pushes the rk ≤ quota cut into the per-partition sort)."""
    docs = load_testdata(spark, sf_dir, "documents")
    d = docs.select(
        "doc_id",
        "source",
        F.md5(F.concat(F.lit("quota:"), F.col("doc_id").cast("string")).cast("binary")).alias("pri"),
        F.size(F.split("text", r"\s+")).alias("n_toks"),
    )
    w = Window.partitionBy("source").orderBy("pri", "doc_id")
    ranked = d.withColumn("rk", F.row_number().over(w))
    return (
        ranked.groupBy("source")
        .agg(
            F.count("*").cast("bigint").alias("n_total"),
            F.sum(F.when(F.col("rk") <= 15, 1).otherwise(0))
            .cast("bigint")
            .alias("n_kept"),
            F.sum(F.when(F.col("rk") <= 15, F.col("n_toks")).otherwise(0))
            .cast("bigint")
            .alias("kept_tokens"),
        )
        .orderBy("source")
    )


@register(
    "similarity_ann_lsh_multiprobe",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM embeddings
    ),
    probes AS (
        SELECT vec_id, v, nrm,
               CASE WHEN i = 0 THEN bkt
                    ELSE substr(bkt, 1, i - 1)
                         || (CASE substr(bkt, i, 1) WHEN '1' THEN '0' ELSE '1' END)
                         || substr(bkt, i + 1)
               END AS pbkt
        FROM n, (SELECT unnest([0, 1, 2, 3, 4]) AS i)
        WHERE vec_id < 10
    ),
    scored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM probes q JOIN n c ON q.pbkt = c.bkt AND c.vec_id != q.vec_id
    ),
    ranked AS (
        SELECT query_id, neighbor_id, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_ann_lsh_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-probe sign-LSH (Lv et al. 2007): each query searches its
    own bucket PLUS the four 1-bit-flip neighbor buckets — the standard
    recall lever that costs probes, not index memory (the alternative,
    more hash tables, multiplies stored signatures).  A near-dup that
    straddles one coordinate hyperplane — the miss class of
    ``similarity_ann_sign_lsh`` — is recovered here; only multi-bit
    straddles remain unseen.

    Scale shape: the probe set explodes QUERY-side only (5 rows per
    query, broadcast); candidates stay an equi-join on the bucket id,
    and the 5 probe buckets are distinct so no candidate is scored
    twice.  Corpus-side cost is identical to single-probe."""
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).withColumn(
        "bkt", S.sign_bucket("embedding", bits=4)
    )

    def flip(i: int):
        return F.concat(
            F.substring("qbkt", 1, i - 1),
            F.when(F.substring("qbkt", i, 1) == "1", "0").otherwise("1"),
            F.substring("qbkt", i + 1, 4 - i),
        )

    q = emb.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
        F.col("bkt").alias("qbkt"),
    )
    qp = q.select(
        "query_id", "qv", "qn",
        F.explode(F.array(F.col("qbkt"), *[flip(i) for i in range(1, 5)])).alias("pbkt"),
    )
    c = emb.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"),
        "bkt",
    )
    scored = c.join(
        F.broadcast(qp),
        (F.col("pbkt") == F.col("bkt")) & (F.col("query_id") != F.col("neighbor_id")),
    ).withColumn("cos_raw", S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("neighbor_id").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "ann_recall_multiprobe",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm,
               (CASE WHEN embedding[1] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[2] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[3] >= 0 THEN '1' ELSE '0' END) ||
               (CASE WHEN embedding[4] >= 0 THEN '1' ELSE '0' END) AS bkt
        FROM embeddings
    ),
    q AS (SELECT * FROM n WHERE vec_id < 20),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CASE WHEN (CASE WHEN substr(q.bkt,1,1) != substr(c.bkt,1,1) THEN 1 ELSE 0 END)
                       + (CASE WHEN substr(q.bkt,2,1) != substr(c.bkt,2,1) THEN 1 ELSE 0 END)
                       + (CASE WHEN substr(q.bkt,3,1) != substr(c.bkt,3,1) THEN 1 ELSE 0 END)
                       + (CASE WHEN substr(q.bkt,4,1) != substr(c.bkt,4,1) THEN 1 ELSE 0 END)
                       <= 1 THEN 1 ELSE 0 END AS hit,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                            c.vec_id) AS rk
        FROM q JOIN n c ON c.vec_id != q.vec_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(SUM(hit) AS BIGINT) AS n_hit,
           CAST((1000 * SUM(hit)) // 5 AS BIGINT) AS recall_permille
    FROM pairs WHERE rk <= 5
    GROUP BY query_id
    ORDER BY query_id
    """,
)
def ann_recall_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the MULTI-PROBE sign-LSH candidate set against exact
    brute-force top-5 (VERDICT r4 "Next" #7) — calibrates
    ``similarity_ann_lsh_multiprobe``'s probe count the same way
    ``ann_recall_at_k`` gates the single-probe index.  A brute-top-5
    pair is a multiprobe candidate iff the two 4-bit sign buckets differ
    in at most ONE position (own bucket + the four 1-bit flips), so the
    retrieved flag is a per-pair Hamming test riding the exact-ranking
    join — one scoring pass, no second scan, no candidate
    materialization.  Comparing this query's recall against
    ``ann_recall_at_k`` measures exactly what the extra 4 probes buy."""
    from pyspark.sql import Window

    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).withColumn(
        "bkt", S.sign_bucket("embedding", bits=4)
    )
    n = emb.select(
        "vec_id", F.col("_v").alias("v"), F.col("_norm").alias("nrm"), "bkt"
    )
    q = n.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("bkt").alias("qbkt"),
    )
    cos = S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    ham = sum(
        (F.substring("qbkt", i, 1) != F.substring("bkt", i, 1)).cast("int")
        for i in range(1, 5)
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    pairs = (
        n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id", cos.alias("cos"),
            (ham <= 1).cast("int").alias("hit"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    hits = pairs.groupBy("query_id").agg(F.sum("hit").cast("bigint").alias("n_hit"))
    return hits.select(
        F.col("query_id").cast("bigint"),
        "n_hit",
        F.expr("div(1000 * n_hit, 5)").cast("bigint").alias("recall_permille"),
    ).orderBy("query_id")


def _ivf_recall_oracle_sql() -> str:
    """DuckDB twin of ``ann_recall_ivf``: replay the trained coarse
    cells (``_kmeans_cells_cte``), rank exact cosine top-5 per query,
    and flag each truth pair retrieved ⇔ same cell (nprobe=1)."""
    return _kmeans_cells_cte() + """,
    nn AS (SELECT c.vec_id, e.v, e.nrm, c.cluster
           FROM cells c JOIN e ON e.vec_id = c.vec_id),
    q AS (SELECT * FROM nn WHERE vec_id < 20),
    pairs AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               CASE WHEN q.cluster = c.cluster THEN 1 ELSE 0 END AS hit,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                            c.vec_id) AS rk
        FROM q JOIN nn c ON c.vec_id != q.vec_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(SUM(hit) AS BIGINT) AS n_hit,
           CAST((1000 * SUM(hit)) // 5 AS BIGINT) AS recall_permille
    FROM pairs WHERE rk <= 5
    GROUP BY query_id
    ORDER BY query_id
    """


@register("ann_recall_ivf", _ivf_recall_oracle_sql())
def ann_recall_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall@5 of the TRAINED-IVF candidate set (nprobe=1) against
    exact brute-force top-5 — completes the recall-gate family across
    the index tiers (sign-LSH single-probe ``ann_recall_at_k``,
    multiprobe ``ann_recall_multiprobe``, and now the k-means coarse
    quantizer behind ``similarity_ann_ivf_kmeans`` / the IVF-PQ
    composite).  A brute-top-5 pair is retrieved iff both vectors
    landed in the SAME trained cell, so the flag rides the exact
    ranking join — one scoring pass over the cells frame, which is
    already persisted and shared with the index queries themselves.
    Cell-routing recall also upper-bounds IVF-PQ recall (ADC error
    perturbs ranking, not candidacy), so this one gate calibrates both
    cell-restricted tiers."""
    from pyspark.sql import Window

    cells = _sq8_kmeans_cells(spark, sf_dir, k=8, iters=3)
    nn = cells.select("vec_id", "v", F.col("nrm"), "cluster")
    q = nn.filter(F.col("vec_id") < 20).select(
        F.col("vec_id").alias("query_id"), F.col("v").alias("qv"),
        F.col("nrm").alias("qn"), F.col("cluster").alias("qcl"),
    )
    cos = S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
    w = Window.partitionBy("query_id").orderBy(F.col("cos").desc(), F.col("vec_id"))
    pairs = (
        nn.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
        .select(
            "query_id", "vec_id", cos.alias("cos"),
            (F.col("qcl") == F.col("cluster")).cast("int").alias("hit"),
        )
        .withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
    )
    hits = pairs.groupBy("query_id").agg(F.sum("hit").cast("bigint").alias("n_hit"))
    return hits.select(
        F.col("query_id").cast("bigint"),
        "n_hit",
        F.expr("div(1000 * n_hit, 5)").cast("bigint").alias("recall_permille"),
    ).orderBy("query_id")


def _bpe_encode_oracle_sql(rounds: int = 4, vocab: int = 2000) -> str:
    """DuckDB twin of ``vocab_bpe_encode``: the shared training chain,
    then the SAME per-round apply blocks over ALL distinct words (u
    chain) — training is frequency-capped, encoding is not — and
    per-doc token accounting."""
    parts = [_bpe_train_ctes(rounds, vocab)]
    parts.append(""",
    u0 AS (SELECT word, freq,
                  list_append(list_transform(generate_series(1, length(word)),
                                             i -> substr(word, i, 1)), '</w>') AS syms
           FROM wall)""")
    for r in range(1, rounds + 1):
        parts.append(_bpe_apply_sql(f"u{r - 1}", f"u{r}", f"m{r}", f"uf{r}"))
    parts.append(rf""",
    enc AS (SELECT word, len(syms) AS n_syms FROM u{rounds}),
    tokd AS (SELECT doc_id,
                    unnest(string_split_regex(lower(text), '\s+')) AS word
             FROM documents),
    tokd2 AS (SELECT * FROM tokd WHERE word <> '')
    SELECT CAST(t.doc_id AS BIGINT) AS doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_words,
           CAST(SUM(e.n_syms) AS BIGINT) AS n_bpe_tokens,
           CAST((1000 * SUM(e.n_syms)) // COUNT(*) AS BIGINT)
               AS bpe_per_word_permille
    FROM tokd2 t JOIN enc e ON e.word = t.word
    GROUP BY t.doc_id
    ORDER BY doc_id
    """)
    return "".join(parts)


@register("vocab_bpe_encode", _bpe_encode_oracle_sql())
def vocab_bpe_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Apply the learned BPE merges to the corpus — the other half of
    the tokenizer lifecycle (``vocab_bpe_merges`` trains; this
    encodes): every DISTINCT word is folded through the 4 merges (train
    is frequency-capped at 2000 forms, encoding is not — OOV forms
    still merge wherever the learned pairs appear), then per document
    the word stream joins the word→symbol-count table to give BPE token
    counts and the tokens-per-word ratio a pipeline budgets context
    length with.

    Scale shape: encoding cost is the DISTINCT-WORD table (bounded,
    Zipf), not the token stream — the stream only does a broadcast join
    against word→count.  The per-word fold is the same ANSI-safe
    F.aggregate as training."""
    toks = (
        load_testdata(spark, sf_dir, "documents")
        .select("doc_id", F.explode(F.split(F.lower("text"), r"\s+")).alias("word"))
        .filter(F.col("word") != "")
        .transform(tracked_persist)
    )
    merges = _bpe_train(spark, sf_dir, words=toks.select("word"))
    allwords = toks.select("word").distinct().withColumn("syms", F.expr(_BPE_SYMS0))
    for _, x, y, _, _ in merges:
        allwords = allwords.withColumn("syms", _bpe_merge_fold(x, y))
    enc = allwords.select("word", F.size("syms").alias("n_syms"))
    # enc is one row per DISTINCT word — vocab-sized, grows ∝ corpus:
    # plain equi-join on word (AQE still broadcasts it at small SF; at
    # web scale it must shuffle against the token stream).
    return (
        toks.join(enc, "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("bigint").alias("n_words"),
            F.sum("n_syms").cast("bigint").alias("n_bpe_tokens"),
        )
        .select(
            F.col("doc_id").cast("bigint"),
            "n_words",
            "n_bpe_tokens",
            F.expr("div(1000 * n_bpe_tokens, n_words)")
            .cast("bigint")
            .alias("bpe_per_word_permille"),
        )
        .orderBy("doc_id")
    )


@register(
    "market_basket_pairs",
    """
    WITH items AS (
        SELECT DISTINCT l_orderkey AS okey, l_partkey AS part FROM lineitem
    ),
    pairs AS (
        SELECT a.part AS part_a, b.part AS part_b, COUNT(*) AS n_orders
        FROM items a JOIN items b ON a.okey = b.okey AND a.part < b.part
        GROUP BY a.part, b.part
    )
    SELECT CAST(part_a AS BIGINT) AS part_a, CAST(part_b AS BIGINT) AS part_b,
           CAST(n_orders AS BIGINT) AS n_orders
    FROM pairs
    ORDER BY n_orders DESC, part_a, part_b
    LIMIT 25
    """,
)
def market_basket_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket pair mining: which part pairs co-occur in the most
    orders.  The pair join is SELF-BOUNDED: it equi-joins on the order
    key, so work is Σ basket² with baskets capped at ~7 lineitems — the
    canonical "pair explosion that isn't" (contrast the unbounded
    cross join this query replaces in naive form).  DISTINCT first so
    duplicate part lines don't inflate counts; the top-25 is a
    distributed TakeOrderedAndProject."""
    items = (
        load_testdata(spark, sf_dir, "lineitem")
        .select(F.col("l_orderkey").alias("okey"), F.col("l_partkey").alias("part"))
        .distinct()
    )
    a = items.select("okey", F.col("part").alias("part_a"))
    b = items.select(F.col("okey").alias("okey_b"), F.col("part").alias("part_b"))
    return (
        a.join(b, (F.col("okey") == F.col("okey_b")) & (F.col("part_a") < F.col("part_b")))
        .groupBy("part_a", "part_b")
        .agg(F.count("*").alias("n_orders"))
        .select(
            F.col("part_a").cast("bigint"),
            F.col("part_b").cast("bigint"),
            F.col("n_orders").cast("bigint"),
        )
        .orderBy(F.desc("n_orders"), "part_a", "part_b")
        .limit(25)
    )


@register(
    "events_transition_matrix",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lag(event_type) OVER (PARTITION BY user_id
                   ORDER BY ts, event_id) AS prev
        FROM events
    ),
    trans AS (
        SELECT prev, event_type AS next, COUNT(*) AS n
        FROM seq WHERE prev IS NOT NULL
        GROUP BY prev, event_type
    ),
    tot AS (SELECT prev, SUM(n) AS t FROM trans GROUP BY prev)
    SELECT tr.prev AS prev, tr.next AS next, CAST(tr.n AS BIGINT) AS n,
           CAST((1000 * tr.n) // tot.t AS BIGINT) AS p_permille
    FROM trans tr JOIN tot ON tot.prev = tr.prev
    ORDER BY tr.prev, tr.next
    """,
)
def events_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event
    sequences — the session-flow fingerprint (what follows a `view`?
    how often does `error` repeat?).  One lag window per user (ties
    broken by event_id so the sequence is deterministic), one bounded
    groupBy (|event types|² cells), integer permille probabilities.

    Scale shape: the window partitions on user_id — the natural
    key-bounded unit — and everything after is a ≤25-row aggregate."""
    ev = load_testdata(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lag("event_type").over(w).alias("prev")
    ).filter(F.col("prev").isNotNull())
    trans = seq.groupBy("prev", F.col("event_type").alias("next")).agg(
        F.count("*").alias("n")
    )
    tot = trans.groupBy("prev").agg(F.sum("n").alias("t"))
    return (
        trans.join(tot, "prev")
        .select(
            "prev",
            "next",
            F.col("n").cast("bigint"),
            F.expr("div(1000 * n, t)").cast("bigint").alias("p_permille"),
        )
        .orderBy("prev", "next")
    )


# Exact-truth LSH recall: DEMOTED from the registered surface in round 5
# (VERDICT r4 "Next" #9) — its ground truth is the Σ bucket² posting-list
# join, which is the sf-bounded calibration shape, not the 100 TB path.
# The registered estimator is ``dedup_lsh_recall_sampled``; this exact
# variant stays as a library function with its DuckDB twin below, gated
# by ``tests/test_extensions.py::test_lsh_recall_exact_matches_oracle``.
DEDUP_LSH_RECALL_EXACT_ORACLE_SQL = f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    sz AS (SELECT doc_id, COUNT(*) AS n FROM sh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM sh a JOIN sh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT i.id_a, i.id_b
        FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                     JOIN sz sb ON sb.doc_id = i.id_b
        WHERE (1000 * i.c) // (sa.n + sb.n - i.c) >= 500
    ),
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    hit AS (
        SELECT t.id_a FROM truth t JOIN cand c
            ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth,
           CAST((SELECT COUNT(*) FROM cand) AS BIGINT) AS n_candidates,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit,
           CAST((1000 * (SELECT COUNT(*) FROM hit))
                // greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT)
               AS recall_permille
    """


def dedup_lsh_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall of the MinHash-LSH candidate generator against exact
    ground truth — the measurement a pipeline owner runs before
    trusting banding parameters: ground truth = all pairs with exact
    shingle Jaccard ≥ 0.5, candidates = the 2-band × 4-hash LSH pairs,
    recall = |hit| / |truth| in permille (plus the candidate volume the
    banding pays for that recall).

    Scale shape: truth reuses the Σ bucket² posting-list join (the
    expensive side), which is why this exact variant is TEST-GATED
    rather than registered: at 100 TB you sample truth, and that
    estimator — ``dedup_lsh_recall_sampled`` — is the registered
    query.  One row out."""
    corpus = _dedup_corpus(spark, sf_dir)
    truth = D.jaccard_pairs(corpus, "doc_id", "text", min_permille=500).select(
        "id_a", "id_b"
    )
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    cand = D.lsh_candidate_pairs(bands, "doc_id").select("id_a", "id_b").distinct()
    hit = truth.join(cand, ["id_a", "id_b"])
    counts = (
        truth.agg(F.count("*").alias("n_truth"))
        .crossJoin(cand.agg(F.count("*").alias("n_candidates")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit")))
    )
    return counts.select(
        F.col("n_truth").cast("bigint"),
        F.col("n_candidates").cast("bigint"),
        F.col("n_hit").cast("bigint"),
        F.expr("div(1000 * n_hit, greatest(n_truth, 1))")
        .cast("bigint")
        .alias("recall_permille"),
    )


@register(
    "dedup_lsh_recall_sampled",
    f"""
    WITH {_CORPUS_SQL},
    samp AS (
        SELECT * FROM corpus
        WHERE substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) IN ('0','1','2','3')
    ),
    ssh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END)) AS sh
        FROM (SELECT doc_id, string_split_regex(text, '\\s+') AS toks FROM samp)
    ),
    sz AS (SELECT doc_id, COUNT(*) AS n FROM ssh GROUP BY doc_id),
    inter AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS c
        FROM ssh a JOIN ssh b ON a.sh = b.sh AND a.doc_id < b.doc_id
        GROUP BY a.doc_id, b.doc_id
    ),
    truth AS (
        SELECT i.id_a, i.id_b
        FROM inter i JOIN sz sa ON sa.doc_id = i.id_a
                     JOIN sz sb ON sb.doc_id = i.id_b
        WHERE (1000 * i.c) // (sa.n + sb.n - i.c) >= 500
    ),
    {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    hit AS (
        SELECT t.id_a FROM truth t JOIN cand c
            ON c.id_a = t.id_a AND c.id_b = t.id_b
    )
    SELECT CAST((SELECT COUNT(*) FROM samp) AS BIGINT) AS n_docs_sampled,
           CAST((SELECT COUNT(*) FROM truth) AS BIGINT) AS n_truth_sampled,
           CAST((SELECT COUNT(*) FROM hit) AS BIGINT) AS n_hit_sampled,
           CAST((1000 * (SELECT COUNT(*) FROM hit))
                // greatest((SELECT COUNT(*) FROM truth), 1) AS BIGINT)
               AS recall_est_permille
    """,
)
def dedup_lsh_recall_sampled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SAMPLED-truth LSH recall estimator — the scale path
    ``dedup_lsh_recall``'s docstring promises.  Ground truth there is
    an exact all-pairs shingle-Jaccard join (Σ bucket², the expensive
    side); here truth is computed only over a deterministic ~25% doc
    sample (first md5 hex nibble of doc_id ∈ {0..3}), so the truth join
    cost drops ~p² ≈ 16× while the LSH candidate side still runs over
    the FULL corpus exactly as production would.  Recall of the banding
    is then estimated as |sampled truth ∩ candidates| / |sampled truth|
    — unbiased because banding hits are independent of the doc-id hash
    used for sampling.  Run next to ``dedup_lsh_recall`` at sf0.01 the
    estimator lands within a few permille of the exact recall (NOTES.md
    records the delta).

    Scale shape: sampling is a pushed-down filter on the truth side
    only; at 100 TB this is the difference between an impossible
    all-pairs join and a bounded audit job."""
    corpus = _dedup_corpus(spark, sf_dir)
    samp = corpus.filter(
        F.substring(
            F.md5(F.col("doc_id").cast("string").cast("binary")), 1, 1
        ).isin("0", "1", "2", "3")
    )
    truth = D.jaccard_pairs(samp, "doc_id", "text", min_permille=500).select(
        "id_a", "id_b"
    )
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    cand = D.lsh_candidate_pairs(bands, "doc_id").select("id_a", "id_b").distinct()
    hit = truth.join(cand, ["id_a", "id_b"])
    counts = (
        samp.agg(F.count("*").alias("n_docs_sampled"))
        .crossJoin(truth.agg(F.count("*").alias("n_truth_sampled")))
        .crossJoin(hit.agg(F.count("*").alias("n_hit_sampled")))
    )
    return counts.select(
        F.col("n_docs_sampled").cast("bigint"),
        F.col("n_truth_sampled").cast("bigint"),
        F.col("n_hit_sampled").cast("bigint"),
        F.expr("div(1000 * n_hit_sampled, greatest(n_truth_sampled, 1))")
        .cast("bigint")
        .alias("recall_est_permille"),
    )


@register(
    "events_cohort_retention",
    """
    WITH ue AS (
        SELECT user_id,
               (CAST(ts AS DATE) - DATE '1970-01-01') // 7 AS wk
        FROM events
    ),
    first_wk AS (SELECT user_id, MIN(wk) AS cohort_wk FROM ue GROUP BY user_id),
    active AS (SELECT DISTINCT u.user_id, f.cohort_wk, u.wk - f.cohort_wk AS offs
               FROM ue u JOIN first_wk f ON f.user_id = u.user_id),
    cohort_size AS (
        SELECT cohort_wk, COUNT(*) AS n_cohort FROM first_wk GROUP BY cohort_wk
    ),
    ret AS (
        SELECT cohort_wk, offs, COUNT(*) AS n_active
        FROM active GROUP BY cohort_wk, offs
    )
    SELECT CAST(r.cohort_wk AS BIGINT) AS cohort_wk,
           CAST(r.offs AS BIGINT) AS week_offset,
           CAST(r.n_active AS BIGINT) AS n_active,
           CAST(cs.n_cohort AS BIGINT) AS n_cohort,
           CAST((1000 * r.n_active) // cs.n_cohort AS BIGINT) AS retention_permille
    FROM ret r JOIN cohort_size cs ON cs.cohort_wk = r.cohort_wk
    ORDER BY cohort_wk, week_offset
    """,
)
def events_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly cohort retention: users grouped by their first-activity
    week, then per (cohort, week-offset) the share still active — the
    standard growth-analytics triangle.  Weeks are epoch-day // 7
    (integer, calendar-free, so both engines agree without timezone or
    ISO-week semantics entering the picture).

    Scale shape: first-activity via one groupBy(user) MIN; activity
    grid via DISTINCT on (user, week); everything downstream is
    cohort-cardinality-bounded.  The offset-0 row of every cohort is
    1000 permille by construction — a built-in sanity check."""
    ev = load_testdata(spark, sf_dir, "events")
    ue = ev.select(
        "user_id",
        F.expr("div(datediff(to_date(ts), to_date('1970-01-01')), 7)").alias("wk"),
    )
    first_wk = ue.groupBy("user_id").agg(F.min("wk").alias("cohort_wk"))
    active = (
        ue.join(first_wk, "user_id")
        .select("user_id", "cohort_wk", (F.col("wk") - F.col("cohort_wk")).alias("offs"))
        .distinct()
    )
    cohort_size = first_wk.groupBy("cohort_wk").agg(F.count("*").alias("n_cohort"))
    ret = active.groupBy("cohort_wk", "offs").agg(F.count("*").alias("n_active"))
    return (
        ret.join(cohort_size, "cohort_wk")
        .select(
            F.col("cohort_wk").cast("bigint"),
            F.col("offs").cast("bigint").alias("week_offset"),
            F.col("n_active").cast("bigint"),
            F.col("n_cohort").cast("bigint"),
            F.expr("div(1000 * n_active, n_cohort)")
            .cast("bigint")
            .alias("retention_permille"),
        )
        .orderBy("cohort_wk", "week_offset")
    )


@register(
    "parts_pareto_frontier",
    """
    WITH p AS (SELECT p_partkey, p_retailprice AS price, p_size AS sz FROM part)
    SELECT CAST(a.p_partkey AS BIGINT) AS p_partkey,
           CAST(a.price AS DOUBLE) AS price,
           CAST(a.sz AS INTEGER) AS sz
    FROM p a
    WHERE NOT EXISTS (
        SELECT 1 FROM p b
        WHERE b.price <= a.price AND b.sz >= a.sz
          AND (b.price < a.price OR b.sz > a.sz)
    )
    ORDER BY price, p_partkey
    """,
)
def parts_pareto_frontier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skyline / Pareto frontier (min price, max size) in ONE SWEEP —
    the third entry in the sweeps-not-joins family (with
    ``interval_overlap_sweep``): the oracle runs the textbook NOT
    EXISTS anti-join, which is O(n²); the engine sorts once by price
    and keeps a part iff it is the size-max of its price group AND its
    size strictly exceeds the running size-max over all strictly
    cheaper groups.  Identical (price, size) twins both survive — no
    strictly-better part exists — which the grp_max equality handles
    and the oracle's strictness clause mirrors.

    Scale shape: one groupBy(price), then the prefix-max runs as a
    TWO-PHASE distributed sweep — range-partition the price-domain
    table, running max per partition via a window partitioned on
    ``spark_partition_id()`` (NOT a global no-partition window, the
    vocab_top_tokens scale hazard from round 2), and stitch partitions
    with a driver-side prefix over ≤ #partitions boundary maxima
    broadcast back.  A broadcast join returns to the part rows — no
    pair join anywhere.  Algorithm lives in
    ``operators.sweeps.pareto_frontier`` (property-tested against
    Python brute force on random point sets)."""
    from .operators.sweeps import pareto_frontier

    p = load_testdata(spark, sf_dir, "part").select(
        "p_partkey", F.col("p_retailprice").alias("price"), F.col("p_size").alias("sz")
    )
    return (
        pareto_frontier(p, "price", "sz")
        .select(
            F.col("p_partkey").cast("bigint"),
            F.col("price").cast("double"),
            F.col("sz").cast("int"),
        )
        .orderBy("price", "p_partkey")
    )


@register(
    "dedup_graph_triangles",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    e AS (
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    deg AS (
        SELECT node, COUNT(*) AS d FROM (
            SELECT u AS node FROM e UNION ALL SELECT v FROM e
        ) GROUP BY node
    ),
    wedges AS (SELECT SUM(d * (d - 1) // 2) AS w FROM deg),
    tri AS (
        SELECT COUNT(*) AS t
        FROM e e1 JOIN e e2 ON e2.u = e1.v JOIN e e3
            ON e3.u = e1.u AND e3.v = e2.v
    )
    SELECT CAST((SELECT COUNT(*) FROM e) AS BIGINT) AS n_edges,
           CAST((SELECT w FROM wedges) AS BIGINT) AS n_wedges,
           CAST((SELECT t FROM tri) AS BIGINT) AS n_triangles,
           CAST((3000 * (SELECT t FROM tri))
                // greatest((SELECT w FROM wedges), 1) AS BIGINT)
               AS clustering_permille
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle count + global clustering coefficient of the near-dup
    graph — the structural health check on a dedup candidate graph (a
    high coefficient means candidates form tight clone clusters, as
    duplication should look; a low one means the banding is stitching
    unrelated docs).  Distributed shape: edges oriented low-id→high-id
    so each triangle (a<b<c) is found exactly once by one wedge join
    (e(a,b) ⋈ e(b,c)) closed by one edge probe (a,c) — the classic
    MapReduce triangle algorithm (Suri & Vassilvitskii 2011), whose
    cost is Σ deg² wedges, NOT all vertex triples; degree is bounded by
    duplicate-cluster size here.  Wedge denominator Σ C(deg,2) comes
    from one degree aggregate."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    e = (
        D.lsh_candidate_pairs(bands, "doc_id")
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .distinct()
        .transform(tracked_persist)
    )
    deg = (
        e.select(F.col("u").alias("node"))
        .unionByName(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count("*").alias("d"))
    )
    wedges = deg.agg(
        F.sum(F.expr("div(d * (d - 1), 2)")).alias("w")
    )
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b2"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a3"), F.col("v").alias("c3"))
    tri = (
        e1.join(e2, F.col("b") == F.col("b2"))
        .join(e3, (F.col("a") == F.col("a3")) & (F.col("c") == F.col("c3")))
        .agg(F.count("*").alias("t"))
    )
    out = (
        e.agg(F.count("*").alias("n_edges"))
        .crossJoin(F.broadcast(wedges))
        .crossJoin(F.broadcast(tri))
    )
    return out.select(
        F.col("n_edges").cast("bigint"),
        F.col("w").cast("bigint").alias("n_wedges"),
        F.col("t").cast("bigint").alias("n_triangles"),
        F.expr("div(3000 * t, greatest(w, 1))")
        .cast("bigint")
        .alias("clustering_permille"),
    )


_PROFILE_COLS = ["l_orderkey", "l_suppkey", "l_quantity", "l_returnflag", "l_shipdate"]


@register(
    "profile_lineitem_columns",
    "\n    UNION ALL ".join(
        f"""SELECT '{c}' AS col,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(COUNT(*) - COUNT({c}) AS BIGINT) AS n_null,
           CAST(COUNT(DISTINCT {c}) AS BIGINT) AS n_distinct,
           {"strftime(MIN(" + c + "), '%Y-%m-%d %H:%M:%S')" if c == "l_shipdate" else "CAST(MIN(" + c + ") AS VARCHAR)"} AS min_val,
           {"strftime(MAX(" + c + "), '%Y-%m-%d %H:%M:%S')" if c == "l_shipdate" else "CAST(MAX(" + c + ") AS VARCHAR)"} AS max_val
    FROM lineitem"""
        for c in _PROFILE_COLS
    )
    + "\n    ORDER BY col",
)
def profile_lineitem_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Column-profiling table (the Deequ/Great-Expectations profile
    stage): per column — row count, nulls, distinct count, min/max
    stringified — the summary a pipeline records before accepting a new
    data drop.  One aggregate pass PER COLUMN over a cached scan; at
    100 TB you'd fuse them into one pass with approx_count_distinct,
    trading exactness for a single scan (the exact distinct forces one
    shuffle per column — that cost is the point of recording it here).

    Timestamp min/max are stringified through a fixed format on both
    engines so the hash gate stays timezone-proof."""
    li = load_testdata(spark, sf_dir, "lineitem").transform(tracked_persist)
    def stringify(agg, c):
        if c == "l_shipdate":
            return F.date_format(agg, "yyyy-MM-dd HH:mm:ss")
        return agg.cast("string")

    outs = []
    for c in _PROFILE_COLS:
        col = F.col(c)
        outs.append(
            li.agg(
                F.lit(c).alias("col"),
                F.count("*").cast("bigint").alias("n_rows"),
                (F.count("*") - F.count(col)).cast("bigint").alias("n_null"),
                F.countDistinct(col).cast("bigint").alias("n_distinct"),
                stringify(F.min(col), c).alias("min_val"),
                stringify(F.max(col), c).alias("max_val"),
            )
        )
    out = outs[0]
    for o in outs[1:]:
        out = out.unionByName(o)
    return out.orderBy("col")


@register(
    "quality_functional_dependencies",
    """
    WITH fd1 AS (
        SELECT CAST(n_nationkey AS VARCHAR) AS lhs_v,
               CAST(n_regionkey AS VARCHAR) AS rhs_v FROM nation
    ),
    fd2 AS (
        SELECT CAST(o_custkey AS VARCHAR), CAST(o_orderpriority AS VARCHAR)
        FROM orders
    ),
    fd3 AS (
        SELECT CAST(l_orderkey AS VARCHAR), CAST(l_shipdate AS VARCHAR)
        FROM lineitem
    ),
    stats AS (
        SELECT 'nation: nationkey->regionkey' AS fd,
               COUNT(*) AS n_lhs,
               SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END) AS n_violating
        FROM (SELECT lhs_v, COUNT(DISTINCT rhs_v) AS d FROM fd1 GROUP BY lhs_v)
        UNION ALL
        SELECT 'orders: custkey->orderpriority',
               COUNT(*), SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END)
        FROM (SELECT lhs_v, COUNT(DISTINCT rhs_v) AS d FROM fd2 t(lhs_v, rhs_v) GROUP BY lhs_v)
        UNION ALL
        SELECT 'lineitem: orderkey->shipdate',
               COUNT(*), SUM(CASE WHEN d > 1 THEN 1 ELSE 0 END)
        FROM (SELECT lhs_v, COUNT(DISTINCT rhs_v) AS d FROM fd3 t(lhs_v, rhs_v) GROUP BY lhs_v)
    )
    SELECT fd, CAST(n_lhs AS BIGINT) AS n_lhs,
           CAST(n_violating AS BIGINT) AS n_violating,
           CAST((1000 * n_violating) // n_lhs AS BIGINT) AS violation_permille
    FROM stats
    ORDER BY fd
    """,
)
def quality_functional_dependencies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Functional-dependency conformance check (the data-profiling /
    Deequ `hasUniqueness`-style rule): for each declared A→B, count
    left-hand values mapping to more than one distinct B.  nationkey→
    regionkey should hold exactly (a real FK); custkey→orderpriority
    and orderkey→shipdate are deliberately non-FDs whose violation
    rates profile the data's shape.

    Scale shape: per FD one groupBy(lhs) with a distinct-count — the
    same cost class as any distinct aggregate, with map-side partial
    aggregation; no joins."""

    def fd(df, name, lhs, rhs):
        g = (
            df.select(
                F.col(lhs).cast("string").alias("lhs_v"),
                F.col(rhs).cast("string").alias("rhs_v"),
            )
            .groupBy("lhs_v")
            .agg(F.countDistinct("rhs_v").alias("d"))
        )
        return g.agg(
            F.lit(name).alias("fd"),
            F.count("*").cast("bigint").alias("n_lhs"),
            F.sum(F.when(F.col("d") > 1, 1).otherwise(0))
            .cast("bigint")
            .alias("n_violating"),
        )

    nation = load_testdata(spark, sf_dir, "nation")
    orders = load_testdata(spark, sf_dir, "orders")
    li = load_testdata(spark, sf_dir, "lineitem")
    out = (
        fd(nation, "nation: nationkey->regionkey", "n_nationkey", "n_regionkey")
        .unionByName(fd(orders, "orders: custkey->orderpriority", "o_custkey", "o_orderpriority"))
        .unionByName(fd(li, "lineitem: orderkey->shipdate", "l_orderkey", "l_shipdate"))
    )
    return out.select(
        "fd",
        "n_lhs",
        "n_violating",
        F.expr("div(1000 * n_violating, n_lhs)").cast("bigint").alias("violation_permille"),
    ).orderBy("fd")


@register(
    "spatial_neighbor_pairs",
    """
    WITH pts AS (
        SELECT user_id,
               CAST(concat('0x', substr(md5(concat('x:', user_id)), 1, 4)) AS BIGINT)
                   % 1024 AS x,
               CAST(concat('0x', substr(md5(concat('y:', user_id)), 1, 4)) AS BIGINT)
                   % 1024 AS y
        FROM (SELECT DISTINCT user_id FROM events)
    )
    SELECT CAST(a.user_id AS BIGINT) AS id_a, CAST(b.user_id AS BIGINT) AS id_b,
           CAST((a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) AS BIGINT)
               AS dist2
    FROM pts a JOIN pts b ON a.user_id < b.user_id
    WHERE (a.x - b.x) * (a.x - b.x) + (a.y - b.y) * (a.y - b.y) <= 1024
    ORDER BY id_a, id_b
    """,
)
def spatial_neighbor_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spatial neighbor pairs (distance ≤ 32 on a 1024² integer grid)
    via GRID-CELL bucketing — the 2-D instance of the bucket-join
    pattern every dedup tier here uses: assign each point its 32×32
    cell, explode ONE side to its 3×3 cell neighborhood, equi-join on
    the cell id, verify exact integer distance.  A true neighbor pair
    is never missed (r = cell size ⇒ the partner is in the 3×3 box)
    and never duplicated (the partner's cell appears once in the
    neighborhood).  The ORACLE runs the O(n²) distance join this
    replaces.  Coordinates are md5-derived integers, so both engines
    compute identical points and exact distances.

    Scale shape: Σ cell² work like every banding join — cell size is
    the skew knob; never an all-pairs comparison."""
    users = (
        load_testdata(spark, sf_dir, "events")
        .select("user_id")
        .distinct()
    )

    def coord(axis):
        return F.conv(
            F.substring(
                F.md5(F.concat(F.lit(axis + ":"), F.col("user_id").cast("string")).cast("binary")),
                1,
                4,
            ),
            16,
            10,
        ).cast("bigint") % 1024

    pts = users.select(
        "user_id", coord("x").alias("x"), coord("y").alias("y")
    ).transform(tracked_persist)
    a = pts.select(
        F.col("user_id").alias("id_a"),
        F.col("x").alias("xa"),
        F.col("y").alias("ya"),
        F.expr(
            "explode(flatten(transform(sequence(-1, 1), dx ->"
            " transform(sequence(-1, 1), dy ->"
            " named_struct('cx', div(x, 32) + dx, 'cy', div(y, 32) + dy)))))"
        ).alias("c"),
    ).select("id_a", "xa", "ya", "c.cx", "c.cy")
    b = pts.select(
        F.col("user_id").alias("id_b"),
        F.col("x").alias("xb"),
        F.col("y").alias("yb"),
        F.expr("div(x, 32)").alias("cxb"),
        F.expr("div(y, 32)").alias("cyb"),
    )
    d2 = (F.col("xa") - F.col("xb")) * (F.col("xa") - F.col("xb")) + (
        F.col("ya") - F.col("yb")
    ) * (F.col("ya") - F.col("yb"))
    return (
        a.join(
            b,
            (F.col("cx") == F.col("cxb"))
            & (F.col("cy") == F.col("cyb"))
            & (F.col("id_a") < F.col("id_b")),
        )
        .withColumn("dist2", d2)
        .filter(F.col("dist2") <= 1024)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("dist2").cast("bigint"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "fuzzy_name_pairs_symspell",
    """
    WITH n AS (SELECT c_custkey AS id, c_name AS nm FROM customer)
    SELECT CAST(a.id AS BIGINT) AS id_a, CAST(b.id AS BIGINT) AS id_b,
           CAST(levenshtein(a.nm, b.nm) AS BIGINT) AS edit_distance
    FROM n a JOIN n b ON a.id < b.id
    WHERE levenshtein(a.nm, b.nm) <= 1
    ORDER BY id_a, id_b
    """,
)
def fuzzy_name_pairs_symspell(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Edit-distance ≤ 1 record pairs via SYMMETRIC DELETE (SymSpell):
    each name generates itself plus every single-character deletion;
    two names within edit distance 1 MUST share a variant (substitution
    ⇒ both delete the differing position; insert/delete ⇒ one's
    deletion equals the other), so candidates come from an EQUI-join on
    the variant string and only candidates pay a ``levenshtein``
    verification.  The ORACLE runs the O(n²) levenshtein join this
    replaces — the fuzzy-matching member of the never-all-pairs family.

    Scale shape: variants multiply rows by (len+1) — constant per
    record — and the variant join is Σ bucket² like every banding
    join; variant identity travels as an xxhash64 LONG and the join
    sides carry bare ids.  The candidate→name rejoin is a plain
    equi-join with NO mandatory broadcast hint (round-3 review flag):
    at sf0.1 a forced ``F.broadcast(names)`` measured marginally
    faster, but the hint is a hard directive — at 100× the names
    relation exceeds any broadcast threshold and would OOM the driver
    instead of degrading to a shuffle join.  AQE's size-based strategy
    picks broadcast when the relation fits and shuffles when it
    doesn't, which is the behaviour a 100 TB run needs.  Both engines
    implement the same standard
    Levenshtein, so the verified distances hash-match."""
    names = (
        load_testdata(spark, sf_dir, "customer")
        .select(F.col("c_custkey").alias("id"), F.col("c_name").alias("nm"))
        .transform(tracked_persist)
    )
    variants = names.select(
        "id",
        F.expr(
            "explode(array_union(array(xxhash64(nm)), transform(sequence(1, char_length(nm)),"
            " i -> xxhash64(concat(substring(nm, 1, i - 1),"
            " substring(nm, i + 1, char_length(nm) - i))))))"
        ).alias("h"),
    )
    a = variants.select(F.col("id").alias("id_a"), "h")
    b = variants.select(F.col("id").alias("id_b"), "h")
    cand = (
        a.join(b, ["h"])
        .filter(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b")
        .distinct()
    )
    na = names.select(F.col("id").alias("id_a"), F.col("nm").alias("nm_a"))
    nb = names.select(F.col("id").alias("id_b"), F.col("nm").alias("nm_b"))
    return (
        cand.join(na, "id_a")
        .join(nb, "id_b")
        .withColumn("edit_distance", F.levenshtein("nm_a", "nm_b"))
        .filter(F.col("edit_distance") <= 1)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("edit_distance").cast("bigint"),
        )
        .orderBy("id_a", "id_b")
    )


@register(
    "pipeline_data_mixture_epochs",
    r"""
    WITH s AS (
        SELECT source, COUNT(*) AS n_docs,
               SUM(len(string_split_regex(text, '\s+'))) AS n_tokens
        FROM documents GROUP BY source
    ),
    t AS (SELECT *, CAST(floor(sqrt(n_tokens)) AS BIGINT) AS sq FROM s),
    tot AS (SELECT SUM(sq) AS ssum FROM t)
    SELECT source,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((1000 * sq) // ssum AS BIGINT) AS weight_permille,
           CAST((1000000 * sq) // ssum AS BIGINT) AS target_tokens,
           CAST((1000 * ((1000000 * sq) // ssum)) // n_tokens AS BIGINT)
               AS epochs_milli
    FROM t, tot ORDER BY source
    """,
)
def pipeline_data_mixture_epochs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-mixture planner — the step that turns per-source corpus
    stats into sampling weights and repeat factors (epochs) for a fixed
    token budget, the way LLM training mixtures are specified (LLaMA's
    per-source epochs table; temperature-weighted sampling).  Weights
    here are temperature-T=2 (∝ √tokens, integer-floored so both
    engines agree bit-for-bit): upweights small sources, downweights
    the dominant one.  ``epochs_milli`` > 1000 means the source is seen
    more than once for a 1M-token budget — the over-sampling knob.

    Scale shape: one groupBy(source) token count (map-side combined),
    one single-row total broadcast back — nothing scales with corpus
    size but the first aggregate."""
    docs = load_testdata(spark, sf_dir, "documents")
    s = docs.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.size(F.split("text", X.TOKEN_RE))).cast("bigint").alias("n_tokens"),
    )
    t = s.withColumn("sq", F.floor(F.sqrt(F.col("n_tokens"))).cast("bigint"))
    tot = t.agg(F.sum("sq").alias("ssum"))
    return (
        t.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_docs",
            "n_tokens",
            F.expr("div(1000 * sq, ssum)").cast("bigint").alias("weight_permille"),
            F.expr("div(1000000 * sq, ssum)").cast("bigint").alias("target_tokens"),
            F.expr("div(1000 * div(1000000 * sq, ssum), n_tokens)")
            .cast("bigint")
            .alias("epochs_milli"),
        )
        .orderBy("source")
    )


@register(
    "text_gopher_quality_rules",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(text, '\s+') AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents
    ),
    m AS (
        SELECT doc_id,
               len(toks) AS n_tokens,
               (10 * len(list_filter(toks, x -> x != ''))) AS n_words10,
               CASE WHEN len(toks) > 0
                    THEN (10 * list_sum(list_transform(toks, x -> length(x))))
                         // len(toks)
                    ELSE 0 END AS mean_len_deci,
               CASE WHEN len(toks) > 0
                    THEN (1000 * len(list_filter(toks,
                         x -> contains(x, '#') OR contains(x, '...'))))
                         // len(toks)
                    ELSE 0 END AS symbol_permille,
               CASE WHEN len(lines) > 0
                    THEN (1000 * len(list_filter(lines,
                         x -> starts_with(x, '-') OR starts_with(x, '*'))))
                         // len(lines)
                    ELSE 0 END AS bullet_permille,
               CASE WHEN len(lines) > 0
                    THEN (1000 * len(list_filter(lines, x -> ends_with(x, '...'))))
                         // len(lines)
                    ELSE 0 END AS ellipsis_permille,
               len(list_distinct(list_filter(toks, x -> x IN
                   ('the','a','an','of','and','to','is','in','it','for'))))
                   AS n_stop_distinct
        FROM t
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(mean_len_deci AS BIGINT) AS mean_len_deci,
           CAST(symbol_permille AS BIGINT) AS symbol_permille,
           CAST(bullet_permille AS BIGINT) AS bullet_permille,
           CAST(ellipsis_permille AS BIGINT) AS ellipsis_permille,
           CAST(n_stop_distinct AS BIGINT) AS n_stop_distinct,
           (n_tokens BETWEEN 50 AND 100000)
               AND (mean_len_deci BETWEEN 30 AND 100)
               AND symbol_permille < 100
               AND bullet_permille < 900
               AND ellipsis_permille < 300
               AND n_stop_distinct >= 2 AS passes
    FROM m ORDER BY doc_id
    """,
)
def text_gopher_quality_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Gopher quality-rule battery (Rae et al. 2021 §A1.1, reused
    by Dolma/FineWeb): per-document token count bounds, mean word
    length in [3, 10], symbol-to-word ratio (# and ...), bullet-line
    and ellipsis-line fractions, and ≥2 distinct stopwords — the
    document-level heuristic filter that runs before any model-based
    scoring.  All metrics are integer-scaled (deci/permille) so both
    engines agree exactly; ``passes`` is the conjunctive verdict.

    Scale shape: one scan, all metrics from two split() arrays bound
    once per row; no shuffle at all (the ORDER BY is the driver's
    display sort, dropped by a downstream filter consumer)."""
    docs = load_testdata(spark, sf_dir, "documents")
    m = _gopher_doc_metrics(docs)
    return m.select(
        "doc_id",
        "n_tokens",
        "mean_len_deci",
        "symbol_permille",
        "bullet_permille",
        "ellipsis_permille",
        "n_stop_distinct",
        "passes",
    ).orderBy("doc_id")


def _gopher_doc_metrics(docs: DataFrame) -> DataFrame:
    """Per-doc Gopher rule metrics + conjunctive ``passes`` flag —
    shared by ``text_gopher_quality_rules`` and the calibration query
    (one scan, all metrics from two split() arrays bound per row)."""
    t = docs.select(
        "doc_id",
        F.split("text", X.TOKEN_RE).alias("toks"),
        F.split("text", "\n").alias("lines"),
    )
    n = F.size("toks")
    nl = F.size("lines")
    m = t.select(
        "doc_id",
        n.cast("bigint").alias("n_tokens"),
        F.when(
            n > 0,
            F.expr(
                "div(10 * aggregate(transform(toks, x -> length(x)), 0L,"
                " (a, x) -> a + x), size(toks))"
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("mean_len_deci"),
        F.when(
            n > 0,
            F.expr(
                "div(1000 * size(filter(toks, x -> contains(x, '#')"
                " OR contains(x, '...'))), size(toks))"
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("symbol_permille"),
        F.when(
            nl > 0,
            F.expr(
                "div(1000 * size(filter(lines, x -> startswith(x, '-')"
                " OR startswith(x, '*'))), size(lines))"
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("bullet_permille"),
        F.when(
            nl > 0,
            F.expr(
                "div(1000 * size(filter(lines, x -> endswith(x, '...'))),"
                " size(lines))"
            ),
        )
        .otherwise(0)
        .cast("bigint")
        .alias("ellipsis_permille"),
        F.size(
            F.array_distinct(F.filter(F.col("toks"), lambda x: x.isin(*X.EN_STOPWORDS)))
        )
        .cast("bigint")
        .alias("n_stop_distinct"),
    )
    return m.select(
        "doc_id",
        "n_tokens",
        "mean_len_deci",
        "symbol_permille",
        "bullet_permille",
        "ellipsis_permille",
        "n_stop_distinct",
        (
            F.col("n_tokens").between(50, 100000)
            & F.col("mean_len_deci").between(30, 100)
            & (F.col("symbol_permille") < 100)
            & (F.col("bullet_permille") < 900)
            & (F.col("ellipsis_permille") < 300)
            & (F.col("n_stop_distinct") >= 2)
        ).alias("passes"),
    )


@register(
    "events_watermark_late_stats",
    r"""
    WITH o AS (
        SELECT event_type, event_id,
               CAST(epoch(ts) AS BIGINT) AS es,
               MAX(CAST(epoch(ts) AS BIGINT)) OVER (
                   PARTITION BY event_type ORDER BY event_id
                   ROWS UNBOUNDED PRECEDING) AS hwm
        FROM events
    ),
    l AS (SELECT event_type, hwm - es AS late_sec FROM o)
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(CASE WHEN late_sec > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_out_of_order,
           CAST(SUM(CASE WHEN late_sec > 300 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_late_5min,
           CAST(SUM(CASE WHEN late_sec > 600 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dropped_10min_watermark,
           CAST(MAX(late_sec) AS BIGINT) AS max_late_sec
    FROM l GROUP BY event_type ORDER BY event_type
    """,
)
def events_watermark_late_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch twin of Structured Streaming's watermark accounting: with
    ``event_id`` as arrival order, each event's lateness is the
    high-water-mark timestamp seen so far in its event_type stream
    minus its own timestamp; the query reports how many events a 5-min
    allowed-lateness window would mark late and a 10-min watermark
    would DROP — exactly the sizing analysis you run before choosing
    ``withWatermark`` bounds on the streaming pipeline
    (``streaming/stateful.py`` implements the live side).

    Scale shape: one hash Exchange(event_type) + per-partition sort for
    the running max — the same distribution the streaming operator's
    state store uses; the aggregate is map-side combinable."""
    ev = load_testdata(spark, sf_dir, "events")
    w = (
        Window.partitionBy("event_type")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    es = F.unix_timestamp("ts").cast("bigint")
    o = ev.select(
        "event_type",
        "event_id",
        es.alias("es"),
    ).withColumn("hwm", F.max("es").over(w))
    late = o.select("event_type", (F.col("hwm") - F.col("es")).alias("late_sec"))
    return (
        late.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum(F.when(F.col("late_sec") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_out_of_order"),
            F.sum(F.when(F.col("late_sec") > 300, 1).otherwise(0))
            .cast("bigint")
            .alias("n_late_5min"),
            F.sum(F.when(F.col("late_sec") > 600, 1).otherwise(0))
            .cast("bigint")
            .alias("n_dropped_10min_watermark"),
            F.max("late_sec").cast("bigint").alias("max_late_sec"),
        )
        .orderBy("event_type")
    )


@register(
    "similarity_matryoshka_agreement",
    """
    WITH n AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[]))
                   AS nrm,
               (embedding::DOUBLE[])[1:16] AS tv,
               greatest(sqrt(list_dot_product((embedding::DOUBLE[])[1:16],
                                              (embedding::DOUBLE[])[1:16])),
                        1e-12) AS tnrm
        FROM embeddings
    ),
    full_rk AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.v, c.v) / (q.nrm * c.nrm) DESC,
                            c.vec_id) AS rk
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    ),
    trunc_rk AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               ROW_NUMBER() OVER (PARTITION BY q.vec_id
                   ORDER BY list_dot_product(q.tv, c.tv) / (q.tnrm * c.tnrm) DESC,
                            c.vec_id) AS rk
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 10
    )
    SELECT CAST(f.query_id AS BIGINT) AS query_id,
           CAST(COUNT(t.neighbor_id) AS BIGINT) AS overlap_at_5
    FROM full_rk f
    LEFT JOIN trunc_rk t ON t.query_id = f.query_id
        AND t.neighbor_id = f.neighbor_id AND t.rk <= 5
    WHERE f.rk <= 5
    GROUP BY f.query_id
    ORDER BY query_id
    """,
)
def similarity_matryoshka_agreement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Matryoshka-style dimension truncation audit (Kusupati et al.
    2022): rank the corpus by cosine twice — full 64-dim embeddings vs
    the first-16-dims prefix renormalized — and report, per query, how
    many of the full top-5 the truncated top-5 retains.  This is the
    measurement that decides whether a 4× cheaper prefix index is good
    enough as a first-stage retriever.

    Scale shape: both rankings are the bounded-query broadcast scan of
    ``similarity_cosine_topk`` (queries broadcast, corpus scanned once
    per ranking; the truncated pass reads 4× fewer floats); the
    agreement join is per-query top-5 — constant size."""
    emb = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings")))
    n = emb.select(
        "vec_id",
        F.col("_v").alias("v"),
        F.col("_norm").alias("nrm"),
        F.slice(F.col("_v"), 1, 16).alias("tv"),
    ).withColumn(
        "tnrm",
        F.greatest(F.sqrt(S.dot(F.col("tv"), F.col("tv"))), F.lit(1e-12)),
    ).transform(tracked_persist)
    q = n.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
        F.col("tv").alias("qtv"),
        F.col("tnrm").alias("qtn"),
    )
    pairs = n.join(F.broadcast(q), F.col("query_id") != F.col("vec_id"))
    wf = Window.partitionBy("query_id").orderBy(
        (S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))).desc(),
        F.col("vec_id"),
    )
    wt = Window.partitionBy("query_id").orderBy(
        (S.dot(F.col("qtv"), F.col("tv")) / (F.col("qtn") * F.col("tnrm"))).desc(),
        F.col("vec_id"),
    )
    ranked = pairs.select(
        "query_id",
        F.col("vec_id").alias("neighbor_id"),
        F.row_number().over(wf).alias("frk"),
        F.row_number().over(wt).alias("trk"),
    )
    return (
        ranked.filter(F.col("frk") <= 5)
        .groupBy("query_id")
        .agg(
            F.sum(F.when(F.col("trk") <= 5, 1).otherwise(0))
            .cast("bigint")
            .alias("overlap_at_5")
        )
        .select(F.col("query_id").cast("bigint"), "overlap_at_5")
        .orderBy("query_id")
    )


def _cluster_quality_oracle_sql() -> str:
    """DuckDB twin of ``embedding_cluster_quality``: replays the
    trained cells (``_kmeans_cells_cte``), then computes each cluster's
    size and INTEGER-EXACT scaled radius — the per-vector distance² to
    the cluster's FINAL mean, scaled by |cluster|² so every term
    (n·cvec_i − Σcvec_i)² is an integer both engines agree on
    bit-for-bit (the same exactness trick as the k-means training
    itself)."""
    return _kmeans_cells_cte() + """,
    cn AS (SELECT cluster, COUNT(*) AS n FROM cells GROUP BY cluster),
    fu AS (
        SELECT c.cluster, t.i AS pos, CAST(SUM(s.cvec[t.i]) AS BIGINT) AS sm
        FROM cells c JOIN cv s ON s.vec_id = c.vec_id
        CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
        GROUP BY c.cluster, t.i
    ),
    fm AS (SELECT cluster, list(sm ORDER BY pos) AS sml FROM fu GROUP BY cluster),
    pv AS (
        SELECT c.cluster,
               list_sum(list_transform(range(1, 65),
                   t -> CAST(cn.n * s.cvec[t] - fm.sml[t] AS BIGINT)
                        * CAST(cn.n * s.cvec[t] - fm.sml[t] AS BIGINT))) AS d2s
        FROM cells c
        JOIN cv s ON s.vec_id = c.vec_id
        JOIN fm ON fm.cluster = c.cluster
        JOIN cn ON cn.cluster = c.cluster
    )
    SELECT CAST(p.cluster AS INTEGER) AS cluster,
           CAST(ANY_VALUE(cn.n) AS BIGINT) AS n_vectors,
           CAST(MAX(p.d2s) AS BIGINT) AS radius_scaled
    FROM pv p JOIN cn ON cn.cluster = p.cluster
    GROUP BY p.cluster ORDER BY cluster
    """


@register("embedding_cluster_quality", _cluster_quality_oracle_sql())
def embedding_cluster_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cluster-quality diagnostics for the trained k-means quantizer —
    per cluster: member count and the scaled radius (max member
    distance² to the final cluster mean, ×|cluster|² to stay in exact
    integer arithmetic).  This is the health check run before trusting
    an IVF index or SemDeDup partition: a cluster with a huge radius
    means the quantizer under-fits that region and its cell scans are
    near-brute-force.

    Scale shape: the final-mean partial sums are the same (k·d)-row
    shuffle as one Lloyd update step; the per-vector distance needs one
    posexplode + a broadcast join of the k·d sums — nothing quadratic,
    nothing driver-side beyond the k×d matrix."""
    cells = _sq8_kmeans_cells(spark, sf_dir, k=8, iters=3)
    pe = cells.select(
        "vec_id", "cluster", F.posexplode("cvec").alias("pos", "x")
    )
    sums = pe.groupBy("cluster", "pos").agg(
        F.sum("x").cast("bigint").alias("sm")
    )
    cn = cells.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    term = (F.col("n") * F.col("x") - F.col("sm")).cast("bigint")
    pv = (
        pe.join(F.broadcast(sums), ["cluster", "pos"])
        .join(F.broadcast(cn), "cluster")
        .select("vec_id", "cluster", (term * term).alias("t2"))
        .groupBy("vec_id", "cluster")
        .agg(F.sum("t2").alias("d2s"))
    )
    return (
        pv.groupBy("cluster")
        .agg(F.max("d2s").cast("bigint").alias("radius_scaled"))
        .join(F.broadcast(cn), "cluster")
        .select(
            F.col("cluster").cast("int"),
            F.col("n").cast("bigint").alias("n_vectors"),
            "radius_scaled",
        )
        .orderBy("cluster")
    )


@register(
    "dedup_graph_pagerank",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    e AS (
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    ed AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM ed GROUP BY src),
    i1 AS (SELECT ed.dst AS node, SUM(1000000 // dg.d) AS inc
           FROM ed JOIN deg dg ON dg.node = ed.src GROUP BY ed.dst),
    s1 AS (SELECT n.node, 150000 + (850 * COALESCE(i.inc, 0)) // 1000 AS s
           FROM deg n LEFT JOIN i1 i ON i.node = n.node),
    i2 AS (SELECT ed.dst AS node, SUM(s1.s // dg.d) AS inc
           FROM ed JOIN deg dg ON dg.node = ed.src
                   JOIN s1 ON s1.node = ed.src GROUP BY ed.dst),
    s2 AS (SELECT n.node, 150000 + (850 * COALESCE(i.inc, 0)) // 1000 AS s
           FROM deg n LEFT JOIN i2 i ON i.node = n.node),
    i3 AS (SELECT ed.dst AS node, SUM(s2.s // dg.d) AS inc
           FROM ed JOIN deg dg ON dg.node = ed.src
                   JOIN s2 ON s2.node = ed.src GROUP BY ed.dst),
    s3 AS (SELECT n.node, n.d, 150000 + (850 * COALESCE(i.inc, 0)) // 1000 AS s
           FROM deg n LEFT JOIN i3 i ON i.node = n.node)
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(d AS BIGINT) AS degree,
           CAST(s AS BIGINT) AS pagerank_micro
    FROM s3 ORDER BY pagerank_micro DESC, doc_id LIMIT 20
    """,
)
def dedup_graph_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank over the near-dup candidate graph — 3 power iterations,
    damping 0.85, INTEGER micro-unit arithmetic (initial score 10⁶ per
    node; every contribution is a floor division), so the iterative
    fixpoint replays bit-for-bit in the unrolled DuckDB twin.  High-PR
    nodes are the "hub" documents many near-dups orbit — the doc a
    dedup pipeline keeps as the cluster representative (or audits
    first).  Top-20 by score.

    Scale shape: the canonical distributed PageRank — each iteration is
    ONE equi-join of the edge list with the score vector plus one
    groupBy(dst) partial-sum shuffle; the degree table joins broadcast.
    Per-iteration cost is O(|E|) with no driver involvement; the
    iteration COUNT is fixed (3).  Top-k is TakeOrderedAndProject,
    never a global sort.

    Round-10 (optimization; guide §3.3/§5): the per-iteration score
    vector is ``localCheckpoint(eager=False)``.  Unlike kcore's
    3-way-per-round fanout this chain nests only linearly (each round
    references ``s`` once), so the win is smaller but real — sf0.1
    A/B 5.8→5.2 s, identical output (collect-compared) — and the
    per-round plan stays O(1) at any iteration count."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    e = (
        D.lsh_candidate_pairs(bands, "doc_id")
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .distinct()
    )
    ed = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        # round 11: sliver fix + partitioning reuse, same as kcore —
        # hash(src) feeds the degree groupBy and the edd pre-join with
        # no further exchange on the edge side (guide §2.4)
        .repartition("src")
        .transform(tracked_persist)
    )
    deg = ed.groupBy(F.col("src").alias("node")).agg(F.count("*").alias("d")).transform(
        tracked_persist
    )
    # edge list pre-joined with source degree once; reused by all iters
    edd = ed.join(
        # O(|V|) degree table: no hard broadcast hint — AQE sizes it
        deg.select(F.col("node").alias("src"), F.col("d").alias("d_src")),
        "src",
    ).transform(tracked_persist)
    s = deg.select("node", F.lit(1000000).cast("bigint").alias("s"))
    for _ in range(3):
        inc = (
            edd.join(
                s.select(F.col("node").alias("src"), F.col("s").alias("s_src")), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.sum(F.expr("div(s_src, d_src)")).alias("inc"))
        )
        s = deg.join(inc, "node", "left").select(
            "node",
            "d",
            (
                F.lit(150000)
                + F.expr("div(850 * coalesce(inc, 0L), 1000)")
            ).cast("bigint").alias("s"),
        ).localCheckpoint(eager=False)
    return (
        s.select(
            F.col("node").cast("bigint").alias("doc_id"),
            F.col("d").cast("bigint").alias("degree"),
            F.col("s").alias("pagerank_micro"),
        )
        .orderBy(F.col("pagerank_micro").desc(), "doc_id")
        .limit(20)
    )


@register(
    "events_robust_anomalies_mad",
    """
    WITH med AS (
        SELECT event_type, quantile_cont(value, 0.5) AS med
        FROM events GROUP BY event_type
    ),
    dev AS (
        SELECT e.event_type, abs(e.value - m.med) AS ad
        FROM events e JOIN med m ON m.event_type = e.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(ad, 0.5) AS mad
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(CAST(ROUND(ANY_VALUE(m.med), 6) AS DECIMAL(18,6)) AS DOUBLE) AS median_value,
           CAST(CAST(ROUND(ANY_VALUE(md.mad), 6) AS DECIMAL(18,6)) AS DOUBLE) AS mad_value,
           CAST(SUM(CASE WHEN 10000 * d.ad > 44478 * md.mad THEN 1 ELSE 0 END)
                AS BIGINT) AS n_outliers
    FROM dev d
    JOIN med m ON m.event_type = d.event_type
    JOIN mad md ON md.event_type = d.event_type
    GROUP BY d.event_type
    ORDER BY d.event_type
    """,
)
def events_robust_anomalies_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly counts via Median Absolute Deviation — the
    outlier rule that survives the outliers themselves (mean/stddev,
    as in ``events_value_anomalies``, is dragged by the very anomalies
    it hunts; median/MAD has a 50% breakdown point).  An event is
    anomalous when |x − median| > 3·1.4826·MAD, evaluated as the exact
    cross-multiplied integer-scaled comparison 10000·|x−med| >
    44478·MAD so no division enters the predicate.  Exact interpolating
    percentiles on both engines (bitwise-identical — the
    ``price_percentiles`` precedent).

    Scale shape: two grouped exact-median passes (per-group
    ObjectHashAggregate, the unavoidable cost of exact medians — the
    approximate path is ``percentile_approx`` as in
    ``approx_distinct_stats``) with a broadcast median join between
    them; the final count is one map-side-combinable aggregate."""
    ev = load_testdata(spark, sf_dir, "events").select("event_type", "value")
    med = ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("med")
    )
    dev = ev.join(F.broadcast(med), "event_type").select(
        "event_type", "med", F.abs(F.col("value") - F.col("med")).alias("ad")
    ).transform(tracked_persist)
    mad = dev.groupBy("event_type").agg(F.expr("percentile(ad, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.round(F.first("med"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("median_value"),
            F.round(F.first("mad"), 6)
            .cast("decimal(18,6)")
            .cast("double")
            .alias("mad_value"),
            F.sum(
                F.when(10000 * F.col("ad") > 44478 * F.col("mad"), 1).otherwise(0)
            )
            .cast("bigint")
            .alias("n_outliers"),
        )
        .orderBy("event_type")
    )


@register(
    "events_value_histogram",
    """
    WITH b AS (
        SELECT event_type,
               least(CAST(floor(value / 50.0) AS INTEGER), 19) AS bucket
        FROM events WHERE value >= 0
    )
    SELECT event_type, CAST(bucket AS INTEGER) AS bucket,
           CAST(bucket * 50 AS BIGINT) AS lo,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM b GROUP BY event_type, bucket
    ORDER BY event_type, bucket
    """,
)
def events_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width histogram of event values per type (width 50, final
    bucket open-ended) — the profiling staple behind every dashboard
    distribution plot and the input to histogram-equalization joins.

    Scale shape: pure map-side bucketing + one combinable groupBy over
    (type, bucket) — cardinality is types × 20 regardless of row
    count."""
    ev = load_testdata(spark, sf_dir, "events").filter(F.col("value") >= 0)
    b = ev.select(
        "event_type",
        F.least(F.floor(F.col("value") / 50.0).cast("int"), F.lit(19)).alias("bucket"),
    )
    return (
        b.groupBy("event_type", "bucket")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
        .select(
            "event_type",
            F.col("bucket").cast("int"),
            (F.col("bucket").cast("bigint") * 50).alias("lo"),
            "n",
        )
        .orderBy("event_type", "bucket")
    )


@register(
    "text_ngram_novelty",
    rf"""
    WITH t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks
               FROM documents),
    sh AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END)) AS sh
        FROM t
    ),
    owner AS (SELECT sh, MIN(doc_id) AS first_doc FROM sh GROUP BY sh),
    j AS (
        SELECT s.doc_id,
               CASE WHEN o.first_doc = s.doc_id THEN 1 ELSE 0 END AS novel
        FROM sh s JOIN owner o ON o.sh = s.sh
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_shingles,
           CAST(SUM(novel) AS BIGINT) AS n_novel,
           CAST((1000 * SUM(novel)) // COUNT(*) AS BIGINT) AS novelty_permille
    FROM j GROUP BY doc_id
    ORDER BY doc_id
    """,
)
def text_ngram_novelty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document 3-gram novelty: the fraction of a doc's distinct
    shingles whose FIRST corpus occurrence (min doc_id) is the doc
    itself — the duplication/memorization-risk profile a data curator
    reads next to the dedup reports (low novelty ⇒ the doc mostly
    restates earlier text even when no single pair crosses a Jaccard
    threshold; the document-level view of what exact-substring dedup
    removes span-by-span).

    Scale shape: one shingle explode, one groupBy(shingle) MIN — the
    same posting-list distribution every dedup operator here rides.
    NO join of the posting list back onto itself: because each (doc,
    shingle) pair is unique, per-doc novel counts fall straight out of
    the owner aggregate (groupBy first_doc) and per-doc totals out of a
    groupBy(doc) — two doc-cardinality tables joined at the end
    (measured 8.4 s → ~2 s at sf0.1; the join-back formulation
    shuffled the full posting list twice).  Shingle identity travels as
    xxhash64 longs; the oracle intersects raw strings, so a collision
    fails the gate."""
    docs = load_testdata(spark, sf_dir, "documents")
    sh = D.shingle_explode(docs, "doc_id", "text", 3).select(
        "doc_id", F.xxhash64("sh").alias("h")
    ).transform(tracked_persist)
    totals = sh.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_shingles")
    )
    novel = (
        sh.groupBy("h")
        .agg(F.min("doc_id").alias("doc_id"))
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_novel"))
    )
    return (
        totals.join(novel, "doc_id", "left")
        .select(
            "doc_id",
            "n_shingles",
            F.coalesce("n_novel", F.lit(0)).cast("bigint").alias("n_novel"),
        )
        .select(
            "doc_id",
            "n_shingles",
            "n_novel",
            F.expr("div(1000 * n_novel, n_shingles)")
            .cast("bigint")
            .alias("novelty_permille"),
        )
        .orderBy("doc_id")
    )


# ---------------------------------------------------------------------------
# Round-5 session-3 additions: CCNet perplexity buckets, mergeable
# bottom-k quantile sketch, deterministic global training shuffle,
# curriculum-order phases.
# ---------------------------------------------------------------------------


@register(
    "text_ccnet_perplexity_buckets",
    r"""
    WITH lowered AS (SELECT doc_id, lang, lower(text) AS t FROM documents),
    pos AS (
        SELECT doc_id, lang, t,
               unnest(generate_series(1, greatest(length(t) - 2, 0))) AS i
        FROM lowered WHERE length(t) >= 3
    ),
    tg AS (SELECT doc_id, lang, substr(t, i, 3) AS tg FROM pos),
    counts AS (SELECT tg, COUNT(*) AS n FROM tg GROUP BY tg),
    scored AS (
        SELECT g.doc_id, g.lang,
               COUNT(*) AS n_trigrams,
               (1000 * SUM(length(format('{:b}', c.n)) - 1)) // COUNT(*)
                   AS fam
        FROM tg g JOIN counts c ON c.tg = g.tg
        GROUP BY g.doc_id, g.lang
    ),
    hist AS (SELECT lang, fam, COUNT(*) AS c FROM scored GROUP BY lang, fam),
    cum AS (
        SELECT lang, fam,
               SUM(c) OVER (PARTITION BY lang ORDER BY fam) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS n
        FROM hist
    ),
    cuts AS (
        SELECT lang,
               MIN(CASE WHEN 3 * cum >= n THEN fam END) AS c1,
               MIN(CASE WHEN 3 * cum >= 2 * n THEN fam END) AS c2
        FROM cum GROUP BY lang
    ),
    tagged AS (
        SELECT s.lang,
               CASE WHEN s.fam <= k.c1 THEN 'tail'
                    WHEN s.fam <= k.c2 THEN 'middle'
                    ELSE 'head' END AS bucket,
               s.n_trigrams, s.fam
        FROM scored s JOIN cuts k ON k.lang = s.lang
    )
    SELECT lang, bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_trigrams) AS BIGINT) AS total_trigrams,
           CAST(SUM(fam) // COUNT(*) AS BIGINT) AS avg_familiarity_permille
    FROM tagged
    GROUP BY lang, bucket
    ORDER BY lang, bucket
    """,
)
def text_ccnet_perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet-style head/middle/tail perplexity bucketing per language
    (Wenzek et al. 2020): score every document with the char-trigram
    LM familiarity (the integer-exact KenLM stand-in shared with
    ``text_trigram_lm_score``), then split each language into terciles
    and report per-bucket mass — the op CCNet uses to keep 'head'
    (fluent) text and drop or down-sample the 'tail'.

    Scale shape — the part that matters at 100 TB: terciles are NOT
    computed with a corpus-wide ntile window (that is a full sort of
    every document within each language partition, and the dominant
    language IS the skew).  Instead the integer score domain is
    bounded (permille of floor(log2 count) ≤ ~60,000 values), so a
    (lang, score) HISTOGRAM — one map-side-combinable groupBy — holds
    the full distribution in |langs|·|domain| rows; the cumulative
    window and cutoff extraction run over that tiny relation, and the
    per-document bucket tag is a broadcast join + map-side CASE.  This
    is the histogram-quantile pattern production pipelines use for
    integer-valued scores: exact, one extra scan, no per-doc sort.
    Tie policy: every doc with score <= cutoff lands in the lower
    bucket, so bucket sizes are N/3 up to tie inflation —
    deterministic on both engines with no doc_id tiebreak needed."""
    docs = load_testdata(spark, sf_dir, "documents")
    # persist the compact lowered text, not the char array — caching
    # the inflated form OOMs the columnar cache builder at large
    # blow-ups (see text_trigram_lm_score); cs re-derives streamed.
    lowered = docs.select(
        "doc_id", "lang", F.lower("text").alias("lt")
    ).transform(tracked_persist)
    chars = lowered.select(
        "doc_id", "lang", F.split("lt", "(?!^)").alias("cs")
    ).filter(F.size("cs") >= 4)
    tg = chars.select(
        "doc_id",
        "lang",
        F.expr(
            "explode(transform(sequence(1, size(cs) - 3),"
            " i -> concat(cs[i-1], cs[i], cs[i+1])))"
        ).alias("tg"),
    )
    counts = tg.groupBy("tg").agg(F.count("*").alias("n"))
    bucket = F.length(F.expr("bin(n)")) - 1
    scored = (
        tg.join(F.broadcast(counts), "tg")
        .groupBy("doc_id", "lang")
        .agg(
            F.count("*").alias("n_trigrams"),
            F.sum(bucket).alias("bucket_sum"),
        )
        .select(
            "doc_id",
            "lang",
            "n_trigrams",
            F.expr("div(1000 * bucket_sum, n_trigrams)").alias("fam"),
        )
        .transform(tracked_persist)
    )
    hist = scored.groupBy("lang", "fam").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy("lang").orderBy("fam")
    wl = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "fam",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wl).alias("n"),
    )
    cuts = cum.groupBy("lang").agg(
        F.min(F.when(3 * F.col("cum") >= F.col("n"), F.col("fam"))).alias("c1"),
        F.min(F.when(3 * F.col("cum") >= 2 * F.col("n"), F.col("fam"))).alias("c2"),
    )
    tagged = scored.join(F.broadcast(cuts), "lang").select(
        "lang",
        F.when(F.col("fam") <= F.col("c1"), F.lit("tail"))
        .when(F.col("fam") <= F.col("c2"), F.lit("middle"))
        .otherwise(F.lit("head"))
        .alias("bucket"),
        "n_trigrams",
        "fam",
    )
    return (
        tagged.groupBy("lang", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_trigrams").alias("total_trigrams"),
            F.sum("fam").alias("fam_sum"),
        )
        .select(
            "lang",
            "bucket",
            F.col("n_docs").cast("bigint"),
            F.col("total_trigrams").cast("bigint"),
            F.expr("div(fam_sum, n_docs)")
            .cast("bigint")
            .alias("avg_familiarity_permille"),
        )
        .orderBy("lang", "bucket")
    )


@register(
    "quantile_sketch_bottomk",
    """
    WITH keyed AS (
        SELECT l_returnflag AS flag,
               CAST(floor(l_extendedprice * 100) AS BIGINT) AS cents,
               md5(CAST(l_orderkey AS VARCHAR) || '_'
                   || CAST(l_linenumber AS VARCHAR)) AS h
        FROM lineitem
    ),
    totals AS (SELECT flag, COUNT(*) AS n_rows FROM keyed GROUP BY flag),
    samp AS (
        SELECT flag, cents
        FROM keyed
        QUALIFY ROW_NUMBER() OVER (PARTITION BY flag ORDER BY h) <= 256
    ),
    ranked AS (
        SELECT flag, cents,
               ROW_NUMBER() OVER (PARTITION BY flag
                                  ORDER BY cents, flag) AS vr,
               COUNT(*) OVER (PARTITION BY flag) AS ns
        FROM samp
    ),
    est AS (
        SELECT flag, MAX(ns) AS n_sample,
               MAX(CASE WHEN 100 * vr < 50 * ns + 100 THEN cents END)
                   AS est_p50_cents,
               MAX(CASE WHEN 100 * vr < 90 * ns + 100 THEN cents END)
                   AS est_p90_cents,
               MAX(CASE WHEN 100 * vr < 99 * ns + 100 THEN cents END)
                   AS est_p99_cents
        FROM ranked GROUP BY flag
    )
    SELECT t.flag AS l_returnflag,
           CAST(t.n_rows AS BIGINT) AS n_rows,
           CAST(e.n_sample AS BIGINT) AS n_sample,
           CAST(e.est_p50_cents AS BIGINT) AS est_p50_cents,
           CAST(e.est_p90_cents AS BIGINT) AS est_p90_cents,
           CAST(e.est_p99_cents AS BIGINT) AS est_p99_cents
    FROM totals t JOIN est e ON e.flag = t.flag
    ORDER BY l_returnflag
    """,
)
def quantile_sketch_bottomk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable bottom-k quantile sketch: per group, keep the 256 rows
    with the SMALLEST deterministic content hash (a uniform sample —
    the KMV idea applied to row sampling), then read any quantile off
    the sorted sample.  Bottom-k-by-hash is a true mergeable sketch:
    the union of two groups' bottom-k sets contains the union's
    bottom-k, so partial sketches combine associatively across
    partitions/days/shards without re-reading data — the 100 TB way to
    get quantiles without a per-group full sort.

    Scale shape: the rank<=k filter compiles to WindowGroupLimit
    (Spark 3.5+), which takes the per-PARTITION top-k before the
    shuffle — each upstream partition forwards at most k rows per
    group, so the exchange carries O(groups · k · partitions) rows,
    not the corpus.  The quantile read is a window over ≤k rows per
    group.  Estimates are integer cents; the index rule is
    ceil(q·ns) expressed as the integer comparison
    100·vr < q·ns + 100, exact on both engines.  Accuracy vs the
    exact quantile is the standard n^{-1/2} sampling error — asserted
    in pytest, while the oracle here checks exact sketch replay."""
    li = load_testdata(spark, sf_dir, "lineitem").select(
        F.col("l_returnflag").alias("flag"),
        F.expr("cast(floor(l_extendedprice * 100) as bigint)").alias("cents"),
        F.md5(
            F.concat(
                F.col("l_orderkey").cast("string"),
                F.lit("_"),
                F.col("l_linenumber").cast("string"),
            ).cast("binary")
        ).alias("h"),
    )
    totals = li.groupBy("flag").agg(F.count(F.lit(1)).alias("n_rows"))
    wh = Window.partitionBy("flag").orderBy("h")
    samp = (
        li.withColumn("rn", F.row_number().over(wh))
        .filter(F.col("rn") <= 256)
        .select("flag", "cents")
    )
    wv = Window.partitionBy("flag").orderBy("cents", "flag")
    ws = Window.partitionBy("flag")
    ranked = samp.select(
        "flag",
        "cents",
        F.row_number().over(wv).alias("vr"),
        F.count(F.lit(1)).over(ws).alias("ns"),
    )

    def _at(q: int):
        return F.max(
            F.when(100 * F.col("vr") < q * F.col("ns") + 100, F.col("cents"))
        )

    est = ranked.groupBy("flag").agg(
        F.max("ns").alias("n_sample"),
        _at(50).alias("est_p50_cents"),
        _at(90).alias("est_p90_cents"),
        _at(99).alias("est_p99_cents"),
    )
    return (
        totals.join(est, "flag")
        .select(
            F.col("flag").alias("l_returnflag"),
            F.col("n_rows").cast("bigint"),
            F.col("n_sample").cast("bigint"),
            F.col("est_p50_cents").cast("bigint"),
            F.col("est_p90_cents").cast("bigint"),
            F.col("est_p99_cents").cast("bigint"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "pipeline_global_shuffle",
    f"""
    WITH keyed AS (
        SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h FROM documents
    ),
    sharded AS (
        SELECT doc_id, h, CAST({_HEX12} AS BIGINT) % 16 AS shard
        FROM keyed
    ),
    per AS (
        SELECT shard, COUNT(*) AS n_docs,
               arg_min(doc_id, h) AS first_doc_id,
               MIN(substr(h, 1, 8)) AS min_h8
        FROM sharded GROUP BY shard
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST((1000 * 16 * n_docs) // SUM(n_docs) OVER () AS BIGINT)
               AS load_permille,
           CAST(first_doc_id AS BIGINT) AS first_doc_id,
           min_h8
    FROM per
    ORDER BY shard
    """,
)
def pipeline_global_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training shuffle: the op that materializes
    'shuffle the corpus once, reproducibly' before training.  Shard =
    48-bit content hash mod 16; within a shard the training order is
    the hash order.  Content hashing (not rand()) makes the shuffle
    reproducible across reruns and engines, and re-shuffling for a new
    epoch is just salting the hash input.

    Scale shape: sharding is ONE hash-partition exchange — no global
    sort; the within-shard order is sorted per shard at write time
    (embarrassingly parallel, 1/16th of the data each).  The report
    here aggregates per-shard occupancy map-side and checks balance:
    load_permille = 1000 · n_shard · 16 / N (1000 = perfectly
    uniform), the skew diagnostic a real pipeline alerts on.  The
    final window runs over exactly 16 rows."""
    docs = load_testdata(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    sharded = keyed.select(
        "doc_id",
        "h",
        (F.expr("cast(conv(substring(h, 1, 12), 16, 10) as bigint)") % 16).alias(
            "shard"
        ),
    )
    per = sharded.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.min_by("doc_id", "h").alias("first_doc_id"),
        F.min(F.substring("h", 1, 8)).alias("min_h8"),
    )
    wall = Window.partitionBy()
    return (
        per.withColumn("total", F.sum("n_docs").over(wall))
        .select(
            F.col("shard").cast("bigint"),
            F.col("n_docs").cast("bigint"),
            F.expr("div(1000 * 16 * n_docs, total)")
            .cast("bigint")
            .alias("load_permille"),
            F.col("first_doc_id").cast("bigint"),
            "min_h8",
        )
        .orderBy("shard")
    )


@register(
    "pipeline_curriculum_order",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(text, '\s+') AS toks,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    m AS (
        SELECT doc_id, h, len(toks) AS n_tokens,
               (1000 * list_sum(list_transform(toks, s -> length(s))))
                   // len(toks) AS difficulty
        FROM t WHERE len(toks) > 0
    ),
    hist AS (SELECT difficulty, COUNT(*) AS c FROM m GROUP BY difficulty),
    cum AS (
        SELECT difficulty,
               SUM(c) OVER (ORDER BY difficulty) AS cum,
               SUM(c) OVER () AS n
        FROM hist
    ),
    cuts AS (
        SELECT MIN(CASE WHEN 4 * cum >= n THEN difficulty END) AS c1,
               MIN(CASE WHEN 4 * cum >= 2 * n THEN difficulty END) AS c2,
               MIN(CASE WHEN 4 * cum >= 3 * n THEN difficulty END) AS c3
        FROM cum
    ),
    tagged AS (
        SELECT CASE WHEN m.difficulty <= k.c1 THEN 1
                    WHEN m.difficulty <= k.c2 THEN 2
                    WHEN m.difficulty <= k.c3 THEN 3
                    ELSE 4 END AS phase,
               m.doc_id, m.h, m.n_tokens, m.difficulty
        FROM m CROSS JOIN cuts k
    )
    SELECT CAST(phase AS BIGINT) AS phase,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(difficulty) // COUNT(*) AS BIGINT)
               AS avg_difficulty_permille,
           CAST(arg_min(doc_id, h) AS BIGINT) AS first_doc_id
    FROM tagged
    GROUP BY phase
    ORDER BY phase
    """,
)
def pipeline_curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning phase assignment (Bengio et al. 2009 shape):
    score every document with an integer difficulty proxy (mean token
    length in permille — longer words ≈ harder text), split the corpus
    into 4 phases easy→hard by GLOBAL quartile, and within each phase
    fix a deterministic hash order (so each phase is internally
    shuffled but reproducible).  Reports per-phase doc/token mass and
    the first document each phase would feed the trainer.

    Scale shape: global quartiles use the same bounded-domain
    HISTOGRAM pattern as ``text_ccnet_perplexity_buckets`` — a
    map-side-combinable groupBy(difficulty) holds the whole
    distribution, the cumulative scan runs over that tiny relation,
    and per-doc tagging is a broadcast of THREE integers.  No global
    sort of documents anywhere; the trainer-facing order is hash
    order within phase (sorted per output shard at write time).
    first_doc_id = min_by(doc_id, hash) — one map-side-combinable
    argmin."""
    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select(
        "doc_id",
        F.split("text", X.TOKEN_RE).alias("toks"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    m = (
        t.filter(F.size("toks") > 0)
        .select(
            "doc_id",
            "h",
            F.size("toks").alias("n_tokens"),
            F.expr(
                "div(1000 * aggregate(toks, 0L, (a, s) -> a + length(s)),"
                " size(toks))"
            ).alias("difficulty"),
        )
        .transform(tracked_persist)
    )
    hist = m.groupBy("difficulty").agg(F.count(F.lit(1)).alias("c"))
    wcum = Window.partitionBy().orderBy("difficulty")
    wall = Window.partitionBy()
    cum = hist.select(
        "difficulty",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )
    cuts = cum.agg(
        F.min(F.when(4 * F.col("cum") >= F.col("n"), F.col("difficulty"))).alias("c1"),
        F.min(
            F.when(4 * F.col("cum") >= 2 * F.col("n"), F.col("difficulty"))
        ).alias("c2"),
        F.min(
            F.when(4 * F.col("cum") >= 3 * F.col("n"), F.col("difficulty"))
        ).alias("c3"),
    )
    tagged = m.join(F.broadcast(cuts)).select(
        F.when(F.col("difficulty") <= F.col("c1"), F.lit(1))
        .when(F.col("difficulty") <= F.col("c2"), F.lit(2))
        .when(F.col("difficulty") <= F.col("c3"), F.lit(3))
        .otherwise(F.lit(4))
        .alias("phase"),
        "doc_id",
        "h",
        "n_tokens",
        "difficulty",
    )
    return (
        tagged.groupBy("phase")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tokens").alias("total_tokens"),
            F.sum("difficulty").alias("dsum"),
            F.min_by("doc_id", "h").alias("first_doc_id"),
        )
        .select(
            F.col("phase").cast("bigint"),
            F.col("n_docs").cast("bigint"),
            F.col("total_tokens").cast("bigint"),
            F.expr("div(dsum, n_docs)")
            .cast("bigint")
            .alias("avg_difficulty_permille"),
            F.col("first_doc_id").cast("bigint"),
        )
        .orderBy("phase")
    )


# ---------------------------------------------------------------------------
# Round-5 session-3 batch 2: UniMax language budgets, cross-source
# near-dup matrix, model-vs-heuristic quality calibration.
# ---------------------------------------------------------------------------


@register(
    "pipeline_unimax_language_budget",
    r"""
    WITH t AS (
        SELECT lang,
               list_filter(string_split_regex(text, '\s+'),
                           x -> x <> '') AS toks
        FROM documents
    ),
    inv AS (
        SELECT lang, COUNT(*) AS n_docs,
               SUM(len(toks)) AS avail
        FROM t GROUP BY lang
    ),
    capd AS (SELECT lang, n_docs, avail, 2 * avail AS cap FROM inv),
    win AS (
        SELECT lang, n_docs, avail, cap,
               ROW_NUMBER() OVER (ORDER BY cap, lang) AS j,
               COALESCE(SUM(cap) OVER (ORDER BY cap, lang
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS p_prev,
               COUNT(*) OVER () AS m,
               (3 * SUM(avail) OVER ()) // 2 AS budget
        FROM capd
    ),
    okd AS (
        SELECT *, (cap * (m - j + 1) + p_prev <= budget) AS ok
        FROM win
    ),
    tot AS (
        SELECT *,
               SUM(CASE WHEN ok THEN 1 ELSE 0 END) OVER () AS n_capped,
               COALESCE(SUM(CASE WHEN ok THEN cap END) OVER (), 0)
                   AS p_capped
        FROM okd
    )
    SELECT lang,
           CAST(n_docs AS BIGINT) AS n_docs,
           CAST(avail AS BIGINT) AS tokens_available,
           CAST(cap AS BIGINT) AS cap_tokens,
           CAST(CASE WHEN ok THEN cap
                     ELSE (budget - p_capped) // (m - n_capped)
                END AS BIGINT) AS allocated_tokens,
           CAST((1000 * CASE WHEN ok THEN cap
                             ELSE (budget - p_capped) // (m - n_capped)
                        END) // avail AS BIGINT) AS epochs_permille,
           ok AS capped
    FROM tot
    ORDER BY lang
    """,
)
def pipeline_unimax_language_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax language-budget allocation (Chung et al. 2023): given
    per-language token inventories, a total training budget, and a
    per-language epoch cap E, water-fill the budget — every language
    gets the uniform share unless its full cap (E · available) is
    smaller, in which case it takes the cap and the freed budget
    redistributes to the rest.  The sampling policy that replaced
    temperature sampling for massively-multilingual pretraining:
    low-resource languages are bounded by repetition (epochs ≤ E), not
    starved by proportional sampling.  Here E = 2 and budget =
    ⌊3·total/2⌋ (both derived from the data so every SF exercises both
    the capped and uncapped branches).

    The sequential water-filling loop has a CLOSED FORM over languages
    sorted by cap ascending: with prefix sums P and m languages,
    language j is capped iff cap_j·(m−j+1) + P_{j−1} ≤ B (the
    predicate is monotone in j because caps are sorted, so the capped
    set is a prefix); everyone else splits B minus the capped mass
    uniformly.  All integer arithmetic — exact on both engines.

    Scale shape: ONE map-side-combinable groupBy(lang) over the corpus
    (the only full-data pass); every window below it runs over the
    |languages|-row relation — at 100 TB that is a few hundred rows on
    one reducer, then a broadcast back to whoever samples.  This is
    the standard two-tier shape for global-allocation operators:
    heavy aggregation distributed, tiny allocation problem solved in
    closed form inside the plan (no driver loop, no collect)."""
    docs = load_testdata(spark, sf_dir, "documents")
    inv = (
        docs.select(
            "lang",
            F.size(
                F.filter(F.split("text", X.TOKEN_RE), lambda x: x != "")
            ).alias("n_toks"),
        )
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("avail"),
        )
        .withColumn("cap", 2 * F.col("avail"))
    )
    w_ord = Window.orderBy("cap", "lang")
    w_prev = w_ord.rowsBetween(Window.unboundedPreceding, -1)
    w_all = Window.partitionBy()
    win = inv.select(
        "lang",
        "n_docs",
        "avail",
        "cap",
        F.row_number().over(w_ord).alias("j"),
        F.coalesce(F.sum("cap").over(w_prev), F.lit(0)).alias("p_prev"),
        F.count(F.lit(1)).over(w_all).alias("m"),
        F.expr("div(3 * sum(avail) over (), 2)").alias("budget"),
    ).withColumn(
        "ok",
        F.col("cap") * (F.col("m") - F.col("j") + 1) + F.col("p_prev")
        <= F.col("budget"),
    )
    tot = win.select(
        "*",
        F.sum(F.when(F.col("ok"), 1).otherwise(0)).over(w_all).alias("n_capped"),
        F.coalesce(
            F.sum(F.when(F.col("ok"), F.col("cap"))).over(w_all), F.lit(0)
        ).alias("p_capped"),
    )
    alloc = F.when(F.col("ok"), F.col("cap")).otherwise(
        F.expr("div(budget - p_capped, m - n_capped)")
    )
    return (
        tot.select(
            "lang",
            F.col("n_docs").cast("bigint"),
            F.col("avail").cast("bigint").alias("tokens_available"),
            F.col("cap").cast("bigint").alias("cap_tokens"),
            alloc.cast("bigint").alias("allocated_tokens"),
            F.expr(
                "div(1000 * (case when ok then cap"
                " else div(budget - p_capped, m - n_capped) end), avail)"
            )
            .cast("bigint")
            .alias("epochs_permille"),
            F.col("ok").alias("capped"),
        )
        .orderBy("lang")
    )


@register(
    "dedup_cross_source_matrix",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b,
               COUNT(*) AS shared_bands
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    tagged AS (
        SELECT least(da.source, db.source) AS source_a,
               greatest(da.source, db.source) AS source_b,
               p.shared_bands
        FROM pairs p
        JOIN documents da ON da.doc_id = p.id_a % 100000
        JOIN documents db ON db.doc_id = p.id_b % 100000
    )
    SELECT source_a, source_b,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN shared_bands = 2 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_strong,
           (source_a <> source_b) AS cross_source
    FROM tagged
    GROUP BY source_a, source_b
    ORDER BY source_a, source_b
    """,
)
def dedup_cross_source_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-source duplicate-mass matrix — the corpus-composition
    diagnostic run before mixing sources into a training set: for
    every source pair, how many near-dup candidate pairs (MinHash-LSH,
    same banding as ``dedup_minhash_lsh``) span them.  High off-
    diagonal mass means two 'independent' sources are actually the
    same crawl twice and their mixture weights double-count; the
    diagonal is within-source redundancy.  (On the planted corpus a
    copy's source is its base doc's source — doc_id mod 100000.)

    Scale shape: the LSH candidate set is the banded bucket join
    (never all-pairs); the source lookup joins the CANDIDATE PAIR
    relation — |pairs| ≪ N — against the doc→source map, a partitioned
    equi-join on doc_id (in a production corpus `source` rides the
    corpus rows and both lookups vanish into the band join's
    projection).  The matrix itself is ≤ |sources|² rows from one
    map-side-combined groupBy.  Cites reference test strategy
    SURVEY.md §5 (planted-duplicate fixtures)."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    src = load_testdata(spark, sf_dir, "documents").select("doc_id", "source")
    tagged = (
        pairs.withColumn("base_a", F.col("id_a") % 100000)
        .withColumn("base_b", F.col("id_b") % 100000)
        .join(
            src.select(F.col("doc_id").alias("base_a"), F.col("source").alias("sa")),
            "base_a",
        )
        .join(
            src.select(F.col("doc_id").alias("base_b"), F.col("source").alias("sb")),
            "base_b",
        )
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
            "shared_bands",
        )
    )
    return (
        tagged.groupBy("source_a", "source_b")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.when(F.col("shared_bands") == 2, 1).otherwise(0)).alias(
                "n_strong"
            ),
        )
        .select(
            "source_a",
            "source_b",
            F.col("n_pairs").cast("bigint"),
            F.col("n_strong").cast("bigint"),
            (F.col("source_a") != F.col("source_b")).alias("cross_source"),
        )
        .orderBy("source_a", "source_b")
    )


@register(
    "quality_score_calibration",
    r"""
    WITH t AS (
        SELECT doc_id,
               string_split_regex(text, '\s+') AS toks,
               string_split(text, chr(10)) AS lines
        FROM documents
    ),
    g AS (
        SELECT doc_id,
               (len(toks) BETWEEN 50 AND 100000)
               AND (CASE WHEN len(toks) > 0
                    THEN (10 * list_sum(list_transform(toks, x -> length(x))))
                         // len(toks) ELSE 0 END BETWEEN 30 AND 100)
               AND (CASE WHEN len(toks) > 0
                    THEN (1000 * len(list_filter(toks,
                         x -> contains(x, '#') OR contains(x, '...'))))
                         // len(toks) ELSE 0 END < 100)
               AND (CASE WHEN len(lines) > 0
                    THEN (1000 * len(list_filter(lines,
                         x -> starts_with(x, '-') OR starts_with(x, '*'))))
                         // len(lines) ELSE 0 END < 900)
               AND (CASE WHEN len(lines) > 0
                    THEN (1000 * len(list_filter(lines, x -> ends_with(x, '...'))))
                         // len(lines) ELSE 0 END < 300)
               AND (len(list_distinct(list_filter(toks, x -> x IN
                   ('the','a','an','of','and','to','is','in','it','for'))))
                   >= 2) AS passes
        FROM t
    ),
    f AS (
        SELECT doc_id,
               CAST(concat('0x', substr(md5(concat('qc:',
                    unnest(list_filter(string_split_regex(lower(text), '\s+'),
                                       x -> x <> '')))), 1, 2))
                    AS BIGINT) AS j
        FROM documents
    ),
    wt AS (SELECT range AS j, ((range * 37 + 11) % 41) - 20 AS w
           FROM range(256)),
    doc AS (
        SELECT f.doc_id, COUNT(*) AS n_toks, SUM(wt.w) AS wsum
        FROM f JOIN wt ON f.j = wt.j
        GROUP BY f.doc_id
    ),
    sc AS (
        SELECT doc_id,
               CASE WHEN wsum >= 0 THEN (1000 * wsum) // n_toks
                    ELSE -((1000 * (-wsum)) // n_toks) END AS avg_w_milli
        FROM doc
    ),
    joined AS (
        SELECT (sc.avg_w_milli + 20000) // 2000 AS bucket,
               sc.avg_w_milli, g.passes
        FROM sc JOIN g ON g.doc_id = sc.doc_id
    )
    SELECT CAST(bucket AS BIGINT) AS bucket,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN avg_w_milli + 500 >= 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_keep,
           CAST(SUM(CASE WHEN passes THEN 1 ELSE 0 END) AS BIGINT)
               AS n_gopher_pass,
           CAST((1000 * SUM(CASE WHEN passes THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS gopher_pass_permille
    FROM joined
    GROUP BY bucket
    ORDER BY bucket
    """,
)
def quality_score_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Calibration curve of the model-based quality filter against the
    heuristic battery: bucket documents by hashed-classifier margin
    (fixed-width 2-unit buckets on the shifted milli scale — no
    quantile sort) and report the Gopher-rule pass rate per bucket.
    The diagnostic a pipeline runs before trusting a trained filter:
    if pass rate doesn't rise with classifier score, the model and
    the heuristics disagree and the cutoff needs review.  Reuses the
    exact per-doc chains of ``text_quality_classifier_hashed`` and
    ``text_gopher_quality_rules`` via shared helpers, so this query
    and those can never drift apart.

    Scale shape: the gopher flags are a narrow no-shuffle projection;
    the classifier margin is explode → 256-row broadcast join →
    map-side-combined groupBy(doc_id); the two per-doc frames join on
    doc_id (co-partitioned by the same key) and collapse into a
    ≤21-row bucket report via one more map-side-combined aggregate.
    The bucket id is a pure integer expression — shifted to
    non-negative so Spark's truncating div and DuckDB's flooring //
    agree."""
    docs = load_testdata(spark, sf_dir, "documents")
    g = _gopher_doc_metrics(docs).select("doc_id", "passes")
    sc = _hashed_classifier_scores(spark, docs).select("doc_id", "avg_w_milli")
    joined = sc.join(g, "doc_id").select(
        F.expr("div(avg_w_milli + 20000, 2000)").alias("bucket"),
        "avg_w_milli",
        "passes",
    )
    return (
        joined.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("avg_w_milli") + 500 >= 0, 1).otherwise(0)).alias(
                "n_keep"
            ),
            F.sum(F.when(F.col("passes"), 1).otherwise(0)).alias("n_gopher_pass"),
        )
        .select(
            F.col("bucket").cast("bigint"),
            F.col("n_docs").cast("bigint"),
            F.col("n_keep").cast("bigint"),
            F.col("n_gopher_pass").cast("bigint"),
            F.expr("div(1000 * n_gopher_pass, n_docs)")
            .cast("bigint")
            .alias("gopher_pass_permille"),
        )
        .orderBy("bucket")
    )


# ---------------------------------------------------------------------------
# Round-5 session-4 additions: hard-negative mining, k-anonymity audit,
# temperature-scaled mixture sampling.
# ---------------------------------------------------------------------------


@register(
    "similarity_hard_negatives",
    """
    WITH n AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               c.vec_id AS neighbor_id, c.label AS neighbor_label,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM n q JOIN n c ON c.vec_id != q.vec_id AND c.label != q.label
        WHERE q.vec_id < 10
    ),
    ranked AS (
        SELECT query_id, query_label, neighbor_id, neighbor_label, cos_raw,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                    ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
        FROM scored
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(query_label AS INTEGER) AS query_label,
           CAST(neighbor_id AS BIGINT) AS neighbor_id,
           CAST(neighbor_label AS INTEGER) AS neighbor_label,
           CAST(CAST(ROUND(cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim, rk
    FROM ranked WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def similarity_hard_negatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hard-negative mining for contrastive / embedding training: for
    each query vector, the top-k most-similar vectors carrying a
    DIFFERENT label.  These near-boundary negatives are what makes
    bi-encoder training data effective (DPR / Contriever recipe); the
    mining op is exactly the ANN scan with a label-disagreement
    predicate fused into the join condition.

    Scale shape: identical to ``similarity_cosine_topk`` — bounded
    query set broadcast against the corpus scan, the label filter
    rides the join condition so disqualified candidates never reach
    the ranking window.  At production scale the brute scan swaps for
    any of the cell-restricted tiers (IVF/PQ) with the same label
    predicate pushed into the candidate join; the gate queries
    (``ann_recall_*``) calibrate that swap.  Double fold in index
    order == DuckDB list_dot_product bitwise (NOTES recipe), so exact
    threshold compares are safe."""
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    nv = S.with_norm(emb)
    cand = nv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    q = nv.filter(F.col("vec_id") < 10).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    scored = (
        cand.join(
            F.broadcast(q),
            (F.col("query_id") != F.col("neighbor_id"))
            & (F.col("query_label") != F.col("neighbor_label")),
        )
        .withColumn("cos_sim", S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn")))
        .select("query_id", "query_label", "neighbor_id", "neighbor_label", "cos_sim")
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("query_label").cast("int"),
            F.col("neighbor_id").cast("bigint"),
            F.col("neighbor_label").cast("int"),
            F.round("cos_sim", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "quality_k_anonymity",
    """
    WITH qi AS (
        SELECT c_nationkey, c_mktsegment,
               (CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) + 100000000)
                   // 100000 AS acct_band
        FROM customer
    ),
    grp AS (
        SELECT c_nationkey, c_mktsegment, acct_band, COUNT(*) AS sz
        FROM qi GROUP BY 1, 2, 3
    ),
    ks AS (SELECT unnest([2, 5, 10]) AS k)
    SELECT CAST(k AS INTEGER) AS k,
           CAST((SELECT COUNT(*) FROM grp) AS BIGINT) AS n_groups,
           CAST((SELECT MIN(sz) FROM grp) AS BIGINT) AS min_group_size,
           CAST((SELECT SUM(CASE WHEN sz < k THEN 1 ELSE 0 END) FROM grp)
                AS BIGINT) AS groups_below_k,
           CAST((SELECT SUM(CASE WHEN sz < k THEN sz ELSE 0 END) FROM grp)
                AS BIGINT) AS records_below_k,
           CAST((1000 * (SELECT SUM(CASE WHEN sz < k THEN sz ELSE 0 END) FROM grp))
                // (SELECT SUM(sz) FROM grp) AS BIGINT) AS at_risk_permille
    FROM ks
    ORDER BY k
    """,
)
def quality_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over a quasi-identifier set — the privacy
    gate a dataset release (or a training corpus carrying user
    metadata) runs before publication: group by the QI tuple
    (nation, market segment, $1000 account-balance band) and report,
    for k ∈ {2, 5, 10}, how many equivalence classes and records fall
    below k.  Records in small QI classes are re-identifiable by
    linkage (Sweeney 2002); the fix is coarsening bands or suppressing
    rows, both of which re-run this same audit.

    Scale shape: ONE map-side-combined groupBy over the QI tuple
    (group count bounded by the QI domain, not the table), then a
    3×|k| conditional aggregate over the tiny group-size relation —
    the k rows come from a literal array explode, never a second table
    scan.  The balance band is computed in exact DECIMAL cents and
    shifted non-negative so Spark's truncating div and DuckDB's
    flooring // agree."""
    cust = load_testdata(spark, sf_dir, "customer")
    qi = cust.select(
        "c_nationkey",
        "c_mktsegment",
        F.expr(
            "div(CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT)"
            " + 100000000, 100000)"
        ).alias("acct_band"),
    )
    grp = qi.groupBy("c_nationkey", "c_mktsegment", "acct_band").agg(
        F.count(F.lit(1)).alias("sz")
    )
    stats = grp.agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.min("sz").alias("min_group_size"),
        F.sum("sz").alias("n_records"),
        *[
            F.sum(F.when(F.col("sz") < k, 1).otherwise(0)).alias(f"gb{k}")
            for k in (2, 5, 10)
        ],
        *[
            F.sum(F.when(F.col("sz") < k, F.col("sz")).otherwise(0)).alias(f"rb{k}")
            for k in (2, 5, 10)
        ],
    )
    ks = stats.select(
        F.explode(F.array(*[F.lit(k) for k in (2, 5, 10)])).alias("k"), "*"
    )
    return ks.select(
        F.col("k").cast("int"),
        F.col("n_groups").cast("bigint"),
        F.col("min_group_size").cast("bigint"),
        F.when(F.col("k") == 2, F.col("gb2"))
        .when(F.col("k") == 5, F.col("gb5"))
        .otherwise(F.col("gb10"))
        .cast("bigint")
        .alias("groups_below_k"),
        F.when(F.col("k") == 2, F.col("rb2"))
        .when(F.col("k") == 5, F.col("rb5"))
        .otherwise(F.col("rb10"))
        .cast("bigint")
        .alias("records_below_k"),
        F.expr(
            "div(1000 * (CASE WHEN k = 2 THEN rb2 WHEN k = 5 THEN rb5"
            " ELSE rb10 END), n_records)"
        )
        .cast("bigint")
        .alias("at_risk_permille"),
    ).orderBy("k")


@register(
    "sample_temperature_mixture",
    r"""
    WITH per AS (
        SELECT source,
               CAST(SUM(len(string_split_regex(text, '\s+'))) AS BIGINT) AS n_tokens,
               COUNT(*) AS n_docs
        FROM documents GROUP BY source
    ),
    w AS (
        SELECT source, n_tokens, n_docs,
               (CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                + CASE WHEN (CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) + 1)
                            * (CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT) + 1)
                            <= n_tokens THEN 1 ELSE 0 END
                - CASE WHEN CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                            * CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)
                            > n_tokens THEN 1 ELSE 0 END) AS wt
        FROM per
    ),
    tot AS (SELECT SUM(wt) AS sw, SUM(n_tokens) AS st FROM w)
    SELECT w.source,
           w.n_tokens, CAST(w.n_docs AS BIGINT) AS n_docs,
           CAST(w.wt AS BIGINT) AS wt,
           CAST((1000 * w.n_tokens) // tot.st AS BIGINT) AS prop_permille,
           CAST((1000 * w.wt) // tot.sw AS BIGINT) AS temp_permille,
           CAST((1000000 * w.wt) // (tot.sw * w.n_tokens) AS BIGINT)
               AS epochs_per_token_micro
    FROM w, tot
    ORDER BY source
    """,
)
def sample_temperature_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled mixture sampling (the T5/mT5 recipe, α=0.5):
    each source's sampling weight is n_tokens^α, flattening the
    head-heavy natural distribution so low-resource sources are not
    starved.  Reports, per source, the natural (proportional) and
    temperature-scaled sampling rates plus the implied per-token
    repetition rate — the number a data-constrained run checks against
    the ~4-epoch diminishing-returns bar (Muennighoff et al. 2023).

    Scale shape: ONE map-side-combined groupBy(source) over the corpus
    (token counting is a narrow codegen'd split), then all allocation
    math runs on the |sources|-row relation against a 1-row total
    broadcast — the same two-tier shape as the UniMax budget query.
    α=0.5 is computed as an EXACT integer sqrt on both engines: the
    double sqrt is corrected by ±1 with integer square compares, so a
    1-ulp libm disagreement cannot flip the weight."""
    docs = load_testdata(spark, sf_dir, "documents")
    per = docs.groupBy("source").agg(
        F.sum(F.size(F.split("text", X.TOKEN_RE))).cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_docs"),
    )
    s0 = "CAST(floor(sqrt(CAST(n_tokens AS DOUBLE))) AS BIGINT)"
    w = per.withColumn(
        "wt",
        F.expr(
            f"{s0} + (CASE WHEN ({s0} + 1) * ({s0} + 1) <= n_tokens THEN 1 ELSE 0 END)"
            f" - (CASE WHEN {s0} * {s0} > n_tokens THEN 1 ELSE 0 END)"
        ),
    ).transform(tracked_persist)
    tot = w.agg(
        F.sum("wt").alias("sw"), F.sum("n_tokens").alias("st")
    )
    return (
        w.crossJoin(F.broadcast(tot))
        .select(
            "source",
            "n_tokens",
            F.col("n_docs").cast("bigint"),
            F.col("wt").cast("bigint"),
            F.expr("div(1000 * n_tokens, st)").cast("bigint").alias("prop_permille"),
            F.expr("div(1000 * wt, sw)").cast("bigint").alias("temp_permille"),
            F.expr("div(1000000 * wt, sw * n_tokens)")
            .cast("bigint")
            .alias("epochs_per_token_micro"),
        )
        .orderBy("source")
    )


@register(
    "pipeline_sequence_packing",
    rf"""
    WITH keyed AS (
        SELECT doc_id,
               len(string_split_regex(text, '\s+')) AS n_tok,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    sharded AS (
        SELECT doc_id, n_tok, h, CAST({{hex12}} AS BIGINT) % 8 AS shard
        FROM keyed
    ),
    run AS (
        SELECT shard, doc_id, n_tok,
               SUM(n_tok) OVER (PARTITION BY shard ORDER BY h, doc_id
                   ROWS UNBOUNDED PRECEDING) AS cum
        FROM sharded
    ),
    marked AS (
        SELECT shard, n_tok, cum,
               CASE WHEN (cum - n_tok) // 256 != (cum - 1) // 256
                    THEN 1 ELSE 0 END AS is_split
        FROM run
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST((SUM(n_tok) + 255) // 256 AS BIGINT) AS n_seqs,
           CAST(SUM(is_split) AS BIGINT) AS n_split_docs,
           CAST((1000 * SUM(n_tok)) // (256 * ((SUM(n_tok) + 255) // 256))
                AS BIGINT) AS fill_permille
    FROM marked
    GROUP BY shard
    ORDER BY shard
    """.format(hex12=_HEX12),
)
def pipeline_sequence_packing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing (concat-and-chop, the GPT pretraining layout):
    documents are concatenated in deterministic hash order within each
    shard and cut into fixed 256-token training sequences.  Reports,
    per shard, the sequence count, the docs that straddle a cut
    boundary (the cross-document-attention contamination a packer
    trades against padding waste), and the fill rate — the numbers
    that decide between plain chopping, best-fit packing, and masking
    strategies for a given corpus length profile.

    Scale shape: ONE hash-partition Exchange(shard) feeds a per-shard
    running-sum window (shards sort independently in parallel — no
    global sort), then a map-side-combined groupBy(shard) collapses to
    8 report rows.  Boundary math is pure non-negative integer
    division, identical under Spark's truncating div and DuckDB's
    flooring //."""
    docs = load_testdata(spark, sf_dir, "documents")
    keyed = docs.select(
        "doc_id",
        F.size(F.split("text", X.TOKEN_RE)).cast("long").alias("n_tok"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
    )
    sharded = keyed.select(
        "doc_id",
        "n_tok",
        "h",
        (F.expr("cast(conv(substring(h, 1, 12), 16, 10) as bigint)") % 8).alias(
            "shard"
        ),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("h", "doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    run = sharded.withColumn("cum", F.sum("n_tok").over(w))
    marked = run.select(
        "shard",
        "n_tok",
        F.when(
            F.expr("div(cum - n_tok, 256)") != F.expr("div(cum - 1, 256)"), 1
        )
        .otherwise(0)
        .alias("is_split"),
    )
    return (
        marked.groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
            F.sum("is_split").alias("n_split_docs"),
        )
        .select(
            F.col("shard").cast("bigint"),
            F.col("n_docs").cast("bigint"),
            F.col("n_tokens").cast("bigint"),
            F.expr("div(n_tokens + 255, 256)").cast("bigint").alias("n_seqs"),
            F.col("n_split_docs").cast("bigint"),
            F.expr("div(1000 * n_tokens, 256 * div(n_tokens + 255, 256))")
            .cast("bigint")
            .alias("fill_permille"),
        )
        .select(
            "shard", "n_docs", "n_tokens", "n_seqs", "n_split_docs", "fill_permille"
        )
        .orderBy("shard")
    )


def _bm25_ctes(topn: int) -> str:
    """DuckDB CTE chain for the shared BM25 lexical-retrieval tier
    (arithmetic contract documented on ``text_bm25_topk``); terminates
    in ``lexr`` = (query_id, doc_id, score_milli, rk ≤ topn)."""
    return rf"""tk AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    dl AS (SELECT doc_id, len(toks) AS dl FROM tk),
    stats AS (
        SELECT COUNT(*) AS n, (1000 * SUM(dl)) // COUNT(*) AS avgdl_milli
        FROM dl
    ),
    tf AS (
        SELECT doc_id, tok, COUNT(*) AS tf
        FROM (SELECT doc_id, unnest(toks) AS tok FROM tk)
        GROUP BY doc_id, tok
    ),
    df AS (SELECT tok, COUNT(*) AS df FROM tf GROUP BY tok),
    idf AS (
        SELECT tok, length(bin(n // df)) - 1 AS idf
        FROM df, stats
    ),
    q AS (
        SELECT doc_id AS query_id, unnest(list_distinct(toks[1:6])) AS tok
        FROM tk WHERE doc_id < 8
    ),
    scored AS (
        SELECT q.query_id, tf.doc_id,
               SUM(idf.idf * ((tf.tf * 2200 * 1000) //
                   (tf.tf * 1000 +
                    (1200 * (250 + (750000 * dl.dl) // stats.avgdl_milli)) // 1000)))
                   AS score_milli
        FROM q
        JOIN tf ON tf.tok = q.tok
        JOIN idf ON idf.tok = q.tok
        JOIN dl ON dl.doc_id = tf.doc_id
        CROSS JOIN stats
        WHERE tf.doc_id != q.query_id
        GROUP BY q.query_id, tf.doc_id
    ),
    lexr AS (
        SELECT * FROM (
            SELECT query_id, doc_id, score_milli,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY score_milli DESC, doc_id) AS INTEGER) AS rk
            FROM scored)
        WHERE rk <= {topn}
    )"""


def _bm25_ranked(spark: SparkSession, sf_dir: str, *, topn: int) -> DataFrame:
    """Shared BM25 tier: (query_id, doc_id, score_milli, rk ≤ topn).

    Exactly the chain documented on ``text_bm25_topk`` — the bounded
    query-term set semi-joined below the index aggregates, so tf/df/
    idf are built only for query terms and every broadcast frame is
    |query terms|-bounded regardless of corpus size."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents").select("doc_id", "text"))
    tk = docs.select(
        "doc_id", F.split("text", X.TOKEN_RE).alias("toks")
    ).transform(tracked_persist)
    dl = tk.select("doc_id", F.size("toks").cast("long").alias("dl"))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("div(1000 * sum(dl), count(1))").alias("avgdl_milli"),
    )
    q = (
        tk.filter(F.col("doc_id") < 8)
        .select(
            F.col("doc_id").alias("query_id"),
            F.explode(F.array_distinct(F.slice("toks", 1, 6))).alias("tok"),
        )
    )
    # the bounded query-term set semi-joins into the token stream
    # BELOW the index aggregates, so tf/df/idf are computed only for
    # query terms (identical values — df still counts over the whole
    # corpus' docs).  Until round 8 idf was built for the FULL vocab
    # and broadcast — a relation that grows ∝ corpus and would not
    # survive a web-scale token space; restricted, it is ≤|query
    # terms| rows and broadcasting it is sound at any corpus size.
    qtok = q.select("tok").distinct()
    tf = (
        tk.select("doc_id", F.explode("toks").alias("tok"))
        .join(F.broadcast(qtok), "tok", "semi")
        .groupBy("doc_id", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    df_t = tf.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    idf = df_t.crossJoin(F.broadcast(stats.select("n"))).select(
        "tok", (F.length(F.expr("bin(div(n, df))")) - 1).cast("long").alias("idf")
    )
    scored = (
        tf.join(F.broadcast(q), "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .join(F.broadcast(idf), "tok")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats.select("avgdl_milli")))
        .withColumn(
            "term_score",
            F.expr(
                "idf * div(tf * 2200 * 1000,"
                " tf * 1000 + div(1200 * (250 + div(750000 * dl, avgdl_milli)), 1000))"
            ),
        )
        .groupBy("query_id", "doc_id")
        .agg(F.sum("term_score").alias("score_milli"))
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("score_milli").desc(), F.col("doc_id").asc()
    )
    return (
        scored.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= topn)
    )


@register(
    "text_bm25_topk",
    f"""
    WITH {_bm25_ctes(5)}
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(score_milli AS BIGINT) AS score_milli, rk
    FROM lexr
    ORDER BY query_id, rk
    """,
)
def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 retrieval over a distributed inverted index — the lexical
    search tier a curation pipeline runs next to embedding ANN (hybrid
    retrieval, hard-negative mining for retriever training, and
    fuzzy decontamination all sit on this op).  k1=1.2, b=0.75 in
    fixed-point milli arithmetic; idf = floor(log2(N/df)) via the
    libm-free ``length(bin(n)) - 1`` derivation, so scores are
    integer-exact on both engines and stopwords (df == N) zero out
    naturally.

    Scale shape: the bounded 8-query term set SEMI-joins into the
    token stream below the index aggregates, so the map-side-combined
    groupBy(doc_id, term) index, the df aggregate, and the broadcast
    idf frame are all |query terms|-bounded — only postings of query
    terms are ever aggregated or scanned (df still counts over the
    whole corpus' docs for those terms, so values are unchanged).
    Until round 8 idf was built for the FULL vocab and broadcast — a
    relation that grows ∝ corpus.  The per-(query, doc) accumulation
    is one more combinable aggregate and the final ranking window
    sees only matched candidates.  At 100 TB the postings partition
    by term; a hot stopword term carries idf 0 and can be pruned
    before the join (df == N ⇒ zero contribution)."""
    return (
        _bm25_ranked(spark, sf_dir, topn=5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("doc_id").cast("bigint"),
            F.col("score_milli").cast("bigint"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


@register(
    "text_tokenizer_fertility",
    r"""
    WITH t AS (
        SELECT lang,
               length(text) AS n_chars,
               octet_length(encode(text)) AS n_bytes,
               len(string_split_regex(trim(text), '\s+')) AS ws_tokens,
               len(regexp_extract_all(text,
                   '''(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+'
               )) AS bpe_tokens
        FROM documents
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(ws_tokens) AS BIGINT) AS ws_tokens,
           CAST(SUM(bpe_tokens) AS BIGINT) AS bpe_tokens,
           CAST((1000 * SUM(bpe_tokens)) // SUM(ws_tokens) AS BIGINT)
               AS fertility_milli,
           CAST((1000 * SUM(n_bytes)) // SUM(bpe_tokens) AS BIGINT)
               AS bytes_per_piece_milli,
           CAST((1000 * SUM(n_chars)) // SUM(bpe_tokens) AS BIGINT)
               AS chars_per_piece_milli
    FROM t
    GROUP BY lang
    ORDER BY lang
    """,
)
def text_tokenizer_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility by language — pieces emitted per whitespace
    word, the equity metric multilingual pipelines audit (a tokenizer
    with 3× fertility on one language triples its effective sequence
    cost and silently shrinks its compute share; cf. the UniMax /
    NLLB tokenizer analyses).  Also reports bytes-per-piece — the
    compression view that decides vocab-size trades.  Uses the GPT-2
    pre-tokenizer split (verified Java/RE2-identical over this corpus,
    same pattern as ``text_token_counts``) as the piece counter.

    Scale shape: a narrow map-only projection (regex + split inside
    whole-stage codegen, no UDF) followed by ONE map-side-combined
    groupBy(lang) — output is |languages| rows; nothing else
    shuffles."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents"))
    bpe_pat = r"'(?:[sdmt]|ll|ve|re)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"
    t = docs.select(
        "lang",
        F.length("text").cast("long").alias("n_chars"),
        F.octet_length("text").cast("long").alias("n_bytes"),
        F.size(F.split(F.trim(F.col("text")), X.TOKEN_RE)).cast("long").alias(
            "ws_tokens"
        ),
        F.size(F.regexp_extract_all(F.col("text"), F.lit(bpe_pat), F.lit(0)))
        .cast("long")
        .alias("bpe_tokens"),
    )
    return (
        t.groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("ws_tokens").alias("ws_tokens"),
            F.sum("bpe_tokens").alias("bpe_tokens"),
            F.sum("n_bytes").alias("sum_bytes"),
            F.sum("n_chars").alias("sum_chars"),
        )
        .select(
            "lang",
            F.col("n_docs").cast("bigint"),
            F.col("ws_tokens").cast("bigint"),
            F.col("bpe_tokens").cast("bigint"),
            F.expr("div(1000 * bpe_tokens, ws_tokens)")
            .cast("bigint")
            .alias("fertility_milli"),
            F.expr("div(1000 * sum_bytes, bpe_tokens)")
            .cast("bigint")
            .alias("bytes_per_piece_milli"),
            F.expr("div(1000 * sum_chars, bpe_tokens)")
            .cast("bigint")
            .alias("chars_per_piece_milli"),
        )
        .orderBy("lang")
    )


def _embedding_outliers_oracle_sql() -> str:
    """DuckDB twin of ``embedding_outliers_topk``: replays the trained
    cells (same ``_kmeans_cells_cte`` chain as
    ``embedding_cluster_quality``), computes the integer-exact scaled
    distance² of every member to its cluster's final mean, and keeps
    the top-3 farthest per cluster."""
    return _kmeans_cells_cte() + """,
    cn AS (SELECT cluster, COUNT(*) AS n FROM cells GROUP BY cluster),
    fu AS (
        SELECT c.cluster, t.i AS pos, CAST(SUM(s.cvec[t.i]) AS BIGINT) AS sm
        FROM cells c JOIN cv s ON s.vec_id = c.vec_id
        CROSS JOIN (SELECT unnest(range(1, 65)) AS i) t
        GROUP BY c.cluster, t.i
    ),
    fm AS (SELECT cluster, list(sm ORDER BY pos) AS sml FROM fu GROUP BY cluster),
    pv AS (
        SELECT c.cluster, c.vec_id,
               list_sum(list_transform(range(1, 65),
                   t -> CAST(cn.n * s.cvec[t] - fm.sml[t] AS BIGINT)
                        * CAST(cn.n * s.cvec[t] - fm.sml[t] AS BIGINT))) AS d2s
        FROM cells c
        JOIN cv s ON s.vec_id = c.vec_id
        JOIN fm ON fm.cluster = c.cluster
        JOIN cn ON cn.cluster = c.cluster
    ),
    ranked AS (
        SELECT cluster, vec_id, d2s,
               CAST(ROW_NUMBER() OVER (PARTITION BY cluster
                    ORDER BY d2s DESC, vec_id) AS INTEGER) AS rk
        FROM pv
    )
    SELECT CAST(cluster AS INTEGER) AS cluster,
           CAST(vec_id AS BIGINT) AS vec_id,
           CAST(d2s AS BIGINT) AS d2s_scaled, rk
    FROM ranked WHERE rk <= 3
    ORDER BY cluster, rk
    """


@register("embedding_outliers_topk", _embedding_outliers_oracle_sql())
def embedding_outliers_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-space outlier mining — the OOD-pruning curation step
    (SemDeDup's complement: instead of dropping what clusters too
    tightly, surface what barely belongs anywhere): per trained
    quantizer cell, the 3 members FARTHEST from the cell's final mean.
    These are the mislabeled / out-of-distribution / garbage-encoding
    candidates a pipeline routes to review or drops before training.
    Distance² is scaled by |cluster|² so every term is integer-exact
    on both engines (same trick as ``embedding_cluster_quality``,
    whose chain this shares verbatim up to the ranking).

    Scale shape: final-mean partial sums = one (k·d)-row combinable
    shuffle; per-vector distance = posexplode + broadcast joins of the
    k·d sums; the ranking window partitions by cluster (parallel
    across cells, each a bounded-size group under the k ∝ N quantizer
    regime)."""
    cells = _sq8_kmeans_cells(spark, sf_dir, k=8, iters=3)
    pe = cells.select("vec_id", "cluster", F.posexplode("cvec").alias("pos", "x"))
    sums = pe.groupBy("cluster", "pos").agg(F.sum("x").cast("bigint").alias("sm"))
    cn = cells.groupBy("cluster").agg(F.count(F.lit(1)).alias("n"))
    term = (F.col("n") * F.col("x") - F.col("sm")).cast("bigint")
    pv = (
        pe.join(F.broadcast(sums), ["cluster", "pos"])
        .join(F.broadcast(cn), "cluster")
        .select("vec_id", "cluster", (term * term).alias("t2"))
        .groupBy("vec_id", "cluster")
        .agg(F.sum("t2").alias("d2s"))
    )
    w = Window.partitionBy("cluster").orderBy(
        F.col("d2s").desc(), F.col("vec_id").asc()
    )
    return (
        pv.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .select(
            F.col("cluster").cast("int"),
            F.col("vec_id").cast("bigint"),
            F.col("d2s").cast("bigint").alias("d2s_scaled"),
            "rk",
        )
        .orderBy("cluster", "rk")
    )


@register(
    "quality_knn_label_noise",
    """
    WITH n AS (
        SELECT vec_id, label, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    scored AS (
        SELECT q.vec_id AS query_id, q.label AS query_label,
               c.label AS neighbor_label,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw,
               c.vec_id AS neighbor_id
        FROM n q JOIN n c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 50
    ),
    ranked AS (
        SELECT query_id, query_label, neighbor_label,
               ROW_NUMBER() OVER (PARTITION BY query_id
                   ORDER BY cos_raw DESC, neighbor_id) AS rk
        FROM scored
    ),
    per AS (
        SELECT query_id, query_label,
               SUM(CASE WHEN neighbor_label = query_label THEN 1 ELSE 0 END)
                   AS n_same
        FROM ranked WHERE rk <= 5
        GROUP BY query_id, query_label
    )
    SELECT CAST(query_label AS INTEGER) AS label,
           CAST(COUNT(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN 2 * n_same < 5 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged,
           CAST((1000 * SUM(n_same)) // (5 * COUNT(*)) AS BIGINT)
               AS agreement_permille
    FROM per
    GROUP BY query_label
    ORDER BY label
    """,
)
def quality_knn_label_noise(spark: SparkSession, sf_dir: str) -> DataFrame:
    """kNN label-noise estimation (the Confident-Learning / cleanlab
    signal): for each probe vector, how many of its 5 exact nearest
    neighbors share its label; a probe whose neighborhood majority
    DISAGREES is a likely label error.  Reported per label — the
    per-class noise-rate table that decides relabeling or per-class
    loss weighting before training.

    Scale shape: the bounded 50-probe set broadcasts against one
    corpus scan (same calibration-gate contract as the ``ann_recall``
    family — cost is |Q|·N with |Q| fixed); the full-corpus production
    sweep swaps the brute scan for the IVF cell-restricted kNN with
    this query as its recall/agreement gate.  Neighbor counting is a
    5-row-per-probe aggregate; the report is |labels| rows."""
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    nv = S.with_norm(emb)
    cand = nv.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("_v").alias("cv"),
        F.col("_norm").alias("cn"),
    )
    q = nv.filter(F.col("vec_id") < 50).select(
        F.col("vec_id").alias("query_id"),
        F.col("label").alias("query_label"),
        F.col("_v").alias("qv"),
        F.col("_norm").alias("qn"),
    )
    scored = cand.join(
        F.broadcast(q), F.col("query_id") != F.col("neighbor_id")
    ).select(
        "query_id",
        "query_label",
        "neighbor_id",
        "neighbor_label",
        (S.dot(F.col("qv"), F.col("cv")) / (F.col("qn") * F.col("cn"))).alias(
            "cos_raw"
        ),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_raw").desc(), F.col("neighbor_id").asc()
    )
    per = (
        scored.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 5)
        .groupBy("query_id", "query_label")
        .agg(
            F.sum(
                F.when(F.col("neighbor_label") == F.col("query_label"), 1).otherwise(0)
            ).alias("n_same")
        )
    )
    return (
        per.groupBy("query_label")
        .agg(
            F.count(F.lit(1)).alias("n_probes"),
            F.sum(F.when(2 * F.col("n_same") < 5, 1).otherwise(0)).alias("n_flagged"),
            F.sum("n_same").alias("sum_same"),
        )
        .select(
            F.col("query_label").cast("int").alias("label"),
            F.col("n_probes").cast("bigint"),
            F.col("n_flagged").cast("bigint"),
            F.expr("div(1000 * sum_same, 5 * n_probes)")
            .cast("bigint")
            .alias("agreement_permille"),
        )
        .orderBy("label")
    )


# Poisson(1) CDF cutoffs scaled to 2^32 (floor(CDF(k) * 2^32) for
# k = 0..4): a uniform 32-bit hash value below cutoff k draws weight k.
# Shared verbatim by the Spark expression and the DuckDB twin so the
# bootstrap replicas are bit-identical on both engines.
_POIS1_CUTS = (1580030168, 3160060337, 3950075421, 4213413783, 4279248373)


def _pois1_weight_sql(u: str) -> str:
    """CASE expression mapping a uniform 32-bit value to a Poisson(1)
    draw via inverse-CDF — pure integer compares, engine-portable."""
    branches = " ".join(
        f"WHEN {u} < {c} THEN {k}" for k, c in enumerate(_POIS1_CUTS)
    )
    return f"(CASE {branches} ELSE 5 END)"




def _boot_u_sql(r: int, engine: str) -> str:
    """The r-th replica's uniform 32-bit draw: an 8-hex window of one
    of four per-row md5 hashes (4 disjoint windows per hash — 16
    independent values from 4 hash evaluations)."""
    g, j = divmod(r, 4)
    suf = "abcd"[g]
    if engine == "duck":
        return f"CAST('0x' || substr(md5(key || ':{suf}'), {8 * j + 1}, 8) AS BIGINT)"
    return f"cast(conv(substring(h{suf}, {8 * j + 1}, 8), 16, 10) as bigint)"


def _boot_sum_cols_sql(engine: str) -> str:
    cols = []
    for r in range(16):
        w = _pois1_weight_sql(_boot_u_sql(r, engine))
        cols.append(f"SUM({w} * cents) AS swc{r}, SUM({w}) AS sw{r}")
    return ",\n               ".join(cols)


def _boot_sum_exprs_spark() -> list:
    out = []
    for r in range(16):
        w = _pois1_weight_sql(_boot_u_sql(r, "spark"))
        out.append((f"swc{r}", f"sum({w} * cents)"))
        out.append((f"sw{r}", f"sum({w})"))
    return out


def _boot_mean_cols_sql() -> str:
    return ",\n               ".join(
        f"(1000 * swc{r}) // (100 * sw{r}) AS b{r}" for r in range(16)
    )


_B_ALL = ", ".join(f"b{r}" for r in range(16))


@register(
    "stats_bootstrap_ci",
    f"""
    WITH li AS (
        SELECT l_returnflag AS flag,
               CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents,
               concat_ws('|', l_orderkey, l_linenumber, l_extendedprice,
                         l_quantity) AS key
        FROM lineitem
    ),
    agg AS (
        SELECT flag, COUNT(*) AS n_rows, SUM(cents) AS sum_cents,
               {_boot_sum_cols_sql("duck")}
        FROM li GROUP BY flag
    ),
    boot AS (
        SELECT flag, n_rows, sum_cents,
               {_boot_mean_cols_sql()}
        FROM agg
    )
    SELECT flag,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST((1000 * sum_cents) // (100 * n_rows) AS BIGINT) AS mean_milli,
           CAST(LEAST({_B_ALL}) AS BIGINT) AS boot_min_milli,
           CAST(GREATEST({_B_ALL}) AS BIGINT) AS boot_max_milli,
           CAST(GREATEST({_B_ALL}) - LEAST({_B_ALL}) AS BIGINT) AS spread_milli
    FROM boot
    ORDER BY flag
    """,
)
def stats_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Poisson-bootstrap confidence bands (the MapReduce bootstrap,
    Chamandy et al. 2012): instead of resampling-with-replacement —
    impossible in one distributed pass — each row draws an independent
    Poisson(1) weight per replica from a content hash, giving 16
    simultaneous resample estimates of the per-group mean.  Reports
    the point estimate and the min/max/spread of the replica means —
    the error bar a pipeline attaches to any metric it monitors.
    Four md5 calls per row yield 16 independent 32-bit draws via
    disjoint hex windows; weights are inverse-CDF with shared integer
    cutoffs, so both engines reproduce every replica bit-for-bit.

    Scale shape: ALL 16 replicas are columns of ONE map-side-combined
    groupBy(flag) — no row expansion, no extra shuffle; the exchange
    carries |groups|·partitions rows of 34 integers.  min/max over
    replicas is a LEAST/GREATEST projection on the |groups|-row
    result.  No driver-side randomness — reruns and engines agree
    exactly."""
    li = _fan_out(load_testdata(spark, sf_dir, "lineitem")).select(
        F.col("l_returnflag").alias("flag"),
        F.expr("CAST(CAST(l_extendedprice AS DECIMAL(12,2)) * 100 AS BIGINT)").alias(
            "cents"
        ),
        F.concat_ws(
            "|", "l_orderkey", "l_linenumber", "l_extendedprice", "l_quantity"
        ).alias("key"),
    )
    hashed = li.select(
        "flag",
        "cents",
        *[
            F.md5(F.concat(F.col("key"), F.lit(f":{s}")).cast("binary")).alias(
                f"h{s}"
            )
            for s in "abcd"
        ],
    )
    # weights projected ONCE before the aggregate: each inverse-CDF
    # CASE appears a single time in the plan (32 sum operands then
    # reference plain columns), keeping the codegen'd expression tree
    # small — the all-in-agg spelling measured ~7 s of fixed
    # compilation cost at sf0.1
    weighted = hashed.select(
        "flag",
        "cents",
        *[
            F.expr(_pois1_weight_sql(_boot_u_sql(r, "spark"))).alias(f"w{r}")
            for r in range(16)
        ],
    )
    agg = weighted.groupBy("flag").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum("cents").alias("sum_cents"),
        *[
            c
            for r in range(16)
            for c in (
                F.sum(F.col(f"w{r}") * F.col("cents")).alias(f"swc{r}"),
                F.sum(f"w{r}").alias(f"sw{r}"),
            )
        ],
    )
    boot = agg.select(
        "flag",
        "n_rows",
        "sum_cents",
        *[
            F.expr(f"div(1000 * swc{r}, 100 * sw{r})").alias(f"b{r}")
            for r in range(16)
        ],
    )
    return boot.select(
        "flag",
        F.col("n_rows").cast("bigint"),
        F.expr("div(1000 * sum_cents, 100 * n_rows)").cast("bigint").alias(
            "mean_milli"
        ),
        F.least(*[F.col(f"b{r}") for r in range(16)])
        .cast("bigint")
        .alias("boot_min_milli"),
        F.greatest(*[F.col(f"b{r}") for r in range(16)])
        .cast("bigint")
        .alias("boot_max_milli"),
        (
            F.greatest(*[F.col(f"b{r}") for r in range(16)])
            - F.least(*[F.col(f"b{r}") for r in range(16)])
        )
        .cast("bigint")
        .alias("spread_milli"),
    ).orderBy("flag")


@register(
    "quality_metadata_consistency",
    """
    WITH t AS (
        SELECT source, length(text) AS actual, n_chars
        FROM documents
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN actual != n_chars THEN 1 ELSE 0 END) AS BIGINT)
               AS n_mismatch,
           CAST(MAX(abs(actual - n_chars)) AS BIGINT) AS max_abs_drift,
           CAST((1000 * SUM(CASE WHEN actual != n_chars THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS mismatch_permille,
           CAST(MIN(actual) AS BIGINT) AS min_len,
           CAST(MAX(actual) AS BIGINT) AS max_len
    FROM t
    GROUP BY source
    ORDER BY source
    """,
)
def quality_metadata_consistency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Metadata-consistency audit: recompute a derived column
    (``n_chars``) from the payload and reconcile against the stored
    metadata, per source.  Stale or drifted metadata is how length
    filters, pricing, and dedup keys silently rot after upstream
    re-encodes; this is the freshness check a lakehouse runs on every
    ingest batch (the same contract as the pipeline's quality
    expectations, expressed as a registered audit).

    Scale shape: narrow map-only reconcile in whole-stage codegen +
    ONE map-side-combined groupBy(source) — |sources| output rows,
    nothing else shuffles."""
    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select(
        "source",
        F.length("text").cast("long").alias("actual"),
        F.col("n_chars").cast("long").alias("meta"),
    )
    return (
        t.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(F.when(F.col("actual") != F.col("meta"), 1).otherwise(0)).alias(
                "n_mismatch"
            ),
            F.max(F.abs(F.col("actual") - F.col("meta"))).alias("max_abs_drift"),
            F.min("actual").alias("min_len"),
            F.max("actual").alias("max_len"),
        )
        .select(
            "source",
            F.col("n_docs").cast("bigint"),
            F.col("n_mismatch").cast("bigint"),
            F.col("max_abs_drift").cast("bigint"),
            F.expr("div(1000 * n_mismatch, n_docs)")
            .cast("bigint")
            .alias("mismatch_permille"),
            F.col("min_len").cast("bigint"),
            F.col("max_len").cast("bigint"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5: hybrid retrieval fusion, Bloom decontamination
# pre-filter, k-center coreset selection, HyperLogLog distinct sketch
# ---------------------------------------------------------------------------


@register(
    "text_hybrid_rrf_topk",
    f"""
    WITH {_bm25_ctes(20)},
    nv AS (
        SELECT vec_id, embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    vscored AS (
        SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id,
               list_dot_product(q.v, c.v) / (q.nrm * c.nrm) AS cos_raw
        FROM nv q JOIN nv c ON c.vec_id != q.vec_id
        WHERE q.vec_id < 8
    ),
    vecr AS (
        SELECT * FROM (
            SELECT query_id, neighbor_id,
                   CAST(ROW_NUMBER() OVER (PARTITION BY query_id
                        ORDER BY cos_raw DESC, neighbor_id) AS INTEGER) AS rk
            FROM vscored)
        WHERE rk <= 20
    ),
    fused AS (
        SELECT COALESCE(l.query_id, v.query_id) AS query_id,
               COALESCE(l.doc_id, v.neighbor_id) AS doc_id,
               COALESCE(l.rk, 0) AS lex_rk,
               COALESCE(v.rk, 0) AS vec_rk,
               COALESCE(1000000 // (60 + l.rk), 0)
                 + COALESCE(1000000 // (60 + v.rk), 0) AS rrf_micro
        FROM lexr l FULL OUTER JOIN vecr v
          ON v.query_id = l.query_id AND v.neighbor_id = l.doc_id
    )
    SELECT CAST(query_id AS BIGINT) AS query_id,
           CAST(doc_id AS BIGINT) AS doc_id,
           CAST(lex_rk AS INTEGER) AS lex_rk,
           CAST(vec_rk AS INTEGER) AS vec_rk,
           CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(rk AS INTEGER) AS rk
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY query_id
              ORDER BY rrf_micro DESC, doc_id) AS rk FROM fused)
    WHERE rk <= 5
    ORDER BY query_id, rk
    """,
)
def text_hybrid_rrf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval via Reciprocal Rank Fusion (Cormack et al.
    2009, the fusion rule Elasticsearch/Vespa/RAG stacks default to):
    each query's BM25 top-20 and embedding-cosine top-20 are fused by
    rrf = Σ 1/(60 + rank), so a document surfaced by BOTH views
    outranks one surfaced by either alone.  Ranks — not raw scores —
    are fused, which is what makes the lexical (integer milli-BM25)
    and vector (double cosine) tiers commensurable without score
    normalization; the fused score is computed in exact integer
    micro-units, div(1e6, 60 + rk).  Documents aligned to vectors by
    the crossmodal id join contract (doc_id == vec_id).

    Scale shape: both tiers are already-proven bounded-query chains —
    the BM25 posting equi-join (``text_bm25_topk``) and the broadcast
    brute-force cosine scan (``similarity_cosine_topk``; the ANN tiers
    swap in at scale) — and fusion itself touches only the ≤40·|Q|
    surviving (query, doc) rows: a full-outer equi-join on
    (query_id, doc_id) plus one final per-query window.  Nothing new
    shuffles at corpus scale; RRF cost is independent of N."""
    lex = _bm25_ranked(spark, sf_dir, topn=20).select(
        "query_id", "doc_id", F.col("rk").alias("lex_rk")
    )
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    vec = S.cosine_topk(emb, emb.filter(F.col("vec_id") < 8), k=20).select(
        F.col("query_id").cast("long").alias("query_id"),
        F.col("neighbor_id").cast("long").alias("doc_id"),
        F.col("rk").alias("vec_rk"),
    )
    fused = (
        lex.join(vec, ["query_id", "doc_id"], "full_outer")
        .select(
            "query_id",
            "doc_id",
            F.coalesce("lex_rk", F.lit(0)).alias("lex_rk"),
            F.coalesce("vec_rk", F.lit(0)).alias("vec_rk"),
        )
        .withColumn(
            "rrf_micro",
            F.when(F.col("lex_rk") > 0, F.expr("div(1000000, 60 + lex_rk)")).otherwise(
                F.lit(0)
            )
            + F.when(F.col("vec_rk") > 0, F.expr("div(1000000, 60 + vec_rk)")).otherwise(
                F.lit(0)
            ),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("rrf_micro").desc(), F.col("doc_id").asc()
    )
    return (
        fused.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_id").cast("bigint"),
            F.col("doc_id").cast("bigint"),
            F.col("lex_rk").cast("int"),
            F.col("vec_rk").cast("int"),
            F.col("rrf_micro").cast("bigint"),
            "rk",
        )
        .orderBy("query_id", "rk")
    )


def _hexat(col: str, start: int, n: int) -> str:
    """DuckDB SQL: integer value of ``n`` hex chars of ``col`` starting
    at 1-based ``start`` (generalizes ``_HEX12`` to offsets)."""
    return (
        "("
        + " + ".join(
            f"(strpos('0123456789abcdef', substr({col}, {start + i}, 1)) - 1)"
            f" * {16 ** (n - 1 - i)}"
            for i in range(n)
        )
        + ")"
    )


_BLOOM_M = 65536   # bits  (2048 64-word rows at 32 bits/word)
_BLOOM_K = 4       # probes per span (md5 hex windows 1-6, 7-12, 13-18, 19-24)


def _bloom_pos_sql(hcol: str, i: int) -> str:
    return f"({_hexat(hcol, 1 + 6 * i, 6)} % {_BLOOM_M})"


@register(
    "pipeline_bloom_decontam",
    rf"""
    WITH {_CORPUS_SQL},
    t AS (SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM corpus),
    spans AS (
        SELECT doc_id, unnest(list_distinct(
            CASE WHEN len(toks) >= 8
                 THEN list_transform(generate_series(1, len(toks)-7),
                      i -> concat_ws(' ', {_SPAN8}))
                 ELSE []::VARCHAR[] END)) AS span
        FROM t
    ),
    sp AS (
        SELECT doc_id, md5(span) AS h,
               (doc_id % 10 = 0 AND doc_id < 100000) AS is_eval
        FROM spans
    ),
    ev AS (SELECT DISTINCT h FROM sp WHERE is_eval),
    evp AS (
        SELECT DISTINCT (p // 32) AS word,
               (1::BIGINT << CAST(p % 32 AS INTEGER)) AS mask
        FROM (SELECT unnest([{", ".join(_bloom_pos_sql("h", i) for i in range(_BLOOM_K))}]) AS p
              FROM ev)
    ),
    bloom AS (SELECT word, bit_or(mask) AS bw FROM evp GROUP BY word),
    tr AS (SELECT doc_id, h FROM sp WHERE NOT is_eval),
    trp AS (
        SELECT doc_id, h,
               unnest([{", ".join(_bloom_pos_sql("h", i) for i in range(_BLOOM_K))}]) AS p
        FROM tr
    ),
    hits AS (
        SELECT t.doc_id, t.h,
               SUM(CASE WHEN b.bw IS NOT NULL
                         AND (b.bw & (1::BIGINT << CAST(t.p % 32 AS INTEGER))) != 0
                        THEN 1 ELSE 0 END) AS n_hit
        FROM trp t LEFT JOIN bloom b ON b.word = t.p // 32
        GROUP BY t.doc_id, t.h
    ),
    cand AS (SELECT doc_id, h FROM hits WHERE n_hit = {_BLOOM_K}),
    candx AS (
        SELECT c.doc_id, CASE WHEN e.h IS NOT NULL THEN 1 ELSE 0 END AS exact
        FROM cand c LEFT JOIN ev e ON e.h = c.h
    ),
    perdoc AS (
        SELECT doc_id, COUNT(*) AS n_cand, SUM(exact) AS n_exact
        FROM candx GROUP BY doc_id
    ),
    agg AS (
        SELECT COALESCE(COUNT(*), 0) AS n_bloom_docs,
               COALESCE(SUM(CASE WHEN n_exact > 0 THEN 1 ELSE 0 END), 0) AS n_exact_docs,
               COALESCE(SUM(CASE WHEN n_exact = 0 THEN 1 ELSE 0 END), 0) AS n_fp_docs,
               COALESCE(SUM(n_cand), 0) AS n_bloom_spans,
               COALESCE(SUM(n_exact), 0) AS n_exact_spans
        FROM perdoc
    ),
    tagg AS (SELECT COUNT(DISTINCT doc_id) AS n_train_docs FROM tr),
    bagg AS (SELECT CAST(SUM(bit_count(bw)) AS BIGINT) AS bits_set FROM bloom)
    SELECT CAST(n_train_docs AS BIGINT) AS n_train_docs,
           CAST(n_bloom_docs AS BIGINT) AS n_bloom_docs,
           CAST(n_exact_docs AS BIGINT) AS n_exact_docs,
           CAST(n_fp_docs AS BIGINT) AS n_fp_docs,
           CAST(n_bloom_spans AS BIGINT) AS n_bloom_spans,
           CAST(n_exact_spans AS BIGINT) AS n_exact_spans,
           CAST((1000 * (n_bloom_spans - n_exact_spans))
                // greatest(n_bloom_spans, 1) AS BIGINT) AS span_fp_permille,
           CAST(bits_set AS BIGINT) AS bloom_bits_set,
           CAST((1000 * bits_set) // {_BLOOM_M} AS BIGINT) AS fill_permille
    FROM tagg, agg, bagg
    """,
)
def pipeline_bloom_decontam(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter decontamination pre-filter with measured false-
    positive rate — the production shape of eval-overlap checking at
    corpus scale: the eval 8-token span set is folded into a CONSTANT
    8 KB bitmap (m=65536 bits, k=4 md5-derived probes), the bitmap
    broadcasts to every scan task, and only spans whose 4 probe bits
    are all set (Bloom candidates — a superset of true hits, Bloom
    filters have no false negatives) proceed to the exact span join.
    Reports the doc/span candidate counts, the exactly-confirmed
    subset, the false-positive residue the filter would admit, and the
    bitmap fill rate (fill ≈ 50% is the classic sizing optimum; higher
    means m is undersized for the eval set).

    Complements ``pipeline_decontaminate`` (which ships the exact
    span-join answer): at 100 TB the bitmap pre-filter drops ~all
    clean spans at scan time for 8 KB of broadcast state instead of
    shuffling every span into the semi-join, and the exact join runs
    over the surviving sliver only.  All probe arithmetic is md5-hex
    → integer, bit-identical on both engines.

    Scale shape: bitmap build is a bounded aggregate over the
    BENCHMARK-sized eval span set (≤2048 rows out); the training scan
    is map-only probe + ONE groupBy(doc, span) combinable count; the
    exact verification join sees only Bloom survivors.  Driver sees
    nothing but the 1-row report."""
    corpus = _dedup_corpus(spark, sf_dir)
    is_eval = (F.col("doc_id") % 10 == 0) & (F.col("doc_id") < 100000)
    sp = D.shingle_explode(corpus, "doc_id", "text", 8).select(
        "doc_id", F.md5(F.col("sh").cast("binary")).alias("h"), is_eval.alias("is_eval")
    )
    sp = sp.transform(tracked_persist)

    def probes():
        cols = []
        for i in range(_BLOOM_K):
            pos = (
                f"pmod(cast(conv(substring(h, {1 + 6 * i}, 6), 16, 10) as bigint),"
                f" {_BLOOM_M})"
            )
            cols.append(
                F.expr(
                    f"named_struct('word', div({pos}, 32),"
                    f" 'mask', shiftleft(cast(1 as bigint), cast({pos} % 32 as int)))"
                )
            )
        return F.explode(F.array(*cols)).alias("pr")

    ev = sp.filter("is_eval").select("h").distinct().transform(tracked_persist)
    bloom = (
        ev.select(probes())
        .select(F.col("pr.word").alias("word"), F.col("pr.mask").alias("mask"))
        .groupBy("word")
        .agg(F.expr("bit_or(mask)").alias("bw"))
    )
    tr = sp.filter(~F.col("is_eval")).select("doc_id", "h")
    trp = tr.select("doc_id", "h", probes()).select(
        "doc_id", "h", F.col("pr.word").alias("word"), F.col("pr.mask").alias("mask")
    )
    hits = (
        trp.join(F.broadcast(bloom), "word", "left")
        .withColumn(
            "hit",
            F.when(
                F.col("bw").isNotNull()
                & (F.col("bw").bitwiseAND(F.col("mask")) != 0),
                1,
            ).otherwise(0),
        )
        .groupBy("doc_id", "h")
        .agg(F.sum("hit").alias("n_hit"))
    )
    cand = hits.filter(F.col("n_hit") == _BLOOM_K)
    candx = cand.join(
        F.broadcast(ev.withColumn("ex", F.lit(1))), "h", "left"
    ).select("doc_id", F.coalesce("ex", F.lit(0)).alias("exact"))
    perdoc = candx.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_cand"), F.sum("exact").alias("n_exact")
    )
    agg = perdoc.agg(
        F.coalesce(F.count(F.lit(1)), F.lit(0)).alias("n_bloom_docs"),
        F.coalesce(
            F.sum(F.when(F.col("n_exact") > 0, 1).otherwise(0)), F.lit(0)
        ).alias("n_exact_docs"),
        F.coalesce(
            F.sum(F.when(F.col("n_exact") == 0, 1).otherwise(0)), F.lit(0)
        ).alias("n_fp_docs"),
        F.coalesce(F.sum("n_cand"), F.lit(0)).alias("n_bloom_spans"),
        F.coalesce(F.sum("n_exact"), F.lit(0)).alias("n_exact_spans"),
    )
    tagg = tr.agg(F.countDistinct("doc_id").alias("n_train_docs"))
    bagg = bloom.agg(F.expr("cast(sum(bit_count(bw)) as bigint)").alias("bits_set"))
    return (
        tagg.crossJoin(F.broadcast(agg))
        .crossJoin(F.broadcast(bagg))
        .select(
            F.col("n_train_docs").cast("bigint"),
            F.col("n_bloom_docs").cast("bigint"),
            F.col("n_exact_docs").cast("bigint"),
            F.col("n_fp_docs").cast("bigint"),
            F.col("n_bloom_spans").cast("bigint"),
            F.col("n_exact_spans").cast("bigint"),
            F.expr(
                "div(1000 * (n_bloom_spans - n_exact_spans),"
                " greatest(n_bloom_spans, 1))"
            )
            .cast("bigint")
            .alias("span_fp_permille"),
            F.col("bits_set").cast("bigint").alias("bloom_bits_set"),
            F.expr(f"div(1000 * bits_set, {_BLOOM_M})")
            .cast("bigint")
            .alias("fill_permille"),
        )
    )


def _d2_sql(a: str, b: str) -> str:
    """DuckDB SQL: exact integer squared L2 between two int lists."""
    return (
        f"list_sum(list_transform(generate_series(1, len({a})),"
        f" i -> CAST(({a}[i] - {b}[i]) AS BIGINT) * ({a}[i] - {b}[i])))"
    )


@register(
    "sample_coreset_kcenter",
    f"""
    WITH e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
    mm AS (SELECT MIN(x) AS mn, MAX(x) AS mx FROM (SELECT unnest(v) AS x FROM e)),
    q AS (
        SELECT vec_id,
               list_transform(v, x -> least(255, greatest(0,
                   CAST(floor((x - mn) * 256.0 / greatest(mx - mn, 1e-12)) AS INTEGER)))) AS qv
        FROM e, mm
    ),
    c1 AS (SELECT vec_id, qv FROM q ORDER BY vec_id LIMIT 1),
    d1 AS (SELECT p.vec_id, p.qv, {_d2_sql("p.qv", "c.qv")} AS d
           FROM q p CROSS JOIN c1 c),
    p2 AS (SELECT vec_id, qv, d FROM d1 ORDER BY d DESC, vec_id LIMIT 1),
    d2 AS (SELECT p.vec_id, p.qv, least(p.d, {_d2_sql("p.qv", "c.qv")}) AS d
           FROM d1 p CROSS JOIN p2 c),
    p3 AS (SELECT vec_id, qv, d FROM d2 ORDER BY d DESC, vec_id LIMIT 1),
    d3 AS (SELECT p.vec_id, p.qv, least(p.d, {_d2_sql("p.qv", "c.qv")}) AS d
           FROM d2 p CROSS JOIN p3 c),
    p4 AS (SELECT vec_id, qv, d FROM d3 ORDER BY d DESC, vec_id LIMIT 1),
    d4 AS (SELECT least(p.d, {_d2_sql("p.qv", "c.qv")}) AS d
           FROM d3 p CROSS JOIN p4 c),
    r4 AS (SELECT MAX(d) AS d FROM d4)
    SELECT CAST(1 AS INTEGER) AS pick_idx, CAST(c1.vec_id AS BIGINT) AS vec_id,
           CAST(p2.d AS BIGINT) AS radius2 FROM c1, p2
    UNION ALL SELECT 2, CAST(p2.vec_id AS BIGINT), CAST(p3.d AS BIGINT) FROM p2, p3
    UNION ALL SELECT 3, CAST(p3.vec_id AS BIGINT), CAST(p4.d AS BIGINT) FROM p3, p4
    UNION ALL SELECT 4, CAST(p4.vec_id AS BIGINT), CAST(r4.d AS BIGINT) FROM p4, r4
    ORDER BY pick_idx
    """,
)
def sample_coreset_kcenter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy k-center coreset selection (Gonzalez 1985; the
    farthest-point diversity sampler behind active-learning coresets,
    Sener & Savarese 2018) — pick 4 maximally-spread exemplars: seed
    with the lowest id, then 3× pick the point farthest from the
    selected set.  Reports each pick plus the coverage radius (the
    max-min squared distance every point has to the selected set)
    AFTER that pick — the 2-approximation certificate of the optimal
    k-center cost, and the curve a curator reads to choose k.

    Distances run in the shared SQ8 integer domain
    (``operators/similarity.sq8_codes``) so the argmax — and therefore
    every pick — is bit-exact on both engines (a double tie could
    diverge; integer ties break by vec_id deterministically).

    Scale shape: each of the 3 rounds is one broadcast of the single
    new center into a map-only min-update + ONE TakeOrderedAndProject
    argmax (k·O(N) total, the textbook distributed greedy k-center);
    the running min-distance frame is persisted so round i+1 scans it,
    not the lineage.  Driver sees only 1-row picks.  At real k the
    same loop runs k rounds with O(1) state per round
    (cf. operators/kmeans.py for the driver-bounded-iteration
    contract)."""
    emb = _fan_out(load_testdata(spark, sf_dir, "embeddings"))
    codes = S.sq8_codes(emb).transform(tracked_persist)

    def d2(a, b):
        return F.aggregate(
            F.zip_with(a, b, lambda x, y: ((x - y) * (x - y)).cast("long")),
            F.lit(0).cast("long"),
            lambda acc, x: acc + x,
        )

    c1 = codes.orderBy("vec_id").limit(1)
    d = codes.crossJoin(
        F.broadcast(c1.select(F.col("codes").alias("c")))
    ).select("vec_id", "codes", d2(F.col("codes"), F.col("c")).alias("d"))
    rows = []
    prev_pick = c1.select("vec_id")
    for idx in range(2, 5):
        d = d.transform(tracked_persist)
        pick = d.orderBy(F.col("d").desc(), F.col("vec_id").asc()).limit(1)
        rows.append(
            prev_pick.crossJoin(F.broadcast(pick.select(F.col("d").alias("radius2"))))
            .select(
                F.lit(idx - 1).cast("int").alias("pick_idx"),
                F.col("vec_id").cast("bigint"),
                F.col("radius2").cast("bigint"),
            )
        )
        d = d.crossJoin(
            F.broadcast(pick.select(F.col("codes").alias("c")))
        ).select(
            "vec_id",
            "codes",
            F.least(F.col("d"), d2(F.col("codes"), F.col("c"))).alias("d"),
        )
        prev_pick = pick.select("vec_id")
    r4 = d.agg(F.max("d").alias("radius2"))
    rows.append(
        prev_pick.crossJoin(F.broadcast(r4)).select(
            F.lit(4).cast("int").alias("pick_idx"),
            F.col("vec_id").cast("bigint"),
            F.col("radius2").cast("bigint"),
        )
    )
    out = rows[0]
    for r in rows[1:]:
        out = out.unionByName(r)
    return out.orderBy("pick_idx")


import math as _math

# LinearCounting small-range correction lookup, m = 256: lc_milli[V] =
# round(m·ln(m/V)·1000) for V empty registers.  Precomputed to integer
# literals so BOTH engines evaluate the identical constant — no libm
# in either plan (the repo-wide libm-free parity contract).
_HLL_LC_CASE = (
    "(CASE (256 - r) "
    + " ".join(
        f"WHEN {v} THEN {round(256 * _math.log(256 / v) * 1000)}"
        for v in range(1, 256)
    )
    + " ELSE 0 END)"
)


@register(
    "approx_distinct_hll",
    f"""
    WITH vals AS (
        SELECT 'l_orderkey' AS column_name, CAST(l_orderkey AS VARCHAR) AS val FROM lineitem
        UNION ALL
        SELECT 'l_partkey', CAST(l_partkey AS VARCHAR) FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', CAST(l_suppkey AS VARCHAR) FROM lineitem
    ),
    rr AS (
        SELECT column_name,
               {_hexat("md5(val)", 1, 2)} AS reg,
               {_hexat("md5(val)", 3, 12)} AS v48,
               val
        FROM vals
    ),
    m AS (
        SELECT column_name, reg,
               MAX(least(CASE WHEN v48 = 0 THEN 49
                              ELSE 49 - length(bin(v48)) END, 30)) AS mj
        FROM rr GROUP BY column_name, reg
    ),
    z AS (
        SELECT column_name, COUNT(*) AS r,
               SUM(1::BIGINT << CAST(30 - mj AS INTEGER)) AS zpart
        FROM m GROUP BY column_name
    ),
    ex AS (SELECT column_name, COUNT(DISTINCT val) AS exact_distinct FROM vals
           GROUP BY column_name),
    est AS (
        SELECT column_name,
               CASE WHEN raw_milli <= 640000 AND r < 256
                    THEN {_HLL_LC_CASE} ELSE raw_milli END AS est_milli
        FROM (
            SELECT column_name, r,
                   (1846528 * (70368744177664000 //
                       (zpart + (256 - r) * 1073741824))) // 2570790 AS raw_milli
            FROM z)
    )
    SELECT est.column_name,
           CAST(est.est_milli AS BIGINT) AS est_milli,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           CAST((1000 * abs(est.est_milli - 1000 * ex.exact_distinct))
                // (1000 * ex.exact_distinct) AS BIGINT) AS err_permille
    FROM est JOIN ex ON ex.column_name = est.column_name
    ORDER BY est.column_name
    """,
)
def approx_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count sketch (Flajolet et al. 2007 — the
    register design behind Spark's own ``approx_count_distinct`` and
    every warehouse's APPROX_COUNT_DISTINCT), run side-by-side with
    the exact count to report realized error: m=256 registers indexed
    by the first md5 hex byte, rank = leading-zero count of the next
    48 hash bits, register state = max rank.  Complements the KMV
    sketch (``approx_distinct_kmv``): HLL is the constant-memory
    (m · 6 bits), mergeable, union-able production sketch.

    Engine parity: rank derives from ``49 − length(bin(v48))`` —
    libm-free — and the harmonic mean runs scaled by 2^30 in EXACT
    integer arithmetic (Σ 2^(30−M_j) + empty·2^30; ranks capped at 30,
    beyond any cardinality both engines see at test SFs), with
    α_256 = 0.7213/(1 + 1.079/256) carried as the exact rational
    1846528/2570790.  The standard small-range LinearCounting
    correction (E ≤ 2.5m with empty registers → m·ln(m/V)) applies via
    a precomputed 255-entry integer lookup (``_HLL_LC_CASE``), keeping
    both plans libm-free; without it the raw estimator reads ~2.4×
    high at n=100 (measured).  A production variant lifts the cap and
    widens to decimal(38) before the α multiply.

    Scale shape: ONE map-side-combined groupBy(column, register) —
    ≤ 3·256 rows out of the heavy aggregate regardless of N (this is
    the whole point of the sketch: merge is register-wise max, so
    partial aggregation does all the work) — followed by |columns|-row
    estimate math.  The exact COUNT(DISTINCT) twin is the sf-bounded
    calibration side, same contract as the KMV query."""
    li = load_testdata(spark, sf_dir, "lineitem")
    vals = _fan_out(
        li.selectExpr(
            "stack(3,"
            " 'l_orderkey', cast(l_orderkey as string),"
            " 'l_partkey', cast(l_partkey as string),"
            " 'l_suppkey', cast(l_suppkey as string)) as (column_name, val)"
        )
    ).transform(tracked_persist)
    rr = vals.select(
        "column_name",
        "val",
        F.expr("cast(conv(substring(md5(cast(val as binary)), 1, 2), 16, 10) as int)").alias(
            "reg"
        ),
        F.expr(
            "cast(conv(substring(md5(cast(val as binary)), 3, 12), 16, 10) as bigint)"
        ).alias("v48"),
    )
    m = rr.groupBy("column_name", "reg").agg(
        F.expr(
            "max(least(case when v48 = 0 then 49"
            " else 49 - length(bin(v48)) end, 30))"
        ).alias("mj")
    )
    z = m.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("r"),
        F.sum(F.expr("shiftleft(cast(1 as bigint), cast(30 - mj as int))")).alias(
            "zpart"
        ),
    )
    est = z.select(
        "column_name",
        "r",
        F.expr(
            "div(1846528 * div(70368744177664000,"
            " zpart + (256 - r) * 1073741824), 2570790)"
        ).alias("raw_milli"),
    ).select(
        "column_name",
        F.expr(
            f"case when raw_milli <= 640000 and r < 256"
            f" then {_HLL_LC_CASE} else raw_milli end"
        ).alias("est_milli"),
    )
    ex = vals.groupBy("column_name").agg(
        F.countDistinct("val").alias("exact_distinct")
    )
    return (
        est.join(ex, "column_name")
        .select(
            "column_name",
            F.col("est_milli").cast("bigint"),
            F.col("exact_distinct").cast("bigint"),
            F.expr(
                "div(1000 * abs(est_milli - 1000 * exact_distinct),"
                " 1000 * exact_distinct)"
            )
            .cast("bigint")
            .alias("err_permille"),
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 2: theta-sketch set operations, exact
# distributed KS two-sample test
# ---------------------------------------------------------------------------


@register(
    "approx_set_ops_kmv",
    """
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hx AS (
        SELECT DISTINCT event_type,
               CAST(concat('0x', substr(md5(CAST(user_id AS VARCHAR)), 1, 8))
                    AS BIGINT) AS v32
        FROM pairs
    ),
    rk AS (
        SELECT event_type, v32,
               ROW_NUMBER() OVER (PARTITION BY event_type ORDER BY v32) AS rk
        FROM hx
    ),
    sk AS (SELECT event_type, v32 FROM rk WHERE rk <= 64),
    tt AS (
        SELECT event_type,
               CASE WHEN COUNT(*) = 64 THEN MAX(v32)
                    ELSE 4294967296 END AS theta
        FROM sk GROUP BY event_type
    ),
    tp AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b,
               greatest(least(a.theta, b.theta), 1) AS theta
        FROM tt a JOIN tt b ON a.event_type < b.event_type
    ),
    ua AS (SELECT p.type_a, p.type_b, p.theta, s.v32
           FROM tp p JOIN sk s ON s.event_type = p.type_a),
    ub AS (SELECT p.type_a, p.type_b, p.theta, s.v32
           FROM tp p JOIN sk s ON s.event_type = p.type_b),
    uni AS (
        SELECT DISTINCT type_a, type_b, v32
        FROM (SELECT * FROM ua UNION ALL SELECT * FROM ub)
        WHERE v32 < theta
    ),
    nu AS (SELECT type_a, type_b, COUNT(*) AS n_u FROM uni
           GROUP BY type_a, type_b),
    ni AS (
        SELECT a.type_a, a.type_b, COUNT(*) AS n_i
        FROM ua a JOIN ub b
          ON b.type_a = a.type_a AND b.type_b = a.type_b AND b.v32 = a.v32
        WHERE a.v32 < a.theta
        GROUP BY a.type_a, a.type_b
    ),
    exn AS (SELECT event_type, COUNT(*) AS n FROM pairs GROUP BY event_type),
    exi AS (
        SELECT x.event_type AS type_a, y.event_type AS type_b,
               COUNT(*) AS exact_inter
        FROM pairs x JOIN pairs y
          ON y.user_id = x.user_id AND x.event_type < y.event_type
        GROUP BY type_a, type_b
    )
    SELECT p.type_a, p.type_b,
           CAST(na.n + nb.n - COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_union,
           CAST((COALESCE(u.n_u, 0) * 4294967296) // p.theta AS BIGINT) AS est_union,
           CAST(COALESCE(e.exact_inter, 0) AS BIGINT) AS exact_inter,
           CAST((COALESCE(i.n_i, 0) * 4294967296) // p.theta AS BIGINT) AS est_inter,
           CAST((1000 * COALESCE(e.exact_inter, 0))
                // (na.n + nb.n - COALESCE(e.exact_inter, 0)) AS BIGINT)
               AS jaccard_exact_milli,
           CAST((1000 * COALESCE(i.n_i, 0))
                // greatest(COALESCE(u.n_u, 0), 1) AS BIGINT) AS jaccard_est_milli,
           CAST((1000 * abs((COALESCE(u.n_u, 0) * 4294967296) // p.theta
                 - (na.n + nb.n - COALESCE(e.exact_inter, 0))))
                // (na.n + nb.n - COALESCE(e.exact_inter, 0)) AS BIGINT)
               AS err_union_permille
    FROM tp p
    JOIN exn na ON na.event_type = p.type_a
    JOIN exn nb ON nb.event_type = p.type_b
    LEFT JOIN exi e ON e.type_a = p.type_a AND e.type_b = p.type_b
    LEFT JOIN nu u ON u.type_a = p.type_a AND u.type_b = p.type_b
    LEFT JOIN ni i ON i.type_a = p.type_a AND i.type_b = p.type_b
    ORDER BY 1, 2
    """,
)
def approx_set_ops_kmv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theta-sketch set operations (Dasgupta et al., the DataSketches
    theta family): estimate |A∪B|, |A∩B| and Jaccard between the user
    sets of every event-type pair from k=64 KMV sketches, next to the
    exact answers.  θ for a pair is the smaller of the two kth-minimum
    hash values; every sketch hash below θ is an inclusion-probability-
    θ/2³² sample of the union, so |A∪B| ≈ |S_∪|·2³²/θ and |A∩B| ≈
    |S_∩|·2³²/θ — the estimator that lets a 100 TB curation run answer
    "how much does source A overlap source B" from two constant-size
    summaries instead of a corpus-scale join.  Hash = first 8 md5 hex
    chars as a 2³²-scaled integer (the ``approx_distinct_kmv``
    convention), all arithmetic integer floor-div, so both engines
    produce bit-identical estimates; sets smaller than k fall back to
    θ=2³² (the sketch is exact there).

    Scale shape: ONE distinct on (type, user) + ONE per-type top-k
    window builds all sketches; everything downstream — the type-pair
    grid, union/intersect sample counts, estimates — runs over ≤
    |types|²·k sketch rows.  The exact union/intersection twin (a
    user-keyed self-equi-join) is the sf-bounded calibrator, same
    contract as the other approx_* queries.  At production the
    sketches persist per source/day and merge associatively; nothing
    rescans history."""
    ev = (
        load_testdata(spark, sf_dir, "events")
        .select("event_type", "user_id")
        .distinct()
        .transform(tracked_persist)
    )
    hx = ev.select(
        "event_type",
        F.expr(
            "cast(conv(substring(md5(cast(cast(user_id as string) as binary)),"
            " 1, 8), 16, 10) as bigint)"
        ).alias("v32"),
    ).distinct()
    w = Window.partitionBy("event_type").orderBy("v32")
    sk = (
        hx.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 64)
        .select("event_type", "v32")
        .transform(tracked_persist)
    )
    tt = sk.groupBy("event_type").agg(
        F.when(F.count(F.lit(1)) == 64, F.max("v32"))
        .otherwise(F.lit(4294967296))
        .alias("theta")
    )
    a = tt.select(F.col("event_type").alias("type_a"), F.col("theta").alias("tha"))
    b = tt.select(F.col("event_type").alias("type_b"), F.col("theta").alias("thb"))
    tp = (
        a.join(F.broadcast(b), F.col("type_a") < F.col("type_b"))
        .select(
            "type_a",
            "type_b",
            F.greatest(F.least("tha", "thb"), F.lit(1)).alias("theta"),
        )
        .transform(tracked_persist)
    )
    ua = F.broadcast(tp).join(
        sk.withColumnRenamed("event_type", "type_a"), "type_a"
    ).select("type_a", "type_b", "theta", "v32")
    ub = F.broadcast(tp).join(
        sk.withColumnRenamed("event_type", "type_b"), "type_b"
    ).select("type_a", "type_b", "theta", "v32")
    nu = (
        ua.unionByName(ub)
        .filter(F.col("v32") < F.col("theta"))
        .select("type_a", "type_b", "v32")
        .distinct()
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_u"))
    )
    ni = (
        ua.filter(F.col("v32") < F.col("theta"))
        .join(ub.select("type_a", "type_b", "v32"), ["type_a", "type_b", "v32"])
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("n_i"))
    )
    exn = ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n"))
    x = ev.select(F.col("event_type").alias("type_a"), "user_id")
    y = ev.select(F.col("event_type").alias("type_b"), "user_id")
    exi = (
        x.join(y, "user_id")
        .filter(F.col("type_a") < F.col("type_b"))
        .groupBy("type_a", "type_b")
        .agg(F.count(F.lit(1)).alias("exact_inter"))
    )
    out = (
        tp.join(F.broadcast(exn.select(F.col("event_type").alias("type_a"), F.col("n").alias("n_a"))), "type_a")
        .join(F.broadcast(exn.select(F.col("event_type").alias("type_b"), F.col("n").alias("n_b"))), "type_b")
        .join(F.broadcast(exi), ["type_a", "type_b"], "left")
        .join(F.broadcast(nu), ["type_a", "type_b"], "left")
        .join(F.broadcast(ni), ["type_a", "type_b"], "left")
        .select(
            "type_a",
            "type_b",
            "theta",
            F.coalesce("exact_inter", F.lit(0)).alias("xi"),
            F.coalesce("n_u", F.lit(0)).alias("n_u"),
            F.coalesce("n_i", F.lit(0)).alias("n_i"),
            (F.col("n_a") + F.col("n_b")).alias("nab"),
        )
    )
    return out.select(
        "type_a",
        "type_b",
        F.expr("nab - xi").cast("bigint").alias("exact_union"),
        F.expr("div(n_u * 4294967296, theta)").cast("bigint").alias("est_union"),
        F.col("xi").cast("bigint").alias("exact_inter"),
        F.expr("div(n_i * 4294967296, theta)").cast("bigint").alias("est_inter"),
        F.expr("div(1000 * xi, nab - xi)").cast("bigint").alias("jaccard_exact_milli"),
        F.expr("div(1000 * n_i, greatest(n_u, 1))")
        .cast("bigint")
        .alias("jaccard_est_milli"),
        F.expr(
            "div(1000 * abs(div(n_u * 4294967296, theta) - (nab - xi)), nab - xi)"
        )
        .cast("bigint")
        .alias("err_union_permille"),
    ).orderBy("type_a", "type_b")


@register(
    "stats_ks_two_sample",
    """
    WITH vals AS (
        SELECT l_returnflag AS grp,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS v
        FROM lineitem
    ),
    tot AS (SELECT grp, COUNT(*) AS n_grp FROM vals GROUP BY grp),
    nall AS (SELECT COUNT(*) AS n_all FROM vals),
    cnt AS (SELECT grp, v, COUNT(*) AS c FROM vals GROUP BY grp, v),
    grid AS (SELECT v, COUNT(*) AS nt FROM vals GROUP BY v),
    flags AS (SELECT DISTINCT grp FROM vals),
    dense AS (
        SELECT f.grp, g.v, g.nt, COALESCE(c.c, 0) AS c
        FROM grid g CROSS JOIN flags f
        LEFT JOIN cnt c ON c.grp = f.grp AND c.v = g.v
    ),
    cums AS (
        SELECT grp, v,
               SUM(c) OVER (PARTITION BY grp ORDER BY v) AS cum_c,
               SUM(nt) OVER (PARTITION BY grp ORDER BY v) AS cum_t
        FROM dense
    ),
    d AS (
        SELECT cu.grp, cu.v,
               abs(cu.cum_c * (n.n_all - t.n_grp)
                   - (cu.cum_t - cu.cum_c) * t.n_grp) AS diff,
               t.n_grp, n.n_all
        FROM cums cu JOIN tot t ON t.grp = cu.grp, nall n
    ),
    mx AS (SELECT grp, n_grp, n_all, MAX(diff) AS maxdiff
           FROM d GROUP BY grp, n_grp, n_all),
    loc AS (
        SELECT d.grp, MIN(d.v) AS ks_at_centi
        FROM d JOIN mx ON mx.grp = d.grp AND d.diff = mx.maxdiff
        GROUP BY d.grp
    )
    SELECT m.grp AS l_returnflag,
           CAST(m.n_grp AS BIGINT) AS n_grp,
           CAST(m.n_all - m.n_grp AS BIGINT) AS n_rest,
           CAST(m.maxdiff AS BIGINT) AS diff_scaled,
           CAST((1000000 * m.maxdiff) // (m.n_grp * (m.n_all - m.n_grp))
               AS BIGINT) AS d_micro,
           CAST(l.ks_at_centi AS BIGINT) AS ks_at_centi
    FROM mx m JOIN loc l ON l.grp = m.grp
    ORDER BY l_returnflag
    """,
)
def stats_ks_two_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic, one-vs-rest per
    return flag over the extended-price distribution — the
    distribution-shift gate a data pipeline runs between corpus slices
    (did this source/shard/day drift?).  D = max_v |F_grp(v) −
    F_rest(v)| is computed EXACTLY in integer arithmetic: the max is
    over |cum_grp·n_rest − cum_rest·n_grp| (common-denominator form),
    reported both raw (``diff_scaled``) and as ``d_micro`` =
    ⌊10⁶·D⌋, plus the price point attaining it (ties broken to the
    smallest — deterministic on both engines; prices are exact
    centi-units so the double→int conversion is collision-free).

    The distributed heart is ``operators/prefixsum.bucketed_cumsum``:
    a GLOBAL window (`SUM OVER (ORDER BY v)` with no partition — the
    oracle's spelling, and the classic single-task scale-killer) is
    replaced by per-bucket partial sums + broadcast exclusive offsets
    + a window partitioned by (grp, bucket), so ECDFs over arbitrarily
    many distinct values never serialize onto one task.

    Scale shape (rewritten round 11, VERDICT r10 "Next" #3 — the fleet's
    most expensive untouched query at 6.5 s): ONE pass over lineitem
    into the (grp, v) count grid; everything else derives from that
    cached grid — the per-value totals and per-flag counts come from a
    single ``groupBy(v)`` that folds the ≤|flags| per-value counts into
    a map (``map_from_entries(collect_list(...))``), and the dense
    ECDF input is a broadcast crossJoin with the flag list plus a map
    lookup.  The old shape scanned the cached corpus FIVE times (cnt,
    grid, flags, tot, nall) and re-shuffled the grid×flags frame to
    (grp, v) for a sort-merge join against cnt; the new shape has no
    (grp, v) join at all and its widest shuffles are the two grid
    aggregations.  Then the two-level scan, one max-agg, and the
    equi-join-back for the argmax location, unchanged.  At 100 TB
    n_grp·n_rest exceeds 2⁶³ for micro-scaling — widen the final
    division to decimal(38,0); the comparisons themselves stay in
    bigint common-denominator form far longer."""
    from .operators.prefixsum import bucketed_cumsum

    li = _fan_out(
        load_testdata(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("grp"),
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("v"),
        )
    )
    cnt = tracked_persist(li.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c")))
    # per-value totals + the bounded (≤|flags| entries) per-flag count
    # map, in one combinable aggregate over the cached count grid.  NOT
    # persisted: its two consumers sit above bucketed_cumsum's shared
    # repartition exchange, so ReusedExchange computes it once anyway.
    pv = cnt.groupBy("v").agg(
        F.sum("c").alias("nt"),
        F.map_from_entries(F.collect_list(F.struct("grp", "c"))).alias("m"),
    )
    tot = cnt.groupBy("grp").agg(F.sum("c").alias("n_grp"))
    flags = tot.select("grp")
    nall = tot.agg(F.sum("n_grp").alias("n_all"))
    dense = pv.crossJoin(F.broadcast(flags)).select(
        "grp",
        "v",
        "nt",
        F.coalesce(F.element_at("m", F.col("grp")), F.lit(0)).alias("c"),
    )
    cums = bucketed_cumsum(dense, ["grp"], "v", ["c", "nt"], bucket_width=100_000)
    d = (
        cums.join(F.broadcast(tot), "grp")
        .crossJoin(F.broadcast(nall))
        .select(
            "grp",
            "v",
            "n_grp",
            "n_all",
            F.abs(
                F.col("cum_c") * (F.col("n_all") - F.col("n_grp"))
                - (F.col("cum_nt") - F.col("cum_c")) * F.col("n_grp")
            ).alias("diff"),
        )
    )
    # one-pass deterministic argmax: max over (diff, -v) structs is
    # lexicographic, so it yields max diff AND, among ties, the minimum
    # v — exactly the oracle's MAX(diff) + MIN(v at max) pair — without
    # persisting d, without the join-back on (grp, diff), and without
    # the final mx⋈loc join.  Combinable (a declarative MAX), so it is
    # also the scan-once shape 100 TB wants.
    mx = d.groupBy("grp", "n_grp", "n_all").agg(
        F.max(F.struct(F.col("diff"), (-F.col("v")).alias("nv"))).alias("s")
    )
    return mx.select(
        F.col("grp").alias("l_returnflag"),
        F.col("n_grp").cast("bigint"),
        (F.col("n_all") - F.col("n_grp")).cast("bigint").alias("n_rest"),
        F.col("s.diff").cast("bigint").alias("diff_scaled"),
        F.expr("div(1000000 * s.diff, n_grp * (n_all - n_grp))")
        .cast("bigint")
        .alias("d_micro"),
        (-F.col("s.nv")).cast("bigint").alias("ks_at_centi"),
    ).orderBy("l_returnflag")


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 3: priority sampling, sketch mergeability
# ---------------------------------------------------------------------------


@register(
    "sample_priority_topk",
    f"""
    WITH it AS (
        SELECT l_returnflag AS grp, l_orderkey, l_linenumber,
               CAST(round(l_extendedprice * 100) AS BIGINT) AS w
        FROM lineitem
    ),
    pr AS (
        SELECT grp, l_orderkey, l_linenumber, w,
               (w * 4294967296) // ({_hexat("md5(concat_ws('#', l_orderkey, l_linenumber))", 1, 8)} + 1) AS q
        FROM it
    ),
    rk AS (
        SELECT grp, w, q,
               ROW_NUMBER() OVER (PARTITION BY grp
                    ORDER BY q DESC, l_orderkey, l_linenumber) AS rk
        FROM pr
    ),
    tau AS (SELECT grp, q AS tau FROM rk WHERE rk = 129),
    smp AS (
        SELECT r.grp, SUM(greatest(r.w, COALESCE(t.tau, 0))) AS est,
               COUNT(*) AS sample_k
        FROM rk r LEFT JOIN tau t ON t.grp = r.grp
        WHERE r.rk <= 128
        GROUP BY r.grp
    ),
    ex AS (SELECT grp, COUNT(*) AS n_items, SUM(w) AS exact_total
           FROM it GROUP BY grp)
    SELECT e.grp AS l_returnflag,
           CAST(e.n_items AS BIGINT) AS n_items,
           CAST(s.sample_k AS BIGINT) AS sample_k,
           CAST(COALESCE(t.tau, 0) AS BIGINT) AS tau_centi,
           CAST(e.exact_total AS BIGINT) AS exact_total_centi,
           CAST(s.est AS BIGINT) AS est_total_centi,
           CAST((1000 * abs(s.est - e.exact_total)) // e.exact_total AS BIGINT)
               AS err_permille
    FROM ex e
    JOIN smp s ON s.grp = e.grp
    LEFT JOIN tau t ON t.grp = e.grp
    ORDER BY 1
    """,
)
def sample_priority_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Priority sampling (Duffield-Lund-Thorup 2007 — the weighted
    bottom-k scheme warehouses use for unbiased subset-sum estimates
    from a FIXED-size sample): each row gets priority q = w/u with u
    a hash-uniform in (0,1]; keep the k=128 highest-priority rows per
    return flag; the estimator Σ max(w_i, τ) over the sample — τ the
    (k+1)th priority — is provably unbiased for Σw.  Reported beside
    the exact per-group revenue total with realized error, like the
    other sketch calibrators (KMV/HLL/CMS).  Groups smaller than k
    degrade to the exact total (τ = 0).

    Everything is integer-exact on both engines: w in price
    centi-units, u as (first-8-md5-hex + 1)/2³², q = w·2³²//u32
    (floor), ties broken by (orderkey, linenumber) so sample
    membership and τ are bit-identical.

    Scale shape: one map computes priorities; the per-group top-129 is
    a rank window that gets Spark's Partial WindowGroupLimit (each map
    task emits ≤129 rows per group pre-shuffle — the same bounded
    shape as the KMV sketch build); the estimate is one aggregate over
    ≤128·|groups| rows.  The exact-total twin is the sf-bounded
    calibration side.  At 100 TB the sample IS the product: a 128-row
    summary per group answers any later subset-sum question without
    rescanning."""
    li = _fan_out(
        load_testdata(spark, sf_dir, "lineitem").select(
            F.col("l_returnflag").alias("grp"),
            "l_orderkey",
            "l_linenumber",
            F.expr("cast(round(l_extendedprice * 100) as bigint)").alias("w"),
        )
    )
    pr = li.withColumn(
        "q",
        F.expr(
            "div(w * 4294967296,"
            " cast(conv(substring(md5(cast(concat_ws('#', l_orderkey,"
            " l_linenumber) as binary)), 1, 8), 16, 10) as bigint) + 1)"
        ),
    )
    w = Window.partitionBy("grp").orderBy(
        F.col("q").desc(), "l_orderkey", "l_linenumber"
    )
    rk = (
        pr.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 129)
        .transform(tracked_persist)
    )
    tau = rk.filter(F.col("rk") == 129).select("grp", F.col("q").alias("tau"))
    smp = (
        rk.filter(F.col("rk") <= 128)
        .join(F.broadcast(tau), "grp", "left")
        .groupBy("grp")
        .agg(
            F.sum(F.greatest("w", F.coalesce("tau", F.lit(0)))).alias("est"),
            F.count(F.lit(1)).alias("sample_k"),
        )
    )
    ex = li.groupBy("grp").agg(
        F.count(F.lit(1)).alias("n_items"), F.sum("w").alias("exact_total")
    )
    return (
        ex.join(F.broadcast(smp), "grp")
        .join(F.broadcast(tau), "grp", "left")
        .select(
            F.col("grp").alias("l_returnflag"),
            F.col("n_items").cast("bigint"),
            F.col("sample_k").cast("bigint"),
            F.coalesce("tau", F.lit(0)).cast("bigint").alias("tau_centi"),
            F.col("exact_total").cast("bigint").alias("exact_total_centi"),
            F.col("est").cast("bigint").alias("est_total_centi"),
            F.expr("div(1000 * abs(est - exact_total), exact_total)")
            .cast("bigint")
            .alias("err_permille"),
        )
        .orderBy("l_returnflag")
    )


@register(
    "approx_distinct_hll_merged",
    f"""
    WITH vals AS (
        SELECT CAST(date_trunc('day', ts) AS DATE) AS day,
               md5(CAST(user_id AS VARCHAR)) AS h
        FROM events
    ),
    rr AS (
        SELECT day, {_hexat("h", 1, 2)} AS reg, {_hexat("h", 3, 12)} AS v48, h
        FROM vals
    ),
    daily AS (
        SELECT day, reg,
               MAX(least(CASE WHEN v48 = 0 THEN 49
                              ELSE 49 - length(bin(v48)) END, 30)) AS mj
        FROM rr GROUP BY day, reg
    ),
    merged AS (SELECT reg, MAX(mj) AS mj FROM daily GROUP BY reg),
    direct AS (
        SELECT reg,
               MAX(least(CASE WHEN v48 = 0 THEN 49
                              ELSE 49 - length(bin(v48)) END, 30)) AS mj
        FROM rr GROUP BY reg
    ),
    est AS (
        SELECT src,
               CASE WHEN raw_milli <= 640000 AND r < 256
                    THEN {_HLL_LC_CASE} ELSE raw_milli END AS est_milli
        FROM (
            SELECT src, r,
                   (1846528 * (70368744177664000 //
                       (zpart + (256 - r) * 1073741824))) // 2570790 AS raw_milli
            FROM (
                SELECT 'merged' AS src, COUNT(*) AS r,
                       SUM(1::BIGINT << CAST(30 - mj AS INTEGER)) AS zpart
                FROM merged
                UNION ALL
                SELECT 'direct', COUNT(*),
                       SUM(1::BIGINT << CAST(30 - mj AS INTEGER))
                FROM direct))
    ),
    ex AS (SELECT COUNT(DISTINCT h) AS exact_distinct FROM vals),
    nd AS (SELECT COUNT(DISTINCT day) AS n_days FROM vals)
    SELECT CAST(nd.n_days AS BIGINT) AS n_days,
           CAST(ex.exact_distinct AS BIGINT) AS exact_distinct,
           CAST(d.est_milli AS BIGINT) AS est_direct_milli,
           CAST(m.est_milli AS BIGINT) AS est_merged_milli,
           CAST(CASE WHEN m.est_milli = d.est_milli THEN 1 ELSE 0 END
               AS INTEGER) AS merged_equals_direct,
           CAST((1000 * abs(m.est_milli - 1000 * ex.exact_distinct))
                // (1000 * ex.exact_distinct) AS BIGINT) AS err_permille
    FROM ex, nd,
         (SELECT est_milli FROM est WHERE src = 'merged') m,
         (SELECT est_milli FROM est WHERE src = 'direct') d
    """,
)
def approx_distinct_hll_merged(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL sketch MERGEABILITY — the property that makes the sketch a
    pipeline primitive rather than a one-shot query: per-day register
    states (the "daily sketch table" a 100 TB ingest materializes
    incrementally) merged by register-wise max must yield the SAME
    registers — and therefore the bit-identical estimate — as one
    direct pass over all days.  Reports both estimates, the equality
    flag, and realized error vs the exact multi-day distinct-user
    count.  Same m=256 / integer-harmonic-mean / LinearCounting
    machinery as ``approx_distinct_hll`` (contract documented there).

    Scale shape: the daily sketch build is one map-side-combined
    groupBy(day, reg) — ≤256 rows out per day regardless of volume;
    the merge is a groupBy(reg) over |days|·256 rows; nothing ever
    rescans history.  The direct pass and exact count are the
    sf-bounded calibration sides."""
    ev = _fan_out(
        load_testdata(spark, sf_dir, "events").select(
            F.to_date(F.date_trunc("day", "ts")).alias("day"),
            F.md5(F.col("user_id").cast("string").cast("binary")).alias("h"),
        )
    ).transform(tracked_persist)
    rr = ev.select(
        "day",
        "h",
        F.expr("cast(conv(substring(h, 1, 2), 16, 10) as int)").alias("reg"),
        F.expr("cast(conv(substring(h, 3, 12), 16, 10) as bigint)").alias("v48"),
    )
    rank = (
        "max(least(case when v48 = 0 then 49"
        " else 49 - length(bin(v48)) end, 30))"
    )
    daily = rr.groupBy("day", "reg").agg(F.expr(rank).alias("mj"))
    merged = daily.groupBy("reg").agg(F.max("mj").alias("mj"))
    direct = rr.groupBy("reg").agg(F.expr(rank).alias("mj"))

    def estimate(regs: DataFrame, label: str) -> DataFrame:
        z = regs.agg(
            F.count(F.lit(1)).alias("r"),
            F.sum(
                F.expr("shiftleft(cast(1 as bigint), cast(30 - mj as int))")
            ).alias("zpart"),
        )
        return z.select(
            F.expr(
                "case when div(1846528 * div(70368744177664000,"
                " zpart + (256 - r) * 1073741824), 2570790) <= 640000"
                " and r < 256 then " + _HLL_LC_CASE + " else"
                " div(1846528 * div(70368744177664000,"
                " zpart + (256 - r) * 1073741824), 2570790) end"
            ).alias(f"est_{label}_milli")
        )

    ex = ev.agg(F.countDistinct("h").alias("exact_distinct"))
    nd = ev.agg(F.countDistinct("day").alias("n_days"))
    return (
        nd.crossJoin(F.broadcast(ex))
        .crossJoin(F.broadcast(estimate(direct, "direct")))
        .crossJoin(F.broadcast(estimate(merged, "merged")))
        .select(
            F.col("n_days").cast("bigint"),
            F.col("exact_distinct").cast("bigint"),
            F.col("est_direct_milli").cast("bigint"),
            F.col("est_merged_milli").cast("bigint"),
            F.when(F.col("est_merged_milli") == F.col("est_direct_milli"), 1)
            .otherwise(0)
            .cast("int")
            .alias("merged_equals_direct"),
            F.expr(
                "div(1000 * abs(est_merged_milli - 1000 * exact_distinct),"
                " 1000 * exact_distinct)"
            )
            .cast("bigint")
            .alias("err_permille"),
        )
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 4: chi-square independence, decayed engagement
# ---------------------------------------------------------------------------


@register(
    "stats_chi2_independence",
    """
    WITH obs AS (
        SELECT l_returnflag AS flag, l_linestatus AS status,
               COUNT(*) AS o
        FROM lineitem GROUP BY 1, 2
    ),
    rr AS (SELECT flag, SUM(o) AS r FROM obs GROUP BY flag),
    cc AS (SELECT status, SUM(o) AS c FROM obs GROUP BY status),
    nn AS (SELECT SUM(o) AS n FROM obs),
    cells AS (
        SELECT o.flag, o.status, o.o, r.r, c.c, n.n,
               o.o * n.n - r.r * c.c AS diff
        FROM obs o
        JOIN rr r ON r.flag = o.flag
        JOIN cc c ON c.status = o.status, nn n
    )
    SELECT flag AS l_returnflag, status AS l_linestatus,
           CAST(o AS BIGINT) AS observed,
           CAST((1000 * r * c) // n AS BIGINT) AS expected_milli,
           CAST(floor((1000000.0 * CAST(diff AS DOUBLE) * CAST(diff AS DOUBLE))
                / (CAST(r AS DOUBLE) * CAST(c AS DOUBLE) * CAST(n AS DOUBLE)
                   * CAST(n AS DOUBLE))) AS BIGINT) AS contrib_micro
    FROM cells
    ORDER BY 1, 2
    """,
)
def stats_chi2_independence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson chi-square test of independence between return flag and
    line status — the categorical-association audit a curation
    pipeline runs between metadata dimensions (is source independent
    of language? does the quality band depend on the shard?).  Per
    cell: observed count, expected count under independence
    (milli-exact integers: ⌊1000·R·C/N⌋), and the chi-square
    contribution (O−E)²/E in micro-units via the common-denominator
    form (O·N − R·C)²/(R·C·N²) — the integer numerator diff is exact;
    the one double fold is written identically on both engines (the
    repo's strict-fold parity contract).  Σ contrib_micro / 10⁶ is the
    chi-square statistic; compare against the χ²((R−1)(C−1)) critical
    value offline.

    Scale shape: ONE map-side-combined groupBy over the two
    categorical columns (cells bounded by the category-domain product,
    not N), then row/column margins and the test statistic live
    entirely on the bounded cell relation.  This never gets harder at
    100 TB — the heavy aggregate's output is |flags|×|statuses|
    rows."""
    obs = (
        _fan_out(
            load_testdata(spark, sf_dir, "lineitem").select(
                F.col("l_returnflag").alias("flag"),
                F.col("l_linestatus").alias("status"),
            )
        )
        .groupBy("flag", "status")
        .agg(F.count(F.lit(1)).alias("o"))
        .transform(tracked_persist)
    )
    rr = obs.groupBy("flag").agg(F.sum("o").alias("r"))
    cc = obs.groupBy("status").agg(F.sum("o").alias("c"))
    nn = obs.agg(F.sum("o").alias("n"))
    cells = (
        obs.join(F.broadcast(rr), "flag")
        .join(F.broadcast(cc), "status")
        .crossJoin(F.broadcast(nn))
        .withColumn("diff", F.col("o") * F.col("n") - F.col("r") * F.col("c"))
    )
    return cells.select(
        F.col("flag").alias("l_returnflag"),
        F.col("status").alias("l_linestatus"),
        F.col("o").cast("bigint").alias("observed"),
        F.expr("div(1000 * r * c, n)").cast("bigint").alias("expected_milli"),
        F.expr(
            "cast(floor((1000000.0 * cast(diff as double) * cast(diff as double))"
            " / (cast(r as double) * cast(c as double) * cast(n as double)"
            " * cast(n as double))) as bigint)"
        ).alias("contrib_micro"),
    ).orderBy("l_returnflag", "l_linestatus")


@register(
    "events_decayed_engagement",
    """
    WITH mx AS (SELECT MAX(CAST(ts AS DATE)) AS mxd FROM events),
    ev AS (
        SELECT event_type,
               greatest(CAST(round(value * 1000) AS BIGINT), 0) AS v_milli,
               least(datediff('day', CAST(ts AS DATE), mxd), 210) AS age_days
        FROM events, mx
    ),
    dec AS (
        SELECT event_type,
               v_milli // (1::BIGINT << CAST(age_days // 7 AS INTEGER))
                   AS w7,
               v_milli // (1::BIGINT << CAST(age_days // 30 AS INTEGER))
                   AS w30
        FROM ev
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(w7) AS BIGINT) AS decayed_7d_milli,
           CAST(SUM(w30) AS BIGINT) AS decayed_30d_milli,
           CAST(SUM(CASE WHEN w7 > 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_alive_7d
    FROM dec GROUP BY event_type ORDER BY event_type
    """,
)
def events_decayed_engagement(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-decayed engagement scoring — the recency-weighted
    aggregate behind feature stores and freshness-aware mixture
    weights (yesterday's signal counts more than last quarter's).
    Each event's value decays by halving per half-life elapsed
    (dyadic decay: weight = v ≫ ⌊age/halflife⌋ — integer-exact on
    both engines, no libm; v_milli is clamped non-negative so
    Spark's truncating div() and DuckDB's flooring // agree by
    construction, not by data invariant), reported at 7-day and
    30-day half-lives
    per event type, with the count of events still contributing at
    the 7-day rate.  Ages cap at 210 days so the shift stays in
    bigint range; a production variant uses the standard
    exp(−λ·age) in double.

    Scale shape: one 1-row max-date aggregate broadcast into a
    map-only decay projection, then ONE map-side-combined
    groupBy(event_type) — combinable all the way down, streaming- and
    incremental-friendly (the decayed sum re-bases by one more shift
    per elapsed half-life)."""
    ev0 = _fan_out(load_testdata(spark, sf_dir, "events").select("event_type", "value", "ts"))
    mx = ev0.agg(F.max(F.to_date("ts")).alias("mxd"))
    dec = (
        ev0.crossJoin(F.broadcast(mx))
        .select(
            "event_type",
            F.expr("greatest(cast(round(value * 1000) as bigint), 0)").alias("v_milli"),
            F.expr("least(datediff(mxd, cast(ts as date)), 210)").alias("age_days"),
        )
        .select(
            "event_type",
            F.expr(
                "div(v_milli, shiftleft(cast(1 as bigint),"
                " cast(div(age_days, 7) as int)))"
            ).alias("w7"),
            F.expr(
                "div(v_milli, shiftleft(cast(1 as bigint),"
                " cast(div(age_days, 30) as int)))"
            ).alias("w30"),
        )
    )
    return (
        dec.groupBy("event_type")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_events"),
            F.sum("w7").cast("bigint").alias("decayed_7d_milli"),
            F.sum("w30").cast("bigint").alias("decayed_30d_milli"),
            F.sum(F.when(F.col("w7") > 0, 1).otherwise(0))
            .cast("bigint")
            .alias("n_alive_7d"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 5: Mann-Whitney rank test, source-drift TVD
# ---------------------------------------------------------------------------


@register(
    "events_mannwhitney_auc",
    """
    WITH vals AS (
        SELECT event_type AS grp,
               CAST(round(value * 1000) AS BIGINT) AS v
        FROM events
    ),
    cnt AS (SELECT grp, v, COUNT(*) AS c FROM vals GROUP BY grp, v),
    grid AS (SELECT v, COUNT(*) AS nt FROM vals GROUP BY v),
    mid AS (
        SELECT v, 2 * SUM(nt) OVER (ORDER BY v) - nt + 1 AS mid2
        FROM grid
    ),
    tot AS (SELECT grp, COUNT(*) AS n_grp FROM vals GROUP BY grp),
    nall AS (SELECT COUNT(*) AS n_all FROM vals),
    r2 AS (
        SELECT c.grp, SUM(c.c * m.mid2) AS r2_sum
        FROM cnt c JOIN mid m ON m.v = c.v
        GROUP BY c.grp
    )
    SELECT t.grp AS event_type,
           CAST(t.n_grp AS BIGINT) AS n_grp,
           CAST(n.n_all - t.n_grp AS BIGINT) AS n_rest,
           CAST(r.r2_sum AS BIGINT) AS r2_sum,
           CAST(r.r2_sum - t.n_grp * (t.n_grp + 1) AS BIGINT) AS u2,
           CAST((1000000 * (r.r2_sum - t.n_grp * (t.n_grp + 1)))
                // (2 * t.n_grp * (n.n_all - t.n_grp)) AS BIGINT) AS auc_micro
    FROM tot t JOIN r2 r ON r.grp = t.grp, nall n
    ORDER BY event_type
    """,
)
def events_mannwhitney_auc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mann-Whitney U rank-sum test, one-vs-rest per event type over
    the value distribution — the nonparametric shift detector that
    (unlike KS) reads directly as an effect size: U/(n₁·n₂) is the
    probability a random value from the group exceeds one from the
    rest (the AUC).  Exact integer arithmetic throughout: ties get
    textbook midranks carried as DOUBLED ranks (mid2 = 2·cum − m + 1,
    always integral), the rank-sum and U are kept doubled (``r2_sum``,
    ``u2``), and ``auc_micro`` = ⌊10⁶·U/(n₁·n₂)⌋ — bit-identical on
    both engines, no float ranks anywhere.

    Scale shape: value-grid counts are ONE map-side-combined groupBy;
    global midranks come from ``operators/prefixsum.bucketed_cumsum``
    in its single-series mode (the oracle's ``SUM() OVER (ORDER BY
    v)`` global window is exactly the single-task shape the operator
    replaces); the rank-sum is one equi-join on the value grid + one
    combinable aggregate per group.  Everything after the grid is
    bounded by |distinct values|, not N."""
    from .operators.prefixsum import bucketed_cumsum

    ev = _fan_out(
        load_testdata(spark, sf_dir, "events").select(
            F.col("event_type").alias("grp"),
            F.expr("cast(round(value * 1000) as bigint)").alias("v"),
        )
    ).transform(tracked_persist)
    cnt = ev.groupBy("grp", "v").agg(F.count(F.lit(1)).alias("c"))
    grid = ev.groupBy("v").agg(F.count(F.lit(1)).alias("nt"))
    mid = bucketed_cumsum(grid, [], "v", ["nt"], bucket_width=10_000).select(
        "v", (2 * F.col("cum_nt") - F.col("nt") + 1).alias("mid2")
    )
    r2 = (
        cnt.join(mid, "v")
        .groupBy("grp")
        .agg(F.sum(F.col("c") * F.col("mid2")).alias("r2_sum"))
    )
    tot = ev.groupBy("grp").agg(F.count(F.lit(1)).alias("n_grp"))
    nall = ev.agg(F.count(F.lit(1)).alias("n_all"))
    return (
        tot.join(F.broadcast(r2), "grp")
        .crossJoin(F.broadcast(nall))
        .select(
            F.col("grp").alias("event_type"),
            F.col("n_grp").cast("bigint"),
            (F.col("n_all") - F.col("n_grp")).cast("bigint").alias("n_rest"),
            F.col("r2_sum").cast("bigint"),
            (F.col("r2_sum") - F.col("n_grp") * (F.col("n_grp") + 1))
            .cast("bigint")
            .alias("u2"),
            F.expr(
                "div(1000000 * (r2_sum - n_grp * (n_grp + 1)),"
                " 2 * n_grp * (n_all - n_grp))"
            )
            .cast("bigint")
            .alias("auc_micro"),
        )
        .orderBy("event_type")
    )


@register(
    "text_source_token_tvd",
    r"""
    WITH tk AS (
        SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    st AS (SELECT source, tok, COUNT(*) AS c FROM tk GROUP BY source, tok),
    tt AS (SELECT tok, COUNT(*) AS ct FROM tk GROUP BY tok),
    ns AS (SELECT source, SUM(c) AS n_s FROM st GROUP BY source),
    nn AS (SELECT SUM(ct) AS n FROM tt),
    present AS (
        SELECT s.source,
               SUM(abs(s.c * (n.n - x.n_s) - (t.ct - s.c) * x.n_s))
                   AS present_mass,
               SUM(t.ct - s.c) AS rest_in_vocab
        FROM st s
        JOIN tt t ON t.tok = s.tok
        JOIN ns x ON x.source = s.source, nn n
        GROUP BY s.source
    )
    SELECT p.source,
           CAST(x.n_s AS BIGINT) AS n_tokens,
           CAST(n.n - x.n_s AS BIGINT) AS n_rest,
           CAST((1000000 * (p.present_mass
                 + x.n_s * ((n.n - x.n_s) - p.rest_in_vocab)))
                // (2 * x.n_s * (n.n - x.n_s)) AS BIGINT) AS tvd_micro
    FROM present p JOIN ns x ON x.source = p.source, nn n
    ORDER BY p.source
    """,
)
def text_source_token_tvd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Total-variation distance between each source's token
    distribution and the rest of the corpus — the exact drift metric
    behind "is this crawl slice distributionally off?" (TVD, unlike
    KL/JS, needs no logarithms, so it is integer-expressible and
    bit-identical on both engines).  TVD = ½·Σ_t |p_s(t) − p_rest(t)|
    evaluated in common-denominator form |c_s·N_r − c_r·N_s| over the
    source's own vocabulary, plus the closed-form correction
    N_s·(N_r − Σ_{t∈vocab_s} c_r(t)) for the mass of tokens the source
    never uses — no dense vocab×source grid is ever materialized.

    Scale shape: two map-side-combined groupBys (per-source-token,
    per-token), one equi-join on token between them (the widest
    shuffle, vocab-sized), margins broadcast.  The absent-token mass
    is algebra, not a join — the trick that keeps one-vs-rest drift
    linear in corpus vocabulary at 100 TB."""
    tk = (
        _fan_out(load_testdata(spark, sf_dir, "documents").select("source", "text"))
        .select("source", F.explode(F.split("text", X.TOKEN_RE)).alias("tok"))
        .transform(tracked_persist)
    )
    st = tk.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    tt = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("ct"))
    ns = tk.groupBy("source").agg(F.count(F.lit(1)).alias("n_s"))
    nn = tk.agg(F.count(F.lit(1)).alias("n"))
    present = (
        st.join(tt, "tok")
        .join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nn))
        .groupBy("source")
        .agg(
            F.sum(
                F.abs(
                    F.col("c") * (F.col("n") - F.col("n_s"))
                    - (F.col("ct") - F.col("c")) * F.col("n_s")
                )
            ).alias("present_mass"),
            F.sum(F.col("ct") - F.col("c")).alias("rest_in_vocab"),
        )
    )
    return (
        present.join(F.broadcast(ns), "source")
        .crossJoin(F.broadcast(nn))
        .select(
            "source",
            F.col("n_s").cast("bigint").alias("n_tokens"),
            (F.col("n") - F.col("n_s")).cast("bigint").alias("n_rest"),
            F.expr(
                "div(1000000 * (present_mass + n_s * ((n - n_s) - rest_in_vocab)),"
                " 2 * n_s * (n - n_s))"
            )
            .cast("bigint")
            .alias("tvd_micro"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 6: vocab coverage curve, CUSUM changepoints
# ---------------------------------------------------------------------------


@register(
    "vocab_coverage_curve",
    r"""
    WITH tk AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS c FROM tk GROUP BY tok),
    coc AS (SELECT c, COUNT(*) AS m FROM tc GROUP BY c),
    tot AS (SELECT SUM(c * m) AS n_total, SUM(m) AS n_vocab FROM coc),
    cum AS (
        SELECT c, m,
               SUM(c * m) OVER (ORDER BY c DESC) AS mass_cum,
               SUM(m) OVER (ORDER BY c DESC) AS vocab_cum
        FROM coc
    ),
    targets AS (SELECT unnest([500, 900, 990, 999]) AS target_permille),
    hit AS (
        SELECT t.target_permille,
               MIN(cu.vocab_cum - cu.m
                   + ((t.target_permille * x.n_total + 999) // 1000
                      - (cu.mass_cum - cu.c * cu.m) + cu.c - 1) // cu.c)
                   AS vocab_needed
        FROM targets t
        JOIN cum cu ON cu.mass_cum * 1000 >= t.target_permille * (SELECT n_total FROM tot), tot x
        WHERE (cu.mass_cum - cu.c * cu.m) * 1000 < t.target_permille * x.n_total
        GROUP BY t.target_permille
    )
    SELECT h.target_permille,
           CAST(h.vocab_needed AS BIGINT) AS vocab_needed,
           CAST(x.n_vocab AS BIGINT) AS n_vocab,
           CAST(x.n_total AS BIGINT) AS n_total,
           CAST((1000000 * h.vocab_needed) // x.n_vocab AS BIGINT)
               AS vocab_share_micro
    FROM hit h, tot x
    ORDER BY h.target_permille
    """,
)
def vocab_coverage_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary coverage curve — the tokenizer-budget planning
    readout: the minimum number of (frequency-ranked) vocabulary
    entries needed to cover 50% / 90% / 99% / 99.9% of all corpus
    token occurrences, exactly.  The classic Zipf consequence (a tiny
    head covers most mass) decides vocab size, OOV policy, and what
    the long tail costs.

    Exactness without a global token sort: group the vocabulary by
    count value (the count-of-counts relation, bounded by |distinct
    count values| ≤ √(2N)), take cumulative mass/vocab over counts
    DESCENDING, locate the count bin where the target mass falls, and
    finish inside the bin by ceiling division — within a bin every
    token has the same count, so the needed number of its tokens is
    ⌈remaining_mass / c⌉.  All integer arithmetic, deterministic on
    both engines.

    Scale shape: ONE map-side-combined groupBy(token) (the only
    corpus-scale shuffle), ONE groupBy(count) collapsing the vocab to
    the bounded count-of-counts relation, then windows/joins over that
    tiny relation (the oracle's global window is fine THERE — it runs
    on ≤ a few thousand rows; the Spark side uses the same bounded
    window, not a corpus-wide sort)."""
    tk = _fan_out(load_testdata(spark, sf_dir, "documents").select("text")).select(
        F.explode(F.split("text", X.TOKEN_RE)).alias("tok")
    )
    tc = tk.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    coc = tc.groupBy("c").agg(F.count(F.lit(1)).alias("m")).transform(tracked_persist)
    tot = coc.agg(
        F.sum(F.col("c") * F.col("m")).alias("n_total"),
        F.sum("m").alias("n_vocab"),
    )
    w = Window.orderBy(F.col("c").desc()).rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = coc.select(
        "c",
        "m",
        F.sum(F.col("c") * F.col("m")).over(w).alias("mass_cum"),
        F.sum("m").over(w).alias("vocab_cum"),
    )
    targets = spark.createDataFrame(
        [(500,), (900,), (990,), (999,)], "target_permille int"
    )
    hit = (
        F.broadcast(targets)
        .crossJoin(F.broadcast(tot))
        .join(
            cum,
            (F.col("mass_cum") * 1000 >= F.col("target_permille") * F.col("n_total"))
            & (
                (F.col("mass_cum") - F.col("c") * F.col("m")) * 1000
                < F.col("target_permille") * F.col("n_total")
            ),
        )
        .groupBy("target_permille", "n_total", "n_vocab")
        .agg(
            F.min(
                F.col("vocab_cum")
                - F.col("m")
                + F.expr(
                    "div(div(target_permille * n_total + 999, 1000)"
                    " - (mass_cum - c * m) + c - 1, c)"
                )
            ).alias("vocab_needed")
        )
    )
    return hit.select(
        "target_permille",
        F.col("vocab_needed").cast("bigint"),
        F.col("n_vocab").cast("bigint"),
        F.col("n_total").cast("bigint"),
        F.expr("div(1000000 * vocab_needed, n_vocab)")
        .cast("bigint")
        .alias("vocab_share_micro"),
    ).orderBy("target_permille")


@register(
    "events_cusum_changepoint",
    """
    WITH daily AS (
        -- per-row milli rounding BEFORE the sum: an integer sum is
        -- order-independent where a double sum is not (parity contract)
        SELECT event_type, CAST(ts AS DATE) AS day,
               SUM(CAST(round(value * 1000) AS BIGINT)) AS x_milli
        FROM events GROUP BY 1, 2
    ),
    tot AS (
        SELECT event_type, COUNT(*) AS n_days, SUM(x_milli) AS total
        FROM daily GROUP BY event_type
    ),
    cus AS (
        SELECT d.event_type, d.day,
               SUM(d.x_milli * t.n_days - t.total)
                   OVER (PARTITION BY d.event_type ORDER BY d.day) AS s
        FROM daily d JOIN tot t ON t.event_type = d.event_type
    ),
    mx AS (
        SELECT event_type, MAX(abs(s)) AS peak FROM cus GROUP BY event_type
    ),
    loc AS (
        SELECT c.event_type, MIN(c.day) AS peak_day,
               MIN(CASE WHEN c.s > 0 THEN 1 ELSE -1 END) AS direction
        FROM cus c JOIN mx m ON m.event_type = c.event_type
                             AND abs(c.s) = m.peak
        GROUP BY c.event_type
    )
    SELECT t.event_type,
           CAST(t.n_days AS BIGINT) AS n_days,
           CAST(m.peak AS BIGINT) AS cusum_peak_scaled,
           CAST((1000 * m.peak) // (t.n_days * greatest(t.total, 1))
               AS BIGINT) AS peak_share_permille,
           CAST(l.peak_day AS VARCHAR) AS peak_day,
           CAST(l.direction AS INTEGER) AS direction
    FROM tot t
    JOIN mx m ON m.event_type = t.event_type
    JOIN loc l ON l.event_type = t.event_type
    ORDER BY t.event_type
    """,
)
def events_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection (Page 1954) per event type over the
    daily value series — "did this stream's rate shift, and when?".
    The cumulative sum of deviations from the per-type mean peaks at
    the most likely changepoint (the binary-segmentation pivot).
    Exact integers via the common-denominator trick: S_i =
    Σ_{d≤i} (x_d·D − T) where D = #days and T = total, so no mean
    division ever happens; the peak day ties break to the earliest,
    ``direction`` says whether the level shifted up (+1: early days
    below mean, CUSUM dips negative... sign of S at the peak) and
    ``peak_share_permille`` normalizes the peak against D·T for
    cross-type comparison.

    Scale shape: the corpus-scale work is ONE map-side-combined
    groupBy(type, day); the CUSUM window runs over the bounded
    (type × day) relation partitioned by type.  At 100 TB with years
    of days per key, the same window converts to
    ``operators/prefixsum.bucketed_cumsum`` with (type) groups and
    day buckets — the relation here is 5×30 so the plain partitioned
    window IS the right plan."""
    daily = (
        _fan_out(load_testdata(spark, sf_dir, "events"))
        .groupBy("event_type", F.to_date("ts").alias("day"))
        .agg(F.expr("sum(cast(round(value * 1000) as bigint))").alias("x_milli"))
        .transform(tracked_persist)
    )
    tot = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"), F.sum("x_milli").alias("total")
    )
    w = Window.partitionBy("event_type").orderBy("day").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cus = (
        daily.join(F.broadcast(tot), "event_type")
        .select(
            "event_type",
            "day",
            F.sum(
                F.col("x_milli") * F.col("n_days") - F.col("total")
            ).over(w).alias("s"),
        )
        .transform(tracked_persist)
    )
    mx = cus.groupBy("event_type").agg(F.max(F.abs("s")).alias("peak"))
    loc = (
        cus.join(F.broadcast(mx), "event_type")
        .filter(F.abs("s") == F.col("peak"))
        .groupBy("event_type")
        .agg(
            F.min("day").alias("peak_day"),
            F.min(F.when(F.col("s") > 0, 1).otherwise(-1)).alias("direction"),
        )
    )
    return (
        tot.join(F.broadcast(mx), "event_type")
        .join(F.broadcast(loc), "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("bigint"),
            F.col("peak").cast("bigint").alias("cusum_peak_scaled"),
            F.expr("div(1000 * peak, n_days * greatest(total, 1))")
            .cast("bigint")
            .alias("peak_share_permille"),
            F.col("peak_day").cast("string"),
            F.col("direction").cast("int"),
        )
        .orderBy("event_type")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 7: Benford audit, token burstiness
# ---------------------------------------------------------------------------

# round(1000·log10(1 + 1/d)) for d = 1..9 — precomputed integer
# literals so both engines use the identical libm-free constants
_BENFORD_MILLI = {1: 301, 2: 176, 3: 125, 4: 97, 5: 79, 6: 67, 7: 58, 8: 51, 9: 46}
_BENFORD_CASE = (
    "CASE first_digit "
    + " ".join(f"WHEN {d} THEN {m}" for d, m in _BENFORD_MILLI.items())
    + " END"
)


@register(
    "orders_benford_deviation",
    f"""
    WITH v AS (
        SELECT CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
                    AS VARCHAR), 1, 1) AS INTEGER) AS first_digit
        FROM orders
    ),
    cnt AS (SELECT first_digit, COUNT(*) AS n_obs FROM v GROUP BY first_digit),
    tot AS (SELECT COUNT(*) AS n FROM v)
    SELECT c.first_digit,
           CAST(c.n_obs AS BIGINT) AS n_obs,
           CAST((1000 * c.n_obs) // t.n AS BIGINT) AS obs_share_milli,
           CAST({_BENFORD_CASE} AS BIGINT) AS benford_share_milli,
           CAST((1000 * c.n_obs) // t.n - {_BENFORD_CASE} AS BIGINT)
               AS dev_milli
    FROM cnt c, tot t
    ORDER BY c.first_digit
    """,
)
def orders_benford_deviation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benford's-law first-digit audit over order totals — the
    classic anomaly screen for fabricated or mechanically-generated
    numeric columns (synthetic/templated data violates the log
    distribution real multiplicative processes follow; a curation
    pipeline runs this on numeric metadata before trusting it).
    Expected shares round(1000·log₁₀(1+1/d)) ship as precomputed
    integer literals (libm-free on both engines); observed shares and
    deviations in exact milli units.  First digit reads off the
    centi-unit integer's decimal string — exact for 2-decimal
    currency doubles.

    Scale shape: one map projection + ONE map-side-combined
    groupBy(first_digit) — ≤9 rows out of the heavy aggregate
    regardless of N; the 1-row total broadcast finishes it."""
    v = _fan_out(load_testdata(spark, sf_dir, "orders")).select(
        F.expr(
            "cast(substring(cast(cast(round(o_totalprice * 100) as bigint)"
            " as string), 1, 1) as int)"
        ).alias("first_digit")
    )
    cnt = v.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n_obs"))
    tot = v.agg(F.count(F.lit(1)).alias("n"))
    return (
        cnt.crossJoin(F.broadcast(tot))
        .select(
            "first_digit",
            F.col("n_obs").cast("bigint"),
            F.expr("div(1000 * n_obs, n)").cast("bigint").alias("obs_share_milli"),
            F.expr(_BENFORD_CASE).cast("bigint").alias("benford_share_milli"),
            F.expr(f"div(1000 * n_obs, n) - ({_BENFORD_CASE})")
            .cast("bigint")
            .alias("dev_milli"),
        )
        .orderBy("first_digit")
    )


@register(
    "text_token_burstiness",
    r"""
    WITH tk AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    dt AS (SELECT doc_id, tok, COUNT(*) AS x FROM tk GROUP BY doc_id, tok),
    dd AS (SELECT COUNT(DISTINCT doc_id) AS d FROM tk),
    ts AS (
        SELECT tok, SUM(x) AS total, COUNT(*) AS docfreq,
               SUM(x * x) AS sumsq
        FROM dt GROUP BY tok
    ),
    top AS (
        SELECT tok, total, docfreq, sumsq
        FROM ts ORDER BY total DESC, tok LIMIT 50
    )
    SELECT t.tok,
           CAST(t.total AS BIGINT) AS total,
           CAST(t.docfreq AS BIGINT) AS docfreq,
           CAST((1000 * (d.d * t.sumsq - t.total * t.total))
                // (t.total * d.d) AS BIGINT) AS fano_milli
    FROM top t, dd d
    ORDER BY total DESC, tok
    """,
)
def text_token_burstiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token burstiness via the Fano factor (variance-to-mean ratio of
    per-document counts, zeros included) for the 50 highest-mass
    tokens — the Church-Gale observation that content words "burst"
    (fano ≫ 1: a doc that uses the token uses it repeatedly) while
    function words spread uniformly (fano ≈ 1, Poisson-like).
    Curation uses it to separate topical keywords from glue when
    building quality lexicons and stopword lists.  Integer-exact:
    fano_milli = 1000·(D·Σx² − T²) // (T·D) — the population
    variance/mean in common-denominator form; absent-doc zeros enter
    through D without being materialized.

    Scale shape: ONE map-side-combined groupBy(doc, token), ONE
    groupBy(token) over it, a 50-row TakeOrderedAndProject (never a
    global sort), and a 1-row doc-count broadcast."""
    tk = (
        _fan_out(load_testdata(spark, sf_dir, "documents").select("doc_id", "text"))
        .select("doc_id", F.explode(F.split("text", X.TOKEN_RE)).alias("tok"))
        .transform(tracked_persist)
    )
    dt = tk.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("x"))
    dd = tk.agg(F.countDistinct("doc_id").alias("d"))
    ts = dt.groupBy("tok").agg(
        F.sum("x").alias("total"),
        F.count(F.lit(1)).alias("docfreq"),
        F.sum(F.col("x") * F.col("x")).alias("sumsq"),
    )
    top = ts.orderBy(F.col("total").desc(), "tok").limit(50)
    return (
        top.crossJoin(F.broadcast(dd))
        .select(
            "tok",
            F.col("total").cast("bigint"),
            F.col("docfreq").cast("bigint"),
            F.expr("div(1000 * (d * sumsq - total * total), total * d)")
            .cast("bigint")
            .alias("fano_milli"),
        )
        .orderBy(F.col("total").desc(), "tok")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 8: rater agreement, CUBE completion
# ---------------------------------------------------------------------------


@register(
    "quality_rater_agreement_kappa",
    r"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    pred AS (
        SELECT doc_id,
               CASE WHEN SUM(CASE WHEN tok IN ('the','a','an','of','and','to',
                                               'is','in','it','for')
                             THEN 1 ELSE 0 END) * 20 >= COUNT(*)
                    THEN 1 ELSE 0 END AS b
        FROM tok GROUP BY doc_id
    ),
    pair AS (
        SELECT CASE WHEN d.lang = 'en' THEN 1 ELSE 0 END AS a, p.b
        FROM documents d JOIN pred p ON p.doc_id = d.doc_id
    ),
    cm AS (
        SELECT COUNT(*) AS n,
               SUM(a * b) AS both_en,
               SUM((1 - a) * (1 - b)) AS both_other,
               SUM(a * (1 - b)) AS meta_only,
               SUM((1 - a) * b) AS pred_only
        FROM pair
    )
    SELECT CAST(n AS BIGINT) AS n_docs,
           CAST(both_en AS BIGINT) AS both_en,
           CAST(both_other AS BIGINT) AS both_other,
           CAST(meta_only AS BIGINT) AS meta_only,
           CAST(pred_only AS BIGINT) AS pred_only,
           CAST((1000 * (both_en + both_other)) // n AS BIGINT) AS po_milli,
           CAST((1000 * ((both_en + meta_only) * (both_en + pred_only)
                 + (both_other + pred_only) * (both_other + meta_only)))
                // (n * n) AS BIGINT) AS pe_milli,
           CAST((1000000 * (n * (both_en + both_other)
                 - ((both_en + meta_only) * (both_en + pred_only)
                    + (both_other + pred_only) * (both_other + meta_only))))
                // (n * n - ((both_en + meta_only) * (both_en + pred_only)
                    + (both_other + pred_only) * (both_other + meta_only)))
               AS BIGINT) AS kappa_micro
    FROM cm
    """,
)
def quality_rater_agreement_kappa(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's kappa between two labelers of the same corpus — here
    the stored ``lang`` metadata (rater A: lang = 'en') and the
    stopword-ratio heuristic (rater B: ``text_lang_id``'s predicate) —
    the chance-corrected agreement metric every labeling/weak-
    supervision pipeline reports before trusting a cheap labeler as a
    stand-in for an expensive one.  Exact integers in common-
    denominator form: p_o·n = a+d, p_e·n² = (a+b)(a+c)+(c+d)(b+d),
    κ_micro = ⌊10⁶·(n(a+d) − pe·n²)/(n² − pe·n²)⌋ — no float division
    anywhere, bit-identical on both engines.  The full confusion
    matrix ships alongside so the reader can recompute any agreement
    metric.

    Scale shape: the corpus-scale work is the ``text_lang_id``
    per-doc aggregate (one map-side-combined groupBy) + one equi-join
    back to metadata; everything after is a single 1-row confusion
    aggregate.  Kappa itself is O(1)."""
    docs = _fan_out(
        load_testdata(spark, sf_dir, "documents").select("doc_id", "lang", "text")
    )
    tok = docs.select("doc_id", F.explode(F.split("text", X.TOKEN_RE)).alias("tok"))
    pred = tok.groupBy("doc_id").agg(
        F.when(
            F.sum(F.when(F.col("tok").isin(*X.EN_STOPWORDS), 1).otherwise(0)) * 20
            >= F.count(F.lit(1)),
            1,
        )
        .otherwise(0)
        .alias("b")
    )
    pair = docs.select(
        "doc_id", F.when(F.col("lang") == "en", 1).otherwise(0).alias("a")
    ).join(pred, "doc_id")
    cm = pair.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.col("a") * F.col("b")).alias("both_en"),
        F.sum((1 - F.col("a")) * (1 - F.col("b"))).alias("both_other"),
        F.sum(F.col("a") * (1 - F.col("b"))).alias("meta_only"),
        F.sum((1 - F.col("a")) * F.col("b")).alias("pred_only"),
    )
    pe_num = (
        "((both_en + meta_only) * (both_en + pred_only)"
        " + (both_other + pred_only) * (both_other + meta_only))"
    )
    return cm.select(
        F.col("n").cast("bigint").alias("n_docs"),
        F.col("both_en").cast("bigint"),
        F.col("both_other").cast("bigint"),
        F.col("meta_only").cast("bigint"),
        F.col("pred_only").cast("bigint"),
        F.expr("div(1000 * (both_en + both_other), n)")
        .cast("bigint")
        .alias("po_milli"),
        F.expr(f"div(1000 * {pe_num}, n * n)").cast("bigint").alias("pe_milli"),
        F.expr(
            f"div(1000000 * (n * (both_en + both_other) - {pe_num}),"
            f" n * n - {pe_num})"
        )
        .cast("bigint")
        .alias("kappa_micro"),
    )


@register(
    "cube_revenue_by_flag_status",
    """
    SELECT COALESCE(l_returnflag, 'ALL') AS l_returnflag,
           COALESCE(l_linestatus, 'ALL') AS l_linestatus,
           CAST(GROUPING(l_returnflag) * 2 + GROUPING(l_linestatus)
               AS INTEGER) AS grouping_id,
           CAST(COUNT(*) AS BIGINT) AS n_items,
           CAST(SUM(CAST(round(l_extendedprice * 100) AS BIGINT)) AS BIGINT)
               AS revenue_centi
    FROM lineitem
    GROUP BY CUBE (l_returnflag, l_linestatus)
    ORDER BY grouping_id, l_returnflag, l_linestatus
    """,
)
def cube_revenue_by_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE aggregation — the remaining member of the grouped-
    aggregation family next to ``rollup_revenue`` and
    ``grouping_sets_revenue``: all 2² margin combinations of
    (returnflag, linestatus) in one pass, with the GROUPING() bitmask
    distinguishing real NULL-like margins from data values (the
    ``'ALL'`` coalesce is presentation; grouping_id is the truth).
    Revenue in exact centi-units (per-row rounding before the integer
    sum — order-independent on both engines).

    Scale shape: Spark expands CUBE into a single Expand + one
    map-side-combinable aggregate — one shuffle for all four grouping
    sets, output bounded by the category-domain product; the same
    Expand-based plan AQE-sizes at any N."""
    return (
        _fan_out(load_testdata(spark, sf_dir, "lineitem"))
        .cube("l_returnflag", "l_linestatus")
        .agg(
            (F.grouping("l_returnflag") * 2 + F.grouping("l_linestatus"))
            .cast("int")
            .alias("grouping_id"),
            F.count(F.lit(1)).cast("bigint").alias("n_items"),
            F.sum(F.expr("cast(round(l_extendedprice * 100) as bigint)"))
            .cast("bigint")
            .alias("revenue_centi"),
        )
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("l_returnflag"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("l_linestatus"),
            "grouping_id",
            "n_items",
            "revenue_centi",
        )
        .orderBy("grouping_id", "l_returnflag", "l_linestatus")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 9: mutual-kNN paraphrase mining
# ---------------------------------------------------------------------------


def _mutual_knn_oracle_sql(knn: int = 3) -> str:
    """DuckDB twin of ``similarity_mutual_knn_pairs``: the shared
    unrolled-Lloyd cells CTE, directed within-cell top-k by cosine,
    then the reciprocity self-join."""
    return _kmeans_cells_cte(k_sql=_K_SCALED_SQL) + f""",
    sl AS (SELECT c.vec_id, c.cluster, e.v, e.nrm
           FROM cells c JOIN e ON e.vec_id = c.vec_id),
    directed AS (
        SELECT a.vec_id AS src, b.vec_id AS dst, a.cluster,
               list_dot_product(a.v, b.v) / (a.nrm * b.nrm) AS cos_raw
        FROM sl a JOIN sl b ON b.cluster = a.cluster AND b.vec_id != a.vec_id
    ),
    knn AS (
        SELECT * FROM (
            SELECT src, dst, cluster, cos_raw,
                   CAST(ROW_NUMBER() OVER (PARTITION BY src
                        ORDER BY cos_raw DESC, dst) AS INTEGER) AS rk
            FROM directed)
        WHERE rk <= {knn}
    )
    SELECT CAST(x.src AS BIGINT) AS vec_a,
           CAST(x.dst AS BIGINT) AS vec_b,
           CAST(x.cluster AS BIGINT) AS cluster,
           CAST(CAST(ROUND(x.cos_raw, 6) AS DECIMAL(10,6)) AS DOUBLE) AS cos_sim,
           x.rk AS rk_ab, y.rk AS rk_ba
    FROM knn x JOIN knn y ON y.src = x.dst AND y.dst = x.src
    WHERE x.src < x.dst
    ORDER BY vec_a, vec_b
    """


@register("similarity_mutual_knn_pairs", _mutual_knn_oracle_sql())
def similarity_mutual_knn_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mutual-kNN pair mining — the reciprocal-nearest-neighbor filter
    behind paraphrase mining, bitext alignment, and RkNN-based
    hubness correction: keep (a, b) only when b is in a's top-3
    cosine neighbors AND a is in b's (reciprocity kills asymmetric
    hub matches that one-directional kNN floods on).  Neighbor search
    is scoped to the shared SQ8 k-means cells, so the candidate
    relation is Σ|cluster|² — the SemDeDup-shaped equi-join, never
    all-pairs — and reciprocity is one self-equi-join on the directed
    top-k edge list.

    Scale shape: quantizer = the shared driver-bounded Lloyd fit;
    directed scoring is an equi-join on cluster over slim
    (id, v, norm) rows; the per-source top-3 window partitions by
    source vector; the reciprocity join touches ≤ 3·N edges.  k (the
    cell count) scales with N in the SemDeDup regime to hold cluster
    sizes: the registered query uses the corpus-scaled k
    (``_scaled_quantizer_k`` / ``_K_SCALED_SQL``, the SemDeDup
    contract) — a fixed k=8 measured exponent ~0.96 at 10x in
    tools/scale_experiment.py, the quadratic creep the scaled k
    removes.  Cross-cell true mutual pairs are the recall trade the
    IVF recall gates measure."""
    cells = _sq8_kmeans_cells(spark, sf_dir, k=None, iters=3)
    slim = cells.select("vec_id", "cluster", "v", "nrm")
    a = slim.select(
        F.col("vec_id").alias("src"),
        F.col("cluster").alias("cl_a"),
        F.col("v").alias("va"),
        F.col("nrm").alias("na"),
    )
    directed = (
        slim.join(
            a, (F.col("cl_a") == F.col("cluster")) & (F.col("src") != F.col("vec_id"))
        )
        .withColumn(
            "cos_raw", S.dot(F.col("va"), F.col("v")) / (F.col("na") * F.col("nrm"))
        )
        .select("src", F.col("vec_id").alias("dst"), "cluster", "cos_raw")
    )
    w = Window.partitionBy("src").orderBy(F.col("cos_raw").desc(), F.col("dst").asc())
    knn = (
        directed.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 3)
        .transform(tracked_persist)
    )
    back = knn.select(
        F.col("dst").alias("src"),
        F.col("src").alias("dst"),
        F.col("rk").alias("rk_ba"),
    )
    return (
        knn.filter(F.col("src") < F.col("dst"))
        .join(back, ["src", "dst"])
        .select(
            F.col("src").cast("bigint").alias("vec_a"),
            F.col("dst").cast("bigint").alias("vec_b"),
            # BIGINT: hierarchical path labels exceed int32 above the
            # gate (ANSI cast would throw); lossless at oracle SFs
            F.col("cluster").cast("bigint"),
            F.round("cos_raw", 6).cast("decimal(10,6)").cast("double").alias("cos_sim"),
            F.col("rk").alias("rk_ab"),
            "rk_ba",
        )
        .orderBy("vec_a", "vec_b")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 10: customer concentration (Gini + HHI)
# ---------------------------------------------------------------------------


@register(
    "customer_concentration_profile",
    """
    WITH spend AS (
        SELECT o_custkey,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS x
        FROM orders GROUP BY o_custkey
    ),
    seg AS (
        SELECT c.c_mktsegment, s.x
        FROM spend s JOIN customer c ON c.c_custkey = s.o_custkey
    ),
    gx AS (SELECT c_mktsegment, x, COUNT(*) AS c FROM seg GROUP BY 1, 2),
    cum AS (
        SELECT c_mktsegment, x, c,
               SUM(c) OVER (PARTITION BY c_mktsegment ORDER BY x) - c
                   AS cum_before
        FROM gx
    ),
    agg AS (
        SELECT c_mktsegment,
               SUM(c) AS n,
               SUM(x * c) AS s,
               SUM(x * c * (2 * cum_before + c + 1)) AS two_sum,
               SUM(x * x * c) AS sumsq
        FROM cum GROUP BY c_mktsegment
    )
    SELECT c_mktsegment,
           CAST(n AS BIGINT) AS n_customers,
           CAST(s AS BIGINT) AS total_dollars,
           CAST((1000 * (two_sum - (n + 1) * s)) // (n * s) AS BIGINT)
               AS gini_milli,
           CAST(floor((1000000.0 * CAST(sumsq AS DOUBLE))
                / (CAST(s AS DOUBLE) * CAST(s AS DOUBLE))) AS BIGINT)
               AS hhi_micro
    FROM agg
    ORDER BY c_mktsegment
    """,
)
def customer_concentration_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue-concentration profile per market segment: the exact
    Gini coefficient and the Herfindahl-Hirschman index of
    per-customer spend — the inequality/duopoly audit a pipeline runs
    on contributor or source concentration ("does one uploader own
    this shard?") as much as finance runs it on customers.  Gini from
    grouped data without per-row ranks: for each distinct spend value
    the doubled rank-sum contribution is x·c·(2·cum_before + c + 1)
    (the tie-group arithmetic-series closed form), so
    G = (2Σix − (n+1)S)/(nS) comes out in exact integer milli.  HHI =
    Σx²/S² uses exact integer Σx² with ONE engine-identical double
    fold for the final ratio (S² exceeds bigint).

    Scale shape: per-customer totals are ONE map-side-combined
    groupBy(custkey) (the only corpus-scale shuffle; per-order centi
    rounding BEFORE the integer sum, the order-independence
    contract); the segment join is customer-dimension-sized; the
    grouped-value cumsum runs per segment over the bounded distinct-
    spend relation — at 100 TB it converts to
    ``operators/prefixsum.bucketed_cumsum`` exactly as written here."""
    from .operators.prefixsum import bucketed_cumsum

    spend = (
        _fan_out(load_testdata(spark, sf_dir, "orders"))
        .groupBy("o_custkey")
        .agg(
            F.expr("div(sum(cast(round(o_totalprice * 100) as bigint)), 100)").alias(
                "x"
            )
        )
    )
    cust = load_testdata(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), "c_mktsegment"
    )
    seg = spend.join(cust, "o_custkey").select("c_mktsegment", "x")
    gx = seg.groupBy("c_mktsegment", "x").agg(F.count(F.lit(1)).alias("c"))
    cum = bucketed_cumsum(gx, ["c_mktsegment"], "x", ["c"], bucket_width=10_000).select(
        "c_mktsegment", "x", "c", (F.col("cum_c") - F.col("c")).alias("cum_before")
    )
    agg = cum.groupBy("c_mktsegment").agg(
        F.sum("c").alias("n"),
        F.sum(F.col("x") * F.col("c")).alias("s"),
        F.sum(
            F.col("x") * F.col("c") * (2 * F.col("cum_before") + F.col("c") + 1)
        ).alias("two_sum"),
        F.sum(F.col("x") * F.col("x") * F.col("c")).alias("sumsq"),
    )
    return agg.select(
        "c_mktsegment",
        F.col("n").cast("bigint").alias("n_customers"),
        F.col("s").cast("bigint").alias("total_dollars"),
        F.expr("div(1000 * (two_sum - (n + 1) * s), n * s)")
        .cast("bigint")
        .alias("gini_milli"),
        F.expr(
            "cast(floor((1000000.0 * cast(sumsq as double))"
            " / (cast(s as double) * cast(s as double))) as bigint)"
        ).alias("hhi_micro"),
    ).orderBy("c_mktsegment")


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 11: late-interaction (MaxSim) retrieval
# ---------------------------------------------------------------------------


@register(
    "similarity_maxsim_late_interaction",
    """
    WITH tv AS (
        SELECT vec_id // 8 AS doc_id, vec_id,
               embedding::DOUBLE[] AS v,
               sqrt(list_dot_product(embedding::DOUBLE[], embedding::DOUBLE[])) AS nrm
        FROM embeddings
    ),
    q AS (SELECT * FROM tv WHERE doc_id < 2),
    d AS (SELECT * FROM tv WHERE doc_id >= 2),
    scored AS (
        SELECT q.doc_id AS query_doc, d.doc_id AS cand_doc,
               q.vec_id AS q_tok,
               MAX(list_dot_product(q.v, d.v) / (q.nrm * d.nrm)) AS best
        FROM q JOIN d ON true
        GROUP BY q.doc_id, d.doc_id, q.vec_id
    ),
    agg AS (
        SELECT query_doc, cand_doc,
               CAST(SUM(CAST(floor(best * 1000000) AS BIGINT)) AS BIGINT)
                   AS maxsim_micro
        FROM scored GROUP BY query_doc, cand_doc
    ),
    rk AS (
        SELECT query_doc, cand_doc, maxsim_micro,
               CAST(ROW_NUMBER() OVER (PARTITION BY query_doc
                    ORDER BY maxsim_micro DESC, cand_doc) AS INTEGER) AS rk
        FROM agg
    )
    SELECT CAST(query_doc AS BIGINT) AS query_doc,
           CAST(cand_doc AS BIGINT) AS cand_doc,
           maxsim_micro, rk
    FROM rk WHERE rk <= 5
    ORDER BY query_doc, rk
    """,
)
def similarity_maxsim_late_interaction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Late-interaction retrieval à la ColBERT (Khattab & Zaharia
    2020): documents and queries are BAGS of token vectors (here the
    synthetic grouping vec_id//8 — 8 token vectors per doc, the
    multi-vector layout a real pipeline stores as one row per token
    embedding), and relevance is MaxSim = Σ_q max_d cos(q_i, d_j) —
    each query token finds its best document token, so precise term-
    level matches survive pooling.  The two bounded query docs score
    against every candidate doc; per-(query-token, cand-doc) maxes are
    ONE combinable aggregate, the Σ over query tokens another.  Cosine
    uses the strict-fold double contract; per-token maxes are floored
    to integer micro BEFORE the sum so the final score is an integer
    sum of identically-floored terms on both engines (a raw double Σ
    would be order-dependent).

    Scale shape: the bounded 16-row query-token set broadcasts into a
    map-only scoring pass over candidate token vectors (never a
    corpus×corpus join); both aggregates are map-side combinable; the
    ranking window sees |queries|×|docs| rows.  At production scale
    the candidate set first passes an ANN tier (the IVF family here)
    and MaxSim reranks the sliver — exactly how ColBERT deployments
    stage it."""
    tv = S.with_norm(_fan_out(load_testdata(spark, sf_dir, "embeddings"))).select(
        F.expr("div(vec_id, 8)").alias("doc_id"),
        "vec_id",
        F.col("_v").alias("v"),
        F.col("_norm").alias("nrm"),
    )
    q = tv.filter(F.col("doc_id") < 2).select(
        F.col("doc_id").alias("query_doc"),
        F.col("vec_id").alias("q_tok"),
        F.col("v").alias("qv"),
        F.col("nrm").alias("qn"),
    )
    d = tv.filter(F.col("doc_id") >= 2).select(
        F.col("doc_id").alias("cand_doc"), "v", "nrm"
    )
    scored = (
        d.join(F.broadcast(q), F.lit(True))
        .withColumn(
            "cos_raw", S.dot(F.col("qv"), F.col("v")) / (F.col("qn") * F.col("nrm"))
        )
        .groupBy("query_doc", "cand_doc", "q_tok")
        .agg(F.max("cos_raw").alias("best"))
    )
    agg = scored.groupBy("query_doc", "cand_doc").agg(
        F.sum(F.expr("cast(floor(best * 1000000) as bigint)")).alias("maxsim_micro")
    )
    w = Window.partitionBy("query_doc").orderBy(
        F.col("maxsim_micro").desc(), F.col("cand_doc").asc()
    )
    return (
        agg.withColumn("rk", F.row_number().over(w).cast("int"))
        .filter(F.col("rk") <= 5)
        .select(
            F.col("query_doc").cast("bigint"),
            F.col("cand_doc").cast("bigint"),
            F.col("maxsim_micro").cast("bigint"),
            "rk",
        )
        .orderBy("query_doc", "rk")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 12: one-row dataset card
# ---------------------------------------------------------------------------


@register(
    "pipeline_dataset_card",
    r"""
    WITH d AS (
        SELECT doc_id, text, lang, source,
               len(string_split_regex(text, '\s+')) AS n_toks,
               md5(text) AS h
        FROM documents
    ),
    agg AS (
        SELECT COUNT(*) AS n_docs,
               SUM(n_toks) AS n_tokens,
               COUNT(DISTINCT source) AS n_sources,
               COUNT(DISTINCT lang) AS n_langs,
               COUNT(DISTINCT h) AS n_unique_texts,
               SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS n_en,
               MIN(n_toks) AS min_doc_tokens,
               MAX(n_toks) AS max_doc_tokens
        FROM d
    )
    SELECT CAST(n_docs AS BIGINT) AS n_docs,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_sources AS BIGINT) AS n_sources,
           CAST(n_langs AS BIGINT) AS n_langs,
           CAST(n_docs - n_unique_texts AS BIGINT) AS n_exact_dup_docs,
           CAST((1000 * (n_docs - n_unique_texts)) // n_docs AS BIGINT)
               AS dup_rate_milli,
           CAST((1000 * n_en) // n_docs AS BIGINT) AS en_share_milli,
           CAST((1000 * n_tokens) // n_docs AS BIGINT) AS mean_doc_tokens_milli,
           CAST(min_doc_tokens AS BIGINT) AS min_doc_tokens,
           CAST(max_doc_tokens AS BIGINT) AS max_doc_tokens
    FROM agg
    """,
)
def pipeline_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-row dataset card — the summary block a curated release
    ships (HuggingFace dataset cards, Datasheets for Datasets, Gebru
    et al. 2021): corpus size in docs/tokens, source and language
    breadth, exact-duplicate mass (docs minus distinct content
    hashes), English share, and doc-length extremes/mean — every
    number integer-exact.  The detailed per-dimension reports are the
    sibling queries (quality stats, lang distribution, dup tiers,
    mixture plans); this is the cover sheet a reviewer reads first.

    Scale shape: ONE scan, ONE aggregate — the distinct-counts are
    Spark partial-aggregated (Expand for multi-distinct), everything
    else is map-side-combined; output is a single row."""
    d = _fan_out(
        load_testdata(spark, sf_dir, "documents").select(
            "doc_id", "lang", "source", "text"
        )
    ).select(
        "lang",
        "source",
        F.size(F.split("text", X.TOKEN_RE)).alias("n_toks"),
        F.md5(F.col("text").cast("binary")).alias("h"),
    )
    return d.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_toks").cast("bigint").alias("n_tokens"),
        F.countDistinct("source").cast("bigint").alias("n_sources"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("h"))
        .cast("bigint")
        .alias("n_exact_dup_docs"),
        F.expr("div(1000 * (count(1) - count(distinct h)), count(1))")
        .cast("bigint")
        .alias("dup_rate_milli"),
        F.expr("div(1000 * sum(case when lang = 'en' then 1 else 0 end), count(1))")
        .cast("bigint")
        .alias("en_share_milli"),
        F.expr("div(1000 * sum(n_toks), count(1))")
        .cast("bigint")
        .alias("mean_doc_tokens_milli"),
        F.min("n_toks").cast("bigint").alias("min_doc_tokens"),
        F.max("n_toks").cast("bigint").alias("max_doc_tokens"),
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 13: sketch-based join-size estimation
# ---------------------------------------------------------------------------


def _cms_bucket_sql(row: int, keycol: str, w: int) -> str:
    h = f"md5(concat('{row}#', CAST({keycol} AS VARCHAR)))"
    return f"({_hexat(h, 1, 8)} % {w})"


@register(
    "stats_join_size_estimate",
    f"""
    WITH keys AS (
        SELECT 'l_partkey' AS column_name, l_partkey AS k FROM lineitem
        UNION ALL
        SELECT 'l_suppkey', l_suppkey FROM lineitem
    ),
    exact AS (
        SELECT column_name, SUM(f * f) AS exact_selfjoin
        FROM (SELECT column_name, k, COUNT(*) AS f FROM keys GROUP BY 1, 2)
        GROUP BY column_name
    ),
    probes AS (
        SELECT column_name, r,
               CASE r {" ".join(f"WHEN {i} THEN {_cms_bucket_sql(i, 'k', 4096)}" for i in range(4))} END AS bucket
        FROM keys, (SELECT unnest([0, 1, 2, 3]) AS r)
    ),
    cnt AS (
        SELECT column_name, r, bucket, COUNT(*) AS c
        FROM probes GROUP BY 1, 2, 3
    ),
    inner_prod AS (
        SELECT column_name, r, SUM(c * c) AS ip FROM cnt GROUP BY 1, 2
    ),
    est AS (
        SELECT column_name, MIN(ip) AS cms_estimate FROM inner_prod
        GROUP BY column_name
    )
    SELECT e.column_name,
           CAST(x.exact_selfjoin AS BIGINT) AS exact_selfjoin,
           CAST(e.cms_estimate AS BIGINT) AS cms_estimate,
           CAST((1000 * (e.cms_estimate - x.exact_selfjoin))
                // x.exact_selfjoin AS BIGINT) AS overcount_permille
    FROM est e JOIN exact x ON x.column_name = e.column_name
    ORDER BY e.column_name
    """,
)
def stats_join_size_estimate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-based equi-join cardinality estimation (Alon-Matias-
    Szegedy lineage; the CMS inner-product form of Cormode-
    Muthukrishnan) — the planner-side question "how big will this
    self-join on key k get?" answered from two constant-size
    summaries: |A ⋈_k B| = Σ_k f_A(k)·f_B(k), estimated by the
    inner product of the sides' count-min rows (min over d=4
    independent rows of Σ_b cntA[b]·cntB[b]), which NEVER
    underestimates — exactly the conservatism a skew-aware planner
    wants before choosing salting or a broadcast.  Run here for the
    lineitem self-join on partkey and suppkey next to the exact
    Σf², with the realized overcount.  All md5-bucket integer
    arithmetic, bit-identical on both engines.

    Scale shape: the sketch build is ONE map-side-combined
    groupBy(column, row, bucket) — ≤ d·w = 16,384 counters per column
    out of the heavy aggregate regardless of N — and the inner
    product runs on the counter relation.  The exact Σf² twin is the
    sf-bounded calibrator.  At 100 TB the per-side sketches persist
    with table stats and any join's size estimate is a 16k-element
    dot product."""
    keys = _fan_out(
        load_testdata(spark, sf_dir, "lineitem").selectExpr(
            "stack(2, 'l_partkey', l_partkey, 'l_suppkey', l_suppkey)"
            " as (column_name, k)"
        )
    ).transform(tracked_persist)
    exact = (
        keys.groupBy("column_name", "k")
        .agg(F.count(F.lit(1)).alias("f"))
        .groupBy("column_name")
        .agg(F.sum(F.col("f") * F.col("f")).alias("exact_selfjoin"))
    )
    probes = keys.select(
        "column_name",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(i).alias("r"),
                        F.expr(
                            f"pmod(cast(conv(substring(md5(cast(concat('{i}#',"
                            f" cast(k as string)) as binary)), 1, 8), 16, 10)"
                            f" as bigint), 4096)"
                        ).alias("bucket"),
                    )
                    for i in range(4)
                ]
            )
        ).alias("p"),
    ).select("column_name", F.col("p.r").alias("r"), F.col("p.bucket").alias("bucket"))
    cnt = probes.groupBy("column_name", "r", "bucket").agg(
        F.count(F.lit(1)).alias("c")
    )
    est = (
        cnt.groupBy("column_name", "r")
        .agg(F.sum(F.col("c") * F.col("c")).alias("ip"))
        .groupBy("column_name")
        .agg(F.min("ip").alias("cms_estimate"))
    )
    return (
        est.join(F.broadcast(exact), "column_name")
        .select(
            "column_name",
            F.col("exact_selfjoin").cast("bigint"),
            F.col("cms_estimate").cast("bigint"),
            F.expr("div(1000 * (cms_estimate - exact_selfjoin), exact_selfjoin)")
            .cast("bigint")
            .alias("overcount_permille"),
        )
        .orderBy("column_name")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 14: RFM segmentation
# ---------------------------------------------------------------------------


def _rfm_score_ctes(dim: str, col: str) -> str:
    """DuckDB CTE pair scoring one RFM dimension: competition-rank
    quintiles from the value-grouped cumsum (no per-row rank)."""
    return f"""
    g_{dim} AS (SELECT {col} AS v, COUNT(*) AS c FROM rfm GROUP BY 1),
    s_{dim} AS (
        SELECT v, 1 + (5 * (SUM(c) OVER (ORDER BY v) - c)) // (SELECT COUNT(*) FROM rfm)
                   AS score
        FROM g_{dim}
    )"""


@register(
    "customers_rfm_segments",
    f"""
    WITH mx AS (SELECT MAX(CAST(o_orderdate AS DATE)) AS mxd FROM orders),
    rfm AS (
        SELECT o_custkey,
               -datediff('day', MAX(CAST(o_orderdate AS DATE)), mxd) AS r_neg,
               COUNT(*) AS f,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) // 100 AS m
        FROM orders, mx GROUP BY o_custkey, mxd
    ),
    {_rfm_score_ctes("r", "r_neg")},
    {_rfm_score_ctes("f", "f")},
    {_rfm_score_ctes("m", "m")},
    scored AS (
        SELECT sr.score AS r_score, sf.score AS f_score, sm.score AS m_score,
               x.f, x.m
        FROM rfm x
        JOIN s_r sr ON sr.v = x.r_neg
        JOIN s_f sf ON sf.v = x.f
        JOIN s_m sm ON sm.v = x.m
    )
    SELECT CAST(r_score AS INTEGER) AS r_score,
           CAST(f_score AS INTEGER) AS f_score,
           CAST(m_score AS INTEGER) AS m_score,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(f) AS BIGINT) AS n_orders,
           CAST(SUM(m) AS BIGINT) AS total_dollars
    FROM scored
    GROUP BY 1, 2, 3
    ORDER BY 1, 2, 3
    """,
)
def customers_rfm_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation — the classic recency/frequency/
    monetary scoring every retention stack runs (and a template for
    any 3-axis quantile segmentation, e.g. doc length × quality ×
    novelty in a curation pipeline).  Each dimension gets a 1-5
    competition-rank quintile: ties share the score of the group's
    FIRST rank, computed as 1 + ⌊5·cum_before/n⌋ from the
    value-grouped cumulative counts — deterministic on both engines,
    no per-row ranking, no ntile.  Recency scores through the negated
    day-gap so "more recent" = higher score on the shared ascending
    rule.  Output: the populated (r, f, m) segment grid with customer/
    order/revenue mass per cell.

    Scale shape: per-customer rollup is ONE map-side-combined
    groupBy(custkey); each dimension's quintile map is a cumsum over
    the BOUNDED value-grouped relation (day gaps / order counts /
    dollar totals) — the oracle's global window runs there, and the
    Spark side uses `bucketed_cumsum` in single-series mode on the
    same bounded relation; scores come back via three broadcast
    equi-joins on the value."""
    from .operators.prefixsum import bucketed_cumsum

    mx = _fan_out(load_testdata(spark, sf_dir, "orders")).select(
        "o_custkey",
        F.to_date("o_orderdate").alias("od"),
        F.expr("cast(round(o_totalprice * 100) as bigint)").alias("centi"),
    )
    mxd = mx.agg(F.max("od").alias("mxd"))
    rfm = (
        mx.crossJoin(F.broadcast(mxd))
        .groupBy("o_custkey")
        .agg(
            F.expr("-min(datediff(mxd, od))").alias("r_neg"),
            F.count(F.lit(1)).alias("f"),
            F.expr("div(sum(centi), 100)").alias("m"),
        )
        .transform(tracked_persist)
    )
    n = rfm.count()

    def score_map(col: str, width: int) -> DataFrame:
        g = rfm.groupBy(F.col(col).alias("v")).agg(F.count(F.lit(1)).alias("c"))
        return bucketed_cumsum(g, [], "v", ["c"], bucket_width=width).select(
            F.col("v").alias(col),
            (1 + F.expr(f"div(5 * (cum_c - c), {n})")).cast("int").alias(f"{col[0]}_score"),
        )
    # negated day gaps span ~-2400..0; counts 1..~40; dollars ~0..6e6
    scored = (
        rfm.join(F.broadcast(score_map("r_neg", 100)), "r_neg")
        .join(F.broadcast(score_map("f", 8)), "f")
        .join(F.broadcast(score_map("m", 10_000)), "m")
    )
    return (
        scored.groupBy("r_score", "f_score", "m_score")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_customers"),
            F.sum("f").cast("bigint").alias("n_orders"),
            F.sum("m").cast("bigint").alias("total_dollars"),
        )
        .orderBy("r_score", "f_score", "m_score")
    )


# ---------------------------------------------------------------------------
# Round-5 session-5 batch 15: exact token-budget apportionment
# ---------------------------------------------------------------------------

_APPORTION_BUDGET = 100_000


@register(
    "pipeline_token_budget_apportion",
    rf"""
    WITH tk AS (
        SELECT source, len(string_split_regex(text, '\s+')) AS n
        FROM documents
    ),
    s AS (SELECT source, SUM(n) AS n_tokens FROM tk GROUP BY source),
    t AS (SELECT SUM(n_tokens) AS total FROM s),
    q AS (
        SELECT source, n_tokens,
               ({_APPORTION_BUDGET} * n_tokens) // t.total AS quota,
               ({_APPORTION_BUDGET} * n_tokens) % t.total AS rem
        FROM s, t
    ),
    short AS (SELECT {_APPORTION_BUDGET} - SUM(quota) AS k FROM q),
    rk AS (
        SELECT source, n_tokens, quota,
               ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS r
        FROM q
    )
    SELECT rk.source,
           CAST(rk.n_tokens AS BIGINT) AS n_tokens,
           CAST(rk.quota AS BIGINT) AS floor_quota,
           CAST(CASE WHEN rk.r <= short.k THEN 1 ELSE 0 END AS INTEGER)
               AS got_extra,
           CAST(rk.quota + CASE WHEN rk.r <= short.k THEN 1 ELSE 0 END
               AS BIGINT) AS allocation
    FROM rk, short
    ORDER BY rk.source
    """,
)
def pipeline_token_budget_apportion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact proportional token-budget apportionment by the largest-
    remainder (Hamilton) method: each source's floor quota
    ⌊B·tᵢ/T⌋ plus one extra token for the B − Σ⌊·⌋ largest
    remainders (ties to the lexicographically-first source) — the
    allocation sums to the budget EXACTLY, which naive per-source
    rounding never guarantees.  This is the "give each source its
    fair share of a 10 B-token budget" step a mixture plan hands to
    the sampler (complementing the temperature/UniMax weighting
    queries, which decide the shares; this one makes them integral).

    Scale shape: per-source token mass is ONE map-side-combined
    aggregate; quotas/remainders/the ranking window all run on the
    |sources|-bounded relation.  Nothing downstream of the first
    groupBy touches corpus-sized data."""
    tk = _fan_out(load_testdata(spark, sf_dir, "documents")).select(
        "source", F.size(F.split("text", X.TOKEN_RE)).alias("n")
    )
    s = tk.groupBy("source").agg(F.sum("n").alias("n_tokens"))
    t = s.agg(F.sum("n_tokens").alias("total"))
    q = s.crossJoin(F.broadcast(t)).select(
        "source",
        "n_tokens",
        F.expr(f"div({_APPORTION_BUDGET} * n_tokens, total)").alias("quota"),
        F.expr(f"({_APPORTION_BUDGET} * n_tokens) % total").alias("rem"),
    )
    short = q.agg((F.lit(_APPORTION_BUDGET) - F.sum("quota")).alias("k"))
    w = Window.orderBy(F.col("rem").desc(), F.col("source").asc())
    rk = q.withColumn("r", F.row_number().over(w))
    return (
        rk.crossJoin(F.broadcast(short))
        .select(
            "source",
            F.col("n_tokens").cast("bigint"),
            F.col("quota").cast("bigint").alias("floor_quota"),
            F.when(F.col("r") <= F.col("k"), 1).otherwise(0).cast("int").alias("got_extra"),
            (F.col("quota") + F.when(F.col("r") <= F.col("k"), 1).otherwise(0))
            .cast("bigint")
            .alias("allocation"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 1: hot-bucket-capped LSH, end-to-end (VERDICT r5 "Next" #4)
# ---------------------------------------------------------------------------

# Planted boilerplate: half the corpus becomes this exact string, so every
# band funnels 250 (sf0.01) / 2500 (sf0.1) docs into ONE bucket — the
# web-corpus skew hazard the cap exists for.  Constant in both engines.
_HOT_BOILER = (
    "breaking news sign up for our newsletter today and never miss a story"
    " terms of service and privacy policy apply to all visitors"
)


@register(
    "dedup_lsh_hot_bucket_capped",
    f"""
    WITH corpus AS (
        SELECT doc_id,
               CASE WHEN doc_id % 2 = 0 THEN '{_HOT_BOILER}' ELSE text END AS text
        FROM documents
    ),
    {_SHINGLE_SQL},
    {_MINHASH_BANDS_SQL},
    sizes AS (
        SELECT band_idx, band_sig, COUNT(*) AS bn, MIN(doc_id) AS hub
        FROM bands GROUP BY band_idx, band_sig
    ),
    tagged AS (
        SELECT b.doc_id, b.band_idx, b.band_sig, s.bn, s.hub
        FROM bands b JOIN sizes s
          ON s.band_idx = b.band_idx AND s.band_sig = b.band_sig
    ),
    cold AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM tagged a JOIN tagged b
          ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
         AND a.doc_id < b.doc_id
        WHERE a.bn <= 16
    ),
    hot AS (
        SELECT hub AS id_a, doc_id AS id_b
        FROM tagged WHERE bn > 16 AND doc_id != hub
    ),
    allp AS (SELECT * FROM cold UNION ALL SELECT * FROM hot)
    SELECT CAST(id_a AS BIGINT) AS id_a,
           CAST(id_b AS BIGINT) AS id_b,
           CAST(COUNT(*) AS BIGINT) AS shared_bands
    FROM allp GROUP BY 1, 2
    ORDER BY id_a, id_b
    """,
)
def dedup_lsh_hot_bucket_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate generation with the hot-bucket safety valve LIVE
    (VERDICT r5 "Next" #4): half the corpus is planted byte-identical
    boilerplate, so each band's hottest bucket holds N/2 docs — the
    exact-all-pairs path would emit C(N/2, 2) pairs out of one shuffle
    task (quadratic single-task blowup, the production skew hazard).
    With ``hot_bucket_cap=16`` that bucket switches to STAR emission:
    every member pairs with the bucket's min-id hub only, O(m) edges,
    same node coverage and hence the SAME connected components (a hot
    bucket is one clique; a star spans it).  The DuckDB twin replays
    the capped algorithm exactly — bucket sizes, min-id hub, cold
    all-pairs + hot star — so the cross-engine hash gate covers the
    capped semantics themselves, not just the uncapped default.

    Scale shape: two aggregates over the banded signatures (bucket
    size + hub), one equi-join back, and the cold self-join now
    provably bounded at ≤ cap rows per bucket per task.  At 100 TB the
    cap turns the worst-case task from O(hot²) to O(hot)."""
    docs = _fan_out(load_testdata(spark, sf_dir, "documents").select("doc_id", "text"))
    corpus = docs.select(
        "doc_id",
        F.when(F.col("doc_id") % 2 == 0, F.lit(_HOT_BOILER))
        .otherwise(F.col("text"))
        .alias("text"),
    )
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    return D.lsh_candidate_pairs(bands, "doc_id", hot_bucket_cap=16).orderBy(
        "id_a", "id_b"
    )


# ---------------------------------------------------------------------------
# Round-6 batch 2: shard reproducibility checksums
# ---------------------------------------------------------------------------


@register(
    "pipeline_shard_checksum",
    f"""
    WITH keyed AS (
        SELECT doc_id, text, length(text) AS n_chars,
               md5(CAST(doc_id AS VARCHAR)) AS h
        FROM documents
    ),
    sharded AS (
        SELECT doc_id, n_chars,
               {_HEX12} % 16 AS shard,
               md5(CAST(doc_id AS VARCHAR) || ':' || text) AS ch
        FROM keyed
    ),
    dig AS (
        SELECT shard, doc_id, n_chars,
               ({_HEX12.replace("substr(h,", "substr(ch,")}) % 4294967296 AS d32
        FROM sharded
    )
    SELECT CAST(shard AS BIGINT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS n_chars_total,
           CAST(SUM(d32) AS BIGINT) AS checksum_sum,
           CAST(MIN(doc_id) AS BIGINT) AS min_doc_id,
           CAST(MAX(doc_id) AS BIGINT) AS max_doc_id
    FROM dig GROUP BY shard ORDER BY shard
    """,
)
def pipeline_shard_checksum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-shard content checksums — the reproducibility audit a
    training pipeline runs after every rerun/migration: two shard sets
    are byte-identical iff their (count, char mass, content checksum)
    triples match, WITHOUT sorting or pairwise comparison.  The
    checksum is the SUM of per-doc 32-bit digests (md5 of id:text), a
    commutative aggregate — order-independent by construction, exact
    bigint on both engines (2^32 · rows stays far under 2^63), and
    duplicate-sensitive where plain XOR would silently cancel repeated
    rows.

    Scale shape: pure map (md5 per doc) + ONE map-side-combinable
    groupBy(shard) with O(|shards|) output.  At 100 TB this is the
    cheapest possible full-corpus integrity pass — one scan, no
    shuffle beyond 16 partial rows per task."""
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    keyed = docs.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n_chars"),
        F.md5(F.col("doc_id").cast("string").cast("binary")).alias("h"),
        F.md5(
            F.concat(F.col("doc_id").cast("string"), F.lit(":"), F.col("text")).cast(
                "binary"
            )
        ).alias("ch"),
    )
    dig = keyed.select(
        "doc_id",
        "n_chars",
        (F.expr("cast(conv(substring(h, 1, 12), 16, 10) as bigint)") % 16).alias(
            "shard"
        ),
        (
            F.expr("cast(conv(substring(ch, 1, 12), 16, 10) as bigint)") % 4294967296
        ).alias("d32"),
    )
    return (
        dig.groupBy("shard")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_chars").cast("bigint").alias("n_chars_total"),
            F.sum("d32").cast("bigint").alias("checksum_sum"),
            F.min("doc_id").cast("bigint").alias("min_doc_id"),
            F.max("doc_id").cast("bigint").alias("max_doc_id"),
        )
        .select(
            F.col("shard").cast("bigint"),
            "n_docs",
            "n_chars_total",
            "checksum_sum",
            "min_doc_id",
            "max_doc_id",
        )
        .orderBy("shard")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 3: incremental snapshot manifest
# ---------------------------------------------------------------------------


@register(
    "pipeline_incremental_manifest",
    f"""
    WITH v1 AS (SELECT doc_id, text FROM documents),
    v2 AS (
        SELECT doc_id,
               CASE WHEN doc_id % 13 = 0 THEN text || ' rev2' ELSE text END AS text
        FROM documents WHERE doc_id % 31 != 0
        UNION ALL
        SELECT doc_id + 500000 AS doc_id, text
        FROM documents WHERE doc_id % 41 = 0
    ),
    d1 AS (
        SELECT doc_id,
               ({_HEX12.replace("substr(h,", "substr(ch,")}) % 4294967296 AS dg
        FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || text) AS ch FROM v1)
    ),
    d2 AS (
        SELECT doc_id,
               ({_HEX12.replace("substr(h,", "substr(ch,")}) % 4294967296 AS dg
        FROM (SELECT doc_id, md5(CAST(doc_id AS VARCHAR) || ':' || text) AS ch FROM v2)
    ),
    j AS (
        SELECT COALESCE(a.doc_id, b.doc_id) AS doc_id,
               CASE WHEN a.doc_id IS NULL THEN 'added'
                    WHEN b.doc_id IS NULL THEN 'removed'
                    WHEN a.dg != b.dg THEN 'changed'
                    ELSE 'unchanged' END AS status
        FROM d1 a FULL OUTER JOIN d2 b ON a.doc_id = b.doc_id
    ),
    sh AS (
        SELECT status,
               ({_HEX12}) % 16 AS shard
        FROM (SELECT status, md5(CAST(doc_id AS VARCHAR)) AS h FROM j)
    )
    SELECT CAST(shard AS BIGINT) AS shard, status,
           CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM sh GROUP BY shard, status
    ORDER BY shard, status
    """,
)
def pipeline_incremental_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot-diff manifest — the incremental-ingestion audit between
    two corpus versions: per shard, how many docs were added, removed,
    changed, or untouched, detected by content digest (md5 of id:text),
    never by text comparison.  The derived v2 plants all three edit
    kinds deterministically (drop every 31st, revise every 13th, add a
    copy of every 41st under a new id) so both engines diff the same
    pair.  This is the shape of a versioned-table changefeed audit:
    digests make the diff O(join) instead of O(bytes compared).

    Scale shape: two map passes (digest per side) + ONE full outer
    equi-join on doc_id + a map-side-combinable groupBy(shard, status)
    with ≤ 16·4 output rows.  At 100 TB the join is the only shuffle
    and AQE sizes it; no sort, no window, no text movement — digests
    (16 bytes) ride the shuffle, not documents."""
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    v2 = (
        docs.filter(F.col("doc_id") % 31 != 0)
        .select(
            "doc_id",
            F.when(
                F.col("doc_id") % 13 == 0, F.concat(F.col("text"), F.lit(" rev2"))
            )
            .otherwise(F.col("text"))
            .alias("text"),
        )
        .unionByName(
            docs.filter(F.col("doc_id") % 41 == 0).select(
                (F.col("doc_id") + 500000).alias("doc_id"), "text"
            )
        )
    )

    def digests(df: DataFrame, side: str) -> DataFrame:
        return df.select(
            F.col("doc_id").alias(f"{side}_id"),
            (
                F.expr(
                    "cast(conv(substring(md5(cast("
                    "concat(cast(doc_id as string), ':', text) as binary"
                    ")), 1, 12), 16, 10) as bigint)"
                )
                % 4294967296
            ).alias(f"{side}_dg"),
        )

    j = digests(docs, "a").join(
        digests(v2, "b"), F.col("a_id") == F.col("b_id"), "full_outer"
    )
    st = j.select(
        F.coalesce(F.col("a_id"), F.col("b_id")).alias("doc_id"),
        F.when(F.col("a_id").isNull(), F.lit("added"))
        .when(F.col("b_id").isNull(), F.lit("removed"))
        .when(F.col("a_dg") != F.col("b_dg"), F.lit("changed"))
        .otherwise(F.lit("unchanged"))
        .alias("status"),
    )
    sh = st.select(
        "status",
        (
            F.expr(
                "cast(conv(substring(md5(cast(cast(doc_id as string) as binary)),"
                " 1, 12), 16, 10) as bigint)"
            )
            % 16
        ).alias("shard"),
    )
    return (
        sh.groupBy("shard", "status")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
        .select(F.col("shard").cast("bigint"), "status", "n_docs")
        .orderBy("shard", "status")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 4: Simpson diversity, join-skew audit, per-source OOV
# ---------------------------------------------------------------------------


@register(
    "quality_simpson_diversity",
    r"""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    c AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
    agg AS (
        SELECT source,
               SUM(c) AS n_tokens,
               COUNT(*) AS n_types,
               SUM(c * (c - 1)) AS coll2
        FROM c GROUP BY source
    )
    SELECT source,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(n_types AS BIGINT) AS n_types,
           CAST((1000000 * coll2) // (n_tokens * (n_tokens - 1)) AS BIGINT)
               AS simpson_micro,
           CAST(1000000 - (1000000 * coll2) // (n_tokens * (n_tokens - 1))
               AS BIGINT) AS diversity_micro
    FROM agg ORDER BY source
    """,
)
def quality_simpson_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source lexical diversity via the Simpson index — the
    probability two tokens drawn without replacement from a source are
    the SAME type (Σc(c−1)/N(N−1), the unbiased collision estimator),
    and its complement (Gini–Simpson diversity).  A source whose
    diversity collapses is template/boilerplate-heavy — the
    mixture-weighting signal TTR misses because TTR ignores the shape
    of the frequency tail.  Exact integer micro-units on both engines
    (N ≤ 10⁶ tokens/source at test SF keeps 10⁶·Σc(c−1) far inside
    bigint; production keeps the same integers per shard and merges
    numerators/denominators — both are plain sums).

    Scale shape: explode → ONE map-side-combinable groupBy(source,
    token) → ONE groupBy(source) over the per-type counts; output
    |sources| rows.  No window, no join, combinable end-to-end (the
    same two-level aggregate pattern as the burstiness query)."""
    docs = load_testdata(spark, sf_dir, "documents")
    tok = docs.select(
        "source", F.explode(F.split("text", X.TOKEN_RE)).alias("tok")
    )
    c = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    agg = c.groupBy("source").agg(
        F.sum("c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_types"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("coll2"),
    )
    return agg.select(
        "source",
        F.col("n_tokens").cast("bigint"),
        F.col("n_types").cast("bigint"),
        F.expr("div(1000000 * coll2, n_tokens * (n_tokens - 1))")
        .cast("bigint")
        .alias("simpson_micro"),
        (
            F.lit(1000000)
            - F.expr("div(1000000 * coll2, n_tokens * (n_tokens - 1))")
        )
        .cast("bigint")
        .alias("diversity_micro"),
    ).orderBy("source")


@register(
    "pipeline_skew_report",
    """
    WITH c AS (
        SELECT l_partkey AS k, COUNT(*) AS cnt FROM lineitem GROUP BY l_partkey
    ),
    grid AS (SELECT cnt, COUNT(*) AS m FROM c GROUP BY cnt),
    tot AS (
        SELECT SUM(m) AS n_keys, SUM(cnt * m) AS n_rows, MAX(cnt) AS max_cnt
        FROM grid
    ),
    cum AS (
        SELECT cnt, SUM(m) OVER (ORDER BY cnt) AS ckeys FROM grid
    ),
    q AS (
        SELECT t.n_keys, t.n_rows, t.max_cnt,
               MIN(CASE WHEN 2 * u.ckeys >= t.n_keys THEN u.cnt END) AS p50_cnt,
               MIN(CASE WHEN 100 * u.ckeys >= 99 * t.n_keys THEN u.cnt END) AS p99_cnt
        FROM cum u, tot t
        GROUP BY t.n_keys, t.n_rows, t.max_cnt
    )
    SELECT CAST(n_keys AS BIGINT) AS n_keys,
           CAST(n_rows AS BIGINT) AS n_rows,
           CAST(max_cnt AS BIGINT) AS max_cnt,
           CAST(p50_cnt AS BIGINT) AS p50_cnt,
           CAST(p99_cnt AS BIGINT) AS p99_cnt,
           CAST((1000000 * max_cnt) // n_rows AS BIGINT) AS top_share_micro,
           CAST((1000 * max_cnt) // p50_cnt AS BIGINT) AS skew_ratio_milli
    FROM q
    """,
)
def pipeline_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew audit over a prospective shuffle key (l_partkey) —
    the report a planner consults before choosing salting / skew-join
    handling: key count, hottest-key share, and the max/median key-mass
    ratio.  Quantiles come from the count-of-counts grid (how many keys
    occur exactly c times), so the global cumsum runs over a relation
    bounded by |distinct frequencies|, never over keys or rows.

    Scale shape: ONE map-side-combinable groupBy(key) → ONE
    groupBy(cnt) collapse to the grid → scalar aggregates + a global
    window over the GRID (bounded; allowlisted in the fleet
    unpartitioned-window guard with this justification).  At 100 TB
    this is the cheapest possible skew probe: two combinable
    aggregates and arithmetic on ≤ a few hundred grid rows."""
    li = load_testdata(spark, sf_dir, "lineitem").select("l_partkey")
    c = li.groupBy(F.col("l_partkey").alias("k")).agg(F.count(F.lit(1)).alias("cnt"))
    grid = c.groupBy("cnt").agg(F.count(F.lit(1)).alias("m"))
    tot = grid.agg(
        F.sum("m").alias("n_keys"),
        F.sum(F.col("cnt") * F.col("m")).alias("n_rows"),
        F.max("cnt").alias("max_cnt"),
    )
    w = Window.orderBy("cnt").rowsBetween(Window.unboundedPreceding, 0)
    cum = grid.withColumn("ckeys", F.sum("m").over(w))
    q = cum.crossJoin(F.broadcast(tot)).agg(
        F.first("n_keys").alias("n_keys"),
        F.first("n_rows").alias("n_rows"),
        F.first("max_cnt").alias("max_cnt"),
        F.min(
            F.when(2 * F.col("ckeys") >= F.col("n_keys"), F.col("cnt"))
        ).alias("p50_cnt"),
        F.min(
            F.when(100 * F.col("ckeys") >= 99 * F.col("n_keys"), F.col("cnt"))
        ).alias("p99_cnt"),
    )
    return q.select(
        F.col("n_keys").cast("bigint"),
        F.col("n_rows").cast("bigint"),
        F.col("max_cnt").cast("bigint"),
        F.col("p50_cnt").cast("bigint"),
        F.col("p99_cnt").cast("bigint"),
        F.expr("div(1000000 * max_cnt, n_rows)").cast("bigint").alias("top_share_micro"),
        F.expr("div(1000 * max_cnt, p50_cnt)").cast("bigint").alias("skew_ratio_milli"),
    )


@register(
    "vocab_oov_rate_by_source",
    r"""
    WITH tok AS (
        SELECT source, unnest(string_split_regex(text, '\s+')) AS tok
        FROM documents
    ),
    gtok AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok),
    vocab AS (
        SELECT tok FROM gtok ORDER BY c DESC, tok ASC LIMIT 256
    ),
    per_src AS (SELECT source, tok, COUNT(*) AS c FROM tok GROUP BY source, tok),
    m AS (
        SELECT p.source, p.c,
               CASE WHEN v.tok IS NULL THEN 0 ELSE 1 END AS in_vocab
        FROM per_src p LEFT JOIN vocab v ON v.tok = p.tok
    )
    SELECT source,
           CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN in_vocab = 0 THEN c ELSE 0 END) AS BIGINT) AS n_oov,
           CAST((1000 * SUM(CASE WHEN in_vocab = 0 THEN c ELSE 0 END)) // SUM(c)
               AS BIGINT) AS oov_permille
    FROM m GROUP BY source ORDER BY source
    """,
)
def vocab_oov_rate_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-vocabulary rate per source against the corpus top-256
    vocabulary (count-desc, token-asc tie-break — deterministic on both
    engines) — the mixture diagnostic that flags a source whose token
    distribution the shared tokenizer/vocab serves poorly (high OOV =
    fertility blowup for that slice).

    Scale shape: the vocab is a TakeOrderedAndProject over the global
    token counts (top-k, never a full sort); per-source counts are ONE
    combinable groupBy; membership is an equi-join against the ≤256-row
    broadcast vocab.  Everything is bounded by vocab size or |sources|
    after the two token aggregates."""
    docs = load_testdata(spark, sf_dir, "documents")
    tok = docs.select("source", F.explode(F.split("text", X.TOKEN_RE)).alias("tok"))
    glob = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("c"))
    vocab = glob.orderBy(F.col("c").desc(), F.col("tok").asc()).limit(256).select("tok")
    per_src = tok.groupBy("source", "tok").agg(F.count(F.lit(1)).alias("c"))
    m = per_src.join(
        F.broadcast(vocab.withColumn("in_vocab", F.lit(1))), "tok", "left"
    )
    return (
        m.groupBy("source")
        .agg(
            F.sum("c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(F.col("in_vocab").isNull(), F.col("c")).otherwise(0))
            .cast("bigint")
            .alias("n_oov"),
        )
        .select(
            "source",
            "n_tokens",
            "n_oov",
            F.expr("div(1000 * n_oov, n_tokens)").cast("bigint").alias("oov_permille"),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 5: hopping-window rollup (F.window slide semantics, batch twin)
# ---------------------------------------------------------------------------


@register(
    "events_hopping_window_rate",
    """
    WITH e AS (
        SELECT event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS e_us,
               CAST(round(value * 1000) AS BIGINT) AS v_milli
        FROM events
    ),
    expanded AS (
        SELECT event_type, v_milli,
               (e_us // 300000000) * 300000000 - k * 300000000 AS win_start_us
        FROM e CROSS JOIN (SELECT unnest([0, 1, 2]) AS k)
    )
    SELECT CAST(win_start_us AS BIGINT) AS win_start_us,
           event_type,
           CAST(COUNT(*) AS BIGINT) AS n_events,
           CAST(SUM(v_milli) AS BIGINT) AS total_value_milli
    FROM expanded
    GROUP BY win_start_us, event_type
    ORDER BY win_start_us, event_type
    """,
)
def events_hopping_window_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hopping-window rollup via Spark's built-in ``F.window`` (15-min
    windows sliding every 5 min) — the batch twin of the Structured
    Streaming windowed aggregation in ``streaming/incremental.py:127``,
    registered so the overlap semantics themselves are oracle-gated:
    every event lands in exactly window/slide = 3 windows, and the
    DuckDB twin expands each event into those 3 epoch-aligned starts
    explicitly ((e_us // slide)·slide − k·slide, k ∈ 0..2).  Spark's
    TimeWindow aligns to the epoch in absolute microseconds, which is
    exactly the twin's integer arithmetic (session TZ is pinned by
    ``load_testdata``, so both engines see the same instants).

    Scale shape: the window expansion is a map-side Expand (3 rows per
    event, constant factor — the streaming engine does the same), then
    ONE map-side-combinable groupBy((window, type)); output is bounded
    by time-range/slide × |types|, not by events."""
    ev = load_testdata(spark, sf_dir, "events").select(
        "ts",
        "event_type",
        F.expr("cast(round(value * 1000) as bigint)").alias("v_milli"),
    )
    win = ev.groupBy(
        F.window("ts", "15 minutes", "5 minutes").alias("w"), "event_type"
    ).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum("v_milli").alias("total_value_milli"),
    )
    return win.select(
        F.unix_micros(F.col("w.start")).alias("win_start_us"),
        "event_type",
        F.col("n_events").cast("bigint"),
        F.col("total_value_milli").cast("bigint"),
    ).orderBy("win_start_us", "event_type")


# ---------------------------------------------------------------------------
# Round-6 batch 6: exact OLS trend per event type
# ---------------------------------------------------------------------------


@register(
    "events_value_trend_ols",
    """
    WITH e AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               CAST(round(value * 1000) AS BIGINT) AS y
        FROM events
    ),
    daily AS (
        SELECT event_type, x,
               SUM(y) // COUNT(*) AS ybar,
               COUNT(*) AS n_ev
        FROM e GROUP BY event_type, x
    ),
    m AS (
        SELECT event_type,
               COUNT(*) AS n,
               SUM(n_ev) AS n_events,
               SUM(x) AS sx, SUM(ybar) AS sy,
               SUM(x * x) AS sxx, SUM(x * ybar) AS sxy
        FROM daily GROUP BY event_type
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CAST(n_events AS BIGINT) AS n_events,
           CAST((1000000 * (n * sxy - sx * sy))
                // (n * sxx - sx * sx) AS BIGINT) AS slope_micro_per_day
    FROM m ORDER BY event_type
    """,
)
def events_value_trend_ols(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type value trend via exact ordinary least squares over the
    DAILY MEAN series — the drift detector that reads as a rate
    (milli-value change per day), complementing CUSUM (which finds
    WHEN a shift happened) with HOW FAST the level is moving.  The
    regression runs over (day, daily-mean) points, so every magnitude
    is bounded by the VALUE DOMAIN and the day count — never by corpus
    size: an earlier per-event formulation overflowed bigint at the
    10x blow-up because 10^6·(nΣxy − ΣxΣy) grows ∝ N² (caught by
    tools/scale_experiment.py, NOTES.md round-6) — the daily-mean form
    keeps n ≤ |days| ≈ 31 and y ≤ max value forever.  The slope is one
    floor division over integer cross-moments, bit-identical on both
    engines (both truncate toward zero, verified for negative slopes).
    x is days since a fixed anchor (2024-01-01, near the data): slopes
    are shift-invariant, the anchor only bounds x.

    Scale shape: ONE map-side-combinable groupBy(event_type, day)
    collapses the corpus to ≤ |types|·|days| rows; the five cross-
    moment sums are a second combinable groupBy over that bounded
    relation — the canonical distributed-regression shape with a
    bounded second stage."""
    ev = load_testdata(spark, sf_dir, "events").select(
        "event_type",
        F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        F.expr("cast(round(value * 1000) as bigint)").alias("y"),
    )
    daily = ev.groupBy("event_type", "x").agg(
        F.expr("div(sum(y), count(1))").alias("ybar"),
        F.count(F.lit(1)).alias("n_ev"),
    )
    m = daily.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("n_ev").alias("n_events"),
        F.sum("x").alias("sx"),
        F.sum("ybar").alias("sy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("x") * F.col("ybar")).alias("sxy"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.col("n_events").cast("bigint").alias("n_events"),
        F.expr("div(1000000 * (n * sxy - sx * sy), n * sxx - sx * sx)")
        .cast("bigint")
        .alias("slope_micro_per_day"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-6 batch 7: Fellegi-Sunter record-linkage scoring
# ---------------------------------------------------------------------------

# Fixed integer agreement/disagreement weights (deci-bans, the classic
# log(m/u)-shaped magnitudes a production linker trains offline via EM;
# pinned constants here so both engines score identically with zero
# float arithmetic).
_FS_W = {
    "name": (40, -12),  # agreement on full name is near-conclusive
    "bal": (22, -4),    # exact balance match: strong, cheap to fake
    "seg": (8, -9),     # 5-value segment: weak agree, firm disagree
}
_FS_MATCH, _FS_POSSIBLE = 45, 10

# Candidate cap for the hot-block variant: normal blocks are ≤10 ids per
# side (the 17-char prefix pins 8 of 9 key digits → ≤100 candidates), so
# 128 caps ONLY genuinely hot blocks and the base fixture's pairs stay
# exact at every SF.
_FS_HOT_CAP = 128


def _fs_sides(cust: DataFrame, *, planted_hot: bool = False):
    """A/B sides of the FS linkage fixture with the blocking key
    materialized — A keeps natural names (id, name, nat, bal_c, seg,
    blk), B is the registry copy with ``b_``-prefixed record columns
    and the SAME (nat, blk) block-key names, as
    ``operators.linkage.blocked_bipartite_pairs`` requires.

    ``planted_hot=True`` additionally collapses every 3rd record (both
    sides, verbatim — no B perturbation) onto one per-nation identity
    ('Customer#HOTBLOCK', balance 424242+nat, segment BUILDING): the
    repeat-heavy production shape (franchise branches, placeholder
    rows, ingest replays) where one block holds f records per side and
    all-pairs blocking emits f² candidates.  The hot rows are exact
    duplicates, so each nation's hot block is a clique under the FS
    match predicate — the regime where star emission preserves
    connected components exactly."""
    a = cust.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        F.col("c_nationkey").alias("nat"),
        F.expr("cast(round(c_acctbal * 100) as bigint)").alias("bal_c"),
        F.col("c_mktsegment").alias("seg"),
    )
    if planted_hot:
        hot = F.col("id") % 3 == 0
        a = a.select(
            "id",
            F.when(hot, F.lit("Customer#HOTBLOCK")).otherwise(F.col("name")).alias("name"),
            "nat",
            F.when(hot, (F.lit(424242) + F.col("nat")).cast("bigint"))
            .otherwise(F.col("bal_c"))
            .alias("bal_c"),
            F.when(hot, F.lit("BUILDING")).otherwise(F.col("seg")).alias("seg"),
        )
        keep = F.col("id") % 3 == 0
    else:
        keep = F.lit(False)
    b = a.select(
        (F.col("id") + 1000000).alias("id"),
        F.when(
            ~keep & (F.col("id") % 7 == 0),
            F.concat(F.expr("substring(name, 1, length(name) - 1)"), F.lit("X")),
        )
        .otherwise(F.col("name"))
        .alias("name"),
        "nat",
        F.when(~keep & (F.col("id") % 5 == 0), F.col("bal_c") + 1)
        .otherwise(F.col("bal_c"))
        .alias("bal_c"),
        F.when(~keep & (F.col("id") % 11 == 0), F.lit("AUTOMOBILE"))
        .otherwise(F.col("seg"))
        .alias("seg"),
    )
    aa = a.withColumn("blk", F.expr("substring(name, 1, 17)"))
    bb = b.select(
        "nat",
        F.expr("substring(name, 1, 17)").alias("blk"),
        F.col("id").alias("b_id"),
        F.col("name").alias("b_name"),
        F.col("bal_c").alias("b_bal_c"),
        F.col("seg").alias("b_seg"),
    )
    return aa, bb


def _fs_score():
    """The FS deci-ban score column over a candidate-pair row (A columns
    natural, B columns ``b_``-prefixed)."""
    wn, wb, ws = _FS_W["name"], _FS_W["bal"], _FS_W["seg"]
    return (
        F.when(F.col("name") == F.col("b_name"), wn[0]).otherwise(wn[1])
        + F.when(F.col("bal_c") == F.col("b_bal_c"), wb[0]).otherwise(wb[1])
        + F.when(F.col("seg") == F.col("b_seg"), ws[0]).otherwise(ws[1])
    )


@register(
    "customers_record_linkage_fs",
    f"""
    WITH a AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
               c_mktsegment AS seg
        FROM customer
    ),
    b AS (
        SELECT id + 1000000 AS id,
               CASE WHEN id % 7 = 0 THEN substr(name, 1, length(name) - 1) || 'X'
                    ELSE name END AS name,
               nat,
               CASE WHEN id % 5 = 0 THEN bal_c + 1 ELSE bal_c END AS bal_c,
               CASE WHEN id % 11 = 0 THEN 'AUTOMOBILE' ELSE seg END AS seg
        FROM a
    ),
    cand AS (
        SELECT a.id AS id_a, b.id AS id_b,
               CASE WHEN a.name = b.name THEN 1 ELSE 0 END AS g_name,
               CASE WHEN a.bal_c = b.bal_c THEN 1 ELSE 0 END AS g_bal,
               CASE WHEN a.seg = b.seg THEN 1 ELSE 0 END AS g_seg
        FROM a JOIN b
          ON a.nat = b.nat
         AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
    ),
    scored AS (
        SELECT g_name, g_bal, g_seg,
               (CASE WHEN g_name = 1 THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END
              + CASE WHEN g_bal = 1 THEN {_FS_W['bal'][0]} ELSE {_FS_W['bal'][1]} END
              + CASE WHEN g_seg = 1 THEN {_FS_W['seg'][0]} ELSE {_FS_W['seg'][1]} END)
                   AS score
        FROM cand
    )
    SELECT CAST(g_name AS BIGINT) AS g_name,
           CAST(g_bal AS BIGINT) AS g_bal,
           CAST(g_seg AS BIGINT) AS g_seg,
           CAST(score AS BIGINT) AS score,
           CASE WHEN score >= {_FS_MATCH} THEN 'match'
                WHEN score >= {_FS_POSSIBLE} THEN 'possible'
                ELSE 'non_match' END AS class,
           CAST(COUNT(*) AS BIGINT) AS n_pairs
    FROM scored
    GROUP BY g_name, g_bal, g_seg, score
    ORDER BY g_name, g_bal, g_seg
    """,
)
def customers_record_linkage_fs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fellegi–Sunter probabilistic record linkage — the multi-field
    entity-resolution tier above single-field fuzzy matching
    (`fuzzy_name_pairs_symspell`): a planted registry B (every 7th name
    perturbed, every 5th balance off by a cent, every 11th segment
    wrong) is linked back to A through a blocking key, each candidate
    pair scored by summing fixed integer agreement/disagreement weights
    (the log(m/u)-shaped deci-bans a production linker fits via EM),
    and classified match / possible / non-match by the two FS
    thresholds.  Output is the agreement-pattern histogram with its
    score and class — the table a linkage analyst reads to set
    thresholds.

    Scale shape: blocking = ONE equi-join on (nation, 17-char
    name-prefix) — the prefix pins 8 of 9 key digits, so block size is
    ≤10 ids at ANY corpus size (block count grows ∝ N, sizes don't) and
    candidate count stays ∝ N, never |A|·|B|; scoring is a map;
    the histogram is a map-side-combinable groupBy over ≤2³ patterns.
    The quadratic failure mode (block skew) is the same hazard the LSH
    hot-bucket valve addresses — blocking keys here are near-unique by
    construction, and a production run would audit them with
    `pipeline_skew_report` first.  ``hot_block_cap=None`` keeps exact
    all-pairs blocking (one equi-join, the oracle-checked semantics);
    the repeat-heavy variant with the cap engaged is
    ``customers_linkage_clusters_capped``."""
    cust = load_testdata(spark, sf_dir, "customer")
    aa, bb = _fs_sides(cust)
    cand = LK.blocked_bipartite_pairs(
        aa, bb, ["nat", "blk"], "id", "b_id", hot_block_cap=None
    )
    wn, wb, ws = _FS_W["name"], _FS_W["bal"], _FS_W["seg"]
    scored = cand.select(
        F.when(F.col("name") == F.col("b_name"), 1).otherwise(0).alias("g_name"),
        F.when(F.col("bal_c") == F.col("b_bal_c"), 1).otherwise(0).alias("g_bal"),
        F.when(F.col("seg") == F.col("b_seg"), 1).otherwise(0).alias("g_seg"),
    ).select(
        "g_name",
        "g_bal",
        "g_seg",
        (
            F.when(F.col("g_name") == 1, wn[0]).otherwise(wn[1])
            + F.when(F.col("g_bal") == 1, wb[0]).otherwise(wb[1])
            + F.when(F.col("g_seg") == 1, ws[0]).otherwise(ws[1])
        ).alias("score"),
    )
    return (
        scored.groupBy("g_name", "g_bal", "g_seg", "score")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_pairs"))
        .select(
            F.col("g_name").cast("bigint"),
            F.col("g_bal").cast("bigint"),
            F.col("g_seg").cast("bigint"),
            F.col("score").cast("bigint"),
            F.when(F.col("score") >= _FS_MATCH, "match")
            .when(F.col("score") >= _FS_POSSIBLE, "possible")
            .otherwise("non_match")
            .alias("class"),
            "n_pairs",
        )
        .orderBy("g_name", "g_bal", "g_seg")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 8: earth-mover's distance between source length profiles
# ---------------------------------------------------------------------------


@register(
    "text_source_length_emd",
    r"""
    WITH t AS (
        SELECT source, len(string_split_regex(text, '\s+')) AS n_tok
        FROM documents
    ),
    mm AS (SELECT MIN(n_tok) AS mn, MAX(n_tok) AS mx FROM t),
    bkt AS (
        SELECT source,
               least((32 * (n_tok - mn)) // (mx - mn + 1), 31) AS b
        FROM t, mm
    ),
    c AS (SELECT source, b, COUNT(*) AS c FROM bkt GROUP BY source, b),
    srcs AS (SELECT DISTINCT source FROM t),
    grid AS (
        SELECT s.source, g.b, COALESCE(c.c, 0) AS c
        FROM srcs s CROSS JOIN (SELECT unnest(generate_series(0, 31)) AS b) g
        LEFT JOIN c ON c.source = s.source AND c.b = g.b
    ),
    cum AS (
        SELECT source, b,
               SUM(c) OVER (PARTITION BY source ORDER BY b) AS cc
        FROM grid
    ),
    tot AS (SELECT source, SUM(c) AS n FROM grid GROUP BY source),
    pairs AS (
        SELECT a.source AS source_a, b2.source AS source_b,
               SUM(abs(a.cc * tb.n - b2.cc * ta.n)) AS numer,
               ANY_VALUE(ta.n) AS na, ANY_VALUE(tb.n) AS nb
        FROM cum a
        JOIN cum b2 ON b2.b = a.b AND a.source < b2.source
        JOIN tot ta ON ta.source = a.source
        JOIN tot tb ON tb.source = b2.source
        GROUP BY a.source, b2.source
    )
    SELECT source_a, source_b,
           CAST(na AS BIGINT) AS n_a,
           CAST(nb AS BIGINT) AS n_b,
           CAST((1000000 * numer) // (na * nb) AS BIGINT) AS emd_micro_buckets
    FROM pairs ORDER BY source_a, source_b
    """,
)
def text_source_length_emd(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise 1-D earth-mover's (Wasserstein-1) distance between the
    per-source document-length distributions, over a 32-bucket
    equi-width grid — the transport metric that complements TVD
    (`text_source_token_tvd`): TVD counts how much mass differs, EMD
    counts how FAR it has to move, so a source whose docs are uniformly
    ~10% longer scores near-zero TVD-per-bucket but a real EMD.  For
    sorted 1-D histograms W₁ = Σ_b |F_a(b) − F_b(b)| exactly, computed
    in cross-multiplied integers (|ca·n_b − cb·n_a| summed, one floor
    division at the end) — micro-units of bucket widths, bit-identical
    on both engines.  (At web scale the per-bucket cumulative shares
    would be reduced to micro-units per source FIRST to keep the
    cross-products in bigint; exactness at test SF needs no such
    rounding.)

    Scale shape: one map-side-combinable groupBy(source, bucket), a
    |sources|×32 dense grid, a cumsum WINDOW PARTITIONED by source
    (bounded 32-row frames), and a pair join on the bucket index —
    everything after the first aggregate is bounded by |sources|²·32,
    independent of corpus size.  The min/max is a 1-row broadcast
    (BNLJ-allowlisted)."""
    docs = load_testdata(spark, sf_dir, "documents")
    t = docs.select(
        "source", F.size(F.split("text", X.TOKEN_RE)).cast("long").alias("n_tok")
    )
    mm = t.agg(F.min("n_tok").alias("mn"), F.max("n_tok").alias("mx"))
    bkt = t.crossJoin(F.broadcast(mm)).select(
        "source",
        F.least(
            F.expr("div(32 * (n_tok - mn), mx - mn + 1)"), F.lit(31)
        ).alias("b"),
    )
    c = bkt.groupBy("source", "b").agg(F.count(F.lit(1)).alias("c"))
    srcs = t.select("source").distinct()
    gridb = spark.range(32).select(F.col("id").alias("b"))
    grid = (
        srcs.crossJoin(F.broadcast(gridb))
        .join(c, ["source", "b"], "left")
        .select("source", "b", F.coalesce(F.col("c"), F.lit(0)).alias("c"))
    )
    w = Window.partitionBy("source").orderBy("b").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = grid.withColumn("cc", F.sum("c").over(w))
    tot = grid.groupBy("source").agg(F.sum("c").alias("n"))
    a = cum.select(
        F.col("source").alias("source_a"), "b", F.col("cc").alias("cc_a")
    ).join(tot.select(F.col("source").alias("source_a"), F.col("n").alias("na")), "source_a")
    bb = cum.select(
        F.col("source").alias("source_b"), F.col("b").alias("b2"), F.col("cc").alias("cc_b")
    ).join(tot.select(F.col("source").alias("source_b"), F.col("n").alias("nb")), "source_b")
    pairs = (
        a.join(bb, (F.col("b") == F.col("b2")) & (F.col("source_a") < F.col("source_b")))
        .groupBy("source_a", "source_b")
        .agg(
            F.sum(F.abs(F.col("cc_a") * F.col("nb") - F.col("cc_b") * F.col("na"))).alias("numer"),
            F.first("na").alias("na"),
            F.first("nb").alias("nb"),
        )
    )
    return pairs.select(
        "source_a",
        "source_b",
        F.col("na").cast("bigint").alias("n_a"),
        F.col("nb").cast("bigint").alias("n_b"),
        F.expr("div(1000000 * numer, na * nb)").cast("bigint").alias("emd_micro_buckets"),
    ).orderBy("source_a", "source_b")


# ---------------------------------------------------------------------------
# Round-6 batch 9: session-scoped first/last-touch revenue attribution
# ---------------------------------------------------------------------------


@register(
    "events_touch_attribution",
    """
    WITH e AS (
        SELECT user_id, event_id, event_type,
               epoch_us(CAST(ts AS TIMESTAMP)) AS ts_us,
               CAST(round(value * 1000) AS BIGINT) AS v_milli
        FROM events
    ),
    gaps AS (
        SELECT *, LAG(ts_us) OVER (PARTITION BY user_id
                                   ORDER BY ts_us, event_id) AS prev_us
        FROM e
    ),
    flagged AS (
        SELECT *, CASE WHEN prev_us IS NULL OR ts_us - prev_us > 1800000000
                       THEN 1 ELSE 0 END AS new_session
        FROM gaps
    ),
    sess AS (
        SELECT *, SUM(new_session) OVER (PARTITION BY user_id
                   ORDER BY ts_us, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
        FROM flagged
    ),
    touched AS (
        SELECT *,
               first_value(CASE WHEN event_type != 'purchase'
                                THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id, sid ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS first_touch,
               last_value(CASE WHEN event_type != 'purchase'
                               THEN event_type END IGNORE NULLS)
                   OVER (PARTITION BY user_id, sid ORDER BY ts_us, event_id
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS last_touch
        FROM sess
    ),
    conv AS (
        SELECT COALESCE(first_touch, 'direct') AS first_touch,
               COALESCE(last_touch, 'direct') AS last_touch,
               v_milli
        FROM touched WHERE event_type = 'purchase'
    ),
    ft AS (
        SELECT first_touch AS channel, COUNT(*) AS n_first,
               SUM(v_milli) AS first_milli
        FROM conv GROUP BY first_touch
    ),
    lt AS (
        SELECT last_touch AS channel, COUNT(*) AS n_last,
               SUM(v_milli) AS last_milli
        FROM conv GROUP BY last_touch
    )
    SELECT COALESCE(ft.channel, lt.channel) AS channel,
           CAST(COALESCE(n_first, 0) AS BIGINT) AS n_first,
           CAST(COALESCE(first_milli, 0) AS BIGINT) AS first_touch_milli,
           CAST(COALESCE(n_last, 0) AS BIGINT) AS n_last,
           CAST(COALESCE(last_milli, 0) AS BIGINT) AS last_touch_milli
    FROM ft FULL OUTER JOIN lt ON lt.channel = ft.channel
    ORDER BY channel
    """,
)
def events_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session-scoped first-touch / last-touch revenue attribution —
    the marketing-analytics standard that funnel counting doesn't
    give: every purchase's value is credited to the first and to the
    last non-purchase event type ('channel') seen earlier in the SAME
    30-minute-gap session ('direct' when the purchase opens its
    session).  The two attribution models bracket multi-touch
    reality; comparing their per-channel totals is the whole point of
    the report.

    Scale shape: sessionization is the proven lag+cumsum pattern (all
    windows PARTITIONED by user or (user, session) — users sort
    independently, never a global sort); first/last touch are
    running first_value/last_value IGNORE NULLS over the same
    partitioning (one Exchange serves all four windows); attribution
    collapses to two combinable groupBys over |channels| rows joined
    full-outer on the bounded channel set."""
    ev = load_testdata(spark, sf_dir, "events").select(
        "user_id",
        "event_id",
        "event_type",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("ts_us"),
        F.expr("cast(round(value * 1000) as bigint)").alias("v_milli"),
    )
    wu = Window.partitionBy("user_id").orderBy("ts_us", "event_id")
    flagged = ev.withColumn(
        "new_session",
        F.when(
            F.lag("ts_us").over(wu).isNull()
            | (F.col("ts_us") - F.lag("ts_us").over(wu) > 1_800_000_000),
            1,
        ).otherwise(0),
    )
    sess = flagged.withColumn(
        "sid",
        F.sum("new_session").over(wu.rowsBetween(Window.unboundedPreceding, 0)),
    )
    ws = (
        Window.partitionBy("user_id", "sid")
        .orderBy("ts_us", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    touch_expr = F.when(F.col("event_type") != "purchase", F.col("event_type"))
    touched = sess.withColumn(
        "first_touch", F.first(touch_expr, ignorenulls=True).over(ws)
    ).withColumn("last_touch", F.last(touch_expr, ignorenulls=True).over(ws))
    conv = touched.filter(F.col("event_type") == "purchase").select(
        F.coalesce("first_touch", F.lit("direct")).alias("first_touch"),
        F.coalesce("last_touch", F.lit("direct")).alias("last_touch"),
        "v_milli",
    )
    ft = conv.groupBy(F.col("first_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_first"), F.sum("v_milli").alias("first_milli")
    )
    lt = conv.groupBy(F.col("last_touch").alias("channel")).agg(
        F.count(F.lit(1)).alias("n_last"), F.sum("v_milli").alias("last_milli")
    )
    return (
        ft.join(lt, "channel", "full_outer")
        .select(
            "channel",
            F.coalesce("n_first", F.lit(0)).cast("bigint").alias("n_first"),
            F.coalesce("first_milli", F.lit(0)).cast("bigint").alias("first_touch_milli"),
            F.coalesce("n_last", F.lit(0)).cast("bigint").alias("n_last"),
            F.coalesce("last_milli", F.lit(0)).cast("bigint").alias("last_touch_milli"),
        )
        .orderBy("channel")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 10: label-propagation communities over the near-dup graph
# ---------------------------------------------------------------------------

_LPA_STEP_SQL = """
    nl{i} AS (
        SELECT e.u AS node, l.lbl AS lbl, COUNT(*) AS c
        FROM edges_self e JOIN lab{p} l ON l.node = e.v
        GROUP BY e.u, l.lbl
    ),
    mx{i} AS (SELECT node, MAX(c) AS mc FROM nl{i} GROUP BY node),
    pick{i} AS (
        SELECT n.node, MIN(n.lbl) AS lbl
        FROM nl{i} n JOIN mx{i} m ON m.node = n.node AND n.c = m.mc
        GROUP BY n.node
    ),
    lab{i} AS (
        SELECT l.node, COALESCE(p.lbl, l.lbl) AS lbl
        FROM lab{p} l LEFT JOIN pick{i} p ON p.node = l.node
    )"""


@register(
    "dedup_graph_label_propagation",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM cand
              UNION ALL SELECT id_b AS u, id_a AS v FROM cand),
    edges_self AS (SELECT u, v FROM edges
                   UNION ALL SELECT doc_id, doc_id FROM corpus),
    lab0 AS (SELECT doc_id AS node, doc_id AS lbl FROM corpus),
    {_LPA_STEP_SQL.format(i=1, p=0)},
    {_LPA_STEP_SQL.format(i=2, p=1)}
    SELECT CAST(node AS BIGINT) AS doc_id,
           CAST(lbl AS BIGINT) AS community
    FROM lab2 ORDER BY doc_id
    """,
)
def dedup_graph_label_propagation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Synchronous label propagation (2 unrolled rounds) over the LSH
    candidate graph — community detection, the graph tier between
    connected components (pure reachability — `dedup_clusters_minhash`)
    and PageRank (centrality): every node adopts the most frequent
    label among its neighbors AND itself each round (self-inclusive
    voting — the standard fix for sync-LPA's two-node label-swap
    oscillation), ties to the SMALLEST label (the determinism rule
    that makes sync LPA replayable — vanilla LPA with arbitrary
    tie-breaks is non-deterministic by construction).  Isolated nodes
    keep their own id via their self-vote.  Two rounds label dense
    cores without bleeding across weak bridges the way full transitive
    closure does.

    Scale shape: each round is ONE equi-join of the undirected edge
    list with the label vector + two combinable aggregates (per-(node,
    label) counts, then max-count pick with MIN tie-break — the argmax
    expressed as aggregate+filter, no window, no sort).  Per-round cost
    O(|E|), fixed round count, the same static-unroll pattern as the
    PageRank query; the edge list is persisted once and reused by both
    rounds (pinned at runtime by the iterative-graph cache test
    pattern).

    Round-10 (optimization; guide §3.3/§5): the per-round label frame
    is ``localCheckpoint(eager=False)`` — the round's plan references
    ``lab`` twice (the neighbor join and the coalesce join-back), so
    the unrolled plan doubled per round and Catalyst/AQE orchestration
    of the nested tree dominated: sf0.1 A/B 9.6→5.9 s, identical
    output (collect-compared).  Same contract as
    ``connected_components``."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    cand = D.lsh_candidate_pairs(bands, "doc_id").select("id_a", "id_b")
    edges = (
        cand.select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .unionByName(cand.select(F.col("id_b").alias("u"), F.col("id_a").alias("v")))
        .unionByName(
            corpus.select(F.col("doc_id").alias("u"), F.col("doc_id").alias("v"))
        )
        # round 11: repartition before the persist — the 3-branch union
        # otherwise caches 3× the upstream plan's output partitions as
        # slivers (measured 160 at sf0.1) and every round's join
        # re-scans them all; hash(v) is the per-round join key
        .repartition("v")
        .transform(tracked_persist)
    )
    lab = corpus.select(F.col("doc_id").alias("node"), F.col("doc_id").alias("lbl"))
    for _ in range(2):
        nl = (
            edges.join(lab.select(F.col("node").alias("v"), F.col("lbl").alias("nlbl")), "v")
            .groupBy(F.col("u").alias("node"), F.col("nlbl").alias("cand_lbl"))
            .agg(F.count(F.lit(1)).alias("c"))
            # round 11: nl feeds BOTH mx and pick — without this hold
            # the edge⋈label join and its aggregate ran twice per round
            .localCheckpoint(eager=False)
        )
        mx = nl.groupBy("node").agg(F.max("c").alias("mc"))
        pick = (
            nl.join(mx, "node")
            .filter(F.col("c") == F.col("mc"))
            .groupBy("node")
            .agg(F.min("cand_lbl").alias("plbl"))
        )
        lab = lab.join(pick, "node", "left").select(
            "node", F.coalesce("plbl", "lbl").alias("lbl")
        ).localCheckpoint(eager=False)
    return lab.select(
        F.col("node").cast("bigint").alias("doc_id"),
        F.col("lbl").cast("bigint").alias("community"),
    ).orderBy("doc_id")


# ---------------------------------------------------------------------------
# Round-6 batch 8: audience set-overlap, series autocorrelation
# ---------------------------------------------------------------------------


@register(
    "events_audience_overlap_jaccard",
    """
    WITH tmap AS (
        SELECT event_type,
               CAST(dense_rank() OVER (ORDER BY event_type) - 1 AS INTEGER) AS idx
        FROM (SELECT DISTINCT event_type FROM events)
    ),
    masks AS (
        SELECT e.user_id, bit_or(CAST(1 AS BIGINT) << t.idx) AS mask
        FROM events e JOIN tmap t USING (event_type)
        GROUP BY e.user_id
    ),
    mc AS (SELECT mask, COUNT(*) AS n FROM masks GROUP BY mask),
    pairs AS (
        SELECT a.event_type AS type_a, a.idx AS ia,
               b.event_type AS type_b, b.idx AS ib
        FROM tmap a JOIN tmap b ON a.idx < b.idx
    )
    SELECT type_a, type_b,
           CAST(SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ia)) != 0
                         THEN n ELSE 0 END) AS BIGINT) AS n_users_a,
           CAST(SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ib)) != 0
                         THEN n ELSE 0 END) AS BIGINT) AS n_users_b,
           CAST(SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ia)) != 0
                          AND (mask & (CAST(1 AS BIGINT) << ib)) != 0
                         THEN n ELSE 0 END) AS BIGINT) AS n_intersection,
           CAST(SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ia)) != 0
                          OR (mask & (CAST(1 AS BIGINT) << ib)) != 0
                         THEN n ELSE 0 END) AS BIGINT) AS n_union,
           CAST((1000 * SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ia)) != 0
                                  AND (mask & (CAST(1 AS BIGINT) << ib)) != 0
                                 THEN n ELSE 0 END))
                // SUM(CASE WHEN (mask & (CAST(1 AS BIGINT) << ia)) != 0
                             OR (mask & (CAST(1 AS BIGINT) << ib)) != 0
                            THEN n ELSE 0 END) AS BIGINT) AS jaccard_permille
    FROM pairs CROSS JOIN mc
    GROUP BY type_a, type_b
    ORDER BY type_a, type_b
    """,
)
def events_audience_overlap_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT audience-overlap Jaccard for every event-type pair via the
    bitmask-inventory trick: one groupBy(user) folds each user's type
    set into a ≤64-bit mask (``bit_or(1 << idx)``, map-side
    combinable), a second groupBy collapses the corpus to the ≤2^|types|
    distinct-mask inventory, and every pairwise |A∩B| / |A∪B| is then a
    conditional sum over that BOUNDED relation — the naive spelling
    (|types|² distinct-user self-joins) re-shuffles the corpus 25
    times; this shape shuffles it ONCE and never materializes a
    user-level pair.  The audience-overlap matrix is the campaign /
    cannibalization diagnostic for event instrumentation (do 'view'
    and 'purchase' reach the same users?).

    Parity contract: type index = alphabetical dense rank (both
    engines); Jaccard in permille by integer division (union ≥ 1 since
    each type has ≥1 user).  Requires |types| ≤ 63 (asserted upstream
    by the mask width; the generator has 5).

    Scale shape: groupBy(user_id) is the single corpus-wide shuffle;
    the mask inventory (≤2^|types| rows) × the type-pair grid
    (|types|² rows) BNLJ is constant-size on both sides — allowlisted
    in test_scale_ops.  The dense-rank window runs over the DISTINCT
    TYPE relation (an aggregate output, ≤|types| rows) —
    global-window-allowlisted."""
    ev = load_testdata(spark, sf_dir, "events").select("user_id", "event_type")
    tmap = (
        ev.select("event_type")
        .distinct()
        .select(
            "event_type",
            (F.dense_rank().over(Window.orderBy("event_type")) - 1)
            .cast("int")
            .alias("idx"),
        )
    )
    masks = (
        ev.join(F.broadcast(tmap), "event_type")
        .groupBy("user_id")
        .agg(F.expr("bit_or(shiftleft(cast(1 as bigint), idx))").alias("mask"))
    )
    mc = masks.groupBy("mask").agg(F.count(F.lit(1)).alias("n"))
    pairs = (
        tmap.select(F.col("event_type").alias("type_a"), F.col("idx").alias("ia"))
        .join(
            tmap.select(F.col("event_type").alias("type_b"), F.col("idx").alias("ib")),
            F.col("ia") < F.col("ib"),
        )
    )
    bit_a = F.expr("mask & shiftleft(cast(1 as bigint), ia)") != 0
    bit_b = F.expr("mask & shiftleft(cast(1 as bigint), ib)") != 0
    cells = F.broadcast(pairs).crossJoin(mc)
    agg = cells.groupBy("type_a", "type_b").agg(
        F.sum(F.when(bit_a, F.col("n")).otherwise(0)).alias("n_users_a"),
        F.sum(F.when(bit_b, F.col("n")).otherwise(0)).alias("n_users_b"),
        F.sum(F.when(bit_a & bit_b, F.col("n")).otherwise(0)).alias("n_intersection"),
        F.sum(F.when(bit_a | bit_b, F.col("n")).otherwise(0)).alias("n_union"),
    )
    return agg.select(
        "type_a",
        "type_b",
        F.col("n_users_a").cast("bigint"),
        F.col("n_users_b").cast("bigint"),
        F.col("n_intersection").cast("bigint"),
        F.col("n_union").cast("bigint"),
        F.expr("div(1000 * n_intersection, n_union)")
        .cast("bigint")
        .alias("jaccard_permille"),
    ).orderBy("type_a", "type_b")


@register(
    "events_autocorr_daily",
    """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    tot AS (SELECT event_type, SUM(cnt) AS s FROM daily GROUP BY 1),
    p AS (
        SELECT d.event_type, d.x, (1000000 * d.cnt) // t.s AS pm
        FROM daily d JOIN tot t USING (event_type)
    ),
    mu AS (
        SELECT event_type, SUM(pm) // COUNT(*) AS m,
               CAST(COUNT(*) AS BIGINT) AS n_days
        FROM p GROUP BY 1
    ),
    c AS (
        SELECT p.event_type, p.x, p.pm - mu.m AS cv
        FROM p JOIN mu USING (event_type)
    ),
    den AS (SELECT event_type, SUM(cv * cv) AS d2 FROM c GROUP BY 1),
    num AS (
        SELECT a.event_type, lg.lag AS lag,
               SUM(a.cv * b.cv) AS nm, COUNT(*) AS n_pairs
        FROM (VALUES (1), (7)) lg(lag)
        JOIN c a ON TRUE
        JOIN c b ON a.event_type = b.event_type AND b.x = a.x + lg.lag
        GROUP BY 1, 2
    )
    SELECT n.event_type, CAST(n.lag AS INTEGER) AS lag,
           mu.n_days, CAST(n.n_pairs AS BIGINT) AS n_pairs,
           CAST((1000000 * n.nm) // den.d2 AS BIGINT) AS acf_micro
    FROM num n JOIN den USING (event_type) JOIN mu USING (event_type)
    ORDER BY event_type, lag
    """,
)
def events_autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 / lag-7 autocorrelation of each event type's DAILY COUNT
    series — the periodicity detector (is traffic weekly-seasonal?)
    that complements the trend (``events_value_trend_ols``) and
    change-point (``events_cusum_changepoint``) monitors.

    Overflow-proof by construction: daily counts are first normalized
    to PERMILLE-OF-TOTAL×1000 (pm = 1e6·cnt // Σcnt ≤ 1e6) so every
    centered deviation is ≤1e6, every product ≤1e12, and the sums are
    bounded by |days|·1e12 FOREVER — corpus growth cannot overflow the
    bigint moments (the lesson from this round's OLS 10x overflow,
    NOTES.md).  ACF is scale-invariant, so the normalization only
    costs integer rounding (≤1 part in 1e6 per term).  Centering uses
    the truncated integer mean; all divisions are truncating on both
    engines.  Denominator is the full-series sum of squares (the
    standard biased ACF estimator); numerator pairs are (t, t+k) days
    both present (equi-join on x+k — robust to gap days).

    Scale shape: ONE map-side-combinable groupBy(type, day) collapses
    the corpus; everything after runs on ≤|types|·|days| rows via
    keyed equi-joins (type, day) — no window, no BNLJ, no broadcast of
    anything unbounded."""
    ev = load_testdata(spark, sf_dir, "events").select(
        "event_type",
        F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
    )
    daily = ev.groupBy("event_type", "x").agg(F.count(F.lit(1)).alias("cnt"))
    tot = daily.groupBy("event_type").agg(F.sum("cnt").alias("s"))
    p = daily.join(tot, "event_type").select(
        "event_type", "x", F.expr("div(1000000 * cnt, s)").alias("pm")
    )
    mu = p.groupBy("event_type").agg(
        F.expr("div(sum(pm), count(1))").alias("m"),
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
    )
    c = p.join(mu.select("event_type", "m"), "event_type").select(
        "event_type", "x", (F.col("pm") - F.col("m")).alias("cv")
    )
    den = c.groupBy("event_type").agg(F.sum(F.col("cv") * F.col("cv")).alias("d2"))
    nums = []
    for k in (1, 7):
        a = c.select("event_type", "x", F.col("cv").alias("ca"))
        b = c.select(
            "event_type", (F.col("x") - k).alias("x"), F.col("cv").alias("cb")
        )
        nums.append(
            a.join(b, ["event_type", "x"])
            .groupBy("event_type")
            .agg(
                F.lit(k).cast("int").alias("lag"),
                F.sum(F.col("ca") * F.col("cb")).alias("nm"),
                F.count(F.lit(1)).alias("n_pairs"),
            )
        )
    num = nums[0].unionByName(nums[1])
    return (
        num.join(den, "event_type")
        .join(mu.select("event_type", "n_days"), "event_type")
        .select(
            "event_type",
            "lag",
            "n_days",
            F.col("n_pairs").cast("bigint"),
            F.expr("div(1000000 * nm, d2)").cast("bigint").alias("acf_micro"),
        )
        .orderBy("event_type", "lag")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 9: rank correlation, robust trend, inter-arrival quantiles
# ---------------------------------------------------------------------------


@register(
    "stats_spearman_daily",
    """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS cnt,
               SUM(CAST(round(value * 1000) AS BIGINT)) // COUNT(*) AS ybar
        FROM events GROUP BY 1, 2
    ),
    na AS (SELECT event_type, cnt, COUNT(*) AS n_eq FROM daily GROUP BY 1, 2),
    nb AS (SELECT event_type, ybar, COUNT(*) AS n_eq FROM daily GROUP BY 1, 2),
    ranked AS (
        SELECT d.event_type,
               2 * rank() OVER (PARTITION BY d.event_type ORDER BY d.cnt)
                 + na.n_eq - 1 AS a2,
               2 * rank() OVER (PARTITION BY d.event_type ORDER BY d.ybar)
                 + nb.n_eq - 1 AS b2
        FROM daily d
        JOIN na ON na.event_type = d.event_type AND na.cnt = d.cnt
        JOIN nb ON nb.event_type = d.event_type AND nb.ybar = d.ybar
    ),
    m AS (
        SELECT event_type, COUNT(*) AS n,
               SUM(a2) AS sa, SUM(b2) AS sb, SUM(a2 * b2) AS sab,
               SUM(a2 * a2) AS saa, SUM(b2 * b2) AS sbb
        FROM ranked GROUP BY 1
    )
    SELECT event_type,
           CAST(n AS BIGINT) AS n_days,
           CASE WHEN n * saa - sa * sa = 0 OR n * sbb - sb * sb = 0 THEN NULL
                ELSE CAST(floor((1000000.0 * (n * sab - sa * sb))
                     / (sqrt(CAST(n * saa - sa * sa AS DOUBLE))
                        * sqrt(CAST(n * sbb - sb * sb AS DOUBLE)))) AS BIGINT)
           END AS rho_micro
    FROM m ORDER BY event_type
    """,
)
def stats_spearman_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spearman rank correlation (tie-corrected, per event type)
    between each day's EVENT VOLUME and its MEAN VALUE — the monotone-
    association monitor ("do busy days run hotter?") that Pearson-on-
    raw-values gets wrong under outliers and nonlinearity.

    Exactness contract: classical average ranks carry .5 halves, so
    both engines compute DOUBLED average ranks — ``2·rank() + n_eq − 1``
    (min-rank window plus the tied-group size from a groupBy join) —
    keeping every moment integer; the constant factor cancels in the
    correlation.  The only float steps are the final two IEEE sqrt
    calls and one division — both CORRECTLY ROUNDED per IEEE 754 on
    identical integer inputs, hence bit-identical across engines
    (unlike ln/exp, which the fleet avoids).  Zero-variance series
    yield NULL on both sides.

    Scale shape: one combinable groupBy(type, day) bounds everything
    at ≤|types|·|days| rows; the rank windows are PARTITIONED by type
    over that bounded relation; tie sizes come from two more bounded
    groupBys — no global window, no BNLJ, no unbounded broadcast."""
    daily = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
            F.expr("cast(round(value * 1000) as bigint)").alias("y"),
        )
        .groupBy("event_type", "x")
        .agg(
            F.count(F.lit(1)).alias("cnt"),
            F.expr("div(sum(y), count(1))").alias("ybar"),
        )
    )
    na = daily.groupBy("event_type", "cnt").agg(F.count(F.lit(1)).alias("na_eq"))
    nb = daily.groupBy("event_type", "ybar").agg(F.count(F.lit(1)).alias("nb_eq"))
    wa = Window.partitionBy("event_type").orderBy("cnt")
    wb = Window.partitionBy("event_type").orderBy("ybar")
    ranked = (
        daily.join(na, ["event_type", "cnt"])
        .join(nb, ["event_type", "ybar"])
        .select(
            "event_type",
            (2 * F.rank().over(wa) + F.col("na_eq") - 1).alias("a2"),
            (2 * F.rank().over(wb) + F.col("nb_eq") - 1).alias("b2"),
        )
    )
    m = ranked.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("a2").alias("sa"),
        F.sum("b2").alias("sb"),
        F.sum(F.col("a2") * F.col("b2")).alias("sab"),
        F.sum(F.col("a2") * F.col("a2")).alias("saa"),
        F.sum(F.col("b2") * F.col("b2")).alias("sbb"),
    )
    return m.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_days"),
        F.expr(
            "case when n * saa - sa * sa = 0 or n * sbb - sb * sb = 0 then null"
            " else cast(floor((1000000.0 * (n * sab - sa * sb))"
            " / (sqrt(cast(n * saa - sa * sa as double))"
            " * sqrt(cast(n * sbb - sb * sb as double)))) as bigint) end"
        ).alias("rho_micro"),
    ).orderBy("event_type")


@register(
    "stats_theil_sen_trend",
    """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               SUM(CAST(round(value * 1000) AS BIGINT)) // COUNT(*) AS ybar
        FROM events GROUP BY 1, 2
    ),
    slopes AS (
        SELECT a.event_type,
               CAST(floor((1000000.0 * (b.ybar - a.ybar))
                          / CAST(b.x - a.x AS DOUBLE)) AS BIGINT) AS slope_micro,
               a.x AS x1, b.x AS x2
        FROM daily a JOIN daily b
          ON a.event_type = b.event_type AND a.x < b.x
    ),
    numbered AS (
        SELECT event_type, slope_micro,
               row_number() OVER (PARTITION BY event_type
                                  ORDER BY slope_micro, x1, x2) AS rn,
               COUNT(*) OVER (PARTITION BY event_type) AS n_pairs
        FROM slopes
    )
    SELECT event_type,
           CAST((SELECT COUNT(*) FROM daily d
                 WHERE d.event_type = numbered.event_type) AS BIGINT) AS n_days,
           CAST(n_pairs AS BIGINT) AS n_pairs,
           CAST(slope_micro AS BIGINT) AS median_slope_micro
    FROM numbered
    WHERE rn = (n_pairs + 1) // 2
    ORDER BY event_type
    """,
)
def stats_theil_sen_trend(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Theil–Sen robust trend per event type — the median of all
    pairwise slopes over the DAILY MEAN value series, the estimator
    that shrugs off the outlier days that drag OLS
    (``events_value_trend_ols``) around: a 29.3% breakdown point for
    the cost of |days|² bounded pairs.

    Parity contract: each slope is one exact integer subtraction pair
    fed through IEEE-correctly-rounded multiply/divide/floor —
    bit-identical across engines; the median is picked POSITIONALLY
    (row_number at ⌈n/2⌉ under the total order (slope, x1, x2)), never
    averaged, so no new arithmetic enters.

    Scale shape: the corpus collapses to ≤|types|·|days| daily rows in
    one combinable groupBy; the pair 'self-join' is an EQUI-join on
    event_type whose per-key output is |days|² ≈ 10⁵ rows at worst —
    bounded by the calendar, not the corpus, forever.  The
    median-pick window is PARTITIONED by type over that bounded pair
    relation.  No global window, no BNLJ."""
    daily = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
            F.expr("cast(round(value * 1000) as bigint)").alias("y"),
        )
        .groupBy("event_type", "x")
        .agg(F.expr("div(sum(y), count(1))").alias("ybar"))
    )
    a = daily.select("event_type", F.col("x").alias("x1"), F.col("ybar").alias("y1"))
    b = daily.select("event_type", F.col("x").alias("x2"), F.col("ybar").alias("y2"))
    slopes = (
        a.join(b, "event_type")
        .filter(F.col("x1") < F.col("x2"))
        .select(
            "event_type",
            F.expr(
                "cast(floor((1000000.0 * (y2 - y1)) / cast(x2 - x1 as double))"
                " as bigint)"
            ).alias("slope_micro"),
            "x1",
            "x2",
        )
    )
    w = Window.partitionBy("event_type").orderBy("slope_micro", "x1", "x2")
    wn = Window.partitionBy("event_type")
    numbered = slopes.select(
        "event_type",
        "slope_micro",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(wn).alias("n_pairs"),
    )
    ndays = daily.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_days"))
    return (
        numbered.filter(F.col("rn") == F.expr("div(n_pairs + 1, 2)"))
        .join(ndays, "event_type")
        .select(
            "event_type",
            F.col("n_days").cast("bigint"),
            F.col("n_pairs").cast("bigint"),
            F.col("slope_micro").cast("bigint").alias("median_slope_micro"),
        )
        .orderBy("event_type")
    )


@register(
    "events_interarrival_quantiles",
    """
    WITH e AS (
        SELECT user_id, event_id, epoch_ms(ts) AS ems FROM events
    ),
    g AS (
        SELECT ems - lag(ems) OVER (PARTITION BY user_id
                                    ORDER BY ems, event_id) AS gap
        FROM e
    ),
    gg AS (SELECT gap, COUNT(*) AS c FROM g WHERE gap IS NOT NULL GROUP BY gap),
    cum AS (
        SELECT gap,
               SUM(c) OVER (ORDER BY gap
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc
        FROM gg
    ),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gg)
    SELECT CAST(t.n AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cc >= (50 * t.n + 99) // 100 THEN gap END)
                AS BIGINT) AS p50_ms,
           CAST(MIN(CASE WHEN cc >= (90 * t.n + 99) // 100 THEN gap END)
                AS BIGINT) AS p90_ms,
           CAST(MIN(CASE WHEN cc >= (99 * t.n + 99) // 100 THEN gap END)
                AS BIGINT) AS p99_ms
    FROM cum CROSS JOIN t
    GROUP BY t.n
    """,
)
def events_interarrival_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of per-user inter-arrival time (milliseconds)
    — the engagement-cadence fingerprint behind session-timeout
    choices (``events_sessionization``'s 30-min gap is exactly a point
    on this distribution) and bot detection (impossibly tight p50s).

    Exact at scale, no global sort: gaps come from a USER-partitioned
    lag window; the quantile selection runs on the (gap → count)
    aggregate via ``operators/prefixsum.bucketed_cumsum`` — the same
    two-level exact-ECDF scan as ``stats_ks_two_sample`` — then one
    1-row total broadcast turns percentile ranks ⌈p·n/100⌉ into
    threshold selections (percentile_disc semantics, smallest value
    whose cumulative count reaches the rank).  The oracle spells the
    identical cumsum explicitly.

    Scale shape: the only corpus-wide operations are the user-
    partitioned window (natural key partitioning) and one combinable
    groupBy(gap); the cumsum's single-task step touches only BUCKET
    TOTALS (≤ span/width rows — global-window-allowlisted), and the
    1-row threshold crossJoin is BNLJ-allowlisted."""
    from .operators.prefixsum import bucketed_cumsum

    ev = load_testdata(spark, sf_dir, "events").select(
        "user_id", "event_id", F.expr("unix_millis(ts)").alias("ems")
    )
    w = Window.partitionBy("user_id").orderBy("ems", "event_id")
    gaps = (
        ev.select((F.col("ems") - F.lag("ems").over(w)).alias("gap"))
        .filter(F.col("gap").isNotNull())
    )
    gg = gaps.groupBy("gap").agg(F.count(F.lit(1)).alias("c"))
    cum = bucketed_cumsum(gg, [], "gap", ["c"], bucket_width=10_000_000)
    t = gg.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        cum.crossJoin(F.broadcast(t))
        .groupBy("n")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_c") >= F.expr(f"div({p} * n + 99, 100)"),
                        F.col("gap"),
                    )
                )
                .cast("bigint")
                .alias(f"p{p}_ms")
                for p in (50, 90, 99)
            ]
        )
        .select(
            F.col("n").alias("n_gaps"),
            "p50_ms",
            "p90_ms",
            "p99_ms",
        )
    )


# ---------------------------------------------------------------------------
# Round-6 batch 10: k-core decomposition over the near-dup graph
# ---------------------------------------------------------------------------


@register(
    "dedup_graph_kcore",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    e AS (
        SELECT DISTINCT a.doc_id AS u, b.doc_id AS v
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
    ),
    ed AS (SELECT u AS src, v AS dst FROM e UNION ALL SELECT v, u FROM e),
    d0 AS (SELECT src AS node, COUNT(*) AS d FROM ed GROUP BY 1),
    a1 AS (SELECT node FROM d0 WHERE d >= 2),
    e1 AS (SELECT ed.src, ed.dst FROM ed
           JOIN a1 x ON x.node = ed.src JOIN a1 y ON y.node = ed.dst),
    d1 AS (SELECT src AS node, COUNT(*) AS d FROM e1 GROUP BY 1),
    a2 AS (SELECT node FROM d1 WHERE d >= 2),
    e2 AS (SELECT e1.src, e1.dst FROM e1
           JOIN a2 x ON x.node = e1.src JOIN a2 y ON y.node = e1.dst),
    d2 AS (SELECT src AS node, COUNT(*) AS d FROM e2 GROUP BY 1),
    a3 AS (SELECT node FROM d2 WHERE d >= 2),
    e3 AS (SELECT e2.src, e2.dst FROM e2
           JOIN a3 x ON x.node = e2.src JOIN a3 y ON y.node = e2.dst),
    df AS (SELECT src AS node, COUNT(*) AS d FROM e3 GROUP BY 1)
    SELECT CAST(a3.node AS BIGINT) AS doc_id,
           CAST(COALESCE(df.d, 0) AS BIGINT) AS core_degree
    FROM a3 LEFT JOIN df ON df.node = a3.node
    ORDER BY core_degree DESC, doc_id LIMIT 50
    """,
)
def dedup_graph_kcore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate 2-core of the near-dup candidate graph via THREE
    unrolled peeling rounds: each round drops nodes with degree < 2 and
    the edges they carried.  Leaf docs (one accidental LSH collision)
    wash out; what survives is the densely-interlinked duplication
    MASS — template farms, mirror sets — exactly the subgraph worth
    human audit before a dedup pass deletes it.  Output: surviving
    nodes with their residual in-core degree, top-50 (deterministic
    (degree desc, doc_id) order).  Fixed round count makes the
    iterative fixpoint replay exactly in the unrolled DuckDB twin (a
    3-round peel is a documented approximation of the true 2-core —
    converged for every planted fixture; production would loop to
    emptiness with the same per-round plan).

    Scale shape: textbook distributed peeling — each round is ONE
    map-side-combinable degree groupBy over the persisted edge list
    plus two semi-shaped equi-joins restricting endpoints; per-round
    cost O(|E|), monotonically shrinking.  No driver involvement, no
    global window, top-k via TakeOrderedAndProject.

    Round-10 (optimization; guide §3.3/§5 — truncate the plan): each
    peel round's restricted edge list is ``localCheckpoint(eager=
    False)`` instead of a lazy persist.  The loop references ``edges``
    THREE times per round (degree + both endpoint joins), so the lazy-
    persist plan nested 3^rounds references (the 430-Exchange/864-scan
    rendered tree in PLAN_AUDIT) and Catalyst/AQE orchestration of
    that tree dominated the query: measured sf0.1 A/B 8.6→2.7 s with
    IDENTICAL output (collect-compared).  Same lineage-truncation
    contract as ``connected_components`` (operators/graph.py), same
    cluster caveat: swap for reliable ``checkpoint(dir)`` under
    executor loss."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    e = (
        D.lsh_candidate_pairs(bands, "doc_id")
        .select(F.col("id_a").alias("u"), F.col("id_b").alias("v"))
        .distinct()
    )
    edges = (
        e.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(e.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        # round 11: a pre-persist repartition("src") was A/B'd here (the
        # sliver fix that paid off for LPA/pagerank/linkage) and measured
        # ~0.2 s WORSE — this union is only 2× an already-coalesced
        # distinct, so the extra exchange outweighs the round-0 groupBy
        # reuse; left as-is deliberately
        .transform(tracked_persist)
    )
    active = None
    for _ in range(3):
        deg = edges.groupBy(F.col("src").alias("node")).agg(
            F.count(F.lit(1)).alias("d")
        )
        active = deg.filter(F.col("d") >= 2).select("node")
        edges = (
            edges.join(active.select(F.col("node").alias("src")), "src")
            .join(active.select(F.col("node").alias("dst")), "dst")
            .select("src", "dst")
            .localCheckpoint(eager=False)
        )
    final_deg = edges.groupBy(F.col("src").alias("node")).agg(
        F.count(F.lit(1)).alias("d")
    )
    return (
        active.join(final_deg, "node", "left")
        .select(
            F.col("node").cast("bigint").alias("doc_id"),
            F.coalesce(F.col("d"), F.lit(0)).cast("bigint").alias("core_degree"),
        )
        .orderBy(F.col("core_degree").desc(), "doc_id")
        .limit(50)
    )


# ---------------------------------------------------------------------------
# Round-6 batch 11: Heaps growth, Tukey fences, journey trigrams
# ---------------------------------------------------------------------------


@register(
    "vocab_heaps_growth",
    r"""
    WITH mx AS (SELECT MAX(doc_id) AS m FROM documents),
    fo AS (
        SELECT tok, MIN(doc_id) AS fd
        FROM (SELECT doc_id, unnest(string_split_regex(text, '\s+')) AS tok
              FROM documents)
        GROUP BY tok
    ),
    vd AS (
        SELECT least((fd * 10) // (m + 1), 9) AS decile, COUNT(*) AS nv
        FROM fo CROSS JOIN mx GROUP BY 1
    ),
    dd AS (
        SELECT least((doc_id * 10) // (m + 1), 9) AS decile, COUNT(*) AS nd
        FROM documents CROSS JOIN mx GROUP BY 1
    )
    SELECT CAST(dd.decile AS INTEGER) AS decile,
           CAST(SUM(dd.nd) OVER (ORDER BY dd.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS docs_cum,
           CAST(SUM(COALESCE(vd.nv, 0)) OVER (ORDER BY dd.decile
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS BIGINT) AS vocab_cum
    FROM dd LEFT JOIN vd ON vd.decile = dd.decile
    ORDER BY decile
    """,
)
def vocab_heaps_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary-growth (Heaps' law) curve: cumulative distinct-token
    count after each decile of the corpus in doc_id order — the
    diminishing-returns measurement behind "will more data still grow
    the tokenizer's vocab?" and the sanity check that a crawl isn't
    looping (a FLAT tail means new docs bring no new words — suspect
    duplication; Heaps predicts V ∝ N^β, β≈0.5).

    Exactness trick: no per-prefix distinct-count is ever run —
    a token's contribution to every prefix is determined by its FIRST
    occurrence (min doc_id, a map-side-combinable aggregate), so the
    whole curve falls out of ONE groupBy(token) + a 10-row decile
    histogram + a cumsum over those 10 rows.  The naive spelling (10
    countDistinct passes) re-scans the corpus 10 times.

    Scale shape: explode → groupBy(token) is the vocabulary-build
    shuffle every tokenizer pipeline already pays; everything after is
    ≤10 rows.  The 1-row max-id broadcast is BNLJ-allowlisted; the
    cumsum window runs over the 10-row decile grid —
    global-window-allowlisted."""
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id", "text")
    mx = docs.agg(F.max("doc_id").alias("m"))
    fo = (
        docs.select("doc_id", F.explode(X.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.min("doc_id").alias("fd"))
    )
    vd = (
        fo.crossJoin(F.broadcast(mx))
        .select(F.expr("least(div(fd * 10, m + 1), 9)").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("nv"))
    )
    dd = (
        docs.crossJoin(F.broadcast(mx))
        .select(F.expr("least(div(doc_id * 10, m + 1), 9)").alias("decile"))
        .groupBy("decile")
        .agg(F.count(F.lit(1)).alias("nd"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, 0)
    return (
        dd.join(vd, "decile", "left")
        .select(
            F.col("decile").cast("int"),
            F.sum("nd").over(w).cast("bigint").alias("docs_cum"),
            F.sum(F.coalesce(F.col("nv"), F.lit(0)))
            .over(w)
            .cast("bigint")
            .alias("vocab_cum"),
        )
        .orderBy("decile")
    )


@register(
    "quality_tukey_fences_by_source",
    """
    WITH grid AS (
        SELECT source, n_chars, COUNT(*) AS c
        FROM documents GROUP BY 1, 2
    ),
    cum AS (
        SELECT source, n_chars, c,
               SUM(c) OVER (PARTITION BY source ORDER BY n_chars
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc
        FROM grid
    ),
    tot AS (SELECT source, SUM(c) AS n FROM grid GROUP BY 1),
    q AS (
        SELECT cum.source,
               MIN(CASE WHEN cc >= (25 * n + 99) // 100 THEN n_chars END) AS q1,
               MIN(CASE WHEN cc >= (75 * n + 99) // 100 THEN n_chars END) AS q3,
               CAST(MIN(n) AS BIGINT) AS n_docs
        FROM cum JOIN tot ON tot.source = cum.source
        GROUP BY cum.source
    )
    SELECT d.source,
           CAST(q.q1 AS BIGINT) AS q1,
           CAST(q.q3 AS BIGINT) AS q3,
           q.n_docs,
           CAST(SUM(CASE WHEN 2 * d.n_chars < 2 * q.q1 - 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
           CAST(SUM(CASE WHEN 2 * d.n_chars > 2 * q.q3 + 3 * (q.q3 - q.q1)
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_high
    FROM documents d JOIN q ON q.source = d.source
    GROUP BY d.source, q.q1, q.q3, q.n_docs
    ORDER BY d.source
    """,
)
def quality_tukey_fences_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source Tukey outlier fences on document length: exact
    quartiles (percentile_disc semantics over the per-source length
    grid) and the count of docs beyond Q1−1.5·IQR / Q3+1.5·IQR — the
    box-plot audit that flags a source whose length distribution has
    grown a truncation spike or a concatenation tail before those docs
    poison a training mix.  Complements the GLOBAL MAD detector
    (events_robust_anomalies_mad) with a per-group exact-quartile
    form.

    Integer contract: fences are compared in DOUBLED units
    (2·len < 2·Q1 − 3·IQR) so the 1.5 multiplier never leaves ℤ; the
    quartile is the smallest length whose cumulative count reaches
    ⌈p·n/100⌉ — both engines spell the identical cumsum.

    Scale shape: ONE combinable groupBy(source, n_chars) collapses the
    corpus to the per-source length grid (bounded by the length
    domain, not N); the cumsum window is PARTITIONED by source over
    that grid; the fence lookup joins a |sources|-row relation back —
    a broadcast equi-join.  No global window, no BNLJ."""
    from .operators.quantiles import grid_quantiles

    docs = load_testdata(spark, sf_dir, "documents").select("source", "n_chars")
    q = grid_quantiles(
        docs, ["source"], "n_chars", [25, 75], count_alias="n_docs"
    ).select(
        "source",
        F.col("p25").alias("q1"),
        F.col("p75").alias("q3"),
        "n_docs",
    )
    return (
        docs.join(F.broadcast(q), "source")
        .groupBy("source", "q1", "q3", "n_docs")
        .agg(
            F.sum(
                F.when(
                    2 * F.col("n_chars") < 2 * F.col("q1") - 3 * (F.col("q3") - F.col("q1")),
                    1,
                ).otherwise(0)
            ).alias("n_low"),
            F.sum(
                F.when(
                    2 * F.col("n_chars") > 2 * F.col("q3") + 3 * (F.col("q3") - F.col("q1")),
                    1,
                ).otherwise(0)
            ).alias("n_high"),
        )
        .select(
            "source",
            F.col("q1").cast("bigint"),
            F.col("q3").cast("bigint"),
            "n_docs",
            F.col("n_low").cast("bigint"),
            F.col("n_high").cast("bigint"),
        )
        .orderBy("source")
    )


@register(
    "events_journey_trigrams",
    """
    WITH seq AS (
        SELECT user_id, event_type,
               lead(event_type, 1) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t2,
               lead(event_type, 2) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id) AS t3
        FROM events
    )
    SELECT event_type || '>' || t2 || '>' || t3 AS journey,
           CAST(COUNT(*) AS BIGINT) AS n
    FROM seq WHERE t2 IS NOT NULL AND t3 IS NOT NULL
    GROUP BY 1
    ORDER BY n DESC, journey
    LIMIT 20
    """,
)
def events_journey_trigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-20 three-step user journeys (event-type trigrams in strict
    per-user time order) — the sequence view of behavior that the
    first-order ``events_transition_matrix`` cannot see: a high
    view>click>purchase count versus view>click>error separates a
    working funnel from a broken checkout, and anomalous
    signup>signup>signup loops expose bot registration.

    Parity contract: ordering ties (same user, same timestamp) are
    broken by event_id on both engines; journeys with fewer than two
    successors are dropped (no NULL-padded partial trigrams).

    Scale shape: the double-lead runs in ONE user-partitioned window
    pass (natural key partitioning — the same shuffle sessionization
    pays); the trigram count is a map-side-combinable groupBy over
    ≤|types|³ keys, and top-20 plans as TakeOrderedAndProject — per-
    partition heaps, never a global sort."""
    ev = load_testdata(spark, sf_dir, "events").select(
        "user_id", "event_id", "ts", "event_type"
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type",
        F.lead("event_type", 1).over(w).alias("t2"),
        F.lead("event_type", 2).over(w).alias("t3"),
    )
    return (
        seq.filter(F.col("t2").isNotNull() & F.col("t3").isNotNull())
        .select(
            F.concat_ws(">", "event_type", "t2", "t3").alias("journey")
        )
        .groupBy("journey")
        .agg(F.count(F.lit(1)).alias("n"))
        .select("journey", F.col("n").cast("bigint"))
        .orderBy(F.col("n").desc(), "journey")
        .limit(20)
    )


# ---------------------------------------------------------------------------
# Round-6 batch 12: deseasonalized anomalies, balanced downsample, DAU/WAU
# ---------------------------------------------------------------------------


@register(
    "events_weekday_deseasonalized_anomalies",
    """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    wk AS (
        SELECT event_type, x % 7 AS wd,
               SUM(cnt) // COUNT(*) AS wmean
        FROM daily GROUP BY 1, 2
    )
    SELECT d.event_type, CAST(d.x AS INTEGER) AS day_idx,
           CAST(d.cnt AS BIGINT) AS cnt,
           CAST(w.wmean AS BIGINT) AS weekday_mean,
           CAST((1000 * (d.cnt - w.wmean)) // w.wmean AS BIGINT)
               AS excess_permille
    FROM daily d JOIN wk w
      ON w.event_type = d.event_type AND w.wd = d.x % 7
    ORDER BY abs((1000 * (d.cnt - w.wmean)) // w.wmean) DESC,
             d.event_type, d.x
    LIMIT 20
    """,
)
def events_weekday_deseasonalized_anomalies(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Top-20 daily volume anomalies AFTER removing the weekly cycle:
    each (type, day) is scored against its weekday's own mean
    (Monday vs Mondays), so a quiet Sunday stops masquerading as an
    incident and a Tuesday spike stops hiding inside the weekly swing
    — the deseasonalized complement to the raw-level CUSUM
    (events_cusum_changepoint) and MAD (events_robust_anomalies_mad)
    detectors.  Day 0 (2024-01-01) is a Monday, so weekday = x mod 7.

    Parity: weekday means are truncated integer division; excess is
    permille by truncating division (negative numerators truncate
    toward zero identically on both engines); the top-20 order is
    total (|excess| desc, type, day).

    Scale shape: one combinable groupBy(type, day) collapses the
    corpus; weekday means are a second groupBy over the ≤|types|·|days|
    grid; the score join is grid × (|types|·7) — bounded both sides;
    top-20 is TakeOrderedAndProject.  No window, no BNLJ."""
    daily = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wk = (
        daily.select("event_type", (F.col("x") % 7).alias("wd"), "cnt")
        .groupBy("event_type", "wd")
        .agg(F.expr("div(sum(cnt), count(1))").alias("wmean"))
    )
    scored = (
        daily.withColumn("wd", F.col("x") % 7)
        .join(wk, ["event_type", "wd"])
        .select(
            "event_type",
            F.col("x").cast("int").alias("day_idx"),
            F.col("cnt").cast("bigint"),
            F.col("wmean").cast("bigint").alias("weekday_mean"),
            F.expr("cast(div(1000 * (cnt - wmean), wmean) as bigint)").alias(
                "excess_permille"
            ),
        )
    )
    return scored.orderBy(
        F.abs(F.col("excess_permille")).desc(), "event_type", "day_idx"
    ).limit(20)


@register(
    "sample_balanced_class_downsample",
    """
    WITH cnt AS (SELECT label, COUNT(*) AS n FROM embeddings GROUP BY 1),
    m AS (SELECT MIN(n) AS m FROM cnt),
    ranked AS (
        SELECT vec_id, label,
               row_number() OVER (PARTITION BY label
                                  ORDER BY md5(CAST(vec_id AS VARCHAR)),
                                           vec_id) AS rn
        FROM embeddings
    ),
    kept AS (SELECT label, vec_id FROM ranked CROSS JOIN m WHERE rn <= m.m)
    SELECT c.label,
           CAST(c.n AS BIGINT) AS n_orig,
           CAST(COUNT(k.vec_id) AS BIGINT) AS n_kept,
           CAST(SUM(k.vec_id) AS BIGINT) AS kept_id_sum
    FROM cnt c JOIN kept k ON k.label = c.label
    GROUP BY c.label, c.n
    ORDER BY c.label
    """,
)
def sample_balanced_class_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic balanced downsampling: every label class is cut
    to the MINORITY class's size by keeping each class's first
    min-count rows under the md5(vec_id) hash order — the standard
    class-rebalancing step before training a probe/classifier head,
    made reproducible (no RNG state: the same corpus always keeps the
    same rows, and adding rows to ONE class never changes another
    class's selection).  ``kept_id_sum`` checksums the exact selected
    SET, so the oracle proves both engines picked identical rows, not
    just identical counts.

    Scale shape: the class-size table is one combinable groupBy; the
    1-row global min broadcasts (BNLJ-allowlisted); selection is a
    row_number window PARTITIONED by label — the distributed sort
    shuffle a per-class top-k always pays (Spark plans a
    WindowGroupLimit-style rank filter; classes are assumed
    comparable-sized after upstream stratification — a pathologic
    mega-class would call for the salting operator first)."""
    emb = load_testdata(spark, sf_dir, "embeddings").select("vec_id", "label")
    cnt = emb.groupBy("label").agg(F.count(F.lit(1)).alias("n"))
    m = cnt.agg(F.min("n").alias("m"))
    w = Window.partitionBy("label").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    kept = (
        emb.select("label", "vec_id", F.row_number().over(w).alias("rn"))
        .crossJoin(F.broadcast(m))
        .filter(F.col("rn") <= F.col("m"))
    )
    return (
        cnt.join(kept, "label")
        .groupBy("label", "n")
        .agg(
            F.count("vec_id").cast("bigint").alias("n_kept"),
            F.sum("vec_id").cast("bigint").alias("kept_id_sum"),
        )
        .select(
            "label",
            F.col("n").cast("bigint").alias("n_orig"),
            "n_kept",
            "kept_id_sum",
        )
        .orderBy("label")
    )


@register(
    "events_dau_wau_stickiness",
    """
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x
        FROM events
    ),
    dau AS (SELECT x, COUNT(*) AS dau FROM ud GROUP BY 1),
    span AS (
        SELECT DISTINCT u.user_id, d AS x
        FROM ud u CROSS JOIN unnest(generate_series(u.x, u.x + 6)) t(d)
    ),
    wau AS (SELECT x, COUNT(*) AS wau FROM span GROUP BY 1)
    SELECT CAST(d.x AS INTEGER) AS day_idx,
           CAST(d.dau AS BIGINT) AS dau,
           CAST(w.wau AS BIGINT) AS wau,
           CAST((1000 * d.dau) // w.wau AS BIGINT) AS stickiness_permille
    FROM dau d JOIN wau w ON w.x = d.x
    ORDER BY day_idx
    """,
)
def events_dau_wau_stickiness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DAU / trailing-7-day WAU per day — the classic stickiness ratio
    (DAU/WAU → how much of the weekly audience shows up daily).  WAU
    is EXACT distinct users over [d−6, d], computed scalably by the
    expansion trick: each (user, active-day) row emits its 7 trailing
    membership days, and a distinct-then-count groupBy(day) replaces
    the naive 7-day range self-join (which re-scans the activity table
    per day) — a constant 7× map-side blow-up of the ALREADY
    user-day-deduplicated relation, never of raw events.  First 6 days
    carry partial windows (standard for trailing metrics); days are
    emitted only where DAU exists (inner join).

    Scale shape: groupBy(user, day) dedup is the one corpus shuffle;
    the ×7 sequence-explode is map-side; both counts are combinable
    groupBys on day keys.  No window, no BNLJ, no driver loop."""
    ud = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        )
        .distinct()
    )
    dau = ud.groupBy("x").agg(F.count(F.lit(1)).alias("dau"))
    span = (
        ud.select(
            "user_id",
            F.explode(F.sequence(F.col("x"), F.col("x") + 6)).alias("x"),
        )
        .distinct()
    )
    wau = span.groupBy("x").agg(F.count(F.lit(1)).alias("wau"))
    return (
        dau.join(wau, "x")
        .select(
            F.col("x").cast("int").alias("day_idx"),
            F.col("dau").cast("bigint"),
            F.col("wau").cast("bigint"),
            F.expr("cast(div(1000 * dau, wau) as bigint)").alias(
                "stickiness_permille"
            ),
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 13: entity clusters, split leakage audit, delay quantiles
# ---------------------------------------------------------------------------


@register(
    "customers_linkage_clusters",
    f"""
    WITH a AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
               c_mktsegment AS seg
        FROM customer
    ),
    b AS (
        SELECT id + 1000000 AS id,
               CASE WHEN id % 7 = 0 THEN substr(name, 1, length(name) - 1) || 'X'
                    ELSE name END AS name,
               nat,
               CASE WHEN id % 5 = 0 THEN bal_c + 1 ELSE bal_c END AS bal_c,
               CASE WHEN id % 11 = 0 THEN 'AUTOMOBILE' ELSE seg END AS seg
        FROM a
    ),
    matched AS (
        SELECT a.id AS u, b.id AS v
        FROM a JOIN b ON a.nat = b.nat
                     AND substr(a.name, 1, 17) = substr(b.name, 1, 17)
        WHERE (CASE WHEN a.name = b.name THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END
             + CASE WHEN a.bal_c = b.bal_c THEN {_FS_W['bal'][0]} ELSE {_FS_W['bal'][1]} END
             + CASE WHEN a.seg = b.seg THEN {_FS_W['seg'][0]} ELSE {_FS_W['seg'][1]} END)
              >= {_FS_MATCH}
    ),
    ed AS (SELECT u AS src, v AS dst FROM matched
           UNION ALL SELECT v, u FROM matched),
    nodes AS (SELECT DISTINCT src AS node FROM ed),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    r1 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l0 l ON l.node = e.src GROUP BY e.dst),
    l1 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l0 l LEFT JOIN r1 r ON r.node = l.node),
    r2 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l1 l ON l.node = e.src GROUP BY e.dst),
    l2 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l1 l LEFT JOIN r2 r ON r.node = l.node),
    r3 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l2 l ON l.node = e.src GROUP BY e.dst),
    l3 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l2 l LEFT JOIN r3 r ON r.node = l.node),
    sz AS (SELECT lbl, COUNT(*) AS size FROM l3 GROUP BY lbl)
    SELECT CAST(size AS BIGINT) AS entity_size,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           CAST(SUM(size) AS BIGINT) AS n_records
    FROM sz GROUP BY size ORDER BY size
    """,
)
def customers_linkage_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity clusters from the Fellegi–Sunter match decisions: the
    'match'-class pairs of ``customers_record_linkage_fs`` become an
    undirected graph, THREE unrolled min-label propagation rounds
    collapse it into entities, and the output is the entity-size
    histogram — the deliverable an ER pipeline actually ships (dedup
    groups), one tier above the pair-level pattern table.  A size-2
    entity is the expected {{A-record, its registry copy}}; size ≥3
    means colliding blocks merged distinct customers — the
    over-linkage signal a threshold review looks for.  Fixed rounds
    make the fixpoint replay exactly in the unrolled twin (3 hops
    cover the planted bipartite stars; the convergence pytest asserts
    a 4th round is a no-op on this fixture).

    Scale shape: blocking keeps candidates ∝ N (17-char prefix pins
    block size ≤10 at any scale); each propagation round is one
    edge⋈label equi-join plus a combinable MIN groupBy — the same
    O(|E|)-per-round contract as dedup_clusters, with |E| here the
    MATCH set (≪ N·avg-block).  Histogram is two tiny groupBys.  No
    window, no BNLJ, no driver loop.  Blocking runs through
    ``operators.linkage.blocked_bipartite_pairs`` with
    ``hot_block_cap=None`` (exact all-pairs per block — one equi-join,
    same plan); the capped sibling over the planted repeat-heavy
    fixture is ``customers_linkage_clusters_capped``."""
    cust = load_testdata(spark, sf_dir, "customer")
    aa, bb = _fs_sides(cust)
    matched = (
        LK.blocked_bipartite_pairs(
            aa, bb, ["nat", "blk"], "id", "b_id", hot_block_cap=None
        )
        .filter(_fs_score() >= _FS_MATCH)
        .select(F.col("id").alias("u"), F.col("b_id").alias("v"))
    )
    ed = (
        matched.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(matched.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        # repartition before the persist (guide §2.4/§6: the union of
        # the two emission branches otherwise caches 2× the blocking
        # plan's output partitions as slivers; every downstream scan
        # pays per-task overhead ∝ that count, and hash(src) is the
        # partitioning nodes-distinct and the self-loop union want)
        .repartition("src")
        .transform(tracked_persist)
    )
    return _entity_size_histogram(ed)


def _entity_size_histogram(ed: DataFrame) -> DataFrame:
    """Entity-size histogram from a symmetric (src, dst) match-edge
    list: THREE unrolled min-label propagation rounds then two tiny
    groupBys.  3 rounds cover both fixtures' diameters — the base
    bipartite pairs (1 round) and the capped two-star blocks (2
    rounds: hub_a's label reaches every B member in round 1 and the
    remaining A members via hub_b in round 2); the convergence pytest
    asserts a 4th round is a no-op on both.

    Round shape (rewritten round 8, VERDICT r7 "Next" #3): the edge
    list carries a SELF-LOOP per node, so one round is exactly one
    edge⋈label equi-join + one combinable MIN groupBy — ``min(own,
    in-neighbors)`` without a left join-back.  The earlier join-back
    form referenced the prior label frame twice per round, doubling
    the unpersisted plan per round (2³ = 8 leaf recomputes — most of
    the capped query's 8.7× 1× constant); with self-loops the label
    frame is referenced once per round, the plan stays linear, and
    only the static self-looped edge frame is persisted.

    Round 11 (optimization; guide §3.3/§5, VERDICT r10 "Next" #4):
    the per-round label frame is additionally ``localCheckpoint(eager=
    False)`` — even at one reference per round, every round's plan
    nested the FULL blocking lineage of the persisted edge frame (the
    capped variant's 3-way candidate union rendered once per round:
    128 Exchanges / 140 scans in the initial plan), and Catalyst/AQE
    orchestration of that tree, not the data, dominated the query.
    The truncated plan references the edge cache once.  Same cluster
    caveat as ``connected_components``: localCheckpoint blocks die
    with executors; production swaps in reliable ``checkpoint(dir)``.
    The static self-looped edge frame stays persisted (an RDD-scan
    leaf would lose its ``repartition("src")`` outputPartitioning and
    re-shuffle the edge side every round)."""
    nodes = ed.select(F.col("src").alias("node")).distinct()
    # hash-partitioned by the propagation key before the persist: the
    # cached frame's outputPartitioning then satisfies every round's
    # join on src with NO per-round exchange on the edge side (the
    # union of emission branches otherwise caches 4×shuffle-partitions
    # slivers, and 3 rounds × re-shuffling them was pure task overhead)
    ed_self = tracked_persist(
        ed.unionByName(
            nodes.select(F.col("node").alias("src"), F.col("node").alias("dst"))
        ).repartition("src")
    )
    lab = nodes.select("node", F.col("node").alias("lbl"))
    for _ in range(3):
        lab = (
            ed_self.join(
                lab.select(F.col("node").alias("src"), "lbl"), "src"
            )
            .groupBy(F.col("dst").alias("node"))
            .agg(F.min("lbl").alias("lbl"))
            .localCheckpoint(eager=False)
        )
    sz = lab.groupBy("lbl").agg(F.count(F.lit(1)).alias("size"))
    return (
        sz.groupBy("size")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_entities"),
            F.sum("size").cast("bigint").alias("n_records"),
        )
        .select(F.col("size").cast("bigint").alias("entity_size"), "n_entities", "n_records")
        .orderBy("entity_size")
    )


# ---------------------------------------------------------------------------
# Round-7: hot-block-capped linkage over a planted repeat-heavy registry
# (VERDICT r6 "Next" #3 — the FS-blocking sibling of the LSH hot-bucket cap)
# ---------------------------------------------------------------------------

_FS_CC_SQL = """
    ed AS (SELECT u AS src, v AS dst FROM matched
           UNION ALL SELECT v, u FROM matched),
    nodes AS (SELECT DISTINCT src AS node FROM ed),
    l0 AS (SELECT node, node AS lbl FROM nodes),
    r1 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l0 l ON l.node = e.src GROUP BY e.dst),
    l1 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l0 l LEFT JOIN r1 r ON r.node = l.node),
    r2 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l1 l ON l.node = e.src GROUP BY e.dst),
    l2 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l1 l LEFT JOIN r2 r ON r.node = l.node),
    r3 AS (SELECT e.dst AS node, MIN(l.lbl) AS ml
           FROM ed e JOIN l2 l ON l.node = e.src GROUP BY e.dst),
    l3 AS (SELECT l.node, least(l.lbl, COALESCE(r.ml, l.lbl)) AS lbl
           FROM l2 l LEFT JOIN r3 r ON r.node = l.node),
    sz AS (SELECT lbl, COUNT(*) AS size FROM l3 GROUP BY lbl)
    SELECT CAST(size AS BIGINT) AS entity_size,
           CAST(COUNT(*) AS BIGINT) AS n_entities,
           CAST(SUM(size) AS BIGINT) AS n_records
    FROM sz GROUP BY size ORDER BY size
"""


@register(
    "customers_linkage_clusters_capped",
    f"""
    WITH a0 AS (
        SELECT c_custkey AS id, c_name AS name, c_nationkey AS nat,
               CAST(round(c_acctbal * 100) AS BIGINT) AS bal_c,
               c_mktsegment AS seg
        FROM customer
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
    ),
    ak AS (SELECT id, name, nat, bal_c, seg, substr(name, 1, 17) AS blk FROM a),
    bk AS (SELECT id, name, nat, bal_c, seg, substr(name, 1, 17) AS blk FROM b),
    sa AS (SELECT nat, blk, COUNT(*) AS na, MIN(id) AS hub_a
           FROM ak GROUP BY nat, blk),
    sb AS (SELECT nat, blk, COUNT(*) AS nb, MIN(id) AS hub_b
           FROM bk GROUP BY nat, blk),
    st AS (SELECT sa.nat AS nat, sa.blk AS blk, na, hub_a, nb, hub_b
           FROM sa JOIN sb ON sb.nat = sa.nat AND sb.blk = sa.blk),
    cand AS (
        SELECT x.id AS ua, x.name AS an, x.bal_c AS abal, x.seg AS asg,
               y.id AS vb, y.name AS bn, y.bal_c AS bbal, y.seg AS bsg
        FROM st
        JOIN ak x ON x.nat = st.nat AND x.blk = st.blk
        JOIN bk y ON y.nat = st.nat AND y.blk = st.blk
        WHERE na * nb <= {_FS_HOT_CAP}
        UNION ALL
        SELECT x.id, x.name, x.bal_c, x.seg, y.id, y.name, y.bal_c, y.seg
        FROM st
        JOIN ak x ON x.nat = st.nat AND x.blk = st.blk AND x.id = st.hub_a
        JOIN bk y ON y.nat = st.nat AND y.blk = st.blk
        WHERE na * nb > {_FS_HOT_CAP}
        UNION ALL
        SELECT x.id, x.name, x.bal_c, x.seg, y.id, y.name, y.bal_c, y.seg
        FROM st
        JOIN ak x ON x.nat = st.nat AND x.blk = st.blk AND x.id <> st.hub_a
        JOIN bk y ON y.nat = st.nat AND y.blk = st.blk AND y.id = st.hub_b
        WHERE na * nb > {_FS_HOT_CAP}
    ),
    matched AS (
        SELECT ua AS u, vb AS v FROM cand
        WHERE (CASE WHEN an = bn THEN {_FS_W['name'][0]} ELSE {_FS_W['name'][1]} END
             + CASE WHEN abal = bbal THEN {_FS_W['bal'][0]} ELSE {_FS_W['bal'][1]} END
             + CASE WHEN asg = bsg THEN {_FS_W['seg'][0]} ELSE {_FS_W['seg'][1]} END)
              >= {_FS_MATCH}
    ),
    {_FS_CC_SQL}
    """,
)
def customers_linkage_clusters_capped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """``customers_linkage_clusters`` under the repeat-heavy production
    hazard, with the hot-block valve ENGAGED — the FS-blocking sibling
    of ``dedup_lsh_hot_bucket_capped`` (VERDICT r6 "Next" #3: the
    measured 30× α 0.79 of the base linkage queries is in-answer f²
    candidate growth when names repeat verbatim; this query is the
    mitigation, demonstrated end-to-end under oracle).

    The planted fixture collapses every 3rd record onto one per-nation
    verbatim identity, so each nation's block holds ~N/75 records per
    side and all-pairs blocking would emit ~(N/75)² candidates into one
    join task.  ``blocked_bipartite_pairs(hot_block_cap=128)`` switches
    those blocks to two-star emission — O(n_a + n_b) candidates, hubs
    by min id — while every normal block (≤10 ids per side, ≤100
    candidates) stays exact all-pairs.  Because the planted hot rows
    are identical records, each hot block is a clique under the FS
    match predicate, and the two-star spans exactly the same connected
    component: the entity-size histogram is IDENTICAL to what uncapped
    all-pairs blocking produces (the differential pytest asserts this),
    at linear instead of quadratic candidate cost.

    Scale shape: two map-side-combinable per-block groupBys + equi-join
    -backs replace nothing-but-the-join; candidate count is
    Σ_cold (n_a·n_b) + Σ_hot (n_a+n_b) ≤ 128·|blocks| + 2·N — linear in
    N at any repeat rate.  CC is the shared 3-round O(|E|) chain; the
    oracle replays the cap, the scoring, and the unrolled rounds
    verbatim in SQL."""
    cust = load_testdata(spark, sf_dir, "customer")
    aa, bb = _fs_sides(cust, planted_hot=True)
    matched = (
        LK.blocked_bipartite_pairs(
            aa, bb, ["nat", "blk"], "id", "b_id", hot_block_cap=_FS_HOT_CAP
        )
        .filter(_fs_score() >= _FS_MATCH)
        .select(F.col("id").alias("u"), F.col("b_id").alias("v"))
    )
    ed = (
        matched.select(F.col("u").alias("src"), F.col("v").alias("dst"))
        .unionByName(matched.select(F.col("v").alias("src"), F.col("u").alias("dst")))
        # same sliver fix as the uncapped tier — the capped 3-way
        # candidate union caches even more output partitions
        .repartition("src")
        .transform(tracked_persist)
    )
    return _entity_size_histogram(ed)


@register(
    "pipeline_split_leakage_check",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1 AS band_idx, md5(concat_ws('|', h4, h5, h6, h7)) AS band_sig FROM sig
    ),
    pairs AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_bands
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sp AS (
        SELECT doc_id,
               CASE WHEN CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 4))
                          AS BIGINT) < 58982 THEN 'train'
                    WHEN CAST(concat('0x', substr(md5(concat('split:', doc_id)), 1, 4))
                          AS BIGINT) < 62258 THEN 'val'
                    ELSE 'test' END AS split
        FROM corpus
    ),
    tagged AS (
        SELECT least(sa.split, sb.split) AS split_a,
               greatest(sa.split, sb.split) AS split_b,
               p.shared_bands
        FROM pairs p
        JOIN sp sa ON sa.doc_id = p.id_a
        JOIN sp sb ON sb.doc_id = p.id_b
    )
    SELECT split_a, split_b,
           CAST(COUNT(*) AS BIGINT) AS n_candidate_pairs,
           CAST(SUM(CASE WHEN shared_bands = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_strong,
           (split_a <> split_b) AS is_leak
    FROM tagged
    GROUP BY split_a, split_b
    ORDER BY split_a, split_b
    """,
)
def pipeline_split_leakage_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/val/test LEAKAGE audit: because the 90/5/5 split
    (``pipeline_split_train_val_test``) hashes each doc_id
    independently, two near-duplicate documents can land in DIFFERENT
    splits — the eval-contamination failure that inflates held-out
    metrics.  This query re-derives the split assignment (pure
    function of doc_id — the property that makes this audit possible
    at all), runs the standard MinHash-LSH candidate generation over
    the planted-duplicate corpus, and reports the candidate-pair mass
    per split-pair cell: off-diagonal rows (``is_leak``) are the
    pairs a correct pipeline must either co-assign (split by CLUSTER,
    not by doc) or drop from eval.  The planted corpus guarantees the
    audit has true positives to find (copies hash independently of
    their bases).

    Scale shape: identical to the proven dedup_cross_source_matrix —
    banded bucket equi-join for candidates (never all-pairs), split
    tags join the PAIR relation (|pairs| ≪ N) against the doc→split
    map, and the cell matrix is one combinable groupBy to ≤9 rows.
    Composes three verified components (split hash, minhash_bands,
    lsh_candidate_pairs) with zero new shuffle shapes."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    sp = corpus.select(
        "doc_id",
        F.when(
            F.expr(
                "cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 4),"
                " 16, 10) as bigint)"
            )
            < 58982,
            "train",
        )
        .when(
            F.expr(
                "cast(conv(substring(md5(concat('split:', cast(doc_id as string))), 1, 4),"
                " 16, 10) as bigint)"
            )
            < 62258,
            "val",
        )
        .otherwise("test")
        .alias("split"),
    )
    tagged = (
        pairs.join(
            sp.select(F.col("doc_id").alias("id_a"), F.col("split").alias("sa")),
            "id_a",
        )
        .join(
            sp.select(F.col("doc_id").alias("id_b"), F.col("split").alias("sb")),
            "id_b",
        )
        .select(
            F.least("sa", "sb").alias("split_a"),
            F.greatest("sa", "sb").alias("split_b"),
            "shared_bands",
        )
    )
    return (
        tagged.groupBy("split_a", "split_b")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidate_pairs"),
            F.sum(F.when(F.col("shared_bands") == 2, 1).otherwise(0))
            .cast("bigint")
            .alias("n_strong"),
        )
        .select(
            "split_a",
            "split_b",
            "n_candidate_pairs",
            "n_strong",
            (F.col("split_a") != F.col("split_b")).alias("is_leak"),
        )
        .orderBy("split_a", "split_b")
    )


@register(
    "orders_ship_latency_quantiles",
    """
    WITH d AS (
        SELECT o.o_orderpriority AS priority,
               datediff('day', o.o_orderdate, l.l_shipdate) AS delay
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    ),
    grid AS (SELECT priority, delay, COUNT(*) AS c FROM d GROUP BY 1, 2),
    cum AS (
        SELECT priority, delay, c,
               SUM(c) OVER (PARTITION BY priority ORDER BY delay
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc
        FROM grid
    ),
    tot AS (SELECT priority, SUM(c) AS n FROM grid GROUP BY 1)
    SELECT cum.priority,
           CAST(MIN(n) AS BIGINT) AS n_items,
           CAST(MIN(CASE WHEN cc >= (25 * n + 99) // 100 THEN delay END)
                AS BIGINT) AS p25_days,
           CAST(MIN(CASE WHEN cc >= (50 * n + 99) // 100 THEN delay END)
                AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cc >= (75 * n + 99) // 100 THEN delay END)
                AS BIGINT) AS p75_days,
           CAST(MIN(CASE WHEN cc >= (95 * n + 99) // 100 THEN delay END)
                AS BIGINT) AS p95_days
    FROM cum JOIN tot ON tot.priority = cum.priority
    GROUP BY cum.priority
    ORDER BY cum.priority
    """,
)
def orders_ship_latency_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact order-to-ship latency quantiles (days from order date to
    line ship date) per order priority — the fulfillment SLA profile
    underlying TPC-H q12's binary within-90-days split, upgraded to
    full percentile_disc quartiles + p95 tail: does 1-URGENT actually
    ship faster, and by how much at the tail?  (The synthetic lineitem
    carries no shipmode/commit/receipt columns — the same adaptation
    q12 makes, latency against o_orderdate.)

    Scale shape: the latency domain spans a few hundred distinct day
    values, so after the fact⋈orders key join ONE combinable
    groupBy(priority, delay) collapses everything to a |priorities|·
    |delay-domain| grid; the cumsum window is PARTITIONED by priority
    over that grid, and quantile selection is a conditional MIN — the
    same exact-quantile-without-global-sort pattern as
    quality_tukey_fences_by_source.  No BNLJ, no global window, no
    approximation."""
    from .operators.quantiles import grid_quantiles

    li = load_testdata(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    orders = load_testdata(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    d = li.join(orders, li.l_orderkey == orders.o_orderkey).select(
        F.col("o_orderpriority").alias("priority"),
        F.expr("datediff(l_shipdate, o_orderdate)").alias("delay"),
    )
    q = grid_quantiles(d, ["priority"], "delay", [25, 50, 75, 95], count_alias="n_items")
    return q.select(
        "priority",
        "n_items",
        *[F.col(f"p{p}").alias(f"p{p}_days") for p in (25, 50, 75, 95)],
    ).orderBy("priority")


# ---------------------------------------------------------------------------
# Round-6 batch 14: LSH banding sweep, user lifetimes, modality coverage
# ---------------------------------------------------------------------------


@register(
    "dedup_minhash_multiband_sweep",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    b4 AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1, md5(concat_ws('|', h4, h5, h6, h7)) FROM sig
    ),
    b2 AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1)) AS band_sig FROM sig
        UNION ALL SELECT doc_id, 1, md5(concat_ws('|', h2, h3)) FROM sig
        UNION ALL SELECT doc_id, 2, md5(concat_ws('|', h4, h5)) FROM sig
        UNION ALL SELECT doc_id, 3, md5(concat_ws('|', h6, h7)) FROM sig
    ),
    b1 AS (
        {' UNION ALL '.join(f"SELECT doc_id, {i} AS band_idx, md5(concat_ws('|', h{i})) AS band_sig FROM sig" for i in range(8))}
    ),
    all_bands AS (
        SELECT 4 AS band_size, * FROM b4
        UNION ALL SELECT 2, * FROM b2
        UNION ALL SELECT 1, * FROM b1
    ),
    bs AS (
        SELECT band_size, band_idx, band_sig, COUNT(*) AS c
        FROM all_bands GROUP BY 1, 2, 3
    ),
    flagged AS (
        SELECT ab.band_size, ab.doc_id
        FROM all_bands ab
        JOIN bs ON bs.band_size = ab.band_size
               AND bs.band_idx = ab.band_idx
               AND bs.band_sig = ab.band_sig
        WHERE bs.c >= 2
        GROUP BY 1, 2
    ),
    mass AS (
        SELECT band_size,
               SUM(c * (c - 1) // 2) AS collision_pairs,
               MAX(c) AS max_bucket
        FROM bs GROUP BY 1
    ),
    fl AS (SELECT band_size, COUNT(*) AS n_flagged FROM flagged GROUP BY 1)
    SELECT CAST(m.band_size AS INTEGER) AS band_size,
           CAST(8 // m.band_size AS INTEGER) AS n_bands,
           CAST(m.collision_pairs AS BIGINT) AS collision_pairs,
           CAST(m.max_bucket AS BIGINT) AS max_bucket,
           CAST(COALESCE(fl.n_flagged, 0) AS BIGINT) AS n_flagged_docs
    FROM mass m LEFT JOIN fl ON fl.band_size = m.band_size
    ORDER BY band_size
    """,
)
def dedup_minhash_multiband_sweep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH banding-parameter tuning sweep WITHOUT building a candidate
    set: the SAME 8-hash MinHash signatures re-banded three ways —
    (r=4, b=2) high-precision, (r=2, b=4) balanced, (r=1, b=8)
    high-recall — scored purely from BUCKET-SIZE MOMENTS: candidate
    mass Σ C(bucket, 2) (the exact number of in-bucket collisions the
    banded join WOULD emit), the max bucket size (the hot-bucket /
    task-skew hazard indicator), and the flagged-doc count (docs
    sharing any bucket).  This is the S-curve P=1−(1−s^r)^b made
    empirical, read BEFORE committing to a join: on this corpus r=1
    is ~100× the candidate mass of r=4 — the measurement that tells
    an engineer r=1 needs the hot-bucket valve, made without paying
    the quadratic emission to learn it (an earlier draft materialized
    the r=1 pairs and took 76 s at sf0.1; this form never joins
    bucket members at all).

    Scale shape: shingling + signatures run ONCE; each layout is a
    constant-size projection; bucket sizes are ONE combinable
    groupBy; the flagged-doc pass is a linear equi-join of bands
    against bucket counts.  Zero pair materialization at ANY r —
    Σ C(c,2) comes from counts, not joins.  No BNLJ, no window."""
    from .operators.dedup import minhash_signatures

    corpus = _dedup_corpus(spark, sf_dir)
    sig = minhash_signatures(corpus, "doc_id", "text", n_hashes=8)
    layouts = None
    for band_size in (4, 2, 1):
        for b in range(8 // band_size):
            cols = [f"h{b * band_size + j}" for j in range(band_size)]
            part = sig.select(
                F.lit(band_size).alias("band_size"),
                F.col("doc_id"),
                F.lit(b).alias("band_idx"),
                # binary h columns (round-10): fixed-width 16-byte
                # fields make the separator-less concat injective, so
                # bucket equality classes match the hex-'|' oracle form
                F.unhex(F.md5(F.concat(*cols))).alias("band_sig"),
            )
            layouts = part if layouts is None else layouts.unionByName(part)
    # round 11: a pre-persist repartition on (band_size, band_idx,
    # band_sig) — the sliver fix that paid off for the linkage/LPA
    # edge caches — was A/B'd here and measured ~5-10% WORSE at sf0.1:
    # the signature cache is already few partitions, so the extra full
    # exchange of the 14× frame outweighs the consumers' partitioning
    # reuse.  Left as-is deliberately (measured negative result).
    layouts = layouts.transform(tracked_persist)
    bs = layouts.groupBy("band_size", "band_idx", "band_sig").agg(
        F.count(F.lit(1)).alias("c")
    )
    mass = bs.groupBy("band_size").agg(
        F.sum(F.expr("div(c * (c - 1), 2)")).alias("collision_pairs"),
        F.max("c").alias("max_bucket"),
    )
    flagged = (
        layouts.join(bs.filter(F.col("c") >= 2), ["band_size", "band_idx", "band_sig"])
        .select("band_size", "doc_id")
        .distinct()
        .groupBy("band_size")
        .agg(F.count(F.lit(1)).alias("n_flagged"))
    )
    return (
        mass.join(flagged, "band_size", "left")
        .select(
            F.col("band_size").cast("int"),
            F.expr("cast(div(8, band_size) as int)").alias("n_bands"),
            F.col("collision_pairs").cast("bigint"),
            F.col("max_bucket").cast("bigint"),
            F.coalesce(F.col("n_flagged"), F.lit(0))
            .cast("bigint")
            .alias("n_flagged_docs"),
        )
        .orderBy("band_size")
    )


@register(
    "events_user_lifetime_stats",
    """
    WITH ul AS (
        SELECT user_id,
               MAX(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)))
                 - MIN(datediff('day', DATE '2024-01-01', CAST(ts AS DATE)))
                 AS lifetime_days,
               COUNT(*) AS n_events
        FROM events GROUP BY user_id
    )
    SELECT CAST(lifetime_days // 7 AS INTEGER) AS lifetime_weeks,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(n_events) AS BIGINT) AS total_events,
           CAST(SUM(n_events) // COUNT(*) AS BIGINT) AS events_per_user
    FROM ul GROUP BY 1 ORDER BY 1
    """,
)
def events_user_lifetime_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-lifetime histogram: days between each user's first and
    last event, bucketed by week, with cohort mass and per-user
    intensity — the churn-shape summary (is the base long-lived or a
    spike of one-week tourists?) that complements the cohort-retention
    matrix (events_cohort_retention tracks WHEN users return; this
    tracks HOW LONG they stay at all).

    Scale shape: ONE map-side-combinable groupBy(user) computes
    min/max/count per user; the week histogram is a second combinable
    groupBy over the per-user relation.  Two shuffles total, both on
    natural keys; no window, no BNLJ, no broadcast."""
    ul = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        )
        .groupBy("user_id")
        .agg(
            (F.max("x") - F.min("x")).alias("lifetime_days"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    return (
        ul.groupBy(F.expr("cast(div(lifetime_days, 7) as int)").alias("lifetime_weeks"))
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_users"),
            F.sum("n_events").cast("bigint").alias("total_events"),
        )
        .select(
            "lifetime_weeks",
            "n_users",
            "total_events",
            F.expr("cast(div(total_events, n_users) as bigint)").alias(
                "events_per_user"
            ),
        )
        .orderBy("lifetime_weeks")
    )


@register(
    "crossmodal_coverage_report",
    """
    WITH cov AS (
        SELECT d.source,
               CASE WHEN e.vec_id IS NULL THEN 0 ELSE 1 END AS has_vec
        FROM documents d
        LEFT JOIN embeddings e ON e.vec_id = d.doc_id
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(has_vec) AS BIGINT) AS n_with_embedding,
           CAST((1000 * SUM(has_vec)) // COUNT(*) AS BIGINT)
               AS coverage_permille
    FROM cov GROUP BY source ORDER BY source
    """,
)
def crossmodal_coverage_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Modality-coverage audit: per source, how many documents have a
    paired embedding row (id-join convention doc_id = vec_id, as
    crossmodal_doc_embedding_join) — the data-completeness gate a
    multimodal training run checks BEFORE sampling, because a source
    whose vectors are missing silently vanishes from contrastive
    batches built by inner joins.

    Scale shape: one LEFT equi-join on the id key (both sides
    id-partitioned at production layout, so co-located) and one
    combinable groupBy(source) to |sources| rows.  No window, no
    BNLJ."""
    docs = load_testdata(spark, sf_dir, "documents").select("doc_id", "source")
    emb = load_testdata(spark, sf_dir, "embeddings").select(
        F.col("vec_id").alias("doc_id"), F.lit(1).alias("has_vec")
    )
    return (
        docs.join(emb, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum(F.coalesce(F.col("has_vec"), F.lit(0)))
            .cast("bigint")
            .alias("n_with_embedding"),
        )
        .select(
            "source",
            "n_docs",
            "n_with_embedding",
            F.expr("cast(div(1000 * n_with_embedding, n_docs) as bigint)").alias(
                "coverage_permille"
            ),
        )
        .orderBy("source")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 15: dedup removal bias, repeat-purchase gaps, hash collisions
# ---------------------------------------------------------------------------


@register(
    "dedup_removal_bias_audit",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1, md5(concat_ws('|', h4, h5, h6, h7)) FROM sig
    ),
    flagged AS (
        SELECT DISTINCT d FROM (
            SELECT a.doc_id AS d
            FROM bands a JOIN bands b ON a.band_idx = b.band_idx
                AND a.band_sig = b.band_sig AND a.doc_id <> b.doc_id
        )
    ),
    lens AS (SELECT doc_id, length(text) AS len FROM corpus),
    grid AS (SELECT len, COUNT(*) AS c FROM lens GROUP BY len),
    cum AS (
        SELECT len, SUM(c) OVER (ORDER BY len
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cc
        FROM grid
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM grid),
    qs AS (
        SELECT MIN(CASE WHEN cc >= (25 * n + 99) // 100 THEN len END) AS q1,
               MIN(CASE WHEN cc >= (50 * n + 99) // 100 THEN len END) AS q2,
               MIN(CASE WHEN cc >= (75 * n + 99) // 100 THEN len END) AS q3
        FROM cum CROSS JOIN tot
    ),
    tagged AS (
        SELECT CASE WHEN l.len <= q.q1 THEN 0
                    WHEN l.len <= q.q2 THEN 1
                    WHEN l.len <= q.q3 THEN 2
                    ELSE 3 END AS quartile,
               CASE WHEN f.d IS NULL THEN 0 ELSE 1 END AS flagged
        FROM lens l CROSS JOIN qs q
        LEFT JOIN flagged f ON f.d = l.doc_id
    )
    SELECT CAST(quartile AS INTEGER) AS length_quartile,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(flagged) AS BIGINT) AS n_flagged,
           CAST((1000 * SUM(flagged)) // COUNT(*) AS BIGINT)
               AS flagged_permille
    FROM tagged GROUP BY quartile ORDER BY quartile
    """,
)
def dedup_removal_bias_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup REMOVAL-BIAS audit: profile the docs an LSH near-dup pass
    would flag, by corpus length quartile — the distribution-shift
    check run before committing a dedup config, because deduplication
    is never length-neutral (boilerplate and templates concentrate in
    specific length bands) and a skewed removal silently changes the
    training mixture (the 'dedup changes your data distribution'
    hazard the data-curation literature warns about; the source-axis
    twin is dedup_cross_source_matrix).

    Scale shape: the flagged set comes from the banded bucket join
    (never all-pairs), distinct-projected to doc ids; the quartile
    cutoffs use the distinct-length grid cumsum (bounded by the
    length domain — global-window-allowlisted) with a 1-row threshold
    broadcast (BNLJ-allowlisted, as stats_ks_two_sample); tagging is
    a LEFT key join + one combinable 4-row groupBy."""
    from .operators.prefixsum import bucketed_cumsum

    corpus = _dedup_corpus(spark, sf_dir).transform(tracked_persist)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    pairs = D.lsh_candidate_pairs(bands, "doc_id")
    flagged = (
        pairs.select(F.col("id_a").alias("d"))
        .unionByName(pairs.select(F.col("id_b").alias("d")))
        .distinct()
        .select("d", F.lit(1).alias("flagged"))
    )
    lens = corpus.select("doc_id", F.length("text").alias("len"))
    grid = lens.groupBy("len").agg(F.count(F.lit(1)).alias("c"))
    cum = bucketed_cumsum(grid, [], "len", ["c"], bucket_width=64)
    tot = grid.agg(F.sum("c").cast("bigint").alias("n"))
    qs = (
        cum.crossJoin(F.broadcast(tot))
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_c") >= F.expr(f"div({p} * n + 99, 100)"),
                        F.col("len"),
                    )
                ).alias(q)
                for p, q in ((25, "q1"), (50, "q2"), (75, "q3"))
            ]
        )
    )
    tagged = (
        lens.crossJoin(F.broadcast(qs))
        .join(flagged.withColumnRenamed("d", "doc_id"), "doc_id", "left")
        .select(
            F.when(F.col("len") <= F.col("q1"), 0)
            .when(F.col("len") <= F.col("q2"), 1)
            .when(F.col("len") <= F.col("q3"), 2)
            .otherwise(3)
            .alias("length_quartile"),
            F.coalesce(F.col("flagged"), F.lit(0)).alias("flagged"),
        )
    )
    return (
        tagged.groupBy("length_quartile")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("flagged").cast("bigint").alias("n_flagged"),
        )
        .select(
            F.col("length_quartile").cast("int"),
            "n_docs",
            "n_flagged",
            F.expr("cast(div(1000 * n_flagged, n_docs) as bigint)").alias(
                "flagged_permille"
            ),
        )
        .orderBy("length_quartile")
    )


@register(
    "orders_repeat_purchase_intervals",
    """
    WITH o AS (
        SELECT o_custkey,
               datediff('day', DATE '1992-01-01', o_orderdate) AS x,
               o_orderkey
        FROM orders
    ),
    gaps AS (
        SELECT o_custkey,
               x - lag(x) OVER (PARTITION BY o_custkey
                                ORDER BY x, o_orderkey) AS gap
        FROM o
    ),
    g2 AS (
        SELECT c.c_mktsegment AS segment, g.gap
        FROM gaps g JOIN customer c ON c.c_custkey = g.o_custkey
        WHERE g.gap IS NOT NULL
    ),
    grid AS (SELECT segment, gap, COUNT(*) AS c FROM g2 GROUP BY 1, 2),
    cum AS (
        SELECT segment, gap, c,
               SUM(c) OVER (PARTITION BY segment ORDER BY gap
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc
        FROM grid
    ),
    tot AS (SELECT segment, SUM(c) AS n FROM grid GROUP BY 1)
    SELECT cum.segment,
           CAST(MIN(n) AS BIGINT) AS n_gaps,
           CAST(MIN(CASE WHEN cc >= (50 * n + 99) // 100 THEN gap END)
                AS BIGINT) AS p50_days,
           CAST(MIN(CASE WHEN cc >= (90 * n + 99) // 100 THEN gap END)
                AS BIGINT) AS p90_days
    FROM cum JOIN tot ON tot.segment = cum.segment
    GROUP BY cum.segment
    ORDER BY cum.segment
    """,
)
def orders_repeat_purchase_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repeat-purchase cadence per market segment: exact p50/p90 of
    the days between a customer's consecutive orders — the
    reorder-cycle profile behind replenishment forecasting and the
    'is BUILDING stickier than MACHINERY' comparison; the commerce
    twin of events_interarrival_quantiles (same estimator, order
    grain, per-segment cuts).

    Parity: per-customer ordering ties (same order date) break by
    o_orderkey on both engines; quantiles are percentile_disc via the
    shared cumsum-threshold contract.

    Scale shape: the lag runs in a CUSTOMER-partitioned window
    (natural key); the segment tag is one key equi-join to the
    customer dim; quantile selection collapses to the bounded
    (|segments| × gap-day-domain) grid with a segment-PARTITIONED
    cumsum — no global window, no BNLJ."""
    o = load_testdata(spark, sf_dir, "orders").select(
        "o_custkey",
        F.expr("datediff(o_orderdate, date'1992-01-01')").alias("x"),
        "o_orderkey",
    )
    w = Window.partitionBy("o_custkey").orderBy("x", "o_orderkey")
    gaps = o.select(
        "o_custkey", (F.col("x") - F.lag("x").over(w)).alias("gap")
    ).filter(F.col("gap").isNotNull())
    cust = load_testdata(spark, sf_dir, "customer").select(
        F.col("c_custkey").alias("o_custkey"), F.col("c_mktsegment").alias("segment")
    )
    from .operators.quantiles import grid_quantiles

    g2 = gaps.join(cust, "o_custkey").select("segment", "gap")
    q = grid_quantiles(g2, ["segment"], "gap", [50, 90], count_alias="n_gaps")
    return q.select(
        "segment",
        "n_gaps",
        F.col("p50").alias("p50_days"),
        F.col("p90").alias("p90_days"),
    ).orderBy("segment")


@register(
    "text_hash_collision_audit",
    r"""
    WITH tok AS (
        SELECT doc_id, string_split_regex(text, '\s+') AS toks FROM documents
    ),
    tri AS (
        SELECT DISTINCT unnest(
            CASE WHEN len(toks) >= 3
                 THEN list_transform(generate_series(1, len(toks)-2),
                      i -> concat_ws(' ', toks[i], toks[i+1], toks[i+2]))
                 ELSE []::VARCHAR[] END) AS feat
        FROM tok
    ),
    bucketed AS (
        SELECT CAST(concat('0x', substr(md5(feat), 1, 4)) AS BIGINT) AS bucket
        FROM tri
    ),
    bc AS (SELECT bucket, COUNT(*) AS c FROM bucketed GROUP BY bucket)
    SELECT CAST(SUM(c) AS BIGINT) AS n_features,
           CAST(COUNT(*) AS BIGINT) AS n_buckets_used,
           CAST(SUM(c - 1) AS BIGINT) AS n_collided_features,
           CAST(MAX(c) AS BIGINT) AS max_bucket,
           CAST((1000 * SUM(c - 1)) // SUM(c) AS BIGINT)
               AS collision_permille
    FROM bc
    """,
)
def text_hash_collision_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hashing-trick collision audit for a 2¹⁶-bucket feature space:
    how many DISTINCT trigram features collide when hashed to 16 bits
    (md5 prefix — the same feature hashing text_quality_classifier_
    hashed trains over)?  The birthday arithmetic says ~38% of 2¹⁶
    buckets collide at ~65k features; this measures the actual rate
    on the corpus vocabulary, the number an ML engineer checks before
    trusting hashed-feature model weights (collisions alias gradients
    between unrelated n-grams).

    Scale shape: trigram explode → DISTINCT (one combinable shuffle,
    vocabulary-bounded ≪ corpus at web scale); bucket histogram is a
    second combinable groupBy over ≤2¹⁶ keys; the report is one
    5-column aggregate row.  No window, no BNLJ, no join at all."""
    docs = load_testdata(spark, sf_dir, "documents")
    tri = (
        docs.select(F.split(F.col("text"), X.TOKEN_RE).alias("toks"))
        .select(
            F.explode(
                F.when(
                    F.size("toks") >= 3,
                    F.expr(
                        "transform(sequence(1, size(toks) - 2),"
                        " i -> concat_ws(' ', toks[i-1], toks[i], toks[i+1]))"
                    ),
                ).otherwise(F.array().cast("array<string>"))
            ).alias("feat")
        )
        .distinct()
    )
    bc = (
        tri.select(
            F.expr("cast(conv(substring(md5(feat), 1, 4), 16, 10) as bigint)").alias(
                "bucket"
            )
        )
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return bc.agg(
        F.sum("c").cast("bigint").alias("n_features"),
        F.count(F.lit(1)).cast("bigint").alias("n_buckets_used"),
        F.sum(F.col("c") - 1).cast("bigint").alias("n_collided_features"),
        F.max("c").cast("bigint").alias("max_bucket"),
        F.expr("cast(div(1000 * sum(c - 1), sum(c)) as bigint)").alias(
            "collision_permille"
        ),
    )


# ---------------------------------------------------------------------------
# Round-6 batch 16: Wilson interval, runs test
# ---------------------------------------------------------------------------


@register(
    "events_wilson_ci_error_rate",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS n,
               SUM(CASE WHEN event_type = 'error' THEN 1 ELSE 0 END) AS e
        FROM events GROUP BY 1
    )
    SELECT CAST(x AS INTEGER) AS day_idx,
           CAST(n AS BIGINT) AS n_events,
           CAST(e AS BIGINT) AS n_errors,
           CAST((1000 * e) // n AS BIGINT) AS rate_permille,
           CAST(floor(1000000.0 *
                ((CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
                  + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
                  - 1.96 * sqrt((CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(e AS DOUBLE) / CAST(n AS DOUBLE))
                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
                      / CAST(n AS DOUBLE)))
                 / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)))) AS BIGINT)
               AS wilson_lo_micro,
           CAST(floor(1000000.0 *
                ((CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
                  + (1.96 * 1.96) / (2.0 * CAST(n AS DOUBLE))
                  + 1.96 * sqrt((CAST(e AS DOUBLE) / CAST(n AS DOUBLE)
                       * (1.0 - CAST(e AS DOUBLE) / CAST(n AS DOUBLE))
                       + (1.96 * 1.96) / (4.0 * CAST(n AS DOUBLE)))
                      / CAST(n AS DOUBLE)))
                 / (1.0 + (1.96 * 1.96) / CAST(n AS DOUBLE)))) AS BIGINT)
               AS wilson_hi_micro
    FROM daily ORDER BY day_idx
    """,
)
def events_wilson_ci_error_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-day error-rate with the WILSON 95% confidence interval —
    the proportion CI that stays inside [0,1] and behaves at small n
    (unlike the normal approximation), i.e. the correct error-budget
    arithmetic for an SRE daily report: a day is statistically bad
    only if its whole interval clears the SLO line.  Complements
    stats_bootstrap_ci (resampled CI for MEANS) with the closed-form
    CI for PROPORTIONS.

    Float-parity note (the fleet's transcendental rule): the Wilson
    bound uses ONLY +,−,×,÷,√ — every one IEEE-754 correctly rounded,
    so identical integer inputs give bit-identical doubles on both
    engines, and the final micro-unit floor transports exactly.  The
    1.96 literal parses to the same double everywhere.  (ln/exp-based
    intervals would NOT have this property; that is why the fleet has
    no Poisson/Jeffreys query.)

    Scale shape: ONE map-side-combinable groupBy(day) — the CI math
    is a projection over the ≤|days| aggregate.  Nothing else."""
    daily = (
        load_testdata(spark, sf_dir, "events")
        .select(
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
            F.when(F.col("event_type") == "error", 1).otherwise(0).alias("is_err"),
        )
        .groupBy("x")
        .agg(F.count(F.lit(1)).alias("n"), F.sum("is_err").alias("e"))
    )
    wilson = (
        "((cast(e as double) / cast(n as double)"
        " + (1.96 * 1.96) / (2.0D * cast(n as double))"
        " {sign} 1.96 * sqrt((cast(e as double) / cast(n as double)"
        " * (1.0D - cast(e as double) / cast(n as double))"
        " + (1.96 * 1.96) / (4.0D * cast(n as double)))"
        " / cast(n as double)))"
        " / (1.0D + (1.96 * 1.96) / cast(n as double)))"
    )
    return daily.select(
        F.col("x").cast("int").alias("day_idx"),
        F.col("n").cast("bigint").alias("n_events"),
        F.col("e").cast("bigint").alias("n_errors"),
        F.expr("cast(div(1000 * e, n) as bigint)").alias("rate_permille"),
        F.expr(
            f"cast(floor(1000000.0D * {wilson.format(sign='-')}) as bigint)"
        ).alias("wilson_lo_micro"),
        F.expr(
            f"cast(floor(1000000.0D * {wilson.format(sign='+')}) as bigint)"
        ).alias("wilson_hi_micro"),
    ).orderBy("day_idx")


@register(
    "stats_runs_test_daily",
    """
    WITH daily AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x,
               COUNT(*) AS cnt
        FROM events GROUP BY 1, 2
    ),
    dx AS (
        SELECT event_type, x,
               cnt - lag(cnt) OVER (PARTITION BY event_type ORDER BY x) AS d
        FROM daily
    ),
    sgn AS (
        SELECT event_type, x,
               CASE WHEN d > 0 THEN 1 ELSE -1 END AS s
        FROM dx WHERE d IS NOT NULL AND d <> 0
    ),
    flips AS (
        SELECT event_type, s,
               CASE WHEN s <> lag(s) OVER (PARTITION BY event_type ORDER BY x)
                    THEN 1 ELSE 0 END AS flip
        FROM sgn
    ),
    m AS (
        SELECT event_type,
               CAST(1 + SUM(CASE WHEN flip = 1 THEN 1 ELSE 0 END) AS BIGINT) AS runs,
               CAST(SUM(CASE WHEN s = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_up,
               CAST(SUM(CASE WHEN s = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_down
        FROM flips GROUP BY 1
    )
    SELECT event_type, runs, n_up, n_down,
           CASE WHEN n_up = 0 OR n_down = 0 OR n_up + n_down < 2
                     OR (2.0 * n_up * n_down)
                        * (2.0 * n_up * n_down - n_up - n_down) <= 0.0
                THEN NULL
                ELSE CAST(floor(1000000.0 *
                     (CAST(runs AS DOUBLE)
                      - (1.0 + (2.0 * n_up * n_down)
                               / (CAST(n_up AS DOUBLE) + n_down)))
                     / sqrt(((2.0 * n_up * n_down)
                             * (2.0 * n_up * n_down - n_up - n_down))
                            / ((CAST(n_up AS DOUBLE) + n_down)
                               * (CAST(n_up AS DOUBLE) + n_down)
                               * (CAST(n_up AS DOUBLE) + n_down - 1.0))))
                     AS BIGINT)
           END AS z_micro
    FROM m ORDER BY event_type
    """,
)
def stats_runs_test_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wald–Wolfowitz runs test on each event type's daily up/down
    moves — are consecutive day-over-day changes independent, or does
    the series trend/oscillate?  Too FEW runs ⇒ momentum (a level
    shift the CUSUM will localize); too MANY ⇒ oscillation (e.g. a
    batch job alternating load).  Zero deltas are dropped (standard
    treatment); z is the normal approximation in micro-units.

    Float parity: like the Wilson query, the statistic touches only
    IEEE-correctly-rounded ops (×,÷,+,−,√) on integer inputs —
    bit-identical across engines; degenerate sign sequences yield
    NULL on both sides.

    Scale shape: one combinable groupBy(type, day); the delta and
    flip passes are type-PARTITIONED windows over the bounded daily
    grid; the test statistic is a projection over ≤|types| aggregate
    rows.  No global window, no BNLJ."""
    daily = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "event_type",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        )
        .groupBy("event_type", "x")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    wd = Window.partitionBy("event_type").orderBy("x")
    sgn = (
        daily.select(
            "event_type", "x", (F.col("cnt") - F.lag("cnt").over(wd)).alias("d")
        )
        .filter(F.col("d").isNotNull() & (F.col("d") != 0))
        .select(
            "event_type",
            "x",
            F.when(F.col("d") > 0, 1).otherwise(-1).alias("s"),
        )
    )
    flips = sgn.select(
        "event_type",
        "s",
        F.when(F.col("s") != F.lag("s").over(wd), 1).otherwise(0).alias("flip"),
    )
    m = flips.groupBy("event_type").agg(
        (1 + F.sum(F.when(F.col("flip") == 1, 1).otherwise(0)))
        .cast("bigint")
        .alias("runs"),
        F.sum(F.when(F.col("s") == 1, 1).otherwise(0)).cast("bigint").alias("n_up"),
        F.sum(F.when(F.col("s") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_down"),
    )
    return m.select(
        "event_type",
        "runs",
        "n_up",
        "n_down",
        F.expr(
            "case when n_up = 0 or n_down = 0 or n_up + n_down < 2"
            " or (2.0D * n_up * n_down)"
            " * (2.0D * n_up * n_down - n_up - n_down) <= 0.0D"
            " then null"
            " else cast(floor(1000000.0D *"
            " (cast(runs as double)"
            " - (1.0D + (2.0D * n_up * n_down)"
            " / (cast(n_up as double) + n_down)))"
            " / sqrt(((2.0D * n_up * n_down)"
            " * (2.0D * n_up * n_down - n_up - n_down))"
            " / ((cast(n_up as double) + n_down)"
            " * (cast(n_up as double) + n_down)"
            " * (cast(n_up as double) + n_down - 1.0D))))"
            " as bigint) end"
        ).alias("z_micro"),
    ).orderBy("event_type")


# ---------------------------------------------------------------------------
# Round-6 batch 17: Good-Turing unseen mass, weekly type-mix drift
# ---------------------------------------------------------------------------


@register(
    "vocab_good_turing_unseen_mass",
    r"""
    WITH tok AS (
        SELECT unnest(string_split_regex(text, '\s+')) AS tok FROM documents
    ),
    tc AS (SELECT tok, COUNT(*) AS c FROM tok GROUP BY tok)
    SELECT CAST(SUM(c) AS BIGINT) AS n_tokens,
           CAST(COUNT(*) AS BIGINT) AS vocab_size,
           CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_dis_legomena,
           CAST((1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // SUM(c)
               AS BIGINT) AS unseen_mass_permille,
           CAST((1000 * SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)) // COUNT(*)
               AS BIGINT) AS hapax_vocab_permille
    FROM tc
    """,
)
def vocab_good_turing_unseen_mass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Good–Turing unseen-probability-mass estimate: P(next token is
    NOVEL) ≈ N₁/N (hapax count over token count) — the language-model
    smoothing number that says how much probability a model trained
    on this corpus must reserve for words it has never seen, and the
    leading indicator for 'will more data still help the tokenizer'
    (falling hapax share = saturating vocabulary — the same signal
    vocab_heaps_growth reads as a curve, here as the classical point
    estimate).  Dis-legomena (c=2) ride along for the GT confidence
    heuristic (N₁ should ≈ 2·N₂ under Zipf).

    Scale shape: explode → ONE map-side-combinable groupBy(token),
    then a single global aggregate projection — no join, no window,
    no broadcast, nothing else.  The vocabulary relation is the same
    one every tokenizer-build query already pays for."""
    docs = load_testdata(spark, sf_dir, "documents")
    tc = (
        docs.select(F.explode(X.tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    return tc.agg(
        F.sum("c").cast("bigint").alias("n_tokens"),
        F.count(F.lit(1)).cast("bigint").alias("vocab_size"),
        F.sum(F.when(F.col("c") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_hapax"),
        F.sum(F.when(F.col("c") == 2, 1).otherwise(0))
        .cast("bigint")
        .alias("n_dis_legomena"),
        F.expr(
            "cast(div(1000 * sum(case when c = 1 then 1 else 0 end), sum(c))"
            " as bigint)"
        ).alias("unseen_mass_permille"),
        F.expr(
            "cast(div(1000 * sum(case when c = 1 then 1 else 0 end), count(1))"
            " as bigint)"
        ).alias("hapax_vocab_permille"),
    )


@register(
    "events_type_mix_drift_weekly",
    """
    WITH e AS (
        SELECT event_type,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) // 7 AS wk
        FROM events
    ),
    wt AS (SELECT wk, event_type, COUNT(*) AS c FROM e GROUP BY 1, 2),
    wn AS (SELECT wk, SUM(c) AS nw FROM wt GROUP BY 1),
    ot AS (SELECT event_type, COUNT(*) AS ct FROM e GROUP BY 1),
    tot AS (SELECT SUM(ct) AS n FROM ot),
    cells AS (
        -- FULL week x type grid: a type with ZERO events in a week
        -- must still contribute |0 - p_all| (the vanished-logger case
        -- is the largest deviation, not a missing term)
        SELECT g.wk,
               abs((1000000 * COALESCE(wt.c, 0)) // g.nw
                   - (1000000 * g.ct) // tot.n) AS dev
        FROM (SELECT wn.wk, wn.nw, ot.event_type, ot.ct
              FROM wn CROSS JOIN ot) g
        LEFT JOIN wt ON wt.wk = g.wk AND wt.event_type = g.event_type
        CROSS JOIN tot
    )
    SELECT CAST(c.wk AS INTEGER) AS week,
           CAST(MIN(wn.nw) AS BIGINT) AS n_events,
           CAST(SUM(c.dev) // 2000 AS BIGINT) AS tvd_permille
    FROM cells c JOIN wn ON wn.wk = c.wk
    GROUP BY c.wk
    ORDER BY week
    """,
)
def events_type_mix_drift_weekly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weekly event-type MIX drift: total-variation distance (permille)
    between each week's event-type distribution and the whole-corpus
    mix — the instrumentation-health monitor that catches a logger
    change ('clicks stopped firing in week 9') as a composition shift
    even when total volume looks normal.  Complements
    events_distribution_drift (VALUE drift between time halves) on
    the categorical axis with a per-week trail.

    Integer contract: shares in micro-units by truncating division;
    TVD = Σ|dev| // 2000 (the ½ and the permille fold into one
    divisor).  Slight truncation bias is identical on both engines.

    Scale shape: one combinable groupBy(week, type) bounds everything
    at ≤|weeks|·|types| rows; the deviation runs over the FULL
    week×type grid (|weeks| totals × |types| mix — both bounded
    aggregates, crossJoin BNLJ-allowlisted) left-joined with observed
    counts, so zero cells keep their |0 − p_all| term; the 1-row
    grand total broadcasts.  No window."""
    e = load_testdata(spark, sf_dir, "events").select(
        "event_type",
        F.expr("div(datediff(cast(ts as date), date'2024-01-01'), 7)").alias("wk"),
    )
    wt = e.groupBy("wk", "event_type").agg(F.count(F.lit(1)).alias("c"))
    wn = wt.groupBy("wk").agg(F.sum("c").alias("nw"))
    ot = e.groupBy("event_type").agg(F.count(F.lit(1)).alias("ct"))
    tot = ot.agg(F.sum("ct").alias("n"))
    grid = wn.crossJoin(F.broadcast(ot))
    cells = (
        grid.join(wt, ["wk", "event_type"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "wk",
            F.abs(
                F.expr("div(1000000 * coalesce(c, 0L), nw)")
                - F.expr("div(1000000 * ct, n)")
            ).alias("dev"),
        )
    )
    return (
        cells.groupBy("wk")
        .agg(F.sum("dev").alias("sdev"))
        .join(wn, "wk")
        .select(
            F.col("wk").cast("int").alias("week"),
            F.col("nw").cast("bigint").alias("n_events"),
            F.expr("cast(div(sdev, 2000) as bigint)").alias("tvd_permille"),
        )
        .orderBy("week")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 18: dedup token-savings report
# ---------------------------------------------------------------------------


@register(
    "dedup_token_savings_report",
    f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (
        SELECT c.doc_id,
               least(c.doc_id, coalesce(MIN(r.v), c.doc_id)) AS component
        FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
        GROUP BY c.doc_id
    ),
    toks AS (
        SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tok
        FROM corpus
    )
    SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(COUNT(DISTINCT l.component) AS BIGINT) AS n_clusters,
           CAST(SUM(CASE WHEN l.doc_id <> l.component THEN 1 ELSE 0 END)
                AS BIGINT) AS n_removed_docs,
           CAST(SUM(t.n_tok) AS BIGINT) AS tokens_total,
           CAST(SUM(CASE WHEN l.doc_id <> l.component THEN t.n_tok ELSE 0 END)
                AS BIGINT) AS tokens_removed,
           CAST((1000 * SUM(CASE WHEN l.doc_id <> l.component
                                 THEN t.n_tok ELSE 0 END)) // SUM(t.n_tok)
                AS BIGINT) AS tokens_removed_permille
    FROM labels l JOIN toks t ON t.doc_id = l.doc_id
    """,
)
def dedup_token_savings_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """THE headline number of a dedup run: how many TRAINING TOKENS
    does keeping one representative per verified near-dup cluster
    save?  Composes the production clustering path (banded MinHash
    candidates → exact-Jaccard verification ≥ 0.3 → connected
    components, all identical to ``dedup_clusters_minhash``) with the
    min-id representative policy (the CC label IS the cluster's min
    doc_id) and a token-mass rollup — one row: docs, clusters,
    removed docs, token totals, and the permille of corpus tokens a
    trainer stops paying for.  This is the cost-benefit line a data
    lead reads before approving the dedup config (compare against
    ``dedup_removal_bias_audit`` for WHAT is removed).

    Scale shape: adds exactly ONE combinable token-count projection
    and one key equi-join + global aggregate on top of the proven CC
    chain (per-round localCheckpoint, O(|E|) iterations); the report
    is a single row.  Oracle: the recursive-CTE CC twin shared with
    the cluster queries."""
    from .operators.graph import connected_components

    corpus = _dedup_corpus(spark, sf_dir).transform(tracked_persist)
    pairs = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=300
    )
    nodes = corpus.select(F.col("doc_id").alias("id"))
    labels = connected_components(
        nodes, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    toks = corpus.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.col("text"), X.TOKEN_RE)).alias("n_tok"),
    )
    j = labels.join(toks, "id")
    return j.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.countDistinct("component").cast("bigint").alias("n_clusters"),
        F.sum(F.when(F.col("id") != F.col("component"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_removed_docs"),
        F.sum("n_tok").cast("bigint").alias("tokens_total"),
        F.sum(F.when(F.col("id") != F.col("component"), F.col("n_tok")).otherwise(0))
        .cast("bigint")
        .alias("tokens_removed"),
        F.expr(
            "cast(div(1000 * sum(case when id <> component then n_tok else 0 end),"
            " sum(n_tok)) as bigint)"
        ).alias("tokens_removed_permille"),
    )


# ---------------------------------------------------------------------------
# Round-6 batch 19: conversion latency, new-vs-returning split
# ---------------------------------------------------------------------------


@register(
    "events_time_to_convert_quantiles",
    """
    WITH v AS (
        SELECT user_id, MIN(epoch_ms(ts)) AS first_view
        FROM events WHERE event_type = 'view' GROUP BY user_id
    ),
    p AS (
        SELECT e.user_id, MIN(epoch_ms(e.ts)) AS first_purchase
        FROM events e JOIN v ON v.user_id = e.user_id
        WHERE e.event_type = 'purchase' AND epoch_ms(e.ts) >= v.first_view
        GROUP BY e.user_id
    ),
    g AS (
        SELECT (p.first_purchase - v.first_view) // 60000 AS gap_min
        FROM v JOIN p ON p.user_id = v.user_id
    ),
    gg AS (SELECT gap_min, COUNT(*) AS c FROM g GROUP BY gap_min),
    cum AS (
        SELECT gap_min,
               SUM(c) OVER (ORDER BY gap_min
                            ROWS BETWEEN UNBOUNDED PRECEDING
                                     AND CURRENT ROW) AS cc
        FROM gg
    ),
    t AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM gg)
    SELECT CAST(t.n AS BIGINT) AS n_converters,
           CAST(MIN(CASE WHEN cc >= (50 * t.n + 99) // 100 THEN gap_min END)
                AS BIGINT) AS p50_min,
           CAST(MIN(CASE WHEN cc >= (90 * t.n + 99) // 100 THEN gap_min END)
                AS BIGINT) AS p90_min,
           CAST(MIN(CASE WHEN cc >= (99 * t.n + 99) // 100 THEN gap_min END)
                AS BIGINT) AS p99_min
    FROM cum CROSS JOIN t
    GROUP BY t.n
    """,
)
def events_time_to_convert_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact p50/p90/p99 of VIEW→PURCHASE latency (minutes from a
    user's first view to their first purchase at-or-after it) — the
    conversion-velocity metric product teams pair with the funnel's
    conversion RATE (events_funnel says how many convert; this says
    how long the ones who do take, with the p99 tail exposing the
    slow-consideration cohort).

    Scale shape: two combinable groupBy(user) MIN-aggregates (the
    purchase side pre-filtered by a key equi-join against first
    views); the latency distribution collapses to the minute-domain
    grid and quantile selection runs through the shared ECDF
    threshold contract (cumsum over the bounded gap grid —
    global-window-allowlisted; 1-row total broadcast —
    BNLJ-allowlisted; same shape as events_interarrival_quantiles)."""
    from .operators.prefixsum import bucketed_cumsum

    ev = load_testdata(spark, sf_dir, "events").select(
        "user_id", "event_type", F.expr("unix_millis(ts)").alias("ems")
    )
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ems").alias("first_view"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(v, "user_id")
        .filter(F.col("ems") >= F.col("first_view"))
        .groupBy("user_id")
        .agg(F.min("ems").alias("first_purchase"))
    )
    g = v.join(p, "user_id").select(
        F.expr("div(first_purchase - first_view, 60000)").alias("gap_min")
    )
    gg = g.groupBy("gap_min").agg(F.count(F.lit(1)).alias("c"))
    cum = bucketed_cumsum(gg, [], "gap_min", ["c"], bucket_width=1440)
    t = gg.agg(F.sum("c").cast("bigint").alias("n"))
    return (
        cum.crossJoin(F.broadcast(t))
        .groupBy("n")
        .agg(
            *[
                F.min(
                    F.when(
                        F.col("cum_c") >= F.expr(f"div({pp} * n + 99, 100)"),
                        F.col("gap_min"),
                    )
                )
                .cast("bigint")
                .alias(f"p{pp}_min")
                for pp in (50, 90, 99)
            ]
        )
        .select(F.col("n").alias("n_converters"), "p50_min", "p90_min", "p99_min")
    )


@register(
    "events_new_vs_returning_daily",
    """
    WITH ud AS (
        SELECT DISTINCT user_id,
               datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) AS x
        FROM events
    ),
    first_day AS (SELECT user_id, MIN(x) AS fd FROM ud GROUP BY user_id)
    SELECT CAST(ud.x AS INTEGER) AS day_idx,
           CAST(COUNT(*) AS BIGINT) AS active_users,
           CAST(SUM(CASE WHEN f.fd = ud.x THEN 1 ELSE 0 END) AS BIGINT)
               AS new_users,
           CAST(SUM(CASE WHEN f.fd < ud.x THEN 1 ELSE 0 END) AS BIGINT)
               AS returning_users,
           CAST((1000 * SUM(CASE WHEN f.fd = ud.x THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS new_share_permille
    FROM ud JOIN first_day f ON f.user_id = ud.user_id
    GROUP BY ud.x ORDER BY day_idx
    """,
)
def events_new_vs_returning_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily active users split into NEW (first-ever active day) vs
    RETURNING — the growth-accounting decomposition behind every DAU
    chart: flat DAU with a rising new-share means churn is eating
    acquisition; the cohort-retention matrix
    (events_cohort_retention) explains WHERE the returners come from,
    this gives the daily topline split.

    Scale shape: one groupBy(user, day) dedup, one combinable
    groupBy(user) MIN for first-day, one key equi-join back, one
    groupBy(day) — all natural-key shuffles, no window, no BNLJ."""
    ud = (
        load_testdata(spark, sf_dir, "events")
        .select(
            "user_id",
            F.expr("datediff(cast(ts as date), date'2024-01-01')").alias("x"),
        )
        .distinct()
    )
    first_day = ud.groupBy("user_id").agg(F.min("x").alias("fd"))
    return (
        ud.join(first_day, "user_id")
        .groupBy("x")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("active_users"),
            F.sum(F.when(F.col("fd") == F.col("x"), 1).otherwise(0))
            .cast("bigint")
            .alias("new_users"),
            F.sum(F.when(F.col("fd") < F.col("x"), 1).otherwise(0))
            .cast("bigint")
            .alias("returning_users"),
        )
        .select(
            F.col("x").cast("int").alias("day_idx"),
            "active_users",
            "new_users",
            "returning_users",
            F.expr("cast(div(1000 * new_users, active_users) as bigint)").alias(
                "new_share_permille"
            ),
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 20: hour-of-week heatmap, trailing-7d revenue MA
# ---------------------------------------------------------------------------


@register(
    "events_hour_weekday_heatmap",
    """
    WITH e AS (
        SELECT datediff('day', DATE '2024-01-01', CAST(ts AS DATE)) % 7 AS wd,
               (epoch_ms(ts) // 3600000) % 24 AS hod
        FROM events
    ),
    cells AS (SELECT wd, hod, COUNT(*) AS n FROM e GROUP BY 1, 2),
    wt AS (SELECT wd, SUM(n) AS nw FROM cells GROUP BY 1)
    SELECT CAST(c.wd AS INTEGER) AS weekday,
           CAST(c.hod AS INTEGER) AS hour_utc,
           CAST(c.n AS BIGINT) AS n_events,
           CAST((1000 * c.n) // w.nw AS BIGINT) AS weekday_share_permille
    FROM cells c JOIN wt w ON w.wd = c.wd
    ORDER BY weekday, hour_utc
    """,
)
def events_hour_weekday_heatmap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The 7×24 activity heatmap: event volume per (weekday,
    UTC-hour) cell with each cell's permille share of its weekday —
    the seasonality fingerprint behind capacity planning (when do we
    scale up?) and anomaly-detector scheduling (the weekday
    deseasonalizer assumes a stable weekly shape; this is the table
    that VERIFIES the assumption).  Day 0 (2024-01-01) is a Monday;
    hour-of-day is derived from epoch milliseconds (pure integer
    arithmetic, timezone-free — the same TZ-proof contract the
    hourly rollup uses via epoch, surviving the driver's
    Asia/Kolkata session).

    Scale shape: ONE map-side-combinable groupBy to ≤168 cells plus a
    7-row weekday-total groupBy and their equi-join.  Nothing else."""
    e = load_testdata(spark, sf_dir, "events").select(
        F.expr("datediff(cast(ts as date), date'2024-01-01') % 7").alias("wd"),
        F.expr("(div(unix_millis(ts), 3600000)) % 24").alias("hod"),
    )
    cells = e.groupBy("wd", "hod").agg(F.count(F.lit(1)).alias("n"))
    wt = cells.groupBy("wd").agg(F.sum("n").alias("nw"))
    return (
        cells.join(wt, "wd")
        .select(
            F.col("wd").cast("int").alias("weekday"),
            F.col("hod").cast("int").alias("hour_utc"),
            F.col("n").cast("bigint").alias("n_events"),
            F.expr("cast(div(1000 * n, nw) as bigint)").alias(
                "weekday_share_permille"
            ),
        )
        .orderBy("weekday", "hour_utc")
    )


@register(
    "orders_daily_revenue_7d_ma",
    """
    WITH daily AS (
        SELECT datediff('day', DATE '1992-01-01', o_orderdate) AS x,
               SUM(CAST(round(o_totalprice * 100) AS BIGINT)) AS rev_c
        FROM orders GROUP BY 1
    ),
    contrib AS (
        SELECT d AS x, rev_c
        FROM daily CROSS JOIN unnest(generate_series(daily.x, daily.x + 6)) t(d)
    ),
    ma AS (
        SELECT x, SUM(rev_c) AS s, COUNT(*) AS k
        FROM contrib GROUP BY x
    )
    SELECT CAST(d.x AS INTEGER) AS day_idx,
           CAST(d.rev_c AS BIGINT) AS revenue_cents,
           CAST(m.s // m.k AS BIGINT) AS ma7_cents,
           CAST(m.k AS INTEGER) AS window_days
    FROM daily d JOIN ma m ON m.x = d.x
    ORDER BY day_idx
    """,
)
def orders_daily_revenue_7d_ma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily revenue with its trailing-7-day moving average — the
    smoothed topline read alongside the raw series (the MA crossing
    under the daily line flags a slowdown earlier than eyeballing
    noise).  Partial windows at the series head average over the
    days actually present (window_days reports the divisor).

    Scale shape: the SCALABLE moving-average spelling — each daily
    aggregate row EMITS its 7 trailing membership days (constant ×7
    map-side sequence-explode of the ALREADY-collapsed daily
    relation, the events_dau_wau_stickiness trick), then one
    combinable groupBy(day) — instead of an unpartitioned range
    window over the series (the single-task shape the fleet bans).
    At 100 TB the daily relation is |days| rows either way; the same
    spelling keeps working when the grain drops to minutes."""
    daily = (
        load_testdata(spark, sf_dir, "orders")
        .select(
            F.expr("datediff(o_orderdate, date'1992-01-01')").alias("x"),
            F.expr("cast(round(o_totalprice * 100) as bigint)").alias("rc"),
        )
        .groupBy("x")
        .agg(F.sum("rc").alias("rev_c"))
    )
    contrib = daily.select(
        F.explode(F.sequence(F.col("x"), F.col("x") + 6)).alias("x"),
        "rev_c",
    )
    ma = contrib.groupBy("x").agg(
        F.sum("rev_c").alias("s"), F.count(F.lit(1)).alias("k")
    )
    return (
        daily.join(ma, "x")
        .select(
            F.col("x").cast("int").alias("day_idx"),
            F.col("rev_c").cast("bigint").alias("revenue_cents"),
            F.expr("cast(div(s, k) as bigint)").alias("ma7_cents"),
            F.col("k").cast("int").alias("window_days"),
        )
        .orderBy("day_idx")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 21: soft-dedup duplicate down-weighting
# ---------------------------------------------------------------------------


@register(
    "sample_soft_dedup_weights",
    f"""
    WITH RECURSIVE {_CORPUS_SQL}, {_SHINGLE_SQL}, {_MINHASH_BANDS_SQL},
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b
        FROM bands a
        JOIN bands b ON a.band_idx = b.band_idx AND a.band_sig = b.band_sig
                    AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    common AS (
        SELECT c.id_a, c.id_b, COUNT(*) AS c
        FROM cand c
        JOIN sh a ON a.doc_id = c.id_a
        JOIN sh b ON b.doc_id = c.id_b AND b.sh = a.sh
        GROUP BY 1, 2
    ),
    pairs AS (
        SELECT id_a, id_b
        FROM common JOIN sizes sa ON sa.doc_id = id_a JOIN sizes sb ON sb.doc_id = id_b
        WHERE (1000 * c) // (sa.sz + sb.sz - c) >= 300
    ),
    edges AS (SELECT id_a AS u, id_b AS v FROM pairs
              UNION ALL SELECT id_b AS u, id_a AS v FROM pairs),
    reach(u, v) AS (
        SELECT u, v FROM edges
        UNION
        SELECT r.u, e.v FROM reach r JOIN edges e ON r.v = e.u
    ),
    labels AS (
        SELECT c.doc_id,
               least(c.doc_id, coalesce(MIN(r.v), c.doc_id)) AS component
        FROM corpus c LEFT JOIN reach r ON r.u = c.doc_id
        GROUP BY c.doc_id
    ),
    csz AS (SELECT component, COUNT(*) AS s FROM labels GROUP BY component),
    toks AS (
        SELECT doc_id, len(string_split_regex(text, '\\s+')) AS n_tok
        FROM corpus
    ),
    weighted AS (
        SELECT cs.s, t.n_tok, (1000 * t.n_tok) // cs.s AS wtok
        FROM labels l
        JOIN csz cs ON cs.component = l.component
        JOIN toks t ON t.doc_id = l.doc_id
    )
    SELECT CAST(s AS BIGINT) AS cluster_size,
           CAST(1000 // s AS BIGINT) AS weight_permille,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS tokens_raw,
           CAST(SUM(wtok) AS BIGINT) AS tokens_effective_milli
    FROM weighted GROUP BY s ORDER BY cluster_size
    """,
)
def sample_soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SOFT dedup: instead of deleting near-duplicates, down-weight
    every member of a duplicate cluster by 1/cluster-size (the
    SoftDedup idea — duplicated content keeps exactly ONE document's
    worth of total sampling mass, so the mixture never over-trains on
    boilerplate but rare paraphrase clusters aren't destroyed
    either).  Output: per cluster size, the member weight (permille),
    doc count, raw token mass, and the effective (weighted) token
    mass in milli-tokens — the third leg of the dedup decision
    triangle with HARD removal (`dedup_token_savings_report`: what
    deleting saves) and the bias audit (`dedup_removal_bias_audit`:
    what deleting skews).

    Scale shape: the proven verified-LSH + CC chain plus one
    combinable cluster-size groupBy, two key equi-joins, and a
    ≤|distinct sizes|-row rollup.  Weights are pure integers
    (1000·n_tok // size) — no float sampling state."""
    from .operators.graph import connected_components

    corpus = _dedup_corpus(spark, sf_dir).transform(tracked_persist)
    pairs = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=300
    )
    nodes = corpus.select(F.col("doc_id").alias("id"))
    labels = connected_components(
        nodes, pairs.select(F.col("id_a").alias("src"), F.col("id_b").alias("dst"))
    )
    csz = labels.groupBy("component").agg(F.count(F.lit(1)).alias("s"))
    toks = corpus.select(
        F.col("doc_id").alias("id"),
        F.size(F.split(F.col("text"), X.TOKEN_RE)).alias("n_tok"),
    )
    weighted = (
        labels.join(csz, "component")
        .join(toks, "id")
        .select("s", "n_tok", F.expr("div(1000 * n_tok, s)").alias("wtok"))
    )
    return (
        weighted.groupBy("s")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("tokens_raw"),
            F.sum("wtok").cast("bigint").alias("tokens_effective_milli"),
        )
        .select(
            F.col("s").cast("bigint").alias("cluster_size"),
            F.expr("cast(div(1000, s) as bigint)").alias("weight_permille"),
            "n_docs",
            "tokens_raw",
            "tokens_effective_milli",
        )
        .orderBy("cluster_size")
    )


# ---------------------------------------------------------------------------
# Round-6 batch 22: LSH candidate precision report
# ---------------------------------------------------------------------------


@register(
    "dedup_lsh_precision_report",
    f"""
    WITH {_CORPUS_SQL}, {_SHINGLE_SQL},
    seeds AS (SELECT unnest(generate_series(0, 7)) AS seed),
    hashed AS (
        SELECT doc_id, seed, md5(CAST(seed AS VARCHAR) || ':' || sh) AS h
        FROM sh CROSS JOIN seeds
    ),
    sig AS (
        SELECT doc_id,
               {', '.join(f"MIN(CASE WHEN seed = {i} THEN h END) AS h{i}" for i in range(8))}
        FROM hashed GROUP BY doc_id
    ),
    bands AS (
        SELECT doc_id, 0 AS band_idx, md5(concat_ws('|', h0, h1, h2, h3)) AS band_sig FROM sig
        UNION ALL
        SELECT doc_id, 1, md5(concat_ws('|', h4, h5, h6, h7)) FROM sig
    ),
    cand AS (
        SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_bands
        FROM bands a JOIN bands b ON a.band_idx = b.band_idx
            AND a.band_sig = b.band_sig AND a.doc_id < b.doc_id
        GROUP BY 1, 2
    ),
    sizes AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
    scored AS (
        SELECT c.shared_bands,
               CASE WHEN (1000 * cm.c) // (sa.sz + sb.sz - cm.c) >= 300
                    THEN 1 ELSE 0 END AS verified
        FROM cand c
        JOIN (SELECT ca.id_a, ca.id_b, COUNT(*) AS c
              FROM cand ca
              JOIN sh a ON a.doc_id = ca.id_a
              JOIN sh b ON b.doc_id = ca.id_b AND b.sh = a.sh
              GROUP BY 1, 2) cm
          ON cm.id_a = c.id_a AND cm.id_b = c.id_b
        JOIN sizes sa ON sa.doc_id = c.id_a
        JOIN sizes sb ON sb.doc_id = c.id_b
    )
    SELECT CAST(shared_bands AS INTEGER) AS shared_bands,
           CAST(COUNT(*) AS BIGINT) AS n_candidates,
           CAST(SUM(verified) AS BIGINT) AS n_verified,
           CAST((1000 * SUM(verified)) // COUNT(*) AS BIGINT)
               AS precision_permille
    FROM scored GROUP BY shared_bands ORDER BY shared_bands
    """,
)
def dedup_lsh_precision_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH candidate PRECISION, stratified by shared-band count: of
    the pairs the banded join emits, what fraction survives exact
    Jaccard ≥ 0.3 verification?  The operational companion to the
    recall gates (`dedup_lsh_recall_sampled` answers "what do we
    MISS"; this answers "what do we WASTE verifying") — together they
    locate the corpus on the banding S-curve, and the per-band split
    shows the expected monotonicity (2-band agreers verify at a far
    higher rate than 1-band accidents), the number that justifies
    tightening r when verification cost dominates.

    Scale shape: the standard banded candidate join (never
    all-pairs), verification re-reads only candidate pairs' persisted
    shingle arrays (|pairs| ≪ N — the dedup_clusters_minhash
    contract), and the report is one ≤2-row groupBy.  No BNLJ, no
    window."""
    corpus = _dedup_corpus(spark, sf_dir)
    bands = D.minhash_bands(corpus, "doc_id", "text", n_hashes=8, band_size=4)
    cand = D.lsh_candidate_pairs(bands, "doc_id")
    verified = D.minhash_verified_pairs(
        corpus, "doc_id", "text", n_hashes=8, band_size=4, min_permille=300
    ).select("id_a", "id_b", F.lit(1).alias("v"))
    scored = cand.join(verified, ["id_a", "id_b"], "left").select(
        "shared_bands", F.coalesce(F.col("v"), F.lit(0)).alias("verified")
    )
    return (
        scored.groupBy("shared_bands")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_candidates"),
            F.sum("verified").cast("bigint").alias("n_verified"),
        )
        .select(
            F.col("shared_bands").cast("int"),
            "n_candidates",
            "n_verified",
            F.expr("cast(div(1000 * n_verified, n_candidates) as bigint)").alias(
                "precision_permille"
            ),
        )
        .orderBy("shared_bands")
    )
