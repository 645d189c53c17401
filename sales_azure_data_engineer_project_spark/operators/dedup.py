"""Deduplication operator family for training-data pipelines.

Four tiers, all shuffle-aware and expressed with built-in functions:

- **exact**        hash-groupBy on content digest — one shuffle on the
                   digest; at 100 TB this is the cheapest possible dedup
                   (shuffle of 16-byte keys, map-side combine).
- **n-gram Jaccard**  shingle → explode → self-join on shingle →
                   integer-exact Jaccard per candidate pair.  The
                   explode/join is the scalable formulation (never a
                   cross join): cost is Σ bucket² over shingle buckets.
- **MinHash + LSH**  md5-based minhash signatures, banded; candidate
                   pairs only where a band bucket collides.  This is the
                   100 TB path: signature size is constant per doc and
                   the band join shuffles only (doc, band-sig) pairs.
- **SimHash**      16-bit vote fingerprint from md5 nibbles (the
                   SQL-exact variant; a 64/128-bit production variant
                   would swap the nibble trick for a Pandas UDF).

All hashes are md5-hex so a DuckDB oracle can reproduce results
byte-for-byte; minhash "min" is lexicographic over hex strings.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .text import TOKEN_RE, fingerprint_md5
from ..caching import tracked_persist

__all__ = [
    "word_shingles",
    "exact_dedup_groups",
    "shingle_explode",
    "jaccard_pairs",
    "minhash_bands",
    "minhash_signatures",
    "lsh_candidate_pairs",
    "minhash_verified_pairs",
    "simhash16",
    "simhash_hamming_pairs",
]


def shingles_from_tokens(toks: Column, n: int = 3) -> Column:
    """Distinct word n-gram shingles from a *bound tokens column*;
    empty array when < n tokens.

    Callers must materialize the token array as a real column first:
    referencing ``split(text)`` inline would re-run the regex split for
    every ``element_at`` inside the lambda (Spark does no CSE through
    higher-order functions — measured 4× slowdown).

    (The <n guard matters: Spark's ``sequence(0, -1)`` counts *down*,
    unlike DuckDB's ``generate_series`` which returns empty.)
    """
    idx = F.sequence(F.lit(0), F.size(toks) - n)
    grams = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)])
    )
    return F.array_distinct(F.when(F.size(toks) >= n, grams).otherwise(F.array()))


def word_shingles(col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles of a text column (convenience
    wrapper; for hot paths prefer binding tokens first — see
    ``shingles_from_tokens``)."""
    c = F.col(col) if isinstance(col, str) else col
    return shingles_from_tokens(F.split(c, TOKEN_RE), n)


def exact_dedup_groups(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Exact dedup: one row per distinct content, keeper = min id.

    Output: (text_md5, keeper_id, n_copies)."""
    return (
        df.select(fingerprint_md5(text_col).alias("text_md5"), F.col(id_col))
        .groupBy("text_md5")
        .agg(
            F.min(id_col).cast("bigint").alias("keeper_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def shingle_explode(df: DataFrame, id_col: str, text_col: str, n: int = 3) -> DataFrame:
    """(id, shingle) pairs, distinct shingles per document.

    Tokens are BOUND in a projection before the gram lambda (round-4:
    the previous ``word_shingles(text_col)`` inlined ``split(text)``
    into the higher-order lambda, re-running the regex per
    ``element_at`` — Spark does no CSE through lambdas; measured 7.3 s
    → 0.7 s for explode+hash at sf0.1)."""
    toks = df.select(F.col(id_col), F.split(F.col(text_col), TOKEN_RE).alias("__toks"))
    return toks.select(
        F.col(id_col), F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("sh")
    )


def _shingled(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """Per-doc distinct shingle HASH arrays (xxhash64 longs), persisted.

    Every dedup pipeline below reuses the shingle set 2–3× (sizes,
    left/right side of the self-join, intersect verification); without
    persisting, Spark re-runs the regex tokenization + n-gram build per
    use — the dominant cost at any scale.  MEMORY_AND_DISK so big
    corpora spill instead of OOMing.

    Round-8: this frame persists 8-byte LONGS, not the raw ~25-byte
    shingle strings — the string-array columnar cache OOM'd the 300×
    decade tier during batch build (same inflation class as the
    char-array trigram fix).  Every consumer here needs shingle
    IDENTITY only (posting equi-joins, sizes, array_intersect counts),
    for which xxhash64 is the documented birthday-bounded stand-in the
    posting joins already used.  The one consumer that needs the RAW
    strings — the md5 minhash signature build, which must stay
    engine-portable for the DuckDB oracles — streams them straight off
    its own text scan instead (``minhash_signatures``), or shares ONE
    scan via ``_shingled_with_sig`` when a caller needs both.

    Built explode→hash→collect_list rather than a per-element
    ``transform(…, xxhash64)``: higher-order lambdas are INTERPRETED
    (the round-4 CSE lesson's sibling), and the measured 1× cost of
    interpreting 0.5M hashes exceeded this one compact groupBy of
    8-byte keys.  Array element ORDER is therefore shuffle-dependent;
    every consumer treats the array as a SET (explode / size /
    array_intersect), so results are order-invariant."""
    sh = shingle_explode(df, id_col, text_col, n)
    return (
        sh.groupBy(id_col)
        .agg(F.collect_list(F.xxhash64("sh")).alias("shingles"))
        .transform(lambda d: tracked_persist(d, batch_rows=2000))
    )


def _shingled_with_sig(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    *,
    n_hashes: int = 8,
) -> DataFrame:
    """(id, shingles array<long>, h0..h{n-1}) in ONE tokenization pass
    and ONE aggregate — for callers that need both the identity arrays
    (candidate verification) and the md5 minhash signature (banding).
    Docs with zero shingles are absent, exactly as in ``_shingled`` /
    ``minhash_signatures``."""
    sh = shingle_explode(df, id_col, text_col, n)
    return (
        sh.groupBy(id_col)
        .agg(
            F.collect_list(F.xxhash64("sh")).alias("shingles"),
            *[
                F.min(
                    F.unhex(
                        F.md5(
                            F.concat(F.lit(f"{i}:"), F.col("sh")).cast("binary")
                        )
                    )
                ).alias(f"h{i}")
                for i in range(n_hashes)
            ],
        )
        .transform(lambda d: tracked_persist(d, batch_rows=2000))
    )


def _posting_rows(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    posting_freq_cap: int | None,
) -> DataFrame:
    """(id, sz, sh) posting rows for the exact-tier self-joins.

    ``posting_freq_cap`` is the exact tier's skewed-shingle safety
    valve (VERDICT r8 "Next" #4 — the sibling of ``hot_bucket_cap``):
    a shingle appearing in m documents contributes C(m,2) rows to the
    posting self-join, so a boilerplate shingle ("click here to read
    more") with corpus-scale df makes Σ bucket² quadratic no matter
    how the rest of the corpus is distributed.  With the cap, posting
    rows whose shingle's DOCUMENT FREQUENCY exceeds it are dropped and
    per-doc sizes are recomputed over the RETAINED shingles — the
    result is integer-exact Jaccard/containment over the df-filtered
    shingle universe (a boilerplate-removed measure, the same framing
    as Broder's stop-shingle lists), fully SQL-expressible so the
    capped variant keeps a hash-exact DuckDB oracle.  Every retained
    bucket is ≤ cap rows, so join output is ≤ cap·|postings|/2 —
    LINEAR in the corpus regardless of df skew.  ``None`` keeps the
    exact-unfiltered behavior of the original oracle tier.

    Both df and retained-size are WINDOW counts (partitioned, never
    global) so neither needs a ∝-corpus aggregate joined back — the
    same in-exchange trick as ``lsh_candidate_pairs``; the df window
    shares its hash partitioning with the downstream self-join.

    Cache shapes differ by path ON PURPOSE.  The uncapped path reads
    the per-doc ARRAY cache (``_shingled``) — both join sides re-derive
    their rows from it, and other pipeline stages share it.  The capped
    path instead persists the post-filter NARROW posting rows and never
    builds the array frame at all: its only consumer would explode the
    arrays immediately, so the collect_list aggregate is wasted work —
    and at the 1000× tier the array-column cache BUILD itself is the
    heap killer (``ComplexColumnBuilder`` doubles a per-batch
    ByteBuffer between memory-accounting checks; measured round-9: the
    capped query OOM'd a stock 8 GB JVM at 5.8M docs inside
    ``ColumnBuilder.ensureFreeSpace`` while every downstream stage
    spills fine).  Scalar (long/int) column builders preallocate per
    batch and the narrow cache spills to disk like any other."""
    if posting_freq_cap is None:
        shingled = _shingled(df, id_col, text_col, n)
        return shingled.select(
            F.col(id_col),
            F.size("shingles").cast("int").alias("sz"),
            F.explode("shingles").alias("sh"),
        )
    if posting_freq_cap < 1:
        raise ValueError(f"posting_freq_cap must be >= 1; got {posting_freq_cap}")
    exploded = shingle_explode(df, id_col, text_col, n).select(
        F.col(id_col), F.xxhash64("sh").alias("sh")
    )
    return (
        exploded.withColumn(
            "_df", F.count(F.lit(1)).over(Window.partitionBy("sh"))
        )
        .filter(F.col("_df") <= posting_freq_cap)
        .select(
            F.col(id_col),
            F.count(F.lit(1))
            .over(Window.partitionBy(id_col))
            .cast("int")
            .alias("sz"),
            "sh",
        )
        .transform(tracked_persist)
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_permille: int = 300,
    posting_freq_cap: int | None = None,
) -> DataFrame:
    """Candidate near-dup pairs with integer-exact Jaccard (×1000).

    jac‰ = 1000·|A∩B| div (|A|+|B|−|A∩B|); pairs below ``min_permille``
    are dropped.  Output: (id_a, id_b, common, jac_permille).

    With ``posting_freq_cap``, shingles whose document frequency
    exceeds the cap are excluded and sizes recomputed — exact Jaccard
    over the df-filtered (boilerplate-removed) shingle universe; see
    ``_posting_rows`` for the scale contract.
    """
    # the equality self-join only needs shingle IDENTITY, not the
    # string: the persisted frame already carries xxhash64 longs
    # (8 bytes vs ~25-byte strings through the shuffle).  Collision
    # risk is birthday-bounded (~1e-9 at 1e5 distinct shingles, still
    # <1e-4 at 1e8) and any collision is caught by the DuckDB oracle,
    # which intersects the raw strings.
    # Each posting row CARRIES its document's shingle count (4-byte
    # int): the per-doc sizes relation grows ∝ corpus, so joining it
    # back — let alone broadcasting it, as this ran until round 8 —
    # is the one piece of this plan that would not survive 1e9 docs.
    # min(sz) in the pair aggregate recovers the constant-per-doc
    # value for free inside the existing partial aggregation.
    sh = _posting_rows(df, id_col, text_col, n, posting_freq_cap)
    r = sh.select(
        F.col(id_col).alias("rid"), F.col("sz").alias("sz_r"), F.col("sh")
    )
    common = (
        sh.join(r, on="sh")
        .filter(F.col(id_col) < F.col("rid"))
        .groupBy(F.col(id_col).alias("id_a"), F.col("rid").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.min("sz").alias("sz_a"),
            F.min("sz_r").alias("sz_b"),
        )
    )
    return (
        common.withColumn(
            "jac_permille",
            F.expr("div(1000 * common, sz_a + sz_b - common)").cast("bigint"),
        )
        .filter(F.col("jac_permille") >= min_permille)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("common").cast("bigint"),
            "jac_permille",
        )
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_permille: int = 800,
    posting_freq_cap: int | None = None,
) -> DataFrame:
    """Asymmetric shingle containment C(A→B) = |A∩B| / |A| (×1000).

    Jaccard is symmetric, so a short document quoted wholesale inside a
    long one scores low (union is dominated by the long doc) and
    symmetric dedup misses it.  Containment — the measure behind
    suffix-array substring dedup (Lee et al. 2022, "Deduplicating
    Training Data Makes Language Models Better") and Broder's original
    resemblance/containment pair — is the right asymmetric test: the
    shorter side's shingles nearly all appear in the longer side.

    Same posting-list shape as ``jaccard_pairs`` (shingle-hash
    equi-join, never all-pairs); one extra integer division per
    surviving pair.  Emits one row per UNORDERED pair with BOTH
    directions scored; ``cont_max_permille`` ≥ ``min_permille`` keeps
    the pair.  Output: (id_a, id_b, common, cont_a_permille,
    cont_b_permille, cont_max_permille) with id_a < id_b.

    ``posting_freq_cap`` applies the same df-filtered exactness
    contract as ``jaccard_pairs`` (see ``_posting_rows``).
    """
    # sizes carried through the posting rows exactly as in
    # ``jaccard_pairs`` above — the per-doc size relation grows ∝
    # corpus, so it must never be joined back (or broadcast).
    sh = _posting_rows(df, id_col, text_col, n, posting_freq_cap)
    r = sh.select(
        F.col(id_col).alias("rid"), F.col("sz").alias("sz_r"), F.col("sh")
    )
    common = (
        sh.join(r, on="sh")
        .filter(F.col(id_col) < F.col("rid"))
        .groupBy(F.col(id_col).alias("id_a"), F.col("rid").alias("id_b"))
        .agg(
            F.count(F.lit(1)).alias("common"),
            F.min("sz").alias("sz_a"),
            F.min("sz_r").alias("sz_b"),
        )
    )
    return (
        common.withColumn("cont_a_permille", F.expr("div(1000 * common, sz_a)").cast("bigint"))
        .withColumn("cont_b_permille", F.expr("div(1000 * common, sz_b)").cast("bigint"))
        .withColumn(
            "cont_max_permille",
            F.greatest("cont_a_permille", "cont_b_permille").cast("bigint"),
        )
        .filter(F.col("cont_max_permille") >= min_permille)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("common").cast("bigint"),
            "cont_a_permille",
            "cont_b_permille",
            "cont_max_permille",
        )
    )


def incremental_jaccard_matches(
    old: DataFrame,
    new: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n: int = 3,
    min_permille: int = 300,
) -> DataFrame:
    """Near-dup matches of a NEW batch against an EXISTING corpus — the
    incremental form of ``jaccard_pairs`` a continuous-ingest pipeline
    runs per crawl batch: the posting-list join is new-shingles ×
    old-shingles ONLY, so per-batch cost is proportional to the batch
    (Σ over shingles of new_bucket·old_bucket), never a recompute of
    old × old.  At 100 TB of accumulated corpus the old posting list is
    a maintained table partitioned by shingle hash; each batch join
    prunes to the buckets the batch actually touches.

    Returns each new document's BEST match: (new_id, match_id,
    common, jac_permille), highest Jaccard wins, smallest match_id on
    ties; new docs with no match ≥ ``min_permille`` are absent (they
    are the novel content that survives ingest).
    """
    sh_old = _shingled(old, id_col, text_col, n)
    sh_new = _shingled(new, id_col, text_col, n)

    def postings(sh_df, alias):
        # shingles are already xxhash64 longs (see _shingled)
        return sh_df.select(
            F.col(id_col).alias(alias), F.explode("shingles").alias("sh")
        )

    po = postings(sh_old, "match_id")
    pn = postings(sh_new, "new_id")
    sz_old = sh_old.select(
        F.col(id_col).alias("match_id"), F.size("shingles").alias("sz_o")
    ).filter(F.col("sz_o") > 0)
    sz_new = sh_new.select(
        F.col(id_col).alias("new_id"), F.size("shingles").alias("sz_n")
    ).filter(F.col("sz_n") > 0)
    common = (
        pn.join(po, "sh")
        .groupBy("new_id", "match_id")
        .agg(F.count(F.lit(1)).alias("common"))
    )
    # sz_new is BATCH-sized → broadcast; sz_old is CORPUS-sized → plain
    # equi-join (AQE broadcasts it at small scale; at 100 TB it must
    # shuffle-join against the match list, which is candidate-sized)
    scored = (
        common.join(F.broadcast(sz_new), "new_id")
        .join(sz_old, "match_id")
        .withColumn(
            "jac_permille",
            F.expr("div(1000 * common, sz_n + sz_o - common)").cast("bigint"),
        )
        .filter(F.col("jac_permille") >= min_permille)
    )
    # best match per new doc: argmax-by-struct (max jac, then smallest
    # match id) — partial-aggregated, no ranking window
    best = (
        scored.groupBy("new_id")
        .agg(
            F.max(
                F.struct(
                    F.col("jac_permille"),
                    (-F.col("match_id")).alias("nm"),
                    F.col("common"),
                )
            ).alias("m")
        )
        .select(
            F.col("new_id").cast("bigint"),
            (-F.col("m.nm")).cast("bigint").alias("match_id"),
            F.col("m.common").cast("bigint").alias("common"),
            F.col("m.jac_permille").cast("bigint").alias("jac_permille"),
        )
    )
    return best


def minhash_bands(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    band_size: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Banded MinHash signatures: one row per (id, band_idx, band_sig).

    hash_i(doc) = min over shingles of md5(i || ':' || shingle) —
    deterministic, engine-portable (lexicographic min over hex).
    """
    sig = minhash_signatures(
        df, id_col, text_col, n_hashes=n_hashes, shingle_n=shingle_n
    )
    return _bands_from_sig(sig, id_col, n_hashes=n_hashes, band_size=band_size)


def minhash_signatures(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    shingle_n: int = 3,
) -> DataFrame:
    """Per-doc minhash signature columns (h0..h{n-1}) — the
    constant-size-per-doc sketch the banding, the estimator
    calibration, and candidate generation all share.  Persisted: every
    consumer re-reads the signatures, and without the persist the
    shingle→md5→min pipeline would re-run per consumer.

    The RAW shingle strings stream straight off this text scan into
    the md5 mins and are never materialized or cached (round-8: the
    string-array shingle cache OOM'd the 300× tier during columnar
    batch build; ``_shingled`` now persists hash LONGS, which md5
    signatures can't be built from without losing DuckDB-oracle
    portability — so the signature build pays one extra tokenization
    scan instead of sharing the inflated cache).

    All n_hashes seeds evaluate as SIBLING expressions on each
    exploded shingle row — md5 count is unchanged (n per shingle),
    but the aggregate's input is |shingles| rows instead of the
    n·|shingles| a seed-explode would push through it (the pre-r8
    form).  Values identical: min over the same {md5(i:sh)} set
    either way.

    Round-10 (guide §2.3 narrower types): signatures are 16-byte
    BINARY digests (``unhex(md5(...))``) end-to-end, not 32-char hex
    strings.  Spark's BINARY comparison is unsigned byte-wise
    lexicographic and lowercase hex encoding is order-preserving
    (nibble values 0-15 map to the ascending ASCII run 0-9a-f), so
    ``min(unhex(x)) ≡ unhex(min(x))`` — the argmin shingle, every
    h-column equality class, and every band bucket are IDENTICAL to
    the hex form the DuckDB oracles replay; only the representation
    narrows.  No registered query exposes a signature or band value
    (they are grouped away into ids/counts), so outputs are unchanged.
    What it buys at scale: the corpus-proportional signature cache and
    the banded-join shuffle halve (16 B vs 32 B + string overhead per
    value) — the 3000×-tier `dedup_minhash_lsh` OOM was pinned to
    CachedRDDBuilder building the ~5 GB HEX signature cache on one
    8 GB heap (SCALING.md round-10 addenda)."""
    sh = shingle_explode(df, id_col, text_col, shingle_n)
    return sh.groupBy(id_col).agg(
        *[
            F.min(
                F.unhex(
                    F.md5(F.concat(F.lit(f"{i}:"), F.col("sh")).cast("binary"))
                )
            ).alias(f"h{i}")
            for i in range(n_hashes)
        ]
    ).transform(lambda d: tracked_persist(d, batch_rows=2000))


def _bands_from_sig(
    sig: DataFrame,
    id_col: str,
    *,
    n_hashes: int,
    band_size: int,
) -> DataFrame:
    """Banded signatures from a (persisted) signature frame: one
    constant-width projection per band, unioned.

    ``band_sig`` is a 16-byte BINARY digest over the plain concat of
    the band's fixed-width 16-byte h columns (round-10; h columns are
    binary now).  Fixed-width fields make the separator-less concat
    injective, so two docs share a band_sig iff their h tuples are
    equal — the same bucket partition the hex-and-'|' oracle form
    produces — while the |docs|·n_bands banded-join shuffle carries
    16 B per sig instead of a 32-char string."""
    n_bands = n_hashes // band_size
    bands = []
    for b in range(n_bands):
        cols = [f"h{b * band_size + j}" for j in range(band_size)]
        bands.append(
            sig.select(
                F.col(id_col),
                F.lit(b).alias("band_idx"),
                F.unhex(F.md5(F.concat(*cols))).alias("band_sig"),
            )
        )
    out = bands[0]
    for b in bands[1:]:
        out = out.unionByName(b)
    return out


def lsh_candidate_pairs(
    bands: DataFrame, id_col: str, *, hot_bucket_cap: int | None = None
) -> DataFrame:
    """Self-join banded signatures → candidate pairs + shared-band count.

    ``hot_bucket_cap`` is the skewed-band safety valve (VERDICT r4
    "Next" #8): a band bucket holding m near-identical docs (empty
    pages, boilerplate — the real web-corpus hazard) emits C(m,2)
    pairs, quadratic in the hot bucket, and the equi-join hashes the
    whole bucket into ONE task.  With a cap, buckets larger than it
    switch to STAR emission — every member pairs with the bucket's
    min-id hub only — which preserves the connected components exactly
    (a hot bucket is one clique; a star spans the same component) at
    O(m) edges and no single-task blowup.  Downstream dedup/clustering
    semantics are unchanged; only pairwise enumeration inside mega-
    cliques is elided.  Default None keeps the exact all-pairs
    behavior (the oracle-checked queries; no test corpus has a bucket
    anywhere near a sane cap)."""
    r = bands.select(
        F.col(id_col).alias("rid"), F.col("band_idx"), F.col("band_sig")
    )
    if hot_bucket_cap is None:
        raw = (
            bands.join(r, on=["band_idx", "band_sig"])
            .filter(F.col(id_col) < F.col("rid"))
            .select(F.col(id_col).alias("id_a"), F.col("rid").alias("id_b"))
        )
    else:
        # bucket size + hub via a WINDOW over the exact partitioning the
        # self-join requires (hash by band_idx, band_sig): Spark computes
        # both on the join's own Exchange instead of paying a separate
        # aggregate shuffle + join-back — measured ~9s of serial AQE
        # stage cost inside the composed funnel at sf0.1 (NOTES.md
        # round-6 A/B), and the window is partitioned (never global)
        from pyspark.sql import Window as _W

        w = _W.partitionBy("band_idx", "band_sig")
        tagged = bands.withColumn("_bn", F.count(F.lit(1)).over(w)).withColumn(
            "_hub", F.min(id_col).over(w)
        )
        cold = tagged.filter(F.col("_bn") <= hot_bucket_cap)
        cold_pairs = (
            cold.join(r, on=["band_idx", "band_sig"])
            .filter(F.col(id_col) < F.col("rid"))
            .select(F.col(id_col).alias("id_a"), F.col("rid").alias("id_b"))
        )
        # hub = bucket min id, so id_a < id_b holds by construction
        hot_pairs = tagged.filter(
            (F.col("_bn") > hot_bucket_cap) & (F.col(id_col) != F.col("_hub"))
        ).select(F.col("_hub").alias("id_a"), F.col(id_col).alias("id_b"))
        raw = cold_pairs.unionByName(hot_pairs)
    return (
        raw.groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("shared_bands"))
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("shared_bands").cast("bigint"),
        )
    )


def minhash_verified_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_hashes: int = 8,
    band_size: int = 4,
    shingle_n: int = 3,
    min_permille: int = 300,
) -> DataFrame:
    """Near-dup pairs via LSH candidates + exact-Jaccard verification.

    The 100 TB pair-generation path: ``jaccard_pairs`` joins the full
    shingle posting lists (cost Σ bucket² over every shingle bucket in
    the corpus), while this generates candidates from constant-size
    banded minhash signatures — the shuffle is |docs|·n_bands rows of
    (id, 16-byte band-sig) regardless of document length — and then
    computes exact Jaccard ONLY for colliding pairs by intersecting the
    two candidates' shingle arrays (array_intersect, no posting-list
    join).  Verification cost is linear in the candidate count, which
    at any scale tracks the true duplicate count, not N².

    Recall < 1 by LSH design: a pair is emitted only if it shares a
    band AND verified Jaccard ≥ ``min_permille``.  Precision is exact —
    verification eliminates every false-positive collision.

    Output: (id_a, id_b, common, jac_permille) — the same schema as
    ``jaccard_pairs``, so downstream clustering is drop-in.

    ``id_col`` must be integral: candidate pairs come back from
    ``lsh_candidate_pairs`` as BIGINT, and joining those back to a
    string/decimal id column would silently coerce (dropping or
    mismatching pairs).  Asserted here rather than discovered as an
    empty result (ADVICE r2).
    """
    id_type = df.schema[id_col].dataType.typeName()
    if id_type not in {"byte", "short", "integer", "long"}:
        raise TypeError(
            f"minhash_verified_pairs requires an integral id column; "
            f"{id_col!r} is {id_type} — hash or index it to BIGINT first"
        )
    shingled = _shingled_with_sig(
        df, id_col, text_col, shingle_n, n_hashes=n_hashes
    )
    bands = _bands_from_sig(shingled, id_col, n_hashes=n_hashes, band_size=band_size)
    cand = lsh_candidate_pairs(bands, id_col).select("id_a", "id_b")
    # Verification joins: candidates ≪ corpus, so hand both joins to
    # AQE (the persisted shingled side carries accurate stats); each is
    # a plain equi-join on the doc id — no shuffle of non-candidate
    # documents' arrays survives the join pruning at scale.  The
    # intersect runs on the persisted HASH-long arrays (identity-exact
    # under the documented birthday bound).
    a = shingled.select(
        F.col(id_col).alias("id_a"), F.col("shingles").alias("sh_a")
    )
    b = shingled.select(
        F.col(id_col).alias("id_b"), F.col("shingles").alias("sh_b")
    )
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .withColumn("common", F.size(F.array_intersect("sh_a", "sh_b")))
        .withColumn(
            "jac_permille",
            F.expr(
                "div(1000 * common, size(sh_a) + size(sh_b) - common)"
            ).cast("bigint"),
        )
        .filter(F.col("jac_permille") >= min_permille)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("common").cast("bigint").alias("common"),
            "jac_permille",
        )
    )


_HEX = "0123456789abcdef"


def _simhash64_blocks(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """64-bit SimHash as FOUR 16-bit integer blocks per document.

    Production-width variant of ``simhash16``: bit i (0..63) votes with
    the i-th bit of md5(token), +1 when set, −1 when clear, weighted by
    token multiplicity; the fingerprint bit is 1 iff the vote sum is
    positive.  Bits are packed big-endian into blocks b0..b3 (bit p of
    block b has weight 2^(15−p)), keeping every value ≤ 65535 so both
    engines stay in exact BIGINT arithmetic — no 64-bit sign hazards.

    One explode + ONE map-side-combined aggregate keyed by the doc id
    computes all 64 vote sums in a single pass (wide agg beats a
    (doc, bit) explode: no 64× row blow-up through the shuffle).
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), TOKEN_RE)).alias("tok")
    )
    # bind the 16 nibble VALUES as a projection before the aggregate:
    # the 64 vote expressions below each need one bit of one nibble, and
    # aggregate input expressions don't get subexpression elimination —
    # inlining the locate(substr(...)) in every vote ran the string
    # decode 64× per token row instead of 16× (measured ~25% of the
    # query at sf0.1)
    hashed = toks.select(id_col, F.md5(F.col("tok").cast("binary")).alias("h"))
    nibs = hashed.select(
        F.col(id_col),
        *[
            F.expr(f"locate(substr(h, {j}, 1), '{_HEX}') - 1").alias(f"n{j}")
            for j in range(1, 17)
        ],
    )

    def vote(b: int, p: int):
        j = 4 * b + p // 4 + 1  # 1-based hex nibble position
        k = p % 4  # bit within nibble, 0 = MSB
        return F.expr(
            f"CASE WHEN (n{j} div {2 ** (3 - k)}) % 2 = 1 THEN 1 ELSE -1 END"
        )

    votes = nibs.groupBy(id_col).agg(
        *[
            F.sum(vote(b, p)).alias(f"s_{b}_{p}")
            for b in range(4)
            for p in range(16)
        ]
    )
    blocks = [
        sum(
            [
                F.when(F.col(f"s_{b}_{p}") > 0, F.lit(2 ** (15 - p))).otherwise(F.lit(0))
                for p in range(16)
            ],
            F.lit(0),
        )
        .cast("bigint")
        .alias(f"b{b}")
        for b in range(4)
    ]
    return votes.select(F.col(id_col), *blocks)


def simhash_hamming_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    max_hamming: int = 3,
) -> DataFrame:
    """Near-dup pairs by 64-bit SimHash Hamming distance ≤ ``max_hamming``
    (≤ 3), found WITHOUT an all-pairs scan — Manku, Jain & Das Sarma's
    pigeonhole scheme (WWW 2007): split the fingerprint into 4 blocks;
    any pair within Hamming 3 must agree EXACTLY on ≥ 1 block, so
    candidates come from four equality self-joins (one per block), then
    exact Hamming verification via bit_count(xor) on the 4 block ints.

    At 100 TB: the candidate join shuffles (block_idx, 16-bit value,
    id) — constant bytes per doc — and each block-bucket is a near-dup
    cluster's size, not corpus size; verification touches candidates
    only.  Output: (id_a, id_b, hamming).
    """
    if max_hamming > 3:
        raise ValueError("4-block pigeonhole guarantees recall only for hamming <= 3")
    sig = _simhash64_blocks(df, id_col, text_col).transform(tracked_persist)
    blk = sig.select(
        F.col(id_col),
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("blk_idx"), F.col(f"b{b}").alias("blk_val"))
                for b in range(4)
            ])
        ).alias("e"),
    ).select(id_col, "e.blk_idx", "e.blk_val")
    r = blk.select(
        F.col(id_col).alias("rid"), F.col("blk_idx"), F.col("blk_val")
    )
    cand = (
        blk.join(r, on=["blk_idx", "blk_val"])
        .filter(F.col(id_col) < F.col("rid"))
        .select(F.col(id_col).alias("id_a"), F.col("rid").alias("id_b"))
        .distinct()
    )
    a = sig.select(
        F.col(id_col).alias("id_a"), *[F.col(f"b{b}").alias(f"a{b}") for b in range(4)]
    )
    b_ = sig.select(
        F.col(id_col).alias("id_b"), *[F.col(f"b{b}").alias(f"c{b}") for b in range(4)]
    )
    ham = sum(
        [F.expr(f"bit_count(a{b} ^ c{b})").cast("bigint") for b in range(4)],
        F.lit(0).cast("bigint"),
    )
    return (
        cand.join(a, "id_a")
        .join(b_, "id_b")
        .withColumn("hamming", ham)
        .filter(F.col("hamming") <= max_hamming)
        .select(
            F.col("id_a").cast("bigint"),
            F.col("id_b").cast("bigint"),
            F.col("hamming"),
        )
    )


def simhash16(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """16-bit SimHash: bit i = sign of Σ_tokens vote(md5(token)[i]).

    vote = +1 when hex nibble i of the token digest has its top bit set
    ('8'..'f'), else −1; token multiplicity weights the vote.  Fully
    SQL-exact in both engines.  Output: (id, simhash16 string of '0'/'1').
    """
    toks = df.select(
        F.col(id_col), F.explode(F.split(F.col(text_col), TOKEN_RE)).alias("tok")
    )
    hashed = toks.select(id_col, F.md5(F.col("tok").cast("binary")).alias("h"))
    votes = hashed.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(
                    F.substring("h", i + 1, 1).isin(*"89abcdef"), F.lit(1)
                ).otherwise(F.lit(-1))
            ).alias(f"s{i}")
            for i in range(16)
        ]
    )
    fp = F.concat(
        *[F.when(F.col(f"s{i}") > 0, F.lit("1")).otherwise(F.lit("0")) for i in range(16)]
    )
    return votes.select(F.col(id_col).cast("bigint"), fp.alias("simhash16"))
