"""Custom stateful streaming operator: cross-batch exact dedup.

``applyInPandasWithState`` is Spark's surface for operators the
built-in streaming library lacks (SURVEY-class engines expose this as
"custom stateful operators").  This one keeps, per key group, the set
of ids already emitted and drops re-occurrences across micro-batches —
the streaming twin of ``operators.dedup.exact_dedup_groups`` and the
first stage of any streaming training-data ingest.

State design for scale: state is per *group*, partitioned by the
grouping key across executors; memory is bounded by ids-per-key.  For
unbounded id spaces swap the exact set for a Bloom filter in the same
state slot (same operator shape, bounded memory, tunable false-drop
rate).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

__all__ = [
    "stateful_dedup",
    "stateful_dedup_bloom",
    "stateful_sessionize",
    "stateful_signature_dedup",
    "stateful_bottomk_quantiles",
]


def stateful_dedup(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    id_col: str = "event_id",
) -> DataFrame:
    """Drop rows whose ``id_col`` was already seen within their
    ``key_col`` group, across all prior micro-batches (checkpointed)."""
    out_schema = stream.schema
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.LongType()), True)]
    )

    def dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[int] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            fresh = pdf[~pdf[id_col].isin(seen)].drop_duplicates(subset=[id_col])
            if len(fresh):
                seen.update(int(x) for x in fresh[id_col])
                yield fresh
        state.update((sorted(seen),))

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_dedup_bloom(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    id_col: str = "event_id",
    m_bits: int = 1 << 16,
    k_hashes: int = 4,
) -> DataFrame:
    """Bounded-memory variant of :func:`stateful_dedup`: per-group state
    is a Bloom filter (``m_bits`` bits, ``k_hashes`` md5-derived
    probes) instead of an exact id set.

    Trade-off: state is O(m_bits) per key REGARDLESS of stream length —
    the unbounded-id-space design point — at the cost of a tunable
    false-positive rate (a colliding NEW id is wrongly dropped; never
    the reverse).  With m=65536, k=4 and ~2k ids/key, fp ≈ 3e-6.
    """
    import hashlib

    out_schema = stream.schema
    state_schema = T.StructType([T.StructField("bloom", T.BinaryType(), True)])
    n_bytes = m_bits // 8

    def probes(value: int) -> list[int]:
        digest = hashlib.md5(str(value).encode()).digest()
        return [
            int.from_bytes(digest[i * 4 : i * 4 + 4], "big") % m_bits
            for i in range(k_hashes)
        ]

    def dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        bloom = bytearray(state.get[0]) if state.exists else bytearray(n_bytes)

        def seen(v: int) -> bool:
            return all(bloom[p // 8] & (1 << (p % 8)) for p in probes(v))

        def add(v: int) -> None:
            for p in probes(v):
                bloom[p // 8] |= 1 << (p % 8)

        for pdf in pdfs:
            mask = []
            for v in pdf[id_col]:
                v = int(v)
                if seen(v):
                    mask.append(False)
                else:
                    add(v)
                    mask.append(True)
            fresh = pdf[pd.Series(mask, index=pdf.index)]
            if len(fresh):
                yield fresh
        state.update((bytes(bloom),))

    return stream.groupBy(key_col).applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sessionize(
    stream: DataFrame,
    *,
    key_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
    gap_seconds: int = 1800,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Inactivity-gap sessionization with TIMEOUT-driven emission — the
    custom stateful operator shape the dedup ops above don't exercise:
    output rows are produced when the watermark passes a group's
    deadline, not when input arrives.

    Per key, state carries the open session (start, last event ts,
    count, value sum).  Each batch folds its events in event-time order:
    an event within ``gap_seconds`` of the last extends the session; a
    later one CLOSES the current session (emitted immediately) and opens
    a new one.  After folding, the group's event-time timeout is set to
    ``last_ts + gap``; when the watermark crosses it with no new events,
    the timed-out callback emits the final open session and clears
    state.

    Scale: state is one fixed-size tuple per ACTIVE key (closed sessions
    leave state immediately), partitioned by key across executors; the
    watermark bounds how long a silent key stays resident.  This is the
    streaming twin of the batch window-gap sessionization in
    ``queries_analytics.events_sessionization``.
    """
    out_schema = T.StructType(
        [
            T.StructField("key", T.LongType()),
            T.StructField("session_start_us", T.LongType()),
            T.StructField("session_end_us", T.LongType()),
            T.StructField("n_events", T.LongType()),
            T.StructField("total_value", T.DoubleType()),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("start_us", T.LongType()),
            T.StructField("last_us", T.LongType()),
            T.StructField("n", T.LongType()),
            T.StructField("total", T.DoubleType()),
        ]
    )
    gap_us = gap_seconds * 1_000_000

    def sessionize_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        def session_row(start, last, n, total) -> pd.DataFrame:
            return pd.DataFrame(
                {
                    "key": [int(key[0])],
                    "session_start_us": [int(start)],
                    "session_end_us": [int(last)],
                    "n_events": [int(n)],
                    "total_value": [float(total)],
                }
            )

        if state.hasTimedOut:
            start, last, n, total = state.get
            state.remove()
            yield session_row(start, last, n, total)
            return

        start, last, n, total = state.get if state.exists else (None, 0, 0, 0.0)
        events = []
        for pdf in pdfs:
            for _, row in pdf.iterrows():
                ts_us = int(row[ts_col].value // 1_000)  # pandas Timestamp → µs
                events.append((ts_us, float(row[value_col])))
        events.sort()
        for ts_us, val in events:
            if start is None:
                start, last, n, total = ts_us, ts_us, 1, val
            elif ts_us - last <= gap_us:
                last, n, total = max(last, ts_us), n + 1, total + val
            else:
                yield session_row(start, last, n, total)
                start, last, n, total = ts_us, ts_us, 1, val
        if start is not None:
            state.update((start, last, n, total))
            state.setTimeoutTimestamp((last + gap_us) // 1_000)  # µs → ms

    # EventTimeTimeout requires a watermark on the input; deadlines fire
    # when the watermark (not wall-clock) crosses them, so late data
    # within the watermark still extends its session.
    return (
        stream.withWatermark(ts_col, watermark)
        .groupBy(key_col)
        .applyInPandasWithState(
            sessionize_group,
            outputStructType=out_schema,
            stateStructType=state_schema,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stateful_signature_dedup(
    stream: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_hashes: int = 8,
) -> DataFrame:
    """Streaming CONTENT dedup: drop documents whose minhash signature
    was already seen, across micro-batches — the re-crawl case (same
    article under a new id/URL) that id-keyed ``stateful_dedup`` cannot
    catch.

    The batch minhash (``operators.dedup.minhash_bands``) computes
    signatures with explode + groupBy for shuffle economy; streaming
    needs a ROW-LOCAL form, so each hash is an ``array_min`` over a
    ``transform`` of the row's shingle array — no shuffle before the
    stateful operator.  Signature equality means Jaccard ≈ 1 (catches
    exact dups deterministically; a near-dup at similarity j collides
    with probability j^n_hashes), so this is the cheap first gate in a
    streaming ingest, ahead of batch LSH clustering.

    Docs too short to shingle (< 3 tokens, NULL signature) pass through
    unconditionally — they must not dedup against each other.  State is
    one signature set per shard group (16 shards via the signature's
    first hex char), bounded by distinct content volume; swap in the
    Bloom pattern of ``stateful_dedup_bloom`` for unbounded streams.
    """
    from pyspark.sql import functions as F

    from ..operators.dedup import shingles_from_tokens
    from ..operators.text import TOKEN_RE

    # bind tokens/shingles as real columns before the minhash lambdas:
    # Spark does no CSE through higher-order functions, so an inlined
    # word_shingles(split(text)) re-runs tokenization once per hash
    # (the round-4 shingle_explode lesson, applied to the stream side)
    enriched = stream.withColumn(
        "_toks", F.split(F.col(text_col), TOKEN_RE)
    ).withColumn("_shingles", shingles_from_tokens(F.col("_toks"), 3))
    shingles = F.col("_shingles")

    # CAUTION: the seed must be captured via a real closure, never a
    # default-arg lambda (``lambda s, i=i``): a 2-parameter callable is
    # treated by F.transform as a (value, index) lambda, so ``i`` would
    # be SHADOWED by the generated index column and the salt literal
    # would embed that column object's repr — whose auto-generated name
    # differs per plan construction, silently changing every signature
    # between queries (state lookups then never match).
    def _minhash(seed: int):
        return F.array_min(
            F.transform(
                shingles,
                lambda s: F.md5(F.concat(F.lit(f"{seed}:"), s).cast("binary")),
            )
        )

    hashes = [_minhash(i) for i in range(n_hashes)]
    sig = F.when(
        F.size(shingles) > 0,
        F.md5(F.concat_ws("|", *hashes).cast("binary")),
    )
    # drop the helper arrays once _sig is computed — they must not ride
    # the groupBy exchange or the Arrow batches into the pandas state
    # operator (review: together ~3× the text payload per row)
    tagged = (
        enriched.withColumn("_sig", sig)
        .withColumn("_shard", F.coalesce(F.substring("_sig", 1, 1), F.lit("_")))
        .drop("_toks", "_shingles")
    )
    out_schema = stream.schema
    state_schema = T.StructType(
        [T.StructField("seen", T.ArrayType(T.StringType()), True)]
    )
    passthrough = [f.name for f in stream.schema]

    def dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        seen: set[str] = set(state.get[0]) if state.exists else set()
        for pdf in pdfs:
            nosig = pdf["_sig"].isna()
            fresh = pdf[nosig | (~pdf["_sig"].isin(seen) & ~pdf["_sig"].duplicated())]
            if len(fresh):
                seen.update(s for s in fresh["_sig"] if isinstance(s, str))
                yield fresh[passthrough]
        state.update((sorted(seen),))

    return tagged.groupBy("_shard").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_embedding_dedup(
    stream: DataFrame,
    *,
    vec_col: str = "embedding",
    threshold: float = 0.9,
    bits: int = 4,
    max_per_bucket: int = 256,
) -> DataFrame:
    """Streaming SEMANTIC dedup: drop incoming vectors whose cosine to
    any previously-kept vector in the same sign-LSH bucket reaches
    ``threshold`` — the streaming counterpart of
    ``dedup_semantic_semdedup`` (embedding near-dups arriving from a
    live ingest, e.g. re-encoded re-crawls).

    The bucket (``operators.similarity.sign_bucket``) is row-local, so
    nothing shuffles before the stateful operator; state per bucket is
    the NORMALIZED kept vectors, capped at ``max_per_bucket`` most
    recent (a bucket that diverse is past the point where pairwise
    state helps — the batch SemDeDup pass owns the long tail).  As with
    sign-LSH generally, recall < 1 by design: near-dups straddling a
    coordinate hyperplane land in different buckets and pass; exact
    re-encodes always collide.  Within a micro-batch, later rows dedup
    against earlier kept rows of the same batch (sequential scan per
    bucket, numpy-vectorized against the kept matrix)."""
    import numpy as np

    from ..operators.similarity import sign_bucket

    tagged = stream.withColumn("_bkt", sign_bucket(vec_col, bits))
    out_schema = stream.schema
    state_schema = T.StructType(
        [T.StructField("vecs", T.ArrayType(T.ArrayType(T.DoubleType())), True)]
    )
    passthrough = [f.name for f in stream.schema]

    def dedup_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        kept: list = [np.asarray(v, dtype=float) for v in (state.get[0] or [])] if state.exists else []
        for pdf in pdfs:
            keep_idx = []
            for idx in pdf.index:
                v = np.asarray(pdf.at[idx, vec_col], dtype=float)
                n = float(np.linalg.norm(v))
                if n == 0.0:
                    keep_idx.append(idx)  # zero vectors never dedup
                    continue
                u = v / n
                if kept and float(np.max(np.stack(kept) @ u)) >= threshold:
                    continue
                kept.append(u)
                keep_idx.append(idx)
            if keep_idx:
                yield pdf.loc[keep_idx, passthrough]
        state.update(([k.tolist() for k in kept[-max_per_bucket:]],))

    return tagged.groupBy("_bkt").applyInPandasWithState(
        dedup_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_bottomk_quantiles(
    stream: DataFrame,
    *,
    key_col: str = "flag",
    value_col: str = "cents",
    hash_col: str = "h",
    k: int = 256,
) -> DataFrame:
    """Streaming bottom-k-by-hash quantile sketch — the incremental
    twin of the batch ``quantile_sketch_bottomk`` query: per key group
    the state holds the k rows with the smallest content hash seen so
    far (plus the exact running row count); every micro-batch that
    touches a group re-emits its updated p50/p90/p99 estimate.

    The bottom-k set is a TRUE mergeable sketch (bottom-k(A∪B) ==
    bottom-k(bottom-k(A)∪B)), so folding each micro-batch into the
    state IS the sketch merge — the streaming result after any number
    of batches equals the batch sketch over the full history, which is
    exactly what the companion test asserts.  State is O(k) per group
    regardless of stream length; the quantile read-off uses the same
    rank rule as the batch query (max value at sample positions
    100·vr < q·ns + 100) so both engines/paths agree row-for-row."""
    out_schema = T.StructType(
        [
            T.StructField(key_col, T.StringType(), False),
            T.StructField("n_rows", T.LongType(), True),
            T.StructField("n_sample", T.LongType(), True),
            T.StructField("est_p50", T.LongType(), True),
            T.StructField("est_p90", T.LongType(), True),
            T.StructField("est_p99", T.LongType(), True),
        ]
    )
    state_schema = T.StructType(
        [
            T.StructField("hs", T.ArrayType(T.StringType()), True),
            T.StructField("vs", T.ArrayType(T.LongType()), True),
            T.StructField("n_rows", T.LongType(), True),
        ]
    )

    def sketch_group(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if state.exists:
            hs, vs, n_rows = list(state.get[0]), list(state.get[1]), state.get[2]
        else:
            hs, vs, n_rows = [], [], 0
        for pdf in pdfs:
            n_rows += len(pdf)
            hs.extend(pdf[hash_col].astype(str))
            vs.extend(int(x) for x in pdf[value_col])
            if len(hs) > k:
                order = sorted(range(len(hs)), key=lambda i: hs[i])[:k]
                hs = [hs[i] for i in order]
                vs = [vs[i] for i in order]
        order = sorted(range(len(hs)), key=lambda i: hs[i])[:k]
        hs = [hs[i] for i in order]
        vs = [vs[i] for i in order]
        state.update((hs, vs, n_rows))

        sample = sorted(vs)
        ns = len(sample)

        def est(q: int) -> int:
            picks = [sample[vr - 1] for vr in range(1, ns + 1) if 100 * vr < q * ns + 100]
            return max(picks)

        yield pd.DataFrame(
            {
                key_col: [key[0]],
                "n_rows": [n_rows],
                "n_sample": [ns],
                "est_p50": [est(50)],
                "est_p90": [est(90)],
                "est_p99": [est(99)],
            }
        )

    return stream.groupBy(key_col).applyInPandasWithState(
        sketch_group,
        outputStructType=out_schema,
        stateStructType=state_schema,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
