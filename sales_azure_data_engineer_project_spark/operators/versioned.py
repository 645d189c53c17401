"""Versioned table commits — the Delta-transaction-log idea over plain
parquet (no Delta jars in this environment).

Layout:

    table_root/
      v=1/  v=2/  ...      immutable version directories (parquet)
      _VERSION              text file holding the current version number

Writers stage a full new version directory, then flip ``_VERSION`` with
an atomic rename — readers either see the old or the new version, never
a partial write, and historical versions stay readable (time travel).
This replaces the delete-and-swap in ``merge_write_parquet`` with a
protocol that (a) never has a window where the table is missing,
(b) keeps history, (c) maps 1:1 onto what Delta's ``_delta_log`` does
with JSON commits.

Scale note: each MERGE rewrites one new version — same worst case as
Delta compaction; combine with hive-partitioned version dirs to bound
the rewrite to touched partitions.  Vacuuming old versions is the
retention knob.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import DataFrame, SparkSession

from .upsert import merge_upsert

__all__ = ["VersionedTable", "ConcurrentWriteError"]


class ConcurrentWriteError(RuntimeError):
    """Another writer committed between this merge's read and commit."""


class VersionedTable:
    def __init__(self, spark: SparkSession, root: str):
        self.spark = spark
        self.root = root
        os.makedirs(root, exist_ok=True)

    @property
    def _pointer(self) -> str:
        return os.path.join(self.root, "_VERSION")

    def current_version(self) -> int:
        try:
            with open(self._pointer) as f:
                return int(f.read().strip())
        except (FileNotFoundError, ValueError):
            return 0

    def _vdir(self, version: int) -> str:
        return os.path.join(self.root, f"v={version}")

    def read(self, version: int | None = None) -> DataFrame | None:
        """Current snapshot, or time-travel to ``version``."""
        v = self.current_version() if version is None else version
        if v <= 0 or not os.path.isdir(self._vdir(v)):
            return None
        return self.spark.read.parquet(self._vdir(v))

    def _commit(
        self,
        df: DataFrame,
        *,
        base_version: int | None = None,
        stats_columns: list[str] | None = None,
        zorder: list[str] | None = None,
    ) -> int:
        """Commit a new version.  ``base_version`` enables optimistic
        concurrency: if another writer committed since the caller read
        that version, raise instead of silently clobbering their commit
        (Delta's conflict-detection contract).

        The version directory is CLAIMED atomically: the data is staged
        into a private ``._staged_*`` dir and published with one
        ``os.rename`` onto ``v=N`` — rename fails if another writer
        already owns ``v=N``.  A check-then-act scheme (r1: check
        pointer, long parquet write straight into v=N, flip pointer)
        left the whole write duration as a race window in which two
        writers could interleave into the SAME directory; with
        rename-publish the loser's data never becomes visible and it
        gets ConcurrentWriteError instead.  A crashed writer leaves only
        an invisible ``._staged_*`` dir (removed by ``vacuum``)."""
        cur = self.current_version()
        if base_version is not None and cur != base_version:
            raise ConcurrentWriteError(
                f"table advanced to v{cur} since read at v{base_version}; "
                "re-read and retry the merge"
            )
        # claim one PAST any existing v= dir, not just pointer+1: a
        # writer that published v=N but crashed before the pointer flip
        # leaves an orphaned directory, and pointer+1 would collide with
        # it on every retry forever.  Orphans stay invisible (pointer
        # never reached them) and vacuum sweeps them.
        max_dir = max(
            (
                int(name[2:])
                for name in os.listdir(self.root)
                if name.startswith("v=") and name[2:].isdigit()
            ),
            default=0,
        )
        new_v = max(cur, max_dir) + 1
        # z-order plan construction (and its TypeError on non-numeric
        # columns) runs BEFORE the staging dir exists, so a rejected
        # frame can't leak an orphan ._staged_ dir (ADVICE r3)
        if zorder:
            from .skipping import zorder_frame

            df = zorder_frame(df, zorder)
            stats_columns = list(dict.fromkeys([*(stats_columns or []), *zorder]))
        staged = tempfile.mkdtemp(dir=self.root, prefix="._staged_")
        try:
            # Spark refuses to write into an existing dir without
            # overwrite mode; overwrite onto the fresh mkdtemp path is
            # safe — we own it.  Force the statistics-bearing timestamp
            # format even on vanilla sessions: legacy INT96 has no
            # min/max, which would silently turn timestamp manifests
            # into keep-every-file.  The session conf is restored after
            # the write — a commit must not permanently change the
            # write behavior of unrelated code sharing the session
            # (ADVICE r3).
            tt_key = "spark.sql.parquet.outputTimestampType"
            prev_tt = self.spark.conf.get(tt_key, None)
            self.spark.conf.set(tt_key, "TIMESTAMP_MICROS")
            try:
                df.write.mode("overwrite").parquet(staged)
            finally:
                if prev_tt is None:
                    self.spark.conf.unset(tt_key)
                else:
                    self.spark.conf.set(tt_key, prev_tt)
            if stats_columns:
                # footer-only stats for THIS commit's files, written
                # inside the staged dir so the manifest publishes
                # atomically with the data (the Delta add-action
                # payload, O(commit) cost)
                from .skipping import write_manifest

                write_manifest(staged, stats_columns)
        except BaseException:
            import shutil

            shutil.rmtree(staged, ignore_errors=True)
            raise
        try:
            os.rename(staged, self._vdir(new_v))
        except OSError as e:
            import shutil

            shutil.rmtree(staged, ignore_errors=True)
            raise ConcurrentWriteError(
                f"v{new_v} was claimed by a concurrent writer; "
                "re-read and retry the merge"
            ) from e
        # pointer flip is monotonic: never move it backwards if a later
        # commit already advanced it
        fd, tmp = tempfile.mkstemp(dir=self.root, prefix="._VERSION_")
        with os.fdopen(fd, "w") as f:
            f.write(str(new_v))
        if self.current_version() > new_v:
            os.unlink(tmp)
        else:
            os.replace(tmp, self._pointer)
        return new_v

    def overwrite(
        self,
        df: DataFrame,
        *,
        stats_columns: list[str] | None = None,
        zorder: list[str] | None = None,
    ) -> int:
        """Commit a full snapshot.  ``stats_columns`` records per-file
        min/max in a version-local manifest (file-skipping reads via
        ``read_where``); ``zorder`` additionally re-clusters the data on
        the interleaved z-value of those columns first so skipping works
        on every listed column."""
        return self._commit(df, stats_columns=stats_columns, zorder=zorder)

    def read_where(self, col: str, lo, hi, version: int | None = None) -> DataFrame | None:
        """Range scan of a snapshot that opens only the files whose
        manifest min/max overlap [lo, hi] (falls back to a full scan +
        filter when the version has no manifest)."""
        from pyspark.sql import functions as F

        from .skipping import read_manifest, read_pruned

        v = self.current_version() if version is None else version
        if v <= 0 or not os.path.isdir(self._vdir(v)):
            return None
        if read_manifest(self._vdir(v)) is None:
            return self.spark.read.parquet(self._vdir(v)).filter(
                F.col(col).between(lo, hi)
            )
        return read_pruned(self.spark, self._vdir(v), col, lo, hi)

    def merge(self, source: DataFrame, keys: list[str], *, assert_unique: bool = True) -> int:
        """SCD-1 MERGE as a new committed version, with optimistic
        conflict detection against the version the merge read."""
        base = self.current_version()
        target = self.read()
        merged = merge_upsert(target, source, keys, assert_unique=assert_unique)
        return self._commit(merged, base_version=base)

    def diff(self, from_version: int, to_version: int | None = None):
        """Change-data read between two committed versions: what rows
        were added and removed (multiset semantics via exceptAll).
        Returns (added_df, removed_df) — the CDC feed downstream
        incremental consumers (e.g. ``matview.IncrementalSummary``)
        read instead of re-scanning snapshots."""
        older = self.read(from_version)
        newer = self.read(to_version)
        if older is None or newer is None:
            raise ValueError("both versions must exist for a diff")
        return newer.exceptAll(older), older.exceptAll(newer)

    def compact(self, target_partitions: int = 1) -> int:
        """Small-file compaction: rewrite the current snapshot into
        ``target_partitions`` files as a new commit.  The lakehouse
        maintenance op that keeps scan task counts sane after many
        incremental merges (pair with ``vacuum`` for space)."""
        cur = self.read()
        if cur is None:
            return 0
        return self._commit(cur.coalesce(target_partitions))

    def vacuum(self, keep_last: int = 2) -> list[int]:
        """Drop version dirs older than the last ``keep_last``."""
        import shutil

        cur = self.current_version()
        dropped = []
        for name in os.listdir(self.root):
            if name.startswith("v="):
                v = int(name.split("=", 1)[1])
                if v <= cur - keep_last:
                    shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
                    dropped.append(v)
            elif name.startswith("._staged_"):
                # abandoned claim from a crashed writer — never visible
                shutil.rmtree(os.path.join(self.root, name), ignore_errors=True)
        return sorted(dropped)
