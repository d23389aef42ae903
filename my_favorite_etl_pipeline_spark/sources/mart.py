"""Atomic mart persistence — manifest-committed parquet versions (M4).

The reference gets transactional visibility from a single PostgreSQL
``conn.commit()`` covering insert+upsert+delete (dag:322). Plain parquet
overwrite has no such point of atomicity: a crash mid-overwrite leaves a
half-written table. This module supplies the minimal table-format core that
Delta/Iceberg build on — write-new-version-then-swap-one-pointer:

1. the merged mart lands in a FRESH directory ``data/<version>/`` (never
   touching the live one);
2. a manifest file naming that directory is written aside and moved into
   place with ``os.replace`` — one atomic POSIX rename *is* the commit;
3. superseded version directories are garbage-collected only after the
   swap (and a crash between 2 and 3 merely leaks a directory for the next
   ``vacuum`` — readers are unaffected).

A reader resolves the manifest first, so at every instant it sees exactly
one fully-written version: before the rename the old one, after it the new
one. Re-running a crashed batch is safe at every cut point — the data dir
is keyed by run id, so the retry overwrites the orphan and commits.

At 100 TB the same pattern holds with two adjustments: the rename must be
on a filesystem with atomic rename (HDFS/ABFS yes; S3 needs a
pointer-object PUT, which is equally atomic), and vacuum runs asynchronously.
Production deployments should prefer Delta/Iceberg, which add concurrent
writers and snapshot history on top of exactly this commit protocol
(delta-spark is absent in this container — verified ModuleNotFoundError).
"""

from __future__ import annotations

import os
import shutil
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession

MANIFEST = "_MANIFEST"
HISTORY = "_HISTORY"
DATA_DIR = "data"


class VersionedMart:
    """A parquet table whose visible version is one atomic pointer swap.

    ``_HISTORY`` records the committed-version sequence (rewritten
    atomically on each commit), which buys the two snapshot features the
    lakehouse formats layer on this protocol: ``read(version=...)`` time
    travel over retained versions and ``vacuum(keep=N)`` retention.
    Single-writer by design — concurrent writers need the real formats.
    """

    def __init__(self, root: str) -> None:
        self.root = Path(root)

    # -- commit protocol ----------------------------------------------------

    def _write_version(self, df: DataFrame, version: str) -> Path:
        """Step 1 — materialize a version directory. NOT yet visible."""
        target = self.root / DATA_DIR / version
        df.write.mode("overwrite").parquet(str(target))
        return target

    def _swap_manifest(self, version: str) -> None:
        """Step 2 — THE commit: one atomic rename of the pointer file."""
        tmp = self.root / f"{MANIFEST}.tmp"
        tmp.write_text(version + "\n")
        os.replace(tmp, self.root / MANIFEST)

    def _append_history(self, version: str) -> None:
        """Step 2b — record the commit order (atomic whole-file rewrite;
        a crash before this leaves the version readable but unlisted, and
        the next commit of the same version repairs the log — advisory
        metadata, never the source of visibility truth)."""
        entries = [v for v in self.history() if v != version] + [version]
        tmp = self.root / f"{HISTORY}.tmp"
        tmp.write_text("".join(e + "\n" for e in entries))
        os.replace(tmp, self.root / HISTORY)

    def commit(self, df: DataFrame, version: str, vacuum: bool = True, keep: int = 1) -> str:
        """Write ``df`` as ``version`` and atomically make it current.

        Idempotent per version: a retry after any crash point rewrites the
        same directory and swaps again. ``keep`` retains that many latest
        committed versions through the post-commit vacuum (keep > 1
        enables :meth:`read` time travel). Returns the committed version.
        """
        self._write_version(df, version)
        self._swap_manifest(version)
        self._append_history(version)
        if vacuum:
            self.vacuum(keep=keep)
        return version

    # -- read side ----------------------------------------------------------

    def current_version(self) -> str | None:
        mf = self.root / MANIFEST
        if not mf.exists():
            return None
        return mf.read_text().strip() or None

    def history(self) -> list[str]:
        """Committed versions, oldest first (advisory log)."""
        hf = self.root / HISTORY
        if not hf.exists():
            return []
        return [v for v in hf.read_text().splitlines() if v]

    def available_versions(self) -> list[str]:
        """History entries whose data directories survived vacuum."""
        return [v for v in self.history() if (self.root / DATA_DIR / v).exists()]

    def read(self, spark: SparkSession, version: str | None = None) -> DataFrame:
        """Read the current version, or time-travel to a retained one."""
        version = version or self.current_version()
        if version is None:
            raise FileNotFoundError(f"no committed version under {self.root}")
        target = self.root / DATA_DIR / version
        if not target.exists():
            raise FileNotFoundError(
                f"version {version!r} not available (vacuumed or never "
                f"committed); retained: {self.available_versions()}"
            )
        return spark.read.parquet(str(target))

    # -- maintenance --------------------------------------------------------

    def vacuum(self, keep: int = 1) -> list[str]:
        """Step 3 — drop version dirs beyond the ``keep`` latest committed
        (the manifest's current version is always retained).

        Safe at any time: the referenced version is never touched, and a
        concurrent reader that already resolved the manifest holds the
        current version by definition. Orphan dirs from crashed
        pre-commit writes are reclaimed too (they are absent from the
        history, so they never count toward ``keep``).
        """
        current = self.current_version()
        retained = set(self.history()[-max(keep, 1):])
        if current:
            retained.add(current)
        removed = []
        data = self.root / DATA_DIR
        if not data.exists():
            return removed
        for d in data.iterdir():
            if d.is_dir() and d.name not in retained:
                shutil.rmtree(d)
                removed.append(d.name)
        return removed
