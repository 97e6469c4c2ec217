"""Index staleness / health monitoring (VERDICT r12 "Next round" #6).

The maintenance matrix (``update_bm25_index`` / ``bm25_update_sink``,
``staged_append_ivf_index`` / ``ivf_update_sink``) WRITES indexes but
nothing watched them: segment/append accretion (the compaction trigger),
tombstone mass (the rebuild trigger), and version staleness were
invisible until a search slowed down. This module turns each index's
own metadata into DQ-shaped health rows — ``(metric, value, threshold,
ok)``, the ``operators/quality.run_checks`` report shape — cheap enough
to run PER MAINTENANCE COMMIT (sidecar/manifest reads only; the one
parquet touch is a metadata count of the IVF cells, linear in file
footers, not data):

==================  ===========================================
metric              meaning / documented default threshold
==================  ===========================================
version             CURRENT version number (no threshold — informational)
version_age_sec     seconds since the CURRENT version directory's
                    mtime (staleness; threshold ``max_version_age_sec``,
                    default None = informational — wall-clock metrics
                    are excluded from drained≡batch comparisons)
n_segments          BM25: live manifest segment count; IVF: COMPLETE
                    staged append count. Threshold ``max_segments``
                    (default 8) — the compaction / rebuild-fold trigger.
n_delete_sidecars   BM25 only: accreted delete sidecars (compaction
                    folds them; informational, counted into n_segments'
                    pressure story)
tombstone_fraction  deleted rows / live rows. Threshold
                    ``max_tombstone_fraction`` (default 0.2) — the
                    physical-purge (compaction/rebuild) trigger.
==================  ===========================================

``ok`` is NULL-safe: a metric without a threshold is always ok. The
streaming sinks land these rows per commit under
``{health_dir}/_batch_id=N/`` with the same dynamic-partition-overwrite
replay idempotency as every monitor sink; thresholds trip rows to
``ok=false`` — they never raise, because the right reaction (compact,
rebuild, page an operator) belongs to the maintenance policy, not the
monitor.
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession

from egal_yet_another_earthquake_project_spark import fsutil
from egal_yet_another_earthquake_project_spark.llm.ann_index import (
    _complete_appends,
    _read_current,
    _tombstones,
    resolve_index_dir,
)

#: documented default triggers (see module docstring)
DEFAULT_MAX_SEGMENTS = 8
DEFAULT_MAX_TOMBSTONE_FRACTION = 0.2

_HEALTH_SCHEMA = "metric string, value double, threshold double, ok boolean"


def _row(metric: str, value: float | None, threshold: float | None):
    ok = True if threshold is None or value is None else value <= threshold
    return (
        metric,
        None if value is None else float(value),
        None if threshold is None else float(threshold),
        bool(ok),
    )


def _version_age_sec(spark: SparkSession, vroot: str) -> float | None:
    """Best-effort staleness via the version dir's mtime — local
    filesystems only (object stores return None → informational NULL,
    never a failure)."""
    local = fsutil._local_os_path(spark, vroot)
    if local is None or not os.path.exists(local):
        return None
    try:
        return max(0.0, time.time() - os.path.getmtime(local))
    except OSError:
        return None


def bm25_index_health(
    spark: SparkSession,
    index_dir: str,
    max_segments: int = DEFAULT_MAX_SEGMENTS,
    max_tombstone_fraction: float = DEFAULT_MAX_TOMBSTONE_FRACTION,
    max_version_age_sec: float | None = None,
) -> DataFrame:
    """Health rows for a BM25 segment-manifest index — manifest +
    stats-sidecar reads only (no postings scan at any corpus size)."""
    from egal_yet_another_earthquake_project_spark.llm.search_index import (
        _delete_paths,
        _segment_paths,
    )

    cur = _read_current(index_dir)
    if cur is None:
        raise ValueError(f"bm25_index_health: no index under {index_dir}")
    vroot = resolve_index_dir(index_dir)
    segs = _segment_paths(spark, index_dir, vroot)
    dels = _delete_paths(spark, index_dir, vroot)

    def _ndocs(path: str) -> int:
        text = fsutil.read_text(spark, f"{index_dir}/{path}/stats.json")
        return int(json.loads(text)["ndocs"]) if text else 0

    live = sum(_ndocs(p) for p in segs)
    dead = sum(_ndocs(p) for p in dels)
    frac = (dead / live) if live else 0.0
    rows = [
        _row("version", float(cur), None),
        _row("version_age_sec", _version_age_sec(spark, vroot),
             max_version_age_sec),
        _row("n_segments", float(len(segs)), float(max_segments)),
        _row("n_delete_sidecars", float(len(dels)), None),
        _row("tombstone_fraction", frac, float(max_tombstone_fraction)),
    ]
    return spark.createDataFrame(rows, _HEALTH_SCHEMA)


def ivf_index_health(
    spark: SparkSession,
    index_dir: str,
    max_segments: int = DEFAULT_MAX_SEGMENTS,
    max_tombstone_fraction: float = DEFAULT_MAX_TOMBSTONE_FRACTION,
    max_version_age_sec: float | None = None,
) -> DataFrame:
    """Health rows for an IVF/IVF-PQ index. ``n_segments`` counts the
    COMPLETE staged appends (the fold/rebuild pressure); the tombstone
    fraction is the tombstoned id count over the base+append cell rows
    (metadata-level parquet counts)."""
    cur = _read_current(index_dir)
    if cur is None:
        raise ValueError(f"ivf_index_health: no index under {index_dir}")
    root = resolve_index_dir(index_dir)
    appends = _complete_appends(spark, root)
    live = spark.read.parquet(f"{root}/cells").count()
    for name in appends:
        live += spark.read.parquet(f"{root}/appends/{name}/cells").count()
    tombs = _tombstones(spark, root)
    dead = tombs.count() if tombs is not None else 0
    frac = (dead / live) if live else 0.0
    rows = [
        _row("version", float(cur), None),
        _row("version_age_sec", _version_age_sec(spark, root),
             max_version_age_sec),
        _row("n_segments", float(len(appends)), float(max_segments)),
        _row("tombstone_fraction", frac, float(max_tombstone_fraction)),
    ]
    return spark.createDataFrame(rows, _HEALTH_SCHEMA)
