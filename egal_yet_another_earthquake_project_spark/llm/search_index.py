"""Persisted BM25 inverted index: build once, search many — the product
form of ``llm.search.bm25_scores_per_query`` (VERDICT r11 ask #4).

The from-scratch scorer re-tokenizes the corpus and rebuilds postings on
EVERY call — at 100 TB each keyword query pays a full corpus scan. A
search stack tokenizes once:

* **build** (once per corpus version): tokenize, compute the
  (doc_id, term, tf) postings with each doc's length ``dl`` denormalized
  inline (search then needs NO corpus-scale lens join), the per-term
  document frequencies, and the global (Σdl, N) statistics; write the
  postings PARTITIONED BY a term hash-bucket — the layout IS the index.
* **search** (per query batch): tokenize the query side, map its terms
  to their buckets (≤ |query terms| values however large the corpus is),
  and scan ONLY those buckets' directories via a STATIC partition filter;
  a broadcast semi-join on the exact terms prunes the rest of the bucket.
  df/stats come from the tiny sidecars — broadcast, never shuffled.

Versioned layout — the same CURRENT/``_COMPLETE`` machinery as
``llm.ann_index`` (its helpers are imported, not re-implemented), so a
reader always resolves one complete (postings, dfreq, stats) triple and
a crash mid-rebuild leaves the live version untouched::

    {index_dir}/CURRENT            "v=N", written LAST via atomic replace
    {index_dir}/v=N/postings/      (doc_id, term, tf, dl) partitioned by
                                   _tb = pmod(xxhash64(term), n_buckets)
    {index_dir}/v=N/dfreq/         (term, df)   — the DF sidecar
    {index_dir}/v=N/stats.json     {"sdl", "ndocs", "n_buckets", "k1", "b"}
    {index_dir}/v=N/_COMPLETE      staged-complete marker

At 100 TB: search-side corpus bytes = the probed buckets' postings (a
|query terms| / n_buckets fraction, further min/max-pruned by the term
semi-join), one candidate-scale shuffle for the per-(query, doc) fold,
zero corpus shuffles. ``n_buckets`` sizes like any hash layout: high
enough that one bucket fits a task, low enough that tiny queries don't
fan out over thousands of directories (√(corpus terms) is a fine rule).

Scores are BIT-IDENTICAL to the from-scratch path: same tokenizer, same
contribution arithmetic, same term-sorted left fold — asserted by the
``bm25_index_topk`` declared query hash-matching ``bm25_per_query``'s
oracle, and by tests/test_search_index.py's staleness/rebuild checks.

**Incremental maintenance (round 12)** — a full rebuild re-tokenizes the
whole corpus; at 100 TB a daily 0.1 % delta must not pay that. The
segment-manifest layout (the Iceberg/Delta snapshot discipline) makes
updates O(delta)::

    {index_dir}/segments/s=K/{postings,dfreq,stats.json,_COMPLETE}
                                   immutable, one per ingest batch —
                                   the SAME file shapes as a monolithic
                                   version dir, so a legacy v=N dir IS
                                   a valid segment a manifest can adopt
    {index_dir}/v=M/manifest.json  {"segments": ["v=1", "segments/s=2"]}
    {index_dir}/v=M/_COMPLETE      then the CURRENT flip — one atomic
                                   pointer commit, crash-anywhere safe

``update_bm25_index`` tokenizes ONLY the new docs into a fresh segment
and stages a manifest-only version referencing old segments + new — the
base postings are never read, copied, or rewritten. Search unions the
segments' bucket-pruned postings; df is summed per term across the
(term-semi-joined, broadcast-scale) dfreq sidecars and Σdl/N across the
stats sidecars — all integer sums, so idf/norm and therefore every score
is bit-identical to a from-scratch build over the union corpus (docs
must not repeat across segments: the caller feeds NEW doc ids, the same
contract as ``append_ivf_index``). ``compact_bm25_index`` folds the
segment list back to one (an index-linear merge, still no re-tokenize)
when small segments accrete — same trade as parquet small-file
compaction. GC keeps {current, predecessor} versions plus every segment
either manifest references, so in-flight readers always finish.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark import fsutil
from egal_yet_another_earthquake_project_spark.sources.files import (
    read_parquet_memo as _pq,
)
from egal_yet_another_earthquake_project_spark.llm import text as ltx
from egal_yet_another_earthquake_project_spark.llm.ann_index import (
    _list_versions,
    _read_current,
    _set_current,
    resolve_index_dir,
)
from egal_yet_another_earthquake_project_spark.llm.search import (
    DEFAULT_B,
    DEFAULT_K1,
    quantized_score_sum,
)

DEFAULT_TERM_BUCKETS = 64


def _term_bucket(term, n_buckets: int):
    return F.pmod(F.xxhash64(term), F.lit(int(n_buckets))).cast("int")


def _write_segment(
    docs: DataFrame,
    root: str,
    id_col: str,
    text_col: str,
    n_buckets: int,
    k1: float,
    b: float,
) -> None:
    """One immutable index segment under ``root``: bucket-partitioned
    postings + dfreq/stats sidecars, ``_COMPLETE`` written LAST. A
    monolithic version dir and a ``segments/s=K`` dir share this exact
    shape, which is what lets a manifest adopt a legacy version as its
    first segment. Cost: one scan of ``docs`` + one (doc, term)
    grouping shuffle + one partitioned write — linear in the input."""
    spark = docs.sparkSession
    tokd = ltx.tokenized(docs, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    lens = tokd.select("doc_id", F.size("_toks").alias("dl"))
    tf = (
        tokd.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
    )
    postings = tf.join(lens, "doc_id").withColumn(
        "_tb", _term_bucket(F.col("term"), n_buckets)
    )
    (
        postings.write.mode("overwrite")
        .partitionBy("_tb")
        .parquet(f"{root}/postings")
    )
    # df over the PERSISTED postings (one row per (doc, term), so a
    # count per term) — tiny relative to the corpus, its own sidecar so
    # search never aggregates corpus-scale data
    (
        _pq(spark, f"{root}/postings")
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .write.mode("overwrite")
        .parquet(f"{root}/dfreq")
    )
    stats = lens.agg(
        F.sum("dl").alias("sdl"), F.count("*").alias("ndocs")
    ).collect()[0]
    fsutil.write_text_overwrite(
        spark,
        f"{root}/stats.json",
        json.dumps(
            {
                "sdl": int(stats["sdl"] or 0),
                "ndocs": int(stats["ndocs"]),
                "n_buckets": int(n_buckets),
                "k1": float(k1),
                "b": float(b),
            }
        )
        + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{root}/_COMPLETE", "complete\n")


def _read_manifest(spark: SparkSession, vroot: str) -> dict | None:
    """The version's segment manifest, or None for a monolithic
    (pre-round-12 / fresh-build) version whose dir is itself the one
    segment."""
    text = fsutil.read_text(spark, f"{vroot}/manifest.json")
    return None if text is None else json.loads(text)


def _segment_paths(spark: SparkSession, index_dir: str, vroot: str) -> list[str]:
    """index_dir-relative segment paths of the version at ``vroot``."""
    manifest = _read_manifest(spark, vroot)
    if manifest is not None:
        return list(manifest["segments"])
    # monolithic version: the version dir is the single segment
    return [vroot[len(index_dir) + 1 :]] if vroot != index_dir else [""]


def _delete_paths(spark: SparkSession, index_dir: str, vroot: str) -> list[str]:
    """index_dir-relative DELETE-segment paths (tombstones + negative
    df/Σdl/N sidecars) of the version at ``vroot``; [] for monolithic
    and pre-delete manifests."""
    manifest = _read_manifest(spark, vroot)
    return list(manifest.get("deletes", [])) if manifest else []


def _gc_index(spark: SparkSession, index_dir: str, keep_versions: set[int]) -> None:
    """Delete versions outside ``keep_versions`` and segments no kept
    manifest references. A legacy monolithic version adopted as a
    segment (manifest entry ``"v=1"``) survives version GC for as long
    as any kept manifest points at it — the reader-grace rule extended
    to shared immutable data."""
    referenced: set[str] = set()
    for v in keep_versions:
        vroot = f"{index_dir}/v={v}"
        manifest = _read_manifest(spark, vroot)
        if manifest is not None:
            referenced.update(manifest["segments"])
            referenced.update(manifest.get("deletes", []))
    for v in _list_versions(index_dir):
        if v not in keep_versions and f"v={v}" not in referenced:
            fsutil.delete(spark, f"{index_dir}/v={v}")
    for name in fsutil.list_names(spark, f"{index_dir}/segments"):
        if (
            name.split("=", 1)[0] in ("s", "d", "b")
            and f"segments/{name}" not in referenced
        ):
            fsutil.delete(spark, f"{index_dir}/segments/{name}")


def build_bm25_index(
    docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    n_buckets: int = DEFAULT_TERM_BUCKETS,
    k1: float = DEFAULT_K1,
    b: float = DEFAULT_B,
) -> None:
    """Tokenize once, persist the inverted index as the next version
    under ``index_dir`` (v=1 for a fresh dir), then flip CURRENT.
    Build cost: one corpus scan + one (doc, term) grouping shuffle +
    one bucket-partitioned write — entirely linear.

    If a live version carries a streaming replay memo
    (``last_applied`` — ADVICE r12 low), the rebuild writes a one-entry
    manifest next to the monolithic segment carrying it forward, so a
    ``bm25_update_sink`` checkpoint that replays its last batch across
    the rebuild stays a no-op instead of re-committing its segment and
    double-counting df (the ``maybe_rebuild_ivf_index`` ``applied.json``
    discipline, BM25 edition)."""
    version = (_list_versions(index_dir) or [0])[-1] + 1
    spark = docs.sparkSession
    prev_manifest: dict = {}
    if _read_current(index_dir) is not None:
        prev_manifest = _read_manifest(spark, resolve_index_dir(index_dir)) or {}
    _write_segment(
        docs, f"{index_dir}/v={version}", id_col, text_col, n_buckets, k1, b
    )
    if "last_applied" in prev_manifest:
        manifest: dict = {
            "segments": [f"v={version}"],
            "deletes": [],
            "last_applied": prev_manifest["last_applied"],
        }
        if "last_applied_rows" in prev_manifest:
            manifest["last_applied_rows"] = prev_manifest["last_applied_rows"]
        fsutil.write_text_overwrite(
            spark,
            f"{index_dir}/v={version}/manifest.json",
            json.dumps(manifest) + "\n",
        )
    _set_current(index_dir, version)
    # GC: keep the new version and its immediate predecessor (grace for
    # in-flight readers that resolved before the pointer flip) — the
    # ann_index rebuild discipline, so repeated rebuilds don't accrete
    # dead postings copies; segments only the dropped versions referenced
    # go with them
    _gc_index(spark, index_dir, {version, version - 1})


def update_bm25_index(
    new_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    segment_name: str | None = None,
    _before_cutover=None,
) -> int:
    """Add a batch of NEW documents to an existing index without a
    rebuild — O(delta): tokenize only ``new_docs`` into a fresh
    immutable segment, then stage a manifest-only version referencing
    the live version's segments plus the new one and flip CURRENT. The
    base postings are never read, copied, or rewritten — this is what
    makes daily ingest into a 100 TB index affordable (the
    ``append_ivf_index`` economics, with the crash discipline upgraded
    to an atomic manifest commit because BM25 updates must also move
    the df/Σdl/N statistics, which an in-place parquet append cannot do
    atomically).

    Index parameters (tokenizer, ``n_buckets``, ``k1``, ``b``) are
    frozen at build and inherited by every segment, so all segments
    bucket terms identically. Docs must not repeat across segments
    (feed new doc ids only — the single-writer ``append_ivf_index``
    contract); a repeated id would double-count df and emit two score
    rows. Crash anywhere before the pointer flip leaves CURRENT — and
    every reader — on the old complete version; the orphaned segment is
    GC'd by the next successful maintenance call. Returns the new
    version number. ``_before_cutover`` is a test seam (where a crash
    or concurrent reader would land).

    ``segment_name`` makes the commit IDEMPOTENT per name (e.g.
    ``b=<micro-batch id>``): if the live manifest already references
    that segment — or records it as ``last_applied``, which survives a
    compaction that folded the segment away — the call is a no-op
    returning the current version: the replay contract streaming
    ``foreachBatch`` maintenance needs (only the LATEST uncommitted
    batch can ever replay, so one remembered name suffices). A replay
    whose previous attempt crashed before the flip simply re-stages the
    same segment (the writes overwrite) and commits."""
    spark = new_docs.sparkSession
    cur = _read_current(index_dir)
    if cur is None:
        raise ValueError(
            f"update_bm25_index: no index under {index_dir} — build first"
        )
    vroot = resolve_index_dir(index_dir)
    cur_manifest = _read_manifest(spark, vroot) or {}
    segs = _segment_paths(spark, index_dir, vroot)
    dels = _delete_paths(spark, index_dir, vroot)
    stats_text = fsutil.read_text(spark, f"{index_dir}/{segs[0]}/stats.json")
    if stats_text is None:
        raise ValueError(f"no stats.json under {index_dir}/{segs[0]}")
    params = json.loads(stats_text)
    if segment_name is not None:
        seg_path = f"segments/{segment_name}"
        if seg_path in segs or cur_manifest.get("last_applied") == segment_name:
            # replayed commit — already applied (maybe compacted). Guard
            # against a NAME COLLISION that is not a replay (ADVICE r12:
            # micro-batch ids restart at 0 for a new query or a reset
            # checkpoint, so a second stream pointed at this index would
            # silently lose its early batches): if the manifest recorded
            # the applied batch's row count and it differs from this
            # batch, this is a different batch wearing the same name.
            recorded = cur_manifest.get("segment_rows", {}).get(seg_path)
            if recorded is None and (
                cur_manifest.get("last_applied") == segment_name
            ):
                recorded = cur_manifest.get("last_applied_rows")
            if recorded is not None and int(recorded) != new_docs.count():
                raise ValueError(
                    f"update_bm25_index: segment {segment_name!r} already "
                    f"applied with {recorded} rows but the incoming batch "
                    "differs — two writers (or a reset checkpoint) are "
                    "sharing batch names; pass a distinct app_id per "
                    "streaming query (bm25_update_sink(app_id=...))"
                )
            return cur
    else:
        seg_ids = [
            int(n.split("=", 1)[1])
            for n in fsutil.list_names(spark, f"{index_dir}/segments")
            if n.startswith("s=") and n.split("=", 1)[1].isdigit()
        ]
        seg_path = f"segments/s={(max(seg_ids) if seg_ids else 0) + 1}"
    _write_segment(
        new_docs,
        f"{index_dir}/{seg_path}",
        id_col,
        text_col,
        int(params["n_buckets"]),
        float(params["k1"]),
        float(params["b"]),
    )
    manifest: dict = {"segments": segs + [seg_path], "deletes": dels}
    seg_rows = {
        k: v
        for k, v in cur_manifest.get("segment_rows", {}).items()
        if k in manifest["segments"]
    }
    if segment_name is not None:
        n_new = new_docs.count()
        manifest["last_applied"] = segment_name
        manifest["last_applied_rows"] = n_new
        seg_rows[seg_path] = n_new
    elif "last_applied" in cur_manifest:
        manifest["last_applied"] = cur_manifest["last_applied"]
        if "last_applied_rows" in cur_manifest:
            manifest["last_applied_rows"] = cur_manifest["last_applied_rows"]
    if seg_rows:
        manifest["segment_rows"] = seg_rows
    next_v = (_list_versions(index_dir) or [0])[-1] + 1
    stage = f"{index_dir}/v={next_v}"
    fsutil.mkdirs(spark, stage)
    fsutil.write_text_overwrite(
        spark,
        f"{stage}/manifest.json",
        json.dumps(manifest) + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{stage}/_COMPLETE", "complete\n")
    if _before_cutover is not None:
        _before_cutover()
    _set_current(index_dir, next_v)
    _gc_index(spark, index_dir, {next_v, cur})
    return next_v


def delete_from_bm25_index(
    deleted_docs: DataFrame,
    index_dir: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    _before_cutover=None,
) -> int:
    """Remove documents from the index WITHOUT touching the postings —
    O(delta), the Lucene live-docs discipline upgraded to exact-stats:
    a DELETE segment carries the tombstoned doc ids plus the deleted
    docs' per-term df and Σdl/N as NEGATIVE sidecars (computed by
    re-tokenizing ``deleted_docs`` — the caller passes the documents
    exactly as they were ingested, id and text). Search anti-joins the
    tombstones out of the postings and integer-subtracts the sidecars,
    so post-delete scores are BIT-identical to a from-scratch build
    over the remaining corpus — not the "df is stale until merge"
    approximation search engines usually accept. The commit is the same
    atomic manifest flip as :func:`update_bm25_index`.

    Contract: each deleted id must be live in exactly one postings
    segment and not already tombstoned (double-deleting would subtract
    its stats twice). Re-adding a previously deleted id requires a
    :func:`compact_bm25_index` first (tombstones apply to ALL segments,
    so a re-add before compaction would be invisible)."""
    spark = deleted_docs.sparkSession
    cur = _read_current(index_dir)
    if cur is None:
        raise ValueError(
            f"delete_from_bm25_index: no index under {index_dir} — build first"
        )
    vroot = resolve_index_dir(index_dir)
    segs = _segment_paths(spark, index_dir, vroot)
    dels = _delete_paths(spark, index_dir, vroot)
    params = json.loads(
        fsutil.read_text(spark, f"{index_dir}/{segs[0]}/stats.json")
    )
    del_ids = [
        int(n.split("=", 1)[1])
        for n in fsutil.list_names(spark, f"{index_dir}/segments")
        if n.startswith("d=") and n.split("=", 1)[1].isdigit()
    ]
    del_path = f"segments/d={(max(del_ids) if del_ids else 0) + 1}"
    droot = f"{index_dir}/{del_path}"

    tokd = ltx.tokenized(deleted_docs, text_col).select(
        F.col(id_col).alias("doc_id"), F.col("_toks")
    )
    tokd.select("doc_id").write.mode("overwrite").parquet(
        f"{droot}/tombstones"
    )
    # the deleted docs' exact (term, df) — same grouping as a postings
    # build, but only df survives (the postings themselves stay in the
    # live segments until compaction physically purges them)
    (
        tokd.select("doc_id", F.explode("_toks").alias("term"))
        .groupBy("doc_id", "term")
        .agg(F.count("*").alias("tf"))
        .groupBy("term")
        .agg(F.count("*").alias("df"))
        .write.mode("overwrite")
        .parquet(f"{droot}/dfreq")
    )
    stats = tokd.select(F.size("_toks").alias("dl")).agg(
        F.sum("dl").alias("sdl"), F.count("*").alias("ndocs")
    ).collect()[0]
    fsutil.write_text_overwrite(
        spark,
        f"{droot}/stats.json",
        json.dumps(
            {"sdl": int(stats["sdl"] or 0), "ndocs": int(stats["ndocs"])}
        )
        + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{droot}/_COMPLETE", "complete\n")

    manifest: dict = {"segments": segs, "deletes": dels + [del_path]}
    prev = _read_manifest(spark, vroot) or {}
    if "last_applied" in prev:
        manifest["last_applied"] = prev["last_applied"]
    if "last_applied_rows" in prev:
        manifest["last_applied_rows"] = prev["last_applied_rows"]
    if prev.get("segment_rows"):
        manifest["segment_rows"] = {
            k: v for k, v in prev["segment_rows"].items() if k in segs
        }
    next_v = (_list_versions(index_dir) or [0])[-1] + 1
    stage = f"{index_dir}/v={next_v}"
    fsutil.mkdirs(spark, stage)
    fsutil.write_text_overwrite(
        spark,
        f"{stage}/manifest.json",
        json.dumps(manifest) + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{stage}/_COMPLETE", "complete\n")
    if _before_cutover is not None:
        _before_cutover()
    _set_current(index_dir, next_v)
    _gc_index(spark, index_dir, {next_v, cur})
    return next_v


def compact_bm25_index(spark: SparkSession, index_dir: str) -> dict:
    """Fold the live version's segments back into ONE (parquet
    small-file compaction, index edition): union the persisted postings
    (no re-tokenize — index-linear, corpus-text-free), re-sum dfreq per
    term and the Σdl/N stats (integer sums: scores are unchanged by
    construction), stage the merged segment + a one-entry manifest,
    flip CURRENT. A no-op on an already-monolithic index. Run it when
    update cadence has accreted enough segments that search-side
    per-segment scan overhead shows (same trigger thinking as
    ``maybe_rebuild_ivf_index``'s imbalance metric — here the metric is
    just ``len(manifest["segments"])``, surfaced in the return)."""
    cur = _read_current(index_dir)
    if cur is None:
        raise ValueError(
            f"compact_bm25_index: no index under {index_dir} — build first"
        )
    vroot = resolve_index_dir(index_dir)
    segs = _segment_paths(spark, index_dir, vroot)
    dels = _delete_paths(spark, index_dir, vroot)
    if len(segs) <= 1 and not dels:
        return {"compacted": False, "segments": len(segs)}
    params = json.loads(
        fsutil.read_text(spark, f"{index_dir}/{segs[0]}/stats.json")
    )
    seg_ids = [
        int(n.split("=", 1)[1])
        for n in fsutil.list_names(spark, f"{index_dir}/segments")
        if n.startswith("s=") and n.split("=", 1)[1].isdigit()
    ]
    next_s = (max(seg_ids) if seg_ids else 0) + 1
    merged = f"{index_dir}/segments/s={next_s}"

    posts = None
    sdl = ndocs = 0
    dfreqs = None
    for s in segs:
        p = _pq(spark, f"{index_dir}/{s}/postings")
        posts = p if posts is None else posts.unionByName(p)
        d = _pq(spark, f"{index_dir}/{s}/dfreq")
        dfreqs = d if dfreqs is None else dfreqs.unionByName(d)
        st = json.loads(fsutil.read_text(spark, f"{index_dir}/{s}/stats.json"))
        sdl += int(st["sdl"])
        ndocs += int(st["ndocs"])
    # apply delete segments PHYSICALLY: tombstoned rows leave the
    # postings, their negative df/Σdl/N sidecars fold into the merged
    # totals — after this the tombstones are dead weight and GC away
    tombs = None
    for dpath in dels:
        t = _pq(spark, f"{index_dir}/{dpath}/tombstones")
        tombs = t if tombs is None else tombs.unionByName(t)
        nd = _pq(spark, f"{index_dir}/{dpath}/dfreq").select(
            "term", (-F.col("df")).alias("df")
        )
        dfreqs = dfreqs.unionByName(nd)
        st = json.loads(
            fsutil.read_text(spark, f"{index_dir}/{dpath}/stats.json")
        )
        sdl -= int(st["sdl"])
        ndocs -= int(st["ndocs"])
    if tombs is not None:
        posts = posts.join(tombs, "doc_id", "anti")
    (
        posts.write.mode("overwrite")
        .partitionBy("_tb")
        .parquet(f"{merged}/postings")
    )
    (
        dfreqs.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
        .write.mode("overwrite")
        .parquet(f"{merged}/dfreq")
    )
    fsutil.write_text_overwrite(
        spark,
        f"{merged}/stats.json",
        json.dumps(
            {
                "sdl": sdl,
                "ndocs": ndocs,
                "n_buckets": int(params["n_buckets"]),
                "k1": float(params["k1"]),
                "b": float(params["b"]),
            }
        )
        + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{merged}/_COMPLETE", "complete\n")
    manifest: dict = {"segments": [f"segments/s={next_s}"], "deletes": []}
    prev = _read_manifest(spark, vroot) or {}
    if "last_applied" in prev:
        manifest["last_applied"] = prev["last_applied"]
    if "last_applied_rows" in prev:
        manifest["last_applied_rows"] = prev["last_applied_rows"]
    next_v = (_list_versions(index_dir) or [0])[-1] + 1
    stage = f"{index_dir}/v={next_v}"
    fsutil.mkdirs(spark, stage)
    fsutil.write_text_overwrite(
        spark,
        f"{stage}/manifest.json",
        json.dumps(manifest) + "\n",
    )
    fsutil.write_text_overwrite(spark, f"{stage}/_COMPLETE", "complete\n")
    _set_current(index_dir, next_v)
    _gc_index(spark, index_dir, {next_v, cur})
    return {"compacted": True, "segments": len(segs), "version": next_v}


def search_bm25_index(
    spark: SparkSession,
    index_dir: str,
    queries: DataFrame,
    query_id_col: str = "query_id",
    query_text_col: str = "qtext",
) -> DataFrame:
    """Per-query BM25 scores for a query batch against the persisted
    index — (query_id, doc_id, score, n_terms), bit-identical to
    ``bm25_scores_per_query`` over the same corpus.

    One CURRENT resolve pins the segment set (and with it every
    postings/dfreq/stats triple). The probed-bucket set is ≤ the query
    batch's distinct terms (collected — bounded by the batch, never the
    corpus) and becomes a STATIC partition filter on EVERY segment's
    postings scan; the exact-term broadcast semi-join prunes within the
    probed buckets map-side. On a segmented (incrementally updated)
    index the per-term df and the global Σdl/N are integer SUMS across
    the segments' sidecars — bit-identical to a from-scratch build over
    the union corpus.
    """
    vroot = resolve_index_dir(index_dir)
    seg_paths = _segment_paths(spark, index_dir, vroot)
    seg_roots = [
        f"{index_dir}/{s}" if s else index_dir for s in seg_paths
    ]
    del_roots = [
        f"{index_dir}/{d}" for d in _delete_paths(spark, index_dir, vroot)
    ]
    sdl = ndocs = 0
    params = None
    for sroot in seg_roots:
        text = fsutil.read_text(spark, f"{sroot}/stats.json")
        if text is None:
            raise ValueError(f"no stats.json under {sroot} — index not built?")
        st = json.loads(text)
        sdl += int(st["sdl"])
        ndocs += int(st["ndocs"])
        params = params or st
    for droot in del_roots:
        st = json.loads(fsutil.read_text(spark, f"{droot}/stats.json"))
        sdl -= int(st["sdl"])
        ndocs -= int(st["ndocs"])
    k1, b = float(params["k1"]), float(params["b"])

    qterms = (
        ltx.tokenized(queries, query_text_col)
        .select(F.col(query_id_col), F.explode("_toks").alias("term"))
        .distinct()
    )
    buckets = sorted(
        {
            r["_tb"]
            for r in qterms.select(
                _term_bucket(F.col("term"), params["n_buckets"]).alias("_tb")
            )
            .distinct()
            .collect()
        }
    )
    bucket_filter = (
        F.col("_tb").isin(buckets) if buckets else F.lit(False)
    )
    # NOTE (r14): batching the per-segment postings scans into one
    # multi-root spark.read.parquet(*roots) was tried and REJECTED —
    # Spark's partition discovery requires all roots at one depth below
    # a common base, and the manifest mixes `v=K/postings` with
    # `segments/s=K/postings` (the version dirs themselves parse as
    # partition columns), so the read fails with
    # CONFLICTING_DIRECTORY_STRUCTURES. The per-segment scans share one
    # memoized schema and the same static bucket filter; the union is
    # plan-side only.
    term_probe = F.broadcast(qterms.select("term").distinct())
    postings = dfreq_all = None
    for sroot in seg_roots:
        p = (
            _pq(spark, f"{sroot}/postings")
            .filter(bucket_filter)
            .join(term_probe, "term", "semi")
        )
        postings = p if postings is None else postings.unionByName(p)
        d = _pq(spark, f"{sroot}/dfreq").join(term_probe, "term", "semi")
        dfreq_all = d if dfreq_all is None else dfreq_all.unionByName(d)
    # delete segments: tombstoned docs leave the candidate postings
    # (anti-join — AQE broadcasts a small tombstone set), their per-term
    # df subtracts, so every surviving score equals the from-scratch
    # build over the remaining corpus
    tombs = None
    for droot in del_roots:
        t = _pq(spark, f"{droot}/tombstones")
        tombs = t if tombs is None else tombs.unionByName(t)
        nd = (
            _pq(spark, f"{droot}/dfreq")
            .join(term_probe, "term", "semi")
            .select("term", (-F.col("df")).alias("df"))
        )
        dfreq_all = dfreq_all.unionByName(nd)
    if tombs is not None:
        postings = postings.join(tombs, "doc_id", "anti")
    dfreq = (
        dfreq_all.groupBy("term")
        .agg(F.sum("df").alias("df"))
        .filter(F.col("df") > 0)
    )
    scored = postings.join(F.broadcast(dfreq), "term")
    idf = F.log(
        (F.lit(ndocs) - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
    )
    norm_len = (
        F.col("dl").cast("double") * F.lit(ndocs) / F.lit(sdl)
    )
    denom = F.col("tf") + k1 * (1.0 - b + b * norm_len)
    contrib = idf * (F.col("tf") * (k1 + 1.0)) / denom
    per_doc_term = scored.select("doc_id", "term", contrib.alias("_c"))
    return (
        per_doc_term.join(F.broadcast(qterms), "term")
        .groupBy(query_id_col, "doc_id")
        .agg(
            F.round(quantized_score_sum(F.col("_c")), 4).alias("score"),
            F.count("*").alias("n_terms"),
        )
    )
