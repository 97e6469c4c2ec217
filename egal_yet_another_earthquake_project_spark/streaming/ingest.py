"""Streaming ingestion gate — the continuous-crawl twin of
``llm.dedup.incremental_new_docs`` (SURVEY §2.9 beyond-reference).

A production corpus grows by streaming batches of scraped documents;
each batch must be gated against (a) everything already in the corpus
and (b) duplicates arriving within the stream itself. Batch-mode this
is an anti-join + window; stream-mode the same semantics compose from
two supported streaming primitives:

* **stream-static left_anti join** on the content fingerprint against
  the corpus fingerprint index (a static frame, re-resolvable per
  micro-batch so a refreshed index is picked up on restart);
* **``dropDuplicatesWithinWatermark`` on the fingerprint** for
  duplicates inside the stream — state bounded by the watermark horizon
  instead of growing with the corpus (the corpus-side memory lives in
  the static index, where it belongs).

The fingerprint is the same md5-of-normalized-text the batch operators
key on, so a drained stream admits exactly the docs the batch gate
admits (asserted in tests/test_streaming_ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from egal_yet_another_earthquake_project_spark.llm.text import fingerprint


def stream_new_docs(
    incoming: DataFrame,
    corpus_fps: DataFrame,
    text_col: str = "text",
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Gate a document stream to genuinely-new docs.

    ``corpus_fps`` is the seen-set index: a static frame with one
    ``fp`` column (md5 of normalized text — build it once with
    ``corpus.select(fingerprint("text").alias("fp")).distinct()`` and
    persist it as a table the stream re-reads). The output carries the
    input columns plus ``fp`` so the sink can append the admitted
    fingerprints back to the index.
    """
    keyed = incoming.withColumn("fp", fingerprint(text_col))
    fresh = keyed.join(corpus_fps, "fp", "left_anti")
    return fresh.withWatermark(event_time, watermark).dropDuplicatesWithinWatermark(
        ["fp"]
    )


def stream_neardup_flags(
    incoming: DataFrame,
    band_index: DataFrame,
    corpus: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    verify_threshold: float = 0.8,
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Flag stream documents that are NEAR-duplicates of the static
    corpus — the streaming twin of ``llm.dedup.incremental_neardup_pairs``
    (exact-gate analogue above). Emits ``(doc_a, doc_b, jaccard)``:
    stream doc, matched corpus doc, verified Jaccard ≥ threshold.

    Every stage is stateless per micro-batch except the final bounded
    dedup, which is what makes it streaming-legal:

    * signatures come from the per-ROW expression form
      (``minhash_signature_columns`` — ``array_min`` over the shingle
      hash array, no explode/groupBy), so no aggregation state and the
      event-time column survives for the watermark;
    * band keys (same ``band_struct_array`` as the batch index — key
      spaces are bit-identical) stream-static equi-join against the
      persisted band index, so corpus memory lives in the index, not
      in streaming state;
    * verification is one more stream-static join (corpus shingle sets)
      plus per-pair ``array_intersect`` arithmetic;
    * a pair hit by several bands collapses via
      ``dropDuplicatesWithinWatermark`` on (doc_a, doc_b) — state
      bounded by the watermark horizon.

    A drained time-ordered stream equals the batch gate's pair set
    (asserted in tests/test_streaming_ingest.py).
    """
    from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
    from egal_yet_another_earthquake_project_spark.llm.text import (
        shingles_of_tokens,
        tokenized,
    )

    def sh_raw() -> F.Column:
        return F.array_distinct(shingles_of_tokens(F.col("_toks"), n))

    # Materialize the shingle array behind a projection boundary before
    # deriving both hash arrays from it — two sh_raw() references in one
    # select would tokenize+shingle every row twice (llm/text.py module
    # note: codegen CSE does not merge non-trivial duplicated subtrees).
    shingled = tokenized(
        incoming.filter(F.col(text_col).isNotNull()), text_col
    ).select(
        F.col(id_col).alias("doc_a"), F.col(event_time), sh_raw().alias("_shr")
    )
    prepared = shingled.select(
        "doc_a",
        event_time,
        F.transform(
            F.col("_shr"),
            lambda s: F.conv(F.substring(F.md5(s), 1, 8), 16, 10).cast("long")
            % F.lit(ldd.MINHASH_P),
        ).alias("_hv"),
        F.transform(F.col("_shr"), lambda s: F.xxhash64(s)).alias("_ja"),
    )
    sigs = prepared.select(
        "doc_a",
        event_time,
        "_ja",
        *ldd.minhash_signature_columns("_hv"),
    )
    banded = sigs.select(
        "doc_a",
        event_time,
        "_ja",
        F.explode(ldd.band_struct_array()).alias("bk"),
    ).select(
        "doc_a",
        event_time,
        "_ja",
        F.col("bk.band").alias("band"),
        F.col("bk.sig").alias("sig"),
    )
    hits = banded.join(
        band_index.select(F.col("doc").alias("doc_b"), "band", "sig"),
        ["band", "sig"],
    )
    sh_static = tokenized(corpus.filter(F.col(text_col).isNotNull()), text_col).select(
        F.col(id_col).alias("doc_b"),
        F.transform(sh_raw(), lambda s: F.xxhash64(s)).alias("_jb"),
    )
    common = F.size(F.array_intersect("_ja", "_jb"))
    verified = (
        hits.join(sh_static, "doc_b")
        .withColumn(
            "jaccard",
            F.round(
                common
                / (F.size("_ja") + F.size("_jb") - common).cast("double"),
                4,
            ),
        )
        .filter(F.col("jaccard") >= verify_threshold)
        .select("doc_a", "doc_b", "jaccard", event_time)
    )
    return (
        verified.withWatermark(event_time, watermark)
        .dropDuplicatesWithinWatermark(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "jaccard")
    )


def stream_semantic_flags(
    incoming: DataFrame,
    centroids: DataFrame,
    cells_index: DataFrame,
    cos_threshold: float = 0.3,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    event_time: str = "ingest_ts",
    watermark: str = "1 hour",
) -> DataFrame:
    """Flag stream vectors that are SEMANTIC near-duplicates of the
    static corpus — the embedding analogue of
    :func:`stream_neardup_flags`, gating against the persisted IVF
    index (``llm/ann_index.py`` layout). Emits ``(doc_a, doc_b,
    cos)``: stream vector, matched corpus vector, cosine ≥ threshold.

    ``centroids`` is the index's coarse-quantizer frame ``(cell, cv)``
    — bounded at ``num_cells`` rows, COLLECTED once at stream build
    into per-row literal expressions (the same frozen-plan-literal
    pattern as ``stateful.drift_stream``'s vocabulary; a rebuilt index
    means restarting the stream, exactly like a new reference
    vocabulary). ``cells_index`` is the ``(neighbor_id, uv, cell)``
    cell table — pass ``spark.read.parquet(f"{root}/cells")``, or a
    cell-bucketed saved table so the per-batch stream-static equi-join
    leaves the index side exchange-free (the ``write_band_index``
    pattern).

    Every stage is stateless per micro-batch except the final bounded
    dedup: unit-normalization and the top-``nprobe`` cell choice are
    per-row expressions over the literal centroids (argsort of a
    k-long struct array — no window, no aggregation), the candidate
    join touches only the probed cells' rows, verification is one dot
    product per candidate (index vectors are pre-normalized), and a
    pair hit via several probes collapses through
    ``dropDuplicatesWithinWatermark``. With ``nprobe`` = num_cells the
    drained flags equal the exact thresholded cosine pairs (asserted
    in tests); smaller ``nprobe`` trades recall for probe cost, the
    standard IVF dial.
    """
    from egal_yet_another_earthquake_project_spark.llm.similarity import (
        _dots,
        unit,
    )

    if int(nprobe) < 1:
        # F.slice with length 0 would yield an empty probed array and the
        # gate would silently pass everything — fail at build time like
        # the empty-centroid case below.
        raise ValueError("stream_semantic_flags: nprobe must be >= 1")
    cent_rows = centroids.select("cell", "cv").collect()
    if not cent_rows:
        raise ValueError("stream_semantic_flags: empty centroid frame")

    def _unit(vec: list[float]) -> list[float]:
        nm = sum(float(x) * float(x) for x in vec) ** 0.5
        return [float(x) / nm if nm else 0.0 for x in vec]

    lit_cells = []
    for r in cent_rows:
        uc = F.array(*[F.lit(x) for x in _unit(list(r.cv))])
        lit_cells.append(
            F.struct(
                (-_dots(F.col("_uq"), uc)).alias("negsim"),
                F.lit(int(r.cell)).alias("cell"),
            )
        )
    probed = F.transform(
        F.slice(F.array_sort(F.array(*lit_cells)), 1, int(nprobe)),
        lambda s: s["cell"],
    )

    prepared = unit(
        incoming.filter(F.col(vec_col).isNotNull()).select(
            F.col(id_col).alias("doc_a"), F.col(event_time), F.col(vec_col)
        ),
        vec_col,
        "_uq",
    ).drop(vec_col)
    exploded = prepared.select(
        "doc_a", event_time, "_uq", F.explode(probed).alias("cell")
    )
    verified = (
        exploded.join(
            cells_index.select(
                F.col("neighbor_id").alias("doc_b"), "uv", "cell"
            ),
            "cell",
        )
        .filter(F.col("doc_a") != F.col("doc_b"))
        .withColumn("cos", F.round(_dots(F.col("_uq"), F.col("uv")), 4))
        .filter(F.col("cos") >= F.lit(float(cos_threshold)))
        .select("doc_a", "doc_b", "cos", event_time)
    )
    return (
        verified.withWatermark(event_time, watermark)
        .dropDuplicatesWithinWatermark(["doc_a", "doc_b"])
        .select("doc_a", "doc_b", "cos")
    )


#: default ceiling on the broadcast eval shingle set. 5M distinct
#: shingles ≈ 40 MB of 8-byte hashes per executor — comfortably under
#: broadcast limits; a 10M-ROW eval frame would blow past it and must
#: fail loudly at stream build, not OOM executors at runtime.
MAX_EVAL_SHINGLES = 5_000_000


def stream_contamination_flags(
    incoming: DataFrame,
    eval_docs: DataFrame,
    text_col: str = "text",
    n: int = 3,
    dirty_threshold: float = 0.2,
    max_eval_shingles: int = MAX_EVAL_SHINGLES,
) -> DataFrame:
    """Streaming twin of ``llm.dedup.contamination_fraction``: score
    every stream document's benchmark-overlap fraction as it arrives.

    The batch form counts distinct shingles through an explode +
    aggregate; an append stream gets the SAME numbers from pure per-row
    array arithmetic — ``array_distinct`` for the doc's shingle-set
    size, ``array_intersect`` against the eval shingle set for the hit
    count — so the operator carries ZERO streaming state (no explode,
    no aggregation, no watermark). The eval set rides along as a
    one-row collect_set frame cross-joined with a broadcast hint:
    benchmarks are KB–MB scale by definition, and the static side is
    re-resolved per micro-batch, so publishing a new benchmark version
    is picked up without restarting the stream. Callers persist
    ``eval_docs``'s source if re-derivation per batch would be costly.

    Output: the input columns + (n_shingles, n_hits, contamination,
    dirty) — drained ≡ the batch scorer row-for-row
    (tests/test_streaming_ingest.py).

    ``max_eval_shingles`` pins "benchmarks are small" to a number: the
    distinct eval shingle count is checked ONCE at stream build (one
    bounded aggregate over the eval frame) and a set past the cap
    raises ``ValueError`` — a visible build-time failure instead of a
    broadcast explosion on every micro-batch. An eval SOURCE that grows
    past the cap after the stream started is the caller's re-deploy
    trigger, the same contract as any frozen-broadcast twin.
    """
    from egal_yet_another_earthquake_project_spark.llm.text import (
        shingles_of_tokens,
        tokenized,
    )

    # ONE distinct-shingle lineage serves both the build-time cap count
    # and the per-batch broadcast set. The count runs FIRST (a count
    # never materializes the set itself, so an over-cap eval frame
    # fails before any executor tries to build the oversized array);
    # collect_list over the already-distinct rows == collect_set.
    distinct_sh = (
        tokenized(eval_docs, text_col)
        .select(F.explode(shingles_of_tokens(F.col("_toks"), n)).alias("sh"))
        .distinct()
    )
    n_eval = distinct_sh.count()
    if n_eval > max_eval_shingles:
        raise ValueError(
            f"stream_contamination_flags: eval set has {n_eval} distinct "
            f"shingles > max_eval_shingles={max_eval_shingles}; a set this "
            "large cannot ride along as a per-batch broadcast — shrink the "
            "eval frame or use the batch contaminated_docs join instead"
        )
    ev = distinct_sh.agg(F.collect_list("sh").alias("_ev"))
    shingled = tokenized(incoming, text_col).withColumn(
        "_sh", F.array_distinct(shingles_of_tokens(F.col("_toks"), n))
    )
    n_sh = F.size("_sh")
    n_hits = F.size(F.array_intersect("_sh", "_ev"))
    frac = n_hits.cast("double") / n_sh.cast("double")
    return (
        shingled.crossJoin(F.broadcast(ev))
        .withColumn("n_shingles", n_sh.cast("long"))
        .withColumn("n_hits", n_hits.cast("long"))
        .withColumn("contamination", F.round(frac, 4))
        .withColumn("dirty", frac >= F.lit(float(dirty_threshold)))
        .drop("_norm", "_toks", "_sh", "_ev")
    )
