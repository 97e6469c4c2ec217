#!/usr/bin/env python
"""Reproducible 1×/10× scaling probe — regenerates SCALE.md's measured
ratios as a committed artifact instead of an ad-hoc session.

For each probed operator family the same plan runs over a 1× and a 10×
input built from $SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1):

* events ×10 — rows replicated with shifted event ids (same key
  distribution, 10× volume);
* documents ×10 — each copy a near-duplicate with a distinct suffix
  token, so the candidate-PAIR mass of the dedup family grows
  super-linearly by construction (45 verify pairs per 10-copy cluster)
  — deliberately harsher than 10× rows.

A wall ratio ≈ the WORK growth is linear scaling; ≪ means fixed
overhead still dominates at 1× (idle parallelism); ≫ the per-family
allowance (10× rows ⇒ 12; pair-mass families grow 45-100× by the
near-dup construction ⇒ proportionally higher) is the signature of an
accidental quadratic and fails the probe. Each op runs once untimed
first (codegen warmup, same policy as bench.py).

Writes SCALE_PROBE.json and prints the markdown rows for SCALE.md.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
#: default allowance: 10× rows should cost at most ~12× wall
ROW_RATIO = 12.0


def _events(spark, k: int):
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    if k == 1:
        return ev
    reps = spark.range(k).withColumnRenamed("id", "_c")
    return (
        ev.crossJoin(reps)
        .withColumn("event_id", F.col("event_id") * k + F.col("_c"))
        .drop("_c")
    )


def _documents(spark, k: int):
    d = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    if k == 1:
        return d
    reps = spark.range(k).withColumnRenamed("id", "_c")
    did = F.col("doc_id") * k + F.col("_c")
    return (
        d.crossJoin(reps)
        .withColumn("doc_id", did)
        .withColumn(
            "text",
            F.concat_ws(" ", "text", F.concat(F.lit("uniq"), did.cast("string"))),
        )
        .drop("_c")
    )


def _embeddings(spark, k: int):
    e = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    if k == 1:
        return e
    reps = spark.range(k).withColumnRenamed("id", "_c")
    return (
        e.crossJoin(reps)
        .withColumn("vec_id", F.col("vec_id") * k + F.col("_c"))
        .drop("_c")
    )


def _embeddings_skewed(spark, k: int):
    """×k embeddings where HALF the rows collapse onto one constant
    vector — the degenerate 50%-mass cluster VERDICT r8 #2 names
    (mass-duplicated boilerplate). The hot-cluster anchor cap must keep
    this row-linear; without it the degenerate cluster's pair mass is
    quadratic."""
    e = _embeddings(spark, k)
    const = F.transform(
        "embedding",
        lambda x, i: F.when(i == 0, F.lit(1.0)).otherwise(F.lit(0.0)),
    )
    return e.withColumn(
        "embedding",
        F.when(F.col("vec_id") % 2 == 0, const).otherwise(F.col("embedding")),
    )


def probes():
    """(name, input builder, operator) triples. Each operator returns a
    DataFrame; the probe forces it with count()."""
    from egal_yet_another_earthquake_project_spark.llm import dedup as ldd
    from egal_yet_another_earthquake_project_spark.llm import linkage as llk
    from egal_yet_another_earthquake_project_spark.llm import text as ltx
    from egal_yet_another_earthquake_project_spark.operators import (
        analytics,
        dedup,
        joins,
        series,
    )

    def flagship(spark, ev):
        return analytics.threshold_counts_by_group(
            ev, group_col="event_type", measure_col="value", threshold=100.0
        )

    def latest(spark, ev):
        return dedup.latest_by_key(ev, ["user_id"], "ts", tiebreak=["event_id"])

    def asof(spark, ev):
        series_df = ev.groupBy(
            F.date_trunc("minute", "ts").alias("sts")
        ).agg(F.avg("value").alias("sv"))
        return joins.asof_join(
            ev.select("event_id", "ts"), series_df, "ts", "sts", ["sv"]
        )

    def interp(spark, ev):
        return series.interpolate_minute_series(ev)

    def profile(spark, docs):
        return ltx.text_profile(docs)

    def exact(spark, docs):
        return ldd.exact_dedup(docs, "doc_id")

    def lsh(spark, docs):
        return ldd.minhash_lsh_dedup_pairs(docs, "doc_id", verify_threshold=0.7)

    def fuzzy(spark, docs):
        return llk.blocked_fuzzy_pairs(docs)

    def tfidf(spark, docs):
        return llk.tfidf_keywords(docs)

    def bigram(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import lm

        return lm.doc_bigram_nll(docs)

    def drift(spark, docs):
        from egal_yet_another_earthquake_project_spark.workloads_corpus import (
            source_drift_kl,
        )

        return source_drift_kl(docs)

    def gopher(spark, docs):
        return ltx.gopher_flags(docs)

    def pplb(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import lm

        model = lm.train_bigram_lm(docs)
        return lm.perplexity_buckets(lm.score_bigram_frozen(docs, model))

    def contam(spark, docs):
        return ldd.contamination_fraction(
            docs.filter(F.col("doc_id") % 50 != 0),
            docs.filter(F.col("doc_id") % 50 == 0),
            "doc_id",
        )

    def novelty(spark, docs):
        return ldd.shingle_novelty(docs, "doc_id")

    def dsir(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import dsir as ldsir

        raw = docs.filter(F.col("source") != "src0")
        target = docs.filter(F.col("source") == "src0")
        return ldsir.gumbel_topk(
            ldsir.dsir_log_weights(raw, target), "doc", "logw", k=100
        )

    def entropy(spark, docs):
        return ltx.token_entropy(docs)

    def zipf(spark, docs):
        return ltx.zipf_slope(docs)

    def pq(spark, emb):
        from egal_yet_another_earthquake_project_spark.llm import pq as lpq

        books = lpq.train_pq_codebooks(emb, m=4, k=16)
        encoded = lpq.pq_encode(emb, books)
        return lpq.pq_adc_topk(
            emb.orderBy("vec_id").limit(5), encoded, books, k=5
        )

    def semdedup(spark, emb):
        from egal_yet_another_earthquake_project_spark.llm.clustering import (
            semdedup_prune,
        )

        return semdedup_prune(
            emb,
            k=8,
            iters=1,
            cos_threshold=0.95,
            max_cluster_size=512,
            hot_cluster_anchors=32,
        )

    def _media_corpus(docs, kind: str):
        """(doc_id, payload) with one deterministic 8×4 image / 64-sample
        WAV per doc, built in the Arrow lane — the declared decode
        queries' corpus shape, parameterized by container."""
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        width, height, n = 8, 4, 64

        def build(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    if kind == "wav":
                        samples = [
                            ((did * 31 + i * 17) % 2001) - 1000
                            for i in range(n)
                        ]
                        payloads.append(_mm.encode_wav(samples))
                        continue
                    pixels = [
                        [
                            (
                                (did * 31 + (y * width + x)) % 256,
                                (did * 17 + (y * width + x) * 3) % 256,
                                (did * 13 + (y * width + x) * 5) % 256,
                            )
                            for x in range(width)
                        ]
                        for y in range(height)
                    ]
                    if kind == "png":
                        payloads.append(
                            _mm.encode_png(
                                width, height, pixels,
                                filter_types=[(did + y) % 5 for y in range(height)],
                            )
                        )
                    elif kind == "gif":
                        payloads.append(_mm.encode_gif(width, height, pixels))
                    else:
                        payloads.append(_mm.encode_bmp(width, height, pixels))
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        return docs.select("doc_id").mapInPandas(
            build, "doc_id long, payload binary"
        )

    def media_decode(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        return _mm.extract_features(_media_corpus(docs, "bmp"))

    def png_decode(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        return _mm.extract_features(_media_corpus(docs, "png"))

    def gif_decode(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        return _mm.extract_features(_media_corpus(docs, "gif"))

    def audio_decode(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        return _mm.extract_audio_features(_media_corpus(docs, "wav"))

    def video_frames(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        width, height = 8, 4

        def build(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    frames = [
                        [
                            [
                                (
                                    (did * 31 + f * 101 + (y * width + x)) % 256,
                                    (did * 17 + f * 57 + (y * width + x) * 3) % 256,
                                    (did * 13 + f * 29 + (y * width + x) * 5) % 256,
                                )
                                for x in range(width)
                            ]
                            for y in range(height)
                        ]
                        for f in range(3)
                    ]
                    payloads.append(_mm.encode_gif_frames(width, height, frames))
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        corpus = docs.select("doc_id").mapInPandas(
            build, "doc_id long, payload binary"
        )
        return _mm.extract_frame_features(corpus, stride=2)

    def jpeg_decode(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        width = height = 16
        sgn = [1 if x % 8 in (0, 3, 4, 7) else -1 for x in range(width)]

        def build(batches):
            for pdf in batches:
                payloads = []
                for did in pdf["doc_id"]:
                    did = int(did)
                    rows = []
                    for y in range(height):
                        row = []
                        for x in range(width):
                            blk = (y // 8) * 2 + (x // 8)
                            base = 16 + (did * 37 + blk * 59) % 208
                            amp = 1 + (did * 11 + blk * 7) % 13
                            v = base + amp * sgn[x] * sgn[y]
                            row.append((v, v, v))
                        rows.append(row)
                    payloads.append(_mm.encode_jpeg(width, height, rows))
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        par = spark.sparkContext.defaultParallelism
        corpus = (
            docs.select("doc_id")
            .repartition(par)
            .mapInPandas(build, "doc_id long, payload binary")
        )
        return _mm.extract_features(corpus)

    def mp3_demux(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        def build(batches):
            for pdf in batches:
                payloads = [
                    _mm.encode_mp3_frames(
                        6 + int(did) % 5, with_crc=True, seed=int(did)
                    )
                    for did in pdf["doc_id"]
                ]
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        corpus = docs.select("doc_id").mapInPandas(
            build, "doc_id long, payload binary"
        )
        return _mm.extract_mp3_features(corpus)

    def mp4_parse(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import (
            multimodal as _mm,
        )

        def build(batches):
            for pdf in batches:
                payloads = [
                    _mm.encode_mp4_boxes(
                        1000 + int(did) % 977,
                        n_tracks=1 + int(did) % 3,
                        mdat_bytes=32 + int(did) % 64,
                    )
                    for did in pdf["doc_id"]
                ]
                yield _pd.DataFrame(
                    {"doc_id": pdf["doc_id"], "payload": payloads}
                )

        corpus = docs.select("doc_id").mapInPandas(
            build, "doc_id long, payload binary"
        )
        return _mm.extract_mp4_features(corpus)

    def html_extract(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import html as _lh

        def build(batches):
            for pdf in batches:
                yield _pd.DataFrame(
                    {
                        "doc_id": pdf["doc_id"],
                        "html": [
                            _lh.render_test_page(int(i), t)
                            for i, t in zip(pdf["doc_id"], pdf["text"])
                        ],
                    }
                )

        pages = docs.select("doc_id", "text").mapInPandas(
            build, "doc_id long, html string"
        )
        return _lh.extract_text_from_html(pages)

    def warc_extract(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import html as _lh
        from egal_yet_another_earthquake_project_spark.llm import warc as _lw

        def build(pdf):
            pdf = pdf.sort_values("doc_id")
            pages = [
                (
                    f"http://example.com/doc/{int(i)}",
                    _lh.render_test_page(int(i), t).encode("utf-8"),
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            return _pd.DataFrame(
                {
                    "gid": [int(pdf["gid"].iloc[0])],
                    "payload": [_lw.encode_warc(pages)],
                }
            )

        warcs = (
            docs.select(
                "doc_id", "text", F.floor(F.col("doc_id") / 10).alias("gid")
            )
            .groupBy("gid")
            .applyInPandas(build, "gid long, payload binary")
        )
        pages = _lw.extract_warc_pages(warcs)
        return _lh.extract_text_from_html(
            pages.select(F.col("target_uri").alias("url"), "html"),
            id_col="url",
        )

    def warc_gz_extract(spark, docs):
        import pandas as _pd

        from egal_yet_another_earthquake_project_spark.llm import html as _lh
        from egal_yet_another_earthquake_project_spark.llm import warc as _lw

        def build(pdf):
            pdf = pdf.sort_values("doc_id")
            pages = [
                (
                    f"http://example.com/doc/{int(i)}",
                    _lh.render_test_page(int(i), t).encode("utf-8"),
                )
                for i, t in zip(pdf["doc_id"], pdf["text"])
            ]
            return _pd.DataFrame(
                {
                    "gid": [int(pdf["gid"].iloc[0])],
                    "payload": [_lw.encode_warc_gz(pages)],
                }
            )

        warcs = (
            docs.select(
                "doc_id", "text", F.floor(F.col("doc_id") / 10).alias("gid")
            )
            .groupBy("gid")
            .applyInPandas(build, "gid long, payload binary")
        )
        pages = _lw.extract_warc_pages(warcs)
        return _lh.extract_text_from_html(
            pages.select(
                F.col("target_uri").alias("url"), "content_type", "html"
            ),
            id_col="url",
            content_type_col="content_type",
        )

    def interval_join(spark, ev):
        from egal_yet_another_earthquake_project_spark.operators.joins import (
            interval_overlap_join,
        )

        secs = F.unix_timestamp("ts")
        a = ev.where(F.col("event_id") % 13 == 0).select(
            F.col("event_id").alias("a_id"),
            F.col("ts").alias("a_start"),
            F.timestamp_seconds(
                secs + (F.col("event_id") % 50 + 10) * 60
            ).alias("a_end"),
        )
        b = ev.where(F.col("event_id") % 17 == 0).select(
            F.col("event_id").alias("b_id"),
            F.col("ts").alias("b_start"),
            F.timestamp_seconds(
                secs + (F.col("event_id") % 30 + 10) * 60
            ).alias("b_end"),
        )
        return interval_overlap_join(a, b, bucket_minutes=5)

    def nb_classify(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import (
            classify as _cls,
        )

        return _cls.nb_classify(docs)

    def lr_gd(spark, docs):
        from egal_yet_another_earthquake_project_spark.llm import lr as _lr

        w = _lr.lr_train(docs)
        return _lr.lr_classify(docs, w)

    # (name, input, op, allowed wall ratio). The near-dup construction
    # multiplies candidate-PAIR mass ~45-100× (every 10-copy cluster is
    # 45 pairs; same-prefix blocks grow 10× → up to 100× in-block
    # pairs under the max_block cap), so the pair-bound families carry
    # proportionally higher allowances — sub-linear per unit of work.
    return [
        ("flagship filter+group", _events, flagship, ROW_RATIO),
        ("latest_by_key window dedup", _events, latest, ROW_RATIO),
        ("keyless bucketed ASOF", _events, asof, ROW_RATIO),
        ("minute interpolation (month-stitched)", _events, interp, ROW_RATIO),
        ("text_profile", _documents, profile, ROW_RATIO),
        ("exact dedup", _documents, exact, ROW_RATIO),
        ("MinHash-LSH pairs (verify 0.7)", _documents, lsh, 20.0),
        ("blocked fuzzy linkage", _documents, fuzzy, 30.0),
        ("TF-IDF keywords", _documents, tfidf, ROW_RATIO),
        # round-6 additions: the two corpus-pass-heaviest r5 analytics.
        # Both are join/agg-linear in distinct (doc, gram) mass — the
        # near-dup ×10 construction grows that ~10×, so ROW_RATIO binds.
        ("interpolated bigram NLL", _documents, bigram, ROW_RATIO),
        ("per-source KL drift", _documents, drift, ROW_RATIO),
        # round-7 additions: the Gopher gate is a map-only scan pass;
        # the full perplexity pass (train + frozen-score + histogram
        # bucket) is join/agg-linear in distinct (doc, gram) mass like
        # the bigram NLL it builds on.
        ("Gopher rule flags", _documents, gopher, ROW_RATIO),
        ("perplexity bucket pass (train+score+bucket)", _documents, pplb, ROW_RATIO),
        # DSIR is feature-aggregate-linear in distinct (doc, bucket)
        # mass (bucket space fixed at B); the models stay ≤B rows at
        # any input size, so ROW_RATIO binds.
        ("DSIR weights + Gumbel-top-k (train+score+select)", _documents, dsir, ROW_RATIO),
        # decontamination is a broadcast-join scan pass; novelty is the
        # TF-IDF df-join shape on shingles — both row-linear. The ×10
        # near-dup construction adds a distinct uniq-suffix shingle per
        # copy, so the shingle-df mass grows ~10×: ROW_RATIO binds.
        ("overlap-fraction decontamination", _documents, contam, ROW_RATIO),
        ("cross-doc novelty profile", _documents, novelty, ROW_RATIO),
        # round-9 additions: entropy/zipf are TF-collapsed aggregates /
        # per-group rank windows — (doc, token) mass grows ~10×, so
        # ROW_RATIO binds. The SemDeDup families run with the hot-cluster
        # anchor cap engaged at 10× (clusters cross max_cluster_size=512),
        # so pair mass is |c|×anchors — row-linear; the skewed variant
        # plants a degenerate 50%-mass cluster, the exact shape that is
        # quadratic without the cap.
        ("token entropy (TF-collapsed)", _documents, entropy, ROW_RATIO),
        ("Zipf alpha per source", _documents, zipf, ROW_RATIO),
        # PQ: train is a k-row sample, encode is a pure projection, the
        # ADC scan is m lookups per (query, code) pair — all row-linear.
        ("PQ encode + ADC top-k", _embeddings, pq, ROW_RATIO),
        ("SemDeDup prune (anchor-capped)", _embeddings, semdedup, ROW_RATIO),
        (
            "SemDeDup prune (degenerate 50% cluster)",
            _embeddings_skewed,
            semdedup,
            ROW_RATIO,
        ),
        # round-10 additions (VERDICT r9 #6): the decode lanes are the
        # only operators whose per-row cost lives in Python (Arrow-
        # batched mapInPandas — encode + strict decode + featurize per
        # payload), so they earn probe rows: map-only, no shuffle, must
        # be row-linear. PNG adds zlib deflate/inflate + filter
        # reconstruction per payload — still per-row work.
        ("media decode features (BMP lane)", _documents, media_decode, ROW_RATIO),
        ("PNG decode features (inflate+unfilter)", _documents, png_decode, ROW_RATIO),
        ("GIF decode features (LZW inflate)", _documents, gif_decode, ROW_RATIO),
        ("audio decode features (WAV lane)", _documents, audio_decode, ROW_RATIO),
        # NB classifier: train+infer in one plan — token-stream-linear
        # (grouped counts, one token join fanning ≤ #classes, per-doc
        # argmax); 10× docs must stay ~row-linear.
        ("NB language-ID train+classify", _documents, nb_classify, ROW_RATIO),
        # LR batch GD: per epoch two aggregations linear in the (doc,
        # bucket) feature stream; model side fixed at 1025 rows, so the
        # row allowance binds.
        ("LR gradient-descent train+score", _documents, lr_gd, ROW_RATIO),
        # interval overlap: events x10 replicate into the SAME time
        # window, so the overlapping-PAIR mass grows ~100x by
        # construction (both sides densify) — allowance sized to the
        # pair growth like the near-dup families, not to row count.
        ("interval overlap join (binned)", _events, interval_join, 150.0),
        ("video frame features (multi-frame GIF)", _documents, video_frames, ROW_RATIO),
        # round-12 additions: the three newest codec lanes — all
        # Arrow-batched map-only passes whose cost lives in Python
        # (JPEG pays a real Huffman+DCT round trip per payload; MP3/MP4
        # are header walks) — must stay row-linear like the other lanes.
        ("JPEG decode features (Huffman+IDCT lane)", _documents, jpeg_decode, ROW_RATIO),
        ("MP3 frame demux (CBR walk, CRC verify)", _documents, mp3_demux, ROW_RATIO),
        ("MP4 box parse (ISO BMFF tiling)", _documents, mp4_parse, ROW_RATIO),
        # crawl front end: render+strip is a pure map lane; the WARC
        # variant adds the 10-docs-per-file grouping shuffle on the
        # build side (query-construction cost, not extraction cost) and
        # the strict container walk per file — both must stay row-linear
        ("HTML text extraction (render+strip)", _documents, html_extract, ROW_RATIO),
        ("WARC->HTML->text front end", _documents, warc_extract, ROW_RATIO),
        # round-13: per-record-gzip framing + charset-threaded extraction
        # — the gzip members add CPU per byte but no new shuffle; must
        # stay row-linear like the plain lane
        ("WARC.gz (per-record gzip) front end", _documents, warc_gz_extract, ROW_RATIO),
    ]


def bm25_maintenance_probe(spark) -> list[dict]:
    """Two rows for the round-12 incremental index lane:

    * **O(delta) update** — the SAME fixed delta committed against a 1×
      base index and a 10× base index; the wall must be ~flat (the
      whole point of segment-manifest maintenance is that update cost
      is independent of base-corpus size). Allowance 3× absorbs
      job-launch noise and the manifest/GC listing, which grows with
      version count, not corpus size.
    * **index search vs 10× corpus** — the probed buckets' postings
      grow ~10× (same term distribution, 10× docs), so the row
      allowance binds like any linear scan family.
    """
    import shutil
    import tempfile

    from egal_yet_another_earthquake_project_spark.llm import (
        search_index as si,
    )

    queries = spark.createDataFrame(
        [(0, "join hash"), (1, "scan filter"), (2, "hash join filter")],
        "query_id long, qtext string",
    )
    # the delta is the SAME frame for both scales: ids disjoint from
    # both corpora (negative), text from the 1× corpus so terms overlap
    delta = (
        _documents(spark, 1)
        .limit(200)
        .select((-F.col("doc_id") - 1).alias("doc_id"), "text")
        .localCheckpoint(eager=True)
    )
    walls: dict[int, dict[str, float]] = {}
    for k in (1, 10):
        tmpd = tempfile.mkdtemp(prefix=f"bm25probe{k}_")
        idx = f"{tmpd}/idx"
        corpus = _documents(spark, k).localCheckpoint(eager=True)
        si.build_bm25_index(corpus, idx)
        corpus.unpersist()
        si.search_bm25_index(spark, idx, queries).count()  # codegen warmup
        t0 = time.time()
        si.update_bm25_index(delta, idx)
        t_upd = round(time.time() - t0, 2)
        t0 = time.time()
        si.search_bm25_index(spark, idx, queries).count()
        t_srch = round(time.time() - t0, 2)
        walls[k] = {"update": t_upd, "search": t_srch}
        shutil.rmtree(tmpd, ignore_errors=True)
    delta.unpersist()
    rows = []
    for what, allowed in (("update", 3.0), ("search", ROW_RATIO)):
        ratio = round(
            walls[10][what] / max(walls[1][what], 1e-9), 1
        )
        name = (
            "BM25 O(delta) update vs 10x base corpus"
            if what == "update"
            else "BM25 index search vs 10x corpus"
        )
        rows.append(
            {
                "operator": name,
                "t1": walls[1][what],
                "t10": walls[10][what],
                "ratio": ratio,
                "allowed": allowed,
            }
        )
        print(
            f"| {name} | {walls[1][what]} s | {walls[10][what]} s | {ratio}x |",
            flush=True,
        )
    return rows


def curate_stream_probe(spark) -> dict:
    """Per-drop wall of the COMPOSED streaming curation pipeline
    (VERDICT r7 #3): drain four equal drops into one out_dir against a
    pre-signed corpus and require the LAST drop's drain wall within the
    allowance of the FIRST's. Per-drop work must be O(drop) — the r7
    finding this probe exists to catch was hop 2 re-signing corpus ∪
    all-prior-batches every trigger, which shows up here as a
    monotonically growing per-drop wall. An untimed warmup drop runs
    first so the one-time corpus band bootstrap and codegen don't
    inflate drop 1. The allowance (3×) absorbs job-launch noise plus
    the legitimate slow growth of the verify side (candidate texts come
    from corpus ∪ kept-so-far)."""
    import shutil
    import tempfile

    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        drain_curate_stream,
    )

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet").select(
        "doc_id", "source", "text"
    )
    corpus = docs.filter(F.col("doc_id") % 2 == 0).localCheckpoint(eager=True)
    rest = docs.filter(F.col("doc_id") % 2 == 1)
    work = tempfile.mkdtemp(prefix="curate_probe_")
    ts = "TIMESTAMP'2024-01-01 00:00:00'"
    try:
        src, out, ck = f"{work}/in", f"{work}/out", f"{work}/ck"
        # warmup: tiny drop triggers the corpus bootstrap + codegen
        rest.filter(F.floor(F.col("doc_id") / 2) % 50 == 0).selectExpr(
            "doc_id", "source", "text", f"{ts} AS ingest_ts"
        ).coalesce(1).write.parquet(f"{src}/warm")
        schema = spark.read.parquet(f"{src}/warm").schema

        def drain():
            return drain_curate_stream(
                spark, f"{src}/*", schema, corpus=corpus, out_dir=out,
                checkpoint_dir=ck, model=None,
                min_quality=0.0, lang=None,
            )

        drain()
        walls = []
        for k in range(4):
            rest.filter(
                (F.floor(F.col("doc_id") / 2) % 50 != 0)
                & (F.floor(F.col("doc_id") / 2) % 4 == k)
            ).selectExpr(
                "doc_id", "source", "text", f"{ts} AS ingest_ts"
            ).coalesce(1).write.parquet(f"{src}/b{k}")
            t0 = time.time()
            drain()
            walls.append(round(time.time() - t0, 2))
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ratio = round(walls[-1] / max(walls[0], 1e-9), 1)
    row = {
        "operator": "curate-stream per-drop wall (4 equal drops)",
        "t1": walls[0],
        "t10": walls[-1],
        "ratio": ratio,
        "allowed": 3.0,
        "walls": walls,
    }
    print(
        f"| {row['operator']} | {walls[0]} s | {walls[-1]} s | {ratio}× |",
        flush=True,
    )
    return row


def semantic_gate_probe(spark) -> dict:
    """1×/10× wall of the persisted-index semantic gate
    (``semantic_gate_hits``) — the composed pipelines' new optional
    stage. The index is built ONCE (that is the product shape); only
    the gated batch grows, so per-cell candidate mass |q_cell|×|c_cell|
    and the wall must grow row-linearly with the batch."""
    import shutil
    import tempfile

    from egal_yet_another_earthquake_project_spark.llm.ann_index import (
        build_ivf_index,
        semantic_gate_hits,
    )

    work = tempfile.mkdtemp(prefix="gate_probe_")
    times = {}
    try:
        idx = f"{work}/ivf"
        build_ivf_index(
            spark.read.parquet(f"{SF_DIR}/embeddings.parquet"), idx, num_cells=16
        )
        warm = _embeddings(spark, 1).localCheckpoint(eager=True)
        semantic_gate_hits(spark, idx, warm, cos_threshold=0.99).count()
        warm.unpersist()
        for k in (1, 10):
            q = _embeddings(spark, k).localCheckpoint(eager=True)
            t0 = time.time()
            semantic_gate_hits(spark, idx, q, cos_threshold=0.99).count()
            times[k] = round(time.time() - t0, 2)
            q.unpersist()
            spark.catalog.clearCache()
    finally:
        shutil.rmtree(work, ignore_errors=True)
    ratio = round(times[10] / max(times[1], 1e-9), 1)
    row = {
        "operator": "semantic gate vs persisted IVF index",
        "t1": times[1],
        "t10": times[10],
        "ratio": ratio,
        "allowed": ROW_RATIO,
    }
    print(
        f"| {row['operator']} | {times[1]} s | {times[10]} s | {ratio}× |",
        flush=True,
    )
    return row


def main() -> int:
    from egal_yet_another_earthquake_project_spark.session import get_spark

    spark = get_spark("egal-scale-probe", shuffle_partitions=32)
    rows = []
    failed = []
    for name, builder, op, allowed in probes():
        times = {}
        warm = builder(spark, 1).localCheckpoint(eager=True)
        op(spark, warm).count()  # codegen warmup, untimed
        warm.unpersist()
        for k in (1, 10):
            df_in = builder(spark, k).localCheckpoint(eager=True)
            t0 = time.time()
            op(spark, df_in).count()
            times[k] = round(time.time() - t0, 2)
            df_in.unpersist()
            spark.catalog.clearCache()
        ratio = round(times[10] / max(times[1], 1e-9), 1)
        if ratio > allowed:
            failed.append(name)
        rows.append(
            {
                "operator": name,
                "t1": times[1],
                "t10": times[10],
                "ratio": ratio,
                "allowed": allowed,
            }
        )
        print(f"| {name} | {times[1]} s | {times[10]} s | {ratio}× |", flush=True)
    grow = semantic_gate_probe(spark)
    if grow["ratio"] > grow["allowed"]:
        failed.append(grow["operator"])
    rows.append(grow)
    crow = curate_stream_probe(spark)
    if crow["ratio"] > crow["allowed"]:
        failed.append(crow["operator"])
    rows.append(crow)
    for brow in bm25_maintenance_probe(spark):
        if brow["ratio"] > brow["allowed"]:
            failed.append(brow["operator"])
        rows.append(brow)
    out = {
        "sf_dir": SF_DIR,
        "failed": failed,
        "rows": rows,
    }
    with open("SCALE_PROBE.json", "w") as f:
        json.dump(out, f, indent=1)
    print(json.dumps({"failed": failed, "n": len(rows)}))
    spark.stop()
    return 0 if not failed else 1


if __name__ == "__main__":
    raise SystemExit(main())
