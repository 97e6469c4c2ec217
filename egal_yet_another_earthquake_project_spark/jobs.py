"""Operational entry points — the reference's job scripts as one CLI.

The reference runs four copy-pasted archival scripts plus a batch loader,
each relaunched every minute by NiFi (SURVEY E1 step 5). Here:

    python -m egal_yet_another_earthquake_project_spark archive \
        --source-dir bronze_in --path bronze --checkpoint ck [--follow]
    python -m egal_yet_another_earthquake_project_spark batch-load \
        --source-dir bronze --es-url http://es:9200 [--dry-run]
    python -m egal_yet_another_earthquake_project_spark analytics \
        --source-dir bronze
    python -m egal_yet_another_earthquake_project_spark curate \
        --source-dir /data/raw --out /data/shards --alpha 0.5 --near-dedup
    python -m egal_yet_another_earthquake_project_spark index \
        --source-dir /data/raw --out /data/ivf --num-cells 64
    python -m egal_yet_another_earthquake_project_spark search \
        --index /data/ivf --queries /data/queries.parquet --k 5
    python -m egal_yet_another_earthquake_project_spark curate-stream \
        --source-dir /data/drops --out /data/curated --checkpoint ck \
        [--corpus /data/corpus --lm-model /data/lm]
    python -m egal_yet_another_earthquake_project_spark lm-train \
        --source-dir /data/raw --out /data/lm
    python -m egal_yet_another_earthquake_project_spark lm-score \
        --model /data/lm --docs /data/drop.parquet --out /data/scores

``archive`` drains (or follows) an envelope directory into a partitioned
parquet archive; ``batch-load`` runs bronze→silver→gold and ships ES
documents (``--dry-run`` prints counts instead); ``analytics`` prints the
gold tables; ``curate`` runs the full training-corpus pipeline
(gates → dedup → resample → packing → shards, see ``curate.py``);
``index``/``index-append``/``search`` build, incrementally extend, and
probe the cell-partitioned IVF ANN index (``llm/ann_index.py``);
``index-append`` reports the post-append cell imbalance and, with
``--rebuild-if-imbalance N``, acts on it — rebuilding the index from its
own unit vectors when the max/mean cell occupancy exceeds ``N``;
``curate-stream`` drains a drop directory through the checkpointed
three-hop streaming curation pipeline (``streaming/curate.py``);
``curate-compact`` merges the pipeline outputs' committed
``_batch_id`` partitions (the stopped-pipeline maintenance pass —
replay semantics preserved via the checkpoint commit watermark);
``curate-vacuum --keep-last N`` retains per-batch time travel for the
newest N commits and merges + expires everything older (the horizon
marker makes expired snapshots raise instead of silently shrinking);
``curate-stream --monitor`` lands per-drop DQ/PSI monitoring tables
under ``{out}/metrics``; ``nb-train``/``nb-score`` and
``lr-train``/``lr-score`` persist and apply the generative and
discriminative classifier gates (``llm/classify.py``, ``llm/lr.py``);
``lm-train``/``lm-score`` freeze an interpolated-bigram LM as a parquet
artifact and score documents against it (``llm/lm.py``); ``lm-train
--cutoffs`` additionally freezes the CCNet tercile bucket boundaries
into the artifact so ``lm-score --bucket`` (and the streaming
``ppl_bucket_sink``) label drops head/middle/tail against the trusted
reference distribution.

Round-12 additions: ``crawl-extract`` runs the WARC→HTML→text front end
over a directory of .warc files and lands (url, source=host, text,
quality signals) parquet that chains into ``curate --id-col url``;
``bm25-index``/``bm25-update``/``bm25-delete``/``bm25-search`` manage
the persisted inverted index (O(delta) segment commits, exact
tombstone deletes, compaction); ``index-delete`` tombstones vectors out
of the IVF index; ``bm25-stream``/``index-stream`` drain drop
directories into the live indexes with replay-idempotent per-batch
commits (``streaming/scoring.py``).
Kafka variants use the same code paths with the gated reader
(sources/kafka.py) once a broker and the connector jar are present.
"""

from __future__ import annotations

import argparse
import sys

from egal_yet_another_earthquake_project_spark import pipeline
from egal_yet_another_earthquake_project_spark.schemas import KAFKA_ENVELOPE
from egal_yet_another_earthquake_project_spark.session import get_spark
from egal_yet_another_earthquake_project_spark.sinks.elasticsearch import write_to_es
from egal_yet_another_earthquake_project_spark.sources.files import (
    stream_parquet_dir,
)
from egal_yet_another_earthquake_project_spark.streaming.bronze import archive_stream


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="egal-spark")
    sub = p.add_subparsers(dest="cmd", required=True)

    a = sub.add_parser("archive", help="envelope dir → partitioned parquet archive")
    a.add_argument("--source-dir", required=True)
    a.add_argument("--path", required=True)
    a.add_argument("--checkpoint", required=True)
    a.add_argument("--follow", action="store_true", help="keep running (default: drain and stop)")

    b = sub.add_parser("batch-load", help="bronze → silver → gold → Elasticsearch")
    b.add_argument("--source-dir", required=True)
    b.add_argument("--es-url", default="http://localhost:9200")
    b.add_argument("--es-index", default="earthquake-all")
    b.add_argument("--min-magnitude", type=float, default=4.0)
    b.add_argument("--dry-run", action="store_true")

    c = sub.add_parser("analytics", help="print the gold analytic tables")
    c.add_argument("--source-dir", required=True)
    c.add_argument("--min-magnitude", type=float, default=4.0)

    d = sub.add_parser(
        "curate",
        help="documents parquet → gated/deduped/resampled/packed shards",
    )
    d.add_argument(
        "--source-dir",
        required=True,
        help="dir holding documents.parquet, or a parquet path itself "
        "(e.g. crawl-extract's --out)",
    )
    d.add_argument("--out", required=True, help="output shard directory")
    d.add_argument(
        "--id-col",
        default="doc_id",
        help="document id column (use 'url' for crawl-extract output)",
    )
    d.add_argument("--text-col", default="text")
    d.add_argument("--min-quality", type=float, default=0.5)
    d.add_argument("--lang", default="en", help="language gate; 'any' disables")
    d.add_argument("--near-dedup", action="store_true")
    d.add_argument(
        "--keep",
        choices=["min_id", "best_quality"],
        default="min_id",
        help="near-dup cluster survivor policy",
    )
    d.add_argument("--alpha", type=float, default=None, help="enable α resampling")
    d.add_argument("--budget", type=int, default=1000)
    d.add_argument(
        "--decontaminate",
        default=None,
        help="benchmark/eval docs parquet — drop docs whose distinct-"
        "shingle overlap fraction reaches --contamination-threshold",
    )
    d.add_argument("--contamination-threshold", type=float, default=0.2)
    d.add_argument(
        "--mixture",
        default=None,
        help="epoch weights per source, e.g. 'wiki=2.3,web=0.8' — shards "
        "materialize the training mixture (repeat copies)",
    )
    d.add_argument("--ctx", type=int, default=256)
    d.add_argument(
        "--semantic-index",
        default=None,
        help="persisted IVF index dir; enables the SemDeDup embedding gate",
    )
    d.add_argument(
        "--embeddings",
        default=None,
        help="parquet of (doc_id, embedding) rows for the incoming docs "
        "(required with --semantic-index)",
    )
    d.add_argument("--semantic-threshold", type=float, default=0.95)
    d.add_argument("--semantic-nprobe", type=int, default=4)
    d.add_argument(
        "--nb-model",
        default=None,
        help="persisted NB model dir (llm.classify.write_nb_model); "
        "enables the trained-classifier gate",
    )
    d.add_argument("--nb-keep-label", default="en")

    e = sub.add_parser(
        "index", help="embeddings parquet → cell-partitioned IVF index"
    )
    e.add_argument("--source-dir", required=True, help="dir holding embeddings.parquet")
    e.add_argument("--out", required=True, help="index directory")
    e.add_argument("--num-cells", type=int, default=16)
    e.add_argument("--refine-iters", type=int, default=0)

    ap = sub.add_parser(
        "index-append",
        help="assign a new vector batch to an existing IVF index (frozen quantizer)",
    )
    ap.add_argument("--index", required=True, help="index directory")
    ap.add_argument("--vectors", required=True, help="parquet of new vectors")
    ap.add_argument(
        "--rebuild-if-imbalance",
        type=float,
        default=None,
        metavar="N",
        help="rebuild the index when post-append max/mean cell occupancy exceeds N",
    )

    ad = sub.add_parser(
        "index-delete",
        help="tombstone a vector-id batch out of an existing IVF index "
        "(O(delta); physical purge happens at the next rebuild)",
    )
    ad.add_argument("--index", required=True, help="index directory")
    ad.add_argument("--ids", required=True, help="parquet carrying vec_id")

    s = sub.add_parser("search", help="top-k ANN against a persisted IVF index")
    s.add_argument("--index", required=True, help="index directory")
    s.add_argument("--queries", required=True, help="parquet of query vectors")
    s.add_argument("--k", type=int, default=5)
    s.add_argument("--nprobe", type=int, default=4)

    ce = sub.add_parser(
        "crawl-extract",
        help="WARC files → (url, status, title, text, quality signals) "
        "parquet — the crawl front end; chain its output into `curate`",
    )
    ce.add_argument(
        "--warcs", required=True, help="directory (or glob) of .warc files"
    )
    ce.add_argument("--out", required=True, help="output parquet directory")
    ce.add_argument(
        "--min-status",
        type=int,
        default=200,
        help="keep records with http_status in [min,max]",
    )
    ce.add_argument("--max-status", type=int, default=299)

    bi = sub.add_parser(
        "bm25-index", help="documents parquet → term-bucketed BM25 inverted index"
    )
    bi.add_argument("--docs", required=True, help="parquet of (doc_id, text)")
    bi.add_argument("--out", required=True, help="index directory")
    bi.add_argument("--n-buckets", type=int, default=64)

    bu = sub.add_parser(
        "bm25-update",
        help="tokenize ONLY a new-document batch into an immutable segment "
        "and commit it to an existing BM25 index by an atomic manifest flip "
        "(O(delta) — base postings are never rewritten)",
    )
    bu.add_argument("--index", required=True, help="index directory")
    bu.add_argument("--docs", required=True, help="parquet of new (doc_id, text)")
    bu.add_argument(
        "--compact-if-segments",
        type=int,
        default=None,
        metavar="N",
        help="fold the segment list back to one when it exceeds N "
        "(index-linear merge, no re-tokenize)",
    )

    bd = sub.add_parser(
        "bm25-delete",
        help="tombstone a document batch out of an existing BM25 index "
        "(O(delta): negative df/stats sidecars, exact post-delete scores; "
        "pass the docs exactly as ingested)",
    )
    bd.add_argument("--index", required=True, help="index directory")
    bd.add_argument(
        "--docs", required=True, help="parquet of the deleted (doc_id, text)"
    )

    bs = sub.add_parser(
        "bm25-search", help="per-query BM25 top-k against a persisted index"
    )
    bs.add_argument("--index", required=True, help="index directory")
    bs.add_argument("--queries", required=True, help="parquet of (query_id, qtext)")
    bs.add_argument("--k", type=int, default=10)

    ih = sub.add_parser(
        "index-health",
        help="staleness/segment/tombstone health rows for a persisted "
        "index (BM25 or IVF) as one JSON object per metric",
    )
    ih.add_argument("--index", required=True, help="index directory")
    ih.add_argument(
        "--kind",
        choices=("bm25", "ivf"),
        required=True,
        help="index flavor (BM25 segment-manifest vs IVF cells)",
    )
    ih.add_argument("--max-segments", type=int, default=None)
    ih.add_argument("--max-tombstone-fraction", type=float, default=None)

    bst = sub.add_parser(
        "bm25-stream",
        help="drain a document drop directory into an existing BM25 index "
        "(one O(batch) named-segment commit per micro-batch, replay-"
        "idempotent; optional inline compaction)",
    )
    bst.add_argument("--source-dir", required=True, help="parquet drop directory")
    bst.add_argument("--index", required=True, help="index directory")
    bst.add_argument("--checkpoint", required=True)
    bst.add_argument("--compact-if-segments", type=int, default=None)
    bst.add_argument("--app-id", default=None, help="per-query segment namespace")
    bst.add_argument("--health-dir", default=None, help="per-commit health rows")

    ist = sub.add_parser(
        "index-stream",
        help="drain a vector drop directory into an existing IVF index "
        "(exactly-once staged appends against the frozen quantizer; "
        "optional inline imbalance-triggered rebuild)",
    )
    ist.add_argument("--source-dir", required=True, help="parquet drop directory")
    ist.add_argument("--index", required=True, help="index directory")
    ist.add_argument("--checkpoint", required=True)
    ist.add_argument("--rebuild-if-imbalance", type=float, default=None)
    ist.add_argument("--app-id", default=None, help="per-query batch namespace")
    ist.add_argument("--health-dir", default=None, help="per-commit health rows")

    g = sub.add_parser(
        "compact", help="rewrite a fragmented parquet dataset as balanced files"
    )
    g.add_argument("--src", required=True)
    g.add_argument("--dst", required=True)
    g.add_argument("--partition-col", action="append", default=None)
    g.add_argument("--target-rows", type=int, default=1_000_000)

    cs = sub.add_parser(
        "curate-stream",
        help="drain a drop directory through the streaming curation "
        "pipeline (gate → exact/near dedup → LM score → pack)",
    )
    cs.add_argument("--source-dir", required=True, help="parquet drop directory")
    cs.add_argument("--corpus", default=None, help="trusted corpus parquet (optional)")
    cs.add_argument("--lm-model", default=None, help="lm-train artifact dir (optional)")
    cs.add_argument("--out", required=True, help="pipeline output root")
    cs.add_argument("--checkpoint", required=True)
    cs.add_argument("--min-quality", type=float, default=0.5)
    cs.add_argument("--lang", default="en")
    cs.add_argument("--jaccard-threshold", type=float, default=0.8)
    cs.add_argument("--ctx", type=int, default=256)
    cs.add_argument(
        "--semantic-index",
        default=None,
        help="persisted IVF index dir; enables the SemDeDup embedding "
        "gate (source rows must carry --vec-col)",
    )
    cs.add_argument("--vec-col", default="embedding")
    cs.add_argument("--semantic-threshold", type=float, default=0.95)
    cs.add_argument("--semantic-nprobe", type=int, default=4)
    cs.add_argument(
        "--nb-model",
        default=None,
        help="persisted NB model dir; enables the trained-classifier gate",
    )
    cs.add_argument("--nb-keep-label", default="en")
    cs.add_argument(
        "--lr-model",
        default=None,
        help="persisted lr-train model dir; enables the discriminative "
        "(logistic-regression) gate beside the NB one",
    )
    cs.add_argument(
        "--monitor",
        action="store_true",
        help="land per-drop monitoring tables under {out}/metrics: the "
        "DQ expectation report and (with --corpus) PSI drift of the "
        "kept text-length distribution vs the frozen corpus reference",
    )
    cs.add_argument(
        "--compact-every",
        type=int,
        default=None,
        help="run curate-compact automatically after every Nth drain "
        "(counter persists at {out}/_drain_count)",
    )
    cs.add_argument("--target-rows", type=int, default=1_000_000)

    cc = sub.add_parser(
        "curate-compact",
        help="merge the curate-stream outputs' committed _batch_id "
        "partitions (maintenance; run with the pipeline stopped)",
    )
    cc.add_argument("--out", required=True, help="pipeline output root")
    cc.add_argument("--checkpoint", required=True)
    cc.add_argument("--source-col", default="source")
    cc.add_argument("--target-rows", type=int, default=1_000_000)

    cv = sub.add_parser(
        "curate-vacuum",
        help="retention vacuum for curate-stream snapshot history: "
        "compact scored history down to the last N commits and expire "
        "the dead manifest ledger (run with the pipeline stopped)",
    )
    cv.add_argument("--out", required=True, help="pipeline output root")
    cv.add_argument("--checkpoint", required=True)
    cv.add_argument(
        "--keep-last",
        type=int,
        default=0,
        help="retain per-batch time travel for the newest N commits and "
        "merge+expire everything older; 0 = only expire manifests already "
        "dead from prior compactions",
    )
    cv.add_argument(
        "--metrics-keep-last",
        type=int,
        default=0,
        help="also retain only the newest N per-drop partitions of every "
        "monitoring table under {out}/metrics (dq/psi/...); 0 = leave "
        "metrics history untouched",
    )

    lt = sub.add_parser(
        "lm-train",
        help="freeze an interpolated-bigram LM from a trusted corpus "
        "and write it as a parquet artifact (c2/vocab/meta)",
    )
    lt.add_argument("--source-dir", required=True, help="dir holding documents.parquet")
    lt.add_argument("--out", required=True, help="model artifact directory")
    lt.add_argument("--lam", type=float, default=0.7)
    lt.add_argument(
        "--cutoffs",
        action="store_true",
        help="also freeze CCNet tercile bucket cutoffs (c33/c67) from the "
        "training corpus's NLL distribution into the artifact meta",
    )
    lt.add_argument("--bin-width", type=float, default=0.02)

    ls = sub.add_parser(
        "lm-score",
        help="score a parquet of documents against a frozen lm-train artifact",
    )
    ls.add_argument("--model", required=True, help="lm-train artifact directory")
    ls.add_argument("--docs", required=True, help="parquet of (doc_id, text) rows")
    ls.add_argument("--out", default=None, help="write scores here (default: show)")
    ls.add_argument(
        "--bucket",
        action="store_true",
        help="label each doc head/middle/tail against the artifact's frozen "
        "cutoffs (requires lm-train --cutoffs)",
    )

    dt = sub.add_parser(
        "dsir-train",
        help="freeze a DSIR importance model (hashed-ngram target/raw "
        "bag-of-words) and write it as a parquet artifact (tm/rm/meta)",
    )
    dt.add_argument("--raw", required=True, help="parquet of raw-pool docs")
    dt.add_argument("--target", required=True, help="parquet of target-corpus docs")
    dt.add_argument("--out", required=True, help="model artifact directory")
    dt.add_argument("--buckets", type=int, default=10_000)

    ds = sub.add_parser(
        "dsir-score",
        help="score docs against a frozen dsir-train artifact; "
        "--top-k additionally Gumbel-selects that many docs",
    )
    ds.add_argument("--model", required=True, help="dsir-train artifact directory")
    ds.add_argument("--docs", required=True, help="parquet of (doc_id, text) rows")
    ds.add_argument("--out", default=None, help="write scores here (default: show)")
    ds.add_argument("--top-k", type=int, default=None)

    nt = sub.add_parser(
        "nb-train",
        help="train a multinomial Naive-Bayes classifier (language-ID / "
        "quality gate) and persist it (weights/consts parquet + _COMPLETE)",
    )
    nt.add_argument("--source-dir", required=True, help="dir holding documents.parquet")
    nt.add_argument("--out", required=True, help="model artifact directory")
    nt.add_argument("--label-col", default="lang")

    ns = sub.add_parser(
        "nb-score",
        help="classify a parquet of documents against a persisted nb-train "
        "artifact (argmax class per doc)",
    )
    ns.add_argument("--model", required=True, help="nb-train artifact directory")
    ns.add_argument("--docs", required=True, help="parquet of (doc_id, text) rows")
    ns.add_argument("--out", default=None, help="write predictions here (default: show)")

    lrt = sub.add_parser(
        "lr-train",
        help="train the hashed-feature logistic-regression gate by batch "
        "GD (integer-grid, bit-replayable) and persist it "
        "(weights parquet + _COMPLETE)",
    )
    lrt.add_argument("--source-dir", required=True, help="dir holding documents.parquet")
    lrt.add_argument("--out", required=True, help="model artifact directory")
    lrt.add_argument(
        "--label-lang",
        default="en",
        help="positive class: label = (lang == LABEL_LANG)",
    )
    lrt.add_argument("--epochs", type=int, default=None)

    lrs = sub.add_parser(
        "lr-score",
        help="score a parquet of documents against a persisted lr-train "
        "artifact (margin sign = p >= 0.5 decision)",
    )
    lrs.add_argument("--model", required=True, help="lr-train artifact directory")
    lrs.add_argument("--docs", required=True, help="parquet of (doc_id, text) rows")
    lrs.add_argument("--out", default=None, help="write predictions here (default: show)")

    x = sub.add_parser(
        "explain",
        help="plan-property audit of a declared query (shuffles, joins, "
        "pushdown, codegen) — the test suite's scale assertions as a tool",
    )
    x.add_argument("--query", required=True, help="name from workloads.QUERIES")
    x.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    x.add_argument("--full-plan", action="store_true")
    return p


def main(argv: list[str] | None = None) -> int:
    args = _parser().parse_args(argv)
    spark = get_spark(f"egal-spark-{args.cmd}")
    spark.sparkContext.setLogLevel("WARN")
    try:
        if args.cmd == "archive":
            q = archive_stream(
                stream_parquet_dir(spark, args.source_dir, KAFKA_ENVELOPE),
                args.path,
                args.checkpoint,
                available_now=not args.follow,
            )
            if args.follow:
                q.awaitTermination()
            else:
                q.awaitTermination()
                print(f"archived to {args.path}")
        elif args.cmd == "batch-load":
            envelopes = spark.read.schema(KAFKA_ENVELOPE).parquet(args.source_dir)
            if args.dry_run:
                gold = pipeline.run_batch(envelopes, min_magnitude=args.min_magnitude)
                print(f"would index {gold.es_documents.count()} documents")
            else:
                gold = pipeline.run_batch(
                    envelopes,
                    es_writer=lambda df: write_to_es(df, args.es_index, args.es_url),
                    min_magnitude=args.min_magnitude,
                )
                print(f"indexed {gold.es_documents.count()} documents to {args.es_index}")
        elif args.cmd == "analytics":
            envelopes = spark.read.schema(KAFKA_ENVELOPE).parquet(args.source_dir)
            gold = pipeline.silver_to_gold(
                pipeline.bronze_to_silver(envelopes), args.min_magnitude
            )
            gold.column_stats.show(50, truncate=False)
            gold.region_counts.show(truncate=False)
            gold.magnitude_extrema.show(truncate=False)
        elif args.cmd == "curate":
            import json

            from egal_yet_another_earthquake_project_spark import curate

            from egal_yet_another_earthquake_project_spark import fsutil

            src = f"{args.source_dir}/documents.parquet"
            if not fsutil.exists(spark, src):
                src = args.source_dir  # a parquet path directly
            docs = spark.read.parquet(src)
            result = curate.curate_corpus(
                docs,
                id_col=args.id_col,
                text_col=args.text_col,
                min_quality=args.min_quality,
                lang=None if args.lang == "any" else args.lang,
                near_dedup=args.near_dedup,
                decontaminate=(
                    spark.read.parquet(args.decontaminate)
                    if args.decontaminate
                    else None
                ),
                contamination_threshold=args.contamination_threshold,
                keep=args.keep,
                alpha=args.alpha,
                budget=args.budget,
                mixture=(
                    {
                        k: float(v)
                        for k, v in (
                            kv.split("=", 1) for kv in args.mixture.split(",")
                        )
                    }
                    if args.mixture
                    else None
                ),
                ctx=args.ctx,
                semantic_index=args.semantic_index,
                embeddings=(
                    spark.read.parquet(args.embeddings)
                    if args.embeddings
                    else None
                ),
                semantic_cos_threshold=args.semantic_threshold,
                nb_model=args.nb_model,
                nb_keep_label=args.nb_keep_label,
                semantic_nprobe=args.semantic_nprobe,
            )
            curate.write_shards(result, args.out)
            print(json.dumps({"out": args.out, **result.stats}))
        elif args.cmd == "index":
            import json

            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                build_ivf_index,
            )

            emb = spark.read.parquet(f"{args.source_dir}/embeddings.parquet")
            build_ivf_index(
                emb,
                args.out,
                num_cells=args.num_cells,
                refine_iters=args.refine_iters,
            )
            print(json.dumps({"out": args.out, "num_cells": args.num_cells}))
        elif args.cmd == "index-append":
            import json

            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                append_ivf_index,
                ivf_cell_stats,
            )

            new_vecs = spark.read.parquet(args.vectors)
            append_ivf_index(spark, args.index, new_vecs)
            if args.rebuild_if_imbalance is not None:
                from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                    maybe_rebuild_ivf_index,
                )

                res = maybe_rebuild_ivf_index(
                    spark, args.index, threshold=args.rebuild_if_imbalance
                )
                print(json.dumps({"index": args.index, **res}))
            else:
                imb = ivf_cell_stats(spark, args.index).agg(
                    {"imbalance": "max"}
                ).collect()[0][0]
                print(json.dumps({"index": args.index, "imbalance": imb}))
        elif args.cmd == "index-delete":
            import json

            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                delete_from_ivf_index,
            )

            ids = spark.read.parquet(args.ids)
            delete_from_ivf_index(spark, args.index, ids)
            print(
                json.dumps({"index": args.index, "deleted": ids.count()})
            )
        elif args.cmd == "search":
            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                search_ivf_index,
            )

            queries = spark.read.parquet(args.queries)
            search_ivf_index(
                spark, args.index, queries, k=args.k, nprobe=args.nprobe
            ).show(50, truncate=False)
        elif args.cmd == "crawl-extract":
            import json

            from pyspark.sql import functions as _F

            from egal_yet_another_earthquake_project_spark.llm.html import (
                extract_text_from_html,
            )
            from egal_yet_another_earthquake_project_spark.llm.warc import (
                extract_warc_pages,
            )

            # binaryFile source: one row per .warc with the bytes in
            # `content` — the input files ARE the parallelism, and both
            # stages below are pure Arrow map lanes (zero shuffles
            # before the first downstream dedup)
            warcs = (
                spark.read.format("binaryFile")
                .load(args.warcs)
                .select(_F.col("content").alias("payload"))
            )
            pages = extract_warc_pages(warcs).filter(
                _F.col("http_status").between(args.min_status, args.max_status)
            )
            out = extract_text_from_html(
                pages.select(_F.col("target_uri").alias("url"), "html"),
                id_col="url",
            ).withColumn(
                # host as the curation source key, so the output chains
                # straight into `curate --id-col url --source-col source`
                # (per-source quality, alpha resampling, mixtures)
                "source",
                _F.parse_url(_F.col("url"), _F.lit("HOST")),
            )
            out.write.mode("overwrite").parquet(args.out)
            print(
                json.dumps(
                    {
                        "out": args.out,
                        "pages": spark.read.parquet(args.out).count(),
                    }
                )
            )
        elif args.cmd == "bm25-index":
            import json

            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                build_bm25_index,
            )

            build_bm25_index(
                spark.read.parquet(args.docs), args.out, n_buckets=args.n_buckets
            )
            print(json.dumps({"out": args.out, "n_buckets": args.n_buckets}))
        elif args.cmd == "bm25-update":
            import json

            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                compact_bm25_index,
                update_bm25_index,
            )
            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                _segment_paths,
            )
            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                resolve_index_dir,
            )

            version = update_bm25_index(spark.read.parquet(args.docs), args.index)
            out = {"index": args.index, "version": version}
            n_segs = len(
                _segment_paths(spark, args.index, resolve_index_dir(args.index))
            )
            out["segments"] = n_segs
            if (
                args.compact_if_segments is not None
                and n_segs > args.compact_if_segments
            ):
                out["compaction"] = compact_bm25_index(spark, args.index)
            print(json.dumps(out))
        elif args.cmd == "bm25-delete":
            import json

            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                delete_from_bm25_index,
            )

            version = delete_from_bm25_index(
                spark.read.parquet(args.docs), args.index
            )
            print(json.dumps({"index": args.index, "version": version}))
        elif args.cmd == "bm25-stream":
            import json

            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                _segment_paths,
            )
            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                resolve_index_dir,
            )
            from egal_yet_another_earthquake_project_spark.streaming.scoring import (
                bm25_update_sink,
            )

            schema = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(args.source_dir)
                .schema
            )
            stream = stream_parquet_dir(
                spark, f"{args.source_dir}/*", schema, max_files_per_trigger=1
            )
            q = (
                bm25_update_sink(
                    stream,
                    args.index,
                    compact_if_segments=args.compact_if_segments,
                    app_id=args.app_id,
                    health_dir=args.health_dir,
                )
                .option("checkpointLocation", args.checkpoint)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            print(
                json.dumps(
                    {
                        "index": args.index,
                        "version": resolve_index_dir(args.index),
                        "segments": len(
                            _segment_paths(
                                spark, args.index, resolve_index_dir(args.index)
                            )
                        ),
                    }
                )
            )
        elif args.cmd == "index-stream":
            import json

            from egal_yet_another_earthquake_project_spark.llm.ann_index import (
                ivf_cell_stats,
                resolve_index_dir,
            )
            from egal_yet_another_earthquake_project_spark.streaming.scoring import (
                ivf_update_sink,
            )

            schema = (
                spark.read.option("recursiveFileLookup", "true")
                .parquet(args.source_dir)
                .schema
            )
            stream = stream_parquet_dir(
                spark, f"{args.source_dir}/*", schema, max_files_per_trigger=1
            )
            q = (
                ivf_update_sink(
                    stream,
                    args.index,
                    rebuild_if_imbalance=args.rebuild_if_imbalance,
                    app_id=args.app_id,
                    health_dir=args.health_dir,
                )
                .option("checkpointLocation", args.checkpoint)
                .start()
            )
            q.processAllAvailable()
            q.stop()
            row = ivf_cell_stats(spark, args.index).select("imbalance").first()
            print(
                json.dumps(
                    {
                        "index": args.index,
                        "version": resolve_index_dir(args.index),
                        "imbalance": (
                            float(row.imbalance) if row is not None else None
                        ),
                    }
                )
            )
        elif args.cmd == "bm25-search":
            from pyspark.sql import functions as _F
            from pyspark.sql.window import Window as _W

            from egal_yet_another_earthquake_project_spark.llm.search_index import (
                search_bm25_index,
            )

            scores = search_bm25_index(
                spark, args.index, spark.read.parquet(args.queries)
            )
            w = _W.partitionBy("query_id").orderBy(
                _F.col("score").desc(), _F.col("doc_id").asc()
            )
            (
                scores.withColumn("rank", _F.row_number().over(w))
                .filter(_F.col("rank") <= args.k)
                .orderBy("query_id", "rank")
                .show(100, truncate=False)
            )
        elif args.cmd == "index-health":
            import json

            from egal_yet_another_earthquake_project_spark.llm import (
                index_health as _ih,
            )

            kwargs = {}
            if args.max_segments is not None:
                kwargs["max_segments"] = args.max_segments
            if args.max_tombstone_fraction is not None:
                kwargs["max_tombstone_fraction"] = args.max_tombstone_fraction
            fn = (
                _ih.bm25_index_health
                if args.kind == "bm25"
                else _ih.ivf_index_health
            )
            for r in fn(spark, args.index, **kwargs).collect():
                print(
                    json.dumps(
                        {
                            "metric": r.metric,
                            "value": r.value,
                            "threshold": r.threshold,
                            "ok": r.ok,
                        }
                    )
                )
        elif args.cmd == "compact":
            import json

            from egal_yet_another_earthquake_project_spark.sinks.parquet import (
                compact_parquet,
            )

            n = compact_parquet(
                spark,
                args.src,
                args.dst,
                partition_cols=args.partition_col,
                target_rows_per_file=args.target_rows,
            )
            print(json.dumps({"dst": args.dst, "files": n}))
        elif args.cmd == "curate-stream":
            import json

            from egal_yet_another_earthquake_project_spark.streaming.curate import (
                drain_curate_stream,
                drain_with_scheduled_compaction,
            )

            corpus = (
                spark.read.parquet(args.corpus) if args.corpus else None
            )
            model = None
            if args.lm_model:
                from egal_yet_another_earthquake_project_spark.llm.lm import (
                    read_lm_model,
                )

                model = read_lm_model(spark, args.lm_model)
            schema = spark.read.parquet(args.source_dir).schema
            drain_kw = dict(
                min_quality=args.min_quality,
                lang=None if args.lang == "any" else args.lang,
                jaccard_threshold=args.jaccard_threshold,
                ctx=args.ctx,
                semantic_index=args.semantic_index,
                vec_col=args.vec_col,
                semantic_cos_threshold=args.semantic_threshold,
                semantic_nprobe=args.semantic_nprobe,
                nb_model=args.nb_model,
                nb_keep_label=args.nb_keep_label,
                lr_model=args.lr_model,
                monitor=args.monitor,
            )
            if args.compact_every is not None:
                stats = drain_with_scheduled_compaction(
                    spark,
                    args.source_dir,
                    schema,
                    corpus=corpus,
                    out_dir=args.out,
                    checkpoint_dir=args.checkpoint,
                    model=model,
                    compact_every=args.compact_every,
                    target_rows_per_file=args.target_rows,
                    **drain_kw,
                )
            else:
                stats = drain_curate_stream(
                    spark,
                    args.source_dir,
                    schema,
                    corpus=corpus,
                    out_dir=args.out,
                    checkpoint_dir=args.checkpoint,
                    model=model,
                    **drain_kw,
                )
            print(json.dumps({"out": args.out, **stats}))
        elif args.cmd == "curate-compact":
            import json

            from egal_yet_another_earthquake_project_spark.streaming.curate import (
                compact_curate_outputs,
            )

            res = compact_curate_outputs(
                spark,
                args.out,
                args.checkpoint,
                source_col=args.source_col,
                target_rows_per_file=args.target_rows,
            )
            print(json.dumps({"out": args.out, **res}))
        elif args.cmd == "curate-vacuum":
            import json

            from egal_yet_another_earthquake_project_spark.streaming.curate import (
                vacuum_scored_history,
            )

            res = vacuum_scored_history(
                spark,
                args.out,
                args.checkpoint,
                keep_last=args.keep_last,
            )
            if args.metrics_keep_last:
                from egal_yet_another_earthquake_project_spark.streaming.curate import (
                    vacuum_metrics_history,
                )

                res["metrics"] = vacuum_metrics_history(
                    spark, args.out, keep_last=args.metrics_keep_last
                )
            print(json.dumps({"out": args.out, **res}))
        elif args.cmd == "nb-train":
            import json

            from egal_yet_another_earthquake_project_spark.llm.classify import (
                write_nb_model,
            )

            docs = spark.read.parquet(f"{args.source_dir}/documents.parquet")
            write_nb_model(docs, args.out, label_col=args.label_col)
            n_cls = spark.read.parquet(f"{args.out}/consts").count()
            n_tok = spark.read.parquet(f"{args.out}/weights").count()
            print(json.dumps(
                {"out": args.out, "classes": n_cls, "token_class_rows": n_tok}
            ))
        elif args.cmd == "nb-score":
            from egal_yet_another_earthquake_project_spark.llm.classify import (
                nb_classify_with_model,
                read_nb_model,
            )

            weights, consts = read_nb_model(spark, args.model)
            preds = nb_classify_with_model(
                spark.read.parquet(args.docs), weights, consts
            )
            if args.out:
                preds.write.mode("overwrite").parquet(args.out)
                print(f"predictions to {args.out}")
            else:
                preds.show(50, truncate=False)
        elif args.cmd == "lr-train":
            import json

            from pyspark.sql import functions as _F

            from egal_yet_another_earthquake_project_spark.llm import lr as llr

            docs = spark.read.parquet(f"{args.source_dir}/documents.parquet")
            llr.write_lr_model(
                docs,
                args.out,
                label=_F.col("lang") == args.label_lang,
                epochs=args.epochs if args.epochs is not None else llr.EPOCHS,
            )
            w = spark.read.parquet(f"{args.out}/weights")
            nz = w.filter(_F.col("w") != 0).count()
            print(json.dumps(
                {"out": args.out, "weights": w.count(), "nonzero": nz}
            ))
        elif args.cmd == "lr-score":
            from egal_yet_another_earthquake_project_spark.llm import lr as llr

            weights = llr.read_lr_model(spark, args.model)
            preds = llr.lr_classify(
                spark.read.parquet(args.docs), weights
            ).drop("label")
            if args.out:
                preds.write.mode("overwrite").parquet(args.out)
                print(f"predictions to {args.out}")
            else:
                preds.show(50, truncate=False)
        elif args.cmd == "lm-train":
            import json

            from egal_yet_another_earthquake_project_spark.llm.lm import (
                train_bigram_lm,
                write_lm_model,
            )

            docs = spark.read.parquet(f"{args.source_dir}/documents.parquet")
            model = train_bigram_lm(docs, lam=args.lam)
            if args.cutoffs:
                from egal_yet_another_earthquake_project_spark.llm.lm import (
                    ppl_cutoffs,
                    score_bigram_frozen,
                )

                model["c33"], model["c67"] = ppl_cutoffs(
                    score_bigram_frozen(docs, model), bin_width=args.bin_width
                )
            write_lm_model(model, args.out)
            print(
                json.dumps(
                    {"out": args.out, "n": model["n"], "v": model["v"],
                     "lam": model["lam"],
                     **({"c33": model["c33"], "c67": model["c67"]}
                        if args.cutoffs else {})}
                )
            )
        elif args.cmd == "lm-score":
            from pyspark.sql import functions as SF

            from egal_yet_another_earthquake_project_spark.llm.lm import (
                bucket_expr,
                read_lm_model,
                score_bigram_frozen,
            )

            model = read_lm_model(spark, args.model)
            scored = score_bigram_frozen(spark.read.parquet(args.docs), model)
            if args.bucket:
                if model.get("c33") is None:
                    print(
                        "artifact has no frozen cutoffs; re-train with "
                        "lm-train --cutoffs",
                        file=sys.stderr,
                    )
                    return 2
                scored = scored.withColumn(
                    "bucket",
                    bucket_expr(
                        SF.col("nll"),
                        SF.lit(model["c33"]),
                        SF.lit(model["c67"]),
                    ),
                )
            if args.out:
                scored.write.mode("overwrite").parquet(args.out)
                print(f"scored to {args.out}")
            else:
                scored.show(50, truncate=False)
        elif args.cmd == "dsir-train":
            import json

            from egal_yet_another_earthquake_project_spark.llm.dsir import (
                train_dsir_model,
                write_dsir_model,
            )

            model = train_dsir_model(
                spark.read.parquet(args.raw),
                spark.read.parquet(args.target),
                buckets=args.buckets,
            )
            write_dsir_model(model, args.out)
            print(
                json.dumps(
                    {"out": args.out, "nt": model["nt"], "nr": model["nr"],
                     "buckets": model["buckets"]}
                )
            )
        elif args.cmd == "dsir-score":
            from egal_yet_another_earthquake_project_spark.llm.dsir import (
                gumbel_topk,
                read_dsir_model,
                score_dsir_frozen,
            )

            model = read_dsir_model(spark, args.model)
            scored = score_dsir_frozen(spark.read.parquet(args.docs), model)
            if args.top_k:
                scored = gumbel_topk(scored, "doc", "logw", k=args.top_k)
            if args.out:
                scored.write.mode("overwrite").parquet(args.out)
                print(f"scored to {args.out}")
            else:
                scored.show(50, truncate=False)
        elif args.cmd == "explain":
            import json

            from egal_yet_another_earthquake_project_spark import workloads
            from egal_yet_another_earthquake_project_spark.plans import inspect

            if args.query not in workloads.QUERIES:
                print(f"unknown query {args.query!r}", file=sys.stderr)
                return 2
            df = workloads.QUERIES[args.query](spark, args.sf_dir)
            print(json.dumps(inspect.plan_audit(df), indent=1))
            if args.full_plan:
                print(inspect.formatted_plan(df))
        return 0
    finally:
        spark.stop()


if __name__ == "__main__":
    sys.exit(main())
