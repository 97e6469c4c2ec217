"""CLI job-runner smoke: archive → batch-load dry-run through main()."""

from __future__ import annotations

from pathlib import Path

from pyspark.sql import functions as F

import pytest

from egal_yet_another_earthquake_project_spark.schemas import KAFKA_ENVELOPE
from egal_yet_another_earthquake_project_spark.testing import fixtures


@pytest.fixture()
def bronze_in(spark, tmp_path: Path) -> str:
    path = tmp_path / "in"
    spark.createDataFrame(
        fixtures.kafka_envelopes(fixtures.earthquake_events(n=25)), KAFKA_ENVELOPE
    ).write.parquet(str(path))
    return str(path)


def test_cli_archive_and_dry_run(spark, bronze_in, tmp_path: Path, capsys):
    # main() builds its own session via getOrCreate — shares the test one.
    from egal_yet_another_earthquake_project_spark import jobs

    # stop() inside main() would kill the shared test session; guard it.
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "archive",
                "--source-dir", bronze_in,
                "--path", str(tmp_path / "archive"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
        assert rc == 0
        rc = jobs.main(
            ["batch-load", "--source-dir", str(tmp_path / "archive"), "--dry-run"]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop
    out = capsys.readouterr().out
    assert "would index 25 documents" in out


def test_cli_curate_writes_shards(spark, tmp_path: Path, capsys):
    """curate: documents dir → gated/deduped/packed shard tree + one JSON
    stats line; shards must cover exactly the curated doc set."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs

    out = str(tmp_path / "shards")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "curate",
                "--source-dir", "/root/testdata/sf0.001",
                "--out", out,
                "--alpha", "0.5",
                "--budget", "120",
                "--near-dedup",
            ]
        )
    finally:
        spark.stop = real_stop
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["input"] > stats["after_dedup"] >= stats["after_resample"]
    shards = spark.read.parquet(out)
    assert shards.count() == stats["after_resample"]
    cols = set(shards.columns)
    assert {"doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"} <= cols


def test_cli_index_and_search(spark, tmp_path: Path, capsys):
    """index builds the cell-partitioned IVF layout; search returns a
    top-k table against it."""
    import shutil

    from egal_yet_another_earthquake_project_spark import jobs

    src = tmp_path / "emb_src"
    (tmp_path / "emb_src").mkdir()
    shutil.copy(
        "/root/testdata/sf0.001/embeddings.parquet",
        str(src / "embeddings.parquet"),
    )
    emb = spark.read.parquet(str(src / "embeddings.parquet"))
    emb.orderBy("vec_id").limit(5).write.parquet(str(tmp_path / "queries"))

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "index",
                "--source-dir", str(src),
                "--out", str(tmp_path / "ivf"),
                "--num-cells", "8",
            ]
        )
        assert rc == 0
        assert (tmp_path / "ivf" / "CURRENT").exists()
        assert (tmp_path / "ivf" / "v=1" / "cells").exists()
        rc = jobs.main(
            [
                "search",
                "--index", str(tmp_path / "ivf"),
                "--queries", str(tmp_path / "queries"),
                "--k", "3",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        assert "query_id" in out and "neighbor_id" in out

        # append a second batch against the frozen quantizer; the CLI
        # reports the post-append imbalance metric
        extra = emb.orderBy(F.col("vec_id").desc()).limit(10).selectExpr(
            "vec_id + 100000 AS vec_id", "embedding"
        )
        extra.write.parquet(str(tmp_path / "extra_vecs"))
        from egal_yet_another_earthquake_project_spark.llm.ann_index import (
            resolve_index_dir,
        )

        n_before = spark.read.parquet(
            f"{resolve_index_dir(str(tmp_path / 'ivf'))}/cells"
        ).count()
        rc = jobs.main(
            [
                "index-append",
                "--index", str(tmp_path / "ivf"),
                "--vectors", str(tmp_path / "extra_vecs"),
            ]
        )
        assert rc == 0
        assert "imbalance" in capsys.readouterr().out
        n_after = spark.read.parquet(
            f"{resolve_index_dir(str(tmp_path / 'ivf'))}/cells"
        ).count()
        assert n_after == n_before + 10

        # --rebuild-if-imbalance: a hot-cell append batch (one embedding,
        # many ids) pushes max/mean past the threshold; the CLI must act
        # on the metric, not just print it
        hot = emb.orderBy("vec_id").first()
        spark.range(300).select(
            (F.col("id") + 200000).alias("vec_id"),
            F.lit(hot.embedding).alias("embedding"),
        ).write.parquet(str(tmp_path / "hot_vecs"))
        rc = jobs.main(
            [
                "index-append",
                "--index", str(tmp_path / "ivf"),
                "--vectors", str(tmp_path / "hot_vecs"),
                "--rebuild-if-imbalance", "2.0",
            ]
        )
        assert rc == 0
        import json

        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["rebuilt"] is True and rep["imbalance"] > 2.0
        assert (
            spark.read.parquet(
                f"{resolve_index_dir(str(tmp_path / 'ivf'))}/cells"
            ).count()
            == n_after + 300
        )

        # index-delete: tombstoned ids leave the results immediately
        emb.orderBy("vec_id").limit(2).select("vec_id").write.parquet(
            str(tmp_path / "dead_ids")
        )
        dead = {
            r.vec_id
            for r in spark.read.parquet(str(tmp_path / "dead_ids")).collect()
        }
        rc = jobs.main(
            [
                "index-delete",
                "--index", str(tmp_path / "ivf"),
                "--ids", str(tmp_path / "dead_ids"),
            ]
        )
        assert rc == 0
        assert '"deleted": 2' in capsys.readouterr().out
        from egal_yet_another_earthquake_project_spark.llm.ann_index import (
            search_ivf_index,
        )

        hits = search_ivf_index(
            spark,
            str(tmp_path / "ivf"),
            spark.read.parquet(str(tmp_path / "queries")),
            k=50,
            nprobe=8,
        ).collect()
        assert hits and all(r.neighbor_id not in dead for r in hits)
    finally:
        spark.stop = real_stop


def test_cli_index_maintenance_streams(spark, tmp_path: Path, capsys):
    """bm25-stream / index-stream: drop-directory drains keep the
    persisted indexes current (named-segment / staged-append commits),
    and the drained index answers like its batch-built twin."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm import ann_index as ai
    from egal_yet_another_earthquake_project_spark.llm import (
        search as lsrch,
        search_index as si,
    )

    docs = spark.createDataFrame(
        [
            (1, "spark joins a hash join with a sort merge join"),
            (2, "the scan filter pushes the filter into the scan"),
            (3, "hash partitioning beats a global sort for a join"),
            (4, "a filter after a scan"),
        ],
        "doc_id long, text string",
    )
    si.build_bm25_index(docs.filter("doc_id <= 2"), str(tmp_path / "bm25"))
    drop = tmp_path / "doc_drop"
    docs.filter("doc_id = 3").coalesce(1).write.parquet(str(drop / "b1"))
    docs.filter("doc_id = 4").coalesce(1).write.parquet(str(drop / "b2"))

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "bm25-stream",
                "--source-dir", str(drop),
                "--index", str(tmp_path / "bm25"),
                "--checkpoint", str(tmp_path / "ck_bm25"),
                "--compact-if-segments", "2",
            ]
        )
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["segments"] == 1  # the threshold folded them back
        queries = spark.createDataFrame(
            [(0, "join hash"), (1, "scan filter")],
            "query_id long, qtext string",
        )
        got = {
            (r.query_id, r.doc_id): r.score
            for r in si.search_bm25_index(
                spark, str(tmp_path / "bm25"), queries
            ).collect()
        }
        want = {
            (r.query_id, r.doc_id): r.score
            for r in lsrch.bm25_scores_per_query(docs, queries).collect()
        }
        assert got == want and got

        from egal_yet_another_earthquake_project_spark.sources.files import (
            read_table,
        )

        emb = read_table(spark, "/root/testdata/sf0.001", "embeddings").select(
            "vec_id", "embedding"
        )
        ai.build_ivf_index(emb.filter("vec_id % 2 = 0"), str(tmp_path / "ivf"),
                           num_cells=8)
        vdrop = tmp_path / "vec_drop"
        emb.filter("vec_id % 2 = 1").coalesce(1).write.parquet(
            str(vdrop / "b1")
        )
        rc = jobs.main(
            [
                "index-stream",
                "--source-dir", str(vdrop),
                "--index", str(tmp_path / "ivf"),
                "--checkpoint", str(tmp_path / "ck_ivf"),
            ]
        )
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["imbalance"] is not None
        hits = ai.search_ivf_index(
            spark,
            str(tmp_path / "ivf"),
            emb.filter("vec_id < 3"),
            k=5,
            nprobe=8,
        ).collect()
        assert any(r.neighbor_id % 2 == 1 for r in hits)  # drained vectors rank
    finally:
        spark.stop = real_stop


def test_cli_crawl_extract(spark, tmp_path: Path, capsys):
    """crawl-extract: .warc files on disk → (url, text, signals)
    parquet, non-2xx records filtered — the front end whose output
    chains into `curate`."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm.html import (
        render_test_page,
    )
    from egal_yet_another_earthquake_project_spark.llm.warc import encode_warc

    wdir = tmp_path / "warcs"
    wdir.mkdir()
    (wdir / "a.warc").write_bytes(
        encode_warc(
            [
                ("http://x/doc/1", render_test_page(1, "alpha beta").encode()),
                ("http://x/doc/2", render_test_page(2, "gamma").encode()),
            ]
        )
    )
    (wdir / "b.warc").write_bytes(
        encode_warc(
            [("http://x/doc/3", render_test_page(3, "delta").encode())]
        )
    )
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "crawl-extract",
                "--warcs", str(wdir),
                "--out", str(tmp_path / "pages"),
            ]
        )
        assert rc == 0
        assert json.loads(
            capsys.readouterr().out.strip().splitlines()[-1]
        )["pages"] == 3
        rows = {
            r.url: r for r in spark.read.parquet(str(tmp_path / "pages")).collect()
        }
        assert rows["http://x/doc/1"].text == "home about alpha beta copyright"
        assert rows["http://x/doc/3"].title == "Doc 3"
        assert all(r.n_links == 2 and r.ok for r in rows.values())
        assert all(r.source == "x" for r in rows.values())  # URL host

        # … and the output chains straight into the curation pipeline
        rc = jobs.main(
            [
                "curate",
                "--source-dir", str(tmp_path / "pages"),
                "--out", str(tmp_path / "shards"),
                "--id-col", "url",
                "--min-quality", "0",
                "--lang", "any",
            ]
        )
        assert rc == 0
        stats = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert stats["out"] == str(tmp_path / "shards")
        shards = spark.read.parquet(str(tmp_path / "shards"))
        assert shards.count() > 0
    finally:
        spark.stop = real_stop


def test_cli_bm25_index_update_search(spark, tmp_path: Path, capsys):
    """bm25-index builds the term-bucketed inverted index; bm25-update
    commits an O(delta) segment by manifest flip (and compacts past the
    segment threshold); bm25-search ranks against the result."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs

    docs = spark.createDataFrame(
        [
            (1, "spark joins a hash join with a sort merge join"),
            (2, "the scan filter pushes the filter into the scan"),
            (3, "hash partitioning beats a global sort for a join"),
        ],
        "doc_id long, text string",
    )
    docs.write.parquet(str(tmp_path / "base_docs"))
    spark.createDataFrame(
        [(4, "a filter after a scan"), (5, "join the hash club")],
        "doc_id long, text string",
    ).write.parquet(str(tmp_path / "new_docs"))
    spark.createDataFrame(
        [(0, "join hash"), (1, "scan filter")], "query_id long, qtext string"
    ).write.parquet(str(tmp_path / "queries"))

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "bm25-index",
                "--docs", str(tmp_path / "base_docs"),
                "--out", str(tmp_path / "bm25"),
                "--n-buckets", "8",
            ]
        )
        assert rc == 0
        assert (tmp_path / "bm25" / "CURRENT").exists()
        rc = jobs.main(
            [
                "bm25-update",
                "--index", str(tmp_path / "bm25"),
                "--docs", str(tmp_path / "new_docs"),
                "--compact-if-segments", "1",
            ]
        )
        assert rc == 0
        rep = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert rep["version"] == 2 and rep["segments"] == 2
        assert rep["compaction"]["compacted"] is True
        rc = jobs.main(
            [
                "bm25-search",
                "--index", str(tmp_path / "bm25"),
                "--queries", str(tmp_path / "queries"),
                "--k", "3",
            ]
        )
        assert rc == 0
        out = capsys.readouterr().out
        # delta docs are retrievable through the compacted index
        assert "query_id" in out and "score" in out and "4" in out

        # tombstone doc 5 (pass it exactly as ingested); it leaves the
        # rankings while everything else stays searchable
        spark.createDataFrame(
            [(5, "join the hash club")], "doc_id long, text string"
        ).write.parquet(str(tmp_path / "dead_docs"))
        rc = jobs.main(
            [
                "bm25-delete",
                "--index", str(tmp_path / "bm25"),
                "--docs", str(tmp_path / "dead_docs"),
            ]
        )
        assert rc == 0
        assert '"version": 4' in capsys.readouterr().out
        from egal_yet_another_earthquake_project_spark.llm.search_index import (
            search_bm25_index,
        )

        res = search_bm25_index(
            spark,
            str(tmp_path / "bm25"),
            spark.createDataFrame(
                [(0, "join hash")], "query_id long, qtext string"
            ),
        ).collect()
        assert res and all(r.doc_id != 5 for r in res)  # doc 5 gone
        assert any(r.doc_id == 1 for r in res)  # others still ranked
    finally:
        spark.stop = real_stop


def test_cli_compact(spark, tmp_path: Path, capsys):
    src = tmp_path / "frag"
    df = spark.range(1000).selectExpr("id", "id % 3 AS g")
    df.repartition(20).write.parquet(str(src))
    assert len(list(src.glob("*.parquet"))) >= 10  # genuinely fragmented

    from egal_yet_another_earthquake_project_spark import jobs

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            ["compact", "--src", str(src), "--dst", str(tmp_path / "out"),
             "--target-rows", "1000"]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop
    out_files = list((tmp_path / "out").glob("*.parquet"))
    assert len(out_files) == 1
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1000


def test_cli_curate_with_mixture_materializes_repeats(spark, tmp_path: Path, capsys):
    """curate --mixture: shards carry the epoch-repeated stream — docs
    from a weight-2.5 source appear 2-3 times (distinct copy indices),
    zero-weight sources vanish, and the stats line reports the
    post-mixture row count."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs

    out = str(tmp_path / "mix_shards")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "curate",
                "--source-dir", "/root/testdata/sf0.001",
                "--out", out,
                "--mixture", "src0=2.5,src1=0.0",
            ]
        )
    finally:
        spark.stop = real_stop
    assert rc == 0
    line = [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    stats = json.loads(line)
    assert stats["after_mixture"] > stats["after_dedup"]
    shards = spark.read.parquet(out)
    assert "copy" in shards.columns
    assert shards.count() == stats["after_mixture"]
    from pyspark.sql import functions as F

    per_src = {
        r.source: (r.rows, r.docs)
        for r in shards.groupBy("source")
        .agg(F.count("*").alias("rows"), F.countDistinct("doc_id").alias("docs"))
        .collect()
    }
    assert "src1" not in per_src, "zero-weight source survived into shards"
    r0, d0 = per_src["src0"]
    assert 2 * d0 <= r0 <= 3 * d0, "weight-2.5 source not repeated 2-3x"
    for src, (rows, docs) in per_src.items():
        if src != "src0":
            assert rows == docs, f"default-weight source {src} duplicated"


def test_cli_explain_audits_declared_query(spark, capsys):
    import json

    from egal_yet_another_earthquake_project_spark.jobs import main

    # main() shares the test session via getOrCreate; guard its stop().
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = main(["explain", "--query", "region_dim_join"])
    finally:
        spark.stop = real_stop
    assert rc == 0
    out = capsys.readouterr().out
    audit = json.loads(out[out.index("{"):])
    assert audit["nested_loop_join"] is False
    assert any(j["node"] == "BroadcastHashJoin" for j in audit["joins"])


def test_cli_explain_rejects_unknown_query(spark):
    from egal_yet_another_earthquake_project_spark.jobs import main

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        assert main(["explain", "--query", "no_such_query"]) == 2
    finally:
        spark.stop = real_stop


def test_cli_lm_train_and_score(spark, tmp_path: Path, capsys):
    """lm-train writes the c2/vocab/meta artifact + one JSON stats line;
    lm-score loads it and writes per-doc NLL that matches the library
    scorer run on the same frozen model."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm.lm import (
        read_lm_model,
        score_bigram_frozen,
    )

    mdir = str(tmp_path / "lm")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            ["lm-train", "--source-dir", "/root/testdata/sf0.001", "--out", mdir]
        )
        assert rc == 0
        stats = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )
        assert stats["n"] > 0 and stats["v"] > 0 and stats["lam"] == 0.7
        for part in ("c2", "vocab", "meta"):
            assert (tmp_path / "lm" / part).exists()

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.limit(50).write.parquet(str(tmp_path / "docs_in"))
        rc = jobs.main(
            [
                "lm-score",
                "--model", mdir,
                "--docs", str(tmp_path / "docs_in"),
                "--out", str(tmp_path / "scores"),
            ]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop

    got = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in spark.read.parquet(str(tmp_path / "scores")).collect()
    }
    model = read_lm_model(spark, mdir)
    want = {
        (r.doc_id, r.n_bigrams): r.nll
        for r in score_bigram_frozen(
            spark.read.parquet(str(tmp_path / "docs_in")), model
        ).collect()
    }
    assert got == want and len(want) > 0


def test_cli_curate_stream(spark, tmp_path: Path, capsys):
    """curate-stream drains a drop dir through the three-hop streaming
    pipeline and reports per-hop counts; shards carry the pack layout."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    drop = docs.filter(F.col("doc_id") % 2 == 0).selectExpr(
        "doc_id", "source", "text", "TIMESTAMP'2024-01-01' AS ingest_ts"
    ).limit(80)
    drop.coalesce(1).write.parquet(str(tmp_path / "drop"))

    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "curate-stream",
                "--source-dir", str(tmp_path / "drop"),
                "--out", str(tmp_path / "out"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
    finally:
        spark.stop = real_stop
    assert rc == 0
    stats = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert stats["admitted"] >= stats["scored"] == stats["shards"] > 0
    shards = spark.read.parquet(str(tmp_path / "out" / "shards"))
    assert {"doc_id", "source", "text", "n_tokens", "start_tok", "pack_id"} <= set(
        shards.columns
    )

    # second drop (flat files into the same source dir — the CLI source
    # does not recurse), then the maintenance compaction pass: committed
    # partitions merge into one per output, rows unchanged
    import shutil

    docs.filter(F.col("doc_id") % 2 == 1).selectExpr(
        "doc_id", "source", "text",
        "TIMESTAMP'2024-01-02' AS ingest_ts",
    ).limit(40).coalesce(1).write.parquet(str(tmp_path / "b2tmp"))
    for i, p in enumerate((tmp_path / "b2tmp").glob("part-*.parquet")):
        shutil.move(str(p), str(tmp_path / "drop" / f"b2-{i}.parquet"))
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "curate-stream",
                "--source-dir", str(tmp_path / "drop"),
                "--out", str(tmp_path / "out"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
        assert rc == 0
        before = {
            tuple(r)
            for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
            .drop("_batch_id")
            .collect()
        }
        rc = jobs.main(
            [
                "curate-compact",
                "--out", str(tmp_path / "out"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
    finally:
        spark.stop = real_stop
    assert rc == 0
    res = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert res["scored"]["merged_partitions"] == 2
    after = {
        tuple(r)
        for r in spark.read.parquet(str(tmp_path / "out" / "shards"))
        .drop("_batch_id")
        .collect()
    }
    assert after == before
    assert len(list((tmp_path / "out" / "scored").glob("_batch_id=*"))) == 1

    # retention vacuum: the compaction above left one dead manifest
    # (its partition merged away); curate-vacuum expires it and the
    # corpus read is unchanged
    from egal_yet_another_earthquake_project_spark.streaming.curate import (
        read_scored_asof,
    )

    full = {
        r.doc_id for r in read_scored_asof(spark, str(tmp_path / "out")).collect()
    }
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            [
                "curate-vacuum",
                "--out", str(tmp_path / "out"),
                "--checkpoint", str(tmp_path / "ck"),
            ]
        )
    finally:
        spark.stop = real_stop
    assert rc == 0
    vres = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert vres["manifests_deleted"] == 1 and vres["horizon"] is not None
    assert {
        r.doc_id for r in read_scored_asof(spark, str(tmp_path / "out")).collect()
    } == full


def test_cli_lm_train_cutoffs_and_bucket_score(spark, tmp_path: Path, capsys):
    """lm-train --cutoffs freezes (c33, c67) into the artifact meta;
    lm-score --bucket labels docs against them, matching the library
    bucket assignment; a cutoff-less artifact refuses --bucket."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm.lm import read_lm_model

    mdir = str(tmp_path / "lmc")
    bare = str(tmp_path / "lm_bare")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            ["lm-train", "--source-dir", "/root/testdata/sf0.001",
             "--out", mdir, "--cutoffs"]
        )
        assert rc == 0
        stats = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )
        assert stats["c33"] < stats["c67"]

        model = read_lm_model(spark, mdir)
        assert (model["c33"], model["c67"]) == (stats["c33"], stats["c67"])

        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.limit(60).write.parquet(str(tmp_path / "bdocs"))
        rc = jobs.main(
            ["lm-score", "--model", mdir, "--docs", str(tmp_path / "bdocs"),
             "--out", str(tmp_path / "bucketed"), "--bucket"]
        )
        assert rc == 0
        out = spark.read.parquet(str(tmp_path / "bucketed"))
        assert "bucket" in out.columns
        labels = {r.bucket for r in out.collect()}
        assert labels <= {"head", "middle", "tail"} and labels

        # artifact without cutoffs refuses --bucket (old artifacts keep working)
        rc = jobs.main(
            ["lm-train", "--source-dir", "/root/testdata/sf0.001", "--out", bare]
        )
        assert rc == 0
        rc = jobs.main(
            ["lm-score", "--model", bare, "--docs", str(tmp_path / "bdocs"),
             "--out", str(tmp_path / "nope"), "--bucket"]
        )
        assert rc == 2
    finally:
        spark.stop = real_stop


def test_cli_dsir_train_and_score(spark, tmp_path: Path, capsys):
    """dsir-train writes the tm/rm/meta artifact + one JSON stats line;
    dsir-score loads it and writes per-doc importance weights matching
    the library scorer; --top-k Gumbel-selects exactly k docs."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm.dsir import (
        read_dsir_model,
        score_dsir_frozen,
    )
    from pyspark.sql import functions as F

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    raw_p = str(tmp_path / "raw_in")
    tgt_p = str(tmp_path / "tgt_in")
    docs.filter(F.col("source") != "src0").write.parquet(raw_p)
    docs.filter(F.col("source") == "src0").write.parquet(tgt_p)

    mdir = str(tmp_path / "dsir")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            ["dsir-train", "--raw", raw_p, "--target", tgt_p,
             "--out", mdir, "--buckets", "1024"]
        )
        assert rc == 0
        stats = json.loads(
            [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
        )
        assert stats["nt"] > 0 and stats["nr"] > 0 and stats["buckets"] == 1024
        for part in ("tm", "rm", "meta"):
            assert (tmp_path / "dsir" / part).exists()

        rc = jobs.main(
            ["dsir-score", "--model", mdir, "--docs", raw_p,
             "--out", str(tmp_path / "w")]
        )
        assert rc == 0
        rc = jobs.main(
            ["dsir-score", "--model", mdir, "--docs", raw_p,
             "--top-k", "20", "--out", str(tmp_path / "sel")]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop

    got = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in spark.read.parquet(str(tmp_path / "w")).collect()
    }
    model = read_dsir_model(spark, mdir)
    want = {
        (r.doc, r.n_grams, round(r.logw, 9))
        for r in score_dsir_frozen(
            spark.read.parquet(raw_p), model
        ).collect()
    }
    assert got == want and len(want) > 0
    sel = spark.read.parquet(str(tmp_path / "sel"))
    assert sel.count() == 20
    assert {r.doc for r in sel.collect()} <= {t[0] for t in want}


def test_cli_curate_decontaminate_flag(spark, tmp_path: Path, capsys):
    """curate --decontaminate <eval parquet> wires the decontamination
    stage: the stats line grows the after_decontamination rung and the
    planted benchmark copies never reach the shards."""
    import json

    from pyspark.sql import functions as F

    from egal_yet_another_earthquake_project_spark import jobs

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    eval_p = str(tmp_path / "eval_in")
    docs.filter(F.col("doc_id") < 3).write.parquet(eval_p)

    out = str(tmp_path / "shards")
    real_stop = spark.stop
    spark.stop = lambda: None
    try:
        rc = jobs.main(
            ["curate", "--source-dir", "/root/testdata/sf0.001",
             "--out", out, "--decontaminate", eval_p,
             "--contamination-threshold", "0.5", "--lang", "any",
             "--min-quality", "0.0"]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop
    stats = json.loads(
        [l for l in capsys.readouterr().out.splitlines() if l.startswith("{")][-1]
    )
    assert "after_decontamination" in stats
    assert stats["after_decontamination"] <= stats["after_dedup"]
    shard_ids = {
        r.doc_id for r in spark.read.parquet(out).collect()
    }
    assert not shard_ids & {0, 1, 2}


def test_cli_nb_train_and_score_round_trip(spark, tmp_path, capsys):
    """nb-train persists a _COMPLETE-marked model; nb-score classifies
    a docs parquet against it and the predictions match the in-process
    classifier."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm.classify import (
        nb_classify,
    )
    from egal_yet_another_earthquake_project_spark.sources.files import (
        read_table,
    )

    mdl = tmp_path / "nb_model"
    real_stop = spark.stop
    spark.stop = lambda: None  # main() would kill the shared test session
    try:
        rc = jobs.main(
            ["nb-train", "--source-dir", "/root/testdata/sf0.001",
             "--out", str(mdl)]
        )
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        meta = json.loads(line)
        assert meta["classes"] >= 2 and meta["token_class_rows"] > 0
        assert (mdl / "_COMPLETE").exists()

        out = tmp_path / "preds"
        rc = jobs.main(
            ["nb-score", "--model", str(mdl),
             "--docs", "/root/testdata/sf0.001/documents.parquet",
             "--out", str(out)]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop
    got = {
        r.doc_id: r.pred_label for r in spark.read.parquet(str(out)).collect()
    }
    docs = read_table(spark, "/root/testdata/sf0.001", "documents")
    want = {r.doc_id: r.pred_label for r in nb_classify(docs).collect()}
    assert got == want and len(want) > 0


def test_cli_lr_train_and_score_round_trip(spark, tmp_path, capsys):
    """lr-train persists a _COMPLETE-marked integer-grid model;
    lr-score classifies a docs parquet against it and the predictions
    match the in-process classifier."""
    import json

    from egal_yet_another_earthquake_project_spark import jobs
    from egal_yet_another_earthquake_project_spark.llm import lr as llr

    mdl = tmp_path / "lr_model"
    real_stop = spark.stop
    spark.stop = lambda: None  # main() would kill the shared test session
    try:
        rc = jobs.main(
            ["lr-train", "--source-dir", "/root/testdata/sf0.001",
             "--out", str(mdl)]
        )
        assert rc == 0
        line = capsys.readouterr().out.strip().splitlines()[-1]
        meta = json.loads(line)
        assert meta["weights"] == llr.DIM + 1 and meta["nonzero"] > 0
        assert (mdl / "_COMPLETE").exists()

        docs_p = str(tmp_path / "docs_in")
        docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
        docs.select("doc_id", "text").write.parquet(docs_p)
        out = tmp_path / "lr_preds"
        rc = jobs.main(
            ["lr-score", "--model", str(mdl), "--docs", docs_p,
             "--out", str(out)]
        )
        assert rc == 0
    finally:
        spark.stop = real_stop

    got = {r.doc_id: r.pred for r in spark.read.parquet(str(out)).collect()}
    weights = llr.read_lr_model(spark, str(mdl))
    want = {
        r.doc_id: r.pred
        for r in llr.lr_classify(docs, weights).collect()
    }
    assert got == want and len(want) > 0
