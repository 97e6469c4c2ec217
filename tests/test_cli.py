"""CLI job-runner smoke: archive → batch-load dry-run through main()."""

from __future__ import annotations

from pathlib import Path

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
