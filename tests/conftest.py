from __future__ import annotations

import pytest


@pytest.fixture(scope="session")
def spark():
    from pii_detector_spark.session import build_session

    s = build_session(
        app_name="pii-detector-tests",
        master="local[4]",
        shuffle_partitions=8,
        arrow_batch_rows=500,
    )
    yield s
    s.stop()


@pytest.fixture(scope="session")
def corpus_path(tmp_path_factory):
    """Deterministic synthetic web_pages parquet for pipeline tests."""
    from pii_detector_spark.sources.datagen import write_web_pages

    path = tmp_path_factory.mktemp("webpages") / "web_pages.parquet"
    write_web_pages(str(path), n_rows=800, seed=42)
    return str(path)
