"""Shared pytest fixtures: one SparkSession per test session, and the
deterministic synthetic pages corpus at a couple of sizes."""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


@pytest.fixture(scope="session")
def spark():
    from ir_spark.session import get_spark

    s = get_spark("ir_spark_tests", cpus=int(os.environ.get("IR_SPARK_TEST_CPUS", "4")),
                  shuffle_partitions=8)
    yield s
    s.stop()


@pytest.fixture(scope="session")
def pages_small(tmp_path_factory):
    """250-doc fixture corpus written as parquet; returns (path, pages)."""
    from ir_spark.fixtures import generate_pages, pages_to_parquet

    pages = generate_pages(250, seed=42)
    path = str(tmp_path_factory.mktemp("pages") / "pages.parquet")
    pages_to_parquet(pages, path)
    return path, pages


@pytest.fixture(scope="session")
def oracle_index(pages_small):
    """Oracle index with doc ids identical to the Spark engine's
    (dense_rank over url, 1-based)."""
    from ir_spark.oracle import build_index

    _, pages = pages_small
    by_url = sorted(pages, key=lambda p: p.url)
    docs = [(i + 1, p.text) for i, p in enumerate(by_url)]
    return build_index(docs)
