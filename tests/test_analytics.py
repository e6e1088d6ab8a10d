"""Driver-mirror parity for the analytics gates: every gate's Spark
result must equal its DuckDB oracle on the driver testdata (sf0.001),
as row sets — the same comparison the per-round harness runs."""

from __future__ import annotations

import math

import duckdb
import pytest

SF_DIR = "/root/testdata/sf0.001"
TABLES = ["documents", "embeddings"]


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    return con


def _norm(rows):
    out = []
    for r in rows:
        row = []
        for v in r:
            if isinstance(v, float):
                assert float(v).is_integer() or math.isnan(v), (
                    "gates must emit integer-quantized values")
                v = int(v)
            row.append(v)
        out.append(tuple(row))
    return sorted(out)


def _gate_names():
    from ir_spark import gates_analytics

    return sorted(gates_analytics.analytics_queries())


@pytest.mark.parametrize("name", _gate_names())
def test_gate_matches_oracle(spark, duck, name):
    from ir_spark import gates_analytics

    q = gates_analytics.analytics_queries()[name]
    sql = gates_analytics.analytics_oracle_sql()[name]

    sdf = q(spark, SF_DIR)
    spark_rows = _norm([tuple(r) for r in sdf.collect()])
    duck_rows = _norm(duck.sql(sql).fetchall())

    assert len(spark_rows) > 0, f"{name}: empty result weakens the gate"
    assert [f.lower() for f in sdf.columns] == [
        d[0].lower() for d in duck.sql(sql).description]
    assert spark_rows == duck_rows, (
        f"{name}: first diff "
        f"{next((a, b) for a, b in zip(spark_rows, duck_rows) if a != b)}"
        if len(spark_rows) == len(duck_rows)
        else f"{name}: row counts {len(spark_rows)} vs {len(duck_rows)}"
    )
