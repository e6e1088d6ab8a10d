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


# --- corpus curation operator semantics (beyond oracle parity) -------------

def test_decontaminate_flags_copied_ngram(spark):
    from ir_spark.operators import corpus as C

    bench = spark.createDataFrame(
        [(0, "alpha beta gamma delta epsilon")], ["doc_id", "text"])
    corpus = spark.createDataFrame(
        [
            (1, "x y alpha beta gamma delta z"),      # shares a bench 4-gram
            (2, "totally unrelated words go here ok"),
            (3, "alpha beta gamma"),                  # 3 tokens: no 4-gram
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.decontaminate(corpus, bench, n=4).collect()}
    assert out[1].contaminated == 1 and out[1].n_contaminated_grams == 1
    assert out[2].contaminated == 0 and out[2].n_grams > 0
    assert 3 not in out  # too short for any 4-gram -> no gram rows


def test_repetition_profile_flags_repetitive_doc(spark):
    from ir_spark.operators import corpus as C

    docs = spark.createDataFrame(
        [
            (1, "spam ham spam ham spam ham spam ham"),
            (2, "one two three four five six seven eight"),
            (3, "xy"),                                 # single token: no grams
        ],
        ["doc_id", "text"],
    )
    out = {r.doc_id: r for r in C.repetition_profile(docs).collect()}
    # doc 1: 7 bigrams, "spam ham" occurs 4x -> 4/7 > 0.20; 6 trigrams all
    # duplicated ("spam ham spam" x3 / "ham spam ham" x3) -> 6/6 > 0.30
    assert out[1].top_bigram_frac_micro == round(4 / 7 * 1e6)
    assert out[1].dup_trigram_frac_micro == 1_000_000
    assert out[1].keep == 0
    # doc 2: all bigrams unique -> top = 1/7, no duplicate trigram
    assert out[2].top_bigram_frac_micro == round(1 / 7 * 1e6)
    assert out[2].dup_trigram_frac_micro == 0
    assert out[2].keep == 1
    # doc 3: nothing to repeat -> fractions 0, kept
    assert out[3].top_bigram_frac_micro == 0 and out[3].keep == 1


def test_stratified_sample_deterministic_and_thresholded(spark):
    from ir_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rates = {"en": 0.5, "zh": 0.8}
    a = sorted(tuple(r) for r in C.stratified_sample(docs, rates).collect())
    b = sorted(tuple(r) for r in C.stratified_sample(docs, rates).collect())
    assert a == b and len(a) > 0  # pure function of doc_id: rerun-identical
    for _doc_id, lang, key_micro in a:
        limit = rates.get(lang, 1.0) * 1e6
        assert key_micro <= limit  # kept rows are under their stratum rate


def test_mix_report_shares_sum_to_whole(spark):
    from ir_spark.operators import corpus as C

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    rows = C.mix_report(docs).collect()
    assert sum(r.n_docs for r in rows) == docs.count()
    # micro-shares sum to 1e6 up to rounding (half a micro per stratum)
    assert abs(sum(r.token_share_micro for r in rows) - 1_000_000) <= len(rows)
