"""Unit tests for text analysis operators."""

import pytest

from smalltsdb_spark.operators import textstats


@pytest.fixture(scope="module")
def docs(spark):
    return spark.createDataFrame(
        [
            (1, "the cat sat on the mat"),
            (2, "der hund ist ein tier und das ist gut"),
            (3, "le chat est un animal et la vie est belle"),
            (4, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )


def test_token_stats_known_values(docs):
    r = {x.doc_id: x for x in textstats.token_stats(docs, "doc_id", "text").collect()}[1]
    assert r.n_tokens == 6
    assert r.n_chars == 22
    # 17 non-space chars / 6 tokens
    assert r.avg_token_len == pytest.approx(17 / 6, abs=1e-6)
    assert r.stopword_ratio == pytest.approx(2 / 6, abs=1e-6)  # the, the
    assert 0.0 <= r.quality_score <= 1.0


def test_lang_id(docs):
    langs = {r.doc_id: r.lang_pred for r in textstats.lang_id(docs, "doc_id", "text").collect()}
    assert langs == {1: "en", 2: "de", 3: "fr", 4: "und"}


def test_fingerprint_order_sensitive(spark):
    df = spark.createDataFrame(
        [(1, "alpha beta gamma"), (2, "gamma beta alpha"), (3, "alpha beta gamma")],
        "doc_id long, text string",
    )
    fp = {r.doc_id: r.fingerprint for r in textstats.fingerprint(df, "doc_id", "text").collect()}
    assert fp[1] == fp[3]
    assert fp[1] != fp[2]  # same token set, different order
    assert all(0 <= v < 1_000_000_007 for v in fp.values())
