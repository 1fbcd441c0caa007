import numpy as np
import pandas as pd

from well_duplicates_ray.functions.textstats import (
    predict_language,
    quality_metrics,
    rolling_fingerprint,
    token_counts,
    tokenize_bpe_ish,
)


def test_tokenize_bpe_ish():
    assert tokenize_bpe_ish("Hello, world! don't") == [
        "Hello", ",", "world", "!", "don't",
    ]
    assert tokenize_bpe_ish("") == []


def test_token_counts_vectorized():
    s = pd.Series(["a b c", "", None, "x, y."])
    assert token_counts(s).tolist() == [3, 0, 0, 4]


def test_predict_language():
    s = pd.Series(
        [
            "the cat sat on the mat and it was happy",
            "el perro corre por la calle con el gato",
            "der hund läuft durch die stadt mit den kindern",
            "le chat est dans la maison pour le moment",
            "xyzzy plugh",
            "",
        ]
    )
    out = predict_language(s).tolist()
    assert out[:4] == ["en", "es", "de", "fr"]
    assert out[4] == "und" and out[5] == "und"


def test_quality_metrics():
    s = pd.Series(["The quick brown fox jumps over the lazy dog.", "!!!", ""])
    q = quality_metrics(s)
    assert set(q.columns) >= {"n_chars", "n_words", "quality", "punct_ratio"}
    assert q["quality"][0] > q["quality"][1]
    assert q["n_words"].tolist() == [9, 0, 0]
    assert q["punct_ratio"][1] == 1.0


def test_rolling_fingerprint_deterministic_and_distinct():
    s = pd.Series(["hello world", "hello world", "hello worlds", ""])
    f = rolling_fingerprint(s)
    assert f[0] == f[1]
    assert f[0] != f[2]
    f2 = rolling_fingerprint(pd.Series(["hello world"]))
    assert f2[0] == f[0]
    # empty string gets the seed value, stable
    assert rolling_fingerprint(pd.Series([""]))[0] == f[3]


def test_rolling_fingerprint_no_prefix_collision():
    # polynomial with per-position powers must distinguish order
    f = rolling_fingerprint(pd.Series(["ab", "ba", "aab"]))
    assert len(set(f.tolist())) == 3


def test_rolling_fingerprint_batch_independent():
    """Same text => same fingerprint regardless of batch composition
    (ADVICE round 1: the seed fold must not depend on the batch's max
    length). Also: '\\x00'+s must not collide with s (length mixing)."""
    texts = ["a", "", "xy", "a much longer text with many characters"]
    whole = rolling_fingerprint(pd.Series(texts)).tolist()
    for i, t in enumerate(texts):
        solo = rolling_fingerprint(pd.Series([t]))[0]
        assert solo == whole[i], f"batching changed fp of {t!r}"
    # all-short batch vs mixed batch
    short = rolling_fingerprint(pd.Series(["a", ""])).tolist()
    assert short == whole[:2]
    # length mixing: NUL-prefixed string differs from the bare string
    f = rolling_fingerprint(pd.Series(["abc", "\x00abc"]))
    assert f[0] != f[1]
