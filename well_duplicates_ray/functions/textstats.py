"""Text-analysis kernels for training-data pipelines: language-ID
(character n-gram / stopword heuristic), quality scoring, tokenization,
and rolling-hash document fingerprints.

These are extension operators beyond the reference's scope (SURVEY.md §2
"Not present in the reference"): the operations a 100 TB text/image
training-data pipeline needs next to dedup. All kernels are vectorized
per batch (pandas str ops / numpy); no per-row Python in hot paths except
C-speed hashing.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd

# tiny built-in stopword profiles — a real deployment would ship fastText
# lid.176 or CLD3; the sandbox has neither, so this is an honest n-gram /
# stopword-overlap heuristic with the same operator shape.
_LANG_STOPWORDS: dict[str, frozenset] = {
    "en": frozenset("the a of and to in is that it for on with as are was".split()),
    "es": frozenset("el la de y que en un una es los las por con para no".split()),
    "de": frozenset("der die das und ist von zu mit den ein eine nicht im".split()),
    "fr": frozenset("le la les de et un une est que pour dans du au ne pas".split()),
    "zh": frozenset("的 了 是 在 我 有 和 就 不 人 都 一 一个 上 也".split()),
}

_TOKEN_RE = re.compile(r"\w+(?:'\w+)?|[^\w\s]", re.UNICODE)
_WORD_RE = re.compile(r"\w+", re.UNICODE)
_PUNCT_RE = re.compile(r"[^\w\s]", re.UNICODE)


def tokenize_bpe_ish(text: str) -> list[str]:
    """BPE-ish pre-tokenization: words (with apostrophe contractions) and
    individual punctuation marks — the standard GPT-2-style pre-token
    split, minus the byte-level merge table (no tokenizer lib in-sandbox)."""
    return _TOKEN_RE.findall(text or "")


def token_counts(texts: pd.Series) -> pd.Series:
    """Count BPE-ish pre-tokens per text (vectorized findall + len)."""
    return texts.fillna("").str.findall(_TOKEN_RE).str.len().astype("int64")


def _stopword_re(lang: str) -> re.Pattern:
    """``\\b(?:w1|w2|...)\\b`` occurrence-count regex for one profile.

    Counting matches of this pattern over the lowered text equals counting
    ``\\w+`` tokens that are members of the stopword set: maximal word-char
    runs are exactly the substrings bounded by ``\\b`` on both sides."""
    words = sorted(_LANG_STOPWORDS[lang], key=len, reverse=True)
    return re.compile(r"\b(?:" + "|".join(map(re.escape, words)) + r")\b",
                      re.UNICODE)


_STOPWORD_RES = {lang: _stopword_re(lang) for lang in _LANG_STOPWORDS}


def predict_language(texts: pd.Series) -> pd.Series:
    """Stopword-overlap language ID; 'und' (undetermined) when no profile
    scores above zero. Vectorized: one str.count pass per profile, then an
    argmax with first-profile-wins tie-breaking."""
    langs = list(_LANG_STOPWORDS)
    low = texts.fillna("").str.lower()
    scores = np.stack(
        [low.str.count(_STOPWORD_RES[lang]).to_numpy() for lang in langs],
        axis=1,
    )
    best = np.argmax(scores, axis=1)  # first max wins, matching dict order
    pred = np.array(langs, dtype=object)[best]
    pred[scores.max(axis=1) == 0] = "und"
    return pd.Series(pred, index=texts.index, dtype="string")


def quality_metrics(texts: pd.Series) -> pd.DataFrame:
    """Per-document quality features: char/word counts, mean word length,
    stopword ratio (en profile), punctuation ratio, uppercase ratio, and a
    [0,1] composite quality score (C4/Gopher-style heuristics)."""
    t = texts.fillna("")
    n_chars = t.str.len().astype("int64")
    low = t.str.lower()
    n_words = low.str.count(_WORD_RE).astype("int64")
    # words partition the word chars, so sum(len(word)) == count of \w chars
    n_word_chars = low.str.count(r"\w").astype("int64")
    nw = n_words.to_numpy().astype(np.float64)
    safe_nw = np.maximum(nw, 1.0)
    mean_word_len = pd.Series(
        np.where(nw > 0, n_word_chars.to_numpy() / safe_nw, 0.0),
        index=t.index, dtype="float64",
    )
    n_stop = low.str.count(_STOPWORD_RES["en"]).to_numpy()
    stop_ratio = pd.Series(
        np.where(nw > 0, n_stop / safe_nw, 0.0), index=t.index, dtype="float64"
    )
    n_punct = t.str.count(_PUNCT_RE).astype("int64")
    punct_ratio = (n_punct / n_chars.clip(lower=1)).astype("float64")
    upper_ratio = (
        t.str.count(r"[A-Z]") / n_chars.clip(lower=1)
    ).astype("float64")
    # composite: inside-range word count, sane word length, not punct-heavy
    score = (
        ((n_words >= 5) & (n_words <= 100_000)).astype(float) * 0.4
        + ((mean_word_len >= 2) & (mean_word_len <= 12)).astype(float) * 0.3
        + (punct_ratio <= 0.2).astype(float) * 0.2
        + (stop_ratio >= 0.01).astype(float) * 0.1
    )
    return pd.DataFrame(
        {
            "n_chars": n_chars,
            "n_words": n_words,
            "mean_word_len": mean_word_len,
            "stop_ratio": stop_ratio,
            "punct_ratio": punct_ratio,
            "upper_ratio": upper_ratio,
            "quality": score.astype("float64"),
        }
    )


def rolling_fingerprint(texts: pd.Series) -> pd.Series:
    """64-bit rolling polynomial fingerprint of the full text (signed int64
    output; the content-addressable exact-dedup key without cryptographic
    cost). Vectorized over the batch's flat byte buffer — the kernel is
    text.poly_fingerprint64, shared with the candidate bucket keys; its
    formula is pinned bit-exact by SQL_ORACLES['doc_rolling_fingerprint']
    (constants are batch-independent: same text => same fingerprint under
    any batching, and the length term separates '\\x00'+s from s)."""
    from well_duplicates_ray.functions.text import poly_fingerprint64

    out = poly_fingerprint64(texts.fillna("").tolist())
    return pd.Series(out.view(np.int64), index=texts.index)
