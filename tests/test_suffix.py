import numpy as np
import pyarrow as pa

from well_duplicates_ray.functions.suffix import (
    has_common_run,
    lcp_kasai,
    longest_common_substring_len,
    suffix_array,
)


def test_suffix_array_banana():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    suffixes = [bytes(s[i:].astype(np.uint8)) for i in sa]
    assert suffixes == sorted(bytes(s[i:].astype(np.uint8)) for i in range(6))


def test_lcp_kasai():
    s = np.frombuffer(b"banana", dtype=np.uint8).astype(np.int64)
    sa = suffix_array(s)
    lcp = lcp_kasai(s, sa)
    # adjacent sorted suffixes: a / ana share 1, ana / anana share 3
    assert lcp.max() == 3


def test_lcs_len():
    assert longest_common_substring_len(b"hello world", b"say hello") == 5  # "hello"
    assert longest_common_substring_len(b"abc", b"xyz") == 0
    assert longest_common_substring_len(b"", b"abc") == 0
    assert longest_common_substring_len(b"abcabc", b"abcabc") == 6


def test_lcs_vs_bruteforce_random():
    rng = np.random.default_rng(3)
    for _ in range(25):
        a = bytes(rng.integers(97, 100, size=rng.integers(0, 30)).astype(np.uint8))
        b = bytes(rng.integers(97, 100, size=rng.integers(0, 30)).astype(np.uint8))
        # brute force LCS substring
        best = 0
        for i in range(len(a)):
            for j in range(len(b)):
                k = 0
                while i + k < len(a) and j + k < len(b) and a[i + k] == b[j + k]:
                    k += 1
                best = max(best, k)
        assert longest_common_substring_len(a, b) == best


def test_has_common_run():
    run = "x" * 5 + "shared-run-of-characters!" + "y" * 5
    assert has_common_run("aa" + run, run + "bb", 24)
    assert not has_common_run("abcdef", "defabc", 24)


def test_pipeline_substring_edges_vs_suffix_array(ray_session):
    """Cross-check the ENGINE's substring verdicts with the independent
    suffix-array LCS kernel (G12's exact decision procedure, third
    implementation after the winnow+byte-probe path and the oracle's
    L-gram sets): every emitted 'substring' edge must share a >= L run,
    and every non-edge pair must fail ALL of the dup predicates."""
    import itertools

    import pyarrow.parquet as pq
    import ray

    from well_duplicates_ray.functions.text import exact_jaccard, shingle_hashes
    from well_duplicates_ray.pipelines.queries import DOC_CFG
    from well_duplicates_ray.pipelines.text_neardup import run_text_neardup

    import ray.data

    docs_tbl = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    )
    out = run_text_neardup(ray.data.from_arrow(docs_tbl), DOC_CFG)
    edges = pa.concat_tables(
        [t for t in (ray.get(r) for r in out["edges"].to_arrow_refs())
         if t.num_rows]
    )
    text_of = dict(zip(docs_tbl["doc_id"].to_pylist(),
                       docs_tbl["text"].to_pylist()))
    L = DOC_CFG.substring_min_len
    edge_set = set()
    for a, b, kind in zip(edges["a"].to_pylist(), edges["b"].to_pylist(),
                          edges["kind"].to_pylist()):
        edge_set.add((a, b))
        ta, tb = (text_of[a] or ""), (text_of[b] or "")
        lcs = longest_common_substring_len(ta.encode(), tb.encode())
        if kind in ("substring", "exact", "exact_caption"):
            assert lcs >= min(L, len(ta.encode()), len(tb.encode())), (
                a, b, kind, lcs)
        if kind == "substring":
            assert lcs >= L, (a, b, lcs)

    # negatives: a deterministic sample of non-edge pairs fails every dup
    # predicate (the full O(n^2) sweep is the e2e oracle's job; this test
    # adds the suffix-array decision procedure, bounded to stay fast)
    ids = docs_tbl["doc_id"].to_pylist()
    checked = 0
    for a, b in itertools.combinations(ids, 2):
        if checked >= 120:
            break
        if (a, b) in edge_set or (b, a) in edge_set:
            continue
        ta, tb = (text_of[a] or ""), (text_of[b] or "")
        assert ta != tb
        assert longest_common_substring_len(ta.encode(), tb.encode()) < L
        va, _ = shingle_hashes([ta], DOC_CFG.shingle_k)
        vb, _ = shingle_hashes([tb], DOC_CFG.shingle_k)
        assert exact_jaccard(va, vb) < DOC_CFG.jaccard_threshold
        checked += 1
    assert checked > 0 and len(edge_set) > 0
