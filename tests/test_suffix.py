import numpy as np

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
