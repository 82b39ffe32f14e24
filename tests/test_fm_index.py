"""FM-index backward search vs brute-force overlapping counts.

The DuckDB oracle for suffix_fm_count_doc0 is a replace-based scan
that is only exact for border-free patterns; this suite certifies the
index on the cases that oracle cannot express — bordered patterns with
OVERLAPPING occurrences ('ana' in 'banana', 'aa' in 'aaaaa') — plus
whole-string, single-char, absent, and longer-than-text patterns.
"""

from __future__ import annotations

import pytest

from thrill_spark.plans.queries_analytics import fm_backward_count


def _brute_overlapping(text: str, pat: str) -> int:
    return sum(
        1
        for i in range(len(text) - len(pat) + 1)
        if text[i : i + len(pat)] == pat
    )


@pytest.mark.parametrize(
    "text,patterns",
    [
        ("banana", ("ana", "na", "ban", "a", "banana", "xyz", "nab")),
        ("aaaaa", ("aa", "aaa", "a", "b")),
        ("abracadabra", ("abra", "ra", "cad", "abracadabra", "abracadabrax")),
    ],
)
def test_fm_matches_bruteforce(spark, text, patterns):
    df = spark.createDataFrame([(text,)], "_s string")
    got = dict(fm_backward_count(spark, df, patterns))
    want = {p: _brute_overlapping(text, p) for p in patterns}
    assert got == want
