"""Property parity: the Arrow-vectorized canonicalizer vs its Python twin.

The crawl engine's seen-set, scheduling keys and parity oracle all assume
``canonicalize_series`` (the pandas/Arrow hot path) and ``canonicalize_url``
(the pure-Python oracle twin) agree byte-for-byte on ANY input string —
not only on URL-shaped fixtures. Hypothesis feeds adversarial strings
(random unicode, stray '#', '%' runs, ports, missing hosts, newlines —
the '#x\\nfragment' class already bit once, see canonicalize_series
docstring) and asserts exact agreement.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from openreviewcrawler_spark.functions.urls import canonicalize_series, canonicalize_url

URLISH = st.one_of(
    st.text(max_size=60),
    st.builds(
        lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}{path}{q}{frag}",
        st.sampled_from(["http", "HTTP", "https", "HtTpS", "ftp"]),
        st.text(
            alphabet="aB9.-%é", max_size=12
        ),
        st.sampled_from(["", ":80", ":443", ":8080"]),
        st.text(alphabet="/aZ5%41%7e%2F \n#?", max_size=16),
        st.sampled_from(["", "?x=1&y=%41", "?%7E"]),
        st.sampled_from(["", "#frag", "#a\nb", "##"]),
    ),
)


@settings(max_examples=300, deadline=None)
@given(st.lists(URLISH, min_size=1, max_size=50))
def test_series_matches_python_twin(urls):
    got = canonicalize_series(pd.Series(urls, dtype="object")).tolist()
    want = [canonicalize_url(u) for u in urls]
    assert got == want


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_extract_text_total_on_arbitrary_bytes(raw):
    """extract_text/extract_outlinks must be TOTAL on arbitrary byte blobs
    (a crawler parses whatever the wire delivers) and the bytes path must
    equal the pre-decoded str path (the engine decodes once in
    extract_batch; the oracle passes str)."""
    from openreviewcrawler_spark.functions.htmltext import (
        extract_outlinks,
        extract_text,
    )

    s = raw.decode("utf-8", errors="replace")
    assert extract_text(raw) == extract_text(s)
    assert extract_outlinks(raw) == extract_outlinks(s)
