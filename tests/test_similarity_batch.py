"""The numpy-vectorized Jaro-Winkler batch must be bit-identical to the
scalar reference implementation (which round-3 certified hash-exact against
the DuckDB oracle) — any drift here silently breaks oracle parity."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from continuousfilteringbenchmark_spark.functions.similarity import (
    _jaro_winkler,
    _jaro_winkler_batch,
)


def _check(pairs):
    ss = [a for a, _ in pairs]
    ts = [b for _, b in pairs]
    got = _jaro_winkler_batch(ss, ts)
    want = np.array([_jaro_winkler(a, b) for a, b in pairs], dtype=np.float64)
    assert got.shape == want.shape
    # bit-identical: both paths do the same float ops in the same order
    assert (got == want).all(), list(zip(pairs, got, want))


def test_known_values():
    _check(
        [
            ("", ""),
            ("", "abc"),
            ("abc", ""),
            ("abc", "abc"),
            ("martha", "marhta"),
            ("dixon", "dicksonx"),
            ("jellyfish", "smellyfish"),
            ("a", "b"),
            ("a", "a"),
            ("ab", "ba"),
            ("crate", "trace"),
            ("dwayne", "duane"),
            ("aaaaaaaaaa", "aaaaa"),
            ("abcdefgh" * 20, "abcdefgh" * 19 + "x"),  # long-string path
        ]
    )


def test_mixed_length_chunking():
    # one 100x-longer outlier must not perturb the short pairs (sorted
    # chunking isolates it); exercises multi-chunk reassembly order
    pairs = [("alpha%d" % i, "alpah%d" % (i % 7)) for i in range(50)]
    pairs.append(("x" * 3000, "x" * 2999 + "y"))
    pairs += [("beta%d" % i, "beta%d" % (i + 1)) for i in range(50)]
    _check(pairs)


@settings(max_examples=300, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.text(alphabet="abcdefg é中", max_size=24),
            st.text(alphabet="abcdefg é中", max_size=24),
        ),
        min_size=1,
        max_size=40,
    )
)
def test_property_matches_scalar(pairs):
    _check(pairs)
