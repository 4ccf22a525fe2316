"""Unit guards for the r11 Zipf-skew fixture generator.

The skew audit's conclusions (BASELINE.md "r11 skew-resilience
audit") only mean something if the fixture actually IS skewed the
way the table claims — these tests pin the draw properties
(hot-key share, Zipf tail monotonicity, word-frequency profile,
byte-stable determinism) without writing any parquet.
"""

from __future__ import annotations

import sys
import os
from collections import Counter

import numpy as np

sys.path.insert(
    0,
    os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"),
)

from gen_skew import HOT_FRAC, zipf_keys, zipf_words  # noqa: E402


def test_hot_key_share_and_tail():
    rng = np.random.default_rng(7)
    n, domain = 400_000, 15_000
    k = zipf_keys(rng, n, domain)
    c = Counter(k)
    # key 0 is the designated hot key at ~HOT_FRAC of rows
    assert abs(c[0] / n - HOT_FRAC) < 0.003
    # the Zipf tail is rank-monotone in expectation: rank-1 tail key
    # beats the hot key, and shares decay down the rank order
    assert c[1] > c[0] > c[50]
    assert c[1] > c[2] > c[10] > c[100]
    # top tail key stays in the "one hot key ~1-2%" regime, not a
    # degenerate single-key fixture
    assert 0.005 < c[1] / n < 0.05
    # full domain coverage semantics: all keys in range
    assert k.min() >= 0 and k.max() < domain


def test_word_zipf_profile():
    rng = np.random.default_rng(11)
    w = zipf_words(rng, 300_000)
    c = Counter(w)
    shares = [c[i] / 300_000 for i in range(3)]
    # Zipf(1.0): rank-k share ~ 1/(k * H_V); top word ~24% on the
    # 40-word vocab, halving down the ranks
    assert 0.20 < shares[0] < 0.28
    assert shares[0] > 1.7 * shares[1] > 2.5 * shares[2]


def test_deterministic_draws():
    a = zipf_keys(np.random.default_rng(42), 10_000, 1_000)
    b = zipf_keys(np.random.default_rng(42), 10_000, 1_000)
    assert np.array_equal(a, b)
    wa = zipf_words(np.random.default_rng(42), 10_000)
    wb = zipf_words(np.random.default_rng(42), 10_000)
    assert np.array_equal(wa, wb)
