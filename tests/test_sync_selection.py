"""Differential tests: vectorized candidate selection vs the reference's
sequential loops (src/syncfinder.cc:258-383), including plateau/tie cases
(all-zero silence regions produce long equal-quality runs)."""

import numpy as np
import pytest

from audiowmark_tpu.models.syncfinder import (
    _mask_avg_false_positives, _select_local_maxima, _threshold_n_best_order)
from audiowmark_tpu.params import Params


def _ref_local_maxima(abs_q):
    """Sequential scan as in src/syncfinder.cc:258-281."""
    selected = []
    i = 0
    n = len(abs_q)
    while i < n:
        q = abs_q[i]
        q_last = abs_q[i - 1] if i > 0 else 0.0
        q_next = abs_q[i + 1] if i + 1 < n else 0.0
        if q >= q_last and q >= q_next:
            selected.append(i)
            i += 1  # next score cannot be a local maximum
        i += 1
    return selected


def _ref_mask_avg_false_positives(indices, raw, mean):
    """O(n*47) loop as in src/syncfinder.cc:283-332."""
    mask_distance = 23
    mask_factor = 3.0
    n = len(indices)
    aq = [abs(r - m) for r, m in zip(raw, mean)]
    sign = [-1 if r - m < 0 else 1 for r, m in zip(raw, mean)]
    out = []
    for i in range(n):
        masked = False
        for d in range(-mask_distance, mask_distance + 1):
            j = i + d
            if j != i and 0 <= j < n:
                distance = abs(indices[i] - indices[j]) \
                    // Params.sync_search_step
                if distance <= mask_distance:
                    if aq[j] > aq[i] * mask_factor and sign[i] != sign[j]:
                        masked = True
        if not masked:
            out.append(i)
    return out


def _ref_threshold_n_best(abs_q, threshold):
    order = sorted(range(len(abs_q)), key=lambda i: -abs_q[i])
    i = 0
    while i < len(order) and abs_q[order[i]] > threshold:
        i += 1
    if i >= Params.get_n_best:
        return order[:i]
    if len(order) > Params.get_n_best:
        return order[:Params.get_n_best]
    return order


CASES = [
    np.zeros(50),                                     # all-tie plateau
    np.ones(7),
    np.array([1.0, 1.0, 0.5, 1.0, 1.0, 1.0, 0.2]),    # mixed plateaus
    np.array([0.3]),
    np.zeros(0),
]


@pytest.mark.parametrize("seed", range(6))
def test_local_maxima_matches_reference_random(seed):
    rng = np.random.RandomState(seed)
    q = rng.rand(500)
    q[rng.rand(500) < 0.3] = 0.0                      # silence plateaus
    got = np.nonzero(_select_local_maxima(q))[0].tolist()
    assert got == _ref_local_maxima(q.tolist())


@pytest.mark.parametrize("case", range(len(CASES)))
def test_local_maxima_matches_reference_plateaus(case):
    q = CASES[case]
    got = np.nonzero(_select_local_maxima(q))[0].tolist()
    assert got == _ref_local_maxima(q.tolist())


@pytest.mark.parametrize("seed", range(6))
def test_mask_false_positives_matches_reference(seed):
    rng = np.random.RandomState(seed)
    n = 120
    # candidate indices: sorted multiples of the search step with gaps,
    # as produced by the local-maxima stage
    taus = np.sort(rng.choice(np.arange(2000), size=n, replace=False))
    indices = taus * Params.sync_search_step
    raw = rng.randn(n) * 0.4
    mean = rng.randn(n) * 0.1
    keep = _mask_avg_false_positives(indices, raw, mean)
    got = np.nonzero(keep)[0].tolist()
    assert got == _ref_mask_avg_false_positives(
        indices.tolist(), raw.tolist(), mean.tolist())


@pytest.mark.parametrize("seed", range(6))
def test_threshold_n_best_matches_reference(seed):
    rng = np.random.RandomState(seed)
    aq = rng.rand(40)
    aq[rng.rand(40) < 0.4] = 0.25                     # ties
    for threshold in (0.2625, 0.35, 0.9):
        got = _threshold_n_best_order(aq, threshold).tolist()
        assert got == _ref_threshold_n_best(aq.tolist(), threshold)


def test_threshold_n_best_short_list():
    aq = np.array([0.1, 0.5])
    assert _threshold_n_best_order(aq, 0.35).tolist() == \
        _ref_threshold_n_best(aq.tolist(), 0.35)
