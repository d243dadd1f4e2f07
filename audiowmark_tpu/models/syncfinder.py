"""Sync finder: candidate selection pipeline over the device score sweep.

Mirrors SyncFinder (src/syncfinder.cc): approx search over all starts at
4 shifts -> local-mean subtraction -> local maxima -> opposite-sign false-
positive masking -> threshold/n-best -> +-256 step-8 refinement -> final
classification (quality = |raw - mean|, block type A for positive sign).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from enum import Enum
from typing import List, Tuple

import numpy as np

from ..codec.convcode import ConvBlockType
from ..crypto.keys import Key
from ..ops import sync as sync_ops
from ..params import Params
from ..tables import get_key_tables


class SyncMode(Enum):
    BLOCK = 0
    CLIP = 1


@dataclass
class Score:
    index: int
    quality: float
    block_type: ConvBlockType


@dataclass
class KeyResult:
    key: Key
    sync_scores: List[Score] = field(default_factory=list)


@dataclass
class _SearchScore:
    index: int
    raw_quality: float
    local_mean: float

    def abs_quality(self) -> float:
        return abs(self.raw_quality - self.local_mean)


def _frame_count(wav_data) -> int:
    return wav_data.n_values // wav_data.n_channels // Params.frame_size


def _scan_silence(samples: np.ndarray) -> Tuple[int, int]:
    """First/last non-zero raw sample-value indices
    (src/syncfinder.cc:155-169); returns (first, last) with last exclusive."""
    nz = np.nonzero(samples)[0]
    if nz.size == 0:
        return 0, 0
    return int(nz[0]), int(nz[-1]) + 1


def _select_local_maxima(scores: List[_SearchScore]) -> List[_SearchScore]:
    selected = []
    i = 0
    n = len(scores)
    while i < n:
        q = scores[i].abs_quality()
        q_last = scores[i - 1].abs_quality() if i > 0 else 0.0
        q_next = scores[i + 1].abs_quality() if i + 1 < n else 0.0
        if q >= q_last and q >= q_next:
            selected.append(scores[i])
            i += 1  # next score cannot be a local maximum
        i += 1
    return selected


def _mask_avg_false_positives(scores: List[_SearchScore]) -> List[_SearchScore]:
    mask_distance = 20 + 3  # local_mean_distance + 3
    mask_factor = 3.0
    out = []
    n = len(scores)
    for i in range(n):
        masked = False
        for d in range(-mask_distance, mask_distance + 1):
            j = i + d
            if j != i and 0 <= j < n:
                distance = abs(scores[i].index - scores[j].index) \
                    // Params.sync_search_step
                if distance <= mask_distance:
                    sign_i = -1 if scores[i].raw_quality - scores[i].local_mean < 0 else 1
                    sign_j = -1 if scores[j].raw_quality - scores[j].local_mean < 0 else 1
                    if (scores[j].abs_quality() > scores[i].abs_quality() * mask_factor
                            and sign_i != sign_j):
                        masked = True
        if not masked:
            out.append(scores[i])
    return out


def _select_threshold_and_n_best(scores: List[_SearchScore],
                                 threshold: float) -> List[_SearchScore]:
    scores = sorted(scores, key=lambda s: -s.abs_quality())
    i = 0
    while i < len(scores) and scores[i].abs_quality() > threshold:
        i += 1
    if i >= Params.get_n_best:
        return scores[:i]
    if len(scores) > Params.get_n_best:
        return scores[:Params.get_n_best]
    return scores


def _fake_sync(key_list: List[Key], wav_data, mode: SyncMode) -> List[KeyResult]:
    """--test-no-sync: exact expected positions (src/syncfinder.cc:460-485)."""
    result_scores = []
    if mode == SyncMode.BLOCK:
        tables = get_key_tables(key_list[0])
        expect0 = Params.frames_pad_start * Params.frame_size
        expect_step = tables.frames_per_block * Params.frame_size
        expect_end = _frame_count(wav_data) * Params.frame_size
        ab = 0
        idx = expect0
        while idx + expect_step < expect_end:
            result_scores.append(Score(
                idx, 1.0,
                ConvBlockType.b if (ab & 1) else ConvBlockType.a))
            ab += 1
            idx += expect_step
    return [KeyResult(key=key, sync_scores=list(result_scores))
            for key in key_list]


def search(key_list: List[Key], wav_data, mode: SyncMode) -> List[KeyResult]:
    if Params.test_no_sync:
        return _fake_sync(key_list, wav_data, mode)

    samples = wav_data.samples
    n_channels = wav_data.n_channels
    if mode == SyncMode.CLIP:
        silence_bounds = _scan_silence(samples)
    else:
        silence_bounds = None

    # one spectrogram shared by all keys
    S, have = sync_ops.hop_spectrogram(
        samples, n_channels,
        silence_bounds=silence_bounds if mode == SyncMode.CLIP else None)

    key_results: List[KeyResult] = []
    for key in key_list:
        tables = get_key_tables(key)
        sync_bits = sync_ops.build_sync_bits(tables, mode == SyncMode.CLIP)
        qualities = sync_ops.sync_score_sweep(S, have, sync_bits)
        means = sync_ops.local_mean(qualities)

        scores = [
            _SearchScore(index=t * Params.sync_search_step,
                         raw_quality=float(qualities[t]),
                         local_mean=float(means[t]))
            for t in range(qualities.size)
        ]

        scores = _select_local_maxima(scores)
        scores = _mask_avg_false_positives(scores)
        scores = _select_threshold_and_n_best(
            scores, Params.sync_threshold2 * 0.75)

        if mode == SyncMode.CLIP:
            n_max = max(Params.get_n_best, 5)
            scores = sorted(scores, key=lambda s: -s.abs_quality())[:n_max]

        # ---- refine: +-256 around each candidate in steps of 8,
        #      all candidates' fine positions in one batched device pass ----
        all_positions = []
        spans = []
        for score in scores:
            start = max(score.index - Params.sync_search_step, 0)
            end = score.index + Params.sync_search_step
            positions = np.arange(start, end + 1, Params.sync_search_fine)
            spans.append((len(all_positions),
                          len(all_positions) + positions.size))
            all_positions.extend(positions)
        quals_all = (sync_ops.refine_quality(
            samples, n_channels, np.asarray(all_positions, dtype=np.int64),
            sync_bits, silence_bounds)
            if all_positions else np.zeros(0, np.float32))

        refined = []
        for score, (lo, hi) in zip(scores, spans):
            positions = all_positions[lo:hi]
            quals = quals_all[lo:hi]
            best_quality = score.raw_quality
            best_index = score.index
            for pos, q in zip(positions, quals):
                if np.isnan(q):
                    continue
                if abs(q - score.local_mean) > abs(best_quality - score.local_mean):
                    best_quality = float(q)
                    best_index = int(pos)
            refined.append(_SearchScore(best_index, best_quality,
                                        score.local_mean))
        refined.sort(key=lambda s: s.index)

        refined = _select_threshold_and_n_best(refined, Params.sync_threshold2)
        refined.sort(key=lambda s: s.index)

        result = KeyResult(key=key)
        for s in refined:
            q = s.raw_quality - s.local_mean
            result.sync_scores.append(Score(
                index=s.index, quality=abs(q),
                block_type=ConvBlockType.a if q > 0 else ConvBlockType.b))
        key_results.append(result)
    return key_results
