"""Differential tests: ops/speed_fused.speed_scan (single-dispatch scan)
vs the staged oracle (ops/speed.prepare_mag_matrix + compare_speed_batch),
which in turn mirrors src/wmspeed.cc:204-382."""

import numpy as np
import pytest

from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.ops import speed as speed_ops
from audiowmark_tpu.ops import speed_fused
from audiowmark_tpu.tables import get_key_tables


@pytest.fixture(scope="module")
def sync_bits():
    return speed_ops.build_speed_sync_bits(get_key_tables(Key()))


def _staged(clip, centers, scan_seconds, rels, sync_bits):
    out = []
    for c in centers:
        D = speed_ops.prepare_mag_matrix(clip, 2, c, scan_seconds,
                                         sync_bits)
        out.append(speed_ops.compare_speed_batch(D, sync_bits, rels, c))
    return out


def test_fused_matches_staged(sync_bits):
    rng = np.random.RandomState(3)
    clip = (rng.randn(2 * 6 * 44100) * 0.3).astype(np.float32)
    centers = [0.95, 1.0, 1.0007 ** 33]      # incl. an off-grid center
    rels = [1.0007 ** p for p in range(-2, 3)]

    fused = speed_fused.speed_scan(clip, 2, centers, 4.0, rels, sync_bits)
    staged = _staged(clip, centers, 4.0, rels, sync_bits)

    for frow, srow in zip(fused, staged):
        for (qf, spf), (qs, sps) in zip(frow, srow):
            assert spf == pytest.approx(sps, abs=1e-12)
            assert qf == pytest.approx(qs, abs=1e-4)


def test_fused_truncation_matches_staged(sync_bits):
    """The scan_seconds/center input truncation must act exactly like the
    host path's slicing (a masked gather, not a shorter array)."""
    rng = np.random.RandomState(11)
    clip = (rng.randn(2 * 8 * 44100) * 0.2).astype(np.float32)
    centers = [0.85, 1.2]
    rels = [1.0]
    # scan window shorter than the clip for center > 1 and < 1
    fused = speed_fused.speed_scan(clip, 2, centers, 5.0, rels, sync_bits)
    staged = _staged(clip, centers, 5.0, rels, sync_bits)
    for frow, srow in zip(fused, staged):
        assert frow[0][0] == pytest.approx(srow[0][0], abs=1e-4)


def test_dense_resample_matches_gather(sync_bits, monkeypatch):
    """The TPU dense banded resample and the gather form must agree (the
    platform branch in ops/speed_fused._dense_resample); the dense band's
    extra columns carry exactly-zero coefficients, so only f32 reduction
    order differs."""
    from audiowmark_tpu.ops.speed_fused import speed_scan

    rng = np.random.RandomState(7)
    clip = (rng.randn(2 * 5 * 44100) * 0.25).astype(np.float32)
    centers = [0.93, 1.0, 1.1]
    rels = [1.0007 ** p for p in (-1, 0, 1)]
    monkeypatch.setenv("AUDIOWMARK_SPEED_DENSE", "0")
    gather = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    monkeypatch.setenv("AUDIOWMARK_SPEED_DENSE", "1")
    dense = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    for grow, drow in zip(gather, dense):
        for (qg, sg), (qd, sd) in zip(grow, drow):
            assert sd == sg
            assert qd == pytest.approx(qg, abs=1e-4)


def test_banded_compare_matches_flat(sync_bits, monkeypatch):
    """The TPU banded offset compare (contiguous band slices + static-view
    select) must agree with the flat per-element gather — it selects the
    exact same mag-matrix elements, so only masked-zero signs can differ."""
    from audiowmark_tpu.ops.speed_fused import speed_scan

    rng = np.random.RandomState(13)
    clip = (rng.randn(2 * 5 * 44100) * 0.25).astype(np.float32)
    centers = [0.9, 1.0, 1.0007 ** 17]
    rels = [1.0007 ** p for p in (-5, -1, 0, 2, 5)]
    monkeypatch.setenv("AUDIOWMARK_SPEED_BANDED", "0")
    flat = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    monkeypatch.setenv("AUDIOWMARK_SPEED_BANDED", "1")
    band = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    for frow, brow in zip(flat, band):
        for (qf, sf), (qb, sb) in zip(frow, brow):
            assert sb == sf
            assert qb == pytest.approx(qf, abs=1e-5)


def test_shift_compare_matches_flat(sync_bits, monkeypatch):
    """The round-5 TPU default: the shift-form compare (per-entry
    contiguous row-slice realignment + two shared-index row gathers)
    selects the exact same mag-matrix elements as the flat per-element
    gather, for EVERY rel — it needs no residual-bound precondition, so
    wild rels are included."""
    from audiowmark_tpu.ops.speed_fused import speed_scan

    rng = np.random.RandomState(19)
    clip = (rng.randn(2 * 5 * 44100) * 0.25).astype(np.float32)
    centers = [0.9, 1.0, 1.0007 ** 17]
    rels = [1.0007 ** p for p in (-5, -1, 0, 2, 5)] + [0.7, 1.4]
    monkeypatch.setenv("AUDIOWMARK_SPEED_SHIFT", "0")
    flat = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    monkeypatch.setenv("AUDIOWMARK_SPEED_SHIFT", "1")
    sh = speed_scan(clip, 2, centers, 3.0, rels, sync_bits)
    for frow, srow in zip(flat, sh):
        for (qf, sf), (qs, ss) in zip(frow, srow):
            assert ss == sf
            assert qs == pytest.approx(qf, abs=1e-5)


def test_banded_precondition_rejects_far_rels(sync_bits, monkeypatch):
    """A rel far from 1.0 breaks the residual bound; the proof must route
    it to the flat form (same results) instead of mis-selecting."""
    from audiowmark_tpu.ops.speed_fused import speed_scan

    rng = np.random.RandomState(17)
    clip = (rng.randn(2 * 3 * 44100) * 0.25).astype(np.float32)
    monkeypatch.setenv("AUDIOWMARK_SPEED_BANDED", "1")
    wild = speed_scan(clip, 2, [1.0], 2.0, [0.7, 1.0, 1.4], sync_bits)
    monkeypatch.setenv("AUDIOWMARK_SPEED_BANDED", "0")
    flat = speed_scan(clip, 2, [1.0], 2.0, [0.7, 1.0, 1.4], sync_bits)
    for (qw, sw), (qf, sf) in zip(wild[0], flat[0]):
        assert sw == sf and qw == pytest.approx(qf, abs=1e-5)


def test_fused_rejects_out_of_range_ratio(sync_bits):
    clip = np.zeros(2 * 44100, np.float32)
    with pytest.raises(ValueError):
        speed_fused.speed_scan(clip, 2, [0.5], 1.0, [1.0], sync_bits)
    with pytest.raises(ValueError):
        speed_fused.speed_scan(clip, 2, [2.5], 1.0, [1.0], sync_bits)


def test_fused_tiny_clip_returns_zero_quality(sync_bits):
    clip = np.zeros(2 * 512, np.float32)   # fewer than SUB_FRAME sub-frames
    out = speed_fused.speed_scan(clip, 2, [1.0], 1.0, [1.0], sync_bits)
    assert out == [[(0.0, 1.0)]]
