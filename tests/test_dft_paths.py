"""The TPU band-restricted DFT-matmul spectrogram paths must agree with the
rfft reference paths (same windows, same bands) to sub-dB sums — the MXU
fast path may not drift from the reference's FFTW-derived dB definition
(src/wmcommon.cc:91-141, src/wmspeed.cc:204-268)."""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from audiowmark_tpu.ops import speed as speed_ops
from audiowmark_tpu.ops import sync as sync_ops
from audiowmark_tpu.ops.frames import FRAME, analysis_window


def test_hop_tile_dft_matches_rfft():
    rng = np.random.RandomState(3)
    tile = 64
    xc = jnp.asarray(rng.randn(tile + sync_ops.SHIFTS - 1, sync_ops.HOP,
                               2).astype(np.float32))
    awin = jnp.asarray(analysis_window())
    dftm = jnp.asarray(sync_ops._dft_matrix())
    a = np.asarray(sync_ops._hop_spec_tile(xc, jnp.int32(0), awin, dftm,
                                           tile, False))
    b = np.asarray(sync_ops._hop_spec_tile(xc, jnp.int32(0), awin, dftm,
                                           tile, True))
    assert a.shape == b.shape == (tile, sync_ops.N_BANDS)
    # dB sums over channels; near-zero bins may differ by rounding in the
    # log domain — bound both absolute and typical deviation
    assert np.max(np.abs(a - b)) < 1.0, np.max(np.abs(a - b))
    assert np.mean(np.abs(a - b)) < 0.01


def test_block_db_dft_matches_rfft():
    from audiowmark_tpu.models.decoder import _block_db_batch_dev
    rng = np.random.RandomState(4)
    count = 16
    x = jnp.asarray(rng.randn(count * FRAME + 512, 2).astype(np.float32))
    idx = jnp.asarray(np.array([0, 512], dtype=np.int32))
    awin = jnp.asarray(analysis_window())
    dftm = jnp.asarray(sync_ops._dft_matrix())
    a = np.asarray(_block_db_batch_dev(x, idx, awin, dftm, count, False))
    b = np.asarray(_block_db_batch_dev(x, idx, awin, dftm, count, True))
    assert np.max(np.abs(a - b)) < 1.0
    assert np.mean(np.abs(a - b)) < 0.01


def test_speed_mag_matrix_dft_matches_rfft():
    rng = np.random.RandomState(5)
    w = jnp.asarray(rng.randn(48, 2, speed_ops.SUB_FRAME).astype(np.float32))
    win = jnp.asarray(speed_ops._sub_window())
    dftm = jnp.asarray(speed_ops._sub_dft_matrix())
    v = jnp.asarray((rng.rand(40, speed_ops.N_BANDS) < 0.3)
                    .astype(np.float32))
    a = np.asarray(speed_ops._mag_matrix_core(w, win, dftm, v, False))
    b = np.asarray(speed_ops._mag_matrix_core(w, win, dftm, v, True))
    scale = np.mean(np.abs(a)) + 1e-9
    assert np.max(np.abs(a - b)) / scale < 0.01
