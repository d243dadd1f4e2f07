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
    x_flat = jnp.asarray(rng.randn(
        (tile + sync_ops.SHIFTS - 1) * sync_ops.HOP * 2).astype(np.float32))
    awin = jnp.asarray(analysis_window())
    dftm = jnp.asarray(sync_ops._dft_matrix())
    a = np.asarray(sync_ops._hop_spec_tile(x_flat, jnp.int32(0), awin, dftm,
                                           tile, False, 2))
    b = np.asarray(sync_ops._hop_spec_tile(x_flat, jnp.int32(0), awin, dftm,
                                           tile, True, 2))
    assert a.shape == b.shape == (tile, sync_ops.N_BANDS)
    # dB sums over channels; near-zero bins may differ by rounding in the
    # log domain — bound both absolute and typical deviation
    assert np.max(np.abs(a - b)) < 1.0, np.max(np.abs(a - b))
    assert np.mean(np.abs(a - b)) < 0.01


def test_block_raw_dft_matches_rfft():
    from audiowmark_tpu.crypto.keys import Key
    from audiowmark_tpu.models.decoder import _block_raw_batch_dev
    from audiowmark_tpu.params import Params
    from audiowmark_tpu.tables import get_key_tables

    tables = get_key_tables(Key())
    count = tables.frames_per_block
    rng = np.random.RandomState(4)
    x = jnp.asarray(
        (rng.randn((count + 2) * FRAME * 2) * 0.2).astype(np.float32))
    idx = jnp.asarray(np.array([0, 512], dtype=np.int32))
    awin = jnp.asarray(analysis_window())
    dftm = jnp.asarray(sync_ops._dft_matrix())
    lay_frame = jnp.asarray(tables.mix_frame.astype(np.int32))
    lay_up = jnp.asarray((tables.mix_up - Params.min_band).astype(np.int32))
    lay_dn = jnp.asarray((tables.mix_dn - Params.min_band).astype(np.int32))
    group = Params.bands_per_frame * Params.frames_per_bit
    args = (x, idx, awin, dftm, lay_frame, lay_up, lay_dn, count)
    a = np.asarray(_block_raw_batch_dev(*args, False, True, group, 2, 2))
    b = np.asarray(_block_raw_batch_dev(*args, True, True, group, 2, 2))
    scale = np.mean(np.abs(a)) + 1e-9
    assert np.max(np.abs(a - b)) / scale < 2e-3


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


def test_block_raw_batch_matches_host_oracle():
    """Device soft-bit extraction == host mix_or_linear_decode on the same
    dB definition (rfft path, CPU)."""
    from audiowmark_tpu.crypto.keys import Key
    from audiowmark_tpu.models import decoder as dec
    from audiowmark_tpu.tables import get_key_tables
    from audiowmark_tpu.params import Params

    tables = get_key_tables(Key())
    count = tables.frames_per_block
    rng = np.random.RandomState(7)
    n = (count + 8) * FRAME
    samples = (rng.randn(n * 2) * 0.2).astype(np.float32)
    indices = [0, 3 * FRAME]

    raw_map = dec._block_raw_batch(samples, 2, indices, tables)

    x = samples.reshape(-1, 2)
    awin = analysis_window()
    for i in indices:
        w = x[i:i + count * FRAME].reshape(count, FRAME, 2)
        w = np.swapaxes(w, 1, 2)
        spec = np.fft.rfft(w * awin[None, None, :], axis=-1)
        spec = spec[:, :, Params.min_band:Params.max_band + 1]
        a2 = np.abs(spec) ** 2
        db = np.where(a2 > 0, np.log2(a2) * 3.01029995663981,
                      np.float32(-500.0)).astype(np.float32)
        want = dec.mix_or_linear_decode(tables, db)
        got = raw_map[i]
        scale = np.mean(np.abs(want)) + 1e-9
        assert np.max(np.abs(got - want)) / scale < 2e-3, i
