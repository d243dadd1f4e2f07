"""Device-transfer cache: int16 fast-path predicate and padded assembly."""

import numpy as np

from audiowmark_tpu.utils.devcache import device_audio, i16_grid, \
    register_padded


def test_i16_grid_accepts_full_int16_range():
    # -32768 decodes to exactly -1.0 from 16-bit PCM; it must stay on the
    # int16 transfer path (a float32 fallback doubles the bytes moved)
    x = (np.array([-32768, -1, 0, 1, 32767], np.int16)
         .astype(np.float32) / 32768.0)
    i16 = i16_grid(x)
    assert i16 is not None
    assert i16.dtype == np.int16
    assert np.array_equal(i16, [-32768, -1, 0, 1, 32767])


def test_i16_grid_rejects_off_grid():
    assert i16_grid(np.array([0.5 / 32768.0], np.float32)) is None
    assert i16_grid(np.array([1.0], np.float32)) is None          # +32768
    assert i16_grid(np.array([-1.0000302], np.float32)) is None   # < -32768


def test_device_audio_roundtrip_includes_minus_one():
    x = (np.array([-32768, 123, -456, 32767], np.int16)
         .astype(np.float32) / 32768.0)
    dev = device_audio(x)
    assert np.array_equal(np.asarray(dev), x)
    assert device_audio(x) is dev          # cached by identity


def test_register_padded_assembles_from_base():
    base = (np.arange(-5, 5, dtype=np.float32)) / 32768.0
    ext = np.concatenate([np.zeros(3, np.float32), base[2:8],
                          np.zeros(2, np.float32)])
    register_padded(ext, base, 2, 8, 3, 2)
    assert np.array_equal(np.asarray(device_audio(ext)), ext)
