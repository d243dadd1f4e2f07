"""Whole-file fused add path (ops/frames._add_file_core): must match the
streaming tile path sample-for-sample (quantization-exact without the
limiter; within one output LSB with it — the device fuses the limiter ramp
multiply-add, reassociating the float math) and must print the reference's
data-block count (src/wmadd.cc:520-588 one-frame pad loop, NOT our tile
padding)."""

import contextlib
import io

import numpy as np
import pytest

from audiowmark_tpu.cli import test_gen_noise as gen_noise
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.models import embedder as emb
from audiowmark_tpu.params import Params


@pytest.fixture(autouse=True)
def _reset_params():
    Params.reset()
    yield
    Params.reset()


def _add_both(tmp_path, secs, bits, no_limiter, payload="f0" * 16):
    key = Key()
    src = str(tmp_path / "in.wav")
    fast = str(tmp_path / "fast.wav")
    slow = str(tmp_path / "slow.wav")
    Params.test_no_limiter = no_limiter
    gen_noise(key, src, secs, 44100, bits)
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert emb.add_watermark(key, src, fast, payload) == 0
    fast_info = buf.getvalue()
    saved = emb._FAST_PATH_MAX_FRAMES
    emb._FAST_PATH_MAX_FRAMES = 0          # force the streaming tile path
    try:
        with contextlib.redirect_stderr(io.StringIO()):
            assert emb.add_watermark(key, src, slow, payload) == 0
    finally:
        emb._FAST_PATH_MAX_FRAMES = saved
    return fast, slow, fast_info


def test_fast_path_bit_exact_no_limiter(tmp_path):
    fast, slow, _ = _add_both(tmp_path, 20, 16, no_limiter=True)
    assert open(fast, "rb").read() == open(slow, "rb").read()


def test_fast_path_one_lsb_with_limiter(tmp_path):
    fast, slow, _ = _add_both(tmp_path, 20, 16, no_limiter=False)
    a = WavData.load(fast).samples
    b = WavData.load(slow).samples
    d = np.abs(a - b)
    assert d.max() <= 2.0 ** -15 + 1e-9      # one 16-bit LSB
    assert (d > 0).mean() < 0.001


def test_fast_path_24bit_float_close(tmp_path):
    fast, slow, _ = _add_both(tmp_path, 7, 24, no_limiter=False)
    a = WavData.load(fast).samples
    b = WavData.load(slow).samples
    assert np.abs(a - b).max() <= 2.0 ** -22


def test_data_blocks_matches_reference_count(tmp_path):
    """120 s: boundaries at generator frames 250/2476/4702 within the
    reference's ~5256-frame feed -> m=3 -> prints 2 (the old tile padding
    overcounted to 3)."""
    _, _, info = _add_both(tmp_path, 120, 16, no_limiter=False)
    assert "Data Blocks:  2" in info


def test_ref_gen_frame_count_no_limiter():
    # without the limiter only the 1-frame synth latency pads
    from audiowmark_tpu.models.embedder import _ref_gen_frame_count
    from audiowmark_tpu.ops.frames import FRAME
    n = 10 * FRAME
    assert _ref_gen_frame_count(n, True, 44100) == 11
    assert _ref_gen_frame_count(0, True, 44100) == 0


def test_data_blocks_streaming_path_matches(tmp_path):
    """The streaming tile path (batched zero drain + generator-frame cap)
    prints the same reference count as the fast path."""
    key = Key()
    src = str(tmp_path / "in.wav")
    out = str(tmp_path / "out.wav")
    gen_noise(key, src, 120, 44100, 16)
    saved = emb._FAST_PATH_MAX_FRAMES
    emb._FAST_PATH_MAX_FRAMES = 0
    try:
        buf = io.StringIO()
        with contextlib.redirect_stderr(buf):
            assert emb.add_watermark(key, src, out, "f0" * 16) == 0
    finally:
        emb._FAST_PATH_MAX_FRAMES = saved
    assert "Data Blocks:  2" in buf.getvalue()


def test_data_blocks_resampled_matches_simulation(tmp_path):
    """Resampled input: the printed count equals the boundary count within
    the reference-loop simulation's generator budget (the tile drain must
    not overshoot it)."""
    from audiowmark_tpu.ops.frames import FRAME
    from audiowmark_tpu.tables import get_key_tables

    key = Key()
    src = str(tmp_path / "in32.wav")
    out = str(tmp_path / "out32.wav")
    gen_noise(key, src, 75, 32000, 16)
    buf = io.StringIO()
    with contextlib.redirect_stderr(buf):
        assert emb.add_watermark(key, src, out, "f0" * 16) == 0

    cap = emb._ref_generator_frame_cap(
        75 * 32000, 32000, False, 32000 * 1000 // 1000)
    fpb = get_key_tables(key).frames_per_block
    start = 2 * fpb - Params.frames_pad_start
    t = np.arange(cap)
    m = int(np.sum((start + t + 1) % fpb == 0))
    assert ("Data Blocks:  %d" % max(m - 1, 0)) in buf.getvalue()
