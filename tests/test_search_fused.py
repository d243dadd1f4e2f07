"""Fused single-dispatch sync search vs the staged multi-dispatch path.

The fused kernel (ops/search_fused.py) must reproduce the staged path's
candidate selection exactly: same indices, same block types, qualities to
float tolerance — on plain noise, on watermarked audio (real sync peaks),
in CLIP mode with zero-padding/silence bounds, and on bucketed lengths
where the kernel's static shapes exceed the true signal extent."""

import numpy as np
import pytest

from audiowmark_tpu.cli import test_gen_noise as gen_noise
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.models import syncfinder
from audiowmark_tpu.models.embedder import add_watermark
from audiowmark_tpu.models.syncfinder import SyncMode
from audiowmark_tpu.params import Params
from audiowmark_tpu.utils.devcache import register_padded


@pytest.fixture(autouse=True)
def _reset_params():
    Params.reset()
    yield
    Params.reset()


def _assert_same(fused, staged):
    assert len(fused) == len(staged)
    for kf, ks in zip(fused, staged):
        got = [(s.index, s.block_type) for s in kf.sync_scores]
        want = [(s.index, s.block_type) for s in ks.sync_scores]
        assert got == want
        qf = np.array([s.quality for s in kf.sync_scores])
        qs = np.array([s.quality for s in ks.sync_scores])
        if qf.size:
            np.testing.assert_allclose(qf, qs, rtol=2e-4, atol=2e-5)


def _wm_wav(tmp_path, secs, name="in"):
    key = Key()
    src = str(tmp_path / ("%s.wav" % name))
    out = str(tmp_path / ("%s_wm.wav" % name))
    gen_noise(key, src, secs, 44100, 16)
    assert add_watermark(key, src, out, "f0" * 16) == 0
    return key, WavData.load(out)


@pytest.mark.slow
def test_block_search_matches_staged_watermarked(tmp_path):
    key, wav = _wm_wav(tmp_path, 70)
    fused = syncfinder.search([key], wav, SyncMode.BLOCK)
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(fused, staged)
    assert len(fused[0].sync_scores) >= 1


def test_block_search_matches_staged_noise(tmp_path):
    key = Key()
    src = str(tmp_path / "n.wav")
    gen_noise(key, src, 60, 44100, 16)
    wav = WavData.load(src)
    fused = syncfinder.search([key], wav, SyncMode.BLOCK)
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(fused, staged)
    # noise still yields n_best candidates (threshold floor keeps n_best)
    assert len(fused[0].sync_scores) == Params.get_n_best


def test_block_search_odd_length_bucketing(tmp_path):
    """A length far from the bucket boundary: dynamic true-extent masking
    must reproduce the staged path's edge behavior (local-mean counts,
    boundary maxima) exactly."""
    key = Key()
    src = str(tmp_path / "n.wav")
    gen_noise(key, src, 57, 44100, 16)
    wav = WavData.load(src)
    # chop to a non-frame-aligned sample count
    wav.set_samples(wav.samples[: wav.samples.size - 2 * 777])
    fused = syncfinder.search([key], wav, SyncMode.BLOCK)
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(fused, staged)


@pytest.mark.slow
def test_clip_search_matches_staged(tmp_path):
    """CLIP mode: zero-padded window with silence bounds, 170 sync
    positions per bit, candidate truncation to max(n_best, 5)."""
    from audiowmark_tpu.ops.frames import FRAME
    from audiowmark_tpu.tables import get_key_tables

    key, wav = _wm_wav(tmp_path, 30, name="clip")
    tables = get_key_tables(key)
    n = (tables.frames_per_block + 5) * FRAME * wav.n_channels
    last = min(n, wav.n_values)
    pad_start = n + (n - last)
    ext = np.concatenate([np.zeros(pad_start, np.float32),
                          wav.samples[:last], np.zeros(n, np.float32)])
    register_padded(ext, wav.samples, 0, last, pad_start, n)
    lwav = wav.with_samples(ext)
    fused = syncfinder.search([key], lwav, SyncMode.CLIP)
    staged = syncfinder.search_staged([key], lwav, SyncMode.CLIP)
    _assert_same(fused, staged)
    assert len(fused[0].sync_scores) >= 1


@pytest.mark.slow
def test_clip_pair_matches_per_window(tmp_path):
    """The clip decoder's start/end windows searched in ONE vmapped
    dispatch (search_clip_pair) must equal the per-window searches."""
    from audiowmark_tpu.models.decoder import ClipDecoder

    key, wav = _wm_wav(tmp_path, 70, name="pair")
    dec = ClipDecoder(1)
    windows = [dec._build_window([key], wav, pos)
               for pos in ("start", "end")]
    assert all(w is not None for w in windows)
    wavs = [w for w, _ in windows]
    pair = syncfinder.search_clip_pair([key], wavs)
    assert pair is not None
    for i, lwav in enumerate(wavs):
        single = syncfinder.search([key], lwav, SyncMode.CLIP)
        _assert_same(pair[i], single)
    assert any(len(kr.sync_scores) for per_win in pair for kr in per_win)


def _assert_raws_match(key, wav, scores, clip):
    """Every in-range score's kernel-extracted raws must equal the
    decoder's standalone extraction batch (shared core: ops/extract.py)."""
    from audiowmark_tpu.models.decoder import _block_raw_batch
    from audiowmark_tpu.ops.frames import FRAME
    from audiowmark_tpu.tables import get_key_tables

    tables = get_key_tables(key)
    cnt = tables.frames_per_block * FRAME
    nsf = wav.samples.size // wav.n_channels
    indices = [i for s in scores
               for i in ((s.index, s.index + cnt) if clip else (s.index,))]
    raw_map = _block_raw_batch(wav.samples, wav.n_channels, indices, tables)
    checked = 0
    for s in scores:
        if s.index + cnt <= nsf:
            np.testing.assert_allclose(s.raw, raw_map[s.index],
                                       rtol=1e-5, atol=1e-5)
            checked += 1
        if clip and s.index + 2 * cnt <= nsf:
            np.testing.assert_allclose(s.raw2, raw_map[s.index + cnt],
                                       rtol=1e-5, atol=1e-5)
            checked += 1
    assert checked >= 1


def test_fused_block_raws_match_extraction_batch(tmp_path):
    """The searcher's chained raw soft bits (Score.raw) equal the decoder's
    separate _block_raw_batch dispatch — the CLI decode path skips that
    round trip only because they are interchangeable."""
    key = Key()
    src = str(tmp_path / "n.wav")
    gen_noise(key, src, 60, 44100, 16)
    wav = WavData.load(src)
    fused = syncfinder.search([key], wav, SyncMode.BLOCK)
    scores = fused[0].sync_scores
    assert scores and all(s.raw is not None for s in scores)
    _assert_raws_match(key, wav, scores, clip=False)


@pytest.mark.slow
def test_fused_clip_raws_match_extraction_batch(tmp_path):
    """CLIP-mode scores carry BOTH consecutive blocks' raws (raw/raw2)."""
    from audiowmark_tpu.models.decoder import ClipDecoder

    key, wav = _wm_wav(tmp_path, 40, name="rawclip")
    lwav, _ = ClipDecoder(1)._build_window([key], wav, "start")
    fused = syncfinder.search([key], lwav, SyncMode.CLIP)
    scores = fused[0].sync_scores
    assert scores and all(s.raw is not None and s.raw2 is not None
                          for s in scores)
    _assert_raws_match(key, lwav, scores, clip=True)


def test_short_stream_returns_empty():
    key = Key()
    wav = WavData(np.zeros(44100 * 2, np.float32), 2, 44100, 16)
    fused = syncfinder.search([key], wav, SyncMode.BLOCK)
    assert fused[0].sync_scores == []
