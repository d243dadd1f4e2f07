"""Tiled fused sync search (streams beyond MAX_FUSED_FRAMES) vs oracles.

The production 30-minute chunk exceeds the single-dispatch kernel's frame
cap, so the BLOCK search runs as overlapping fixed-shape tiles with
disjoint eligibility cores and a merged host selection
(models/syncfinder._search_fused_tiled).  Forcing a small cap makes a
short file take the tile path, which must reproduce (a) the staged
multi-dispatch oracle and (b) the unbounded single-dispatch kernel.
Workload analogue: src/wavchunkloader.cc:74-97 chunks feeding
src/syncfinder.cc:172-458.

The BLOCK sync pattern spans a whole block (total_frames = 2226), so a
tile must exceed that; caps here sit just above one block span to force
several tiles out of a ~1-minute file.
"""

import numpy as np
import pytest

from audiowmark_tpu.cli import test_gen_noise as gen_noise
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.models import syncfinder
from audiowmark_tpu.models.embedder import add_watermark
from audiowmark_tpu.models.syncfinder import SyncMode
from audiowmark_tpu.ops import search_fused
from audiowmark_tpu.params import Params


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


def _tiled(monkeypatch, wav, key, cap):
    monkeypatch.setattr(search_fused, "MAX_FUSED_FRAMES", cap)
    r = syncfinder.search([key], wav, SyncMode.BLOCK)
    monkeypatch.undo()
    return r


def test_tiled_matches_staged_noise(tmp_path, monkeypatch):
    """Plain noise across 2 tiles: merged selection must equal the staged
    path (n_best fill from below-threshold candidates crosses cores)."""
    key = Key()
    src = str(tmp_path / "n.wav")
    gen_noise(key, src, 60, 44100, 16)
    wav = WavData.load(src)
    fused = _tiled(monkeypatch, wav, key, 2560)   # 60 s -> 2 tiles
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(fused, staged)
    assert len(fused[0].sync_scores) == Params.get_n_best


@pytest.mark.slow
def test_tiled_matches_staged_watermarked(tmp_path, monkeypatch):
    """Real sync peaks spread across tile cores; the watermarked stream
    must yield identical candidates through tiles, the unbounded fused
    kernel, and the staged oracle."""
    key = Key()
    src = str(tmp_path / "in.wav")
    out = str(tmp_path / "wm.wav")
    gen_noise(key, src, 130, 44100, 16)
    assert add_watermark(key, src, out, "f0" * 16) == 0
    wav = WavData.load(out)
    whole = syncfinder.search([key], wav, SyncMode.BLOCK)
    tiled = _tiled(monkeypatch, wav, key, 4096)   # 130 s -> 2 tiles
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(tiled, staged)
    _assert_same(tiled, whole)
    assert len(tiled[0].sync_scores) >= 2


@pytest.mark.slow
def test_tiled_odd_length_last_tile(tmp_path, monkeypatch):
    """Non-frame-aligned length: the last tile's dynamic extent masking
    (edge local-mean counts, refine validity) must match the staged path."""
    key = Key()
    src = str(tmp_path / "n.wav")
    gen_noise(key, src, 70, 44100, 16)
    wav = WavData.load(src)
    wav.set_samples(wav.samples[: wav.samples.size - 2 * 1337])
    fused = _tiled(monkeypatch, wav, key, 2560)   # 3 tiles, ragged last
    staged = syncfinder.search_staged([key], wav, SyncMode.BLOCK)
    _assert_same(fused, staged)
