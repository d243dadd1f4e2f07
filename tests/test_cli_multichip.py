"""Multi-chip through the production CLI get path.

With >1 device, `get` searches device-count chunks of a long file in ONE
dp-sharded dispatch (syncfinder.search_block_group); output must be
IDENTICAL to the single-device chunk-by-chunk run (reference analogue:
the ThreadPool fan-out inside the sync search, src/syncfinder.cc:607-657,
which also never changes results).
"""

import contextlib
import io
import os

import numpy as np
import pytest

from audiowmark_tpu import tables as tables_mod
from audiowmark_tpu.cli import test_gen_noise as gen_noise
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.models import syncfinder
from audiowmark_tpu.models.embedder import add_watermark
from audiowmark_tpu.models.getter import get_watermark
from audiowmark_tpu.models.syncfinder import SyncMode
from audiowmark_tpu.params import Params


@pytest.fixture(autouse=True)
def _reset_params():
    Params.reset()
    tables_mod.clear_cache()
    yield
    Params.reset()
    tables_mod.clear_cache()


def test_search_block_group_matches_single(tmp_path, monkeypatch):
    """One sharded group dispatch over 2 chunks == 2 single searches."""
    monkeypatch.setattr(syncfinder, "group_device_count", lambda: 2)
    key = Key()
    src = str(tmp_path / "n.wav")
    wm = str(tmp_path / "wm.wav")
    gen_noise(key, src, 60, 44100, 16)
    assert add_watermark(key, src, wm, "f0" * 16) == 0
    wav_a = WavData.load(wm)
    wav_b = WavData.load(src)
    # unequal lengths: the group kernel masks each chunk's true extent
    wav_b.set_samples(wav_b.samples[: wav_b.samples.size - 2 * 4321])

    group = syncfinder.search_block_group([key], [wav_a, wav_b])
    assert group is not None
    for wav, got in zip((wav_a, wav_b), group):
        want = syncfinder.search([key], wav, SyncMode.BLOCK)
        assert len(got) == len(want) == 1
        g = [(s.index, s.block_type) for s in got[0].sync_scores]
        w = [(s.index, s.block_type) for s in want[0].sync_scores]
        assert g == w
        qg = np.array([s.quality for s in got[0].sync_scores])
        qw = np.array([s.quality for s in want[0].sync_scores])
        np.testing.assert_allclose(qg, qw, rtol=2e-4, atol=2e-5)
    assert len(group[0][0].sync_scores) >= 1


@pytest.mark.slow
def test_chunked_get_multichip_matches_single(tmp_path, monkeypatch):
    """End-to-end: a multi-chunk get with the sharded group search prints
    byte-identical output to the single-device chunk loop."""
    # reduced geometry so chunks are small (block ~21 s, overlap ~55 s)
    Params.payload_short = 12
    Params.payload_size = 12
    Params.sync_frames_per_bit = 10
    tables_mod.clear_cache()

    key = Key()
    src = str(tmp_path / "long.wav")
    wm = str(tmp_path / "long_wm.wav")
    gen_noise(key, src, 240, 44100, 16)
    assert add_watermark(key, src, wm, "abc") == 0

    Params.get_chunk_size = 2.0     # minutes; 240 s -> 3+ chunks

    calls = {"group": 0}
    orig_group = syncfinder.search_block_group

    def counting_group(key_list, wavs):
        r = orig_group(key_list, wavs)
        if r is not None:
            calls["group"] += 1
        return r

    # getter resolves the symbol from the module at call time
    monkeypatch.setattr(syncfinder, "search_block_group", counting_group)

    def run(multichip):
        monkeypatch.setenv("AUDIOWMARK_MULTICHIP", "1" if multichip else "0")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = get_watermark([key], wm, "abc")
        assert rc == 0, buf.getvalue()
        return buf.getvalue()

    out_multi = run(True)
    n_group = calls["group"]
    out_single = run(False)
    assert calls["group"] == n_group      # disabled path never groups
    assert n_group >= 1                   # enabled path actually grouped
    assert out_multi == out_single
    assert "pattern" in out_multi


@pytest.mark.slow
def test_chunked_get_multichip_with_speed_matches_single(tmp_path,
                                                         monkeypatch):
    """Speed flags no longer disable chunk grouping (round-3 review weak
    #4/#7): a multi-chunk get with --try-speed runs the sharded group
    search AND the per-chunk speed decode, byte-identical to the
    single-device run."""
    Params.payload_short = 12
    Params.payload_size = 12
    Params.sync_frames_per_bit = 10
    tables_mod.clear_cache()

    key = Key()
    src = str(tmp_path / "long.wav")
    wm = str(tmp_path / "long_wm.wav")
    gen_noise(key, src, 240, 44100, 16)
    assert add_watermark(key, src, wm, "abc") == 0

    Params.get_chunk_size = 2.0     # minutes; 240 s -> 3+ chunks
    Params.try_speed = 0.9995

    calls = {"group": 0}
    orig_group = syncfinder.search_block_group

    def counting_group(key_list, wavs):
        r = orig_group(key_list, wavs)
        if r is not None:
            calls["group"] += 1
        return r

    monkeypatch.setattr(syncfinder, "search_block_group", counting_group)

    def run(multichip):
        monkeypatch.setenv("AUDIOWMARK_MULTICHIP", "1" if multichip else "0")
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            rc = get_watermark([key], wm, "abc")
        assert rc == 0, buf.getvalue()
        return buf.getvalue()

    out_multi = run(True)
    assert calls["group"] >= 1            # speed flags group now
    out_single = run(False)
    assert out_multi == out_single
    assert "pattern" in out_multi
