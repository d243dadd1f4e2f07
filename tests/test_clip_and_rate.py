"""Clip decoder and sample-rate robustness tests
(reference: tests/clip-decoder-test.sh, tests/sample-rate-test.sh)."""

import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0f0"


def run(args):
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def clip_marked(tmp_path_factory):
    """30 s noise, watermarked (clip decoder territory: < 1 block)."""
    d = tmp_path_factory.mktemp("clip")
    noise = str(d / "noise.wav")
    wm = str(d / "wm.wav")
    Params.reset()
    assert main(["test-gen-noise", noise, "30", "44100"]) == 0
    Params.reset()
    assert main(["--strict", "add", noise, wm, MSG]) == 0
    return wm


def test_clip_decoder(clip_marked, capsys):
    rc = run(["--strict", "cmp", "--expect-matches", "1", clip_marked, MSG])
    out = capsys.readouterr().out
    assert "match_count 1" in out, out
    assert rc == 0
    assert "CLIP-" in out


def test_clip_decoder_after_cut(clip_marked, tmp_path, capsys):
    cut = str(tmp_path / "cut.wav")
    assert run(["cut-start", clip_marked, cut, "44300"]) == 0
    rc = run(["--strict", "cmp", "--expect-matches", "1", cut, MSG])
    out = capsys.readouterr().out
    assert "match_count 1" in out, out
    assert rc == 0


@pytest.mark.slow
def test_sample_rate_32k(tmp_path, capsys):
    """32 kHz input: embed resamples to 44.1k internally; decode resamples
    back (reference: tests/sample-rate-test.sh)."""
    noise = str(tmp_path / "noise32.wav")
    wm = str(tmp_path / "wm32.wav")
    assert run(["test-gen-noise", noise, "200", "32000"]) == 0
    assert run(["--strict", "add", noise, wm, MSG]) == 0
    rc = run(["--strict", "cmp", "--expect-matches", "5", wm, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0

    # resample the watermarked file to 48 kHz and decode again
    wm48 = str(tmp_path / "wm48.wav")
    assert run(["test-resample", wm, wm48, "48000"]) == 0
    rc = run(["--strict", "cmp", "--expect-matches", "5", wm48, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0
