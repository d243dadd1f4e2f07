"""Quality harness pieces: the `add --snr` production path (reference
src/wmadd.cc:553-592) and the NMR proxy in tools/quality_report.py."""

import contextlib
import io
import os
import re
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from audiowmark_tpu.cli import main as cli_main
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.params import Params
from tools.quality_report import nmr_db

PATTERN = "4e1243bd22c66e76c2ba9eddc1f91394"


def run(args):
    Params.reset()
    return cli_main(args)


def test_add_snr_matches_test_snr(tmp_path, capsys):
    """`add --snr` measures the PRE-limiter watermark delta (reference
    src/wmadd.cc:553-561 accumulates before limiter.process); with the
    limiter disabled it must equal what `test-snr` computes from the two
    files (up to 16-bit quantization)."""
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    assert run(["test-gen-noise", src, "10", "44100"]) == 0

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert run(["add", src, dst, PATTERN]) == 0   # no --snr: no line
    assert "SNR" not in err.getvalue()

    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert run(["add", src, dst, PATTERN, "--snr",
                    "--test-no-limiter"]) == 0
    m = re.search(r"SNR:\s+([-0-9.]+) dB", err.getvalue())
    assert m, err.getvalue()
    inline = float(m.group(1))

    assert run(["test-snr", src, dst]) == 0
    offline = float(capsys.readouterr().out.strip())
    assert inline == pytest.approx(offline, abs=0.1)
    assert inline >= 20.0        # default strength keeps SNR high

    # with the limiter on, inline stays the pre-limiter measure: the
    # file-based ratio additionally sees the limiter's gain modulation,
    # so it can only be lower on a hot carrier
    err = io.StringIO()
    with contextlib.redirect_stderr(err):
        assert run(["add", src, dst, PATTERN, "--snr"]) == 0
    m = re.search(r"SNR:\s+([-0-9.]+) dB", err.getvalue())
    assert float(m.group(1)) == pytest.approx(inline, abs=0.1)
    assert run(["test-snr", src, dst]) == 0
    assert float(capsys.readouterr().out.strip()) <= inline + 0.1


def test_nmr_orders_delta_loudness(tmp_path):
    """NMR is -inf for identical signals and strictly increases when the
    same-shaped delta is made louder."""
    rng = np.random.RandomState(7)
    n = 44100
    orig = (rng.randn(2 * n) * 0.1).astype(np.float32)
    assert nmr_db(orig, orig, 2) == float("-inf")

    delta = (rng.randn(2 * n) * 1e-3).astype(np.float32)
    quiet = nmr_db(orig, orig + delta, 2)
    loud = nmr_db(orig, orig + 10 * delta, 2)
    assert np.isfinite(quiet) and np.isfinite(loud)
    assert loud == pytest.approx(quiet + 20.0, abs=0.5)


def test_nmr_default_strength_below_mask(tmp_path):
    """The default-strength watermark should sit below the masked
    threshold (NMR < 0) on a headroom noise carrier — the property
    QUALITY.md asserts at report time.  (At FULL scale the limiter's
    broadband gain riding dominates the file delta and NMR measures the
    limiter instead — quality_report.gen_noise scales to 0.6 peak.)"""
    src = str(tmp_path / "in.wav")
    dst = str(tmp_path / "out.wav")
    assert run(["test-gen-noise", src, "5", "44100"]) == 0
    w = WavData.load(src)
    WavData((w.samples * (0.6 / np.max(np.abs(w.samples)))).astype(
        np.float32), w.n_channels, w.sample_rate, w.bit_depth).save(src)
    assert run(["add", src, dst, PATTERN]) == 0
    a = WavData.load(src)
    b = WavData.load(dst)
    assert nmr_db(a.samples, b.samples, a.n_channels) < 0.0
