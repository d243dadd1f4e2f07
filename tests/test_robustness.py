"""Robustness under additive-noise attack (self-hosted proxy for the
reference's MP3/Ogg robustness claims: the watermark survives distortion
well above its own -32 dB level)."""

import os

import numpy as np
import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.io.wavdata import WavData
from audiowmark_tpu.params import Params

MSG = "f0" * 16


def run(args):
    Params.reset()
    return main(args)


@pytest.mark.slow
def test_additive_noise_attack(tmp_path, capsys):
    noise = str(tmp_path / "n.wav")
    wm = str(tmp_path / "wm.wav")
    att = str(tmp_path / "att.wav")
    assert run(["test-gen-noise", noise, "120", "44100"]) == 0
    assert run(["--strict", "add", noise, wm, MSG]) == 0

    Params.reset()
    wav = WavData.load(wm)
    rng = np.random.RandomState(1)
    sig_pow = float(np.mean(wav.samples.astype(np.float64) ** 2))
    snr_db = 25.0  # attack noise ~7 dB STRONGER than the watermark itself
    noise_pow = sig_pow / 10 ** (snr_db / 10)
    attacked = wav.samples + rng.normal(
        0, np.sqrt(noise_pow), wav.n_values).astype(np.float32)
    WavData(attacked, 2, 44100, 16).save(att)

    rc = run(["cmp", att, MSG])
    out = capsys.readouterr().out
    assert rc == 0, out
    # every true pattern still recovered (A, B, AB, all + 2 CLIP on 120 s)
    assert "match_count 6" in out, out
