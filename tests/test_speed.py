"""Replay-speed detection tests (reference: tests/detect-speed-test.sh)."""

import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0" * 16


def run(args):
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def speed_wavs(tmp_path_factory):
    d = tmp_path_factory.mktemp("speed")
    noise = str(d / "n.wav")
    wm = str(d / "wm.wav")
    Params.reset()
    assert main(["test-gen-noise", noise, "30", "44100"]) == 0
    Params.reset()
    assert main(["--strict", "add", noise, wm, MSG]) == 0
    return d, wm


def test_test_speed_command(capsys):
    assert run(["test-speed", "--test-key", "4", "42"]) == 0
    v = float(capsys.readouterr().out.strip())
    assert 0.85 <= v <= 1.15


@pytest.mark.slow
def test_detect_speed_0_9764(speed_wavs, capsys):
    d, wm = speed_wavs
    spd = str(d / "spd.wav")
    assert run(["test-change-speed", wm, spd, "0.9764"]) == 0
    rc = run(["--strict", "cmp", spd, MSG, "--detect-speed",
              "--test-speed", "0.9764"])
    out = capsys.readouterr().out
    assert rc == 0, out
    # detection diagnostic: speed within 0.05% of ground truth
    line = [ln for ln in out.splitlines() if ln.startswith("detect_speed")][0]
    _, speed, quality, delta = line.split()
    assert abs(float(speed) - 0.9764) / 0.9764 < 0.0005
    assert float(quality) > 0.4
    assert "-SPEED" in out  # speed-corrected patterns reported


@pytest.mark.slow
@pytest.mark.parametrize("patient", [False, True])
@pytest.mark.parametrize("speed", ["0.9764", "1.0", "1.01"])
def test_detect_speed_grid(speed_wavs, capsys, speed, patient):
    """Full e2e parity grid of /root/reference/tests/detect-speed-test.sh:
    speeds 0.9764/1.0/1.01 x {normal, patient}; each cell must report a
    match (audiowmark_cmp asserts rc 0).  Patient mode runs the deeper
    scan1 {50 s, 1.00035, 11, 28} with n_best 15
    (src/wmspeed.cc:649-662)."""
    d, wm = speed_wavs
    spd = str(d / ("grid_%s.wav" % speed))
    assert run(["test-change-speed", wm, spd, speed]) == 0
    flag = "--detect-speed-patient" if patient else "--detect-speed"
    rc = run(["--strict", "cmp", spd, MSG, flag, "--test-speed", speed])
    out = capsys.readouterr().out
    assert rc == 0, out


@pytest.mark.slow
def test_try_speed(speed_wavs, capsys):
    d, wm = speed_wavs
    spd = str(d / "spd2.wav")
    assert run(["test-change-speed", wm, spd, "1.01"]) == 0
    rc = run(["--strict", "cmp", spd, MSG, "--try-speed", "1.01"])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "speed 1.01" in out
