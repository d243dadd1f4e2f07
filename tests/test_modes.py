"""Alternative embedding/decoding modes: --linear, --hard, --frames-per-bit
(reference options in parse_shared_options / parse_get_options)."""

import pytest

from audiowmark_tpu.cli import main
from audiowmark_tpu.params import Params

MSG = "f0" * 16


def run(args):
    Params.reset()
    return main(args)


@pytest.fixture(scope="module")
def noise200(tmp_path_factory):
    d = tmp_path_factory.mktemp("modes")
    path = str(d / "noise.wav")
    Params.reset()
    assert main(["test-gen-noise", path, "200", "44100"]) == 0
    return path


@pytest.mark.slow
def test_linear_mode(noise200, tmp_path, capsys):
    """--linear disables the mix scatter on both sides."""
    wm = str(tmp_path / "wm_lin.wav")
    assert run(["--strict", "add", "--linear", noise200, wm, MSG]) == 0
    rc = run(["--strict", "cmp", "--linear", "--expect-matches", "5", wm, MSG])
    out = capsys.readouterr().out
    assert "match_count 5" in out, out
    assert rc == 0
    # mix-mode decode of a linear-mode file must find nothing
    rc = run(["--strict", "cmp", "--expect-matches", "0", wm, MSG])
    out = capsys.readouterr().out
    assert "match_count 0" in out, out
    assert rc == 0


@pytest.mark.slow
def test_hard_decode(noise200, tmp_path, capsys):
    wm = str(tmp_path / "wm.wav")
    assert run(["--strict", "add", noise200, wm, MSG]) == 0
    rc = run(["--strict", "cmp", "--hard", wm, MSG])
    out = capsys.readouterr().out
    assert rc == 0, out
    assert "match_count 0" not in out


@pytest.mark.slow
def test_frames_per_bit_4(noise200, tmp_path, capsys):
    """--frames-per-bit 4 doubles the block length (3942 frames ~ 91.5 s):
    200 s holds an A and a B block (A, B, AB, all) and is short enough that
    the clip decoder also fires (START + END windows) -> 6 matches."""
    wm = str(tmp_path / "wm_fpb4.wav")
    assert run(["--strict", "add", "--frames-per-bit", "4",
                noise200, wm, MSG]) == 0
    rc = run(["--strict", "cmp", "--frames-per-bit", "4",
              "--expect-matches", "6", wm, MSG])
    out = capsys.readouterr().out
    assert "match_count 6" in out, out
    assert rc == 0
