"""Short-payload end-to-end: add + cmp at --short 12/16/20 through the full
sync -> decode -> exhaustive exact-match path (mirrors
/root/reference/tests/short-payload-test.sh; decode semantics from
src/shortcode.cc:172-213 — only exact codeword matches are reported)."""

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ENV = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")


def _run(*args, expect_rc=0):
    r = subprocess.run([sys.executable, os.path.join(REPO, "audiowmark"),
                        "--strict"] + list(args), env=ENV,
                       capture_output=True, text=True, cwd=REPO)
    assert r.returncode == expect_rc, (r.returncode, r.stdout + r.stderr)
    return r.stdout


@pytest.mark.slow
@pytest.mark.parametrize("bits,payload", [(12, "abc"), (16, "abcd"),
                                          (20, "abcde")])
def test_short_payload_add_cmp(tmp_path, bits, payload):
    wav = str(tmp_path / "n.wav")
    out = str(tmp_path / "wm.wav")
    _run("test-gen-noise", wav, "200", "44100")
    _run("add", "--short", str(bits), wav, out, payload)
    stdout = _run("cmp", "--short", str(bits), out, payload)
    # every reported pattern must be the exact payload (error detection:
    # non-matching codewords are dropped, src/shortcode.cc:201-211)
    lines = [l for l in stdout.splitlines() if l.startswith("pattern")]
    assert lines, stdout
    for line in lines:
        assert payload in line, stdout
    match = [l for l in stdout.splitlines() if l.startswith("match_count")]
    assert match and int(match[0].split()[1]) >= 1, stdout
