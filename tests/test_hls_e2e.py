"""HLS watermarking end-to-end on the native codec path: split a master
into AAC MPEG-TS segments, hls-prepare, per-segment hls-add, then decode
the watermarked playlist and expect the reference's match count
(mirrors /root/reference/tests/hls-test.sh)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from audiowmark_tpu.io import ffshim
from audiowmark_tpu.io.wavdata import WavData

pytestmark = pytest.mark.skipif(not ffshim.available(),
                                reason="libffshim.so not built")

PAYLOAD = "0123456789abcdef0011223344556677"


def _run_cli(repo, env, *args):
    r = subprocess.run([sys.executable, os.path.join(repo, "audiowmark")]
                       + list(args), env=env, capture_output=True,
                       text=True, cwd=repo)
    assert r.returncode == 0, " ".join(args) + "\n" + r.stdout + r.stderr
    return r.stdout + r.stderr


def _make_hls(tmp_path, seconds_per_seg, n_segments, rate=44100, ch=2,
              seed=3):
    """Master wav + AAC TS segments + playlist (the reference test uses
    ffmpeg's hls muxer for this step; here each 1024-aligned window is
    encoded with the native segment writer)."""
    seg_frames = (int(seconds_per_seg * rate) // 1024) * 1024
    total = seg_frames * n_segments
    rng = np.random.default_rng(seed)
    master = (rng.standard_normal(total * ch) * 0.125).astype(np.float32)

    in_dir = tmp_path / "as0"
    in_dir.mkdir()
    wav_path = tmp_path / "master.wav"
    WavData(master, ch, rate, 16).save(str(wav_path))
    # re-load: segment content must match the 16-bit master exactly
    master = WavData.load(str(wav_path)).samples

    names = []
    for k in range(n_segments):
        name = "out%d.ts" % k
        w = ffshim.HLSSegmentWriter(
            str(in_dir / name), rate, ch, 192000, 0, seg_frames // 1024,
            pts_start=k * seg_frames / rate)
        w.write(master[k * seg_frames * ch:(k + 1) * seg_frames * ch])
        w.close()
        names.append(name)

    playlist = ["#EXTM3U", "#EXT-X-VERSION:3",
                "#EXT-X-TARGETDURATION:%d" % (int(seconds_per_seg) + 1),
                "#EXT-X-MEDIA-SEQUENCE:0"]
    for name in names:
        playlist.append("#EXTINF:%.6f," % (seg_frames / rate))
        playlist.append(name)
    playlist.append("#EXT-X-ENDLIST")
    (in_dir / "out.m3u8").write_text("\n".join(playlist) + "\n")
    return wav_path, in_dir, names, seg_frames


def test_hls_prepare_and_add_structural(tmp_path):
    """prepare embeds context+vars; add produces a TS whose decoded length
    is exactly the segment size and whose pts matches the timeline."""
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rate = 44100
    wav_path, in_dir, names, seg_frames = _make_hls(tmp_path, 5.0, 2)

    prep_dir = tmp_path / "prep"
    out = _run_cli(repo, env, "hls-prepare", str(in_dir), str(prep_dir),
                   "out.m3u8", str(wav_path))
    assert "Segments:     2" in out

    # prepared segment carries the FLAC context + vars piggyback
    from audiowmark_tpu.hls.mpegts import TSReader
    reader = TSReader()
    reader.load(str(prep_dir / names[1]))
    assert reader.find("full.flac")
    vars_map = reader.parse_vars("vars")
    assert int(vars_map["size"]) == seg_frames
    assert int(vars_map["start_pos"]) == seg_frames
    assert int(vars_map["prev_size"]) == min(seg_frames, 3 * rate)
    assert vars_map["channel_layout"] == "stereo"

    wm_dir = tmp_path / "wm"
    wm_dir.mkdir()
    for name in names:
        _run_cli(repo, env, "hls-add", str(prep_dir / name),
                 str(wm_dir / name), PAYLOAD)

    for k, name in enumerate(names):
        dec, ch, drate = ffshim.decode_file(str(wm_dir / name))
        assert (ch, drate) == (2, rate)
        assert dec.size == seg_frames * 2, name
        p = ffshim.probe(str(wm_dir / name))
        assert abs(float(p["start_time"]) - k * seg_frames / rate) < 0.05


@pytest.mark.slow
def test_hls_watermark_five_matches(tmp_path):
    """Full hls-test.sh mirror: 200 s master, 10 s segments, watermark each
    segment independently, decode the watermarked playlist, expect the
    reference's 5 matches (block-decoder expectation for 200 s)."""
    env = dict(os.environ, AUDIOWMARK_JAX_PLATFORM="cpu")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    rate, ch = 44100, 2
    wav_path, in_dir, names, seg_frames = _make_hls(tmp_path, 10.0, 20)

    prep_dir = tmp_path / "prep"
    _run_cli(repo, env, "hls-prepare", str(in_dir), str(prep_dir),
             "out.m3u8", str(wav_path))

    wm_dir = tmp_path / "wm"
    wm_dir.mkdir()
    for name in names:
        _run_cli(repo, env, "hls-add", str(prep_dir / name),
                 str(wm_dir / name), PAYLOAD)

    # decode the watermarked stream back to PCM (the reference demuxes the
    # playlist with ffmpeg; decode segments in playlist order here)
    chunks = [ffshim.decode_file(str(wm_dir / name))[0] for name in names]
    out_wav = tmp_path / "wm.wav"
    WavData(np.concatenate(chunks), ch, rate, 16).save(str(out_wav))

    out = _run_cli(repo, env, "cmp", str(out_wav), PAYLOAD)
    match_count = 0
    for line in out.splitlines():
        if line.startswith("match_count"):
            match_count = int(line.split()[1])
    assert match_count == 5, out
