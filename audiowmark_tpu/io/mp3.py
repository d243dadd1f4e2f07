"""MP3 input (gated).

The reference decodes MP3 via libmpg123 (src/mp3inputstream.cc).  This image
has no MP3 decoder library and no ffmpeg, so MP3 input is detected (frame-sync
sniffing, mirroring the reference's 30-frame detect heuristic at the container
level) and reported with a clear error.  When an `ffmpeg` binary is available
on PATH, we decode through it instead.
"""

from __future__ import annotations

import shutil
import struct
import subprocess

import numpy as np

from .streams import AudioInputStream, StreamError

_BITRATES_V1L3 = [0, 32, 40, 48, 56, 64, 80, 96, 112, 128, 160, 192, 224, 256, 320, 0]
_RATES_V1 = [44100, 48000, 32000, 0]


def _parse_frame_header(b: bytes):
    """Return (frame_bytes, sample_rate, channels) or None for a bad header."""
    if len(b) < 4:
        return None
    h = struct.unpack(">I", b[:4])[0]
    if (h >> 21) & 0x7FF != 0x7FF:
        return None
    version = (h >> 19) & 3      # 3=MPEG1, 2=MPEG2, 0=MPEG2.5
    layer = (h >> 17) & 3        # 1=III, 2=II, 3=I
    if version == 1 or layer == 0:
        return None
    bitrate_idx = (h >> 12) & 0xF
    rate_idx = (h >> 10) & 3
    if bitrate_idx in (0, 15) or rate_idx == 3:
        return None
    padding = (h >> 9) & 1
    channels = 1 if ((h >> 6) & 3) == 3 else 2
    rate = _RATES_V1[rate_idx]
    if version == 2:
        rate //= 2
    elif version == 0:
        rate //= 4
    bitrate = _BITRATES_V1L3[bitrate_idx] * 1000
    if layer == 3:  # layer I
        frame = (12 * bitrate // rate + padding) * 4
    else:
        spf = 1152 if (layer == 1 and version == 3) else (576 if layer == 1 else 1152)
        frame = spf * bitrate // (8 * rate) + padding
    if frame <= 0:
        return None
    return frame, rate, channels


def mp3_detect(filename: str) -> bool:
    """Sniff for a run of consistent MPEG audio frames (like the reference's
    30-frame decode test, src/mp3inputstream.cc:208-275)."""
    try:
        with open(filename, "rb") if filename != "-" else _no_stdin() as f:
            data = f.read(256 * 1024)
    except (OSError, TypeError):
        return False
    pos = 0
    # skip ID3v2 tag
    if data[:3] == b"ID3" and len(data) > 10:
        size = ((data[6] & 0x7F) << 21 | (data[7] & 0x7F) << 14 |
                (data[8] & 0x7F) << 7 | (data[9] & 0x7F))
        pos = 10 + size
    good = 0
    while pos + 4 <= len(data) and good < 30:
        info = _parse_frame_header(data[pos:pos + 4])
        if info is None:
            return False
        pos += info[0]
        good += 1
    return good >= 4


class _no_stdin:
    def __enter__(self):
        raise TypeError("mp3 detect does not support stdin")

    def __exit__(self, *a):
        return False


class MP3InputStream(AudioInputStream):
    """Decode MP3 via the ffmpeg CLI when present; clear error otherwise."""

    def __init__(self, filename: str):
        if shutil.which("ffmpeg") is None:
            raise StreamError(
                "input looks like an MP3 file, but no MP3 decoder is "
                "available (install ffmpeg to enable MP3 input)")
        probe = subprocess.run(
            ["ffprobe", "-v", "error", "-select_streams", "a:0",
             "-show_entries", "stream=sample_rate,channels",
             "-of", "csv=p=0", filename],
            capture_output=True, text=True)
        if probe.returncode != 0:
            raise StreamError("ffprobe failed on MP3 input")
        rate_s, ch_s = probe.stdout.strip().split(",")[:2]
        self._sample_rate = int(rate_s)
        self._n_channels = int(ch_s)
        self._proc = subprocess.Popen(
            ["ffmpeg", "-v", "error", "-i", filename, "-f", "f32le",
             "-acodec", "pcm_f32le", "-"],
            stdout=subprocess.PIPE)

    def bit_depth(self) -> int:
        return 24  # mpg123 float decode is reported as 24 bit by the reference

    def sample_rate(self) -> int:
        return self._sample_rate

    def n_channels(self) -> int:
        return self._n_channels

    def n_frames(self):
        return None

    def read_frames(self, count: int) -> np.ndarray:
        want = count * self._n_channels * 4
        data = self._proc.stdout.read(want) or b""
        whole = len(data) // (4 * self._n_channels) * 4 * self._n_channels
        return np.frombuffer(data[:whole], dtype="<f4").astype(np.float32)

    def close(self):
        if self._proc.stdout:
            self._proc.stdout.close()
        self._proc.wait()
