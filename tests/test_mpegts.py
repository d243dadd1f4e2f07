"""MPEG-TS piggyback round-trip tests (reference: src/testmpegts.cc)."""

import numpy as np

from audiowmark_tpu.hls.mpegts import (PACKET_SIZE, TSReader, TSWriter,
                                       _MAGIC_FILE)


def _fake_ts(path, n_packets=5):
    """A minimal valid TS file: n 188-byte packets starting with 'G'."""
    rng = np.random.RandomState(7)
    data = rng.randint(0, 256, size=n_packets * PACKET_SIZE).astype(np.uint8)
    data[::PACKET_SIZE] = ord("G")
    with open(path, "wb") as f:
        f.write(data.tobytes())
    return data.tobytes()


def test_roundtrip(tmp_path):
    src = str(tmp_path / "in.ts")
    dst = str(tmp_path / "out.ts")
    orig = _fake_ts(src)

    writer = TSWriter()
    payload = bytes(range(256)) * 3
    writer.append_data("full.flac", payload)
    writer.append_vars("vars", {"size": "1024", "start_pos": "99",
                                "channel_layout": "stereo"})
    writer.process(src, dst)

    out = open(dst, "rb").read()
    assert out.startswith(orig)          # original packets preserved
    assert len(out) % PACKET_SIZE == 0

    reader = TSReader()
    reader.load(dst)
    assert [e.filename for e in reader.entries()] == ["full.flac", "vars"]
    assert reader.find("full.flac").data == payload
    assert reader.parse_vars("vars") == {"size": "1024", "start_pos": "99",
                                         "channel_layout": "stereo"}
    assert reader.find("nothere") is None


def test_entry_header_format(tmp_path):
    """Entry header must be '<size>:<name>\\0' in the first payload packet."""
    src = str(tmp_path / "in.ts")
    dst = str(tmp_path / "out.ts")
    _fake_ts(src, 1)
    writer = TSWriter()
    writer.append_data("x", b"hello")
    writer.process(src, dst)
    out = open(dst, "rb").read()
    pkt = out[PACKET_SIZE:]
    assert pkt[:12] == _MAGIC_FILE
    assert pkt[12:12 + 8] == b"5:x\x00hell"


def test_multi_packet_entry(tmp_path):
    src = str(tmp_path / "in.ts")
    dst = str(tmp_path / "out.ts")
    _fake_ts(src, 1)
    rng = np.random.RandomState(1)
    payload = rng.randint(0, 256, size=1000).astype(np.uint8).tobytes()
    writer = TSWriter()
    writer.append_data("big.bin", payload)
    writer.process(src, dst)
    reader = TSReader()
    reader.load(dst)
    assert reader.find("big.bin").data == payload
