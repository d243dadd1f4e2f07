"""Native FLAC codec tests.

Covers the encoder/decoder round trip (verbatim and fixed+rice modes), the
bit-level decode paths (LPC, stereo decorrelation, wasted bits) via
hand-assembled subframes, and the stream-factory/HLS integration.
"""

import numpy as np
import pytest

from audiowmark_tpu.io import flac
from audiowmark_tpu.io.flac import (_BitReader, _BitWriter, decode_flac,
                                    encode_flac, FlacError)
from audiowmark_tpu.io.wavfile import encode_samples
from audiowmark_tpu.params import Encoding


def _noise(n, seed=1):
    rng = np.random.RandomState(seed)
    return (rng.rand(n).astype(np.float32) * 2 - 1) * 0.8


def _int16(samples):
    return np.frombuffer(encode_samples(samples, 16, Encoding.SIGNED), "<i2")


class TestRoundTrip:
    def test_stereo_16bit_verbatim(self):
        x = _noise(2 * 44100 + 1234)  # odd tail frame
        data = encode_flac(x, 2, 44100, 16)
        y, nch, rate, bps = decode_flac(data)
        assert (nch, rate, bps) == (2, 44100, 16)
        assert np.array_equal(_int16(y), _int16(x))

    def test_mono_24bit_verbatim(self):
        x = _noise(5000, seed=2)
        data = encode_flac(x, 1, 48000, 24)
        y, nch, rate, bps = decode_flac(data)
        assert (nch, rate, bps) == (1, 48000, 24)
        raw_x = encode_samples(x, 24, Encoding.SIGNED)
        raw_y = encode_samples(y, 24, Encoding.SIGNED)
        assert raw_x == raw_y

    def test_fixed_rice_mode(self):
        # smooth signal so the order-2 predictor actually compresses
        t = np.arange(20000, dtype=np.float32)
        x = np.sin(t * 0.01).astype(np.float32) * 0.5
        data = encode_flac(x, 1, 44100, 16, mode="fixed")
        verb = encode_flac(x, 1, 44100, 16, mode="verbatim")
        assert len(data) < len(verb) // 2  # really compressed
        y, nch, rate, bps = decode_flac(data)
        assert np.array_equal(_int16(y), _int16(x))

    def test_nonstandard_rate_code(self):
        x = _noise(3000, seed=3)
        data = encode_flac(x, 1, 12345, 16)
        y, nch, rate, bps = decode_flac(data)
        assert rate == 12345
        assert np.array_equal(_int16(y), _int16(x))

    def test_empty(self):
        data = encode_flac(np.zeros(0, np.float32), 2, 44100, 16)
        y, nch, rate, bps = decode_flac(data)
        assert y.size == 0 and nch == 2


def _frame_shell(bw_body: bytes, block_size: int, rate: int, bps: int,
                 chan_code: int, n_samples: int) -> bytes:
    """Wrap hand-written subframe bits into a full FLAC stream."""
    import struct
    hdr = bytearray([0xFF, 0xF8])
    hdr.append((7 << 4) | flac._SR_CODES[rate])
    hdr.append((chan_code << 4) | (flac._SS_CODES[bps] << 1))
    hdr += flac._utf8_encode(0)
    hdr += struct.pack(">H", block_size - 1)
    hdr.append(flac._crc8(bytes(hdr)))
    body = bytes(hdr) + bw_body
    body += struct.pack(">H", flac._crc16(body))
    n_channels = chan_code + 1 if chan_code < 8 else 2
    si = bytearray()
    si += struct.pack(">HH", block_size, block_size)
    si += b"\x00\x00\x00" * 2
    si.append((rate >> 12) & 0xFF)
    si.append((rate >> 4) & 0xFF)
    si.append(((rate & 0xF) << 4) | ((n_channels - 1) << 1) | ((bps - 1) >> 4))
    si.append((((bps - 1) & 0xF) << 4) | 0)
    si += struct.pack(">I", n_samples)
    si += b"\x00" * 16
    return (b"fLaC" + b"\x80" + len(si).to_bytes(3, "big") + bytes(si) + body)


class TestDecodePaths:
    def test_constant_subframe(self):
        bw = _BitWriter()
        bw.write_uint(0, 1)
        bw.write_uint(0, 6)  # constant
        bw.write_uint(0, 1)
        bw.write_sint(-1234, 16)
        data = _frame_shell(bw.getvalue(), 64, 44100, 16, 0, 64)
        y, nch, rate, bps = decode_flac(data)
        pcm = np.round(y * 32768).astype(int)
        assert np.all(pcm == -1234)

    def test_lpc_subframe_identity_predictor(self):
        # order-1 LPC with coefficient 1<<shift == fixed order 1
        vals = np.array([100, 150, 130, 90, -40, -100], dtype=np.int64)
        bw = _BitWriter()
        bw.write_uint(0, 1)
        bw.write_uint(32 | 0, 6)   # LPC order 1
        bw.write_uint(0, 1)
        bw.write_sint(int(vals[0]), 16)   # warmup
        bw.write_uint(12 - 1, 4)   # precision 12
        bw.write_sint(5, 5)        # shift
        bw.write_sint(1 << 5, 12)  # coefficient = 1.0
        res = np.diff(vals)
        bw.write_uint(0, 2)
        bw.write_uint(0, 4)
        bw.write_uint(3, 4)        # rice k=3
        for r in res:
            u = (int(r) << 1) ^ (int(r) >> 63)
            bw.write_unary(u >> 3)
            bw.write_uint(u & 7, 3)
        data = _frame_shell(bw.getvalue(), len(vals), 44100, 16, 0, len(vals))
        y, _, _, _ = decode_flac(data)
        pcm = np.round(y * 32768).astype(int)
        assert np.array_equal(pcm, vals)

    @pytest.mark.parametrize("chan_code", [8, 9, 10])
    def test_stereo_decorrelation(self, chan_code):
        left = np.array([1000, -2000, 3000, 17], dtype=np.int64)
        right = np.array([900, -2100, 2500, -17], dtype=np.int64)
        side = left - right
        if chan_code == 8:    # left/side
            c0, b0, c1, b1 = left, 16, side, 17
        elif chan_code == 9:  # right/side
            c0, b0, c1, b1 = side, 17, right, 16
        else:                 # mid/side
            mid = (left + right) >> 1
            c0, b0, c1, b1 = mid, 16, side, 17
        bw = _BitWriter()
        for ch, bits in ((c0, b0), (c1, b1)):
            bw.write_uint(0, 1)
            bw.write_uint(1, 6)  # verbatim
            bw.write_uint(0, 1)
            for v in ch:
                bw.write_sint(int(v), bits)
        data = _frame_shell(bw.getvalue(), 4, 44100, 16, chan_code, 4)
        y, nch, _, _ = decode_flac(data)
        pcm = np.round(y * 32768).astype(int).reshape(4, 2)
        assert np.array_equal(pcm[:, 0], left)
        assert np.array_equal(pcm[:, 1], right)

    def test_wasted_bits(self):
        vals = np.array([8, -16, 24, 0], dtype=np.int64)  # 3 wasted bits
        bw = _BitWriter()
        bw.write_uint(0, 1)
        bw.write_uint(1, 6)
        bw.write_uint(1, 1)   # wasted-bits flag
        bw.write_unary(2)     # unary 2 -> 3 wasted bits
        for v in vals >> 3:
            bw.write_sint(int(v), 13)
        data = _frame_shell(bw.getvalue(), 4, 44100, 16, 0, 4)
        y, _, _, _ = decode_flac(data)
        pcm = np.round(y * 32768).astype(int)
        assert np.array_equal(pcm, vals)

    def test_rice_escape_partition(self):
        vals = np.array([5, -3, 2, 7], dtype=np.int64)
        bw = _BitWriter()
        bw.write_uint(0, 1)
        bw.write_uint(8, 6)  # fixed order 0
        bw.write_uint(0, 1)
        bw.write_uint(0, 2)
        bw.write_uint(0, 4)
        bw.write_uint(15, 4)  # escape
        bw.write_uint(8, 5)   # 8 raw bits per sample
        for v in vals:
            bw.write_sint(int(v), 8)
        data = _frame_shell(bw.getvalue(), 4, 44100, 16, 0, 4)
        y, _, _, _ = decode_flac(data)
        pcm = np.round(y * 32768).astype(int)
        assert np.array_equal(pcm, vals)

    def test_bad_magic(self):
        with pytest.raises(FlacError):
            decode_flac(b"RIFFxxxx")


class TestCrc:
    def test_crc16_matches_bytewise_reference(self):
        rng = np.random.RandomState(0)
        for n in (0, 1, 2, 7, 255, 4096):
            data = rng.bytes(n)
            c = 0
            for b in data:
                c = (int(flac._CRC16_TABLE[((c >> 8) ^ b) & 0xFF])
                     ^ ((c << 8) & 0xFFFF))
            assert flac._crc16(data) == c

    def test_crc16_known_vector(self):
        # CRC-16/BUYPASS (poly 0x8005, init 0, no reflect): "123456789"
        assert flac._crc16(b"123456789") == 0xFEE8


class TestEncoderValidation:
    def test_rejects_unsupported_bit_depth(self):
        for bits in (8, 12, 20, 32):
            with pytest.raises(FlacError):
                encode_flac(np.zeros(10, np.float32), 1, 44100, bits)

    def test_rejects_bad_channel_count(self):
        for nch in (0, 9):
            with pytest.raises(FlacError):
                encode_flac(np.zeros(18, np.float32), nch, 44100, 16)

    def test_negative_lpc_shift_rejected(self):
        bw = _BitWriter()
        bw.write_uint(0, 1)
        bw.write_uint(32, 6)   # LPC order 1
        bw.write_uint(0, 1)
        bw.write_sint(0, 16)   # warmup
        bw.write_uint(11, 4)   # precision 12
        bw.write_sint(-1, 5)   # negative shift -> must be rejected
        bw.write_sint(1, 12)
        bw.write_uint(0, 2)
        bw.write_uint(0, 4)
        bw.write_uint(0, 4)
        bw.write_unary(0)
        data = _frame_shell(bw.getvalue(), 2, 44100, 16, 0, 2)
        with pytest.raises(FlacError):
            decode_flac(data)


class TestBitIO:
    def test_reader_writer_inverse(self):
        bw = _BitWriter()
        fields = [(5, 3), (0x3FFE, 14), (1, 1), (123456, 24), (7, 36)]
        for v, n in fields:
            bw.write_uint(v, n)
        bw.write_sint(-42, 9)
        br = _BitReader(bw.getvalue())
        for v, n in fields:
            assert br.read_uint(n) == v
        assert br.read_sint(9) == -42

    def test_unary(self):
        bw = _BitWriter()
        for q in (0, 1, 7, 30):
            bw.write_unary(q)
        br = _BitReader(bw.getvalue())
        for q in (0, 1, 7, 30):
            assert br.read_unary() == q


class TestIntegration:
    def test_stream_factory_auto_detect(self, tmp_path):
        from audiowmark_tpu.io.wavdata import WavData
        x = _noise(44100)
        p = tmp_path / "x.flac"
        p.write_bytes(encode_flac(x, 2, 44100, 16))
        wav = WavData.load(str(p))
        assert wav.sample_rate == 44100
        assert wav.n_channels == 2
        assert wav.bit_depth == 16
        assert np.array_equal(_int16(wav.samples), _int16(x))

    def test_ts_piggyback_flac_payload(self, tmp_path):
        """The hls-prepare/hls-add seam: native FLAC master payload through
        the MPEG-TS piggyback store (no ffmpeg needed for this half)."""
        from audiowmark_tpu.hls.hls import _flac_decode, _flac_encode
        from audiowmark_tpu.hls.mpegts import PACKET_SIZE, TSReader, TSWriter
        x = _noise(44100, seed=11)
        flac_bytes = _flac_encode(x, 2, 44100)
        src, dst = str(tmp_path / "in.ts"), str(tmp_path / "out.ts")
        rng = np.random.RandomState(3)
        ts = rng.randint(0, 256, size=4 * PACKET_SIZE).astype(np.uint8)
        ts[::PACKET_SIZE] = ord("G")
        open(src, "wb").write(ts.tobytes())
        writer = TSWriter()
        writer.append_data("full.flac", flac_bytes)
        writer.append_vars("vars", {"start_pos": "0", "size": "22050"})
        writer.process(src, dst)
        reader = TSReader()
        reader.load(dst)
        wav = _flac_decode(reader.find("full.flac").data)
        assert wav.sample_rate == 44100 and wav.n_channels == 2
        assert np.array_equal(_int16(wav.samples), _int16(x))

    @pytest.mark.slow
    def test_add_get_from_flac_input(self, tmp_path):
        from audiowmark_tpu import cli
        msg = "0123456789abcdef0011223344556677"
        rng = np.random.RandomState(7)
        x = (rng.rand(2 * 44100 * 60).astype(np.float32) * 2 - 1) * 0.5
        src = tmp_path / "in.flac"
        src.write_bytes(encode_flac(x, 2, 44100, 16))
        out = tmp_path / "wm.wav"
        assert cli.main(["add", "-q", str(src), str(out), msg]) == 0
        # 60 s: one full A block + clip decodes of the same payload
        assert cli.main(["cmp", "-q", str(out), msg,
                         "--expect-matches", "3"]) == 0


def test_streaming_input_bounded_window_and_bit_exact(tmp_path):
    """FlacInputStream decodes incrementally: output bit-exact vs the
    whole-buffer decoder while the byte window stays bounded
    (reference streams FLAC via libsndfile, src/sfinputstream.cc:189-210)."""
    from audiowmark_tpu.io.flac import FlacInputStream, decode_flac, encode_flac

    rng = np.random.RandomState(11)
    n = 44100 * 30 * 2
    samples = ((rng.rand(n) - 0.5) * 0.9).astype(np.float32)
    data = encode_flac(samples, 2, 44100, 16)
    path = tmp_path / "s.flac"
    path.write_bytes(data)

    golden, nch, rate, bps = decode_flac(data)

    s = FlacInputStream(str(path))
    assert (s.sample_rate(), s.n_channels(), s.bit_depth()) == (rate, nch, bps)
    assert s.n_frames() == golden.size // nch
    got = []
    max_window = 0
    while True:
        chunk = s.read_frames(4096)
        max_window = max(max_window, len(s._reader.buf))
        if chunk.size == 0:
            break
        got.append(chunk)
    s.close()
    dec = np.concatenate(got)
    np.testing.assert_array_equal(dec, golden)
    # window stays bounded well under the ~5 MB compressed size + refill
    assert max_window <= (6 << 20), max_window
