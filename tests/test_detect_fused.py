"""Fused single-dispatch detector + dp-sharded batch detection.

Runs on a reduced geometry (--short 12 payload, 10 sync frames per bit) so
the production kernels — hop spectrogram, band-sum sweep, local mean, grid
refine, block decode, batched A/B Viterbi — execute end-to-end in seconds
on the 8-device CPU mesh."""

import numpy as np
import pytest

import jax

from audiowmark_tpu.codec.shortcode import short_encode_blk
from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.models.common import parse_payload
from audiowmark_tpu.ops.detect_fused import DetectorConfig, build_detector
from audiowmark_tpu.ops.frames import FRAME
from audiowmark_tpu.params import Params
from audiowmark_tpu import tables as tables_mod
from audiowmark_tpu.parallel.batch import detect_batch, watermark_batch
from audiowmark_tpu.parallel.mesh import make_mesh

# short-12 geometry: 852 data + 60 sync = 912 frames per block; the first
# block starts at frames_pad_start=250, so 1200 frames covers block 0
B, T, C = 8, 1200, 2
PAYLOAD = "abc"


@pytest.fixture()
def mini_geometry():
    saved = (Params.payload_short, Params.payload_size,
             Params.sync_frames_per_bit)
    Params.payload_short = 12
    Params.payload_size = 12
    Params.sync_frames_per_bit = 10
    tables_mod.clear_cache()
    yield
    (Params.payload_short, Params.payload_size,
     Params.sync_frames_per_bit) = saved
    tables_mod.clear_cache()


def _watermarked_batch(key):
    rng = np.random.RandomState(7)
    audio = (rng.rand(B, T * FRAME, C).astype(np.float32) - 0.5) * 0.6
    return watermark_batch(key, audio, PAYLOAD, mesh=make_mesh(8))


def test_fused_detector_recovers_codeword(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)
    det = jax.jit(build_detector(key, DetectorConfig(n_frames=T,
                                                     n_channels=C, top_k=4)))
    out = {k: np.asarray(v) for k, v in
           det(marked[0].reshape(-1)).items()}

    codeword = short_encode_blk(parse_payload(PAYLOAD))
    expect0 = Params.frames_pad_start * FRAME
    # the strongest candidate sits on the first block start and decodes to
    # the exact GF(2) codeword
    best = int(np.argmax(out["qualities"]))
    assert abs(int(out["positions"][best]) - expect0) < FRAME // 2
    assert out["bits"][best].tolist() == list(codeword)
    assert out["errors"][best] < 0.2


def test_detect_batch_sharded_equals_unsharded(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)

    sharded = detect_batch(key, marked, mesh=make_mesh(8), top_k=4)

    det = build_detector(key, DetectorConfig(n_frames=T, n_channels=C,
                                             top_k=4))
    unsharded = jax.jit(jax.vmap(lambda x: det(x.reshape(-1))))(marked)

    for name in ("positions", "block_is_a", "bits"):
        np.testing.assert_array_equal(sharded[name], np.asarray(
            unsharded[name]), err_msg=name)
    np.testing.assert_allclose(sharded["qualities"],
                               np.asarray(unsharded["qualities"]),
                               rtol=1e-5, atol=1e-6)


def test_detect_batch_finds_payload_in_all_streams(mini_geometry):
    key = Key()
    marked = _watermarked_batch(key)
    out = detect_batch(key, marked, mesh=make_mesh(8), top_k=4)
    codeword = list(short_encode_blk(parse_payload(PAYLOAD)))
    for b in range(B):
        best = int(np.argmax(out["qualities"][b]))
        assert out["bits"][b][best].tolist() == codeword, b


def test_fused_detector_bf16_recovers_codeword(mini_geometry):
    """The TPU-production bf16 DFT path (dft_bf16=True forced on CPU)
    still recovers the exact codeword at the exact position — the e2e
    validation behind enabling bf16 by default on TPU backends."""
    key = Key()
    marked = _watermarked_batch(key)
    det = jax.jit(build_detector(
        key, DetectorConfig(n_frames=T, n_channels=C, top_k=4,
                            dft_bf16=True)))
    out = {k: np.asarray(v) for k, v in det(marked[0].reshape(-1)).items()}
    codeword = short_encode_blk(parse_payload(PAYLOAD))
    best = int(np.argmax(out["qualities"]))
    assert abs(int(out["positions"][best])
               - Params.frames_pad_start * FRAME) < FRAME // 2
    assert out["bits"][best].tolist() == list(codeword)


@pytest.mark.slow
def test_detect_batch_full_geometry_sharded(tmp_path):
    """REAL production geometry on a 2-device mesh (round-3 review weak
    #5): 128-bit payload, 2226-frame blocks, the 2^15-state batched A/B
    Viterbi — the sharded fleet detect must equal the unsharded vmap run
    bit for bit AND recover the embedded payload, so the production bit
    path has executed sharded end-to-end at full geometry.  Reference
    analogue: the Viterbi fan-out in src/wmget.cc:544."""
    from audiowmark_tpu.cli import test_gen_noise as gen_noise
    from audiowmark_tpu.io.wavdata import WavData
    from audiowmark_tpu.models.embedder import add_watermark

    key = Key()
    payload = "f0" * 16                     # full 128-bit payload
    src = str(tmp_path / "n.wav")
    wm = str(tmp_path / "wm.wav")
    gen_noise(key, src, 60, 44100, 16)      # covers block 0 (starts @250)
    assert add_watermark(key, src, wm, payload) == 0
    wav = WavData.load(wm)
    base = wav.samples.reshape(-1, 2)
    rng = np.random.RandomState(4)
    attacked = np.clip(
        base + rng.randn(*base.shape).astype(np.float32) * 0.01, -1.0, 1.0)
    audio = np.stack([base, attacked])      # (2, n, 2)

    sharded = detect_batch(key, audio, mesh=make_mesh(2), top_k=4)

    T_full = audio.shape[1] // FRAME
    det = build_detector(key, DetectorConfig(n_frames=T_full, n_channels=2,
                                             top_k=4))
    flat = audio[:, : T_full * FRAME].reshape(2, -1)
    unsharded = jax.jit(jax.vmap(det))(flat)

    for name in ("positions", "block_is_a", "bits", "eligible"):
        np.testing.assert_array_equal(
            sharded[name], np.asarray(unsharded[name]), err_msg=name)
    np.testing.assert_allclose(sharded["qualities"],
                               np.asarray(unsharded["qualities"]),
                               rtol=1e-5, atol=1e-6)

    want = list(parse_payload(payload))
    expect0 = Params.frames_pad_start * FRAME
    for b in range(2):
        best = int(np.argmax(sharded["qualities"][b]))
        assert bool(sharded["eligible"][b][best])
        assert abs(int(sharded["positions"][b][best]) - expect0) < FRAME // 2
        assert sharded["bits"][b][best].tolist() == want, b
        assert sharded["errors"][b][best] < 0.2


@pytest.mark.slow
def test_detect_batch_agrees_with_cli_pipeline(mini_geometry):
    """Fleet API vs CLI selection on the same attacked streams (round-2
    review weak #2): every single-block A/B pattern the CLI pipeline
    (BlockDecoder: fused search with masking/threshold/n-best + exact-match
    short decode) reports must appear in detect_batch's top-k at the same
    refined position, same block type, and with the identical conv-decoded
    codeword.  The residual divergence is one-directional, bounded, and
    measured here (round-3 review weak #7): detect_batch applies the CLI's
    local-maxima + opposite-sign eligibility in-kernel, so the only extra
    candidates it surfaces are eligible-but-below-threshold fillers the
    CLI's threshold/n-best truncation would drop — their measured
    above-threshold rate must be 0 and it never misses a CLI pattern."""
    from audiowmark_tpu.codec.convcode import ConvBlockType
    from audiowmark_tpu.io.wavdata import WavData
    from audiowmark_tpu.models.decoder import BlockDecoder
    from audiowmark_tpu.models.resultset import PatternType, ResultSet

    key = Key()
    marked = _watermarked_batch(key)
    rng = np.random.RandomState(3)
    attacked = np.clip(
        marked + rng.randn(*marked.shape).astype(np.float32) * 0.02,
        -1.0, 1.0)

    from audiowmark_tpu.models import syncfinder
    from audiowmark_tpu.models.syncfinder import SyncMode

    out = detect_batch(key, attacked, mesh=make_mesh(8), top_k=8)

    n_cli_patterns = 0
    n_eligible = 0
    n_extra_above = 0        # eligible, above final threshold, yet absent
    for b in range(B):
        wav = WavData(attacked[b].reshape(-1).copy(), C,
                      Params.mark_sample_rate, 16)
        rs = ResultSet()
        BlockDecoder(1).run([key], wav, rs)
        for p in rs.patterns:
            if (p.type != PatternType.BLOCK
                    or p.sync_block_type == ConvBlockType.ab):
                continue
            n_cli_patterns += 1
            pos = int(round(p.time * Params.mark_sample_rate))
            want_a = p.sync_block_type == ConvBlockType.a
            want_bits = list(short_encode_blk(p.bit_vec))
            hits = [
                j for j in range(out["positions"].shape[1])
                if abs(int(out["positions"][b][j]) - pos) < FRAME // 2
                and bool(out["block_is_a"][b][j]) == want_a
                and out["bits"][b][j].tolist() == want_bits
            ]
            assert hits, \
                "stream %d: CLI pattern at %d missing from detect_batch" \
                % (b, pos)

        # extra-candidate rate (round-3 review weak #7): an eligible fleet
        # slot above the CLI's final sync threshold must correspond to a
        # candidate the CLI SEARCH keeps (its masking now runs in-kernel);
        # anything else is a false positive the fleet API over-reports
        cli_cands = {s.index
                     for kr in syncfinder.search([key], wav, SyncMode.BLOCK)
                     for s in kr.sync_scores}
        for j in range(out["positions"].shape[1]):
            if not bool(out["eligible"][b][j]):
                continue
            n_eligible += 1
            if out["qualities"][b][j] <= Params.sync_threshold2:
                continue
            fpos = int(out["positions"][b][j])
            if not any(abs(fpos - c) < FRAME // 2 for c in cli_cands):
                n_extra_above += 1
    # the attacked batch must actually exercise the comparison
    assert n_cli_patterns >= B
    assert n_eligible > 0
    extra_rate = n_extra_above / n_eligible
    print("detect_batch extra-candidate rate: %d/%d = %.3f"
          % (n_extra_above, n_eligible, extra_rate))
    assert extra_rate == 0.0, \
        "eligible above-threshold candidates absent from the CLI search: " \
        "%d of %d" % (n_extra_above, n_eligible)
