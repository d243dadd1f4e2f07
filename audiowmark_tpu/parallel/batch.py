"""Fleet-scale batch watermarking: many streams per device dispatch.

This is the throughput API the reference cannot offer: a (dp, sp)-sharded
embed of a whole batch of audio streams in one device program, plus a
vectorized limiter.  Streams are independent, so scaling is linear in chips;
within a stream the frame axis shards over sp with a 1-frame ppermute halo
(see parallel/mesh.py).
"""

from __future__ import annotations

from functools import partial
from typing import Optional

import numpy as np

import jax
import jax.numpy as jnp

from ..crypto.keys import Key
from ..models.common import build_ab_frame_mods, parse_payload
from ..ops.detect_fused import DetectorConfig, build_detector
from ..ops.frames import FRAME
from ..params import Params
from ..tables import get_key_tables
from .mesh import Mesh, P, batch_embed_sharded, make_mesh, shard_map


def _limiter_body(x: jnp.ndarray, block_size: int = Params.mark_sample_rate,
                  ceiling: float = Params.limiter_ceiling) -> jnp.ndarray:
    """Vectorized lookahead limiter over (B, n_samples, C); the trailing
    partial block is zero-padded through like the streamed reference.
    Trace-time helper — call under jit so the (B, n, C) intermediates
    never materialize in lane-padded device layouts."""
    B_streams, n, C = x.shape
    nb = -(-n // block_size)
    pad = nb * block_size - n
    if pad:
        x = jnp.concatenate(
            [x, jnp.zeros((B_streams, pad, C), x.dtype)], axis=1)
    xb = x.reshape(B_streams, nb, block_size * C)
    maxes = jnp.maximum(jnp.max(jnp.abs(xb), axis=2), ceiling)
    prev = jnp.concatenate(
        [jnp.full((B_streams, 1), ceiling), maxes[:, :-1]], axis=1)
    nxt = jnp.concatenate(
        [maxes[:, 1:], jnp.full((B_streams, 1), ceiling)], axis=1)
    s0 = ceiling / jnp.maximum(prev, maxes)
    s1 = ceiling / jnp.maximum(maxes, nxt)
    ramp = jnp.arange(block_size, dtype=jnp.float32) / block_size
    scale = s0[:, :, None] + ramp[None, None, :] * (s1 - s0)[:, :, None]
    out = xb.reshape(B_streams, nb, block_size, C) * scale[..., None]
    return out.reshape(B_streams, nb * block_size, C)[:, :n]


def watermark_batch(key: Key, audio: np.ndarray, message_hex: str,
                    mesh: Optional[Mesh] = None,
                    apply_limiter: bool = True) -> np.ndarray:
    """Watermark a batch of equal-length streams.

    audio: (B, n_samples, C) float32 at the watermark rate (44.1 kHz).
    n_samples is truncated to whole frames; the frame count must divide by
    the mesh's sp extent (pad beforehand if needed).
    Returns the watermarked batch with the same shape.
    """
    assert audio.ndim == 3
    if mesh is None:
        mesh = make_mesh()
    bitvec = parse_payload(message_hex)
    if bitvec is None:
        raise ValueError("cannot parse message %r" % message_hex)

    tables = get_key_tables(key)
    mods_ab = build_ab_frame_mods(tables, bitvec)

    B_streams, n_samples, C = audio.shape
    T = n_samples // FRAME
    sp = mesh.devices.shape[1]
    dp = mesh.devices.shape[0]
    assert T % sp == 0, "frame count %d must divide sp=%d" % (T, sp)
    assert B_streams % dp == 0, "batch %d must divide dp=%d" % (B_streams, dp)

    frames = np.ascontiguousarray(
        audio[:, : T * FRAME].reshape(B_streams, T, FRAME, C)
        .transpose(0, 1, 3, 2))
    phases = (2 * tables.frames_per_block - Params.frames_pad_start
              + np.arange(T)) % mods_ab.shape[0]
    mods = np.broadcast_to(mods_ab[phases], (B_streams, T, mods_ab.shape[1]))

    marked = batch_embed_sharded(mesh, jnp.asarray(frames),
                                 jnp.asarray(np.ascontiguousarray(mods)),
                                 Params.water_delta)
    tail = np.ascontiguousarray(audio[:, T * FRAME:]).reshape(B_streams, -1)
    flat = _finalize_marked(marked, jnp.asarray(tail), bool(apply_limiter),
                            C)
    return np.asarray(flat).reshape(B_streams, n_samples, C)


@partial(jax.jit, static_argnames=("limit", "C"))
def _finalize_marked(m4: jnp.ndarray, tail_flat: jnp.ndarray, limit: bool,
                     C: int) -> jnp.ndarray:
    """(B, T, C, FRAME) embedded frames + flat tail -> FLAT (B, n*C) in ONE
    jit: eager swapaxes/reshape would materialize (B, n, 2) arrays whose
    minor dim TPU tiling pads to 128 lanes (64x memory)."""
    B = m4.shape[0]
    x = jnp.swapaxes(m4, 2, 3).reshape(B, -1, C)
    if tail_flat.shape[1]:
        x = jnp.concatenate([x, tail_flat.reshape(B, -1, C)], axis=1)
    if limit:
        x = _limiter_body(x)
    return x.reshape(B, -1)


def detect_batch(key: Key, audio: np.ndarray,
                 mesh: Optional[Mesh] = None, top_k: int = 8) -> dict:
    """Fleet-scale batch detection: the full fused block-detect chain
    (spectrogram, score sweep, local mean, top-k, grid refine, block decode,
    batched Viterbi — ops/detect_fused.py) over a batch of equal-length
    streams, data-parallel over the mesh's dp axis.

    audio: (B, n_samples, C) float32 at 44.1 kHz; B must divide dp.
    Returns dict of arrays with leading (B, top_k): positions (sample
    index), qualities, block_is_a, bits (payload), errors, and eligible
    (False marks filler slots past the CLI-eligible candidate count).
    """
    assert audio.ndim == 3
    if mesh is None:
        mesh = make_mesh()
    B_streams, n_samples, C = audio.shape
    dp = mesh.devices.shape[0] * mesh.devices.shape[1]
    assert B_streams % dp == 0, "batch %d must divide %d devices" \
        % (B_streams, dp)

    T = n_samples // FRAME
    det = build_detector(key, DetectorConfig(n_frames=T, n_channels=C,
                                             top_k=top_k))
    batched = jax.vmap(det)

    # streams shard over every device (dp*sp used as one flat data axis);
    # audio crosses the jit boundary FLAT per stream — a (B, n, 2) device
    # array pads the minor dim to 128 lanes (64x transfer/memory on TPU)
    flat_mesh = Mesh(mesh.devices.reshape(-1), axis_names=("streams",))
    fn = shard_map(batched, mesh=flat_mesh,
                   in_specs=(P("streams"),), out_specs=P("streams"),
                   check_vma=False)
    flat = np.ascontiguousarray(audio[:, : T * FRAME]).reshape(B_streams, -1)
    out = jax.jit(fn)(jnp.asarray(flat))
    return {k: np.asarray(v) for k, v in out.items()}
