"""Multi-chip scaling: device meshes and the sharded watermark pipeline.

The watermarking algorithm has no cross-stream dependencies, so the natural
multi-chip decomposition is:

* **dp** (data parallel): independent audio streams/chunks across chips —
  the throughput axis for fleet-scale batch watermarking.
* **sp** (sequence parallel): the time/frame axis within a stream.  Frames
  are independent given the key tables EXCEPT for (a) the 3-frame overlap-add
  in the embedder and (b) sync scores whose sync frames straddle shard
  boundaries.  (a) is a 1-frame halo exchange via `ppermute`; (b) is handled
  by all-gathering the small per-frame band-sum matrix D (tau x 1020) —
  thousands of times smaller than the audio — before the score gather.

Collectives are XLA's (`ppermute`, `all_gather`, `psum`) over a
`jax.sharding.Mesh`; there is no bespoke communication layer, matching how
the reference's ThreadPool fan-outs become batch axes here
(reference parallelism inventory: SURVEY.md section 2).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
try:
    from jax import shard_map
except ImportError:  # older jax
    from jax.experimental.shard_map import shard_map

from ..ops.frames import FRAME, analysis_window, synthesis_window


def make_mesh(n_devices: int = 0, dp: int = 0) -> Mesh:
    """Create a (dp, sp) mesh over the available devices."""
    devices = np.array(jax.devices()[: n_devices or len(jax.devices())])
    n = devices.size
    if dp == 0:
        dp = 1
        while dp * dp <= n and n % (dp * 2) == 0:
            dp *= 2
    sp = n // dp
    return Mesh(devices.reshape(dp, sp), axis_names=("dp", "sp"))


def _embed_shard(frames, mods, water_delta, awin, swin):
    """Per-shard embed with a 1-frame ifft halo passed from the left
    neighbor along sp (the overlap-add needs D[j-1] and D[j+1])."""
    spec = jnp.fft.rfft(frames * awin[None, None, None, :], axis=-1)
    mag = jnp.abs(spec)
    sign = mods.astype(jnp.float32)[:, :, None, :]
    safe = jnp.maximum(mag, 1e-7)
    factor = jnp.exp(jnp.log(safe) * (-water_delta) * sign) - 1.0
    factor = jnp.where((mag > 1e-7) & (sign != 0), factor, 0.0)
    iffts = jnp.fft.irfft(spec * factor, n=FRAME, axis=-1) * FRAME

    sp_size = jax.lax.axis_size("sp")
    # halo: last ifft frame of the left neighbor, first of the right
    right = jax.lax.ppermute(
        iffts[:, -1], "sp",
        [(i, (i + 1) % sp_size) for i in range(sp_size)])
    left = jax.lax.ppermute(
        iffts[:, 0], "sp",
        [(i, (i - 1) % sp_size) for i in range(sp_size)])
    idx = jax.lax.axis_index("sp")
    right = jnp.where(idx == 0, 0.0, right)              # no wraparound halo
    left = jnp.where(idx == sp_size - 1, 0.0, left)

    prv = jnp.concatenate([right[:, None], iffts[:, :-1]], axis=1)
    nxt = jnp.concatenate([iffts[:, 1:], left[:, None]], axis=1)
    w0 = swin[:FRAME]
    w1 = swin[FRAME:2 * FRAME]
    w2 = swin[2 * FRAME:]
    delta = nxt * w0 + iffts * w1 + prv * w2
    return frames + delta, iffts


def batch_embed_sharded(mesh: Mesh, samples: jnp.ndarray, mods: jnp.ndarray,
                        water_delta: float) -> jnp.ndarray:
    """dp/sp-sharded batch embedder: (B, T, C, FRAME) -> watermarked frames."""
    awin = jnp.asarray(analysis_window())
    swin = jnp.asarray(synthesis_window())

    def step(samples, mods):
        marked, _ = _embed_shard(samples, mods, jnp.float32(water_delta),
                                 awin, swin)
        return marked

    fn = shard_map(
        step, mesh=mesh,
        in_specs=(P("dp", "sp", None, None), P("dp", "sp", None)),
        out_specs=P("dp", "sp", None, None),
        check_vma=False)
    return jax.jit(fn)(samples, mods)
