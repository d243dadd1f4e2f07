"""Per-array device-transfer cache.

The decode pipeline views the same interleaved sample buffer in several
layouts (hop chunks for the spectrogram, channels-first spans for the
refine pass, frame-major slices for the block decode).  Uploading the
buffer once and deriving every layout on device keeps host->device traffic
at one transfer per chunk — through a remote-TPU tunnel the repeated
uploads would otherwise dominate the decode wall time.

Entries die with their host array (weakref-keyed), so a chunk loader
dropping a chunk also frees its device copy.
"""

from __future__ import annotations

import weakref
from typing import Dict, Tuple

import numpy as np

import jax
import jax.numpy as jnp

_store: Dict[int, Tuple[weakref.ref, object]] = {}


@jax.jit
def _dequant16(i16: jnp.ndarray) -> jnp.ndarray:
    return i16.astype(jnp.float32) * jnp.float32(1.0 / 32768.0)


def device_array(x: np.ndarray):
    """Device copy of `x`, cached by object identity."""
    key = id(x)
    ent = _store.get(key)
    if ent is not None and ent[0]() is x:
        return ent[1]
    dev = jnp.asarray(x)
    _store[key] = (weakref.ref(x, lambda _r, k=key: _store.pop(k, None)),
                   dev)
    return dev


# derived-value memo: (id(base), key) -> (weakref(base), value); values die
# with the base object, so key-table invalidation (tables.clear_cache)
# drops the derived layouts too
_derived: Dict[Tuple[int, tuple], Tuple[weakref.ref, object]] = {}


def memo_derived(base, key: tuple, fn):
    """`fn()` computed once per (identity of `base`, `key`).

    Used for per-key constants (sync-bit layouts, mix gather tables) that
    would otherwise be rebuilt — and re-uploaded — on every decode call."""
    k = (id(base), key)
    ent = _derived.get(k)
    if ent is not None and ent[0]() is base:
        return ent[1]
    val = fn()
    _derived[k] = (weakref.ref(base, lambda _r, kk=k: _derived.pop(kk, None)),
                   val)
    return val


# derived-buffer registry: id(derived) -> (weakref(derived), base array,
# first, last, pad_start, pad_end); the device copy is built from the
# base's cached upload + device-side zeros instead of a fresh transfer
_padded: Dict[int, Tuple] = {}


def register_padded(derived: np.ndarray, base: np.ndarray, first: int,
                    last: int, pad_start: int, pad_end: int) -> None:
    """Declare `derived == [zeros(pad_start), base[first:last],
    zeros(pad_end)]` so device_audio(derived) can assemble it on device
    from base's cached upload — zero extra bytes over the host link."""
    key = id(derived)
    _padded[key] = (weakref.ref(derived,
                                lambda _r, k=key: _padded.pop(k, None)),
                    base, first, last, pad_start, pad_end)


def i16_grid(x: np.ndarray):
    """int16 view of `x` when every sample sits exactly on the 16-bit grid
    (16-bit PCM sources — the common case), else None.  The int16 range is
    [-32768, 32767]: -32768 (= -1.0 from int16 decode, the loudest negative
    sample) must stay on the fast path.

    Three passes total (scale, cast, compare): on-grid values k/32768 scale
    exactly to k in f32 (power-of-two arithmetic), so the truncating cast
    and the scaled-domain equality check accept exactly the grid.  Off-grid
    or out-of-range values (including a wrapped/saturated cast result and
    NaN) fail the equality.  7x faster than the round + range-check +
    dequantize-verify formulation on the production 120 s buffer."""
    s = x * np.float32(32768.0)
    with np.errstate(invalid="ignore"):
        i16 = s.astype(np.int16)
    if np.array_equal(i16.astype(np.float32), s):
        return i16
    return None


def fetch_tree(out) -> dict:
    """Fetch a dict of device arrays to numpy in ONE overlapped transfer.

    jax.device_get starts copy_to_host_async on EVERY leaf before blocking
    on any of them; through the remote-TPU tunnel (~25-32 ms per
    synchronized RPC) that turns N sequential per-array fetches into one
    round-trip-latency batch.  The fused sync search returns six (K,)
    candidate tensors per dispatch — fetching them one np.asarray at a
    time cost ~0.2 s per search call, pure latency."""
    return jax.device_get(out)


def device_audio(x: np.ndarray):
    """Device float32 copy of an audio buffer, cached by object identity.

    When every sample sits exactly on the 16-bit grid, the transfer goes as
    int16 and dequantizes on device: half the bytes through a bandwidth-
    bound host link (the remote-TPU tunnel moves ~30 MB/s up).  Buffers
    declared via register_padded are assembled on device from their base's
    cached upload."""
    key = id(x)
    ent = _store.get(key)
    if ent is not None and ent[0]() is x:
        return ent[1]
    pad = _padded.get(key)
    if pad is not None and pad[0]() is x:
        _, base, first, last, pad_start, pad_end = pad
        dev = jnp.concatenate([
            jnp.zeros(pad_start, jnp.float32),
            device_audio(base)[first:last],
            jnp.zeros(pad_end, jnp.float32)])
    else:
        i16 = i16_grid(x)
        dev = _dequant16(jnp.asarray(i16)) if i16 is not None \
            else jnp.asarray(x)
    _store[key] = (weakref.ref(x, lambda _r, k=key: _store.pop(k, None)),
                   dev)
    return dev
