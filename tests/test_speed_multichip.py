"""Multi-chip speed scan: the fused scan's center axis shards over the
device mesh (ops/speed_fused._speed_scan_core_sharded); results must be
identical to the single-device core.  Reference analogue: the ThreadPool
jobs per SpeedSync (src/wmspeed.cc:433-492) fan out per center speed.

The production detect_speed path (tests/test_speed.py slow marks) now runs
sharded by default on the 8-device CPU mesh; this file pins the scan-level
equality directly."""

import numpy as np
import pytest

from audiowmark_tpu.crypto.keys import Key
from audiowmark_tpu.ops import speed as speed_ops
from audiowmark_tpu.ops import speed_fused
from audiowmark_tpu.tables import get_key_tables


@pytest.fixture(scope="module")
def sync_bits():
    return speed_ops.build_speed_sync_bits(get_key_tables(Key()))


def test_sharded_scan_equals_single_device(monkeypatch, sync_bits):
    """12 centers over the 8-device mesh == the same scan on one device
    (scan1-shaped grid: centers spanning the mesh unevenly, 5 rels)."""
    import jax
    assert jax.device_count() >= 2, "conftest provides the virtual mesh"

    rng = np.random.RandomState(5)
    clip = (rng.randn(2 * 5 * 44100) * 0.3).astype(np.float32)
    centers = [0.9 * 1.0007 ** (11 * c) for c in range(12)]
    rels = [1.0007 ** p for p in range(-2, 3)]

    sharded = speed_fused.speed_scan(clip, 2, centers, 4.0, rels, sync_bits)

    monkeypatch.setattr(speed_fused, "scan_device_count", lambda: 1)
    single = speed_fused.speed_scan(clip, 2, centers, 4.0, rels, sync_bits)

    assert len(sharded) == len(single) == len(centers)
    for srow, urow in zip(sharded, single):
        for (qs, sps), (qu, spu) in zip(srow, urow):
            assert sps == spu
            assert qs == pytest.approx(qu, abs=1e-6)


def test_sharded_scan_single_center(monkeypatch, sync_bits):
    """scan3 shape: ONE real center padded up to the mesh width must not
    perturb the result (padded lanes run fully masked)."""
    rng = np.random.RandomState(9)
    clip = (rng.randn(2 * 4 * 44100) * 0.2).astype(np.float32)
    rels = [1.00005 ** p for p in range(-3, 4)]

    sharded = speed_fused.speed_scan(clip, 2, [0.97], 3.0, rels, sync_bits)
    monkeypatch.setattr(speed_fused, "scan_device_count", lambda: 1)
    single = speed_fused.speed_scan(clip, 2, [0.97], 3.0, rels, sync_bits)
    for (qs, sps), (qu, spu) in zip(sharded[0], single[0]):
        assert sps == spu
        assert qs == pytest.approx(qu, abs=1e-6)
