"""Fused anchor-fingerprint kernel (interpret mode on the CPU mesh)."""

import numpy as np
import jax.numpy as jnp
import pytest

from lrzip_next_tpu.ops.anchor_pallas import anchor_fps_pallas
from lrzip_next_tpu.ops import matcher as M


@pytest.mark.parametrize("stride", [8, 16, 32])
def test_fps_match_xla_reference(stride):
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, 40_000, dtype=np.uint8)
    data = np.concatenate([base, base[5:30_000]])
    n = len(data)
    m = n - 31
    fpa_m, fpb = anchor_fps_pallas(jnp.asarray(data), stride,
                                   interpret=True)
    fpa_m = np.asarray(fpa_m)[:m].astype(np.uint32)
    fpb = np.asarray(fpb)[:m].astype(np.uint32)
    d32 = jnp.asarray(data).astype(jnp.uint32)
    ra, rb = M._window_fps_pair(d32)
    ref_a = np.asarray(ra[:m])
    ref_b = np.asarray(rb[:m])
    # hash bits identical to the XLA tree hash
    assert np.array_equal(fpb, ref_b)
    mask = fpa_m != 0x7FFFFFFF
    assert np.array_equal(fpa_m[mask], ref_a[mask])
    # density ~ 1/(stride+1); generous bounds
    assert 0.3 / stride < mask.mean() < 3.0 / stride


def test_anchors_content_defined():
    # identical content at different alignments selects the same
    # relative anchor positions (away from edges)
    rng = np.random.default_rng(1)
    seg = rng.integers(0, 256, 20_000, dtype=np.uint8)
    for shift in (1, 3, 7):
        a = np.concatenate([rng.integers(0, 256, 64, dtype=np.uint8),
                            seg]).astype(np.uint8)
        b = np.concatenate([rng.integers(0, 256, 64 + shift,
                                         dtype=np.uint8), seg])
        fa, _ = anchor_fps_pallas(jnp.asarray(a), 8, interpret=True)
        fb, _ = anchor_fps_pallas(jnp.asarray(b), 8, interpret=True)
        ma = np.flatnonzero(np.asarray(fa)[64:19_000] != 0x7FFFFFFF)
        mb = np.flatnonzero(
            np.asarray(fb)[64 + shift:19_000 + shift] != 0x7FFFFFFF)
        inter = len(np.intersect1d(ma, mb))
        assert inter / max(len(ma), 1) > 0.9
