"""Pallas rANS kernels (ops/rans_pallas, ops/streampack.pack_plane):
bit-equality with the XLA reference implementations in interpret mode.

On real chips the same kernels run compiled; rans.encode_arrays routes
to them whenever K >= 2048 lanes, and the payloads are byte-identical
to the XLA path's by the scan/histogram equalities below.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrzip_next_tpu.ops import rans, rans_pallas
from lrzip_next_tpu.ops.streampack import pack_plane_pallas


def planes(rng, k, t, ctx_bits, n):
    data = rng.integers(0, 256, t * k, dtype=np.uint8)
    s8 = jnp.asarray(data.reshape(k, t).T)
    prev = jnp.concatenate([jnp.zeros((1, k), jnp.uint8), s8[:-1]],
                           axis=0)
    ctxq = (prev >> (8 - ctx_bits)) if ctx_bits else jnp.zeros_like(prev)
    return s8, ctxq


@pytest.mark.parametrize("ctx_bits", [0, 4, 6, 8])
@pytest.mark.parametrize("t", [16, 13, 7])
def test_encode_scan_bit_identical(ctx_bits, t):
    rng = np.random.default_rng(ctx_bits * 100 + t)
    k = 2048
    n = t * k - 777
    s8, ctxq = planes(rng, k, t, ctx_bits, n)
    counts = rans.joint_histogram(s8, ctxq, jnp.int32(n), ctx_bits, 1)
    freqs = rans.quantize_freqs(counts)
    st_x, w_x, f_x = rans._encode_scan(s8, ctxq, jnp.int32(n), freqs,
                                       ctx_bits)
    st_p, plane = rans_pallas.encode_scan_fused(
        s8, jnp.int32(n), freqs, ctx_bits, interpret=True)
    assert (np.asarray(st_x) == np.asarray(st_p)).all()
    assert (np.asarray(w_x) == (np.asarray(plane) & 0xFFFF)).all()
    assert (np.asarray(f_x) == ((np.asarray(plane) >> 16) != 0)).all()


@pytest.mark.parametrize("ctx_bits", [0, 6])
@pytest.mark.parametrize("t,srate", [(64, 4), (13, 2), (7, 1)])
def test_histogram_bit_identical(ctx_bits, t, srate):
    rng = np.random.default_rng(t * 10 + srate)
    k = 2048
    n = t * k - 333
    s8, ctxq = planes(rng, k, t, ctx_bits, n)
    ref = rans.joint_histogram(s8, ctxq, jnp.int32(n), ctx_bits, srate)
    new = rans_pallas.joint_histogram_pallas(
        s8, jnp.int32(n), ctx_bits, srate, interpret=True)
    assert (np.asarray(ref) == np.asarray(new)).all()


def test_pack_plane_bit_identical():
    rng = np.random.default_rng(5)
    t, k = 13, 2048
    plane = rng.integers(0, 1 << 17, (t, k), dtype=np.int64).astype(
        np.int32)
    words = (plane & 0xFFFF).astype(np.int32)
    flags = (plane >> 16) != 0
    cap = t * k
    p_ref, n_ref = rans._pack_words_xla(jnp.asarray(words),
                                        jnp.asarray(flags), cap)
    p_new, n_new = pack_plane_pallas(jnp.asarray(plane), cap,
                                     interpret=True)
    assert int(n_ref) == int(n_new)
    assert (np.asarray(p_ref) == np.asarray(p_new)).all()


def test_packed_table_layout():
    rng = np.random.default_rng(9)
    counts = jnp.asarray(rng.integers(0, 1000, (4, 256)).astype(np.int32))
    freqs = rans.quantize_freqs(counts)
    tab = np.asarray(rans_pallas._packed_table(freqs).astype(jnp.float32))
    f = np.asarray(freqs)
    cum = np.cumsum(f, axis=1) - f
    val = cum * rans.M + (f - 1)
    v2 = val.reshape(-1, 64)
    expect = np.concatenate(
        [(v2 >> 16).T, ((v2 >> 8) & 255).T, (v2 & 255).T], axis=0)
    assert np.array_equal(tab, expect.astype(np.float32))
