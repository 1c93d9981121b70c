"""Pallas rANS decode scan vs the XLA reference scan (bit-identity).

The kernel (ops/rans_decode_pallas) must reproduce ops/rans._decode_scan
exactly on MAGIC=1 payloads: same symbols, same final states.  Planes
are built directly at k=1024 lanes (the kernel's floor) so interpret
mode stays fast; the production pick_lanes sizes only change T.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from lrzip_next_tpu.ops import rans
from lrzip_next_tpu.ops.rans_decode_pallas import decode_scan_fused


def _mk_block(n, seed, textlike=True):
    rng = np.random.default_rng(seed)
    if textlike:
        base = rng.integers(32, 127, size=n, dtype=np.uint8)
        rep = np.tile(base[: max(n // 7, 1)], 8)[:n]
        mix = rng.random(n) < 0.6
        return np.where(mix, rep, base).astype(np.uint8)
    return rng.integers(0, 256, size=n, dtype=np.uint8)


def _plan_k(data: np.ndarray, n: int, ctx_bits: int, k: int):
    """rans._plan with a forced lane count (test-size planes)."""
    t_len = -(-n // k)
    t_len = ((t_len + 7) // 8) * 8      # grid-friendly row count
    nb = t_len * k
    dev = jnp.asarray(np.pad(data[:n], (0, nb - n)))
    s8 = dev.reshape(k, t_len).T
    prev = jnp.concatenate([jnp.zeros((1, k), jnp.uint8), s8[:-1]],
                           axis=0)
    ctxq = (prev >> (8 - ctx_bits)) if ctx_bits else jnp.zeros_like(prev)
    return s8, ctxq, t_len


@pytest.mark.parametrize("ctx_bits,n,seed,textlike", [
    (0, 40_000, 1, True), (6, 40_000, 1, True),
    pytest.param(4, 150_000, 2, False, marks=pytest.mark.slow),
    pytest.param(8, 131_072, 3, True, marks=pytest.mark.slow)])
def test_decode_scan_fused_matches_xla(ctx_bits, n, seed, textlike):
    k = 1024
    data = _mk_block(n, seed, textlike)
    s8, ctxq, t_len = _plan_k(data, n, ctx_bits, k)
    srate = max(1, (t_len * k) // rans._SAMPLE_TARGET)
    counts = rans.joint_histogram(s8, ctxq, jnp.int32(n), ctx_bits, srate)
    freqs = rans.quantize_freqs(counts)
    states, words, flags = rans._encode_scan(
        s8, ctxq, jnp.int32(n), freqs, ctx_bits)
    packed, n_words = rans._pack_words_xla(words, flags, t_len * k)
    stream = packed[:].astype(jnp.int32)

    ref_syms, ref_xf = rans._decode_scan(
        jnp.concatenate([stream, jnp.zeros((k,), jnp.int32)]),
        states, freqs, jnp.int32(n), ctx_bits, t_len)

    syms, xf = decode_scan_fused(stream, states, freqs, jnp.int32(n),
                                 ctx_bits, t_len, interpret=True)
    assert np.array_equal(np.asarray(xf), np.asarray(ref_xf))
    assert np.array_equal(np.asarray(syms), np.asarray(ref_syms))
    assert np.all(np.asarray(xf) == np.uint32(1 << 16))
    out = np.asarray(syms).T.reshape(-1)[:n]
    assert np.array_equal(out, data)
