"""Pallas compaction kernel vs the XLA reference (interpret mode)."""

import numpy as np
import pytest


def make_chains(m, seed, p=0.3):
    rng = np.random.default_rng(seed)
    cand = rng.integers(-1, m, m).astype(np.int32)
    for i in range(1, m):
        if rng.random() < p and cand[i - 1] >= 0:
            cand[i] = cand[i - 1] + 1
    return cand


@pytest.mark.parametrize("m,seed", [(1000, 0), (9000, 1), (20000, 2)])
def test_matches_xla_compaction(m, seed):
    import jax.numpy as jnp
    from lrzip_next_tpu.ops.compact_pallas import compact_runs_pallas
    from lrzip_next_tpu.ops.matcher import compact_runs
    cand = make_chains(m, seed)
    ok = cand >= 0
    cap = 16384
    ref = compact_runs(jnp.asarray(cand), jnp.asarray(ok), jnp.int32(m),
                       cap)
    got = compact_runs_pallas(jnp.asarray(cand), jnp.asarray(ok),
                              jnp.int32(m), cap, interpret=True)
    k = min(int(ref[3]), cap)
    assert int(got[3]) == int(ref[3])
    for i in range(3):
        np.testing.assert_array_equal(np.asarray(ref[i])[:k],
                                      np.asarray(got[i])[:k])


def test_empty_and_dense():
    import jax.numpy as jnp
    from lrzip_next_tpu.ops.compact_pallas import compact_runs_pallas
    m = 5000
    # no candidates at all
    cand = np.full(m, -1, dtype=np.int32)
    got = compact_runs_pallas(jnp.asarray(cand),
                              jnp.asarray(cand >= 0), jnp.int32(m),
                              4096, interpret=True)
    assert int(got[3]) == 0
    # one giant chain
    cand = np.arange(-1, m - 1, dtype=np.int32)
    cand[0] = -1
    got = compact_runs_pallas(jnp.asarray(cand),
                              jnp.asarray(cand >= 0), jnp.int32(m),
                              4096, interpret=True)
    assert int(got[3]) == 1
    assert int(np.asarray(got[0])[0]) == 1  # run starts at position 1
