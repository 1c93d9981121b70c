"""Multi-device mesh: sharded matcher step on the 8-device CPU mesh."""

import numpy as np
import pytest


def test_make_mesh_shapes():
    from lrzip_next_tpu.parallel.mesh import make_mesh
    mesh = make_mesh(8)
    assert mesh.devices.size == 8
    assert mesh.axis_names == ("dp", "sp")


def test_sharded_match_step():
    import jax.numpy as jnp
    from lrzip_next_tpu.parallel.mesh import make_mesh, sharded_match_step
    mesh = make_mesh(8)
    dp = mesh.devices.shape[0]
    sp = mesh.devices.shape[1]
    B, L = dp * 2, sp * 4096
    rng = np.random.default_rng(0)
    base = rng.integers(0, 256, L // 2, dtype=np.uint8)
    batch = np.stack([np.concatenate([base, base])] * B)
    step = sharded_match_step(mesh)
    cand, ok, cov = step(jnp.asarray(batch))
    assert cand.shape == (B, L)
    assert int(cov) > 0
    # the mirrored halves must match: position L//2 -> 0
    ok_np = np.asarray(ok)
    cand_np = np.asarray(cand)
    assert ok_np[0, L // 2]
    assert cand_np[0, L // 2] == 0


def test_graft_entry_single_chip():
    import jax
    import __graft_entry__ as g
    fn, args = g.entry()
    pos, cand, ok = jax.jit(fn)(*args)
    from lrzip_next_tpu.ops.matcher import HASH_W
    # anchor path: one anchor per stride-8 row of window positions
    assert pos.shape[0] == (args[0].shape[0] - HASH_W + 1) // 8


@pytest.mark.parametrize("n", [2, 4, 8])
def test_graft_dryrun_multichip(n):
    import __graft_entry__ as g
    g.dryrun_multichip(n)
