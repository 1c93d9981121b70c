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


def _mixed_corpus(n):
    base = open("/root/reference/src/rzip.c", "rb").read()
    rng = np.random.default_rng(5)
    rep = (base * (n // len(base) + 2))[:n // 2]
    rnd = rng.integers(0, 256, n // 4, dtype=np.uint8).tobytes()
    return (rep + rnd + rep)[:n]


@pytest.mark.parametrize("method", ["zstd", "gzip"])
def test_mesh_archive_bytematches_single_device(method):
    """The production mesh path (compress_stream with >1 device) must
    produce the exact bytes of the single-device TPU path."""
    import io
    import lrzip_next_tpu as lrz
    from lrzip_next_tpu.models.pipeline import compress_stream

    data = _mixed_corpus(1 << 20)

    def run(use_mesh):
        out = io.BytesIO()
        compress_stream(data, out, lrz.Settings(
            method=method, use_tpu=True, use_mesh=use_mesh,
            max_chunk=200_000))
        return out.getvalue()

    mesh_arch = run(True)
    single_arch = run(False)
    assert mesh_arch == single_arch
    assert lrz.decompress(mesh_arch) == data


def test_mesh_auto_engages_and_roundtrips():
    """use_mesh=None auto-detects the multi-device CPU mesh."""
    import io
    import lrzip_next_tpu as lrz
    from lrzip_next_tpu.models.pipeline import compress_stream

    data = _mixed_corpus(1 << 19)
    out = io.BytesIO()
    compress_stream(data, out, lrz.Settings(
        method="zstd", use_tpu=True, max_chunk=100_000))
    assert lrz.decompress(out.getvalue()) == data


def test_mesh_batch_stats_and_uneven_tail():
    """Tail chunk of a different size falls into its own batch; stats
    mirror the single-device counters."""
    import io
    import lrzip_next_tpu as lrz
    from lrzip_next_tpu.models.pipeline import compress_stream

    data = _mixed_corpus(750_000)  # 3 x 200k + 150k tail
    stats = []
    out = io.BytesIO()
    compress_stream(data, out, lrz.Settings(
        method="gzip", use_tpu=True, use_mesh=True, max_chunk=200_000,
        stats_sink=stats.append))
    assert [s["chunk"] for s in stats] == [0, 1, 2, 3]
    assert all(s["chunk_bytes"] in (200_000, 150_000) for s in stats)
    assert sum(s["match_bytes"] + s["literal_bytes"] for s in stats) \
        == len(data)
    assert lrz.decompress(out.getvalue()) == data
