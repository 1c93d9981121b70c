"""Device-mesh sharding for the compression pipeline.

The reference's parallelism is pthreads on one host (SURVEY.md section 2.3):
block-parallel backend compression (P1), an ordered writer (P2), and a
read-ahead decode pool (P3).  The TPU-native re-expression:

- **dp axis** - independent rzip chunks (and backend blocks) are data
  parallel across devices; the archive's chunk independence
  (doc/magic.header.txt "Rzip Chunk Data") is what makes this exact.
- **sp axis** - one chunk's window is sequence-sharded for the matcher
  stages: fingerprint prefix sums carry across shards, and the
  candidate sort is a global sort over the chunk; XLA inserts the
  collectives (all-gather / all-to-all) from the shardings.
- the ordered commit (P2) becomes a deterministic gather: block
  lengths -> prefix sum -> linked-list offsets, computed on host at
  write time (format/container.py), so no device-side ordering is
  needed.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..format.constants import MINIMUM_MATCH
from ..ops import matcher


def make_mesh(n_devices: Optional[int] = None,
              dp: Optional[int] = None) -> Mesh:
    """Build a (dp, sp) mesh over the available devices.

    dp shards independent chunks; sp shards within a chunk.  Defaults to
    the squarest factorisation with dp >= sp.
    """
    devs = jax.devices()
    n = n_devices or len(devs)
    devs = devs[:n]
    if dp is None:
        dp = 1
        for f in range(int(np.sqrt(n)), 0, -1):
            if n % f == 0:
                dp = n // f
                break
    sp = n // dp
    arr = np.array(devs).reshape(dp, sp)
    return Mesh(arr, axis_names=("dp", "sp"))


def _chunk_stats(data: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray,
                                             jnp.ndarray]:
    """Matcher stages for one chunk: candidates, verify mask, coverage."""
    cand, ok = matcher.match_candidates(data)
    start, _ = matcher.chain_runs(cand, ok)
    coverage = jnp.sum(ok.astype(jnp.int32))
    return cand, ok, coverage


def sharded_match_step(mesh: Mesh):
    """jit-compiled multi-chip matcher step over a (B, L) batch of chunks.

    Input is sharded (dp over chunks, sp over sequence); outputs keep the
    same shardings; per-batch stats are reduced across the mesh.
    """
    data_sharding = NamedSharding(mesh, P("dp", "sp"))
    stat_sharding = NamedSharding(mesh, P())

    @functools.partial(
        jax.jit,
        in_shardings=(data_sharding,),
        out_shardings=(data_sharding, data_sharding, stat_sharding))
    def step(batch: jnp.ndarray):
        cand, ok, cov = jax.vmap(_chunk_stats)(batch)
        total_cov = jnp.sum(cov)
        # pad cand/ok back to (B, L) so shardings stay uniform
        pad = batch.shape[1] - cand.shape[1]
        cand_f = jnp.pad(cand, ((0, 0), (0, pad)), constant_values=-1)
        ok_f = jnp.pad(ok, ((0, 0), (0, pad)))
        return cand_f, ok_f, total_cov

    return step


def shard_blocks(n_blocks: int, n_shards: int) -> list:
    """Round-robin assignment of backend blocks to shards (the dp analog
    of the reference's round-robin compthread dispatch,
    src/stream.c:1836-1874)."""
    return [list(range(s, n_blocks, n_shards)) for s in range(n_shards)]
