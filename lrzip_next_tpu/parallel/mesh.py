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


# ---------------------------------------------------------------------------
# Production mesh path: batched per-chunk seed extraction.
#
# The archive format makes rzip chunks independent, so a batch of dp
# equal-size chunks shards exactly across the dp axis while each chunk's
# window arrays shard across sp (XLA inserts the sort/scan collectives).
# The computation per chunk is the *same* anchor/compaction graph the
# single-device TpuMatchJob runs, so the compacted seeds - and therefore
# the final archive bytes - are identical to the single-device path.


@functools.lru_cache(maxsize=None)
def _batched_seed_fn(mesh: Mesh, stride: int, cap: int):
    dsh = NamedSharding(mesh, P("dp", "sp"))
    lsh = NamedSharding(mesh, P("dp"))
    osh = NamedSharding(mesh, P("dp", None))
    nsh = NamedSharding(mesh, P("dp"))

    def one(chunk, limit):
        if stride > 1:
            pos, cand, ok = matcher.anchor_candidates(chunk, stride)
            # dual compaction + device greedy selection (round 5):
            # exact-gap records feed the prefix-max selection, coarse
            # records feed the walk fallback; coverage scalars
            # arbitrate - same graph as the single-device TpuMatchJob,
            # so archives stay byte-identical
            fine, n_raw, coarse, n_w = matcher.compact_seeds_dual(
                pos, cand, ok, limit, cap, stride,
                matcher._verify_gap(stride), matcher._CHAIN_GAP)
            ss, sl, sd, n_sel = matcher.select_records(*fine, n_raw)
            cov_v = jnp.sum(jnp.where(
                jax.lax.iota(jnp.int32, sl.shape[0]) < n_sel, sl, 0))
            cov_w = matcher._selected_coverage(*coarse, n_w)
            return coarse + (n_w, n_raw, ss, sl, sd, n_sel,
                             cov_v, cov_w)
        cand, ok = matcher.match_candidates(chunk)
        s, e, c, n_runs = matcher.compact_runs(cand, ok, limit, cap)
        return (s, e, c, n_runs)

    out_sh = (osh, osh, osh, nsh)
    if stride > 1:
        out_sh = out_sh + (nsh, osh, osh, osh, nsh, nsh, nsh)
    return jax.jit(jax.vmap(one),
                   in_shardings=(dsh, lsh),
                   out_shardings=out_sh)


def pipeline_mesh() -> Optional[Mesh]:
    """Mesh for the production compression path, or None when only one
    device is visible (the single-chip TpuMatchJob pipeline is better
    there: Pallas compaction kernels + device-resident literal path)."""
    if len(jax.devices()) < 2:
        return None
    return make_mesh()


class MeshMatchBatch:
    """dp-sharded matcher dispatch for a batch of equal-size chunks.

    The multi-device analog of ops.matcher.TpuMatchJob: construction
    launches one sharded jit over a (dp, NB) batch; ``collect(i)``
    reads back chunk i's compacted seeds and runs the host greedy cover
    (exact byte verification + extension), exactly as the single-device
    path does - archives byte-match the 1-device result.

    Chunks beyond ``len(chunks)`` up to dp are zero-padded rows whose
    outputs are discarded.
    """

    def __init__(self, mesh: Mesh, chunks: list, stride: int):
        from ..ops.matcher import HASH_W, _bucket_size
        self.chunks = chunks
        self.stride = stride
        csize = len(chunks[0])
        assert all(len(c) == csize for c in chunks)
        self.trivial = csize <= HASH_W + 4 or csize < 4 * stride
        if self.trivial:
            return
        dp = mesh.devices.shape[0]
        assert len(chunks) <= dp
        nb = _bucket_size(csize)
        batch = np.zeros((dp, nb), np.uint8)
        for i, c in enumerate(chunks):
            batch[i, :csize] = c
        self.limit = csize - HASH_W + 1
        if stride > 1:
            k = (nb - HASH_W + 1) // stride
        else:
            k = nb - HASH_W + 1
        self.cap = max(min(k, 4096), k // 64)
        self.kk = k
        limits = jnp.full((dp,), jnp.int32(self.limit))
        self.compacted = _batched_seed_fn(mesh, stride, self.cap)(
            jnp.asarray(batch), limits)
        # per-chunk device-resident padded buffers for the literal
        # backend (models/device_path.DeviceLiteralEncode): chunk i is
        # pinned to dp-row i's first device, so dp chunks rANS-encode
        # in parallel across the mesh - the device literal path and the
        # mesh compose instead of excluding each other.
        self._dev = [
            jax.device_put(batch[i], mesh.devices[i % dp, 0])
            for i in range(len(chunks))]
        self._fetched = None
        self.stats: list = [{} for _ in chunks]

    def job_for(self, i: int):
        """TpuMatchJob-shaped shim carrying chunk i's device buffer."""
        class _Shim:
            dev = None
        s = _Shim()
        if not self.trivial:
            s.dev = self._dev[i]
        return s

    def _fetch(self):
        if self._fetched is None:
            arrs = self.compacted
            tri = np.asarray(jax.device_get(jnp.stack(arrs[:3])))
            n_cnt = np.asarray(jax.device_get(arrs[3]))
            if len(arrs) > 4:  # stride>1: device-selected pieces too
                n_raw = np.asarray(jax.device_get(arrs[4]))
                sel = np.asarray(jax.device_get(jnp.stack(arrs[5:8])))
                n_sel = np.asarray(jax.device_get(arrs[8]))
                covs = (np.asarray(jax.device_get(arrs[9])),
                        np.asarray(jax.device_get(arrs[10])))
            else:
                n_raw, sel, n_sel, covs = n_cnt, None, None, None
            self._fetched = (tri, n_cnt, n_raw, sel, n_sel, covs)
        return self._fetched

    def collect(self, i: int):
        """Tokens for chunk i (columnar kinds/lengths/dists)."""
        data = np.asarray(self.chunks[i], dtype=np.uint8)
        n = len(data)
        if self.trivial:
            self.stats[i] = {"chunk_bytes": n, "chains": 0, "matches": 0,
                             "match_bytes": 0, "literals": 1 if n else 0,
                             "literal_bytes": n}
            if n == 0:
                return (np.zeros(0, np.uint8), np.zeros(0, np.int64),
                        np.zeros(0, np.int64))
            return (np.array([0], np.uint8), np.array([n], np.int64),
                    np.array([0], np.int64))
        tri, n_cnt, n_raw, sel, n_sel, covs = self._fetch()
        k = int(n_cnt[i])
        if int(n_raw[i]) > self.cap:
            # rare overflow: redo this chunk through the single-device
            # job, whose bucketed-cap retry is the same one the
            # non-mesh pipeline would have taken (byte-identical).
            from ..ops.matcher import TpuMatchJob
            job = TpuMatchJob(data, stride=self.stride)
            tokens = job.collect()
            self.stats[i] = job.stats
            return tokens
        kinds = None
        if sel is not None:
            # device-selected pieces + host finalize, exactly as the
            # single-device select path (same coverage-gap fallback, a
            # pure function of chunk content - archives byte-match)
            cov_v, cov_w = int(covs[0][i]), int(covs[1][i])
            if cov_w - cov_v > max(cov_w // 4, n // 256):
                pass  # dense interleaved redundancy: heap walk below
            else:
                ks = int(n_sel[i])
                kinds, lengths, dists = matcher.finalize_selected(
                    sel[0, i, :ks].astype(np.int64),
                    sel[1, i, :ks].astype(np.int64),
                    sel[2, i, :ks].astype(np.int64), n, data)
        if kinds is None:
            rs = tri[0, i, :k].astype(np.int64)
            re = tri[1, i, :k].astype(np.int64)
            if self.stride > 1:
                src = rs - tri[2, i, :k].astype(np.int64)  # dist column
            else:
                src = tri[2, i, :k].astype(np.int64)
            rl = re - rs + 1
            kinds, lengths, dists = matcher.greedy_cover_from_runs(
                rs, rl, src, n, data=data,
                gap_merged=self.stride > 1)
        m = kinds == 1
        self.stats[i] = {
            "chunk_bytes": n, "chains": k, "matches": int(m.sum()),
            "match_bytes": int(lengths[m].sum()),
            "literals": int((~m).sum()),
            "literal_bytes": int(lengths[~m].sum()),
        }
        return kinds, lengths, dists
