"""Multi-host chunk-parallel compression (the DCN scale-out path).

The reference is single-node (SURVEY.md section 2.3: "Distributed
communication backend: none").  The .lrz format makes scale-out exact:
rzip chunks are fully independent (own window, own CRC, own eof flag -
doc/magic.header.txt "Rzip Chunk Data"), so hosts compress disjoint
chunk ranges and the archive is the ordered concatenation.

Flow (mirrors the ordered-writer P2 semantics without any seek-back):
1. every host calls `jax.distributed.initialize()` (env-driven);
2. chunks are assigned round-robin by index; each host compresses its
   chunks to independent byte strings (chunk framing is self-contained);
3. host 0 gathers the per-chunk blobs in chunk order (via the jax
   all-gather collective over a length-prefixed byte tensor) and writes
   magic + chunks + hash tail.

On one host this degenerates to the ordinary pipeline (and is what the
tests exercise); the collective path compiles against any process
count.
"""

from __future__ import annotations

import io
from typing import List, Optional

import numpy as np

from ..format import constants as C
from ..models import pipeline


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> int:
    """Initialise jax.distributed (no-op if single process)."""
    import jax
    if num_processes and num_processes > 1:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return getattr(jax, "process_count", lambda: 1)()


def kv_gather_blobs(blobs, n_hosts: int, host: int,
                    timeout_ms: int = 600_000, tag: str = "gather"):
    """Ordered gather of per-host chunk blobs over the jax.distributed
    coordination service KV store.

    This is the control-plane analog of the reference's ordered-writer
    ticket (P2, src/stream.c:87-89): every host publishes its
    (chunk_index, bytes) list; host 0 blocks until all are present and
    returns them, others return None.  Compressed chunks are small
    relative to DCN bandwidth, and the KV service rides the same
    coordinator every multi-host JAX job already runs, so no device
    collective is needed for the byte-level commit.
    """
    import base64
    import pickle

    from jax._src import distributed
    client = distributed.global_state.client
    if client is None:
        raise RuntimeError(
            "jax.distributed is not initialised; call init_distributed "
            "or pass an explicit gather callback")
    payload = base64.b64encode(pickle.dumps(blobs)).decode("ascii")
    client.key_value_set(f"lrz/{tag}/{host}", payload)
    if host != 0:
        return None
    out = []
    for h in range(n_hosts):
        s = client.blocking_key_value_get(f"lrz/{tag}/{h}", timeout_ms)
        out.append(pickle.loads(base64.b64decode(s)))
    return out


def chunk_assignment(n_chunks: int, n_hosts: int, host: int) -> List[int]:
    """Contiguous block assignment keeps I/O sequential per host."""
    per = (n_chunks + n_hosts - 1) // n_hosts
    lo = host * per
    return list(range(lo, min(lo + per, n_chunks)))


def compress_chunk_blob(data: np.ndarray, eof: bool,
                        settings: pipeline.Settings) -> bytes:
    """Compress one chunk to its self-contained on-disk byte string."""
    from concurrent.futures import ThreadPoolExecutor
    buf = io.BytesIO()
    cfg = pipeline._backend_cfg(settings)
    from ..backends import ctype_for_method
    ctype = ctype_for_method(settings.method)
    pool = ThreadPoolExecutor(max_workers=settings.resolved_threads())
    try:
        pipeline._compress_chunk(
            buf, np.asarray(data, dtype=np.uint8), eof, ctype, cfg,
            settings, pool,
            lambda c: pipeline._encode_tokens(c, settings))
    finally:
        pool.shutdown()
    return buf.getvalue()


def compress_distributed(data: np.ndarray, out,
                         settings: Optional[pipeline.Settings] = None,
                         n_hosts: int = 1, host: int = 0,
                         gather=None) -> Optional[int]:
    """Chunk-parallel compression across hosts.

    ``gather(host_blobs: list[bytes]) -> list[list[bytes]]`` abstracts
    the cross-host exchange (tests inject a local gather; production
    uses jax.experimental.multihost_utils).  Only host 0 returns the
    byte count; other hosts return None.
    """
    settings = settings or pipeline.Settings()
    data = np.asarray(data, dtype=np.uint8)
    total = len(data)
    sizes = pipeline.plan_chunks(total, settings)
    bounds = []
    pos = 0
    for s in sizes:
        bounds.append((pos, s))
        pos += s
    mine = chunk_assignment(len(bounds), n_hosts, host)
    blobs = []
    for ci in mine:
        p0, cs = bounds[ci]
        eof = ci == len(bounds) - 1
        blobs.append((ci, compress_chunk_blob(data[p0:p0 + cs], eof,
                                              settings)))
    if gather is None and n_hosts > 1:
        # production path: coordination-service gather
        gather = lambda my: kv_gather_blobs(my, n_hosts, host)  # noqa: E731
    if gather is None:
        all_blobs = [blobs]
    else:
        all_blobs = gather(blobs)
    if host != 0:
        return None
    # ordered commit: chunk index order, exactly once
    by_index = {}
    for host_blobs in all_blobs:
        for ci, blob in host_blobs:
            by_index[ci] = blob
    if sorted(by_index) != list(range(len(bounds))):
        raise RuntimeError("missing chunks in distributed gather")
    magic = pipeline._magic_for(settings, total, eof_known=True)
    out.write(magic.encode())
    written = magic.header_len
    from ..utils.hashing import ArchiveHash
    hasher = ArchiveHash(magic.hash_code) if magic.hash_code else None
    for ci in range(len(bounds)):
        out.write(by_index[ci])
        written += len(by_index[ci])
    if hasher is not None:
        hasher.update(data)
        digest = hasher.digest()
        out.write(digest)
        written += len(digest)
    return written
