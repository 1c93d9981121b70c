"""Distributed chunk-parallel compression (simulated multi-host)."""

import io

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.parallel import distributed


def test_chunk_assignment_covers_all():
    for n_chunks in (1, 5, 8, 17):
        for n_hosts in (1, 2, 4):
            seen = []
            for h in range(n_hosts):
                seen += distributed.chunk_assignment(n_chunks, n_hosts, h)
            assert sorted(seen) == list(range(n_chunks))


def test_distributed_matches_local(corpus_factory):
    """2 simulated hosts produce a byte-stream the ordinary decoder
    accepts, with identical decompressed content."""
    data = np.frombuffer(corpus_factory(300_000, "mixed"), dtype=np.uint8)
    s = lrz.Settings(method="gzip", max_chunk=80_000)

    # simulate: run each host's share, then gather
    host_results = {}
    for host in (0, 1):
        sizes = distributed.pipeline.plan_chunks(len(data), s)
        bounds = []
        pos = 0
        for sz in sizes:
            bounds.append((pos, sz))
            pos += sz
        mine = distributed.chunk_assignment(len(bounds), 2, host)
        blobs = []
        for ci in mine:
            p0, cs = bounds[ci]
            eof = ci == len(bounds) - 1
            blobs.append((ci, distributed.compress_chunk_blob(
                data[p0:p0 + cs], eof, s)))
        host_results[host] = blobs

    def gather(my_blobs):
        return [host_results[0], host_results[1]]

    out = io.BytesIO()
    n = distributed.compress_distributed(data, out, s, n_hosts=2, host=0,
                                         gather=gather)
    archive = out.getvalue()
    assert n == len(archive)
    assert lrz.decompress(archive) == data.tobytes()


def test_non_root_host_returns_none(corpus_factory):
    data = np.frombuffer(corpus_factory(50_000, "text"), dtype=np.uint8)
    s = lrz.Settings(method="none", max_chunk=20_000)
    out = io.BytesIO()
    assert distributed.compress_distributed(
        data, out, s, n_hosts=2, host=1, gather=lambda b: [b]) is None
