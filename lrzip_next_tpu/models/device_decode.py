"""Decompress an archive directly into device (HBM) memory.

The reference can only decompress to host memory / files
(src/runzip.c:243-317); consumers that want the bytes on an accelerator
(training-data loaders, the framework's own device pipeline) pay a
second host->device copy.  This module replays archives ON the device:

- rans literal blocks (the device encode path's CTYPE) entropy-decode
  in HBM (ops/rans, Pallas scan) - the literal plane never exists on
  the host;
- host-backend literal blocks (lzma/zstd/... - anything the reference
  writes) decode on host threads and upload once;
- token replay runs as the ragged literal-concat kernel
  (ops/replay_ragged) either way, so the chunk bytes materialize in
  HBM at copy speed.

Output stays device-resident; pass verify=True to read it back and
check the stored per-chunk CRCs (costs the device->host transfer this
API exists to avoid).
"""

from __future__ import annotations

import io
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import List, Optional

import numpy as np

from ..format import constants as C
from ..format.container import read_chunk_header
from ..format.magic import MagicHeader
from ..format.tokens import decode_token_stream
from ..utils.hashing import stored_crc_int
from .pipeline import BackendConfig, Settings, _ChunkDecodeJob


def decompress_to_device(data, settings: Optional[Settings] = None,
                         verify: bool = False, interpret: bool = False):
    """Decompress ``data`` (archive bytes or a binary file object) to a
    list of per-chunk device arrays (uint8).  Raises ValueError on
    cross-chunk archives (their history walk is host-ordered; the
    default chunk-local format always qualifies)."""
    import jax
    import jax.numpy as jnp
    from .. import runtime
    from .device_path import replay_tokens_device_array

    settings = settings or Settings()
    fd = io.BytesIO(data) if isinstance(
        data, (bytes, bytearray, memoryview)) else data
    head = fd.read(C.MAGIC_LEN + 64)
    if len(head) < C.MAGIC_LEN:
        raise ValueError("archive too short for magic header")
    magic = MagicHeader.decode(head)
    fd.seek(magic.header_len)
    crypto = None
    if magic.enc_code:
        if settings.passphrase is None:
            raise ValueError(
                "archive is encrypted: a passphrase is required")
        from ..crypto import CryptoContext
        crypto = CryptoContext(settings.passphrase, magic.salt,
                               magic.enc_code,
                               minor_version=magic.minor_version)
    cfg = BackendConfig(
        compression_level=magic.compression_level or 7,
        dict_size=magic.lzma_dict_size,
        zpaq_level=magic.zpaq_level, zpaq_bs=magic.zpaq_bs,
        bzip3_bs=magic.bzip3_bs, zstd_level=magic.zstd_level,
        zstd_strategy=magic.zstd_strategy,
        threads=settings.resolved_threads())
    pool = ThreadPoolExecutor(max_workers=settings.resolved_threads())
    on_device = jax.devices()[0].platform != "cpu" or interpret
    chunks = []
    stored_crcs = []
    try:
        while True:
            hdr = read_chunk_header(fd, encrypted=crypto is not None)
            if hdr is None:
                break
            job = _ChunkDecodeJob(fd, hdr, magic, cfg, pool, crypto,
                                  use_device=on_device)
            fd.seek(job.end_offset)
            stream0, stream1 = job.streams()
            s0 = np.frombuffer(stream0, dtype=np.uint8)
            parsed = runtime.parse_token_stream(s0, hdr.chunk_bytes) \
                if runtime.available() else None
            if parsed is not None:
                kinds, lengths, dists, stored_crc, _ = parsed
            else:
                kinds, lengths, dists, stored_crc, _ = \
                    decode_token_stream(s0, hdr.chunk_bytes)
            if job.device_plane is not None:
                plane = job.device_plane
                # pass the bucket-padded plane UNsliced: a per-n slice
                # would compile a fresh executable (and re-key the
                # ragged kernel's row bucket) for every distinct
                # literal size; the replay plan never sources past
                # plane.n (advisor finding, round 4)
                lit_total = int(np.asarray(lengths)[
                    np.asarray(kinds) == 0].sum())
                if plane.n != lit_total:
                    raise ValueError("literal stream length mismatch")
                lit_dev = plane.plane if plane.plane is not None \
                    else jnp.zeros(1, jnp.uint8)
            else:
                plane = None
                lit_dev = jnp.asarray(np.frombuffer(
                    stream1 if stream1 else b"\0", dtype=np.uint8))
            if interpret:
                # CPU test mesh: run the production ragged-concat
                # kernel in interpret mode so this API's device path
                # is the code the tests exercise
                lengths64 = np.asarray(lengths, np.int64)
                flat = runtime.flatten_replay(kinds, lengths64,
                                              np.asarray(dists, np.int64)) \
                    if runtime.available() else None
                if flat is None:
                    out = replay_tokens_device_array(kinds, lengths,
                                                     dists, lit_dev)
                else:
                    from ..ops.replay_ragged import replay_pieces_ragged
                    out = replay_pieces_ragged(
                        flat[0], flat[1], lit_dev,
                        int(lengths64.sum()), interpret=True)
            else:
                out = replay_tokens_device_array(kinds, lengths,
                                                 dists, lit_dev)
            if out is None:
                raise ValueError(
                    "archive has cross-chunk matches: device "
                    "decode needs chunk-local distances")
            if plane is not None:
                plane.check()
            chunks.append(out)
            stored_crcs.append(stored_crc)
            if hdr.eof:
                break
    finally:
        pool.shutdown()
    if verify:
        cum = 0
        for arr, sc in zip(chunks, stored_crcs):
            b = np.asarray(jax.device_get(arr)).tobytes()
            crc = zlib.crc32(b) & 0xFFFFFFFF
            ok = sc == stored_crc_int(crc)
            if not ok:
                cum2 = zlib.crc32(b, cum) & 0xFFFFFFFF
                ok = sc == stored_crc_int(cum2)
            if not ok:
                raise ValueError(f"chunk CRC mismatch: 0x{sc:08x}")
            cum = zlib.crc32(b, cum) & 0xFFFFFFFF
    return chunks
