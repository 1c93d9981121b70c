"""Archive pipeline: compress_file / decompress_file equivalents.

Mirrors the reference orchestration layer (src/lrzip.c:1464-1591
``compress_file``, 1596-1810 ``decompress_file``) and the per-chunk codec
drivers (src/rzip.c:922-1264 ``rzip_fd``, src/runzip.c:261-502
``runzip_fd``), restructured for batch execution:

- the rzip matcher runs as an array pipeline (TPU via lrzip_next_tpu.ops,
  or the numpy host path) instead of a byte-at-a-time scan;
- backend block compression is block-parallel over a thread pool (the
  reference's P1 compthread pool, src/stream.c:1550-1834) or sharded
  over a device mesh (lrzip_next_tpu.parallel);
- block linked-list offsets are computed by prefix sum and written in one
  pass instead of seek-back patching (src/stream.c:1772-1783).
"""

from __future__ import annotations

import dataclasses
import io
import os
import zlib
from concurrent.futures import ThreadPoolExecutor
from typing import BinaryIO, Callable, List, Optional, Tuple

import numpy as np

from ..backends import BackendConfig, compress_block, ctype_for_method, \
    decompress_block
from ..format import constants as C
from ..format.container import Block, ChunkReader, read_chunk_header, \
    write_chunk
from ..format.magic import MagicHeader
from ..format.tokens import decode_token_stream, encode_token_stream, \
    replay_tokens, split_long_runs
from ..utils.hashing import ArchiveHash, stored_crc_int
from ..ops.filters import apply_filter, undo_filter
from . import rzip_host


@dataclasses.dataclass
class Settings:
    """User-facing compression settings (the rzip_control analogue,
    reference src/include/lrzip_private.h:472-581)."""

    method: str = "lzma"           # lzma|gzip|bzip2|zstd|lzo|zpaq|bzip3|none
    compression_level: int = 7
    rzip_level: int = -1           # -1: follow compression_level (main.c:787)
    hash_name: str = "MD5"
    window: int = 0                # -w N: chunk = N * 100MB
    unlimited: bool = False        # -U
    threads: int = 0               # 0 = cpu count
    block_size: int = C.STREAM_BUFSIZE
    max_chunk: int = 0             # explicit chunk cap (testing / RAM plan)
    comment: bytes = b""
    progress: Optional[Callable[[str, int, int], None]] = None
    # progress(stage, done_bytes, total_bytes); stage in
    # {"rzip", "backend", "write", "decompress"}
    stats_sink: Optional[Callable[[dict], None]] = None
    # per-chunk matcher counters at max verbosity (reference
    # st->stats, src/rzip.c:1238-1246)
    filter_flag: int = 0           # FILTER_* BCJ code or FILTER_DELTA
    delta_offset: int = 1
    dict_size: int = 0             # lzma dictionary (0 = default by level)
    zstd_level: int = 0            # 0 = derive from compression_level
    zpaq_level: int = 0
    zpaq_bs: int = 6
    bzip3_bs: int = 4
    use_tpu: bool = False          # rzip matcher on TPU (ops pipeline)
    use_mesh: Optional[bool] = None  # dp/sp-sharded multi-device matcher;
    # None = auto (engage when >1 device is visible, except for the
    # single-chip device-resident rans literal path)
    anchor_stride: int = 0         # TPU matcher sampling; 0 = by level
    cross_chunk: bool = False      # matches reaching into earlier chunks
    lz4_test: bool = True          # compressibility gate before backends
    threshold: int = 100
    bemt: bool = True              # backend-internal MT (--nobemt off,
    # the reference's LzFindMt toggle at src/stream.c:456)
    lzma_mf: int = 0               # 0 = bt4 default; 2..5 = bt2..bt5
    # (--lzma-mf, the SDK numHashBytes dial, LzFind.c:962-1400)
    passphrase: Optional[bytes] = None  # -e: enables encryption
    enc_code: int = 0              # 1=AES128, 2=AES256 (default 1 w/ pass)
    costfactor_exp: int = 0        # SCRYPT 2^N; 0 = auto

    def resolved_threads(self) -> int:
        return self.threads or os.cpu_count() or 1

    def resolved_rzip_level(self) -> int:
        return self.compression_level if self.rzip_level < 0 \
            else self.rzip_level

    def resolved_dict_size(self) -> int:
        if self.dict_size:
            return self.dict_size
        # reference defaults by level (src/util.c:109-126)
        lvl = min(max(self.compression_level, 1), 9)
        if lvl <= 3:
            return 1 << (lvl * 2 + 16)
        if lvl <= 6:
            return 1 << (lvl + 19)
        return 1 << (18 + lvl)  # 7->2^25, 8->2^26, 9->2^27

    def resolved_zpaq_level(self) -> int:
        # reference: round(level * 5 / 9) (src/util.c:134)
        return self.zpaq_level or max(1, round(
            self.compression_level * 5 / 9))

    def resolved_anchor_stride(self) -> int:
        if self.anchor_stride:
            return self.anchor_stride
        from ..ops.matcher import default_anchor_stride
        return default_anchor_stride(self.resolved_rzip_level())

    def resolved_zstd(self) -> Tuple[int, int]:
        lvl = min(max(self.compression_level, 1), 9)
        return (self.zstd_level or C.ZSTD_LEVEL_FROM_LRZIP_LEVEL[lvl],
                C.ZSTD_STRATEGY_FROM_LRZIP_LEVEL[lvl])


def _magic_for(settings: Settings, expected_size: int,
               eof_known: bool) -> MagicHeader:
    h = MagicHeader(expected_size=expected_size, eof_known=eof_known,
                    hash_code=C.HASH_CODE[settings.hash_name.upper()],
                    rzip_level=settings.resolved_rzip_level(),
                    compression_level=settings.compression_level,
                    comment=settings.comment,
                    filter_flag=settings.filter_flag,
                    delta_offset=settings.delta_offset)
    m = settings.method
    if m == "lzma":
        h.method_code = C.MAGIC_CTYPE_LZMA
        h.lzma_dict_size = settings.resolved_dict_size()
    elif m == "zpaq":
        h.method_code = C.MAGIC_CTYPE_ZPAQ
        h.zpaq_level = settings.resolved_zpaq_level()
        h.zpaq_bs = settings.zpaq_bs
    elif m == "bzip3":
        h.method_code = C.MAGIC_CTYPE_BZIP3
        h.bzip3_bs = settings.bzip3_bs
    elif m == "zstd":
        h.zstd_level, h.zstd_strategy = settings.resolved_zstd()
        h.method_code = C.MAGIC_CTYPE_ZSTD
    return h


def _backend_cfg(settings: Settings) -> BackendConfig:
    zl, zs = settings.resolved_zstd()
    return BackendConfig(
        compression_level=settings.compression_level,
        dict_size=settings.resolved_dict_size(),
        zpaq_level=settings.resolved_zpaq_level(), zpaq_bs=settings.zpaq_bs,
        bzip3_bs=settings.bzip3_bs, zstd_level=zl, zstd_strategy=zs,
        threads=settings.resolved_threads(), bemt=settings.bemt,
        lzma_mf=settings.lzma_mf)


# Largest chunk the single-chip matcher keeps resident in HBM (v5e has
# 16GB; the pipeline peaks around ~26 bytes per input byte).  Bigger
# windows come from cross-chunk matching, not bigger chunks.
TPU_CHUNK_CAP = 256 << 20


def plan_chunks(total: int, settings: Settings,
                ram_budget: Optional[int] = None) -> List[int]:
    """Split the input into rzip chunk sizes (reference src/rzip.c:999-1020:
    chunk = min(file, 2/3 ram), -w window override, -U whole file)."""
    if total == 0:
        return [0]
    if settings.unlimited:
        # -U: window = whole file. Beyond the RAM budget this becomes
        # RAM-sized chunks + cross-chunk matching (models/crosschunk.py),
        # the memory-bounded analog of the reference's sliding mmap
        # (src/rzip.c:84-181).
        from ..utils.memplan import default_max_chunk
        max_chunk = min(total,
                        settings.max_chunk or default_max_chunk(ram_budget))
    elif settings.window:
        max_chunk = settings.window * C.CHUNK_MULTIPLE
    elif settings.max_chunk:
        max_chunk = settings.max_chunk
    else:
        from ..utils.memplan import default_max_chunk
        max_chunk = default_max_chunk(ram_budget)
    if settings.use_tpu and not settings.max_chunk:
        max_chunk = min(max_chunk, TPU_CHUNK_CAP)
    sizes = []
    left = total
    while left > 0:
        c = min(left, max_chunk)
        sizes.append(c)
        left -= c
    return sizes


def _encode_tokens(chunk: np.ndarray, settings: Settings):
    if settings.use_tpu:
        from ..ops.matcher import rzip_encode_chunk_tpu
        return rzip_encode_chunk_tpu(
            chunk, stride=settings.resolved_anchor_stride())
    return rzip_host.rzip_encode_chunk(chunk)


def _split_stream(buf: np.ndarray, block_size: int) -> List[np.ndarray]:
    if len(buf) == 0:
        return []
    return [buf[i:i + block_size] for i in range(0, len(buf), block_size)]


def compress_stream(data: bytes | np.ndarray, out: BinaryIO,
                    settings: Optional[Settings] = None,
                    encode_tokens=None) -> int:
    """Compress a whole input to an .lrz archive; returns bytes written."""
    settings = settings or Settings()
    data = np.frombuffer(data, dtype=np.uint8) if isinstance(
        data, (bytes, bytearray, memoryview)) else np.asarray(
            data, dtype=np.uint8)
    total = len(data)
    custom_tokens = encode_tokens is not None
    encode_tokens = encode_tokens or (
        lambda chunk: _encode_tokens(chunk, settings))

    crypto = None
    if settings.passphrase is not None:
        from ..crypto import CryptoContext, keys as ckeys
        exp = settings.costfactor_exp or ckeys.default_costfactor_exp()
        crypto = CryptoContext.fresh(settings.passphrase,
                                     settings.enc_code or 1,
                                     costfactor_exp=exp)

    magic = _magic_for(settings, total, eof_known=True)
    if crypto is not None:
        magic.enc_code = crypto.enc_code
        magic.salt = crypto.salt
    out.write(magic.encode())
    written = magic.header_len

    hasher = ArchiveHash(magic.hash_code) if magic.hash_code else None
    cfg = _backend_cfg(settings)
    try:
        ctype = ctype_for_method(settings.method)
    except KeyError:
        raise ValueError(f"unknown compression method {settings.method!r}")
    pool = ThreadPoolExecutor(max_workers=settings.resolved_threads())

    chunk_sizes = plan_chunks(total, settings)
    bounds = []
    pos = 0
    for csize in chunk_sizes:
        bounds.append((pos, csize))
        pos += csize

    # Cross-chunk matching: the format lets match distances reach into
    # earlier chunks (the decoder replays from the whole output,
    # reference src/runzip.c:184-241); widen the chunk byte width to the
    # whole file and splice verified cross-chunk matches into literal
    # spans (models/crosschunk.py).
    xindex = None
    w_override = None
    if settings.cross_chunk and not settings.unlimited and len(bounds) > 1:
        from .crosschunk import CrossChunkIndex
        xindex = CrossChunkIndex()
        w_override = C.chunk_byte_width(total)

    def finish_chunk(ci, p0, csize, chunk, tokens, dev_job=None):
        nonlocal written
        if xindex is not None:
            from .crosschunk import find_cross_matches, \
                splice_cross_matches
            max_dist = (1 << (8 * w_override)) - 1
            cross = find_cross_matches(data, xindex, p0, csize, max_dist)
            tokens = splice_cross_matches(*tokens, cross, p0)
            xindex.add_chunk(chunk, p0)
        eof = ci == len(bounds) - 1
        written += _compress_chunk(out, chunk, eof, ctype, cfg,
                                   settings, pool, lambda _c: tokens,
                                   crypto, w_override=w_override,
                                   dev_job=dev_job)
        if hasher is not None:
            hasher.update(chunk)
        if settings.progress:
            settings.progress("rzip", p0 + csize, total)

    # TPU path: pipeline chunks - submit k+1's device work before
    # collecting k, overlapping device compute with host packaging and
    # backend compression (device dispatch is asynchronous).  With >1
    # device visible, consecutive equal-size chunks are dp-sharded
    # across the mesh instead (parallel/mesh.MeshMatchBatch) - the
    # multi-device analog of the reference's chunk loop, byte-identical
    # to the single-device archive.
    unlimited = settings.unlimited and len(bounds) > 1 and not custom_tokens
    mesh = None
    if settings.use_tpu and not custom_tokens and not unlimited \
            and len(bounds) > 1:
        # the mesh now composes with the device literal backend
        # (MeshMatchBatch.job_for pins each chunk's buffer to its dp
        # row), so rans-method runs no longer force single-device
        if settings.use_mesh or settings.use_mesh is None:
            from ..parallel.mesh import pipeline_mesh
            mesh = pipeline_mesh()
    try:
        if unlimited:
            written += _compress_unlimited(out, data, bounds, ctype, cfg,
                                           settings, pool, crypto, hasher)
        elif mesh is not None:
            _compress_chunks_mesh(mesh, data, bounds, settings,
                                  finish_chunk)
        elif settings.use_tpu and not custom_tokens:
            from ..ops.matcher import TpuMatchJob
            jobs = {}
            stride = settings.resolved_anchor_stride()
            lookahead = 1
            for ci in range(min(lookahead + 1, len(bounds))):
                p0, cs = bounds[ci]
                jobs[ci] = TpuMatchJob(np.asarray(data[p0:p0 + cs]),
                                       stride=stride)
            for ci, (p0, csize) in enumerate(bounds):
                nxt = ci + lookahead + 1
                if nxt < len(bounds):
                    pn, cn = bounds[nxt]
                    jobs[nxt] = TpuMatchJob(np.asarray(data[pn:pn + cn]),
                                            stride=stride)
                chunk = np.asarray(data[p0:p0 + csize])
                job = jobs.pop(ci)
                tokens = job.collect()
                if settings.stats_sink is not None:
                    settings.stats_sink(dict(job.stats, chunk=ci))
                finish_chunk(ci, p0, csize, chunk, tokens, dev_job=job)
        else:
            for ci, (p0, csize) in enumerate(bounds):
                chunk = np.asarray(data[p0:p0 + csize])
                finish_chunk(ci, p0, csize, chunk, encode_tokens(chunk))
    finally:
        pool.shutdown()
    if hasher is not None:
        digest = hasher.digest()
        if crypto is not None:
            # the stored hash is encrypted in place with salt_pass as the
            # salt (reference src/rzip.c:1214-1217); digests are >= 16
            # bytes so CBC-CTS needs no padding
            digest = crypto.encrypt_block(digest, crypto.salt_pass)
        out.write(digest)
        written += len(digest)
    return written


def _compress_chunks_mesh(mesh, data, bounds, settings: Settings,
                          finish_chunk) -> None:
    """dp-sharded chunk loop: batches of consecutive equal-size chunks
    run through one sharded matcher dispatch each (parallel/mesh.
    MeshMatchBatch), pipelined one batch ahead so device compute
    overlaps host packaging - the multi-device form of the TpuMatchJob
    loop, producing byte-identical archives."""
    from ..parallel.mesh import MeshMatchBatch
    dp = mesh.devices.shape[0]
    stride = settings.resolved_anchor_stride()

    groups: List[List[int]] = []
    cur: List[int] = []
    for ci, (p0, cs) in enumerate(bounds):
        if cur and (len(cur) == dp or bounds[cur[0]][1] != cs):
            groups.append(cur)
            cur = []
        cur.append(ci)
    groups.append(cur)

    def dispatch(g):
        chunks = [np.asarray(data[bounds[ci][0]:bounds[ci][0]
                                  + bounds[ci][1]]) for ci in g]
        return MeshMatchBatch(mesh, chunks, stride)

    batches = {0: dispatch(groups[0])}
    if len(groups) > 1:
        batches[1] = dispatch(groups[1])
    for gi, g in enumerate(groups):
        nxt = gi + 2
        if nxt < len(groups):
            batches[nxt] = dispatch(groups[nxt])
        mb = batches.pop(gi)
        for j, ci in enumerate(g):
            p0, csize = bounds[ci]
            chunk = np.asarray(data[p0:p0 + csize])
            tokens = mb.collect(j)
            if settings.stats_sink is not None:
                settings.stats_sink(dict(mb.stats[j], chunk=ci))
            finish_chunk(ci, p0, csize, chunk, tokens,
                         dev_job=mb.job_for(j))


def _compress_unlimited(out: BinaryIO, data, bounds, ctype: int,
                        cfg: BackendConfig, settings: Settings,
                        pool: ThreadPoolExecutor, crypto, hasher) -> int:
    """-U: ONE rzip chunk spanning the whole file, built from HBM-sized
    window passes - the memory-bounded analog of the reference's
    sliding mmap (src/rzip.c:84-181), emitting archives the reference
    binary decodes (all distances stay within the single chunk, which
    its runzip replays from RAM or fd_hist, src/runzip.c:184-241).

    Each window is matched against itself on the device and against
    every earlier window via the host cross-window index
    (models/crosschunk.py); the spliced window token streams
    concatenate into one whole-file stream.  Literal bytes flush to
    backend blocks as they accumulate, so peak RAM is one window plus
    the (compressed) output blocks.
    """
    from .crosschunk import CrossChunkIndex, find_cross_matches, \
        splice_cross_matches

    total = len(data)
    w = C.chunk_byte_width(max(total, 1))
    max_dist = (1 << (8 * w)) - 1
    xindex = CrossChunkIndex()
    gate = _lz4_gate(settings)
    stride = settings.resolved_anchor_stride()

    all_k: List[np.ndarray] = []
    all_l: List[np.ndarray] = []
    all_d: List[np.ndarray] = []
    lit_parts: List[np.ndarray] = []
    lit_len = 0
    lit_futs: List = []
    crc = 0

    def submit_block(raw: bytes):
        if settings.filter_flag:
            raw = apply_filter(raw, settings.filter_flag,
                               settings.delta_offset)

        def work(raw=raw):
            use_ctype = ctype
            if use_ctype != C.CTYPE_NONE and gate is not None \
                    and not gate(raw):
                use_ctype = C.CTYPE_NONE
            ct, payload = compress_block(raw, use_ctype, cfg)
            return Block(streamno=1, c_type=ct, c_len=len(payload),
                         u_len=len(raw), payload=payload)

        lit_futs.append(pool.submit(work))

    def add_literals(arr: np.ndarray, final: bool = False):
        nonlocal lit_len
        if len(arr):
            lit_parts.append(arr)
            lit_len += len(arr)
        while lit_len >= settings.block_size or (final and lit_len):
            buf = np.concatenate(lit_parts) if len(lit_parts) > 1 \
                else lit_parts[0]
            submit_block(buf[:settings.block_size].tobytes())
            rest = buf[settings.block_size:]
            lit_parts[:] = [rest] if len(rest) else []
            lit_len = len(rest)

    def make_job(ci):
        p0, cs = bounds[ci]
        chunk = np.asarray(data[p0:p0 + cs])
        if settings.use_tpu:
            from ..ops.matcher import TpuMatchJob
            return chunk, TpuMatchJob(chunk, stride=stride)
        return chunk, None

    jobs = {ci: make_job(ci) for ci in range(min(2, len(bounds)))}
    for ci, (p0, csize) in enumerate(bounds):
        if ci + 2 < len(bounds):
            jobs[ci + 2] = make_job(ci + 2)
        chunk, job = jobs.pop(ci)
        tokens = job.collect() if job is not None \
            else rzip_host.rzip_encode_chunk(chunk)
        if job is not None and settings.stats_sink is not None:
            settings.stats_sink(dict(job.stats, chunk=ci))
        cross = find_cross_matches(data, xindex, p0, csize, max_dist)
        tokens = splice_cross_matches(*tokens, cross, p0)
        xindex.add_chunk(chunk, p0)
        k, ln, d = split_long_runs(*tokens)
        all_k.append(k)
        all_l.append(ln)
        all_d.append(d)
        add_literals(rzip_host.literals_of(chunk, k, ln))
        crc = zlib.crc32(chunk, crc)
        if hasher is not None:
            hasher.update(chunk)
        if settings.progress:
            settings.progress("rzip", p0 + csize, total)
    add_literals(np.zeros(0, np.uint8), final=True)

    kinds = np.concatenate(all_k) if all_k else np.zeros(0, np.uint8)
    lengths = np.concatenate(all_l) if all_l else np.zeros(0, np.int64)
    dists = np.concatenate(all_d) if all_d else np.zeros(0, np.int64)
    stream0 = encode_token_stream(kinds, lengths, dists, w,
                                  stored_crc_int(crc & 0xFFFFFFFF))

    def tok_one(raw: bytes):
        use_ctype = ctype
        if use_ctype != C.CTYPE_NONE and gate is not None \
                and not gate(raw):
            use_ctype = C.CTYPE_NONE
        ct, payload = compress_block(raw, use_ctype, cfg)
        return Block(streamno=0, c_type=ct, c_len=len(payload),
                     u_len=len(raw), payload=payload)

    tok_blocks = list(pool.map(
        tok_one, [p.tobytes() for p in
                  _split_stream(stream0, settings.block_size)]))
    blocks = tok_blocks + [f.result() for f in lit_futs]
    return write_chunk(out, w, True, total, blocks, crypto=crypto)


def _compress_chunk(out: BinaryIO, chunk: np.ndarray, eof: bool, ctype: int,
                    cfg: BackendConfig, settings: Settings,
                    pool: ThreadPoolExecutor, encode_tokens,
                    crypto=None, w_override: Optional[int] = None,
                    dev_job=None) -> int:
    csize = len(chunk)
    w = w_override or C.chunk_byte_width(max(csize, 1))
    # P4 checksum offload: the chunk CRC runs on the pool concurrently
    # with the match search / device collect (the reference overlaps
    # CRC+hash with its search threads, src/rzip.c:564-584)
    crc_fut = pool.submit(lambda: zlib.crc32(chunk) & 0xFFFFFFFF)
    kinds, lengths, dists = encode_tokens(chunk)
    kinds, lengths, dists = split_long_runs(kinds, lengths, dists)
    stream0 = encode_token_stream(kinds, lengths, dists, w,
                                  stored_crc_int(crc_fut.result()))

    # Device-resident literal backend: with the rans codec and no
    # filter, the literal stream never comes to the host - it is
    # extracted by mask-compaction from the chunk already in HBM and
    # rANS-encoded there (models/device_path.py); only the compressed
    # payload is read back.
    lit_block = None
    if (dev_job is not None and ctype == C.CTYPE_RANS
            and not settings.filter_flag
            and getattr(dev_job, "dev", None) is not None):
        from .device_path import DeviceLiteralEncode
        from ..backends.rans_codec import ctx_bits_for_level
        enc = DeviceLiteralEncode(dev_job.dev, kinds, lengths,
                                  ctx_bits_for_level(
                                      settings.compression_level))
        payload = enc.payload()
        if payload is not None and len(payload) < enc.n_lit:
            lit_block = Block(streamno=1, c_type=C.CTYPE_RANS,
                              c_len=len(payload), u_len=enc.n_lit,
                              payload=payload)
        elif payload is not None:
            raw = rzip_host.literals_of(chunk, kinds, lengths).tobytes()
            lit_block = Block(streamno=1, c_type=C.CTYPE_NONE,
                              c_len=len(raw), u_len=len(raw), payload=raw)
        # n_lit == 0: no literal block at all (lit_block stays None and
        # stream1 below is empty anyway)

    stream1 = np.zeros(0, np.uint8) if lit_block is not None \
        else rzip_host.literals_of(chunk, kinds, lengths)

    gate = _lz4_gate(settings)
    jobs = []
    for streamno, stream in ((0, stream0), (1, stream1)):
        for part in _split_stream(stream, settings.block_size):
            raw = part.tobytes()
            if streamno == 1 and settings.filter_flag:
                raw = apply_filter(raw, settings.filter_flag,
                                   settings.delta_offset)
            jobs.append((streamno, raw))

    def compress_one(job):
        streamno, raw = job
        use_ctype = ctype
        if use_ctype != C.CTYPE_NONE and gate is not None \
                and not gate(raw):
            use_ctype = C.CTYPE_NONE
        ct, payload = compress_block(raw, use_ctype, cfg)
        return Block(streamno=streamno, c_type=ct, c_len=len(payload),
                     u_len=len(raw), payload=payload)

    blocks = list(pool.map(compress_one, jobs))
    if lit_block is not None:
        blocks.append(lit_block)
    return write_chunk(out, w, eof, csize, blocks, crypto=crypto)


def _lz4_gate(settings: Settings) -> Optional[Callable[[bytes], bool]]:
    if not settings.lz4_test or settings.method == "none":
        return None
    from ..ops.lz4gate import compressibility_gate
    return lambda raw: compressibility_gate(raw, settings.threshold)


def decompress_stream(fd: BinaryIO, settings: Optional[Settings] = None
                      ) -> bytes:
    """Decompress a full .lrz archive (self- or reference-produced)."""
    return b"".join(iter_decompress(fd, settings))


class _ChunkDecodeJob:
    """Stage A of chunk decode: payload IO + block-parallel backend
    decompression, submitted to the pool so it overlaps the previous
    chunk's replay (the reference's read-ahead pool P3,
    src/stream.c:2022-2195, at chunk granularity)."""

    def __init__(self, fd: BinaryIO, hdr, magic: MagicHeader,
                 cfg: BackendConfig, pool: ThreadPoolExecutor,
                 crypto=None, use_device: bool = False):
        self.hdr = hdr
        reader = ChunkReader(fd, hdr, crypto=crypto)
        refs0 = list(reader.blocks(0))
        refs1 = list(reader.blocks(1))
        payloads = {id(r): reader.read_payload(r) for r in refs0 + refs1}
        self.end_offset = reader.end_offset()

        # Device decode path: a single rANS literal block (the shape the
        # device encode path writes) decodes in HBM and replays there
        # (models/device_path.py); the literal plane never visits the
        # host.
        self.device_plane = None
        if (use_device and not magic.filter_flag and len(refs1) == 1
                and refs1[0].c_type == C.CTYPE_RANS):
            from .device_path import DeviceLitPlane
            r = refs1[0]
            self.device_plane = DeviceLitPlane(payloads[id(r)], r.u_len)
            refs1 = []
        self.n0 = len(refs0)

        def decomp(ref):
            raw = decompress_block(payloads[id(ref)], ref.c_type,
                                   ref.u_len, cfg)
            if ref.streamno == 1 and magic.filter_flag:
                raw = undo_filter(raw, magic.filter_flag,
                                  magic.delta_offset,
                                  magic.minor_version)
            return raw

        self.futures = [pool.submit(decomp, r) for r in refs0 + refs1]

    def streams(self) -> Tuple[bytes, bytes]:
        results = [f.result() for f in self.futures]
        return (b"".join(results[:self.n0]),
                b"".join(results[self.n0:]))


def _decompress_chunk(fd: BinaryIO, hdr, magic: MagicHeader,
                      cfg: BackendConfig, pool: ThreadPoolExecutor,
                      history: np.ndarray, cumulative_crc: int,
                      crypto=None) -> Tuple[bytes, bool]:
    job = _ChunkDecodeJob(fd, hdr, magic, cfg, pool, crypto)
    fd.seek(job.end_offset)
    return _finish_chunk_decode(job, fd, hdr, cfg, history,
                                cumulative_crc)


def _finish_chunk_decode(job: "_ChunkDecodeJob", fd: BinaryIO, hdr,
                         cfg: BackendConfig, history: np.ndarray,
                         cumulative_crc: int) -> Tuple[bytes, bool]:
    stream0, stream1 = job.streams()

    from .. import runtime
    s0 = np.frombuffer(stream0, dtype=np.uint8)
    parsed = runtime.parse_token_stream(s0, hdr.chunk_bytes) \
        if runtime.available() else None
    if parsed is not None:
        kinds, lengths, dists, stored_crc, consumed = parsed
    else:
        kinds, lengths, dists, stored_crc, consumed = \
            decode_token_stream(s0, hdr.chunk_bytes)
    chunk = None
    if job.device_plane is not None:
        from .device_path import replay_device
        out = replay_device(kinds, lengths, dists, job.device_plane)
        if out is not None:
            chunk = np.frombuffer(out, dtype=np.uint8)
            stream1 = b""
        else:
            # cross-chunk reach: history lives host-side; read the
            # literal plane back and continue on the host path
            import jax
            plane = job.device_plane
            plane.check()
            stream1 = b"" if plane.plane is None else np.asarray(
                jax.device_get(plane.plane))[:plane.n].tobytes()
    literals = np.frombuffer(stream1, dtype=np.uint8)
    if chunk is None and runtime.available():
        # distances are chunk-local in practice; retry with history only
        # when a foreign archive actually reaches back past the chunk
        try:
            chunk = runtime.replay_tokens(kinds, lengths, dists, literals,
                                          int(lengths.sum()))
        except ValueError:
            chunk = runtime.replay_tokens(
                kinds, lengths, dists, literals, int(lengths.sum()),
                history=history if len(history) else None)
    if chunk is None:
        chunk = replay_tokens(kinds, lengths, dists, literals,
                              history=history if len(history) else None)
    chunk_bytes = chunk.tobytes()
    crc = zlib.crc32(chunk_bytes) & 0xFFFFFFFF
    crc_ok = stored_crc == stored_crc_int(crc)
    if not crc_ok and cumulative_crc != 0:
        # The reference never resets its gcry CRC handle between chunks
        # (src/rzip.c:943-950 opens it once per file), so reference
        # multi-chunk archives store the CRC of the whole prefix; our
        # writer stores the per-chunk CRC.  Both interpretations
        # coincide on chunk 0 (cumulative_crc == 0 there, so this
        # branch is unreachable for the first chunk); for later chunks
        # a corrupt chunk passing the other interpretation by chance is
        # a 2^-32 event - same strength as a single CRC32.
        cum = zlib.crc32(chunk_bytes, cumulative_crc) & 0xFFFFFFFF
        crc_ok = stored_crc == stored_crc_int(cum)
    if not crc_ok:
        raise ValueError(
            f"chunk CRC mismatch: stored 0x{stored_crc:08x}")
    return chunk_bytes, crc_ok


# File-level API (streams chunk-by-chunk; input via memmap so files
# larger than RAM compress within the chunk planner's budget - the
# sliding-mmap analog of reference src/rzip.c:84-181) -----------------------

def compress_file(in_path: str, out_path: str,
                  settings: Optional[Settings] = None) -> int:
    settings = settings or Settings()
    size = os.path.getsize(in_path)
    data = np.memmap(in_path, dtype=np.uint8, mode="r") if size else \
        np.zeros(0, dtype=np.uint8)
    with open(out_path, "wb") as out:
        return compress_stream(data, out, settings)


def decompress_file(in_path: str, out_path: str,
                    settings: Optional[Settings] = None) -> int:
    settings = settings or Settings()
    # w+b: the written file doubles as readable match history (fd_hist)
    with open(in_path, "rb") as fd, open(out_path, "w+b") as out:
        return decompress_stream_to(fd, out, settings)


def decompress_stream_to(fd: BinaryIO, out_fd: BinaryIO,
                         settings: Optional[Settings] = None) -> int:
    """Decompress chunk-by-chunk, writing each chunk as it completes
    (bounded memory; the reference streams through fd_out the same way,
    src/runzip.c:375-502).

    When ``out_fd`` is a real file, cross-chunk match history is read
    back from the written file via memmap - the fd_hist analog
    (reference src/runzip.c:184-241) - so RAM use stays bounded by one
    chunk regardless of archive size.
    """
    settings = settings or Settings()
    history_source = None
    try:
        out_fd.fileno()
        usable = out_fd.seekable() and out_fd.readable()
    except (OSError, AttributeError, io.UnsupportedOperation):
        usable = False
    if usable:
        def history_source() -> np.ndarray:
            out_fd.flush()
            size = out_fd.tell()
            if size == 0:
                return np.zeros(0, dtype=np.uint8)
            mm = np.memmap(out_fd, dtype=np.uint8, mode="r",
                           shape=(size,))
            out_fd.seek(size)  # memmap construction moves the fd
            return mm
    total = 0
    for chunk_bytes in iter_decompress(fd, settings,
                                       history_source=history_source):
        out_fd.write(chunk_bytes)
        total += len(chunk_bytes)
    return total


def iter_decompress(fd: BinaryIO, settings: Optional[Settings] = None,
                    history_source=None):
    """Generator over decompressed chunks with integrity verification.

    ``history_source``: optional zero-arg callable returning the
    already-written output prefix as a uint8 array (e.g. a memmap of
    the output file).  Without it, history for cross-chunk matches is
    accumulated in RAM.
    """
    settings = settings or Settings()
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
    hasher = ArchiveHash(magic.hash_code) if magic.hash_code else None
    pool = ThreadPoolExecutor(max_workers=settings.resolved_threads())
    out_total = 0
    cumulative_crc = 0
    # History for cross-chunk match distances (the fd_hist analog,
    # reference src/runzip.c:172-182): multi-chunk archives may reach
    # into earlier chunks.  With a history_source (file-backed decode)
    # the written output file itself is the history - zero extra RAM;
    # otherwise prior output accumulates in memory.
    history = bytearray()

    def finish(job):
        nonlocal cumulative_crc, out_total, history
        # RAM path: copy (frombuffer views would pin the bytearray
        # against resize); file path: zero-copy memmap
        hist_arr = history_source() if history_source is not None \
            else np.frombuffer(bytes(history), dtype=np.uint8)
        chunk_bytes, _ = _finish_chunk_decode(
            job, fd, job.hdr, cfg, hist_arr, cumulative_crc)
        if not job.hdr.eof and history_source is None:
            history += chunk_bytes
        cumulative_crc = zlib.crc32(chunk_bytes, cumulative_crc)
        if hasher is not None:
            hasher.update(chunk_bytes)
        out_total += len(chunk_bytes)
        return chunk_bytes

    # one-chunk lookahead: chunk k+1's payload IO + backend decode run
    # in the pool while chunk k replays (reference P3 read-ahead parity
    # at chunk granularity, src/stream.c:2022-2195)
    prev = None
    try:
        while True:
            hdr = read_chunk_header(fd, encrypted=crypto is not None)
            if hdr is None:
                break
            job = _ChunkDecodeJob(fd, hdr, magic, cfg, pool, crypto,
                                  use_device=settings.use_tpu)
            fd.seek(job.end_offset)
            if prev is not None:
                yield finish(prev)
            prev = job
            if hdr.eof:
                break
        if prev is not None:
            yield finish(prev)
    finally:
        pool.shutdown()
    if magic.eof_known and magic.expected_size and \
            out_total != magic.expected_size:
        raise ValueError(f"decompressed size {out_total} != expected "
                         f"{magic.expected_size}")
    if hasher is not None:
        stored = fd.read(hasher.digest_size)
        if len(stored) != hasher.digest_size:
            # a short tail means corruption consumed the stored hash -
            # never skip the check silently (reference fatals on short
            # reads, src/runzip.c:446-447)
            raise ValueError(
                f"archive truncated: stored {hasher.name} missing")
        if crypto is not None:
            stored = crypto.decrypt_block(stored, crypto.salt_pass)
        if stored != hasher.digest():
            raise ValueError(f"{hasher.name} mismatch: archive corrupt")


# Convenience byte-level API ------------------------------------------------

def compress(data: bytes, settings: Optional[Settings] = None) -> bytes:
    buf = io.BytesIO()
    compress_stream(data, buf, settings)
    return buf.getvalue()


def decompress(archive: bytes, settings: Optional[Settings] = None) -> bytes:
    return decompress_stream(io.BytesIO(archive), settings)
