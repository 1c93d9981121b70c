"""Cross-chunk matching: dedup across chunk boundaries."""

import numpy as np
import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.models import crosschunk, pipeline


def corpus_with_cross_dups(seed=0):
    """Chunk-sized unique segments, later chunks repeat earlier ones."""
    rng = np.random.default_rng(seed)
    a = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    b = rng.integers(0, 256, 120_000, dtype=np.uint8).tobytes()
    return a + b + a + b  # repeats land in different 120k chunks


def test_anchor_positions_shift_robust():
    rng = np.random.default_rng(1)
    data = rng.integers(0, 256, 50_000, dtype=np.uint8)
    p1 = crosschunk.gear_anchor_positions(data)
    shifted = np.concatenate([rng.integers(0, 256, 777, dtype=np.uint8),
                              data])
    p2 = crosschunk.gear_anchor_positions(shifted)
    # anchors inside the common content must appear at +777
    common = set((p2 - 777).tolist())
    hits = sum(1 for p in p1.tolist() if 16 < p < 49_000 and p in common)
    assert hits >= 0.9 * len([p for p in p1 if 16 < p < 49_000])


def test_index_lookup_finds_duplicates():
    rng = np.random.default_rng(2)
    seg = rng.integers(0, 256, 60_000, dtype=np.uint8)
    idx = crosschunk.CrossChunkIndex()
    idx.add_chunk(seg, 0)
    cur, src = idx.lookup(seg, 100_000)
    assert len(cur) > 10
    assert np.all(cur - 100_000 == src)  # same content, aligned


def test_cross_chunk_ratio_and_roundtrip():
    data = corpus_with_cross_dups()
    base = lrz.Settings(method="none", max_chunk=120_000, lz4_test=False)
    plain = lrz.compress(data, base)
    crossed = lrz.compress(
        data, lrz.Settings(method="none", max_chunk=120_000,
                           lz4_test=False, cross_chunk=True))
    # duplicates are in *different* chunks: only cross-chunk matching
    # can remove them (content is random, backends can't help)
    assert len(crossed) < len(plain) * 0.6
    assert lrz.decompress(crossed) == data
    assert lrz.decompress(plain) == data


def test_cross_chunk_distances_exceed_chunk():
    data = corpus_with_cross_dups(seed=3)
    s = lrz.Settings(method="none", max_chunk=120_000, lz4_test=False,
                     cross_chunk=True)
    archive = lrz.compress(data, s)
    # verify at least one emitted distance reaches beyond one chunk
    import io
    from lrzip_next_tpu.format.container import ChunkReader, \
        read_chunk_header
    from lrzip_next_tpu.format.magic import MagicHeader
    from lrzip_next_tpu.format.tokens import decode_token_stream
    fd = io.BytesIO(archive)
    magic = MagicHeader.decode(fd.read(64))
    fd.seek(magic.header_len)
    max_d = 0
    while True:
        h = read_chunk_header(fd)
        if h is None:
            break
        r = ChunkReader(fd, h)
        s0 = b"".join(r.read_payload(ref) for ref in r.blocks(0))
        list(r.blocks(1))
        k, l, d, crc, _ = decode_token_stream(
            np.frombuffer(s0, dtype=np.uint8), h.chunk_bytes)
        if len(d):
            max_d = max(max_d, int(d.max()))
        fd.seek(r.end_offset())
        if h.eof:
            break
    assert max_d > 120_000, "no cross-chunk distance emitted"


def test_unlimited_enables_cross_chunk():
    data = corpus_with_cross_dups(seed=4)
    s = lrz.Settings(method="none", unlimited=True, max_chunk=120_000,
                     lz4_test=False)
    archive = lrz.compress(data, s)
    plain = lrz.compress(data, lrz.Settings(method="none",
                                            max_chunk=120_000,
                                            lz4_test=False))
    assert len(archive) < len(plain) * 0.6
    assert lrz.decompress(archive) == data


def test_cross_match_source_at_zero(tmp_path):
    # regression: a cross-chunk match whose source starts at byte 0 -
    # left extension must not walk the source index negative (numpy
    # negative indices silently wrap to the end of the array)
    import numpy as np
    from lrzip_next_tpu.models import pipeline
    rng = np.random.default_rng(11)
    seg = rng.integers(0, 256, 150_000, dtype=np.uint8).tobytes()
    data = seg + seg  # second copy's source is position 0
    s = pipeline.Settings(method="zstd", max_chunk=100_000,
                          cross_chunk=True, threads=2)
    src = tmp_path / "a.bin"; src.write_bytes(data)
    arch = tmp_path / "a.lrz"; out = tmp_path / "a.out"
    pipeline.compress_file(str(src), str(arch), s)
    pipeline.decompress_file(str(arch), str(out))
    assert out.read_bytes() == data


def test_cross_match_spans_many_tokens():
    """A single long cross-chunk match must splice into EVERY literal it
    overlaps, not just the first (the fragmented-literal dedup bug)."""
    import lrzip_next_tpu as lrz
    rng = np.random.default_rng(9)
    # segment with internal short-range structure so the in-chunk
    # tokenisation fragments into many literal/match tokens
    rec = np.zeros((3000, 64), dtype=np.uint8)
    rec[:, :16] = np.arange(16, dtype=np.uint8)
    rec[:, 16:] = rng.integers(0, 64, (3000, 48), dtype=np.uint8)
    noise = rng.integers(0, 256, 200_000, dtype=np.uint8).tobytes()
    seg = rec.tobytes() + noise  # ~392KB
    data = seg * 4
    s = lrz.Settings(method="none", use_tpu=False,
                     max_chunk=len(seg) // 2 * 3, unlimited=True)
    a = lrz.compress(data, s)
    assert lrz.decompress(a) == data
    # 3 of 4 segments must deduplicate almost entirely
    assert len(a) < len(seg) * 1.35, (len(a), len(seg))
