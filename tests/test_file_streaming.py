"""File-level streaming API: memmap input, chunked output."""

import os

import numpy as np
import pytest

from lrzip_next_tpu.models import pipeline


def test_compress_file_roundtrip(tmp_path, corpus_factory):
    src = tmp_path / "big.bin"
    data = corpus_factory(400_000, "mixed")
    src.write_bytes(data)
    lrz = tmp_path / "big.lrz"
    out = tmp_path / "restored.bin"
    s = pipeline.Settings(method="zstd", max_chunk=150_000)
    n = pipeline.compress_file(str(src), str(lrz), s)
    assert n == lrz.stat().st_size
    m = pipeline.decompress_file(str(lrz), str(out))
    assert m == 400_000
    assert out.read_bytes() == data


def test_empty_file(tmp_path):
    src = tmp_path / "empty"
    src.write_bytes(b"")
    lrz = tmp_path / "empty.lrz"
    out = tmp_path / "empty.out"
    pipeline.compress_file(str(src), str(lrz))
    assert pipeline.decompress_file(str(lrz), str(out)) == 0
    assert out.read_bytes() == b""


def test_iter_decompress_chunk_boundaries(tmp_path, corpus_factory):
    data = corpus_factory(250_000, "text")
    s = pipeline.Settings(method="gzip", max_chunk=100_000)
    archive = pipeline.compress(data, s)
    import io
    chunks = list(pipeline.iter_decompress(io.BytesIO(archive)))
    assert len(chunks) == 3
    assert [len(c) for c in chunks] == [100_000, 100_000, 50_000]
    assert b"".join(chunks) == data


def test_streaming_detects_corruption(tmp_path, corpus_factory):
    data = corpus_factory(120_000, "text")
    archive = bytearray(pipeline.compress(data,
                                          pipeline.Settings(method="none")))
    archive[-5] ^= 0x40  # flip inside stored hash
    import io
    with pytest.raises(ValueError):
        for _ in pipeline.iter_decompress(io.BytesIO(bytes(archive))):
            pass


def test_file_backed_history_cross_chunk(tmp_path, corpus_factory):
    # multi-chunk archive with cross-chunk matches: decode-to-file must
    # replay long-distance matches from the written file itself (the
    # fd_hist analog) and accumulate no RAM history
    import numpy as np
    seg = np.frombuffer(corpus_factory(120_000, "text"), dtype=np.uint8)
    data = np.concatenate([seg, np.frombuffer(
        corpus_factory(100_000, "mixed"), dtype=np.uint8), seg]).tobytes()
    src = tmp_path / "in.bin"
    src.write_bytes(data)
    arch = tmp_path / "in.bin.lrz"
    out = tmp_path / "out.bin"
    s = pipeline.Settings(method="zstd", max_chunk=90_000, cross_chunk=True,
                     threads=2)
    pipeline.compress_file(str(src), str(arch), s)
    n = pipeline.decompress_file(str(arch), str(out))
    assert n == len(data)
    assert out.read_bytes() == data
