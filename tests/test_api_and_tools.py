"""Library handle API, lrzntar, speedtest harness."""

import io
import os

import pytest

from lrzip_next_tpu.api import Lrzip, Mode
from lrzip_next_tpu import lrzntar
from lrzip_next_tpu.utils.speedtest import run_matrix


def test_handle_api_roundtrip(tmp_path, corpus_factory):
    src = tmp_path / "file.bin"
    src.write_bytes(corpus_factory(80_000, "text"))
    h = Lrzip(Mode.COMPRESS_ZSTD)
    h.compression_level_set(5)
    h.file_add(str(src))
    assert h.run()
    assert (tmp_path / "file.bin.lrz").exists()

    orig = src.read_bytes()
    src.unlink()
    h2 = Lrzip(Mode.DECOMPRESS)
    h2.file_add(str(tmp_path / "file.bin.lrz"))
    assert h2.run()
    assert src.read_bytes() == orig

    h3 = Lrzip(Mode.INFO)
    reports = []
    h3.info_cb = reports.append
    h3.file_add(str(tmp_path / "file.bin.lrz"))
    assert h3.run()
    assert "zstd" in reports[0]


def test_handle_api_validation():
    h = Lrzip()
    with pytest.raises(ValueError):
        h.run()
    with pytest.raises(ValueError):
        h.compression_level_set(0)
    with pytest.raises(AttributeError):
        h.flags_set(not_a_setting=1)


def test_lrzntar_roundtrip(tmp_path, corpus_factory):
    d = tmp_path / "tree"
    (d / "sub").mkdir(parents=True)
    (d / "a.txt").write_bytes(corpus_factory(5000, "text"))
    (d / "sub" / "b.bin").write_bytes(corpus_factory(9000, "mixed"))
    out = lrzntar.tar_compress(str(d))
    assert out.endswith(".tar.lrz")
    dest = tmp_path / "restore"
    dest.mkdir()
    names = lrzntar.tar_decompress(out, str(dest))
    assert any(n.endswith("a.txt") for n in names)
    assert (dest / "tree" / "a.txt").read_bytes() == \
        (d / "a.txt").read_bytes()
    assert (dest / "tree" / "sub" / "b.bin").read_bytes() == \
        (d / "sub" / "b.bin").read_bytes()


def test_speedtest_matrix(corpus_factory):
    data = corpus_factory(60_000, "text")
    out = io.StringIO()
    rows = run_matrix(data, methods=["gzip", "zstd", "none"],
                      levels=[1, 7], out=out)
    assert len(rows) == 6
    assert all(r["ok"] for r in rows)
    csv_text = out.getvalue()
    assert "method" in csv_text and "gzip" in csv_text
