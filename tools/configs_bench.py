#!/usr/bin/env python3
"""BASELINE.json config-analog benchmark evidence.

The five named configs reference public corpora (enwik8/9, Silesia, VM
images) that cannot be fetched here (zero egress), so each config runs
on a locally synthesized stand-in of the same size class and redundancy
profile.  Results are JSON lines; docs/BENCHMARKS.md records a run.

Under the axon tunnel, device uploads of fresh (non-self-repeating)
data move at ~0.3-1 MB/s, so end-to-end TPU-path numbers here measure
the tunnel, not the framework; the default therefore runs the host
matcher path (rzip_encode_host, ~284 MB/s), with --tpu to opt in to the
device path on local-TPU machines.

Usage: python tools/configs_bench.py [--quick] [--tpu] [config#...]
"""

import argparse
import json
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, str(pathlib.Path(__file__).parents[1]))

from lrzip_next_tpu.utils import jaxcache  # noqa: E402

jaxcache.enable()

import lrzip_next_tpu as lrz  # noqa: E402


def text_corpus(size: int, seed: int = 0) -> bytes:
    """Text-like stand-in (enwik class): natural-language-ish statistics
    from the reference's docs + sources, no synthetic exact repeats."""
    srcs = []
    for p in sorted(pathlib.Path("/root/reference").rglob("*")):
        if p.is_file() and p.suffix in (".c", ".h", ".md", ".txt", ""):
            try:
                srcs.append(p.read_bytes())
            except OSError:
                pass
    blob = b"".join(srcs)
    rng = np.random.default_rng(seed)
    out = bytearray()
    b = np.frombuffer(blob, dtype=np.uint8)
    while len(out) < size:
        # vary byte-substitution per copy: locally text-like, no exact
        # long-range duplicates between copies
        table = rng.permutation(256).astype(np.uint8)
        out += table[b].tobytes()
    return bytes(out[:size])


def mixed_corpus(size: int, seed: int = 1) -> bytes:
    """Silesia-class stand-in: mixed text / binary / structured with
    mid-range redundancy."""
    rng = np.random.default_rng(seed)
    parts = []
    txt = text_corpus(size // 3, seed + 1)
    parts.append(txt)
    # structured records: repeating layout, varying payloads
    rec = np.zeros((size // 3 // 64 + 1, 64), dtype=np.uint8)
    rec[:, :16] = np.arange(16, dtype=np.uint8)
    rec[:, 16:] = rng.integers(0, 64, rec[:, 16:].shape, dtype=np.uint8)
    parts.append(rec.tobytes()[: size // 3])
    # binary-ish: low-entropy noise
    parts.append(rng.integers(0, 200, size - 2 * (size // 3),
                              dtype=np.uint8).tobytes())
    return b"".join(parts)[:size]


def longrange_corpus(size: int, span: int, seed: int = 2) -> bytes:
    """VM-image-class stand-in: segments recurring `span` bytes apart -
    far beyond any backend window, only rzip dedup can catch them."""
    seg = mixed_corpus(span, seed)
    reps = size // span + 1
    return (seg * reps)[:size]


ORACLE_DIR = "/tmp/lrz_oracle_bin"


def build_oracle() -> str:
    """Compile the reference binary (tests/oracle/build_oracle.sh) for
    size head-to-heads; returns the executable path."""
    import subprocess
    oracle = pathlib.Path(ORACLE_DIR) / "lrzip-next"
    build = pathlib.Path(__file__).parents[1] / "tests" / "oracle" / \
        "build_oracle.sh"
    if not oracle.exists():
        subprocess.run(["bash", str(build), ORACLE_DIR], check=True,
                       capture_output=True, timeout=600)
    return str(oracle)


def ref_compress_size(oracle: str, data: bytes, flags) -> tuple:
    """(size, seconds) of the reference binary compressing ``data``."""
    import subprocess
    import tempfile
    with tempfile.TemporaryDirectory() as td:
        src = pathlib.Path(td) / "in.bin"
        src.write_bytes(data)
        arch = pathlib.Path(td) / "in.lrz"
        t0 = time.time()
        r = subprocess.run([oracle, "-f", "-Q", *flags, "-o", str(arch),
                            str(src)], capture_output=True, text=True,
                           timeout=3600)
        dt = time.time() - t0
        assert r.returncode == 0, r.stderr[-400:]
        return arch.stat().st_size, dt


def run_config(name: str, data: bytes, settings, expect_ratio: float,
               ref_flags=None, oracle=None):
    t0 = time.time()
    archive = lrz.compress(data, settings)
    t1 = time.time()
    out = lrz.decompress(archive)
    t2 = time.time()
    assert out == data, f"{name}: round trip failed"
    res = {
        "config": name,
        "input_mb": round(len(data) / 1e6, 1),
        "ratio": round(len(data) / len(archive), 3),
        "compress_mbps": round(len(data) / 1e6 / (t1 - t0), 2),
        "decompress_mbps": round(len(data) / 1e6 / (t2 - t1), 2),
        "ratio_target": expect_ratio,
    }
    if oracle is not None and ref_flags is not None:
        ref_size, ref_dt = ref_compress_size(oracle, data, ref_flags)
        res["our_bytes"] = len(archive)
        res["ref_bytes"] = ref_size
        res["size_vs_ref"] = round(len(archive) / ref_size, 4)
        res["ref_compress_mbps"] = round(len(data) / 1e6 / ref_dt, 2)
    print(json.dumps(res), flush=True)
    return res


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--quick", action="store_true",
                    help="1/4-size corpora")
    ap.add_argument("--tpu", action="store_true",
                    help="device matcher path (local-TPU hosts)")
    ap.add_argument("--ref", action="store_true",
                    help="also compress with the compiled reference "
                         "binary and report the size head-to-head")
    ap.add_argument("configs", nargs="*", type=int,
                    default=[1, 2, 3, 4])
    args = ap.parse_args()
    div = 4 if args.quick else 1
    tpu = args.tpu
    oracle = build_oracle() if args.ref else None

    if 1 in args.configs:
        # config 1: enwik8-class text, rzip + zstd
        data = text_corpus(100_000_000 // div)
        run_config("1-enwik8-class rzip+zstd", data,
                   lrz.Settings(method="zstd", use_tpu=tpu),
                   expect_ratio=2.5, ref_flags=["-Z"], oracle=oracle)
    if 2 in args.configs:
        # config 2: enwik9-class (scaled to 256MB under the axon
        # tunnel; same code path), default lzma
        data = text_corpus(256_000_000 // div, seed=7)
        run_config("2-enwik9-class rzip+lzma (scaled)", data,
                   lrz.Settings(method="lzma", use_tpu=tpu),
                   expect_ratio=3.0, ref_flags=[], oracle=oracle)
    if 3 in args.configs:
        # config 3: Silesia-class mixed corpus, bzip2 backend
        data = mixed_corpus(100_000_000 // div)
        run_config("3-silesia-class rzip+bzip2", data,
                   lrz.Settings(method="bzip2", use_tpu=tpu),
                   expect_ratio=1.5, ref_flags=["-b"], oracle=oracle)
    if 4 in args.configs:
        # config 4: VM-image-class long-range dedup: repeats 96MB apart
        # with 64MB chunks - only cross-chunk rzip matching can
        # deduplicate (the -U analog)
        data = longrange_corpus(384_000_000 // div, 96_000_000 // div)
        s = lrz.Settings(method="lzma", use_tpu=tpu,
                         max_chunk=64_000_000 // div,
                         unlimited=True)
        run_config("4-vmimage-class -U rzip+lzma", data, s,
                   expect_ratio=6.0, ref_flags=["-U"], oracle=oracle)
    return 0


if __name__ == "__main__":
    sys.exit(main())
