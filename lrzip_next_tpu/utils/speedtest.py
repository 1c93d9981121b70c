"""Benchmark harness: the method x level matrix with CSV output.

Equivalent of the reference's only test artifact, test/speedtest.sh:
compress with every method/level combination, test-decompress each
archive, and record size/time/ratio/bpb/MBps rows.
"""

from __future__ import annotations

import csv
import io
import sys
import time
from typing import Iterable, List, Optional, TextIO

from ..backends import available_methods
from ..models import pipeline

FIELDS = ["method", "level", "orig_size", "comp_size", "ratio", "bpb",
          "comp_s", "comp_MBps", "decomp_s", "decomp_MBps", "ok"]


def run_matrix(data: bytes, methods: Optional[Iterable[str]] = None,
               levels: Iterable[int] = (1, 5, 7, 9),
               out: Optional[TextIO] = None,
               use_tpu: bool = False) -> List[dict]:
    """Run the matrix; returns rows and optionally writes CSV."""
    if methods is None:
        methods = [m for m, ok in available_methods().items() if ok]
        methods.append("none")
    rows = []
    writer = None
    if out is not None:
        writer = csv.DictWriter(out, fieldnames=FIELDS)
        writer.writeheader()
    for method in methods:
        for level in levels:
            s = pipeline.Settings(method=method, compression_level=level,
                                  use_tpu=use_tpu)
            t0 = time.time()
            try:
                archive = pipeline.compress(data, s)
            except NotImplementedError:
                continue
            t1 = time.time()
            restored = pipeline.decompress(archive)
            t2 = time.time()
            row = {
                "method": method, "level": level,
                "orig_size": len(data), "comp_size": len(archive),
                "ratio": round(len(data) / len(archive), 3),
                "bpb": round(8 * len(archive) / max(len(data), 1), 3),
                "comp_s": round(t1 - t0, 3),
                "comp_MBps": round(len(data) / 1e6 / max(t1 - t0, 1e-9), 2),
                "decomp_s": round(t2 - t1, 3),
                "decomp_MBps": round(len(data) / 1e6 / max(t2 - t1, 1e-9),
                                     2),
                "ok": restored == data,
            }
            rows.append(row)
            if writer is not None:
                writer.writerow(row)
                out.flush()
            if not row["ok"]:
                raise AssertionError(
                    f"round trip FAILED for {method} level {level}")
    return rows


def main(argv=None) -> int:
    import argparse
    p = argparse.ArgumentParser(prog="lrz-speedtest")
    p.add_argument("file", help="input corpus file")
    p.add_argument("-o", "--csv", default=None)
    p.add_argument("--levels", default="1,5,7,9")
    p.add_argument("--methods", default=None)
    p.add_argument("--tpu", action="store_true")
    args = p.parse_args(argv)
    with open(args.file, "rb") as f:
        data = f.read()
    levels = [int(x) for x in args.levels.split(",")]
    methods = args.methods.split(",") if args.methods else None
    out = open(args.csv, "w", newline="") if args.csv else sys.stdout
    try:
        run_matrix(data, methods=methods, levels=levels, out=out,
                   use_tpu=args.tpu)
    finally:
        if args.csv:
            out.close()
    return 0


if __name__ == "__main__":
    sys.exit(main())
