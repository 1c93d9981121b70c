"""lrzntar: tar-directory wrapper (the reference's src/lrzntar bash
script re-done natively): compress a directory to .tar.lrz and back.
"""

from __future__ import annotations

import io
import os
import sys
import tarfile
from typing import List, Optional

from .models import pipeline


def tar_compress(directory: str, out_path: Optional[str] = None,
                 settings: Optional[pipeline.Settings] = None) -> str:
    """tar the directory (uncompressed) and lrzip the stream."""
    directory = directory.rstrip("/")
    out_path = out_path or directory + ".tar.lrz"
    buf = io.BytesIO()
    with tarfile.open(fileobj=buf, mode="w", format=tarfile.GNU_FORMAT) \
            as tf:
        tf.add(directory, arcname=os.path.basename(directory))
    with open(out_path, "wb") as out:
        pipeline.compress_stream(buf.getvalue(), out, settings)
    return out_path


def tar_decompress(archive: str, dest_dir: str = ".",
                   settings: Optional[pipeline.Settings] = None) -> List[str]:
    """Decompress a .tar.lrz and extract; returns extracted names."""
    with open(archive, "rb") as fd:
        data = pipeline.decompress_stream(fd, settings)
    with tarfile.open(fileobj=io.BytesIO(data), mode="r") as tf:
        names = tf.getnames()
        tf.extractall(dest_dir, filter="data")
    return names


def main(argv: Optional[List[str]] = None) -> int:
    import argparse
    p = argparse.ArgumentParser(
        prog="lrzntar", description="tar + lrzip directories")
    p.add_argument("-d", "--decompress", action="store_true")
    p.add_argument("-o", "--outfile")
    p.add_argument("-C", "--directory", default=".",
                   help="extraction target directory")
    p.add_argument("paths", nargs="+")
    args = p.parse_args(argv)
    for path in args.paths:
        if args.decompress:
            names = tar_decompress(path, args.directory)
            print(f"{path}: extracted {len(names)} entries")
        else:
            out = tar_compress(path, args.outfile)
            print(f"{path} -> {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
