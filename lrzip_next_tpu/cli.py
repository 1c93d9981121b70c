"""lrzip-next-compatible command line interface.

Mirrors the option surface of the reference CLI (src/main.c:303-373
getopt table, 110-186 usage text): compression method selection, levels,
filters, window/memory knobs, hashes, info/test/decompress modes, and
lrzip.conf layering (src/util.c:206-468).
"""

from __future__ import annotations

import argparse
import os
import sys
import time
from typing import List, Optional

from . import __version__
from .format import constants as C
from .models import pipeline
from .models.info import format_fileinfo, get_fileinfo
from .utils.config import read_config


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="lrzip-next-tpu", add_help=False,
        description="TPU-native long range zip (lrzip-next compatible)")
    g = p.add_argument_group("Compression Options")
    g.add_argument("--lzma", action="store_const", dest="method",
                   const="lzma", help="lzma compression (default)")
    g.add_argument("-b", "--bzip2", action="store_const", dest="method",
                   const="bzip2")
    g.add_argument("-B", "--bzip3", action="store_const", dest="method",
                   const="bzip3")
    g.add_argument("-g", "--gzip", action="store_const", dest="method",
                   const="gzip")
    g.add_argument("-l", "--lzo", action="store_const", dest="method",
                   const="lzo")
    g.add_argument("-n", "--no-compress", action="store_const",
                   dest="method", const="none")
    g.add_argument("-z", "--zpaq", action="store_const", dest="method",
                   const="zpaq")
    g.add_argument("-Z", "--zstd", action="store_const", dest="method",
                   const="zstd")
    g.add_argument("--rans", action="store_const", dest="method",
                   const="rans",
                   help="TPU-native interleaved-rANS backend (framework "
                        "extension; archives need this tool to decode)")
    g.add_argument("-L", "--level", type=int, default=None, metavar="#",
                   help="compression level 1-9 (default 7)")
    g.add_argument("--fast", action="store_const", dest="level_alias",
                   const=1)
    g.add_argument("--best", action="store_const", dest="level_alias",
                   const=9)
    g.add_argument("--dictsize", type=int, default=None, metavar="DS",
                   help="LZMA dictionary size code 0-40")
    g.add_argument("--nobemt", action="store_true",
                   help="disable backend-internal multithreading "
                        "(the LZMA match-finder pipeline)")
    g.add_argument("--lzma-mf", choices=["bt2", "bt3", "bt4", "bt5"],
                   default=None,
                   help="LZMA match-finder family at levels 5-9 "
                        "(default bt4, the reference's choice; bt2/bt3 "
                        "trade ratio for speed, bt5 the reverse)")
    g.add_argument("--zpaqbs", type=int, default=None)
    g.add_argument("--bzip3bs", type=int, default=None,
                   help="bzip3 block size code 0-8 (32MB max); with "
                        "backend MT on (default), 4-32MB inputs are "
                        "split 4 ways so the effective BWT block may "
                        "be smaller than requested - --nobemt restores "
                        "exact single-block coding at this size")
    g.add_argument("--zstd-level", type=int, default=None)

    f = p.add_argument_group("Filtering Options")
    f.add_argument("--x86", action="store_const", dest="filter",
                   const=C.FILTER_X86)
    f.add_argument("--arm", action="store_const", dest="filter",
                   const=C.FILTER_ARM)
    f.add_argument("--armt", action="store_const", dest="filter",
                   const=C.FILTER_ARMT)
    f.add_argument("--arm64", action="store_const", dest="filter",
                   const=C.FILTER_ARM64)
    f.add_argument("--ppc", action="store_const", dest="filter",
                   const=C.FILTER_PPC)
    f.add_argument("--sparc", action="store_const", dest="filter",
                   const=C.FILTER_SPARC)
    f.add_argument("--ia64", action="store_const", dest="filter",
                   const=C.FILTER_IA64)
    f.add_argument("--riscv", action="store_const", dest="filter",
                   const=C.FILTER_RISCV)
    f.add_argument("--delta", nargs="?", const=1, type=int, default=None,
                   metavar="N", help="delta filter with offset 1-256")

    a = p.add_argument_group("Additional Options")
    a.add_argument("-C", "--comment", default=None)
    a.add_argument("-e", "--encrypt", nargs="?", const=True, default=None,
                   metavar="password")
    a.add_argument("-E", "--emethod", type=int, default=1)
    a.add_argument("-D", "--delete", action="store_true")
    a.add_argument("-f", "--force", action="store_true")
    a.add_argument("-K", "--keep-broken", action="store_true")
    a.add_argument("-o", "--outfile", default=None)
    a.add_argument("-O", "--outdir", default=None)
    a.add_argument("-S", "--suffix", default=".lrz")

    lo = p.add_argument_group("Low level Options")
    lo.add_argument("--costfactor", type=int, default=None)
    lo.add_argument("-m", "--maxram", type=int, default=None,
                    help="max RAM in hundreds of MB")
    lo.add_argument("-N", "--nice-level", type=int, default=None)
    lo.add_argument("-R", "--rzip-level", type=int, default=None)
    lo.add_argument("-T", "--threshold", nargs="?", const=0, type=int,
                    default=None,
                    help="disable LZ4 test, or set threshold 1-99")
    lo.add_argument("-U", "--unlimited", action="store_true")
    lo.add_argument("-w", "--window", type=int, default=0)
    lo.add_argument("--tpu", action="store_true", default=None,
                    help="run the rzip matcher on TPU (default when "
                         "TPU hardware is present)")
    lo.add_argument("--no-tpu", action="store_false", dest="tpu")

    d = p.add_argument_group("Decompression Options")
    d.add_argument("-d", "--decompress", action="store_true")
    d.add_argument("-t", "--test", action="store_true")
    d.add_argument("-c", "--check", action="store_true")

    ge = p.add_argument_group("General Options")
    ge.add_argument("-h", "-?", "--help", action="help")
    ge.add_argument("-H", "--hash", nargs="?", const=1, type=int,
                    default=None, metavar="CODE",
                    help="hash code 0-13 (default 1 = MD5)")
    ge.add_argument("-i", "--info", action="store_true")
    ge.add_argument("-P", "--progress", action="store_true")
    ge.add_argument("-q", "--quiet", action="store_true")
    ge.add_argument("-Q", "--very-quiet", action="store_true")
    ge.add_argument("-p", "--threads", type=int, default=0)
    ge.add_argument("-v", "--verbose", action="count", default=0)
    ge.add_argument("-V", "--version", action="version",
                    version=f"lrzip-next-tpu {__version__}")
    p.add_argument("files", nargs="*")
    return p


def settings_from_args(args, conf=None) -> pipeline.Settings:
    if conf is None:
        conf = {} if os.environ.get("LRZIP") == "NOCONFIG" else read_config()
    s = pipeline.Settings()
    s.method = args.method or conf.get("compressionmethod", "lzma")
    if s.method == "rzip":  # conf spelling for -n (src/util.c:300-301)
        s.method = "none"
    level = args.level if args.level is not None else \
        getattr(args, "level_alias", None)
    s.compression_level = level if level is not None else \
        int(conf.get("compressionlevel", 7))
    if not 1 <= s.compression_level <= 9:
        raise SystemExit("compression level must be 1..9")
    if args.rzip_level is not None:
        s.rzip_level = args.rzip_level
    elif "rziplevel" in conf:
        s.rzip_level = int(conf["rziplevel"])
    if args.hash is not None:
        if not 0 <= args.hash <= C.MAXHASH:
            raise SystemExit(f"hash code must be 0..{C.MAXHASH}")
        s.hash_name = C.HASH_NAME[args.hash]
    elif "hash" in conf:
        s.hash_name = C.HASH_NAME.get(int(conf["hash"]), "MD5")
    s.window = args.window or int(conf.get("window", 0))
    s.unlimited = args.unlimited or \
        str(conf.get("unlimited", "")).lower() == "yes"
    s.threads = args.threads or int(conf.get("processors", 0))
    if args.comment:
        s.comment = args.comment.encode()[:64]
    if args.dictsize is not None:
        if not 0 <= args.dictsize <= 40:
            raise SystemExit("dictsize must be 0..40")
        s.dict_size = C.lzma2_dict_size_from_prop(args.dictsize)
    if args.lzma_mf is not None:
        s.lzma_mf = int(args.lzma_mf[2])
    if args.zstd_level is not None:
        s.zstd_level = args.zstd_level
    if args.zpaqbs is not None:
        s.zpaq_bs = args.zpaqbs
    if args.bzip3bs is not None:
        s.bzip3_bs = args.bzip3bs
    if args.delta is not None:
        s.filter_flag = C.FILTER_DELTA
        s.delta_offset = args.delta
    elif args.filter:
        s.filter_flag = args.filter
    if args.threshold is not None:
        if args.threshold == 0:
            s.lz4_test = False
        else:
            s.threshold = args.threshold
    if args.maxram is not None:
        s.max_chunk = args.maxram * 100 * 1024 * 1024
    if args.encrypt is not None:
        if args.encrypt is True:
            import getpass
            s.passphrase = getpass.getpass("Enter passphrase: ").encode()
        else:
            s.passphrase = str(args.encrypt).encode()
        s.enc_code = args.emethod
    if args.costfactor is not None:
        if not 10 <= args.costfactor <= 40:
            raise SystemExit("costfactor must be 10..40")
        s.costfactor_exp = args.costfactor
    if args.tpu is not None:
        s.use_tpu = args.tpu
    else:
        s.use_tpu = _tpu_present()
    if args.verbose >= 2:
        # matcher counters per chunk (reference prints st->stats at
        # max verbosity, src/rzip.c:1238-1246)
        def _stats(st):
            print(f"Chunk {st.get('chunk', 0)}: "
                  f"matches {st['matches']:,} "
                  f"({st['match_bytes']:,} bytes), "
                  f"literals {st['literals']:,} "
                  f"({st['literal_bytes']:,} bytes), "
                  f"chains {st['chains']:,}", file=sys.stderr)
        s.stats_sink = _stats
    if "lz4test" in conf or "lzotest" in conf:
        # the reference's key is LZOTEST (src/util.c:314-318); lz4test
        # is accepted as the modern alias
        v = conf.get("lz4test", conf.get("lzotest"))
        s.lz4_test = str(v).lower() != "no"
    if "threshold" in conf and args.threshold is None:
        s.threshold = int(conf["threshold"])
    if args.dictsize is None and "dictionarysize" in conf:
        p = int(conf["dictionarysize"])
        if 0 <= p <= 40:
            s.dict_size = C.lzma2_dict_size_from_prop(p)
    if args.costfactor is None and "costfactor" in conf:
        cf = int(conf["costfactor"])
        if 10 <= cf <= 40:
            s.costfactor_exp = cf
    if s.passphrase is None and "encrypt" in conf:
        # conf ENCRYPT = YES|code enables encryption (src/util.c:410-421)
        ev = str(conf["encrypt"])
        code = 1 if ev.upper() == "YES" else int(ev) if ev.isdigit() else 0
        if 1 <= code <= 2:
            import getpass
            s.passphrase = getpass.getpass("Enter passphrase: ").encode()
            s.enc_code = code
    s.bemt = not args.nobemt
    if args.progress and not args.quiet:
        def _show(stage, done, total):
            pct = 100 * done // max(total, 1)
            print(f"\r{stage}: {pct:3d}%  "
                  f"{done / 1e6:,.1f} / {total / 1e6:,.1f} MB",
                  end="", file=sys.stderr, flush=True)
            if done >= total:
                print(file=sys.stderr)
        s.progress = _show
    return s


def _apply_conf_cli(args, conf) -> None:
    """Honor the lrzip.conf keys that act at the CLI layer (reference
    src/util.c:265-451): output/tmp dirs, nice, verbosity, progress,
    DELETEFILES / REPLACEFILE (case-sensitive YES), keepbroken, locale,
    hashcheck.  CLI flags always win over conf values."""
    if args.outdir is None and "outputdirectory" in conf:
        args.outdir = conf["outputdirectory"]
    if "tmpdir" in conf:
        os.environ.setdefault("TMPDIR", conf["tmpdir"])
    if args.nice_level is None and "nice" in conf:
        try:
            n = int(conf["nice"])
        except ValueError:
            n = None
        if n is not None and -20 <= n <= 19:
            args.nice_level = n
    if conf.get("deletefiles") == "YES":
        args.delete = True
    if conf.get("replacefile") == "YES":
        args.force = True
    if str(conf.get("keepbroken", "")).lower() == "yes":
        args.keep_broken = True
    if args.verbose == 0 and "verbosity" in conf:
        v = str(conf["verbosity"]).lower()
        args.verbose = 2 if v == "max" else 1 if v == "yes" else 0
    if str(conf.get("showprogress", "")).lower() == "yes":
        args.progress = True
    if str(conf.get("hashcheck", "")).lower() == "yes":
        args.check = True
        if args.hash is None:
            args.hash = 1
    loc = str(conf.get("locale", "")).strip()
    if loc and loc.upper() not in ("", "DEFAULT", "NONE"):
        import locale as _locale
        try:
            _locale.setlocale(_locale.LC_NUMERIC, loc)
        except _locale.Error:
            print(f"lrzip.conf: cannot set locale {loc}", file=sys.stderr)


def _tpu_present() -> bool:
    try:
        import jax
        return any(d.platform != "cpu" for d in jax.devices())
    except Exception:
        return False


def _out_path(args, inpath: str, decompress: bool) -> str:
    if args.outfile:
        return args.outfile
    base = os.path.basename(inpath)
    if decompress:
        if base.endswith(args.suffix):
            base = base[:-len(args.suffix)]
        else:
            base = base + ".out"
    else:
        base = base + args.suffix
    outdir = args.outdir or os.path.dirname(inpath)
    return os.path.join(outdir, base) if outdir else base


def main(argv: Optional[List[str]] = None) -> int:
    args = build_parser().parse_args(argv)
    conf = {} if os.environ.get("LRZIP") == "NOCONFIG" else read_config()
    _apply_conf_cli(args, conf)
    quiet = args.quiet or args.very_quiet

    # process priority (reference src/main.c:863-883).  Unlike the
    # reference we only renice when -N is given: renicing is
    # irreversible for unprivileged processes and would leak into
    # embedding processes (tests, library callers).
    if args.nice_level is not None:
        try:
            cur = os.nice(0)
            if args.nice_level > cur:
                os.nice(args.nice_level - cur)
        except OSError:
            pass

    if not args.files or args.files == ["-"]:
        return _run_stdio(args)

    for path in args.files:
        try:
            if args.info:
                # encrypted archives need the passphrase to walk the
                # block headers (reference src/lrzip.c:1085-1102)
                pw = None
                if args.encrypt is not None and args.encrypt is not True:
                    pw = str(args.encrypt).encode()
                with open(path, "rb") as fd:
                    info = get_fileinfo(fd, passphrase=pw)
                    if info.magic.enc_code and not info.chunks \
                            and pw is None and sys.stdin.isatty():
                        import getpass
                        pw = getpass.getpass(
                            "Enter passphrase: ").encode()
                        fd.seek(0)
                        info = get_fileinfo(fd, passphrase=pw)
                print(format_fileinfo(info, path, verbose=args.verbose > 0))
                continue
            if args.decompress or args.test or args.check:
                rc = _decompress_one(args, path, quiet)
            else:
                rc = _compress_one(args, path, quiet)
            if rc:
                return rc
        except (ValueError, NotImplementedError, OSError) as e:
            print(f"Fatal: {e}", file=sys.stderr)
            return 1
    return 0


def _check_free_space(out_path: str, needed: int, force: bool,
                      action: str) -> int:
    """Destination free-space pre-check (reference src/rzip.c:976-993
    compress, src/lrzip.c:1712-1726 decompress): sized-to-input fatal
    unless -f downgrades it to a warning.  Returns nonzero on fatal."""
    try:
        st = os.statvfs(os.path.dirname(os.path.abspath(out_path)) or ".")
    except OSError:
        return 0
    free = st.f_frsize * st.f_bavail
    if free >= needed:
        return 0
    if force:
        print(f"Warning, possibly inadequate free space to {action} "
              f"({free:,} available, {needed:,} needed), attempting "
              f"due to -f.", file=sys.stderr)
        return 0
    print(f"Fatal: possibly inadequate free space to {action}. Space "
          f"needed: {needed:,}. Space available: {free:,}. Use -f to "
          f"override.", file=sys.stderr)
    return 1


def _compress_one(args, path: str, quiet: bool) -> int:
    settings = settings_from_args(args)
    out_path = _out_path(args, path, decompress=False)
    if args.outfile == "-":
        # -o -: write the archive to stdout, messages to stderr
        # (reference src/main.c:914-916, set_stdout)
        t0 = time.time()
        in_size = os.path.getsize(path)
        with open(path, "rb") as fd:
            data = fd.read()
        import io as _io
        buf = _io.BytesIO()
        n = pipeline.compress_stream(data, buf, settings)
        sys.stdout.buffer.write(buf.getvalue())
        sys.stdout.buffer.flush()
        dt = max(time.time() - t0, 1e-9)
        if not args.very_quiet:
            print(f"{path} - Compression Ratio: "
                  f"{in_size / max(n, 1):.3f}. Average Compression "
                  f"Speed: {in_size / 1e6 / dt:6.3f}MB/s.",
                  file=sys.stderr)
        if args.delete:
            os.unlink(path)
        return 0
    if os.path.exists(out_path) and not args.force:
        print(f"Output file {out_path} exists. Use -f to force overwrite.",
              file=sys.stderr)
        return 1
    t0 = time.time()
    in_size = os.path.getsize(path)
    if _check_free_space(out_path, in_size, args.force, "compress file"):
        return 1
    tmp_path = out_path + ".tmp"
    try:
        n = pipeline.compress_file(path, tmp_path, settings)
        os.replace(tmp_path, out_path)
    except BaseException:
        if not args.keep_broken and os.path.exists(tmp_path):
            os.unlink(tmp_path)
        raise
    dt = max(time.time() - t0, 1e-9)
    if not args.very_quiet:
        ratio = in_size / n if n else 0.0
        print(f"{path} - Compression Ratio: {ratio:.3f}. "
              f"bpb: {8.0 * n / max(in_size, 1):.3f}. "
              f"Average Compression Speed: {in_size / 1e6 / dt:6.3f}MB/s.")
    if args.delete:
        os.unlink(path)
    return 0


def _decompress_one(args, path: str, quiet: bool) -> int:
    settings = settings_from_args(args)
    t0 = time.time()
    if args.test:
        total = 0
        with open(path, "rb") as fd:
            for chunk in pipeline.iter_decompress(fd, settings):
                total += len(chunk)
        dt = max(time.time() - t0, 1e-9)
        if not args.very_quiet:
            print(f"{path}: integrity OK ({total:,} bytes, "
                  f"{total / 1e6 / dt:.1f}MB/s)")
        return 0
    if args.outfile == "-":
        # -o -: decompressed bytes to stdout (reference main.c:914-916)
        total = 0
        with open(path, "rb") as fd:
            for chunk in pipeline.iter_decompress(fd, settings):
                sys.stdout.buffer.write(chunk)
                total += len(chunk)
        sys.stdout.buffer.flush()
        dt = max(time.time() - t0, 1e-9)
        if not args.very_quiet:
            print(f"{path} - decompressed {total:,} bytes, "
                  f"{total / 1e6 / dt:.1f}MB/s", file=sys.stderr)
        return 0
    out_path = _out_path(args, path, decompress=True)
    if os.path.exists(out_path) and not args.force:
        print(f"Output file {out_path} exists. Use -f to force overwrite.",
              file=sys.stderr)
        return 1
    try:
        from .format.magic import MagicHeader
        with open(path, "rb") as fd:
            magic = MagicHeader.decode(fd.read(4096))
        expected = max(magic.expected_size or 0, 0)
    except (ValueError, OSError):
        expected = 0
    if expected and _check_free_space(out_path, expected, args.force,
                                      "decompress file"):
        return 1
    total = pipeline.decompress_file(path, out_path, settings)
    dt = max(time.time() - t0, 1e-9)
    if args.check:
        # -c: re-read the written file and verify against the archive's
        # stored hash - encrypted archives too: get_fileinfo decrypts
        # the stored hash with the passphrase the decompression already
        # required (reference src/runzip.c:470-493 re-checks -e output)
        from .models.info import get_fileinfo
        from .utils.hashing import ArchiveHash
        with open(path, "rb") as fd:
            info = get_fileinfo(fd, passphrase=settings.passphrase)
        if info.magic.hash_code and not info.stored_hash:
            print("Warning: -c requested but stored hash unreadable",
                  file=sys.stderr)
        if info.magic.hash_code and info.stored_hash:
            h = ArchiveHash(info.magic.hash_code)
            with open(out_path, "rb") as f:
                while True:
                    blk = f.read(1 << 20)
                    if not blk:
                        break
                    h.update(blk)
            if h.digest() != info.stored_hash:
                print("Fatal: written file fails -c re-read hash check",
                      file=sys.stderr)
                return 1
    if not args.very_quiet:
        print(f"{path} - decompressed {total:,} bytes, "
              f"{total / 1e6 / dt:.1f}MB/s")
    if args.delete:
        os.unlink(path)
    return 0


def _run_stdio(args) -> int:
    """stdin -> stdout pipe modes, spilling stdin to a TMPDIR temp file
    so streams larger than RAM work (the reference's tmpinbuf/tmp-file
    dump, src/lrzip.c:856-900, src/stream.c:819-846).  Compression
    output is written to stdout progressively (chunk granularity), so
    peak RAM stays bounded by one chunk."""
    import tempfile

    import numpy as np

    with tempfile.NamedTemporaryFile(prefix="lrznt-stdin-") as spill:
        while True:
            blk = sys.stdin.buffer.read(1 << 20)
            if not blk:
                break
            spill.write(blk)
        spill.flush()
        size = spill.tell()
        if args.decompress or args.test:
            total = 0
            with open(spill.name, "rb") as fd:
                for chunk in pipeline.iter_decompress(
                        fd, settings_from_args(args)):
                    total += len(chunk)
                    if not args.test:
                        sys.stdout.buffer.write(chunk)
            if not args.test:
                sys.stdout.buffer.flush()
            elif not args.very_quiet:
                print(f"stdin: integrity OK ({total:,} bytes)",
                      file=sys.stderr)
        else:
            data = np.memmap(spill.name, dtype=np.uint8, mode="r") \
                if size else np.zeros(0, dtype=np.uint8)
            pipeline.compress_stream(data, sys.stdout.buffer,
                                     settings_from_args(args))
            sys.stdout.buffer.flush()
    return 0


if __name__ == "__main__":
    sys.exit(main())
