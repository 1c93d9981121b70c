"""CLI surface: compress/decompress/test/info flows, option parsing."""

import os
import subprocess
import sys

import pytest

from lrzip_next_tpu import cli


def run_cli(argv, cwd=None):
    return cli.main(argv)


@pytest.fixture
def sample_file(tmp_path, corpus_factory):
    p = tmp_path / "data.bin"
    p.write_bytes(corpus_factory(120_000, "text"))
    return p


def test_compress_decompress_file(sample_file, tmp_path, capsys):
    orig = sample_file.read_bytes()
    assert run_cli(["--no-tpu", "-Z", str(sample_file)]) == 0
    lrz = sample_file.with_suffix(".bin.lrz")
    assert lrz.exists()
    out = capsys.readouterr().out
    assert "Compression Ratio" in out
    sample_file.unlink()
    assert run_cli(["-d", str(lrz)]) == 0
    assert sample_file.read_bytes() == orig


def test_refuses_overwrite(sample_file, capsys):
    assert run_cli(["--no-tpu", "-Z", str(sample_file)]) == 0
    assert run_cli(["--no-tpu", "-Z", str(sample_file)]) == 1
    assert "exists" in capsys.readouterr().err
    assert run_cli(["--no-tpu", "-Z", "-f", str(sample_file)]) == 0


def test_test_mode(sample_file, capsys):
    assert run_cli(["--no-tpu", "-g", str(sample_file)]) == 0
    lrz = str(sample_file) + ".lrz"
    assert run_cli(["-t", lrz]) == 0
    assert "integrity OK" in capsys.readouterr().out


def test_info_mode(sample_file, capsys):
    assert run_cli(["--no-tpu", "-L5", str(sample_file)]) == 0
    lrz = str(sample_file) + ".lrz"
    assert run_cli(["-i", lrz]) == 0
    out = capsys.readouterr().out
    assert "lrzip version: 0.14 file" in out
    assert "lzma" in out
    assert "Stream 0" in out and "Stream 1" in out


def test_info_verbose_blocks(sample_file, capsys):
    assert run_cli(["--no-tpu", "-Z", str(sample_file)]) == 0
    assert run_cli(["-i", "-v", str(sample_file) + ".lrz"]) == 0
    assert "Block 1" in capsys.readouterr().out


def test_outfile_and_delete(sample_file, tmp_path):
    orig = sample_file.read_bytes()
    dst = tmp_path / "custom.lrz"
    assert run_cli(["--no-tpu", "-n", "-D", "-o", str(dst),
                    str(sample_file)]) == 0
    assert not sample_file.exists()
    assert run_cli(["-d", "-o", str(tmp_path / "restored"), str(dst)]) == 0
    assert (tmp_path / "restored").read_bytes() == orig


def test_bad_level_rejected(sample_file):
    with pytest.raises(SystemExit):
        run_cli(["--no-tpu", "-L99", str(sample_file)])


def test_corrupt_file_fails_cleanly(tmp_path, capsys):
    p = tmp_path / "bad.lrz"
    p.write_bytes(b"LRZI\x00\x0e" + os.urandom(40))
    assert run_cli(["-d", str(p)]) == 1
    assert "Fatal" in capsys.readouterr().err


def test_check_mode(sample_file):
    assert run_cli(["--no-tpu", "-g", str(sample_file)]) == 0
    sample_file.unlink()
    assert run_cli(["-d", "-c", str(sample_file) + ".lrz"]) == 0


def test_hash_option(sample_file, capsys):
    assert run_cli(["--no-tpu", "-g", "-H", "5", str(sample_file)]) == 0
    assert run_cli(["-i", str(sample_file) + ".lrz"]) == 0
    assert "SHA512" in capsys.readouterr().out


def test_vv_matcher_stats(tmp_path, corpus_factory, capsys):
    # -vv on the TPU path prints per-chunk matcher counters
    import lrzip_next_tpu.cli as cli
    data = corpus_factory(150_000, "text")
    src = tmp_path / "s.bin"
    src.write_bytes(data)
    rc = cli.main(["-f", "-Z", "--tpu", "-vv",
                   "-o", str(tmp_path / "s.lrz"), str(src)])
    assert rc == 0
    err = capsys.readouterr().err
    assert "matches" in err and "chains" in err


def test_outfile_dash_is_stdout(sample_file, tmp_path):
    """-o - writes to stdout with messages on stderr
    (reference src/main.c:914-916 set_stdout)."""
    import sys
    env = dict(__import__("os").environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(__import__("pathlib").Path(__file__).parents[1])
    data = open(sample_file, "rb").read()
    r = subprocess.run(
        [sys.executable, "-m", "lrzip_next_tpu.cli", "--no-tpu",
         str(sample_file), "-o", "-"],
        capture_output=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout[:4] == b"LRZI"
    assert b"Compression Ratio" in r.stderr
    r2 = subprocess.run(
        [sys.executable, "-m", "lrzip_next_tpu.cli", "-d", "-o", "-"],
        input=r.stdout, capture_output=True, env=env, timeout=120)
    assert r2.returncode == 0, r2.stderr.decode()
    assert r2.stdout == data


def test_conf_keys_honored(tmp_path, sample_file, monkeypatch):
    """outputdirectory/nice/DELETEFILES/REPLACEFILE/verbosity conf keys
    act on the CLI layer (reference src/util.c:265-451)."""
    outdir = tmp_path / "outd"
    outdir.mkdir()
    conf = {
        "outputdirectory": str(outdir),
        "tmpdir": str(tmp_path),
        "nice": "5",
        "deletefiles": "YES",
        "replacefile": "YES",
        "verbosity": "max",
        "keepbroken": "yes",
    }
    args = cli.build_parser().parse_args(["--no-tpu", str(sample_file)])
    cli._apply_conf_cli(args, conf)
    assert args.outdir == str(outdir)
    assert args.delete and args.force and args.keep_broken
    assert args.verbose == 2
    assert args.nice_level == 5
    # case-sensitivity: lowercase "yes" must NOT enable these two
    args2 = cli.build_parser().parse_args([str(sample_file)])
    cli._apply_conf_cli(args2, {"deletefiles": "yes",
                                "replacefile": "yes"})
    assert not args2.delete and not args2.force


def test_conf_settings_keys(sample_file):
    """dictionarysize / lzotest / compressionmethod=rzip conf keys feed
    Settings (reference src/util.c:288-451)."""
    args = cli.build_parser().parse_args([str(sample_file)])
    s = cli.settings_from_args(args, conf={
        "dictionarysize": "20",
        "lzotest": "no",
        "compressionmethod": "rzip",
        "costfactor": "12",
    })
    assert s.method == "none"
    assert not s.lz4_test
    assert s.dict_size == (2 | (20 & 1)) << (20 // 2 + 11)
    assert s.costfactor_exp == 12


def test_nobemt_plumbed(sample_file):
    args = cli.build_parser().parse_args(["--nobemt", str(sample_file)])
    assert cli.settings_from_args(args, conf={}).bemt is False
    args = cli.build_parser().parse_args([str(sample_file)])
    assert cli.settings_from_args(args, conf={}).bemt is True


def test_check_mode_encrypted(sample_file, capsys):
    """-c verifies encrypted archives too: the stored hash decrypts
    with the passphrase (reference src/runzip.c:470-493)."""
    assert run_cli(["--no-tpu", "-g", "-e", "hunter2",
                    str(sample_file)]) == 0
    sample_file.unlink()
    assert run_cli(["-d", "-c", "-e", "hunter2",
                    str(sample_file) + ".lrz"]) == 0
    err = capsys.readouterr().err
    assert "unreadable" not in err


def test_free_space_guard(sample_file, tmp_path, monkeypatch, capsys):
    """Destination free-space pre-check (src/rzip.c:976-993): fatal
    without -f, warning with it."""
    import collections
    Vfs = collections.namedtuple("Vfs", "f_frsize f_bavail")
    monkeypatch.setattr(os, "statvfs", lambda p: Vfs(4096, 0))
    assert run_cli(["--no-tpu", str(sample_file)]) == 1
    err = capsys.readouterr().err
    assert "inadequate free space" in err and "-f" in err
    assert not sample_file.with_suffix(".bin.lrz").exists()
    # -f downgrades to a warning
    assert run_cli(["--no-tpu", "-f", str(sample_file)]) == 0
    assert "Warning" in capsys.readouterr().err
    lrz = sample_file.with_suffix(".bin.lrz")
    assert lrz.exists()
    # decompress side: expected size exceeds free space
    sample_file.unlink()
    assert run_cli(["-d", str(lrz)]) == 1
    assert "inadequate free space" in capsys.readouterr().err
    monkeypatch.undo()
    assert run_cli(["-d", str(lrz)]) == 0
    assert sample_file.exists()


def _pipe_env():
    import pathlib
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["PYTHONPATH"] = str(pathlib.Path(__file__).parents[1])
    return env


def test_stdin_stdout_pipe_roundtrip(corpus_factory, tmp_path):
    """stdin -> stdout compress/decompress pipes through the TMPDIR
    spill path (src/lrzip.c:856-900 analog); TMPDIR is honored."""
    data = corpus_factory(300_000, "mixed")
    env = _pipe_env()
    spill_dir = tmp_path / "spill"
    spill_dir.mkdir()
    env["TMPDIR"] = str(spill_dir)
    r = subprocess.run(
        [sys.executable, "-m", "lrzip_next_tpu.cli", "--no-tpu", "-Z"],
        input=data, capture_output=True, env=env, timeout=120)
    assert r.returncode == 0, r.stderr.decode()
    assert r.stdout[:4] == b"LRZI"
    r2 = subprocess.run(
        [sys.executable, "-m", "lrzip_next_tpu.cli", "-d"],
        input=r.stdout, capture_output=True, env=env, timeout=120)
    assert r2.returncode == 0, r2.stderr.decode()
    assert r2.stdout == data
    # -t from stdin: integrity only, no stdout payload
    r3 = subprocess.run(
        [sys.executable, "-m", "lrzip_next_tpu.cli", "-t"],
        input=r.stdout, capture_output=True, env=env, timeout=120)
    assert r3.returncode == 0, r3.stderr.decode()
    assert r3.stdout == b""
    assert b"integrity OK" in r3.stderr
