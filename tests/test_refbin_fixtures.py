"""Hermetic golden archives made by the reference binary.

tests/fixtures/refbin/*.lrz were produced by the oracle build of the
actual lrzip-next (tests/oracle/build_oracle.sh; provenance in
meta.json).  Decoding them needs no compiler at test time, pinning
reference->us interop across methods, levels, filters, hashes, and
encryption even if the oracle can't be rebuilt.
"""

import hashlib
import json
import os

import pytest

import lrzip_next_tpu as lrz
from lrzip_next_tpu.models import pipeline

HERE = os.path.join(os.path.dirname(__file__), "fixtures", "refbin")
META = json.load(open(os.path.join(HERE, "meta.json")))


def _expected() -> bytes:
    data = open("/root/reference/src/rzip.c", "rb").read() \
        if os.path.exists("/root/reference/src/rzip.c") else None
    if data is not None and hashlib.md5(data).hexdigest() == \
            META["input_md5"]:
        return data
    pytest.skip("fixture corpus not available")


ARCHIVES = [n for n in META if n.endswith(".lrz")
            and not n.startswith("enc_")]
ENCRYPTED = [n for n in META if n.startswith("enc_")]


@pytest.mark.parametrize("name", ARCHIVES)
def test_decode_reference_archive(name):
    data = _expected()
    arch = open(os.path.join(HERE, name), "rb").read()
    assert lrz.decompress(arch) == data


@pytest.mark.parametrize("name", ENCRYPTED)
def test_decode_reference_encrypted_archive(name):
    import io
    data = _expected()
    arch = open(os.path.join(HERE, name), "rb").read()
    out = b"".join(pipeline.iter_decompress(
        io.BytesIO(arch), pipeline.Settings(passphrase=b"fixture-pw")))
    assert out == data


def test_info_walk_all_fixtures():
    import io
    from lrzip_next_tpu.models.info import get_fileinfo
    for name in ARCHIVES:
        arch = open(os.path.join(HERE, name), "rb").read()
        info = get_fileinfo(io.BytesIO(arch))
        assert info.decompressed_size == META["input_len"] or \
            info.magic.expected_size == META["input_len"]
