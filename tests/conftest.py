"""Test configuration: force JAX onto a virtual 8-device CPU mesh so
multi-chip sharding paths are exercised without TPU hardware."""

import os

# The environment's sitecustomize pins JAX_PLATFORMS=axon (real TPU via
# tunnel); tests must run on a virtual 8-device CPU mesh, so override
# forcibly before anything initialises a JAX backend.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

# sitecustomize already imported jax with JAX_PLATFORMS=axon baked into
# the config defaults, so override at the config level too.
import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture(scope="session")
def rng():
    return np.random.default_rng(0xC0FFEE)


def make_corpus(rng, size: int, kind: str = "mixed") -> bytes:
    """Synthesise test data with long-range redundancy."""
    if kind == "random":
        return rng.integers(0, 256, size, dtype=np.uint8).tobytes()
    if kind == "zeros":
        return bytes(size)
    if kind == "text":
        words = [b"the quick brown fox ", b"jumps over ", b"lazy dog ",
                 b"compression ", b"long range redundancy ", b"tpu kernel "]
        out = bytearray()
        while len(out) < size:
            out += words[int(rng.integers(0, len(words)))]
        return bytes(out[:size])
    # mixed: random base with repeated segments pasted far apart
    base = rng.integers(0, 256, max(size // 3, 64), dtype=np.uint8).tobytes()
    out = bytearray()
    while len(out) < size:
        seg_start = int(rng.integers(0, max(len(base) - 256, 1)))
        seg_len = int(rng.integers(16, 256))
        out += base[seg_start:seg_start + seg_len]
    return bytes(out[:size])


@pytest.fixture
def corpus_factory(rng):
    return lambda size, kind="mixed": make_corpus(rng, size, kind)


def pytest_configure(config):
    config.addinivalue_line(
        "markers", "slow: heavyweight test, skipped unless RUN_SLOW=1")


def pytest_collection_modifyitems(config, items):
    if os.environ.get("RUN_SLOW") == "1":
        return
    skip = pytest.mark.skip(reason="slow; set RUN_SLOW=1 to run")
    for item in items:
        if "slow" in item.keywords:
            item.add_marker(skip)
