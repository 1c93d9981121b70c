"""Real 2-process jax.distributed run of the chunk-parallel driver.

Spawns two OS processes that initialise jax.distributed against a local
coordinator, compress disjoint chunk ranges, and exchange the chunk
blobs through the coordination-service KV gather
(parallel/distributed.kv_gather_blobs).  Process 0 writes the archive;
the parent decodes it with the ordinary single-process decoder.
"""

import os
import socket
import subprocess
import sys

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_WORKER = r"""
import os, sys
os.environ.pop("PALLAS_AXON_POOL_IPS", None)
os.environ["JAX_PLATFORMS"] = "cpu"
sys.path.insert(0, %(repo)r)
pid = int(sys.argv[1])
import jax
jax.distributed.initialize(%(coord)r, num_processes=2, process_id=pid)
import numpy as np
import lrzip_next_tpu as lrz
from lrzip_next_tpu.parallel import distributed

rng = np.random.default_rng(42)
base = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
data = np.frombuffer((base * 5)[: 260_000], dtype=np.uint8)
s = lrz.Settings(method="gzip", max_chunk=70_000, use_tpu=False)

if pid == 0:
    with open(%(out)r, "wb") as f:
        n = distributed.compress_distributed(data, f, s, n_hosts=2,
                                             host=0)
    assert n is not None and n > 0
else:
    r = distributed.compress_distributed(data, open(os.devnull, "wb"),
                                         s, n_hosts=2, host=1)
    assert r is None
print("worker %%d done" %% pid)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    p = s.getsockname()[1]
    s.close()
    return p


def test_two_process_kv_gather(tmp_path):
    out = str(tmp_path / "dist.lrz")
    coord = f"localhost:{_free_port()}"
    script = _WORKER % {"repo": REPO, "coord": coord, "out": out}
    env = dict(os.environ)
    env.pop("PALLAS_AXON_POOL_IPS", None)
    env["JAX_PLATFORMS"] = "cpu"
    procs = [subprocess.Popen([sys.executable, "-c", script, str(pid)],
                              env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.PIPE)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        so, se = p.communicate(timeout=150)
        outs.append((p.returncode, so, se))
    for rc, so, se in outs:
        assert rc == 0, f"worker failed: {se.decode()[-2000:]}"

    import lrzip_next_tpu as lrz
    rng = np.random.default_rng(42)
    base = rng.integers(0, 256, 60_000, dtype=np.uint8).tobytes()
    data = (base * 5)[: 260_000]
    archive = open(out, "rb").read()
    assert lrz.decompress(archive) == data
