"""bzip3 backend (CTYPE 9).

The reference links libbz3 (BWT + LZP + entropy coding).  A from-scratch
implementation (suffix-array BWT on TPU + host entropy stage) is staged;
until it lands, bzip3-method archives raise a clear error.
"""

from __future__ import annotations

from typing import Optional

from ..format.constants import CTYPE_BZIP3
from . import BackendConfig, register


def compress(data: bytes, cfg: BackendConfig) -> Optional[bytes]:
    raise NotImplementedError(
        "bzip3 backend encode is not implemented yet")


def decompress(payload: bytes, u_len: int, cfg: BackendConfig) -> bytes:
    raise NotImplementedError(
        "bzip3 backend decode is not implemented yet")


register("bzip3", CTYPE_BZIP3, compress, decompress)
