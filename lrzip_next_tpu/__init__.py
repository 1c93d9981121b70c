"""lrzip_next_tpu: TPU-native long-range lossless compression framework.

A from-scratch re-design of lrzip-next (pete4abw/lrzip-next) for TPU:
the rzip long-range matcher and token replay run as JAX/Pallas array
pipelines, backend block codecs run block-parallel, and archives are
bit-compatible with the .lrz v0.14 format in both directions.

Quick API:

    import lrzip_next_tpu as lrz
    archive = lrz.compress(data, lrz.Settings(method="zstd"))
    data2 = lrz.decompress(archive)
"""

from .models.pipeline import Settings, compress, compress_stream, \
    decompress, decompress_stream
from .format.magic import MagicHeader


def decompress_to_device(data, settings=None, verify=False):
    """Decompress an archive into device (HBM) arrays - see
    models/device_decode.py (imports jax lazily)."""
    from .models.device_decode import decompress_to_device as _f
    return _f(data, settings=settings, verify=verify)


__version__ = "0.1.0"

__all__ = [
    "Settings", "compress", "compress_stream", "decompress",
    "decompress_stream", "decompress_to_device", "MagicHeader",
    "__version__",
]
