"""TurboRC-TPU: a TPU-native lossless entropy-coding framework.

A from-scratch JAX/XLA/Pallas re-design of the capability set of
powturbo/Turbo-Range-Coder (TurboRC): bitwise range coding with adaptive
predictors, multisymbol/CDF range coding, adaptive-CDF rANS, integer coders
(gamma/rice/VLC/RLE), and a BWT compression pipeline.

Architecture (see SURVEY.md for the reference layer map):

- ``ops/``        lane-parallel coder cores (rANS, range coder, bit I/O) as
                  vectorized JAX scans + Pallas TPU kernels.  The serial
                  renormalization dependency of classic entropy coders is
                  defeated by interleaving thousands of independent lanes
                  (reference proves 2-4 way interleave works: rccdf.c:125,
                  anscdf.c:566 - we scale it to the VPU width).
- ``models/``     probability models: adaptive CDF16 (cdf_.h semantics),
                  simple / dual-speed / FSM bit predictors, context mixing.
- ``codecs/``     complete encoders/decoders composing ops x models
                  (order-0/1/2, sliding ctx, RLE, gamma, rice, VLC, QLFC...).
- ``container/``  the interleaved-stream block container (file format).
- ``parallel/``   device mesh setup + data-parallel block sharding (pjit /
                  shard_map over a jax Mesh; DP over blocks is the
                  distribution axis - the workload has no TP/PP analog).
- ``transforms/`` delta / zigzag / transpose / float-quantize preprocessing.
- ``host/``       native C++ host stages (BWT suffix-array, inverse BWT)
                  and their ctypes bindings.
- ``utils/``      config, timing, packing helpers.
"""

__version__ = "0.1.0"

import os as _os

# Persistent kernel-compile cache: the flagship kernels compile per
# (geometry, K) variant (~20-100s each on the TPU toolchain); a disk
# cache makes every variant a one-time cost per machine instead of per
# process.  Opt out with TRC_NO_COMPILE_CACHE=1 or by setting
# JAX_COMPILATION_CACHE_DIR yourself.
if not _os.environ.get("TRC_NO_COMPILE_CACHE") and \
        not _os.environ.get("JAX_COMPILATION_CACHE_DIR"):
    import jax as _jax

    _jax.config.update(
        "jax_compilation_cache_dir",
        _os.path.join(_os.path.expanduser("~"), ".cache", "jax-turborc"))
    _jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

from turborc_tpu.utils.config import CodecConfig  # noqa: F401
from turborc_tpu.api import compress, decompress  # noqa: F401
