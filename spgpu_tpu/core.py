"""Core runtime: context, type registry, tiling constants, status codes.

TPU-native re-design of the reference's context layer
(``/root/reference/src/core/core.h:43-138``, ``core.c:11-99``):

* The reference caches CUDA device properties (warpSize, maxGridSize, SM
  count, compute capability) in a ``SpgpuHandleStruct`` and launches every
  kernel on ``handle->currentStream``.  On TPU the analogous per-device facts
  are the *tile geometry* (128 lanes, dtype-dependent sublane count), the
  VMEM budget, and the HBM bandwidth used for roofline accounting — all of
  which live in :class:`Context`.
* CUDA streams have no user-visible TPU equivalent (XLA owns scheduling);
  ``stream_create``/``set_stream`` are kept as documented no-op shims for
  API parity with ``spgpuStreamCreate``/``spgpuSetStream``
  (``core.c:50-80``).
* Status codes and the ``spgpuSizeOf`` type table are mirrored one-to-one
  (``core.h:43-57,134-138``, ``core.c:82-99``).
"""

from __future__ import annotations

import dataclasses
import enum
from typing import Optional

import jax
import numpy as np

# ---------------------------------------------------------------------------
# Status / type codes (parity with core.h:43-57)
# ---------------------------------------------------------------------------


class Status(enum.IntEnum):
    """Return codes; mirrors ``spgpuStatus_t`` (``core.h:43-48``)."""

    SUCCESS = 0
    UNSUPPORTED = 1
    UNSPECIFIED = 2
    OUTOFMEMORY = 3


class TypeCode(enum.IntEnum):
    """Element type codes; mirrors ``spgpuType_t`` (``core.h:51-57``)."""

    INT = 0
    FLOAT = 1
    DOUBLE = 2
    COMPLEX_FLOAT = 3
    COMPLEX_DOUBLE = 4
    # TPU extension: not present in the reference, first-class on TPU.
    BFLOAT16 = 5


_TYPE_TO_DTYPE = {
    TypeCode.INT: np.dtype(np.int32),
    TypeCode.FLOAT: np.dtype(np.float32),
    TypeCode.DOUBLE: np.dtype(np.float64),
    TypeCode.COMPLEX_FLOAT: np.dtype(np.complex64),
    TypeCode.COMPLEX_DOUBLE: np.dtype(np.complex128),
}


def size_of(code: TypeCode) -> int:
    """Byte size of a type code; mirrors ``spgpuSizeOf`` (``core.c:82-99``)."""
    if code == TypeCode.BFLOAT16:
        return 2
    return _TYPE_TO_DTYPE[TypeCode(code)].itemsize


def dtype_of(code: TypeCode):
    if code == TypeCode.BFLOAT16:
        import jax.numpy as jnp

        return jnp.bfloat16
    return _TYPE_TO_DTYPE[TypeCode(code)]


# ---------------------------------------------------------------------------
# TPU tiling constants
# ---------------------------------------------------------------------------

#: Vector lane count — the last-dimension tile size on every TPU generation.
LANES = 128

#: Minimum sublane count (second-to-last dim) per element width.
_SUBLANES_BY_ITEMSIZE = {8: 8, 4: 8, 2: 16, 1: 32}


def sublanes(dtype) -> int:
    """Minimum sublane multiple for ``dtype`` on TPU.

    fp32 → 8, bf16 → 16, int8/fp8 → 32.  fp64/complex are stored as pairs of
    32-bit words by XLA:TPU so 8 is the correct (and safe) multiple; on CPU
    the value is only used for padding and any multiple works.
    """
    return _SUBLANES_BY_ITEMSIZE.get(np.dtype(dtype).itemsize, 8)


def round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def cdiv(a: int, b: int) -> int:
    return -(-a // b)


#: Pallas kernel grid unit: tiles (of 8 slots) per grid step.  Bigger
#: chunks amortise per-grid-step overhead (~0.3-0.5 us measured on v5e)
#: against group slab padding (slot counts round up to a chunk) and
#: Mosaic compile time (the kernels unroll CHUNK_TILES bodies; 128
#: pushes the compile past 10 minutes).  Measured on the fem bench:
#: 8 -> 147 GB/s, 32 -> 203 GB/s, 64 -> 240 GB/s effective.
CHUNK_TILES = 64

#: WHDIA's grid unit: its slabs are values-only (less per-chunk traffic
#: to amortise) and banded 32-hack groups are ~64 tiles, so 32 measures
#: better (banded 1M: 22.9 vs 22.1 GFLOPS; 500k b31: 31.1 vs 29.2).
WHDIA_CHUNK_TILES = 32

#: Default hack size: one full lane vector of rows per hack.  The reference
#: requires a multiple of its warp size 32 and uses 32 in practice
#: (``hell.h:30-33``); on TPU the natural unit is the 128-lane vector.
DEFAULT_HACK_SIZE = 128

#: Pitch alignment parity: the reference rounds leading dimensions up to 32
#: elements and 128 bytes (``ell.c:33-37``, ``ell.h:24``).  We round the row
#: axis up to LANES and the slot axis up to ``sublanes(dtype)``.


# ---------------------------------------------------------------------------
# HBM bandwidth table for roofline accounting (GB/s per chip)
# ---------------------------------------------------------------------------

HBM_BW_BY_KIND = {
    # device_kind substrings → bytes/s
    "v5 lite": 819e9,   # TPU v5e
    "v5e": 819e9,
    "v5p": 2765e9,
    "v5": 1228e9,       # fallback if only "v5" matches
    "v4": 1228e9,
    "v6 lite": 1638e9,  # TPU v6e (Trillium)
    "v6e": 1638e9,
    "v3": 900e9,
    "v2": 700e9,
}


def hbm_bandwidth(device=None) -> Optional[float]:
    """Best-effort HBM bandwidth (bytes/s) of ``device`` for rooflines."""
    if device is None:
        device = jax.devices()[0]
    kind = getattr(device, "device_kind", "").lower()
    for key, bw in HBM_BW_BY_KIND.items():
        if key in kind:
            return bw
    return None


# ---------------------------------------------------------------------------
# Context
# ---------------------------------------------------------------------------


@dataclasses.dataclass
class Context:
    """Per-device context; TPU analogue of ``spgpuHandle_t``.

    Mirrors ``spgpuCreate`` (``core.c:11-41``), which caches device
    properties and a default stream.  Here we cache the JAX device, its tile
    geometry and bandwidth, and (optionally) a device mesh for the
    distributed layer — the TPU-native replacement for the reference's
    bring-your-own-thread multi-GPU story (SURVEY §2.6).
    """

    device: object = None
    mesh: Optional[jax.sharding.Mesh] = None

    def __post_init__(self):
        if self.device is None:
            self.device = jax.devices()[0]

    @property
    def platform(self) -> str:
        return self.device.platform

    @property
    def lanes(self) -> int:
        return LANES

    def sublanes(self, dtype) -> int:
        return sublanes(dtype)

    @property
    def hbm_bandwidth(self) -> Optional[float]:
        return hbm_bandwidth(self.device)

    # -- stream shims (parity with core.c:50-80; XLA owns scheduling) -------

    def stream_create(self):
        """No-op shim for ``spgpuStreamCreate`` — XLA owns TPU scheduling."""
        return None

    def set_stream(self, stream):
        """No-op shim for ``spgpuSetStream``."""
        return Status.SUCCESS

    def get_stream(self):
        """No-op shim for ``spgpuGetStream``."""
        return None


def create(device_index: int = 0) -> Context:
    """Create a context; mirrors ``spgpuCreate`` (``core.c:11-41``)."""
    return Context(device=jax.devices()[device_index])


def destroy(ctx: Context) -> Status:
    """Mirrors ``spgpuDestroy`` (``core.c:43-48``); nothing to free in JAX."""
    return Status.SUCCESS
