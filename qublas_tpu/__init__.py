"""qublas_tpu — a TPU-native fixed-point quantized linear-algebra engine.

A from-scratch JAX/XLA/Pallas re-design with the capabilities of the
reference QuBLAS C++ simulator (bit-exact fixed-point arithmetic for
ASIC/FPGA behavioral modeling), extended with what the reference lacks:
batched tensor ops, MXU integer GEMM kernels, LUT kernels, and multi-chip /
multi-host sharding over a `jax.sharding.Mesh`.
"""

from .qformat import (
    FULL_PREC,
    FullPrec,
    OverflowMode,
    QFormat,
    RoundMode,
    add_merge,
    mul_merge,
    qformat,
)

__version__ = "0.1.0"

__all__ = [
    "FULL_PREC",
    "FullPrec",
    "OverflowMode",
    "QFormat",
    "RoundMode",
    "add_merge",
    "mul_merge",
    "qformat",
]


def __getattr__(name):
    # Lazy imports keep `import qublas_tpu` light (no jax import cost for
    # host-only users such as the golden-model oracle tooling).
    if name in ("QTensor", "from_float", "from_raw", "zeros", "random_fill"):
        from . import qtensor

        return getattr(qtensor, name)
    raise AttributeError(f"module {__name__!r} has no attribute {name!r}")
