"""TPU kernel-level operations: segment-reduction plans and Pallas kernels.

The analog of the reference's ``small_blas.h`` / ``block_random_access_*``
layer, redesigned for the MXU/VPU: host-built reduction plans replace
lock-guarded random-access accumulation, and Pallas kernels cover the ops
XLA cannot fuse well.
"""

from ceres_tpu.ops.reduce import (
    ReducePlan,
    apply_reduce,
    build_reduce_plan,
)

__all__ = ["ReducePlan", "apply_reduce", "build_reduce_plan"]
