"""ortho-sfm-tpu: TPU-native Structure-from-Motion for orthographic multi-view images.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of the reference C++
pipeline OrthoSfM (kai-neumann/OrthoSfM): SIFT feature detection + exhaustive
pairwise matching with geometric verification, feature-track building,
group-wise incremental pose initialization via RANSAC'd Tomasi-Kanade
factorization, orthographic ray triangulation, and incremental + global bundle
adjustment under four camera parameterizations.

Instead of OpenMP threads and Ceres, all numeric work is expressed as batched /
vmapped / sharded array programs: tracks, observations and RANSAC hypotheses
are dense padded tensors that shard across a TPU mesh; the bundle-adjustment
normal equations are Schur-reduced over point blocks with `psum` collectives
assembling the camera system.
"""

__version__ = "0.1.0"

# SfM geometry cannot tolerate bf16 matmul/conv lowering (the TPU default for
# f32 dots): rotation products pick up ~4e-3 non-orthogonality, the Gaussian
# pyramid swamps the DoG contrast threshold (0.02/3), and the BA normal
# equations lose the curvature detail LM needs near convergence. Pin every
# precision-unspecified dot/conv to full f32 MXU passes; kernels that can
# safely trade precision for speed opt in explicitly with a precision= arg.
import jax as _jax

_jax.config.update("jax_default_matmul_precision", "highest")

from orthosfm_tpu.config import (BundleAdjustConfig, FilterConfig,
                                 MatchingConfig, RansacConfig,
                                 ReconstructionConfig, SolverType)

__all__ = [
    "BundleAdjustConfig", "FilterConfig", "MatchingConfig", "RansacConfig",
    "ReconstructionConfig", "SolverType", "__version__",
]


def reconstruct(config: ReconstructionConfig, verbose: bool = True):
    """Top-level reconstruction (lazy import keeps `import orthosfm_tpu` light)."""
    from orthosfm_tpu.pipeline.reconstruct import reconstruct as _reconstruct

    return _reconstruct(config, verbose=verbose)
