"""dcreg_tpu: TPU-native degeneracy-aware LiDAR registration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of JokerJohn/DCReg
(decoupled Schur-complement degeneracy characterization + targeted
preconditioned CG for point-to-plane ICP), designed TPU-first: fixed-shape
masked tensor pipelines, MXU-batched correspondence search and Hessian
assembly, mesh-sharded scaling via shard_map/psum.
"""
__version__ = "0.1.0"


def enable_compile_cache(tag: str = "default"):
    """Opt-in persistent XLA compilation cache (keyed by tag so CPU-test and
    TPU-bench artifacts never mix -- the TPU relay's remote compiler emits
    host-mismatched CPU AOT blobs if shared)."""
    import os
    import jax
    path = os.path.expanduser(f"~/.cache/dcreg_tpu_xla_cache/{tag}")
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
