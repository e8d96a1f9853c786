"""pangraph_tpu — a TPU-native pangenome-graph framework.

A from-scratch rebuild of the capabilities of neherlab/pangraph (v1.3.0, Rust + C
minimap2) designed for JAX/XLA/Pallas on TPU:

- the graph data model (blocks / nodes / paths with per-genome edit sets) lives on
  host as compact numpy-backed structures (`pangraph_tpu.graph`),
- the three compute kernels — minimizer sketching, anchor chaining and banded
  affine-gap extension — are batched array programs (`pangraph_tpu.align`,
  `pangraph_tpu.ops`) with Pallas TPU kernels for the hot inner loops,
- graph construction (guide tree, pairwise merge, reweave, reconsensus) is the
  host-side orchestration in `pangraph_tpu.build`, batching all per-node
  re-alignments of a merge step into single device calls,
- multi-chip scaling goes through `jax.sharding.Mesh` (`pangraph_tpu.parallel`).

Reference behavior is documented against /root/reference file:line in docstrings.
"""

__version__ = "0.1.0"


def _setup_jax_compilation_cache():
    """Persistent XLA compilation cache: the bucketed kernel tiers compile once
    per (R_cap, B, batch) shape; caching across processes turns ~40 s TPU
    compiles into millisecond disk hits on every later run."""
    import os

    try:
        import jax

        cache_dir = os.environ.get(
            "PANGRAPH_TPU_JAX_CACHE", os.path.expanduser("~/.cache/pangraph_tpu/jax")
        )
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:  # pragma: no cover - cache is best-effort
        pass


_setup_jax_compilation_cache()

from pangraph_tpu.graph.graph import Pangraph
from pangraph_tpu.graph.edits import Edit, Sub, Del, Ins

__all__ = ["Pangraph", "Edit", "Sub", "Del", "Ins", "__version__"]
