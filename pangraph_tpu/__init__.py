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

from pangraph_tpu.graph.graph import Pangraph
from pangraph_tpu.graph.edits import Edit, Sub, Del, Ins

__all__ = ["Pangraph", "Edit", "Sub", "Del", "Ins", "__version__"]
