"""poasta_tpu — a TPU-native partial-order alignment framework.

Capabilities mirror ``pangenome/poasta`` (fast, optimal gap-affine
sequence-to-graph and partial-order alignment); the architecture is
TPU-first: JAX/XLA/Pallas wavefront kernels for the alignment fill,
``jax.sharding``/``shard_map`` data parallelism for read mapping at scale,
and a host-side graph/IO substrate that preserves byte-identical output
formats (FASTA-MSA, GFA v1/v1.1, DOT, GAF).
"""

__version__ = "0.1.0"

from . import aligner, bubbles, graphs, io  # noqa: F401
