"""Pallas TPU kernels and recorded kernel experiments.

The SURVEY reserved this package for the "flagship Pallas traversal
kernel".  Round 2 built it and measured it against the production jnp
wide-BVH (see traverse.py for the design and the full A/B): the XLA
gather engine behind jnp.take is the fastest random-row access on this
hardware, so the jnp traversal in tpurt.render.intersect REMAINS the
production path.  The kernel is kept here, correctness-tested (CPU
interpret mode in tests/test_kernels.py, hit-agreement 1.0 on-chip).

- traverse.py: Pallas wide-BVH closest-hit traversal (8-wide layout).
- gather_bench.py: the row-gather microbenchmark that explains the A/B.
"""

from tpurt.kernels.traverse import traverse_closest_pallas  # noqa: F401
