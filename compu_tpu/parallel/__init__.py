"""Block-parallel scheduling and multi-chip distribution.

The reference is single-threaded; its parallelism story is the re-entrant
state machine (SURVEY §2c). Here parallelism is first-class: streams are
sequences of independent blocks, sharded data-parallel over a
``jax.sharding.Mesh``, with ordered reassembly and checksum combining on
the host."""
