"""Shared data-parallel primitives (checksums, bit IO, entropy-code tables)
used by every format pipeline."""
