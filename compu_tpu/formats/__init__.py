"""Format pipelines: each format maps the generic streaming contract onto a
device kernel pipeline (the role the reference's per-backend adapter modules
play, src/encoder/{zlib,zstd,brotli*}.rs and src/decoder/ twins)."""
