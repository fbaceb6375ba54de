"""End-to-end jobs: pages synthesis, geometry synthesis, spatial join,
lineage/checkpointing, kNN, tiling."""
