"""Multi-chip scaling: device meshes, sharded frame processing, collectives."""
