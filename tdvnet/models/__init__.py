"""Flax modules: backbone → FPN → MVSNet 2D stage, scene 3D stage, decoders."""
