"""Device-mesh parallelism: DP over scenes, spatially-sharded scene volumes
with halo exchange over ICI collectives (SURVEY §5.7/§5.8: the reference has
no real distributed path — NCCL/DDP scaffolding is unused — so this layer is
new TPU-native design constrained only by the model's numerics)."""
