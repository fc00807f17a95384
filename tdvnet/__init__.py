"""tdvnet — a TPU-native multi-view depth + volumetric refinement engine.

A from-scratch JAX/XLA/Pallas framework with the capabilities of 3DVNet
(reference: alexrich021/3dvnet): multi-view plane-sweep depth prediction,
scene-level iterative PointFlow refinement over a 3D feature volume, learned
multi-scale upsampling, and a full reconstruction/evaluation suite.

This package is the "3dvnet_tpu" build (named `tdvnet` so it is a valid
Python identifier).  Layout:

- ``tdvnet.ops``      — pure-function geometry/compute ops (camera models,
  bilinear/trilinear sampling, cost volumes, voxelization, TSDF, fusion).
- ``tdvnet.kernels``  — Pallas TPU kernels for the hot ops.
- ``tdvnet.models``   — Flax modules (backbone, FPN, MVSNet, scene U-Net,
  hypothesis decoder, propagation upsamplers, full ThreeDVNet).
- ``tdvnet.data``     — `info.json` datasets, frame selectors, padded
  fixed-shape batching, synthetic scenes.
- ``tdvnet.train``    — train/val steps, optimizer, checkpointing, logging.
- ``tdvnet.eval``     — whole-scene inference harness, 2D/3D metrics,
  point-cloud + TSDF fusion, mesh rendering.
- ``tdvnet.parallel`` — device-mesh sharding (DP over scenes, spatially
  sharded scene volumes with halo exchange).
"""

__version__ = "0.1.0"
