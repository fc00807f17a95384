"""Pallas TPU kernels — and why the hot warp is NOT one.

Round-2 findings, probed on the real v5e via `tools/probe_mosaic_gather.py`
(each case is a direct pallas_call compile on this image's Mosaic
toolchain):

- dynamic shuffles (`jnp.take_along_axis`) compile ONLY intra-tile:
  lane-axis up to (32, 128) — one 128-lane tile; sublane-axis only (8, 128).
  Every multi-tile form — (8, 384), (14336, 128), (80, 128) axis=0,
  cross-size values/indices — kills the remote compile (HTTP 500,
  tpu_compile_helper exit 1).
- sublane-axis `jnp.take`/`take_along_axis` with large value arrays
  crashes the same way; XLA-level gathers cost ~8 ns per row regardless
  of row width, which the quad/oct packing in `tdvnet.ops.sampling`
  exploits (one wide-row gather per interpolation stencil).

Consequence for the plane-sweep warp (the pipeline's hottest op): any
in-kernel bilinear tap crosses tile boundaries, so a Pallas gather
formulation is not expressible here.  The shipped TPU answer is the
two-pass homography MATMUL warp (`tdvnet/ops/warp.py`): exact scanline
factorization v = alpha*u + beta turns the warp into MXU contractions
with hat-weight matrices — measured 4.3x over the packed-gather path at
the eval chunk shape (427 -> 98 ms, `tools/bench_warp.py`).  A fused
kernel was prototyped (two-pass + variance accumulation in VMEM,
interpret-mode exact vs the XLA path); every VMEM layout that feeds both
passes needs either a cross-tile shuffle (uncompilable, above) or a
lane<->sublane relayout / per-lane scatter whose cost exceeds the HBM
traffic a kernel would save, so the XLA formulation stands as the
production path.

The round-1 elementwise kernels (soft-argmax 0.77x XLA; a propagation
blend whose Mosaic compile hung) were net-negative and are deleted.
"""
