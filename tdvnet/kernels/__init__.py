"""Pallas TPU kernels.

Round-2 finding (probed on the real v5e, 2026-08-17): the pipeline's hot
ops are all bilinear/trilinear GATHERS, and this image's Mosaic toolchain
cannot express a competitive in-kernel gather:

- sublane-axis `jnp.take`/`take_along_axis(axis=0)` crashes the remote
  Mosaic compile (HTTP 500, tpu_compile_helper exit 1);
- lane-axis `take_along_axis(axis=1)` compiles only for same-shape
  values/indices — a 128-lane shuffle, not a table gather;
- XLA's own gather costs ~7-9 ns per row regardless of row width,
  which is the primitive the quad/oct packing in `tdvnet.ops.sampling`
  exploits (one wide-row gather per interpolation stencil, measured
  3.2x on the cost volume vs the 4-tap XLA path).

The round-1 elementwise kernels (soft-argmax 0.77x XLA; a propagation
blend whose Mosaic compile hung) were net-negative and are deleted —
the TPU-shaped win lives in the XLA-level packed-gather design instead.
"""
