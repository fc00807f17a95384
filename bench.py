"""Throughput benchmark: depth frames/s per chip on the flagship pipeline.

Runs the full 3DVNet-capability inference graph at reference scale
(256x320 images, 56x56x96 cost volume, scene volume + 2x3 PointFlow
refinements + 3-stage upsampling — the graph of `mv3d/eval-3dvnet.py`) on
one chip and prints ONE JSON line.

The reference never measures throughput (SURVEY §6: only DVMVS's unused
InferenceTimer) — REF_FPS_3090 below is our documented estimate of the
reference pipeline on its stated RTX 3090 (eval chunk sizes 18/16/100,
`eval-3dvnet.py:12-14`), to be replaced by a measured number when the
reference can be run.  vs_baseline = ours / (2 * REF_FPS_3090): the north
star is >=2x the CUDA reference per chip, so vs_baseline >= 1.0 means the
target is met.
"""
from __future__ import annotations

import json
import time

REF_FPS_3090 = 20.0   # estimated reference frames/s on RTX 3090 (see above)
TARGET_MULT = 2.0

N_WARMUP = 2
N_ITERS = 10


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tdvnet.config import load_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = load_config({
        "batch": {"n_scenes": 1, "n_ref": 7},
        "model": {"dtype": "bfloat16"},
    })
    # resolve dtype string
    import dataclasses

    cfg = dataclasses.replace(
        cfg, model=dataclasses.replace(cfg.model, dtype=jnp.bfloat16))

    bc = cfg.batch
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)

    model = ThreeDVNet(cfg.model)
    # jit the init: un-jitted tracing dispatches op-by-op (each a tunnel
    # roundtrip under axon) — one compiled graph instead
    import sys

    t0 = time.perf_counter()
    init_fn = jax.jit(lambda rng, batch: model.init(
        rng, batch, offsets=[0.05], n_iters=1, lam=0.0, train=False))
    variables = jax.tree_util.tree_map(
        lambda x: x, init_fn(jax.random.PRNGKey(0), fb))
    jax.block_until_ready(variables)
    print(f"init: {time.perf_counter()-t0:.1f}s", file=sys.stderr)

    @jax.jit
    def forward(variables, batch):
        out = model.apply(variables, batch, offsets=[0.05, 0.05, 0.025],
                          n_iters=2, lam=1.0, train=False, with_metrics=False)
        return out["depth_pred"]

    # compile + warmup
    t0 = time.perf_counter()
    out = forward(variables, fb)
    out.block_until_ready()
    print(f"forward compile: {time.perf_counter()-t0:.1f}s", file=sys.stderr)
    for _ in range(N_WARMUP):
        forward(variables, fb).block_until_ready()

    t0 = time.perf_counter()
    for _ in range(N_ITERS):
        out = forward(variables, fb)
    out.block_until_ready()
    dt = time.perf_counter() - t0

    d = np.asarray(out)
    assert np.isfinite(d).all(), "non-finite depth in bench output"
    assert 0.0 < float(d.mean()) < 65.0, f"implausible depth mean {d.mean()}"

    n_frames = fb.n_refs * N_ITERS
    fps = n_frames / dt
    print(json.dumps({
        "metric": "depth_fps_per_chip",
        "value": round(fps, 2),
        "unit": "ref-frames/s (full pipeline: init depth + 2x3 pointflow + upsample)",
        "vs_baseline": round(fps / (TARGET_MULT * REF_FPS_3090), 3),
    }))


if __name__ == "__main__":
    main()
