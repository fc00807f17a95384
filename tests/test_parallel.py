"""Multi-device (virtual 8-CPU mesh) sharding tests."""
import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest


def test_dp_train_step_runs_on_mesh():
    from tdvnet.parallel.sharding import shard_train_step_dryrun

    shard_train_step_dryrun(n_devices=min(8, len(jax.devices())))


def test_dp_matches_single_device_grads():
    """pmean of per-shard grads == grads of the mean loss over all shards."""
    from tdvnet.config import tiny_test_config
    from tdvnet.data import batch as B, synthetic
    from tdvnet.parallel.sharding import make_dp_train_step, stack_shards
    from tdvnet.train.loop import create_state
    from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

    n_dev = 2
    devices = jax.devices()[:n_dev]
    mesh = Mesh(np.asarray(devices), ("data",))
    cfg = tiny_test_config()
    bc = cfg.batch
    shards = []
    for d in range(n_dev):
        scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                             bc.depth_img_size, seed=10 * d)
                  for _ in range(bc.n_scenes)]
        shards.append(B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                                       bc.n_src_on_either_side))
    sharded = stack_shards(shards)
    sharded = jax.device_put(sharded, jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P("data")), sharded))

    model, state = create_state(cfg, jax.random.PRNGKey(0), shards[0])
    state_sh = jax.device_put(state, jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), state))

    # single-device losses FIRST (the DP step donates its state buffers,
    # which may alias `state` through device_put)
    losses = []
    for sh in shards:
        out, _ = model.apply(
            {"params": state.params, "batch_stats": state.batch_stats}, sh,
            offsets=list(cfg.train.offsets), n_iters=1, lam=0.5, train=True,
            with_metrics=False, backbone_train=False,
            mutable=["batch_stats"])
        losses.append(float(out["loss"]))

    step = make_dp_train_step(model, cfg, n_iters=1, mesh=mesh)
    new_state, mets = step(state_sh, sharded, jnp.float32(0.5))
    dp_loss = float(mets["loss"])
    assert abs(dp_loss - np.mean(losses)) < 1e-2 * max(1.0, abs(dp_loss))
