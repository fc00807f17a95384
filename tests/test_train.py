"""Training-loop behavior: schedules, regimes, loss decreases, checkpoints."""
import os

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from tdvnet.config import tiny_test_config
from tdvnet.data import batch as B, synthetic
from tdvnet.train import loop as L


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_test_config()
    bc = cfg.batch
    scenes = [synthetic.make_batch_scene(bc.n_views, bc.img_size,
                                         bc.depth_img_size, seed=s)
              for s in range(bc.n_scenes)]
    fb = B.collate_scenes(scenes, bc.n_views, bc.n_ref,
                          bc.n_src_on_either_side)
    model, state = L.create_state(cfg, jax.random.PRNGKey(0), fb,
                                  steps_per_epoch=1)
    return cfg, fb, model, state


def test_schedules():
    cfg = tiny_test_config()
    assert L.lambda_for_epoch(cfg, 0) == 0.0
    assert abs(L.lambda_for_epoch(cfg, 5) - 0.5) < 1e-9
    assert L.lambda_for_epoch(cfg, 50) == 1.0
    assert L.n_iters_for_epoch(cfg, 0) == 1
    assert L.n_iters_for_epoch(cfg, 25) == 2
    sched = L.make_lr_schedule(1e-3, 100, 0.1, steps_per_epoch=10)
    assert abs(sched(0) - 1e-3) < 1e-12
    assert abs(sched(999) - 1e-3) < 1e-12      # epoch 99
    assert abs(sched(1000) - 1e-4) < 1e-12     # epoch 100


def test_train_step_decreases_loss(setup):
    cfg, fb, model, state = setup
    step = L.make_train_step(model, cfg, n_iters=1, donate=False)
    lam = jnp.float32(0.5)
    state1, m0 = step(state, fb, lam)
    losses = [float(m0["loss"])]
    s = state1
    for _ in range(6):
        s, m = step(s, fb, lam)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_backbone_bn_frozen_when_not_finetune(setup):
    cfg, fb, model, state = setup
    step = L.make_train_step(model, cfg, n_iters=1, donate=False)
    new_state, _ = step(state, fb, jnp.float32(0.5))

    def bn_leaves(tree, path=()):
        out = {}
        if isinstance(tree, dict):
            for k, v in tree.items():
                out.update(bn_leaves(v, path + (k,)))
        else:
            if any(str(p).startswith("BatchNorm") for p in path) and \
                    "backbone" in [str(p) for p in path]:
                out["/".join(map(str, path))] = tree
        return out

    before = bn_leaves(state.params)
    after = bn_leaves(new_state.params)
    assert before, "no backbone BN params found"
    for k in before:
        np.testing.assert_array_equal(np.asarray(before[k]),
                                      np.asarray(after[k]))
    # backbone BN running stats unchanged too (inference mode)
    bs_before = bn_leaves(state.batch_stats)
    bs_after = bn_leaves(new_state.batch_stats)
    for k in bs_before:
        np.testing.assert_array_equal(np.asarray(bs_before[k]),
                                      np.asarray(bs_after[k]))


def test_checkpoint_roundtrip(setup, tmp_path):
    from tdvnet.train import checkpoints as C

    cfg, fb, model, state = setup
    d = str(tmp_path / "ckpt")
    C.save(d, state, epoch=3, cfg=cfg)
    restored, ep = C.restore(d, state)
    assert ep == 3
    orig = jax.tree_util.tree_leaves(state.params)
    rest = jax.tree_util.tree_leaves(restored.params)
    for a, b in zip(orig, rest):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_npz_weights_roundtrip(setup, tmp_path):
    """export_npz/load_npz keep the tree structure and fp16-round floats;
    restore_params accepts the .npz path directly."""
    from tdvnet.train import checkpoints as C

    cfg, fb, model, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "w" / "weights.npz")
    C.export_npz(path, variables, epoch=7)
    restored, ep = C.restore_params(path)
    assert ep == 7

    flat_o = C._flatten(variables)
    flat_r = C._flatten({k: restored[k] for k in ("params", "batch_stats")})
    assert set(flat_o) == set(flat_r)
    for k in flat_o:
        a = np.asarray(flat_o[k], np.float32)
        b = np.asarray(flat_r[k], np.float32)
        assert b.dtype == np.float32 or not np.issubdtype(b.dtype, np.floating)
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)

    # fp16 rounding must not perturb the forward beyond noise
    out_o = model.apply(variables, fb, offsets=[0.05], n_iters=1, lam=0.0,
                        train=False, with_metrics=False)["depth_pred"]
    out_r = model.apply(restored, fb, offsets=[0.05], n_iters=1, lam=0.0,
                        train=False, with_metrics=False)["depth_pred"]
    np.testing.assert_allclose(np.asarray(out_o), np.asarray(out_r),
                               rtol=0.05, atol=0.05)


def test_remat_step_matches_exact(setup):
    """jax.checkpoint must not change numerics — only memory/flops."""
    import dataclasses

    cfg, fb, model, state = setup
    cfg_r = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, remat=True))
    lam = jnp.float32(0.5)
    s1, m1 = L.make_train_step(model, cfg, n_iters=1, donate=False)(
        state, fb, lam)
    s2, m2 = L.make_train_step(model, cfg_r, n_iters=1, donate=False)(
        state, fb, lam)
    np.testing.assert_allclose(float(m1["loss"]), float(m2["loss"]),
                               rtol=1e-6)
    for a, b in zip(jax.tree_util.tree_leaves(s1.params),
                    jax.tree_util.tree_leaves(s2.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_bf16_train_step_runs_and_learns(setup):
    import dataclasses

    cfg, fb, _, _ = setup
    cfg_b = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, bf16_compute=True))
    model, state = L.create_state(cfg_b, jax.random.PRNGKey(0), fb,
                                  steps_per_epoch=1)
    # params stay fp32 even though compute is bf16
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert leaf.dtype == jnp.float32
    step = L.make_train_step(model, cfg_b, n_iters=1, donate=False)
    lam = jnp.float32(0.5)
    s, m0 = step(state, fb, lam)
    losses = [float(m0["loss"])]
    for _ in range(5):
        s, m = step(s, fb, lam)
        losses.append(float(m["loss"]))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses


def test_streaming_loader_shuffles_and_covers(tmp_path):
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import EveryNthSelector
    from tdvnet.train.loader import StreamingLoader
    from tools.make_synthetic_dataset import make_scene_dir

    dirs = [make_scene_dir(str(tmp_path), f"s{i}", 6, (32, 40), i)
            for i in range(5)]
    dset = Dataset(dirs, EveryNthSelector(1), 3, depth_img_size=(32, 40),
                   img_size=(32, 40), augment=False, n_src_on_either_side=1)
    loader = StreamingLoader(dset, n_scenes=2, n_views=5, n_ref=3, seed=1,
                             prefetch=2, workers=2)
    assert len(loader) == 2            # 5 scenes // 2 per batch
    b0 = list(loader.epoch(0))
    b1 = list(loader.epoch(1))
    assert len(b0) == len(b1) == 2
    for b in b0 + b1:
        assert b.images.ndim == 4 and b.n_refs == 6  # 2 scenes x 3 refs
    # deterministic per epoch, different across epochs
    g0a = loader._epoch_groups(0)
    g0b = loader._epoch_groups(0)
    g1 = loader._epoch_groups(1)
    assert [list(g) for g in g0a] == [list(g) for g in g0b]
    assert [list(g) for g in g0a] != [list(g) for g in g1]


def test_fit_accepts_streaming_loader(tmp_path):
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import EveryNthSelector
    from tdvnet.train.loader import StreamingLoader
    from tools.make_synthetic_dataset import make_scene_dir

    cfg = tiny_test_config()
    bc = cfg.batch
    dirs = [make_scene_dir(str(tmp_path), f"s{i}", 6, bc.img_size, i)
            for i in range(2)]
    dset = Dataset(dirs, EveryNthSelector(1), bc.n_ref,
                   depth_img_size=bc.depth_img_size, img_size=bc.img_size,
                   augment=False,
                   n_src_on_either_side=bc.n_src_on_either_side)
    loader = StreamingLoader(dset, bc.n_scenes, bc.n_views, bc.n_ref,
                             workers=2, prefetch=1)
    model, state = L.fit(cfg, loader, lambda: [], n_epochs=1,
                         log_dir=str(tmp_path / "runs"))
    assert state is not None


def test_grad_accum_matches_large_batch(setup):
    """k accumulation micro-steps == one update with the averaged grad."""
    import dataclasses

    cfg, fb, _, _ = setup
    cfg_a = dataclasses.replace(
        cfg, train=dataclasses.replace(cfg.train, grad_accum_steps=2))
    model, state = L.create_state(cfg_a, jax.random.PRNGKey(0), fb,
                                  steps_per_epoch=1)
    step = L.make_train_step(model, cfg_a, n_iters=1, donate=False)
    lam = jnp.float32(0.5)
    p0 = jax.tree_util.tree_leaves(state.params)
    s1, _ = step(state, fb, lam)
    # after 1 micro-step params must be UNCHANGED (accumulating)
    for a, b in zip(p0, jax.tree_util.tree_leaves(s1.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    s2, _ = step(s1, fb, lam)
    # after the 2nd micro-step the update applies
    changed = any(
        not np.array_equal(np.asarray(a), np.asarray(b))
        for a, b in zip(p0, jax.tree_util.tree_leaves(s2.params)))
    assert changed


def test_fit_warm_starts_from_npz(setup, tmp_path):
    """`fit(init_from=weights.npz)` must load the shipped-weights form and
    continue the epoch counter (the shipped-checkpoint continuation path,
    `tools/train_3dvnet.py --init-from`)."""
    from tdvnet.train import checkpoints as C

    cfg, fb, model, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "weights.npz")
    C.export_npz(path, variables, epoch=5)

    ckpt_dir = str(tmp_path / "ckpt_new")
    _, st = L.fit(cfg, [fb], lambda: [], n_epochs=6,
                  log_dir=str(tmp_path / "runs"), ckpt_dir=ckpt_dir,
                  resume=True, init_from=path)
    # started at epoch 5 -> ran exactly 1 epoch; checkpoint saved as epoch 6
    assert C.latest_epoch(ckpt_dir) == 6
    restored, ep = C.restore_params(ckpt_dir)
    assert ep == 6
    # params moved off the warm-start values (a real update happened) —
    # compare against the npz-restored (fp16-rounded) values, not the
    # original fp32 tree, so rounding can't masquerade as an update
    warm, _ = C.restore_params(path)
    flat_0 = C._flatten({"params": warm["params"]})
    flat_r = C._flatten({"params": restored["params"]})
    assert set(flat_0) == set(flat_r)
    changed = any(
        not np.array_equal(np.asarray(flat_0[k], np.float32),
                           np.asarray(flat_r[k], np.float32))
        for k in flat_0)
    assert changed


def test_lr_schedule_offset_and_warm_start_guardrails(setup, tmp_path):
    """ADVICE r3: (a) a params-only warm start must continue the decayed
    StepLR, not restart at gamma^0; (b) start_epoch >= n_epochs must fail
    loudly; (c) a bad --init-from path raises, not assert."""
    import pytest as _pytest

    from tdvnet.train import checkpoints as C

    # (a) schedule offset math
    sched = L.make_lr_schedule(1e-3, 100, 0.1, steps_per_epoch=10,
                               step_offset=100 * 10)
    assert abs(sched(0) - 1e-4) < 1e-12            # already at epoch 100

    cfg, fb, model, state = setup
    variables = {"params": state.params, "batch_stats": state.batch_stats}
    path = str(tmp_path / "w.npz")
    C.export_npz(path, variables, epoch=7)

    # (b) warm start beyond n_epochs: loud failure, no silent no-op
    with _pytest.raises(ValueError, match="nothing to train"):
        L.fit(cfg, [fb], lambda: [], n_epochs=5,
              log_dir=str(tmp_path / "runs"),
              ckpt_dir=str(tmp_path / "c1"), init_from=path)

    # (c) missing init_from file raises FileNotFoundError
    with _pytest.raises(FileNotFoundError):
        L.fit(cfg, [fb], lambda: [], n_epochs=50,
              log_dir=str(tmp_path / "runs"),
              ckpt_dir=str(tmp_path / "c2"),
              init_from=str(tmp_path / "missing.npz"))


def test_fit_exports_npz_snapshots(setup, tmp_path):
    """fit(export_npz=...) writes a committable snapshot every
    export_every epochs (checkpoint durability, VERDICT r3 #8)."""
    from tdvnet.train import checkpoints as C

    cfg, fb, model, state = setup
    out = str(tmp_path / "snap.npz")
    L.fit(cfg, [fb], lambda: [], n_epochs=2,
          log_dir=str(tmp_path / "runs"), ckpt_dir=None,
          export_npz=out, export_every=2)
    raw, ep = C.load_npz(out)
    assert ep == 2
    assert "params" in raw
