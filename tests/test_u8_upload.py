"""uint8 fast-upload path: device-side normalization must reproduce the
host float images exactly for non-augmented data (PNG-sourced pixels are
uint8-representable), and closely for the synthetic renderer."""
import numpy as np
import jax.numpy as jnp

from tdvnet.data import synthetic


def test_synthetic_u8_close():
    sc = synthetic.make_scene(n_views=3, img_size=(32, 40), seed=0)
    assert sc["images_u8"].dtype == np.uint8
    mean = np.asarray(sc["rgb_mean"], np.float32)
    std = np.asarray(sc["rgb_std"], np.float32)
    dev = (sc["images_u8"].astype(np.float32) / sc["rgb_scale"]
           - mean) / std
    # synthetic floats are continuous: error bounded by the u8 quantum
    assert np.abs(dev - sc["images"]).max() <= (0.5 / 255.0) / std.min() + 1e-6


def test_device_images_matches_host(tmp_path):
    """Through the real Dataset (PNG round trip): bit-exact."""
    import os

    from tools.make_synthetic_dataset import make_scene_dir
    from tdvnet.data.dataset import Dataset
    from tdvnet.data.frameselector import EveryNthSelector

    d = make_scene_dir(str(tmp_path), "s0", 4, (48, 64), seed=1)
    dset = Dataset([d], EveryNthSelector(1), 2, depth_img_size=(48, 64),
                   img_size=(48, 64), augment=False, n_src_on_either_side=1)
    v = dset.load_views(0, seed_idx=0)
    assert "images_u8" in v
    dev = (v["images_u8"].astype(np.float32) / v["rgb_scale"]
           - np.asarray(v["rgb_mean"], np.float32)) \
        / np.asarray(v["rgb_std"], np.float32)
    np.testing.assert_allclose(dev, v["images"], atol=1e-6)
    assert os.path.exists(d)


def test_scene_inference_norm_formula():
    from tdvnet.config import tiny_test_config
    from tdvnet.eval.whole_scene import SceneInference
    from tdvnet.models.threedvnet import ThreeDVNet

    cfg = tiny_test_config()
    model = ThreeDVNet(cfg.model)
    inf = SceneInference.__new__(SceneInference)   # formula-only check
    import jax

    inf._norm_u8 = jax.jit(
        lambda u8, scale, mean, std:
        (u8.astype(jnp.float32) / scale - mean) / std)
    sc = synthetic.make_scene(n_views=2, img_size=(16, 20), seed=2)
    out = np.asarray(inf._device_images(sc))
    assert np.abs(out - sc["images"]).max() <= 0.02
