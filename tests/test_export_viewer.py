"""Interactive HTML viewer export (reference `mv3d/eval/visualizer.py`
capability: cycle scenes/methods, toggle GT/prediction, metrics readout)."""
import base64
import json
import os
import re

import numpy as np
import pytest

from tdvnet.eval.export_viewer import export_viewer
from tdvnet.ops import ply


@pytest.fixture()
def fake_results(tmp_path):
    # one scene, two methods: a fused point cloud and a trimmed mesh
    scene = "scene_000"
    sdir = tmp_path / "data" / scene
    sdir.mkdir(parents=True)
    gt_v = np.random.RandomState(0).rand(50, 3).astype(np.float32)
    gt_f = np.array([[0, 1, 2], [2, 3, 4]], np.int32)
    ply.write_ply(str(sdir / "gt_mesh.ply"), gt_v, gt_f)
    json.dump({"gt_mesh": str(sdir / "gt_mesh.ply"), "frames": []},
              open(sdir / "info.json", "w"))

    methods = []
    for name, fname, has_faces in (("depthm", "fused.ply", False),
                                   ("volm", "mesh.ply", True)):
        r = tmp_path / "results" / name / "scenes" / scene
        r.mkdir(parents=True)
        v = np.random.RandomState(1).rand(30, 3).astype(np.float32)
        f = np.array([[0, 1, 2]], np.int32) if has_faces else None
        ply.write_ply(str(r / fname), v, f)
        json.dump({"fscore": 0.5, "prec": 0.6, "recal": 0.4},
                  open(r / "metrics_3d.json", "w"))
        methods.append((name, str(tmp_path / "results" / name / "scenes"),
                        fname, "metrics_3d.json"))
    return methods, [str(sdir)], tmp_path


def test_export_and_payload(fake_results):
    methods, scene_dirs, tmp_path = fake_results
    out = export_viewer(methods, scene_dirs, str(tmp_path / "viewer.html"))
    html = open(out).read()
    m = re.search(r"const DATA = (\[.*?\]);\nlet sIdx", html, re.S)
    data = json.loads(m.group(1))
    assert len(data) == 1
    sc = data[0]
    assert [x["label"] for x in sc["methods"]] == ["depthm", "volm"]
    assert sc["methods"][0]["kind"] == "points"
    assert sc["methods"][1]["kind"] == "mesh"
    assert sc["gt"]["kind"] == "mesh"
    # buffers decode to the advertised sizes
    for obj in [sc["gt"]] + sc["methods"]:
        pos = np.frombuffer(base64.b64decode(obj["pos"]), np.float32)
        assert pos.size == obj["n"] * 3 and np.isfinite(pos).all()
        if obj["kind"] == "mesh":
            nrm = np.frombuffer(base64.b64decode(obj["nrm"]), np.float32)
            assert nrm.size == obj["n"] * 3
            # unit normals
            ln = np.linalg.norm(nrm.reshape(-1, 3), axis=1)
            assert np.allclose(ln[ln > 0], 1.0, atol=1e-4)
    assert "fscore: 0.500" in sc["methods"][0]["metrics"]
    # key bindings of the reference visualizer present in the shell
    for key in ("'d'", "'x'", "'v'", "'g'", "'n'", "'j'", "'c'", "'f'"):
        assert key in html


def test_no_results_raises(tmp_path):
    with pytest.raises(ValueError):
        export_viewer([("m", str(tmp_path), "x.ply", "m.json")],
                      [str(tmp_path)], str(tmp_path / "v.html"))
