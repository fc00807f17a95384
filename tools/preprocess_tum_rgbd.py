"""TUM-RGBD → info.json preprocessor CLI (reference
`data_preprocess/preprocess_tum_rgbd.py`): timestamp association + depth
rescale + GT mesh by TSDF fusion of GT depths.

Usage: python tools/preprocess_tum_rgbd.py --dir /data/tum-rgbd
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdvnet.data.preprocess import preprocess_tum_rgbd_scene
from tdvnet.data.scenelists import get_scenes_tum_rgbd


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--overwrite-mesh", action="store_true")
    args = ap.parse_args()
    for scene in get_scenes_tum_rgbd(args.dir):
        print(scene)
        preprocess_tum_rgbd_scene(scene, args.overwrite_mesh)


if __name__ == "__main__":
    main()
