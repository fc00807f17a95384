"""ICL-NUIM → info.json preprocessor CLI (reference
`data_preprocess/preprocess_icl_nuim.py`): poses + depth rescale + GT mesh
by TSDF fusion of GT depths.

Usage: python tools/preprocess_icl_nuim.py --dir /data/icl-nuim
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdvnet.data.preprocess import preprocess_icl_nuim_scene
from tdvnet.data.scenelists import get_scenes_icl_nuim


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--dir", required=True)
    ap.add_argument("--overwrite-mesh", action="store_true")
    args = ap.parse_args()
    for scene in get_scenes_icl_nuim(args.dir):
        print(scene)
        preprocess_icl_nuim_scene(scene, args.overwrite_mesh)


if __name__ == "__main__":
    main()
