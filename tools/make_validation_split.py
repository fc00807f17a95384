"""Sample a validation split from the ScanNet train scenes (reference
`mv3d/dsets/make_validation_split.py`): 100 random scenes into
`tdvnet/data/scannet_splits/val_split1.txt`; refuses to overwrite.
"""
import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scannet-dir", required=True)
    ap.add_argument("--n", type=int, default=100)
    ap.add_argument("--name", default="val_split1")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    from tdvnet.data.scenelists import get_scenes_scannet

    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "tdvnet", "data", "scannet_splits")
    os.makedirs(out_dir, exist_ok=True)
    out = os.path.join(out_dir, f"{args.name}.txt")
    if os.path.exists(out):
        raise FileExistsError(f"{out} exists; refusing to overwrite")
    scenes = get_scenes_scannet(args.scannet_dir, "train")
    rng = np.random.default_rng(args.seed)
    pick = rng.choice(len(scenes), size=args.n, replace=False)
    with open(out, "w") as f:
        for i in sorted(pick):
            f.write(os.path.basename(scenes[i]) + "\n")
    print("wrote", out)


if __name__ == "__main__":
    main()
