"""ScanNet → info.json preprocessor CLI (reference
`data_preprocess/preprocess_scannet.py`).

Usage: python tools/preprocess_scannet.py --src /raw/scans --dst /data/scans
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdvnet.data.preprocess import preprocess_scannet_scene


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", required=True)
    ap.add_argument("--dst", required=True)
    args = ap.parse_args()
    scenes = sorted(d for d in os.listdir(args.src)
                    if os.path.isdir(os.path.join(args.src, d)))
    for i, s in enumerate(scenes):
        print(f"{i + 1}/{len(scenes)}: {s}")
        preprocess_scannet_scene(os.path.join(args.src, s),
                                 os.path.join(args.dst, s))


if __name__ == "__main__":
    main()
