"""Export an orbax checkpoint dir to a committable single-file .npz.

The reference ships its trained model as a downloadable .ckpt
(`/root/reference/README.md:91`); the .npz form (params/batch_stats only,
fp16 floats) is this repo's equivalent so trained weights survive scratch
wipes and ride in git.

Usage:
  python tools/export_weights.py --ckpt-dir ckpts/r2b/3dvnet_ft \
      --out weights/3dvnet_synth48_ft.npz
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", required=True)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from tdvnet.train import checkpoints as C

    restored = C.restore_params(args.ckpt_dir)
    assert restored is not None, f"no checkpoint in {args.ckpt_dir}"
    variables, ep = restored
    path = C.export_npz(args.out, variables, epoch=ep)
    print(f"epoch {ep} -> {path} "
          f"({os.path.getsize(path) / 1e6:.1f} MB)")


if __name__ == "__main__":
    main()
