"""Stall-tolerant training supervisor for the remote-TPU tunnel.

The axon tunnel occasionally drops an RPC mid-run, leaving the training
process parked on a futex forever (observed: checkpoint cadence ~60-110 s,
then silence with 0% CPU).  This supervisor runs the training CLI as a
direct child, watches the checkpoint directory's progress, and on stall
(no new epoch checkpoint within --stall-sec) kills THAT child by its exact
pid and relaunches with --resume.  Exits when the target epoch exists, the
run finishes on its own, or the restart budget is exhausted.

Usage:
  python tools/train_supervisor.py --target-epoch 150 \
      --stall-sec 720 --max-restarts 8 -- \
      python tools/train_3dvnet.py --synthetic 48 --epochs 150 --bf16 \
      --remat --grad-accum 2 --ckpt-dir ckpts/r3 --log-dir runs/r3 --resume
"""
from __future__ import annotations

import argparse
import os
import re
import signal
import subprocess
import sys
import time


def latest_epoch(ckpt_dir: str) -> int:
    try:
        eps = [int(m.group(1)) for d in os.listdir(ckpt_dir)
               if (m := re.fullmatch(r"epoch_(\d+)", d))]
    except FileNotFoundError:
        return -1
    return max(eps, default=-1)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpt-dir", default=None,
                    help="defaults to the value after --ckpt-dir in the "
                         "child command")
    ap.add_argument("--target-epoch", type=int, required=True)
    ap.add_argument("--stall-sec", type=float, default=720.0)
    ap.add_argument("--first-stall-sec", type=float, default=1800.0,
                    help="stall window before the FIRST new checkpoint of "
                         "a launch: a cold resume spends ~10-15 min in "
                         "remote compiles at 0%% CPU, indistinguishable "
                         "from a stall")
    ap.add_argument("--poll-sec", type=float, default=30.0)
    ap.add_argument("--max-restarts", type=int, default=8)
    ap.add_argument("cmd", nargs=argparse.REMAINDER,
                    help="-- <training command>")
    args = ap.parse_args()
    cmd = args.cmd[1:] if args.cmd and args.cmd[0] == "--" else args.cmd
    assert cmd, "no training command given"
    ckpt_dir = args.ckpt_dir
    if ckpt_dir is None:
        ckpt_dir = cmd[cmd.index("--ckpt-dir") + 1]

    restarts = 0
    while True:
        ep0 = latest_epoch(ckpt_dir)
        print(f"[supervisor] launching (latest epoch {ep0}): "
              f"{' '.join(cmd)}", flush=True)
        child = subprocess.Popen(cmd)
        last_progress = time.time()
        last_ep = ep0
        while True:
            time.sleep(args.poll_sec)
            rc = child.poll()
            ep = latest_epoch(ckpt_dir)
            if ep > last_ep:
                last_ep, last_progress = ep, time.time()
            if rc is not None:
                print(f"[supervisor] child exited rc={rc} at epoch {ep}",
                      flush=True)
                if ep >= args.target_epoch or rc == 0:
                    return
                break                       # crashed: restart
            if ep >= args.target_epoch:
                print(f"[supervisor] target epoch {ep} reached; "
                      "stopping child", flush=True)
                child.send_signal(signal.SIGTERM)
                try:
                    child.wait(timeout=60)
                except subprocess.TimeoutExpired:
                    child.kill()
                return
            window = (args.stall_sec if last_ep > ep0
                      else args.first_stall_sec)
            if time.time() - last_progress > window:
                print(f"[supervisor] STALL: no new checkpoint for "
                      f"{window:.0f}s (latest epoch {ep}); "
                      f"killing pid {child.pid}", flush=True)
                child.kill()                 # exact child pid only
                child.wait()
                break
        restarts += 1
        if restarts > args.max_restarts:
            print("[supervisor] restart budget exhausted", flush=True)
            sys.exit(1)
        time.sleep(5)


if __name__ == "__main__":
    main()
