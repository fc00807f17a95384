"""Does the axon tunnel overlap host<->device transfers with device compute?

The pipelined eval driver (`tdvnet/eval/fused_scene.py:predict_scenes`)
issues scene i+1's upload while scene i computes and fetches scene i's
result under scene i+1's compute.  Whether that actually hides transfer
time depends on the tunnel: a serial RPC channel would make
wall = compute + upload + download regardless of issue order, and the
only remaining lever is fewer bytes.

Method: one big-matmul chain as the compute token (~150 ms device time),
a ~12 MB uint8 upload (the eval driver's per-scene image stack size), a
~8 MB download (the uint16 depth result size).  Measures:

  T_c     compute alone          (dispatch -> fetch 1 elem)
  T_u     upload alone           (jit arg -> add 0 -> fetch 1 elem)
  T_d     download alone         (device-resident -> np.asarray)
  T_cu    dispatch compute, then immediately upload, sync both
  T_cd    dispatch compute, then immediately download other array
  overlap_up   = (T_c + T_u - T_cu) / min(T_c, T_u)   (1 = full overlap)
  overlap_down = (T_c + T_d - T_cd) / min(T_c, T_d)

Run on an otherwise-idle chip:  python tools/probe_tunnel_overlap.py
"""
from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

N = 4096
K_CHAIN = 24
UP_MB = 12
DOWN_MB = 8
REPS = 3


def sync(x):
    np.asarray(jax.device_get(x.ravel()[:1]))


@jax.jit
def chain(a):
    def body(x, _):
        return jnp.tanh(x @ a), None
    x, _ = jax.lax.scan(body, a, None, length=K_CHAIN)
    return x


@jax.jit
def touch(u):
    return u.ravel()[:1].astype(jnp.float32) + 0.0


def main():
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((N, N), np.float32).astype(np.float32))
    up_host = np.zeros((UP_MB << 20,), np.uint8)
    down_dev = jnp.zeros((DOWN_MB << 19,), jnp.uint16)  # 2 B each
    sync(chain(a)); sync(touch(jnp.asarray(up_host))); sync(down_dev)

    def t_compute():
        t0 = time.perf_counter(); sync(chain(a))
        return time.perf_counter() - t0

    def t_upload():
        t0 = time.perf_counter(); sync(touch(jnp.asarray(up_host)))
        return time.perf_counter() - t0

    def t_download():
        t0 = time.perf_counter(); np.asarray(down_dev)
        return time.perf_counter() - t0

    def t_comp_up():
        t0 = time.perf_counter()
        y = chain(a)                       # async dispatch
        u = touch(jnp.asarray(up_host))    # upload while compute runs?
        sync(u); sync(y)
        return time.perf_counter() - t0

    def t_comp_down():
        t0 = time.perf_counter()
        y = chain(a)
        _ = np.asarray(down_dev)           # download while compute runs?
        sync(y)
        return time.perf_counter() - t0

    res = {}
    for name, fn in [("T_c", t_compute), ("T_u", t_upload),
                     ("T_d", t_download), ("T_cu", t_comp_up),
                     ("T_cd", t_comp_down)]:
        res[name] = min(fn() for _ in range(REPS))
        print(f"{name:5s} {res[name]*1e3:8.1f} ms")

    ov_u = (res["T_c"] + res["T_u"] - res["T_cu"]) / min(res["T_c"],
                                                         res["T_u"])
    ov_d = (res["T_c"] + res["T_d"] - res["T_cd"]) / min(res["T_c"],
                                                         res["T_d"])
    print(f"upload   overlap fraction: {ov_u:+.2f}  (1 = fully hidden)")
    print(f"download overlap fraction: {ov_d:+.2f}")
    print(f"upload BW {UP_MB / res['T_u']:.1f} MB/s, "
          f"download BW {DOWN_MB / res['T_d']:.1f} MB/s")


if __name__ == "__main__":
    main()
