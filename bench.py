"""Benchmark: end-to-end MSCKF VIO throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "vio_frames_per_sec_per_chip", "value": N, "unit": "frames/s",
   "vs_baseline": R}

The metric is the flagship pipeline (BASELINE.json: "frames/s/chip" on the
frontend+filter path): full MSCKF frame steps — IMU propagation scan,
clone augmentation, track ingest, triangulation, nullspace-projected
QR-compressed EKF update — over a 240-frame synthetic sequence, run as one
lax.scan on device. The reference publishes no throughput numbers
(BASELINE.md), so vs_baseline normalizes against the VISMA camera's 30
frames/s capture rate: vs_baseline = value / 30 = x-times-real-time.
Accuracy is asserted (ATE gate) so the speed being measured is of a
working filter, not a diverged one.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visma_tpu.filter import FilterConfig, Msckf
    from visma_tpu.filter.feed import pack_frames
    from visma_tpu.io.synthetic import (SyntheticConfig, make_dataset,
                                        make_imu, make_trajectory)

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    syn = SyntheticConfig(num_frames=240, num_landmarks=200, pixel_noise=0.5,
                          seed=7)
    cfg = FilterConfig(window=8, max_tracks=96, max_updates=24,
                       fx=syn.fx, fy=syn.fy, cx=syn.cx, cy=syn.cy,
                       pixel_noise=0.5)
    ds = make_dataset(syn)
    imu = make_imu(syn)
    frames = {k: jnp.asarray(v)
              for k, v in pack_frames(cfg, ds, imu, max_feats=96).items()
              if k != "ts"}
    _, gwc = make_trajectory(syn)

    kf = Msckf(cfg)
    s0 = kf.init(R0=gwc[0, :, :3], p0=gwc[0, :, 3], v0=imu["v0"])

    t0 = time.time()
    final, outs = kf.run(s0, frames)
    outs["p"].block_until_ready()
    log(f"compile+first run: {time.time() - t0:.1f}s")

    ate = float(np.sqrt(np.mean(
        np.sum((np.asarray(outs["p"]) - gwc[:, :, 3]) ** 2, axis=1))))
    log(f"ATE RMSE: {ate * 100:.2f} cm over 240 frames @ 0.5px noise")
    assert ate < 0.10, f"accuracy gate failed: ATE {ate:.3f} m"

    reps = 7
    times = []
    for _ in range(reps):
        t = time.time()
        # materialize to host: block_until_ready through the axon relay can
        # return before the computation truly finishes (CLAUDE.md gotcha)
        np.asarray(kf.run(s0, frames)[1]["p"])
        times.append(time.time() - t)
    # best-of-reps: the chip is in a shared pool; contention only slows
    dt = min(times)
    fps = syn.num_frames / dt
    log(f"per-rep ms/frame: "
        f"{[round(x / syn.num_frames * 1e3, 2) for x in times]}")
    log(f"throughput (best): {fps:.1f} frames/s "
        f"({dt / syn.num_frames * 1e3:.2f} ms/frame)")

    print(json.dumps({
        "metric": "vio_frames_per_sec_per_chip",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
