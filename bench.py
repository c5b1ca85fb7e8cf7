"""Benchmark: end-to-end VIO pipeline throughput on one TPU chip.

Prints ONE JSON line:
  {"metric": "pipeline_frames_per_sec_per_chip_500x960", "value": N,
   "unit": "frames/s", "vs_baseline": R}

The metric is the FLAGSHIP pipeline at VISMA image geometry — synthetic
500x960 images + IMU -> trajectory through VioPipeline.run: image pyramid,
pyramidal KLT tracking, corner detection/replenishment, IMU propagation
scan, clone augmentation, track ingest, triangulation, nullspace-projected
QR-compressed EKF update — the whole frontend+filter scope BASELINE.json
defines (VERDICT r1 item 1; the r1 bench measured the filter only on
pre-packed feature tracks). Image geometry matches the reference's
undistorted output (500x960, example/undistort_images.cpp:22-28) with the
generate_depthmaps intrinsics (fx=486.405 fy=535.401 cx=469.199
cy=257.916, example/generate_depthmaps.cpp:9-17).

The reference publishes no throughput numbers (BASELINE.md), so
vs_baseline normalizes against the VISMA camera's 30 frames/s capture
rate: vs_baseline = value / 30 = x-times-real-time. Accuracy is asserted
(ATE gate) so the speed being measured is of a working pipeline, not a
diverged one. A secondary filter-only number (the r1 headline scope) is
logged to stderr for continuity.
"""
import json
import os
import sys
import time

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                      os.path.join(os.path.dirname(__file__), ".jax_cache"))

N_FRAMES = 240


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def bench_pipeline():
    """Full images+IMU pipeline at VISMA geometry. Returns (fps, ate_m)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    from visma_tpu.filter import FilterConfig
    from visma_tpu.filter.msckf import check_health
    from visma_tpu.io.synthetic import SyntheticConfig, make_imu
    from visma_tpu.io.synthetic_images import render_blob_frames
    from visma_tpu.pipeline import VioPipeline

    syn = SyntheticConfig(num_frames=N_FRAMES, num_landmarks=240,
                          rows=500, cols=960,
                          fx=486.405, fy=535.401, cx=469.199, cy=257.916,
                          seed=7)
    cfg = FilterConfig(window=8, max_tracks=96, max_updates=24,
                       fx=syn.fx, fy=syn.fy, cx=syn.cx, cy=syn.cy,
                       pixel_noise=1.0)

    t0 = time.time()
    frames, gwc, X = render_blob_frames(syn)
    imu = make_imu(syn)
    spf = imu["samples_per_frame"]
    dt = float(np.diff(imu["ts_state"])[0])
    log(f"synthesized {N_FRAMES} frames at 500x960 in "
        f"{time.time() - t0:.1f}s")

    N = syn.num_frames - 1
    gyro = imu["gyro"][: N * spf].reshape(N, spf, 3)
    accel = imu["accel"][: N * spf].reshape(N, spf, 3)
    dts = np.full((N, spf), dt, np.float32)

    pipe = VioPipeline(cfg, levels=4, cell=32)
    st0 = pipe.init(jnp.asarray(frames[0]), R0=gwc[0, :, :3],
                    p0=gwc[0, :, 3], v0=imu["v0"])

    # stage on device BEFORE timing (H2D through the relay is ~1 GB/s)
    d_images = jnp.asarray(frames[1:])
    d_gyro = jnp.asarray(gyro)
    d_accel = jnp.asarray(accel)
    d_dts = jnp.asarray(dts)
    jax.block_until_ready((d_images, d_gyro, d_accel, d_dts))

    t0 = time.time()
    final, outs = pipe.run(st0, d_images, d_gyro, d_accel, d_dts)
    p_est = np.asarray(outs["p"])
    log(f"pipeline compile+first run: {time.time() - t0:.1f}s")
    check_health(outs)

    ate = float(np.sqrt(np.mean(
        np.sum((p_est - gwc[1:, :, 3]) ** 2, axis=1))))
    log(f"pipeline ATE RMSE: {ate * 100:.2f} cm over {N} frames @ 500x960")
    assert ate < 0.10, f"accuracy gate failed: pipeline ATE {ate:.3f} m"

    reps = 5
    times = []
    for _ in range(reps):
        t = time.time()
        # materialize to host: block_until_ready through the axon relay
        # can return before the computation truly finishes (CLAUDE.md)
        np.asarray(pipe.run(st0, d_images, d_gyro, d_accel, d_dts)[1]["p"])
        times.append(time.time() - t)
    dt_best = min(times)  # best-of: the chip is in a shared pool
    fps = N / dt_best
    log(f"pipeline per-rep ms/frame: "
        f"{[round(x / N * 1e3, 2) for x in times]}")
    log(f"pipeline throughput (best): {fps:.1f} frames/s "
        f"({dt_best / N * 1e3:.2f} ms/frame)")
    return fps, ate


def bench_filter_only():
    """Secondary: the r1 headline scope (pre-packed feature tracks ->
    Msckf.run). Returns (fps, ate_m)."""
    import jax.numpy as jnp
    import numpy as np

    from visma_tpu.filter import FilterConfig, Msckf
    from visma_tpu.filter.feed import pack_frames
    from visma_tpu.io.synthetic import (SyntheticConfig, make_dataset,
                                        make_imu, make_trajectory)

    syn = SyntheticConfig(num_frames=N_FRAMES, num_landmarks=200,
                          pixel_noise=0.5, seed=7)
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
    _, outs = kf.run(s0, frames)
    outs["p"].block_until_ready()
    log(f"filter compile+first run: {time.time() - t0:.1f}s")

    ate = float(np.sqrt(np.mean(
        np.sum((np.asarray(outs["p"]) - gwc[:, :, 3]) ** 2, axis=1))))
    assert ate < 0.10, f"accuracy gate failed: filter ATE {ate:.3f} m"

    times = []
    for _ in range(5):
        t = time.time()
        np.asarray(kf.run(s0, frames)[1]["p"])
        times.append(time.time() - t)
    fps = syn.num_frames / min(times)
    log(f"filter-only ATE {ate * 100:.2f} cm, throughput {fps:.1f} "
        f"frames/s (secondary metric; r1 headline scope)")
    return fps, ate


def main():
    import jax

    log(f"backend: {jax.default_backend()} devices: {jax.devices()}")

    fps, ate = bench_pipeline()
    try:
        bench_filter_only()
    except Exception as e:  # secondary metric must not fail the bench
        log(f"filter-only secondary bench failed: {e}")

    print(json.dumps({
        "metric": "pipeline_frames_per_sec_per_chip_500x960",
        "value": round(fps, 1),
        "unit": "frames/s",
        "vs_baseline": round(fps / 30.0, 2),
    }))


if __name__ == "__main__":
    main()
