"""Cross-stage pipeline parallelism (dist/pipeline_pp.py): the two-device
frontend/filter split must be numerically identical to the single-device
VioPipeline and place each stage's state on its own device."""
import numpy as np
import jax
import jax.numpy as jnp

from visma_tpu.filter import FilterConfig
from visma_tpu.io.synthetic import SyntheticConfig, make_imu
from visma_tpu.io.synthetic_images import render_blob_frames
from visma_tpu.pipeline import VioPipeline


def make_scene(n_frames=13):
    syn = SyntheticConfig(num_frames=n_frames, num_landmarks=80, rows=128,
                          cols=160, fx=120.0, fy=120.0, cx=80.0, cy=64.0,
                          seed=13)
    cfg = FilterConfig(window=6, max_tracks=32, max_updates=8,
                       fx=syn.fx, fy=syn.fy, cx=syn.cx, cy=syn.cy,
                       pixel_noise=1.0)
    frames, gwc, X = render_blob_frames(syn)
    imu = make_imu(syn)
    spf = imu["samples_per_frame"]
    dt = float(np.diff(imu["ts_state"])[0])
    N = syn.num_frames - 1
    gyro = np.stack([imu["gyro"][i * spf:(i + 1) * spf] for i in range(N)])
    accel = np.stack([imu["accel"][i * spf:(i + 1) * spf] for i in range(N)])
    dts = np.full((N, spf), dt, np.float32)
    return cfg, frames, gwc, imu, gyro, accel, dts


class TestTwoStagePipeline:
    def test_matches_single_device(self):
        from visma_tpu.dist.pipeline_pp import TwoStagePipeline

        cfg, frames, gwc, imu, gyro, accel, dts = make_scene()
        devs = jax.devices()
        assert len(devs) >= 2

        # single-device reference
        pipe = VioPipeline(cfg, levels=2, cell=20)
        st0 = pipe.init(jnp.asarray(frames[0]), R0=gwc[0, :, :3],
                        p0=gwc[0, :, 3], v0=imu["v0"])
        _, ref = pipe.run(st0, jnp.asarray(frames[1:]), jnp.asarray(gyro),
                          jnp.asarray(accel), jnp.asarray(dts))

        # two-stage split with a chunk size that does NOT divide N
        pp = TwoStagePipeline(cfg, devs[0], devs[1], levels=2, cell=20,
                              chunk=5)
        tr0, fs0 = pp.init(frames[0], R0=gwc[0, :, :3], p0=gwc[0, :, 3],
                           v0=imu["v0"])
        tr1, fs1, out = pp.run(tr0, fs0, frames[1:], gyro, accel, dts)

        np.testing.assert_allclose(np.asarray(out["p"]),
                                   np.asarray(ref["p"]), atol=1e-5)
        np.testing.assert_allclose(np.asarray(out["R"]),
                                   np.asarray(ref["R"]), atol=1e-5)
        assert np.asarray(out["healthy"]).all()

    def test_stage_placement(self):
        from visma_tpu.dist.pipeline_pp import TwoStagePipeline

        cfg, frames, gwc, imu, gyro, accel, dts = make_scene(7)
        devs = jax.devices()
        pp = TwoStagePipeline(cfg, devs[0], devs[1], levels=2, cell=20,
                              chunk=3)
        tr0, fs0 = pp.init(frames[0], v0=imu["v0"])
        tr1, fs1, out = pp.run(tr0, fs0, frames[1:], gyro, accel, dts)
        # tracker state lives on stage A's device, filter state on B's
        assert list(tr1.pos.devices()) == [devs[0]]
        assert list(fs1.p.devices()) == [devs[1]]
        assert out["p"].shape == (6, 3)
