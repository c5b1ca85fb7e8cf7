"""Checkpoint/resume + failure-recovery tests (SURVEY §5 aux subsystems)."""
import numpy as np
import jax.numpy as jnp

from visma_tpu.filter import FilterConfig, Msckf
from visma_tpu.filter.feed import pack_frames
from visma_tpu.io.synthetic import SyntheticConfig, make_dataset, make_imu, \
    make_trajectory
from visma_tpu.utils.checkpoint import load_state, save_state, latest_step
from visma_tpu.utils.logging import MetricsWriter, check


def test_filter_state_roundtrip(tmp_path):
    cfg = FilterConfig(window=4, max_tracks=16)
    kf = Msckf(cfg)
    s = kf.init()
    save_state(str(tmp_path / "ckpt"), s, step=7)
    assert latest_step(str(tmp_path / "ckpt")) == 7
    s2 = load_state(str(tmp_path / "ckpt"), kf.init())
    np.testing.assert_allclose(np.asarray(s2.P), np.asarray(s.P))
    np.testing.assert_allclose(np.asarray(s2.tracks.ids),
                               np.asarray(s.tracks.ids))


def test_resume_equals_straight_run(tmp_path):
    """Crash-recovery semantics: run 0..N, vs run 0..k, checkpoint,
    'restart', resume k..N — identical trajectories."""
    syn = SyntheticConfig(num_frames=24, num_landmarks=60, seed=6)
    cfg = FilterConfig(window=6, max_tracks=64, max_updates=16,
                       fx=syn.fx, fy=syn.fy, cx=syn.cx, cy=syn.cy)
    ds = make_dataset(syn)
    imu = make_imu(syn)
    frames = {k: jnp.asarray(v) for k, v in
              pack_frames(cfg, ds, imu, max_feats=64).items() if k != "ts"}
    _, gwc = make_trajectory(syn)
    kf = Msckf(cfg)
    s0 = kf.init(R0=gwc[0, :, :3], p0=gwc[0, :, 3], v0=imu["v0"])

    # straight run
    _, outs = kf.run(s0, frames)
    p_full = np.asarray(outs["p"])

    # run half, checkpoint, reload into a FRESH filter, finish
    half = {k: v[:12] for k, v in frames.items()}
    rest = {k: v[12:] for k, v in frames.items()}
    s_half, _ = kf.run(s0, half)
    save_state(str(tmp_path / "ck"), s_half, step=12)

    kf2 = Msckf(cfg)  # "restarted process"
    s_resumed = load_state(str(tmp_path / "ck"), kf2.init())
    _, outs2 = kf2.run(s_resumed, rest)
    p_resumed = np.asarray(outs2["p"])

    np.testing.assert_allclose(p_resumed, p_full[12:], atol=1e-5)


def test_metrics_writer(tmp_path):
    mw = MetricsWriter(str(tmp_path / "m.jsonl"))
    rec = mw.throughput(frames=300, seconds=2.0, chips=1)
    assert rec["frames_per_sec"] == 150.0
    eff = mw.scaling_efficiency(t_base=1.0, t_scaled=1.1, n_base=1,
                                n_scaled=2)
    assert 0.8 < eff < 1.0
    lines = open(tmp_path / "m.jsonl").read().strip().splitlines()
    assert len(lines) == 2


def test_check():
    check(True, "fine")
    try:
        check(False, "boom")
        assert False
    except AssertionError as e:
        assert "boom" in str(e)


def test_heartbeat(tmp_path):
    from visma_tpu.dist.multihost import Heartbeat

    hb = Heartbeat(str(tmp_path / "hb"), interval_s=0.0)
    assert hb.stale(timeout_s=0.1)  # no file yet
    hb.touch(step=3)
    assert not hb.stale(timeout_s=60.0)
    assert open(tmp_path / "hb").read().startswith("3 ")
