"""MSCKF visual-inertial filter (the engine the VISMA data model presumes).

The reference repo consumes the output of UCLA's closed-source "Corvis"
VIO (per-frame gwc poses + feature tracks with status lifecycle,
vlslam.proto:10-36); this package implements that engine TPU-first:

* error-state MSCKF with a sliding window of camera pose clones;
* fixed-capacity masked feature table following the proto's FULL status
  machine (vlslam.proto:11-19): EMPTY (free slot) -> INITIALIZING (1 obs)
  -> READY (2 obs) -> INSTATE (mature / promoted SLAM landmark);
  consumed-but-continuing tracks export KEEP for the frame their window
  history is compressed to the newest observation; chi2-gated outlier
  candidates export REJECT for the frame they fail (then restart or
  expire); lost/retired tracks export GOODDROP. GrabPointCloud-style
  consumers filtering INSTATE|GOODDROP (dataloader.cpp:136-164) therefore
  see exactly the tracks whose world points the filter absorbed;
* the whole per-frame step (IMU propagation scan + clone + triangulate +
  nullspace-projected update) is one jitted function; full sequences run
  under lax.scan.
"""

from visma_tpu.filter.config import FilterConfig
from visma_tpu.filter.state import FilterState, TrackTable, init_state
from visma_tpu.filter.msckf import Msckf

__all__ = ["FilterConfig", "FilterState", "TrackTable", "init_state", "Msckf"]
