"""MSCKF visual-inertial filter (the engine the VISMA data model presumes).

The reference repo consumes the output of UCLA's closed-source "Corvis"
VIO (per-frame gwc poses + feature tracks with status lifecycle,
vlslam.proto:10-36); this package implements that engine TPU-first:

* error-state MSCKF with a sliding window of camera pose clones;
* fixed-capacity masked feature table following the proto's status machine
  (EMPTY/INITIALIZING/READY/INSTATE/GOODDROP/REJECT);
* the whole per-frame step (IMU propagation scan + clone + triangulate +
  nullspace-projected update) is one jitted function; full sequences run
  under lax.scan.
"""

from visma_tpu.filter.config import FilterConfig
from visma_tpu.filter.state import FilterState, TrackTable, init_state
from visma_tpu.filter.msckf import Msckf

__all__ = ["FilterConfig", "FilterState", "TrackTable", "init_state", "Msckf"]
