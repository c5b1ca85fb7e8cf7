"""Feature frontend: detection + pyramidal LK tracking + track management.

New capability (the reference consumes precomputed tracklets from the
closed-source Corvis frontend; vlslam.proto:33-36 fixes the interface).
Everything is fixed-capacity and jitted: detection is conv + top-k,
tracking is vmapped inverse-compositional LK over an image pyramid, and
the tracker emits exactly the (ids, xp, valid) triple the MSCKF ingests.
"""

from visma_tpu.frontend.pyramid import build_pyramid
from visma_tpu.frontend.detect import detect_features
from visma_tpu.frontend.klt import track_features
from visma_tpu.frontend.tracker import FeatureTracker, TrackerState

__all__ = ["build_pyramid", "detect_features", "track_features",
           "FeatureTracker", "TrackerState"]
