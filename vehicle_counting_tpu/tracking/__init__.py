from vehicle_counting_tpu.tracking.tracker import (
    TrackerParams,
    TrackerState,
    TrackerOutputs,
    init_state,
    tracker_step,
)
from vehicle_counting_tpu.tracking.deepsort import (
    DeepSortParams,
    init_states,
    deepsort_frame,
)
from vehicle_counting_tpu.tracking.assignment import solve_assignment
