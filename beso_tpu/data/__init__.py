from beso_tpu.data.trajectories import (
    TrajectoryData,
    get_split_idx,
    load_multimodal_push,
    load_relay_kitchen,
    split_trajectories,
    synthetic_kitchen_data,
    synthetic_push_data,
)
from beso_tpu.data.slicer import SlicedDataset, make_slices
from beso_tpu.data.transforms import blockpush_mask_targets
