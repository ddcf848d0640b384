from vehicle_counting_tpu.utils.colors import color_list, color_for_track
from vehicle_counting_tpu.utils.seed import seed_everything
