from vehicle_counting_tpu.data.video import VideoReader, VideoWriter, list_videos
