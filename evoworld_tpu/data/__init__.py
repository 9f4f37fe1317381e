from evoworld_tpu.data.dataset import EpisodeDataset, load_camera_poses

__all__ = ["EpisodeDataset", "load_camera_poses"]
