from .colormap import depth_to_inferno, save_depth
from .profiling import DeviceProfile, profile_fn

__all__ = ["depth_to_inferno", "save_depth", "DeviceProfile", "profile_fn"]
