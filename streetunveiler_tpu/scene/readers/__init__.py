"""Dataset readers → SceneInfo (reference ``scene/dataset_readers/``).

Every reader returns the same SceneInfo contract as the reference
(``scene/dataset_readers/basic_utils.py:31-38``): an init point cloud (with
per-point color + semantics), a reference cloud, train/test camera infos,
the NeRF++-style normalization (translate + radius), and artifact paths.
"""

from .basic import CameraInfo, SceneInfo, nerf_normalization
from .blender import read_blender_info
from .colmap import read_colmap_scene
from .kitti import read_kitti_info
from .nuscenes import read_nuscenes_info
from .pandaset import read_pandaset_info
from .synthetic import make_synthetic_street
from .waymo import read_waymo_info

# the reference dispatches on sentinel files (scene/__init__.py:41-67);
# here the kind is explicit configuration
SCENE_READERS = {
    "colmap": read_colmap_scene,
    "synthetic": make_synthetic_street,
    "blender": read_blender_info,
    "waymo": read_waymo_info,
    "kitti": read_kitti_info,
    "pandaset": read_pandaset_info,
    "nuscenes": read_nuscenes_info,
}
