"""Dataset readers → SceneInfo (reference ``scene/dataset_readers/``).

Every reader returns the same SceneInfo contract as the reference
(``scene/dataset_readers/basic_utils.py:31-38``): an init point cloud (with
per-point color + semantics), a reference cloud, train/test camera infos,
the NeRF++-style normalization (translate + radius), and artifact paths.
"""

from .basic import CameraInfo, SceneInfo, nerf_normalization
from .colmap import read_colmap_scene
from .synthetic import make_synthetic_street

SCENE_READERS = {
    "colmap": read_colmap_scene,
    "synthetic": make_synthetic_street,
}
