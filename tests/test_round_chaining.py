"""Multi-round unveiling chains through instance_workspace checkpoints.

Reference semantics: stage A of round r loads round r−1's unveiled
checkpoint (``1_instance_visualization.py:39-47``) and ``render.py:101-115``
renders the newest unveiled checkpoint — so removing class A in one run and
class B in the next yields a scene with BOTH classes gone.
"""

import os

import numpy as np

from streetunveiler_tpu.config import ModelParams, save_config
from streetunveiler_tpu.scene.readers import make_synthetic_street
from streetunveiler_tpu.scene.scene import Scene
from streetunveiler_tpu.train.checkpoint import latest_unveiled_checkpoint
from streetunveiler_tpu.utils.ply import state_from_ply
from streetunveiler_tpu.utils.semantics import CONCERNED_IND


def _class_count(state, name):
    bit = 1 << CONCERNED_IND[name]
    return int(np.sum(np.array(state.semantic_mask(bit) & state.alive)))


def test_unveil_rounds_chain(tmp_path, monkeypatch):
    mp = str(tmp_path / "model")
    info = make_synthetic_street(n_points=600, n_cameras=4, width=64,
                                 height=48, focal=45.0, seed=3)
    scene = Scene(info, model_path=mp)
    state = scene.create_state(capacity=1024)
    scene.save(state, 30)
    save_config(mp, model=ModelParams(model_path=mp, scene="synthetic"))

    n_veh = _class_count(state, "vehicle")
    n_bld = _class_count(state, "building")
    assert n_veh > 0 and n_bld > 0

    from streetunveiler_tpu.cli import common as cli_common
    from streetunveiler_tpu.cli.unveil import main as unveil_main
    monkeypatch.setattr(
        cli_common, "load_scene_info",
        lambda model, seed=0: make_synthetic_street(
            n_points=600, n_cameras=4, width=64, height=48, focal=45.0,
            seed=3))

    base = ["--model_path", mp, "--all", "--cluster_threshold", "1.5",
            "--min_cluster_size", "10", "--key_stride", "2",
            "--reopt_iterations", "5"]

    # round 1: remove vehicles
    unveil_main(base + ["--semantic_class", "vehicle"])
    ply1 = os.path.join(mp, "instance_workspace_1", "checkpoint",
                        "point_cloud.ply")
    assert os.path.exists(ply1)
    st1 = state_from_ply(ply1, spatial_scale=scene.cameras_extent)
    assert _class_count(st1, "vehicle") < n_veh
    assert _class_count(st1, "building") == n_bld

    # round 2: remove vegetation — must start FROM the round-1 unveiled
    # state (without chaining, vehicles would reappear here)
    unveil_main(base + ["--semantic_class", "building"])
    ply2 = os.path.join(mp, "instance_workspace_2", "checkpoint",
                        "point_cloud.ply")
    assert os.path.exists(ply2)
    st2 = state_from_ply(ply2, spatial_scale=scene.cameras_extent)
    assert _class_count(st2, "vehicle") == _class_count(st1, "vehicle")
    assert _class_count(st2, "building") < n_bld

    # render-side discovery follows the newest round
    assert latest_unveiled_checkpoint(mp) == ply2

    # a checkpoint-less workspace (e.g. --select_only leftovers) is skipped
    os.makedirs(os.path.join(mp, "instance_workspace_7"), exist_ok=True)
    assert latest_unveiled_checkpoint(mp) == ply2


def test_unveil_respects_front_camera_range(tmp_path, monkeypatch):
    """Stages B/C only touch camera_frame_dict's front range (reference
    2_generate_inpainted_mask.py:174, 1_optimization.py:81-92,510): on a
    rig with side cameras, only front frames get inpaint conditions and
    key frames."""
    mp = str(tmp_path / "model")
    info = make_synthetic_street(n_points=600, n_cameras=4, width=64,
                                 height=48, focal=45.0, seed=3)
    # pretend frames 2..3 are side cameras
    info = info._replace(camera_frame_dict={"front_start": 0,
                                            "front_end": 2})
    scene = Scene(info, model_path=mp)
    state = scene.create_state(capacity=1024)
    scene.save(state, 30)
    save_config(mp, model=ModelParams(model_path=mp, scene="synthetic"))

    from streetunveiler_tpu.cli import common as cli_common
    from streetunveiler_tpu.cli.unveil import main as unveil_main
    monkeypatch.setattr(cli_common, "load_scene_info",
                        lambda model, seed=0: info)

    unveil_main(["--model_path", mp, "--all", "--cluster_threshold", "1.5",
                 "--min_cluster_size", "10", "--key_stride", "2",
                 "--reopt_iterations", "3", "--semantic_class", "vehicle"])
    ws = os.path.join(mp, "instance_workspace_1")
    conds = sorted(f for f in os.listdir(os.path.join(ws, "mask_inpaint"))
                   if f.endswith(".png"))
    assert conds == ["00000.png", "00001.png"]
