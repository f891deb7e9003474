"""Every shipped YAML config must parse into its app's config tree (CLI > YAML > defaults
path — reference apps ship equivalent yamls and tyro parses them; a typo'd key here would
break the documented `--config <file>` entry point)."""

import glob
import os
import sys

import pytest

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), "..", ".."))
sys.path.insert(0, REPO)

from wisp_tpu.config import parse_config  # noqa: E402


def _app_config(app: str):
    if app == "nerf":
        from app.nerf.main_nerf import NeRFAppConfig
        return NeRFAppConfig
    if app == "nglod":
        from app.nglod.main_nglod import NGLODAppConfig
        return NGLODAppConfig
    from app.image.main_image import ImageAppConfig
    return ImageAppConfig


ALL_YAMLS = sorted(glob.glob(os.path.join(REPO, "app", "*", "configs", "*.yaml")))


@pytest.mark.parametrize("yaml_path", ALL_YAMLS, ids=[os.path.basename(p) for p in ALL_YAMLS])
def test_yaml_parses(yaml_path):
    assert ALL_YAMLS, "no yaml configs found"
    app = yaml_path.split(os.sep)[-3]
    cfg_cls = _app_config(app)
    cfg = parse_config(cfg_cls, args=["--config", yaml_path])
    # every yaml must pick a grid/dataset constructor without error and keep trainer section
    assert cfg.trainer is not None
    if app in ("nerf", "nglod"):
        assert cfg.grid is not None


def test_yaml_cli_override_wins():
    """CLI flags override YAML values (the documented priority order)."""
    yaml_path = os.path.join(REPO, "app", "nerf", "configs", "nerf_hash.yaml")
    from app.nerf.main_nerf import NeRFAppConfig
    base = parse_config(NeRFAppConfig, args=["--config", yaml_path])
    over = parse_config(NeRFAppConfig, args=["--config", yaml_path,
                                             "--trainer.max-epochs", "3"])
    assert over.trainer.max_epochs == 3
    assert base.trainer.max_epochs != 3
