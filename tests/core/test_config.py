"""Tests for the typed config/CLI system (counterpart of reference wisp/config tests strategy)."""

import dataclasses
from typing import Tuple, Union

import pytest

from wisp_tpu.config import (
    autoconfig, configure, instantiate, parse_config, print_config,
    write_config_to_yaml, get_config_target, ConfigAdam,
)


class Grid:
    def __init__(self, feature_dim: int = 2, num_lods: int = 16, multiscale_type: str = "cat"):
        self.feature_dim = feature_dim
        self.num_lods = num_lods
        self.multiscale_type = multiscale_type

    @classmethod
    def from_geometric(cls, feature_dim: int = 2, num_lods: int = 16,
                       min_grid_res: int = 16, max_grid_res: int = 2048) -> "Grid":
        g = cls(feature_dim, num_lods)
        g.min_grid_res = min_grid_res
        g.max_grid_res = max_grid_res
        return g


class Decoder:
    def __init__(self, hidden_dim: int = 64, num_layers: int = 1):
        self.hidden_dim = hidden_dim
        self.num_layers = num_layers


GridConfig = autoconfig(Grid, Grid.from_geometric)
DecoderConfig = autoconfig(Decoder)


@dataclasses.dataclass
class AppConfig:
    grid: GridConfig = None
    decoder: DecoderConfig = None
    lr: float = 1e-3
    epochs: int = 10


def test_autoconfig_single():
    cfg = DecoderConfig()
    assert cfg.hidden_dim == 64
    d = instantiate(cfg, hidden_dim=128)
    assert d.hidden_dim == 128 and d.num_layers == 1


def test_autoconfig_classmethod_ctor():
    variants = GridConfig.__args__
    assert len(variants) == 2
    cfg = variants[1](feature_dim=4, num_lods=8, min_grid_res=32, max_grid_res=512)
    g = instantiate(cfg)
    assert g.feature_dim == 4 and g.min_grid_res == 32


def test_instantiate_drops_excess_kwargs():
    cfg = DecoderConfig(hidden_dim=32, num_layers=2)
    d = instantiate(cfg, bogus_arg=123)  # silently dropped (reference utils.py:321-377)
    assert d.hidden_dim == 32


def test_parse_defaults_and_cli():
    cfg = parse_config(AppConfig, args=["--lr", "0.01", "--decoder.hidden-dim", "128"])
    assert cfg.lr == 0.01
    assert cfg.decoder.hidden_dim == 128
    assert cfg.epochs == 10


def test_parse_union_selection_cli():
    cfg = parse_config(AppConfig, args=[
        "--grid.constructor", "Grid.from-geometric", "--grid.max_grid_res", "1024"])
    g = instantiate(cfg.grid)
    assert g.max_grid_res == 1024


def test_parse_yaml_and_cli_priority(tmp_path):
    yml = tmp_path / "cfg.yaml"
    yml.write_text(
        "lr: 0.5\n"
        "epochs: 3\n"
        "grid:\n"
        "  constructor: 'Grid.from_geometric'\n"
        "  num_lods: 4\n"
        "decoder:\n"
        "  hidden_dim: 256\n"
    )
    cfg = parse_config(AppConfig, args=["--config", str(yml), "--lr", "0.125"])
    assert cfg.lr == 0.125        # CLI wins
    assert cfg.epochs == 3        # YAML wins over default
    assert cfg.decoder.hidden_dim == 256
    assert cfg.grid.num_lods == 4
    assert "from_geometric" in get_config_target(cfg.grid).__name__ or \
        get_config_target(cfg.grid).__func__.__name__ == "from_geometric"


def test_yaml_roundtrip(tmp_path):
    cfg = parse_config(AppConfig, args=["--lr", "0.25"])
    path = tmp_path / "out.yaml"
    write_config_to_yaml(cfg, str(path))
    cfg2 = parse_config(AppConfig, args=["--config", str(path)])
    assert cfg2.lr == 0.25


def test_optimizer_preset():
    opt = instantiate(ConfigAdam(lr=1e-2, eps=1e-15))
    assert hasattr(opt, "init") and hasattr(opt, "update")


def test_print_config(capsys):
    print_config(parse_config(AppConfig, args=[]))
    out = capsys.readouterr().out
    assert "lr" in out and "decoder" in out


def test_bool_coercion():
    @dataclasses.dataclass
    class C:
        flag: bool = False

    assert parse_config(C, args=["--flag", "True"]).flag is True
    assert parse_config(C, args=["--flag", "false"]).flag is False
