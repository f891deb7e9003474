"""Typed dataclass config / CLI system.

Self-contained counterpart of the reference config layer (wisp/config/utils.py:86-487), which
builds on hydra-zen + tyro. Neither is available here, so this module implements the same UX
directly over ``dataclasses`` + ``argparse`` + ``yaml``:

* ``autoconfig(*ctors)`` — inspect classes' ``__init__`` (and classmethod constructors returning
  the owning type, e.g. ``HashGrid.from_geometric``) and generate typed config dataclasses;
  multiple ctors produce a union selectable by constructor name (reference utils.py:86-197).
* ``@configure(target=...)`` — decorate a hand-written config dataclass with a build target
  (reference utils.py:200-318).
* ``instantiate(cfg, **overrides)`` — build the target, completing missing args from overrides
  and silently dropping excess kwargs the target doesn't accept (reference utils.py:321-377).
* ``parse_config(ConfigClass)`` — merge CLI > YAML > defaults into a config tree
  (reference utils.py:380-432). CLI flags address nested fields as ``--section.field value``;
  union variants are chosen with ``--section.constructor ClassName.ctor`` or YAML
  ``constructor:`` keys (reference YAML schema, app/nerf/configs/nerf_hash.yaml:20-21).
* ``print_config`` / ``write_config_to_yaml`` / ``get_config_target``.
"""

from __future__ import annotations

import argparse
import dataclasses
import inspect
import sys
import types
import typing
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple, Union

import yaml

_TARGET_ATTR = "__wisp_target__"
_CTOR_ATTR = "__wisp_ctor_name__"
_UNION_ATTR = "__wisp_union__"

_PRIMITIVES = (int, float, bool, str)


# ---------------------------------------------------------------------------------------------
# Config generation
# ---------------------------------------------------------------------------------------------

def _resolve_ctor(ctor) -> Tuple[Callable, str, Callable]:
    """Returns (callable_to_invoke, display_name, signature_fn)."""
    if inspect.isclass(ctor):
        return ctor, ctor.__name__, ctor.__init__
    if inspect.ismethod(ctor):  # bound classmethod like HashGrid.from_geometric
        owner = ctor.__self__
        name = f"{owner.__name__}.{ctor.__name__}"
        return ctor, name, ctor
    if inspect.isfunction(ctor):
        return ctor, ctor.__qualname__, ctor
    raise TypeError(f"autoconfig: unsupported constructor {ctor!r}")


def _field_spec(param: inspect.Parameter):
    ann = param.annotation
    if ann is inspect.Parameter.empty:
        ann = Any if param.default is inspect.Parameter.empty else type(param.default)
        if ann is type(None):
            ann = Any
    if param.default is inspect.Parameter.empty:
        return ann, dataclasses.field(default=None)
    default = param.default
    if isinstance(default, (list, dict, set)) or (
        default is not None and not isinstance(default, (*_PRIMITIVES, tuple, type(None)))
        and not isinstance(default, type)
    ):
        return ann, dataclasses.field(default_factory=lambda d=default: d)
    return ann, dataclasses.field(default=default)


_SKIP_PARAM_TYPES = ("blas", "grid", "nef", "tracer", "pipeline", "dataset", "transform",
                     "accelstruct", "device", "rng", "key")


def autoconfig(*ctors, exclude: Sequence[str] = ()):
    """Generate config dataclass(es) from constructor signatures.

    Single ctor → one dataclass type. Multiple ctors → a ``Union`` of dataclasses, each
    carrying its ctor name, selectable by the ``constructor`` pseudo-field.
    Params whose names suggest runtime objects (blas/grid/nef/...) or that appear in
    ``exclude`` are omitted — they get wired in code via ``instantiate`` overrides
    (mirrors the reference behavior of excluding unannotated module params).
    """
    configs = []
    for ctor in ctors:
        target, name, sig_fn = _resolve_ctor(ctor)
        try:
            sig = inspect.signature(sig_fn)
        except (TypeError, ValueError):
            sig = inspect.Signature()
        try:
            hints = typing.get_type_hints(sig_fn)
        except Exception:  # noqa: BLE001 - unresolvable forward refs
            hints = {}
        fields = []
        for pname, param in sig.parameters.items():
            if pname in ("self", "cls", "args", "kwargs") or pname in exclude:
                continue
            if param.kind in (inspect.Parameter.VAR_POSITIONAL, inspect.Parameter.VAR_KEYWORD):
                continue
            if pname in _SKIP_PARAM_TYPES:
                continue
            if pname in hints:  # resolve string annotations (from __future__ annotations)
                param = param.replace(annotation=hints[pname])
            ann, fld = _field_spec(param)
            if not _is_cli_type(ann):
                continue
            fields.append((pname, ann, fld))
        cls_name = "Config" + name.replace(".", "_")
        cfg_cls = dataclasses.make_dataclass(cls_name, fields)
        setattr(cfg_cls, _TARGET_ATTR, target)
        setattr(cfg_cls, _CTOR_ATTR, name)
        cfg_cls.__doc__ = f"Auto-generated config for {name}"
        configs.append(cfg_cls)
    if len(configs) == 1:
        return configs[0]
    union = Union[tuple(configs)]
    return union


def _is_cli_type(ann) -> bool:
    """Heuristic filter: keep types representable in YAML/CLI."""
    if ann in (Any, None) or ann in _PRIMITIVES:
        return True
    if isinstance(ann, str):
        return True  # forward-ref annotations; accept as-is
    origin = typing.get_origin(ann)
    if origin in (list, tuple, dict, set, Union, types.UnionType,
                  typing.Literal):
        return True
    if origin in (typing.Sequence, Sequence, typing.List, typing.Tuple, typing.Optional):
        return True
    if dataclasses.is_dataclass(ann):
        return True
    return False


def configure(target: Optional[Callable] = None, name: Optional[str] = None):
    """Decorator marking a hand-written dataclass as a config for ``target``
    (reference utils.py:200-318). ``name`` overrides the constructor display/selection name
    (e.g. 'AdamW' for an optax factory fn)."""
    def wrap(cls):
        cls = dataclasses.dataclass(cls)
        if target is not None:
            setattr(cls, _TARGET_ATTR, target)
            setattr(cls, _CTOR_ATTR, name or getattr(target, "__name__", str(target)))
        return cls
    return wrap


def get_config_target(cfg) -> Optional[Callable]:
    """The callable a config builds (reference utils.py:480-487)."""
    return getattr(type(cfg), _TARGET_ATTR, None)


def instantiate(cfg, **overrides):
    """Build the config's target (reference utils.py:321-377).

    Overrides take priority over config fields; kwargs the target does not accept are silently
    dropped (reference "excess-kwarg tolerance").
    """
    target = get_config_target(cfg)
    if target is None:
        raise ValueError(f"Config {type(cfg).__name__} has no build target")
    kwargs = {f.name: getattr(cfg, f.name) for f in dataclasses.fields(cfg)}
    kwargs.update(overrides)
    sig_fn = target.__init__ if inspect.isclass(target) else target
    try:
        sig = inspect.signature(sig_fn)
        accepts_var_kw = any(p.kind == inspect.Parameter.VAR_KEYWORD
                             for p in sig.parameters.values())
        if not accepts_var_kw:
            valid = set(sig.parameters.keys()) - {"self", "cls"}
            kwargs = {k: v for k, v in kwargs.items() if k in valid}
    except (TypeError, ValueError):
        pass
    return target(**kwargs)


# ---------------------------------------------------------------------------------------------
# Parsing: CLI > YAML > defaults
# ---------------------------------------------------------------------------------------------

def _resolved_fields(cls):
    """dataclass fields with string annotations resolved to real types (needed because
    modules use ``from __future__ import annotations``)."""
    try:
        hints = typing.get_type_hints(cls)
    except Exception:  # noqa: BLE001 - unresolvable forward refs: fall back to raw
        hints = {}
    out = []
    for f in dataclasses.fields(cls):
        ftype = hints.get(f.name, f.type)
        out.append((f, ftype))
    return out


def _union_variants(ann) -> Optional[List[type]]:
    origin = typing.get_origin(ann)
    if origin in (Union, types.UnionType):
        variants = [a for a in typing.get_args(ann) if a is not type(None)]
        if variants and all(dataclasses.is_dataclass(v) for v in variants):
            return variants
    return None


def _coerce(value, ann):
    """Coerce a string/yaml value to the annotated type."""
    if value is None:
        return None
    origin = typing.get_origin(ann)
    if origin in (Union, types.UnionType):
        args = [a for a in typing.get_args(ann) if a is not type(None)]
        for a in args:
            try:
                return _coerce(value, a)
            except (ValueError, TypeError):
                continue
        return value
    if origin is typing.Literal:
        choices = typing.get_args(ann)
        for c in choices:
            if value == c or str(value) == str(c):
                return c
        raise ValueError(f"{value!r} not in literal choices {choices}")
    if ann is bool or (isinstance(value, str) and ann is Any and
                       value.lower() in ("true", "false")):
        if isinstance(value, bool):
            return value
        if isinstance(value, str):
            if value.lower() in ("true", "1", "yes", "on"):
                return True
            if value.lower() in ("false", "0", "no", "off"):
                return False
            raise ValueError(f"cannot parse bool from {value!r}")
        return bool(value)
    if ann in (int, float, str):
        return ann(value)
    if origin in (list, typing.List, typing.Sequence, Sequence, set):
        (elem,) = typing.get_args(ann) or (Any,)
        if isinstance(value, str):
            value = [v for v in value.replace(",", " ").split() if v]
        return [_coerce(v, elem) for v in value]
    if origin in (tuple, typing.Tuple):
        elems = typing.get_args(ann)
        if isinstance(value, str):
            value = [v for v in value.replace(",", " ").split() if v]
        if elems and elems[-1] is Ellipsis:
            return tuple(_coerce(v, elems[0]) for v in value)
        if elems:
            return tuple(_coerce(v, e) for v, e in zip(value, elems))
        return tuple(value)
    if isinstance(value, str) and ann is Any:
        for caster in (int, float):
            try:
                return caster(value)
            except ValueError:
                pass
    return value


def _build_default(cls):
    """Construct a config dataclass with pure defaults (required fields become None)."""
    kwargs = {}
    for f, ftype in _resolved_fields(cls):
        variants = _union_variants(ftype)
        if variants is not None:
            kwargs[f.name] = _build_default(variants[0])
        elif dataclasses.is_dataclass(ftype):
            kwargs[f.name] = _build_default(ftype)
        elif f.default is not dataclasses.MISSING:
            kwargs[f.name] = f.default
        elif f.default_factory is not dataclasses.MISSING:  # type: ignore
            kwargs[f.name] = f.default_factory()  # type: ignore
        else:
            kwargs[f.name] = None
    return cls(**kwargs)


def _apply_dict(cfg, data: Dict[str, Any], path=""):
    """Apply a nested dict (from YAML) onto a config dataclass tree, in place-ish
    (returns updated copy)."""
    if not dataclasses.is_dataclass(cfg):
        return data
    updates = {}
    fields = {f.name: (f, ftype) for f, ftype in _resolved_fields(type(cfg))}
    for key, val in data.items():
        if key == "constructor":
            continue
        if key not in fields:
            continue  # tolerate excess yaml keys, reference drops them too
        f, ftype = fields[key]
        cur = getattr(cfg, key)
        variants = _union_variants(ftype)
        if variants is not None and isinstance(val, dict):
            ctor_name = val.get("constructor")
            target_cls = _select_variant(variants, ctor_name) if ctor_name else type(cur)
            base = cur if type(cur) is target_cls else _build_default(target_cls)
            updates[key] = _apply_dict(base, val)
        elif dataclasses.is_dataclass(cur) and isinstance(val, dict):
            updates[key] = _apply_dict(cur, val)
        else:
            updates[key] = _coerce(val, ftype)
    return dataclasses.replace(cfg, **updates)


def _select_variant(variants: List[type], name: str) -> type:
    norm = name.replace("-", "_").lower()
    for v in variants:
        ctor = getattr(v, _CTOR_ATTR, v.__name__).replace("-", "_")
        if ctor.lower() == norm or ctor.lower().endswith("." + norm) \
                or ctor.split(".")[0].lower() == norm:
            return v
    raise ValueError(
        f"Unknown constructor {name!r}; choices: "
        f"{[getattr(v, _CTOR_ATTR, v.__name__) for v in variants]}")


def _flatten_flags(cls, prefix="") -> Dict[str, Any]:
    """Map of dotted flag path → (dataclass, field) for argparse registration."""
    out = {}
    for f, ftype in _resolved_fields(cls):
        path = f"{prefix}{f.name}"
        variants = _union_variants(ftype)
        if variants is not None:
            out[f"{path}.constructor"] = (cls, f, "constructor")
            for v in variants:
                out.update(_flatten_flags(v, path + "."))
        elif dataclasses.is_dataclass(ftype):
            out.update(_flatten_flags(ftype, path + "."))
        else:
            out[path] = (cls, f, None)
    return out


def parse_config(config_class, args: Optional[List[str]] = None, yaml_arg: str = "--config"):
    """Parse a full config tree with priority CLI > YAML > dataclass defaults
    (reference utils.py:380-432).

    Flags: ``--config path.yaml``, ``--section.field value`` (dashes or underscores both
    accepted), union selection via ``--section.constructor Name`` or YAML ``constructor:``.
    """
    if args is None:
        args = sys.argv[1:]
    cfg = _build_default(config_class)

    flag_map = _flatten_flags(config_class)
    parser = argparse.ArgumentParser(add_help=True, allow_abbrev=False)
    parser.add_argument(yaml_arg, type=str, default=None, help="YAML config file")
    registered = set()
    for path in flag_map:
        for alias in {path, path.replace("_", "-")}:
            if alias not in registered:
                parser.add_argument(f"--{alias}", dest=path, type=str, default=None)
                registered.add(alias)
        # also allow bare leaf name when unambiguous (reference CLI allows --lr)
        leaf = path.split(".")[-1]
        if sum(1 for p in flag_map if p.split(".")[-1] == leaf) == 1:
            for alias in {leaf, leaf.replace("_", "-")}:
                if alias not in registered:
                    parser.add_argument(f"--{alias}", dest=path, type=str, default=None)
                    registered.add(alias)
    ns = parser.parse_args(args)

    yaml_path = getattr(ns, yaml_arg.lstrip("-").replace("-", "_"))
    if yaml_path:
        with open(yaml_path) as fh:
            ydata = yaml.safe_load(fh) or {}
        cfg = _apply_dict(cfg, ydata)

    # CLI overlay: build a nested dict from dotted flags, then apply (CLI wins over YAML).
    cli_tree: Dict[str, Any] = {}
    for path, value in vars(ns).items():
        if value is None or path == yaml_arg.lstrip("-").replace("-", "_"):
            continue
        node = cli_tree
        parts = path.split(".")
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    if cli_tree:
        cfg = _apply_dict_with_ctor(cfg, cli_tree)
    return cfg


def _apply_dict_with_ctor(cfg, data):
    """Like _apply_dict but honors 'constructor' keys arriving from CLI flags."""
    updates = {}
    fields = {f.name: (f, ftype) for f, ftype in _resolved_fields(type(cfg))}
    for key, val in data.items():
        if key not in fields:
            continue
        f, ftype = fields[key]
        cur = getattr(cfg, key)
        variants = _union_variants(ftype)
        if variants is not None and isinstance(val, dict):
            ctor_name = val.pop("constructor", None)
            target_cls = _select_variant(variants, ctor_name) if ctor_name else type(cur)
            base = cur if type(cur) is target_cls else _build_default(target_cls)
            updates[key] = _apply_dict_with_ctor(base, val)
        elif dataclasses.is_dataclass(cur) and isinstance(val, dict):
            updates[key] = _apply_dict_with_ctor(cur, val)
        else:
            updates[key] = _coerce(val, ftype)
    return dataclasses.replace(cfg, **updates)


# ---------------------------------------------------------------------------------------------
# Output
# ---------------------------------------------------------------------------------------------

def config_to_dict(cfg) -> Dict[str, Any]:
    if not dataclasses.is_dataclass(cfg):
        return cfg
    out = {}
    ctor = getattr(type(cfg), _CTOR_ATTR, None)
    if ctor is not None:
        out["constructor"] = ctor
    for f in dataclasses.fields(cfg):
        v = getattr(cfg, f.name)
        if dataclasses.is_dataclass(v):
            out[f.name] = config_to_dict(v)
        elif isinstance(v, tuple):
            out[f.name] = list(v)
        else:
            out[f.name] = v
    return out


def print_config(cfg, file=None) -> None:
    """Pretty-print the full config tree (reference utils.py:435-455)."""
    print(yaml.safe_dump(config_to_dict(cfg), sort_keys=False, default_flow_style=None),
          file=file or sys.stdout)


def write_config_to_yaml(cfg, path: str) -> None:
    """Dump the config to a YAML file reloadable by parse_config
    (reference utils.py:457-478)."""
    with open(path, "w") as fh:
        yaml.safe_dump(config_to_dict(cfg), fh, sort_keys=False, default_flow_style=None)
