"""Small helper containers (reference wisp/utils/helper_classes.py)."""

from __future__ import annotations


class DotDict(dict):
    """Dict with attribute access (recursive), reference helper_classes.py DotDict."""

    __getattr__ = dict.__getitem__
    __setattr__ = dict.__setitem__
    __delattr__ = dict.__delitem__

    def __init__(self, dct=None):
        super().__init__()
        if dct is not None:
            for key, value in dct.items():
                if hasattr(value, "keys"):
                    value = DotDict(value)
                self[key] = value
