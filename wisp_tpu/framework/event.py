"""Field-watch pub-sub (reference wisp/framework/event.py:19-59).

``@watchedfields`` patches a class's ``__setattr__`` to fire change events; ``watch`` registers
handlers on (object, field) pairs. Self-contained (the reference uses pydispatch, unavailable
here). Used to decouple trainers from interactive renderers: trainers mutate WispState and
viewers react.
"""

from __future__ import annotations

from collections import defaultdict
from typing import Any, Callable, Dict, List, Tuple

_handlers: Dict[Tuple[int, str], List[Callable]] = defaultdict(list)


def watch(watched_obj: Any, field: str, status: str = "changed",
          handler: Callable = None) -> None:
    """Register ``handler(value)`` to fire when ``watched_obj.field`` changes
    (reference event.py:38-59). ``status`` kept for API parity ('changed' only)."""
    assert handler is not None
    _handlers[(id(watched_obj), field)].append(handler)


def unwatch(watched_obj: Any, field: str, handler: Callable) -> None:
    key = (id(watched_obj), field)
    if handler in _handlers.get(key, []):
        _handlers[key].remove(handler)


def watchedfields(cls):
    """Class decorator: fire events on attribute change (reference event.py:19-35)."""
    orig_setattr = cls.__setattr__

    def __setattr__(self, name, value):
        old = getattr(self, name, None)
        orig_setattr(self, name, value)
        if old is not value:
            for handler in _handlers.get((id(self), name), []):
                handler(value)

    cls.__setattr__ = __setattr__
    return cls
