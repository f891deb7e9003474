"""Input mapping tables (reference wisp/renderer/core/control/io.py): symbolic key/button
names → controller actions, shared by all front-ends (jupyter events, future desktop)."""

from __future__ import annotations

from typing import Dict

# mouse buttons
LEFT_BUTTON = "left"
MIDDLE_BUTTON = "middle"
RIGHT_BUTTON = "right"

# default action maps (reference io.py key tables)
MOUSE_ACTIONS: Dict[str, str] = {
    LEFT_BUTTON: "rotate",
    MIDDLE_BUTTON: "pan",
    RIGHT_BUTTON: "zoom",
}

KEY_ACTIONS: Dict[str, str] = {
    "w": "move_forward",
    "s": "move_backward",
    "a": "strafe_left",
    "d": "strafe_right",
    " ": "toggle_training",
    "t": "mode_turntable",
    "f": "mode_first_person",
    "b": "mode_trackball",
    "1": "channel_rgb",
    "2": "channel_depth",
    "3": "channel_alpha",
}


def action_for_key(key: str) -> str:
    return KEY_ACTIONS.get(key.lower(), "")


def action_for_button(button: str) -> str:
    return MOUSE_ACTIONS.get(button, "")
