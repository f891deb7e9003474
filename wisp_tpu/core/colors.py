"""Color constants + generator (reference wisp/core/colors.py:32-43)."""

from __future__ import annotations

import colorsys
from typing import Iterator, Tuple

white = (1.0, 1.0, 1.0)
black = (0.0, 0.0, 0.0)
red = (1.0, 0.0, 0.0)
green = (0.0, 1.0, 0.0)
blue = (0.0, 0.0, 1.0)
dark_gray = (0.25, 0.25, 0.25)
gray = (0.5, 0.5, 0.5)
light_gray = (0.75, 0.75, 0.75)
yellow = (1.0, 1.0, 0.0)
cyan = (0.0, 1.0, 1.0)
magenta = (1.0, 0.0, 1.0)
orange = (1.0, 0.5, 0.0)
purple = (0.5, 0.0, 0.5)
lime = (0.75, 1.0, 0.0)
soft_blue = (0.721, 0.90, 1.0)
soft_red = (1.0, 0.0, 0.085)
lime_green = (0.519, 0.819, 0.0)
purple = (0.667, 0.0, 0.429)
gold = (1.0, 0.804, 0.0)


def colors_generator(skip: int = 0) -> Iterator[Tuple[float, float, float]]:
    """Infinite generator of distinct colors via golden-ratio hue stepping
    (reference colors.py:32-43)."""
    golden_ratio_conjugate = 0.618033988749895
    h = 0.1
    for _ in range(skip):
        h = (h + golden_ratio_conjugate) % 1.0
    while True:
        h = (h + golden_ratio_conjugate) % 1.0
        yield colorsys.hsv_to_rgb(h, 0.65, 0.95)
