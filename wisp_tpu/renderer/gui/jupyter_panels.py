"""ipywidgets front-end for the editable control panels.

Binds the declarative :mod:`controls` surface to live ipywidgets: slider/toggle/dropdown
edits write straight through the Control setters into WispState (firing watchedfields
events) and the running app picks them up on its next loop tick — the TPU-honest
equivalent of the reference's imgui property panels (wisp/renderer/gui/imgui/).

Usage in a notebook, alongside the jupyter canvas presenter (renderer/web):

    from wisp_tpu.renderer.gui.jupyter_panels import build_app_panels
    panels = build_app_panels(app)        # returns an ipywidgets.Accordion
    display(panels)
"""

from __future__ import annotations

from typing import Dict, List

from wisp_tpu.renderer.gui.controls import Control, all_panels


def build_control(control: Control):
    """One Control -> one live ipywidget (edit -> Control.set -> WispState)."""
    import ipywidgets as W

    if control.kind == "float":
        w = W.FloatSlider(description=control.name, value=control.get(),
                          min=control.min, max=control.max,
                          step=control.step or 0.1, continuous_update=False,
                          style={"description_width": "initial"})
    elif control.kind == "int":
        w = W.IntSlider(description=control.name, value=int(control.get()),
                        min=int(control.min), max=int(control.max),
                        step=int(control.step or 1), continuous_update=False,
                        style={"description_width": "initial"})
    elif control.kind == "toggle":
        w = W.Checkbox(description=control.name, value=bool(control.get()),
                       style={"description_width": "initial"})
    elif control.kind == "dropdown":
        value = control.get()
        options = list(control.options or [])
        if value not in options:
            options = [value] + options
        w = W.Dropdown(description=control.name, options=options, value=value,
                       style={"description_width": "initial"})
    elif control.kind == "button":
        w = W.Button(description=control.name)
        w.on_click(lambda _btn: control.set(None))
        return w
    else:
        raise ValueError(f"unknown control kind {control.kind!r}")

    if control.set is not None:
        w.observe(lambda change: control.set(change["new"]), names="value")
    if control.help:
        w.tooltip = control.help
    return w


def build_panel(controls: List[Control]):
    import ipywidgets as W
    return W.VBox([build_control(c) for c in controls])


def build_app_panels(app):
    """The full editing surface for a WispApp as an ipywidgets Accordion."""
    import ipywidgets as W
    panels: Dict[str, List[Control]] = all_panels(app)
    acc = W.Accordion(children=[build_panel(cs) for cs in panels.values()])
    for i, title in enumerate(panels):
        acc.set_title(i, title)
    return acc
