"""Camera control modes — first-person / trackball / turntable.

Counterpart of reference wisp/renderer/core/control/ (camera_controller_mode.py,
first_person.py, trackball.py, turntable.py, ~600 LoC). Pure host-side camera-matrix math
over wisp_tpu.core.Camera so the same controllers drive desktop, jupyter, or scripted
orbits; velocity/deceleration planes of the reference are simplified to immediate response
(frame pacing is the renderer's job on TPU — there's no GL event loop).
"""

from __future__ import annotations

import numpy as np

from wisp_tpu.core.camera import Camera
from wisp_tpu.ops.geometric import look_at


class CameraControlMode:
    """Base controller: holds the camera + interaction state
    (reference camera_controller_mode.py)."""

    def __init__(self, camera: Camera, pan_speed: float = 1.0, zoom_speed: float = 1.0,
                 rotate_speed: float = 1.0):
        self.camera = camera
        self.pan_speed = pan_speed
        self.zoom_speed = zoom_speed
        self.rotate_speed = rotate_speed
        self.target = np.zeros(3, dtype=np.float32)

    def name(self) -> str:
        return type(self).__name__

    def rebase(self, camera: Camera) -> None:
        """Adopt an externally-edited camera (e.g. a FOV/distance edit from a GUI control
        replaced the RendererCore camera), preserving the orbit target. Without this, the
        next drag would rebuild the view from the controller's stale camera and silently
        revert the edit."""
        self.camera = camera

    # -- common ops ---------------------------------------------------------------------------
    def zoom(self, amount: float) -> Camera:
        """Dolly along the view direction."""
        eye = self.camera.cam_pos
        fwd = self.camera.forward
        dist = np.linalg.norm(self.target - eye)
        step = self.zoom_speed * amount * max(dist, 1e-3) * 0.1
        new_eye = eye + fwd * step
        self.camera = self._relook(new_eye)
        return self.camera

    def pan(self, dx: float, dy: float) -> Camera:
        """Translate eye + target in the image plane."""
        delta = (-dx * self.camera.right + dy * self.camera.up) * self.pan_speed
        self.target = self.target + delta
        self.camera = self._relook(self.camera.cam_pos + delta)
        return self.camera

    def _relook(self, eye) -> Camera:
        import dataclasses
        up = (0.0, 1.0, 0.0)
        view = look_at(eye, self.target, up)
        return dataclasses.replace(self.camera, view_matrix=view)

    def handle_mouse_drag(self, dx: float, dy: float) -> Camera:
        raise NotImplementedError

    def handle_mouse_scroll(self, amount: float) -> Camera:
        return self.zoom(amount)


class FirstPersonMode(CameraControlMode):
    """WASD-style free look (reference first_person.py)."""

    def handle_mouse_drag(self, dx: float, dy: float) -> Camera:
        """Rotate the view direction (yaw/pitch) around the eye."""
        import dataclasses
        eye = self.camera.cam_pos
        fwd = self.camera.forward
        yaw = -dx * self.rotate_speed * 0.005
        pitch = -dy * self.rotate_speed * 0.005
        cy, sy = np.cos(yaw), np.sin(yaw)
        rot_y = np.asarray([[cy, 0, sy], [0, 1, 0], [-sy, 0, cy]], np.float32)
        fwd = rot_y @ fwd
        right = np.cross(fwd, [0.0, 1.0, 0.0])
        right /= max(np.linalg.norm(right), 1e-9)
        cp, sp = np.cos(pitch), np.sin(pitch)
        fwd = fwd * cp + np.cross(right, fwd) * sp
        self.target = eye + fwd
        self.camera = self._relook(eye)
        return self.camera

    def move(self, forward: float = 0.0, strafe: float = 0.0) -> Camera:
        eye = self.camera.cam_pos
        delta = self.camera.forward * forward + self.camera.right * strafe
        self.target = self.target + delta
        self.camera = self._relook(eye + delta)
        return self.camera


class TrackballMode(CameraControlMode):
    """Arcball rotation around the focus point (reference trackball.py)."""

    def handle_mouse_drag(self, dx: float, dy: float) -> Camera:
        eye = self.camera.cam_pos - self.target
        az = -dx * self.rotate_speed * 0.01
        el = -dy * self.rotate_speed * 0.01
        # rotate about world-up then camera-right
        ca, sa = np.cos(az), np.sin(az)
        rot_y = np.asarray([[ca, 0, sa], [0, 1, 0], [-sa, 0, ca]], np.float32)
        eye = rot_y @ eye
        right = self.camera.right
        ce, se = np.cos(el), np.sin(el)
        k = right / max(np.linalg.norm(right), 1e-9)
        eye = (eye * ce + np.cross(k, eye) * se
               + k * np.dot(k, eye) * (1 - ce))  # Rodrigues
        self.camera = self._relook(self.target + eye)
        return self.camera


class TurntableMode(CameraControlMode):
    """Azimuth/elevation orbit with clamped elevation (reference turntable.py)."""

    def __init__(self, camera: Camera, **kw):
        super().__init__(camera, **kw)
        offset = camera.cam_pos - self.target
        self.radius = float(np.linalg.norm(offset))
        self.azimuth = float(np.arctan2(offset[0], offset[2]))
        self.elevation = float(np.arcsin(np.clip(offset[1] / max(self.radius, 1e-9),
                                                 -1.0, 1.0)))

    def rebase(self, camera: Camera) -> None:
        self.camera = camera
        offset = camera.cam_pos - self.target
        self.radius = float(np.linalg.norm(offset))
        self.azimuth = float(np.arctan2(offset[0], offset[2]))
        self.elevation = float(np.arcsin(np.clip(offset[1] / max(self.radius, 1e-9),
                                                 -1.0, 1.0)))

    def handle_mouse_drag(self, dx: float, dy: float) -> Camera:
        self.azimuth -= dx * self.rotate_speed * 0.01
        self.elevation = np.clip(self.elevation + dy * self.rotate_speed * 0.01,
                                 -1.5, 1.5)
        eye = self.target + self.radius * np.asarray([
            np.cos(self.elevation) * np.sin(self.azimuth),
            np.sin(self.elevation),
            np.cos(self.elevation) * np.cos(self.azimuth)], dtype=np.float32)
        self.camera = self._relook(eye)
        return self.camera

    def handle_mouse_scroll(self, amount: float) -> Camera:
        self.radius = max(self.radius * (1.0 - 0.1 * self.zoom_speed * np.sign(amount)),
                          1e-2)
        return self.handle_mouse_drag(0.0, 0.0)
