from wisp_tpu.renderer.core.control.camera_controllers import (CameraControlMode,
                                                               FirstPersonMode,
                                                               TrackballMode, TurntableMode)
