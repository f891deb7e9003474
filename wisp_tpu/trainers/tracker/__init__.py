from wisp_tpu.trainers.tracker.tracker import Tracker, ConfigTracker, ConfigVisCameras
from wisp_tpu.trainers.tracker.metrics import MetricsBoard
