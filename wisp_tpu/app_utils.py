"""App utilities (reference wisp/app_utils.py:14): logging setup shared by CLI mains."""

import logging
import sys


def default_log_setup(level=logging.INFO):
    """Configure root logging to stdout with the reference's format."""
    logging.basicConfig(
        stream=sys.stdout,
        level=level,
        format="%(asctime)s|%(levelname)8s| %(message)s",
        datefmt="%Y-%m-%d %H:%M:%S",
        force=True,
    )


def apply_device(device: str) -> None:
    """Pin the JAX platform from an app's --device flag ("tpu"/"cpu").

    Must run before the first JAX op. The JAX_PLATFORMS env var alone is NOT honored in
    this environment (the TPU tunnel init re-selects the axon platform); only
    jax.config.update sticks — same mechanism tests/conftest.py uses. "tpu" keeps the
    default platform priority (axon when the tunnel is up, else cpu)."""
    if device and device.lower() in ("cpu",):
        import jax
        jax.config.update("jax_platforms", "cpu")
