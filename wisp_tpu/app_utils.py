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
