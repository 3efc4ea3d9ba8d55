"""Command-line interface (console script ``emg3d-tpu``)."""
from . import main, parser, run  # noqa: F401
