"""python -m emg3d_tpu -> CLI."""
import sys

from .cli.main import main

if __name__ == '__main__':
    sys.exit(main())
