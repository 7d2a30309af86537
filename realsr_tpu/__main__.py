"""``python -m realsr_tpu`` — the reference CLI surface (see cli.py)."""

import sys

from realsr_tpu.cli import main

if __name__ == "__main__":
    rc = main()
    sys.exit(255 if rc == -1 else rc)
