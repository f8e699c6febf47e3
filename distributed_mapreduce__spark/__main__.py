"""``python -m distributed_mapreduce__spark master|worker ...`` —
reference CLI parity (main.go:17-44); see :mod:`.cli`."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
