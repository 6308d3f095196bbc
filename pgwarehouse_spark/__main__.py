"""`python -m pgwarehouse_spark` entry point (reference parity:
pgwarehouse/__main__.py routes module execution to the same main as the
console script)."""

import sys

from .cli import main

if __name__ == "__main__":
    sys.exit(main())
