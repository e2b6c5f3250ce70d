"""`python -m ecloop_tpu <cmd> ...` — CLI entry point."""

import sys

from .cli import main

sys.exit(main())
