"""``python -m sinter_spark`` / ``spark-submit`` entry point."""

import sys

from .cli import main

sys.exit(main())
