"""spark-submit launcher for the sinter_spark CLI.

spark-submit prepends the SCRIPT's directory to sys.path, so the
launcher must live OUTSIDE the package — pointing spark-submit at
``sinter_spark/__main__.py`` would shadow stdlib modules (``types``,
``functions``) with the package's own. Ship the package itself via
``--py-files sinter_spark.zip``:

    spark-submit --master ... --py-files /tmp/sinter_spark.zip \
        sinter_cli.py validate --input ... --schema ... --output ...

``python -m sinter_spark`` remains the plain-Python entry point.
"""

import sys

from sinter_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
