"""``python -m sri2db_spark`` — the package's single CLI entry point,
mirroring the reference's one executable (`/root/reference/bin/sri2db.js:16-57`).
Delegates to :func:`sri2db_spark.cli.main`, so every subcommand printed in
error messages (``output-compact``, ``state-compact``, …) works verbatim."""

import sys

from .cli import main

sys.exit(main())
