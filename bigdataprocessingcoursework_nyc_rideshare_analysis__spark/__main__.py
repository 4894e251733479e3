"""``python -m bigdataprocessingcoursework_nyc_rideshare_analysis__spark`` → per-task CLI."""

import sys

from .cli import main

sys.exit(main())
