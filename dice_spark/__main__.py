"""``python -m dice_spark`` == the spark-submit driver entry (cli.main)."""

import sys

from dice_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
