"""Thin spark-submit driver script.

Usage (cluster):
    zip -r dice_spark.zip dice_spark
    spark-submit --py-files dice_spark.zip tools/submit_job.py \
        --input /data/transcripts --warehouse /data/kg --context-id prod

All logic lives in dice_spark.cli (shipped in the --py-files zip); this file
exists so the driver script itself needs no packaging.
"""

import sys

from dice_spark.cli import main

if __name__ == "__main__":
    sys.exit(main())
